package graft.config

/** Configuration model + the small config-layer utilities (F5–F11).
  * JSON-shape-compatible with the reference's AppConfiguration
  * (Models/AppConfiguration.cs:3-90) where the concepts carry over to a
  * lake/Spark deployment.
  */
final case class AppConfig(
    includeTables: Seq[String] = Seq("*"),
    excludeTables: Seq[String] = Seq("*Staging", "Sys*"), // AppConfiguration.cs:26-27
    excludedFields: Seq[String] = Nil,
    recordsToCopy: Long = 10000L,        // AppConfiguration.cs:32
    parallelWorkers: Int = 10,           // AppConfiguration.cs:36
    truncateThresholdPercent: Double = 40.0, // AppConfiguration.cs:39
    useOptimizedMode: Boolean = true,
    strategyOverrides: String = "",
    postTransferSql: String = "",
    snapshotPath: String = "")

object ConfigUtil {

  /** F7 — Base64 obfuscation for stored secrets (EncryptionHelper.cs:11-48 —
    * the reference's "encryption" is obfuscation; kept API-compatible). */
  def obfuscate(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  def deobfuscate(s: String): Option[String] =
    try Some(new String(java.util.Base64.getDecoder.decode(s), "UTF-8"))
    catch { case _: IllegalArgumentException => None }

  /** F8 — k=v; connection-string parse (ConnectionStringHelper.cs:20-100). */
  def parseConnectionString(cs: String): Map[String, String] =
    cs.split(';').iterator
      .map(_.trim).filter(_.nonEmpty)
      .flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
          case _           => None
        }
      }.toMap

  /** F8 — the 3-line "LCS" format: server / database / authentication. */
  def parseLcsFormat(text: String): Option[(String, String)] = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.size >= 2) Some((lines(0), lines(1))) else None
  }

  /** F11 — INI sectioned-file parse (DefaultValuesHelper.cs:9-76):
    * `[Section]` headers, `;`/`#` comments, body lines kept verbatim. */
  def parseIni(text: String): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    var section = ""
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("[") && line.endsWith("]")) {
        section = line.substring(1, line.length - 1)
        out.getOrElseUpdate(section, Vector.empty)
      } else if (line.nonEmpty && !line.startsWith(";") && !line.startsWith("#") && section.nonEmpty) {
        out(section) = out(section) :+ raw
      }
    }
    out.toMap
  }
}
