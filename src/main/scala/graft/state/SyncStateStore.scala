package graft.state

import graft.sync.LakeFs

/** Per-table sync high-water marks, persisted crash-safe after each table.
  *
  * Reference: Models/AppConfiguration.cs:45-49 (Tier2Timestamps,
  * AxDBTimestamps, MaxTransferredRecIds), Helpers/TimestampManager.cs:9-53,
  * Helpers/MaxRecIdManager.cs:10-43; per-table flush README.md:244,
  * CopyOrchestrator.cs:975-978, :1204-1212.
  *
  * Versions are stored as `0x…` hex strings of the 8-byte row version
  * (TimestampHelper.cs:37-64); corrupt values degrade the table to standard
  * mode rather than failing (DBSyncTool_Optimization_Spec.md:1536-1541).
  *
  * `path` is a Hadoop-resolvable URI/path ([[LakeFs]]): the store persists
  * next to the lake tables it describes — local dir, `hdfs:`, object store.
  */
final class SyncStateStore(path: String) {

  final case class TableMarks(
      sourceVersionHex: Option[String],
      targetVersionHex: Option[String],
      maxRecId: Option[Long]) {
    def sourceVersion: Option[Long] = sourceVersionHex.flatMap(VersionHex.parse)
    def targetVersion: Option[Long] = targetVersionHex.flatMap(VersionHex.parse)
  }

  @volatile private var state: Map[String, TableMarks] = load()

  def get(table: String): Option[TableMarks] = state.get(table.toUpperCase)

  /** Set and immediately flush (crash-safe per-table save, D6). */
  def put(table: String, marks: TableMarks): Unit = synchronized {
    state = state + (table.toUpperCase -> marks)
    flush()
  }

  def putVersions(table: String, srcVersion: Long, tgtVersion: Long, maxRecId: Option[Long]): Unit =
    put(table, TableMarks(
      Some(VersionHex.format(srcVersion)), Some(VersionHex.format(tgtVersion)), maxRecId))

  def clear(table: String): Unit = synchronized {
    state = state - table.toUpperCase
    flush()
  }

  def allTables: Set[String] = state.keySet

  // --- persistence: tiny hand-rolled JSON (flat, string/long values only) ---

  private def load(): Map[String, TableMarks] =
    if (!LakeFs.exists(path)) Map.empty
    else {
      val text = LakeFs.readUtf8(path)
      // format: {"TABLE":{"src":"0x..","tgt":"0x..","maxRecId":123},...}
      val entry = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
      val field = """"(src|tgt|maxRecId)"\s*:\s*(?:"([^"]*)"|(\d+)|null)""".r
      entry.findAllMatchIn(text).map { m =>
        val fields = field.findAllMatchIn(m.group(2)).map { f =>
          f.group(1) -> Option(f.group(2)).getOrElse(f.group(3))
        }.toMap
        m.group(1).toUpperCase -> TableMarks(
          fields.get("src").filter(_ != null),
          fields.get("tgt").filter(_ != null),
          fields.get("maxRecId").flatMap(v => Option(v)).flatMap(_.toLongOption))
      }.toMap
    }

  private def flush(): Unit = {
    val body = state.toSeq.sortBy(_._1).map { case (t, m) =>
      val parts = Seq(
        m.sourceVersionHex.map(v => s""""src":"$v""""),
        m.targetVersionHex.map(v => s""""tgt":"$v""""),
        m.maxRecId.map(v => s""""maxRecId":$v""")).flatten
      s""""$t":{${parts.mkString(",")}}"""
    }.mkString("{", ",", "}")
    // atomic write: temp file + rename, so a crash never corrupts the store
    // (LakeFs.replace — atomic on file:/hdfs:, emulated on object stores)
    val tmp = path + ".tmp"
    LakeFs.mkdirsParent(path)
    LakeFs.writeUtf8(tmp, body)
    LakeFs.replace(tmp, path)
  }
}

/** 8-byte row-version hex round-trip (`0x0000000000001234` style).
  * Reference: Helpers/TimestampHelper.cs:37-64. Comparison of versions is
  * bytewise unsigned big-endian (TimestampHelper.cs:12-27) — identical to
  * numeric comparison of the unsigned 64-bit value, and to Spark's
  * BinaryType ordering on the raw 8 bytes.
  */
object VersionHex {
  def format(v: Long): String = f"0x$v%016x"

  /** Returns None on malformed OR out-of-range input (degrade-to-standard
    * rule). Range bound: the engine carries versions as signed LongType and
    * compares with signed `>`; a rowversion with the high bit set (≥ 2^63,
    * reachable only on a server that has consumed half the 64-bit version
    * space) would invert every comparison. Such marks are treated like
    * corrupt marks — the table degrades to a standard full sync, which is
    * always safe, rather than silently skipping changes. */
  def parse(s: String): Option[Long] = {
    val t = s.trim.toLowerCase
    if (!t.startsWith("0x") || t.length != 18) None
    else try Some(java.lang.Long.parseUnsignedLong(t.drop(2), 16)).filter(_ >= 0L)
    catch { case _: NumberFormatException => None }
  }

  def toBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  def fromBytes(b: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(b).getLong

  /** Bytewise unsigned comparison (TimestampHelper.cs:12-27). */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    java.util.Arrays.compareUnsigned(a, b)
  }
}
