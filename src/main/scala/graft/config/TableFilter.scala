package graft.config

/** Table-name include/exclude filtering.
  *
  * Reference semantics (CopyOrchestrator.cs:1844-1863 glob matching,
  * :109-149 application; DBSyncTool_Specification01.md:505-511):
  * `*`-only globs, case-insensitive, include-pass then exclude-pass.
  */
object TableFilter {

  /** Compile a `*`-only glob to an anchored case-insensitive regex
    * (CopyOrchestrator.cs:1858-1863). */
  def globToRegex(glob: String): scala.util.matching.Regex = {
    val quoted = glob.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
    ("(?i)^" + quoted + "$").r
  }

  def matches(glob: String, name: String): Boolean =
    globToRegex(glob).matches(name)

  /** Include-then-exclude, case-insensitive. Empty include list ⇒ nothing
    * passes (the reference requires explicit include patterns). */
  def filter(names: Seq[String], includes: Seq[String], excludes: Seq[String]): Seq[String] = {
    val inc = includes.map(globToRegex)
    val exc = excludes.map(globToRegex)
    names
      .filter(n => inc.exists(_.matches(n)))
      .filterNot(n => exc.exists(_.matches(n)))
  }

  /** Keep only "D365 tables": names made of [A-Z0-9_] only
    * (Tier2DataService.cs:548-554). */
  def isD365Name(name: String): Boolean =
    name.nonEmpty && name.forall(c => (c >= 'A' && c <= 'Z') || c.isDigit || c == '_')

  /** Parse the field-exclusion list: entries are either `FIELD` (global) or
    * `TABLE.FIELD` (per-table), case-insensitive
    * (CopyOrchestrator.cs:1872-1911). */
  def parseFieldExclusions(entries: Seq[String]): (Set[String], Map[String, Set[String]]) = {
    val (perTable, global) = entries.map(_.trim.toUpperCase).filter(_.nonEmpty)
      .partition(_.contains("."))
    val byTable = perTable
      .map { e => val Array(t, f) = e.split("\\.", 2); (t, f) }
      .groupBy(_._1).map { case (t, fs) => t -> fs.map(_._2).toSet }
    (global.toSet, byTable)
  }

  /** Copyable-field projection: source ∩ target − excluded, case-insensitive,
    * preserving source-side order (CopyOrchestrator.cs:189-208). */
  def copyableFields(
      sourceFields: Seq[String],
      targetFields: Seq[String],
      globalExcluded: Set[String] = Set.empty,
      perTableExcluded: Set[String] = Set.empty): Seq[String] = {
    val tgt = targetFields.map(_.toUpperCase).toSet
    val excl = globalExcluded.map(_.toUpperCase) ++ perTableExcluded.map(_.toUpperCase)
    sourceFields.filter(f => tgt.contains(f.toUpperCase) && !excl.contains(f.toUpperCase))
  }

  /** Symmetric difference of two schemas, for the System-table identical-schema
    * gate (CopyOrchestrator.cs:384-399). */
  def schemaMismatch(a: Seq[String], b: Seq[String]): (Set[String], Set[String]) = {
    val au = a.map(_.toUpperCase).toSet
    val bu = b.map(_.toUpperCase).toSet
    (au -- bu, bu -- au)
  }
}
