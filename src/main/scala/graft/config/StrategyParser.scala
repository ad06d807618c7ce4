package graft.config

import graft.model.FetchStrategy

/** Parser for per-table strategy override lines.
  *
  * Grammar (reference: CopyOrchestrator.cs:1660-1801, TESTING_GUIDE.md:25-62):
  * {{{
  *   TABLE
  *   TABLE|5000
  *   TABLE|10m                      (millions suffix, :1765-1779; also 10k)
  *   TABLE|sql:SELECT * FROM T ORDER BY RecId DESC
  *   TABLE|3000|sql:SELECT TOP (@recordCount) * FROM T WHERE ...
  *   TABLE|5000 -truncate           (flag forces truncate mode)
  * }}}
  * Errors carry the 1-based line number (reference error style,
  * CopyOrchestrator.cs:1684). Duplicate table names are rejected up front
  * (MainForm.cs:720-727).
  */
object StrategyParser {

  final case class StrategyOverride(
      table: String,
      strategy: FetchStrategy,
      line: Int)

  final case class ParseError(line: Int, message: String)
      extends Exception(s"Line $line: $message")

  /** Parse a record-count token: plain digits, or `<n>k` / `<n>m` suffix
    * (case-insensitive). Reference: CopyOrchestrator.cs:1765-1779. */
  def parseRecordCount(tok: String): Either[String, Long] = {
    val t = tok.trim.toLowerCase
    val (digits, mult) =
      if (t.endsWith("m")) (t.dropRight(1), 1000000L)
      else if (t.endsWith("k")) (t.dropRight(1), 1000L)
      else (t, 1L)
    if (digits.isEmpty || !digits.forall(_.isDigit))
      Left(s"invalid record count '$tok'")
    else {
      val n = digits.toLong * mult
      if (n <= 0) Left(s"record count must be positive, got '$tok'")
      else Right(n)
    }
  }

  /** Default record count when a line specifies only the table name
    * (AppConfiguration.cs:32). */
  val DefaultRecordCount = 10000L

  def parseLine(raw: String, lineNo: Int, defaultN: Long = DefaultRecordCount)
      : Either[ParseError, StrategyOverride] = {
    // `-truncate` is a trailing flag after whitespace (TESTING_GUIDE.md:44)
    val (body, truncate) = {
      val t = raw.trim
      if (t.toLowerCase.endsWith(" -truncate"))
        (t.dropRight(" -truncate".length).trim, true)
      else (t, false)
    }
    val parts = body.split('|')
    val table = parts.head.trim
    if (table.isEmpty)
      return Left(ParseError(lineNo, "empty table name"))

    def err(m: String) = Left(ParseError(lineNo, m))

    parts.toList match {
      case _ :: Nil =>
        Right(StrategyOverride(table, FetchStrategy.TopNByKey(defaultN, truncate), lineNo))
      case _ :: second :: Nil if second.trim.toLowerCase.startsWith("sql:") =>
        val sql = second.trim.drop(4).trim
        validateSql(sql) match {
          case Some(m) => err(m)
          case None =>
            Right(StrategyOverride(table, FetchStrategy.CustomSql(sql, defaultN, truncate), lineNo))
        }
      case _ :: second :: Nil =>
        parseRecordCount(second) match {
          case Left(m)  => err(m)
          case Right(n) => Right(StrategyOverride(table, FetchStrategy.TopNByKey(n, truncate), lineNo))
        }
      case _ :: second :: third :: Nil if third.trim.toLowerCase.startsWith("sql:") =>
        parseRecordCount(second) match {
          case Left(m) => err(m)
          case Right(n) =>
            val sql = third.trim.drop(4).trim
            validateSql(sql) match {
              case Some(m) => err(m)
              case None =>
                Right(StrategyOverride(table, FetchStrategy.CustomSql(sql, n, truncate), lineNo))
            }
        }
      case _ =>
        err(s"unrecognized strategy format '$raw'")
    }
  }

  /** SQL templates must contain a `*` for field-list substitution
    * (CopyOrchestrator.cs:1700-1710 validation). */
  private def validateSql(sql: String): Option[String] =
    if (sql.isEmpty) Some("empty sql: strategy")
    else if (!sql.contains("*")) Some("sql strategy must contain '*' placeholder")
    else None

  /** Parse the whole multi-line override block; duplicate table names are a
    * pre-validation error (MainForm.cs:720-727). First error stops the run
    * (CopyOrchestrator.cs:1684). */
  def parseAll(text: String): Either[ParseError, Seq[StrategyOverride]] = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l, i + 1) }
      .filter { case (l, _) => l.trim.nonEmpty && !l.trim.startsWith("//") }
      .toSeq
    val parsed = lines.map { case (l, i) => parseLine(l, i) }
    parsed.collectFirst { case Left(e) => e } match {
      case Some(e) => Left(e)
      case None =>
        val oks = parsed.collect { case Right(o) => o }
        val dup = oks.groupBy(_.table.toUpperCase).collectFirst {
          case (_, os) if os.size > 1 => os(1)
        }
        dup match {
          case Some(o) => Left(ParseError(o.line, s"duplicate table '${o.table}'"))
          case None    => Right(oks)
        }
    }
  }

  /** Does an SQL-strategy template opt in to optimized mode? Requires the
    * `@sysRowVersionFilter` placeholder (CopyOrchestrator.cs:819-829);
    * without it the table silently degrades to standard mode. */
  def sqlSupportsOptimized(template: String): Boolean =
    template.contains("@sysRowVersionFilter")
}
