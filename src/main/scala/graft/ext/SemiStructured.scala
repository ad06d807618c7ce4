package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON string) columns — the crawl/event-metadata shape a
  * training-data pipeline filters and aggregates on (a WARC record's
  * headers, a scraped page's attributes, an event's property bag).
  *
  * Stance mirrors [[graft.run.CsvSource]]: extraction takes an EXPLICIT
  * schema. Schema INFERENCE over a 100 TB column would re-scan the data to
  * guess types (and guess differently between samples); a pipeline source
  * must be typed. Parsing is Spark's `from_json` — a codegen'd
  * `JsonToStructs`, scan speed, no UDF — and malformed input degrades to
  * NULL fields (crawl metadata is dirty by nature; a poison record must
  * never fail a 100 TB scan). The audit makes that dirt measurable instead
  * of silent.
  */
object SemiStructured {

  /** Internal temp column both entry points stage the parsed struct under;
    * an input frame already using the name would be silently clobbered by
    * `withColumn`, so it is guarded like the output-name collisions
    * (ADVICE r8). */
  private val TempStructCol = "_sj"

  private def requireNoTempCol(df: DataFrame): Unit =
    require(!df.columns.contains(TempStructCol),
      s"input column '$TempStructCol' collides with the internal parse " +
        "staging column — rename it before extraction")

  /** Typed top-level extraction: each `(name, ddlType)` field of the JSON
    * object column lands as its own column (optionally prefixed), the
    * original column is kept. Missing fields and malformed documents yield
    * null — use [[jsonAudit]] to quantify which. `ddlType` is a Spark DDL
    * type string (`"BIGINT"`, `"STRING"`, `"DOUBLE"`, nested
    * `"STRUCT<...>"` …). */
  def extractJson(df: DataFrame, jsonCol: String,
      fields: Seq[(String, String)], prefix: String = ""): DataFrame = {
    require(fields.nonEmpty, "at least one field to extract")
    requireNoTempCol(df)
    val outNames = fields.map(prefix + _._1)
    require(outNames.distinct.size == outNames.size,
      s"duplicate extracted column names: $outNames")
    val clash = df.columns.toSet.intersect(outNames.toSet)
    require(clash.isEmpty,
      s"extracted column(s) $clash collide with existing columns — set a prefix")
    val ddl = fields.map { case (n, t) => s"`$n` $t" }.mkString(", ")
    val parsed = from_json(col(jsonCol), ddl, Map.empty[String, String])
    df.withColumn(TempStructCol, parsed)
      .select(df.columns.map(col) ++
        fields.map { case (n, _) => col(s"$TempStructCol.`$n`").as(s"$prefix$n") }: _*)
  }

  /** Parseability/coverage audit per group: total rows, rows that parse AND
    * conform to the given schema (`n_valid` — PERMISSIVE parsing null-fills
    * the fields of a malformed or badly-typed document, so validity is
    * detected via the corrupt-record column, not a null struct), and
    * per-field non-null coverage — the dirt report that decides whether a
    * metadata field is trustworthy enough to filter 100 TB on. One scan,
    * map-side partial aggregation. */
  def jsonAudit(df: DataFrame, jsonCol: String, groupCol: String,
      fields: Seq[(String, String)]): DataFrame = {
    val corrupt = "_corrupt_doc"
    requireNoTempCol(df)
    require(!fields.exists(_._1 == corrupt),
      s"'$corrupt' is reserved for the corrupt-record channel")
    val outNames = Seq(groupCol, "n", "n_valid") ++ fields.map("n_" + _._1)
    require(outNames.distinct.size == outNames.size,
      s"audit output column collision (a field named 'valid', or a group " +
        s"column shadowing a count column): $outNames")
    val ddl = (fields.map { case (n, t) => s"`$n` $t" } :+
      s"`$corrupt` STRING").mkString(", ")
    val parsed = from_json(col(jsonCol), ddl,
      Map("columnNameOfCorruptRecord" -> corrupt, "mode" -> "PERMISSIVE"))
    val covCols = fields.map { case (n, _) =>
      sum(when(col(s"$TempStructCol.`$n`").isNotNull, 1L).otherwise(0L)).as(s"n_$n")
    }
    val aggCols: Seq[Column] =
      sum(when(col(TempStructCol).isNotNull && col(s"$TempStructCol.`$corrupt`").isNull, 1L)
        .otherwise(0L)).as("n_valid") +: covCols
    df.withColumn(TempStructCol, parsed)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), aggCols: _*)
  }

  /** Scalar path extraction as a Column (the `props->>'k'` shape) for ad
    * hoc predicates; `get_json_object` is also codegen'd. */
  def jsonPath(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, s"$$.$path")
}
