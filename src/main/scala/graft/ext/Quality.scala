package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality audit — the Deequ-style "stop the line" gate a training
  * pipeline runs before shipping a dataset snapshot (completeness, key
  * uniqueness, referential integrity), answering the reference's pre-copy
  * validation instinct (DBSyncTool probes row counts and key marks before
  * trusting a table — SURVEY §2.1 S11/A5) with a general, declarative
  * constraint pass.
  *
  * Output: one long-format row per check —
  * `(check_name, col_name, value, passed)` with `value` an exact BIGINT
  * (fractions in permille), so the frame is engine-independent and can
  * gate a run with a single `passed = false` filter.
  *
  * Scale shape (100 TB):
  *  - all SCAN measures (row count + per-column non-null counts) fold in
  *    ONE aggregate over a single pass — map-side partials reduce to one
  *    row, nothing wide shuffles;
  *  - key uniqueness is one hash groupBy on the key (the unavoidable
  *    shuffle), reduced map-side, emitting one row;
  *  - referential integrity is a left-anti join against the dimension's
  *    key projection — broadcast when the dim is small, plain hash join
  *    otherwise; only non-null FKs are checked (SQL FK semantics).
  * Everything stays in-plan (the checks union single-row aggregates; no
  * driver-side actions), so one `collect()` of a handful of rows drives
  * the gate.
  */
object Quality {

  /** Referential-integrity check: `fkCol` of the audited frame must hit
    * `pkCol` of `dim` (nulls exempt, as in SQL FOREIGN KEY). */
  final case class RefCheck(name: String, dim: DataFrame, fkCol: String, pkCol: String)

  /** Run the audit. `keyCols` non-empty → a uniqueness check; every column
    * in `completenessCols` gets a non-null permille vs
    * `minCompletenessPermille`. */
  def audit(df: DataFrame,
            completenessCols: Seq[String],
            keyCols: Seq[String],
            refChecks: Seq[RefCheck] = Nil,
            minCompletenessPermille: Long = 1000): DataFrame = {
    require(completenessCols.nonEmpty || keyCols.nonEmpty || refChecks.nonEmpty,
      "audit needs at least one check")

    // one scan: row count + all non-null counts folded together.
    // Internal aliases are INDEX-based and user column names go through
    // backtick quoting — a name like "user.name" must neither parse as a
    // struct-field access nor corrupt the generated expressions.
    val scanAggs = count(lit(1)).as("_n") +:
      completenessCols.zipWithIndex.map { case (c, i) =>
        count(col(s"`$c`")).as(s"_nn_$i")
      }
    val scan = df.agg(scanAggs.head, scanAggs.tail: _*)

    val rowCount = scan.select(
      lit("row_count").as("check_name"), lit("*").as("col_name"),
      col("_n").as("value"), (col("_n") > 0).as("passed"))

    val completeness = completenessCols.zipWithIndex.map { case (c, i) =>
      val permille = when(col("_n") === 0, lit(1000L))
        .otherwise(expr(s"(_nn_$i * 1000) div _n"))
      scan.select(
        lit("completeness_permille").as("check_name"), lit(c).as("col_name"),
        permille.as("value"), (permille >= minCompletenessPermille).as("passed"))
    }

    val uniqueness =
      if (keyCols.isEmpty) Nil
      else {
        val dups = df.groupBy(keyCols.map(c => col(s"`$c`")): _*)
          .agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(col("_c") - 1), lit(0L)).as("value"))
        Seq(dups.select(
          lit("key_duplicate_rows").as("check_name"),
          lit(keyCols.mkString(",")).as("col_name"),
          col("value"), (col("value") === 0).as("passed")))
      }

    val integrity = refChecks.map { rc =>
      val violations = df.select(col(s"`${rc.fkCol}`"))
        .filter(col(s"`${rc.fkCol}`").isNotNull)
        .join(rc.dim.select(col(s"`${rc.pkCol}`").as(rc.fkCol)), Seq(rc.fkCol), "left_anti")
        .agg(count(lit(1)).as("value"))
      violations.select(
        lit(s"ri_violations_${rc.name}").as("check_name"),
        lit(rc.fkCol).as("col_name"),
        col("value"), (col("value") === 0).as("passed"))
    }

    (Seq(rowCount) ++ completeness ++ uniqueness ++ integrity)
      .reduce(_ unionByName _)
  }

  /** Benford expectation for first significant digits, in floored
    * permille — computed ONCE here (log10(1+1/d)) and inlined as integer
    * literals into BOTH engines' plans (the alphaM2 rule: no runtime
    * log(), whose cross-engine last-ulp behavior is unspecified). */
  def benfordPermille: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.floor(math.log10(1.0 + 1.0 / d) * 1000).toLong)

  /** Benford first-digit audit of a positive numeric column — the classic
    * fabricated-numbers / unit-mix / truncation screen for financial and
    * measurement data: observed first-significant-digit shares vs the
    * Benford expectation, deviation per digit in permille. First digit is
    * extracted from the decimal string rendering of the positive integer
    * value (identical in any engine); non-positive rows are excluded.
    *
    * Scale shape: one scan + one 9-row groupBy (map-side partials); the
    * total and the expectation table ride broadcast joins.
    *
    * @param valueCol integral-valued column (quantize floats first)
    * @return (digit, n, obs_permille, benford_permille, dev_permille). */
  def benfordAudit(df: DataFrame, valueCol: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df.select(valueCol.cast("long").as("_v"))
      .filter(col("_v") > 0)
      .select(substring(col("_v").cast("string"), 1, 1).cast("int").as("digit"))
    val tot = digits.agg(count(lit(1)).as("_tot"))
    val expected = benfordPermille.toDF("digit", "benford_permille")
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .withColumn("obs_permille", expr("(n * 1000) div _tot"))
      .join(broadcast(expected), Seq("digit"))
      .select(col("digit"), col("n"), col("obs_permille"),
        col("benford_permille"),
        abs(col("obs_permille") - col("benford_permille")).as("dev_permille"))
  }

  /** Corpus-concentration audit: how dominated is the corpus by its
    * largest groups — the mix-balance check a training pipeline runs
    * before a source drowns the blend. One row:
    * `(k, n, gini_micros, top1_permille)` where gini is the Gini
    * coefficient of the group-size distribution computed as ONE exact
    * rational, `(2·Σ i·x_i − (k+1)·n) · 10^6 div (k·n)` over sizes sorted
    * ascending (subtracting two separately-floored terms would diverge
    * between engines) — 0 = perfectly even mix, → 1 = one group holds
    * everything.
    *
    * Scale shape: one map-side-partial count per group; the rank window
    * and final fold run over the k-row COUNTS frame (k = number of
    * groups, metadata-sized — its single-partition window is over k rows,
    * not the corpus). Overflow headroom: 2·Σ i·x_i · 10^6 ≤ 2·k·n·10^6,
    * safe under 9.2e18 while k·n < 4.6e12 (e.g. 100 sources × 10^10
    * rows); beyond that, pre-scale the counts. */
  def concentration(df: DataFrame, groupCol: org.apache.spark.sql.Column): DataFrame = {
    val counts = df.groupBy(groupCol.as("_g")).agg(count(lit(1)).as("_x"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_x").asc, col("_g").asc) // k rows — see scaladoc
    counts.withColumn("_i", col("_x") * row_number().over(w))
      .agg(count(lit(1)).as("k"), sum(col("_x")).as("n"),
        sum(col("_i")).as("_ix"), max(col("_x")).as("_xmax"))
      .select(col("k"), col("n"),
        expr("((2 * _ix - (k + 1) * n) * 1000000) div (k * n)").as("gini_micros"),
        expr("(_xmax * 1000) div n").as("top1_permille"))
  }
}
