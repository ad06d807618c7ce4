package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the LATEST right row with
  * `rightTime <= leftTime` within the same key — the point-in-time lookup
  * every event pipeline needs (price as of trade, status as of event).
  *
  * Spark has no native as-of join; per the engine guidance the preference
  * order starts with COMPOSITION, and composition wins here: tag both
  * sides, union, one window per key ordered by time — ONE shuffle per side,
  * sort-merge within partitions, no custom SparkPlan to maintain. This is
  * the same algorithm a dedicated AsOfJoinExec would run (co-partition +
  * merge), expressed with operators Catalyst already knows how to
  * whole-stage-compile. A range-join band (`leftTime - tolerance`) composes
  * the same way.
  *
  * Requirement: (key, rightTime) unique on the right side (ties would make
  * "the" latest row ambiguous). If duplicates exist anyway, the window
  * ordering tiebreaks on the ORDERABLE value columns (maps are skipped —
  * they cannot sort), so the output is DETERMINISTIC
  * (backward: greatest value tuple wins; forward: smallest) — but when a
  * duplicate right row holds NULL in some value column, the per-column
  * ignoreNulls fill may mix columns from different equal-time rows; keep
  * (key, rightTime) unique for row-consistent output.
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried to the matched left rows
    *                   (null when no right row precedes the left row). */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns
    // tag + align schemas: right rows carry the values, left rows carry nulls
    val l = left
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_is_right", lit(0))
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_is_right")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")): _*)
    val r = right
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_is_right", lit(1))
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_is_right")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_v_$c")): _*)

    // right rows sort BEFORE left rows at equal time: a status taking effect
    // at t applies to an event at t. ORDERABLE value columns tiebreak
    // equal-time duplicate right rows deterministically (ADVICE r5) —
    // unorderable types (maps) are skipped so they keep working, at the
    // documented cost of no tiebreak through them.
    val tiebreak = valueCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc +: col("_is_right").desc +:
        tiebreak.map(c => col(s"_v_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    val filled = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"_v_$c", last(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_is_right") === 0)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"_v_$c").as(s"asof_$c")): _*)
  }

  /** Backward as-of with a STALENESS BOUND — "price as of trade, but never
    * older than X": a match more than `tolerance` before the left row
    * counts as no match (values null). Equivalent to post-nulling the
    * unconstrained match: the unconstrained winner is the LATEST preceding
    * right row, so if it is out of tolerance every other preceding row is
    * too. Implemented by carrying the matched right time through the same
    * single window — still one shuffle per side, no extra join.
    *
    * `tolerance` is in the time column's units: MICROSECONDS for timestamp
    * columns, the raw value difference for numeric ones. */
  def asofBackwardTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String],
      tolerance: Long): DataFrame = {
    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
        case _ => c.cast("long")
      }
    val carried = "_asof_matched_t"
    val rtType = right.schema(rightTimeCol).dataType
    val r2 = right.withColumn(carried, col(rightTimeCol))
    val res = asofBackward(left, r2, keyCols, leftTimeCol, rightTimeCol,
      valueCols :+ carried)
    val stale = col(s"asof_$carried").isNull ||
      asLong(col(leftTimeCol), left.schema(leftTimeCol).dataType) -
        asLong(col(s"asof_$carried"), rtType) > tolerance
    valueCols.foldLeft(res) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(stale, lit(null).cast(right.schema(c).dataType))
          .otherwise(col(s"asof_$c")))
    }.drop(s"asof_$carried")
  }

  /** Nearest as-of join: each left row picks the right row with MINIMUM
    * |rightTime − leftTime| within the key — telemetry alignment where the
    * reference reading may sit on either side of the probe. Backward wins
    * exact distance ties (the reading that was already in effect beats one
    * that wasn't yet). Composition: one backward pass + one forward pass
    * (each a single window — two shuffles per side total), the matched
    * times carried, then a scan-speed per-row pick; the pick chooses a SIDE
    * once, so multi-column output is row-consistent. */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {
    def asLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
        case _ => c.cast("long")
      }
    val carried = "_asof_matched_t"
    val r2 = right.withColumn(carried, col(rightTimeCol))
    val vc = valueCols :+ carried

    val bwd = asofBackward(left, r2, keyCols, leftTimeCol, rightTimeCol, vc)
    val bRenamed = vc.foldLeft(bwd) { (df, c) =>
      df.withColumnRenamed(s"asof_$c", s"_b_$c") }
    val both = asofForward(bRenamed, r2, keyCols, leftTimeCol, rightTimeCol, vc)

    val lt = asLong(col(leftTimeCol), left.schema(leftTimeCol).dataType)
    val rtType = right.schema(rightTimeCol).dataType
    val bDist = lt - asLong(col(s"_b_$carried"), rtType)
    val fDist = asLong(col(s"asof_$carried"), rtType) - lt
    // backward unless absent or strictly beaten by the forward match
    val pickBackward = col(s"_b_$carried").isNotNull &&
      (col(s"asof_$carried").isNull || bDist <= fDist)

    val out = valueCols.foldLeft(both) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(pickBackward, col(s"_b_$c")).otherwise(col(s"asof_$c")))
    }
    out.select(left.columns.map(col) ++
      valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Forward as-of join: each left row picks the EARLIEST right row with
    * `rightTime >= leftTime` within the same key — "the next deploy after
    * this alert", "the next purchase at or after this click". Same
    * union+window composition as [[asofBackward]], mirrored: the window
    * looks at CURRENT ROW → UNBOUNDED FOLLOWING and takes the first
    * non-null value; right rows sort AFTER left rows at equal time so an
    * event at t sees a right row taking effect at t (inclusive match).
    * One shuffle per side, identical scale shape. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns
    val l = left
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_is_right", lit(0))
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_is_right")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")): _*)
    val r = right
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_is_right", lit(1))
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_is_right")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_v_$c")): _*)

    // left rows sort BEFORE right rows at equal time, so the forward
    // window (current → following) still includes an equal-time right row.
    // Orderable value columns tiebreak equal-time duplicate right rows
    // deterministically (ADVICE r5; unorderable types skipped, as in
    // asofBackward).
    val tiebreak = valueCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc +: col("_is_right").asc +:
        tiebreak.map(c => col(s"_v_$c").asc): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val filled = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"_v_$c", first(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_is_right") === 0)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"_v_$c").as(s"asof_$c")): _*)
  }
}
