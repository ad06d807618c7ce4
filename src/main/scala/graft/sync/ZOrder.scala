package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) table layout — multi-dimensional data skipping.
  *
  * A linear sort clusters ONE column: every row group's min/max box is
  * tight on the sort key and spans the full domain of everything else, so
  * only sort-key predicates prune. Z-order sorts by the interleaved bits
  * of two normalized columns: row groups become tight boxes in BOTH
  * dimensions, and a 2-D box predicate (the "user × time", "key × version"
  * shape of real lookups) prunes quadratically instead of linearly.
  *
  * This generalizes the version-clustered layout recipe
  * ([[SyncFixtures.clusterByVersion]], the 1-D case the sync engine's
  * delta fetch depends on) to the multi-predicate reads a pipeline lake
  * serves. Same contract as Delta's OPTIMIZE ZORDER BY, expressed as a
  * plain DataFrame transform: normalize → interleave → range-partition →
  * sort within partitions. The z-key is dropped before write; the layout
  * IS the index — no auxiliary structure to maintain, the parquet footer
  * min/max stats carry all of it.
  */
object ZOrder {

  /** Normalize a column to [0, 2^21) rank space by its min/max (21 bits ×
    * 2 dims = 42 bits of z-key — plenty of resolution, no Long overflow).
    * Non-long numeric dimensions are floored into key space first. */
  private def norm(c: Column, lo: Long, hi: Long): Column = {
    val width = math.max(hi - lo, 1L)
    floor(((key(c) - lit(lo)).cast("double") * lit((1L << 21) - 1).cast("double"))
      / lit(width.toDouble)).cast("long")
  }

  /** Floor a (possibly non-integral) dimension into long key space. Not
    * `floor(cast double)` — that loses precision for longs above 2^53 —
    * and not bare `cast long` — that truncates negatives toward zero:
    * truncate, then step down one when the truncation rounded up. Exact
    * for integral inputs, floor semantics for fractional ones. */
  private def key(c: Column): Column = {
    val t = c.cast("long")
    t - when(c < t, lit(1L)).otherwise(lit(0L))
  }

  /** The z-key column for two LongType dimensions with known bounds
    * (interleave_bits is the registered codegen expression). */
  def zkey(a: Column, b: Column, boundsA: (Long, Long), boundsB: (Long, Long)): Column =
    call_function("interleave_bits",
      norm(a, boundsA._1, boundsA._2), norm(b, boundsB._1, boundsB._2))

  /** Lay `df` out along the Morton curve of (colA, colB) into `nFiles`
    * range-partitioned, internally-sorted files. One extra agg job reads
    * the bounds; the layout write is the same shuffle any repartition
    * pays — amortized over every pruned read after it.
    *
    * File boundaries come from range-exchange SAMPLING (balanced bytes per
    * file on any distribution, but seeded per run — two same-code runs cut
    * the curve at slightly different points). When a footer-stats metric
    * or a reproducible layout matters more than balance, use
    * [[layoutQuadrants]]. */
  def layout(df: DataFrame, colA: String, colB: String, nFiles: Int): DataFrame =
    bounds(df, colA, colB) match {
      // empty input: no bounds to normalize against — the layout of nothing
      // is nothing (min/max return null; reading them would NPE)
      case None => df
      case Some((bA, bB)) => layoutBounded(df, colA, colB, nFiles, bA, bB)
    }

  /** The two dimensions' (min, max) key bounds — the one agg job [[layout]]
    * pays; public so a caller that also needs the bounds (the lake layer's
    * layout metadata records a probe box from them) pays it once. */
  def bounds(df: DataFrame, colA: String,
      colB: String): Option[((Long, Long), (Long, Long))] = {
    val r = df.agg(
      min(key(col(colA))), max(key(col(colA))),
      min(key(col(colB))), max(key(col(colB)))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) None
    else Some(((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
  }

  /** [[layout]] with caller-supplied bounds (no second agg job). */
  def layoutBounded(df: DataFrame, colA: String, colB: String, nFiles: Int,
      boundsA: (Long, Long), boundsB: (Long, Long)): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("_zkey", zkey(col(colA), col(colB), boundsA, boundsB))
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }

  /** DETERMINISTIC z-layout: equal-WIDTH Morton quadrants — the quadrant
    * id is the z-key's top `2·bits` bits, pure arithmetic on the key, so
    * the file boundaries (and every parquet-footer metric computed from
    * them) are bit-stable across runs. [[layout]]'s range exchange samples
    * with a per-run seed: rerunning identical code moves the curve cuts a
    * little, which moved the bench's footer-ground-truth box-prune ratio
    * between driver runs (r11 verdict #3). Here each output file IS one
    * quad-tree cell — the tightest possible min/max box per file — at the
    * cost of BALANCE: skewed data packs uneven quadrant files, which is
    * why the sampling form stays the general-purpose default.
    *
    * Write the result with `.partitionBy(QuadrantCol)`: the value-split
    * writer emits one file per populated quadrant per holding task, and
    * the preceding hash exchange co-locates each quadrant in exactly one
    * task — one file per populated quadrant, rows z-sorted within. */
  /** Layout-decay recluster trigger — the planner cost-model discipline
    * (O6's "probe before you pay") applied to layout MAINTENANCE: a
    * z-ordered table decays as incremental syncs append unclustered delta
    * files (each spans the full key box, so every box probe must scan
    * them), and the decision of WHEN to pay the recluster rewrite should
    * be a measured threshold, not a schedule. Inputs are the two numbers
    * a table maintainer already has: the scanned row-group fraction of a
    * representative box probe on the CURRENT layout (parquet footers,
    * [[graft.run.IoMeter.parquetRowGroupsBox]]) and the same probe's
    * fraction on the fresh layout (recorded at recluster time). Fires
    * when decay has cost `factor`× the fresh selectivity AND the absolute
    * fraction is past `minFrac` — a near-ideal fresh layout (1/64) must
    * not trigger a full rewrite over footer jitter while the probe still
    * scans 3% of the table. */
  def reclusterDue(scannedFrac: Double, freshFrac: Double,
      factor: Double = 4.0, minFrac: Double = 0.05): Boolean =
    scannedFrac > math.max(freshFrac * factor, minFrac)

  val QuadrantCol = "_zq"
  def layoutQuadrants(df: DataFrame, colA: String, colB: String,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 10, s"quadrant bits out of range: $bits")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val r = df.agg(
      min(key(col(colA))), max(key(col(colA))),
      min(key(col(colB))), max(key(col(colB)))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) return df.withColumn(QuadrantCol, lit(0))
    val za = zkey(col(colA), col(colB),
      (r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))
    df.withColumn("_zkey", za)
      .withColumn(QuadrantCol,
        shiftright(col("_zkey"), 42 - 2 * bits).cast("int"))
      .repartition(1 << (2 * bits), col(QuadrantCol))
      .sortWithinPartitions(QuadrantCol, "_zkey")
      .drop("_zkey")
  }
}
