package graft.sync

/** Driver-side parquet FOOTER statistics for the lake layer — the per-file
  * ground truth partial compaction prunes on ([[LakeTable.compact]]).
  *
  * Reading a footer is O(metadata), never a data scan: for a 100 TB base a
  * key-range probe over every file costs one small read per file, the same
  * order as the directory listing itself — this is the Delta add-file-stats
  * pattern with the parquet footer as the stats store (no extra bookkeeping
  * to keep consistent; the file IS its own manifest entry).
  */
object ParquetStats {

  /** (min, max) of INT64 column `col` over every row group of one parquet
    * file — None when the column is missing, not INT64, or any row group
    * lacks usable stats (all-null chunks, stats disabled). None degrades to
    * "range unknown": callers must treat the file as touched/scanned, never
    * as skippable — absence of evidence is not evidence of disjointness. */
  def fileKeyRange(path: String, col: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), LakeFs.hadoopConf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val perGroup = reader.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala
          .find(_.getPath.iterator().next().equalsIgnoreCase(col))
          .flatMap { cc =>
            val st = cc.getStatistics
            if (st == null || !st.hasNonNullValue) None
            else (st.genericGetMin, st.genericGetMax) match {
              case (mn: java.lang.Long, mx: java.lang.Long) =>
                Some((mn.longValue, mx.longValue))
              case _ => None
            }
          }
      }
      // empty file (no row groups): genuinely coverable by nothing — treat
      // as unknown rather than inventing an empty range
      if (perGroup.isEmpty || perGroup.exists(_.isEmpty)) None
      else {
        val rs = perGroup.flatten
        Some((rs.map(_._1).min, rs.map(_._2).max))
      }
    } finally reader.close()
  }

  /** Row groups of `files` whose footer min/max boxes INTERSECT a 2-D
    * range box — (intersecting, total). The measured selectivity of a
    * multi-dimensional layout: a reader with both predicates scans exactly
    * the intersecting groups. Missing/non-INT64/absent stats degrade to
    * "intersects" (scanned) — absence of evidence is never skippability.
    * Footer metadata only, like [[fileKeyRange]]: O(files) small reads,
    * which is what lets a layout-decay PROBE run on every incremental
    * apply without a data scan ([[LakeTable.layoutBoxProbe]]). */
  def rowGroupsBox(files: Seq[String],
      colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    var hit = 0
    var total = 0
    files.foreach { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p), LakeFs.hadoopConf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.asScala.foreach { b =>
        total += 1
        def intersects(c: String, lo: Long, hi: Long): Boolean =
          b.getColumns.asScala
            .find(_.getPath.iterator().next().equalsIgnoreCase(c))
            .forall { cc =>
              val st = cc.getStatistics
              st == null || !st.hasNonNullValue ||
                ((st.genericGetMin, st.genericGetMax) match {
                  case (mn: java.lang.Long, mx: java.lang.Long) =>
                    mx >= lo && mn <= hi
                  case _ => true // non-INT64 stats: assume scanned
                })
            }
        if (intersects(colA, loA, hiA) && intersects(colB, loB, hiB)) hit += 1
      } finally reader.close()
    }
    (hit, total)
  }
}
