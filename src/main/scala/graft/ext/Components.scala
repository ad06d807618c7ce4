package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair edges — the step that
  * turns pairwise dedup verdicts into KEEP/DROP decisions: all docs that
  * are transitively near-dups form one cluster, and a pipeline keeps one
  * representative (the min id) per cluster.
  *
  * Algorithm: bounded min-label propagation. `comp_k(v)` = the minimum
  * vertex id reachable from `v` within `k` hops; each iteration is one
  * edge⋈label join + a min aggregate, so the shuffle volume per round is
  * O(|edges| + |vertices|) — never the corpus. Near-dup clusters are
  * shallow (duplicates of a common source), so a small fixed `iters`
  * reaches the true components in practice while keeping the computation
  * DETERMINISTIC and replayable as plain SQL (the oracle runs the same k
  * rounds). For adversarially long chains at extreme scale the same loop
  * admits the large-star/small-star contraction (halves diameter per
  * round); not needed at near-dup cluster shapes.
  */
object Components {

  /** (id, comp) for every vertex appearing in `edges`; `comp` = min id
    * within `iters` hops. Edges are treated as undirected. Every round's
    * label frame is persisted (each is read twice by the next round, and
    * caching keeps the lineage effectively `iters`-deep); ONE action at
    * the end materializes the whole chain — each cached round populates
    * during that single execution — and then the intermediates are
    * dropped. The returned frame stays persisted (vertex-sized). */
  def labelPropagate(edges: DataFrame, aCol: String, bCol: String,
      iters: Int): DataFrame = {
    val sym = edges.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .unionByName(
        edges.select(col(bCol).cast("long").as("a"), col(aCol).cast("long").as("b")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist()
    val rounds = scala.collection.mutable.ArrayBuffer(labels)
    (1 to iters).foreach { _ =>
      val nbrMin = sym
        .join(labels.select(col("id").as("b"), col("comp")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("comp")).as("nbr_comp"))
      labels = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .persist()
      rounds += labels
    }
    labels.count() // one materialization; every cached round fills en route
    rounds.init.foreach(_.unpersist())
    sym.unpersist()
    labels
  }
}
