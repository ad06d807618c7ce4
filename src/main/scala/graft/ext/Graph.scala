package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge lists — the corpus/curation graphs
  * this engine already produces (near-dup pair graphs from [[Dedup]],
  * entity bipartite graphs from the lake tables) ranked and counted
  * without a graph framework: every step is a keyed join or groupBy, so
  * Catalyst plans it like any other query and the DuckDB oracle replays
  * it exactly.
  *
  * Determinism: PageRank runs in exact integer MICROS with floor division
  * (`div`) — bit-identical across engines, no floating-point drift, no
  * convergence test (fixed iteration count; callers pick the depth).
  */
object Graph {

  /** Fixed-iteration PageRank in integer micros over DIRECTED edges
    * `(src, dst)`. Every vertex starts at 10^6; each round a vertex keeps
    * the teleport share (1000−d)‰ of 10^6 and receives d‰ of the floor-
    * split contributions `pr div outdeg` of its in-neighbors. Dangling
    * vertices (no out-edges) leak their mass — the standard simplification;
    * ranks stay comparable, totals are not conserved.
    *
    * Scale shape: each round is ONE src-keyed join (pr ⋈ edges ⋈ outdeg)
    * + one dst-keyed groupBy — shuffles keyed on vertex ids, partition-even
    * for real graphs after AQE skew splitting; the plan grows linearly in
    * `iters` (each round references the previous frame once), so no
    * checkpointing is needed at the depths a ranking pass uses.
    *
    * @return (vid, pr_micros). */
  def pagerankMicros(edges: DataFrame, iters: Int = 3,
                     dampingPermille: Int = 850): DataFrame = {
    require(iters >= 1 && dampingPermille > 0 && dampingPermille < 1000)
    val e = edges.select(col("src"), col("dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val verts = e.select(col("src").as("vid"))
      .union(e.select(col("dst").as("vid"))).distinct()
    val teleport = (1000L - dampingPermille) * 1000000L / 1000L
    var pr = verts.withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("vid", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("vid"), expr("pr div outdeg").as("c"))
        .groupBy("vid").agg(sum(col("c")).as("cs"))
      pr = verts.join(contrib, Seq("vid"), "left")
        .select(col("vid"),
          (lit(teleport) +
            expr(s"($dampingPermille * coalesce(cs, 0L)) div 1000")).as("pr"))
    }
    pr.select(col("vid"), col("pr").as("pr_micros"))
  }

  /** Exact per-vertex triangle counts over an UNDIRECTED graph given as
    * canonical `(a, b)` edges with `a < b`, using the degree-ordered
    * orientation (Cohen 2009 / Suri–Vassilvitskii 2011): re-orient every
    * edge from its lower-(degree, id) endpoint, enumerate wedges only at
    * the LOW vertex, and close them against the oriented edge list. The
    * wedge count is Σ outdeg(v)² with outdeg bounded by O(√|E|) for any
    * graph — the hot-vertex (celebrity-node) blowup Σ deg² of the naive
    * two-path join cannot happen, because a high-degree vertex is the low
    * endpoint of almost none of its edges.
    *
    * Input is normalized defensively (canonicalize to least/greatest, drop
    * self-loops, distinct): duplicate rows, self-loops, or a > b edges
    * would silently corrupt degrees and wedge enumeration otherwise
    * (ADVICE r6). Callers feeding already-canonical pairs pay one distinct
    * — an edge-keyed shuffle, the same scale class as the joins below.
    *
    * @return (vid, n_triangles) for every vertex in at least one triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(
        least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient each edge from the smaller (degree, id) endpoint
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val orient = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("w"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
        .otherwise(col("da")).as("dw"))
    // wedges at the low vertex u: (v, w) both out-neighbors, v before w in
    // the same (degree, id) order — the closing edge, if present, is
    // oriented v → w by transitivity of the total order
    val e1 = orient.select(col("u"), col("w").as("v"), col("dw").as("dv"))
    val e2 = orient.select(col("u"), col("w"), col("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("u"), col("v"), col("w"))
    val tris = wedges.join(orient.select(col("u").as("v"), col("w")),
      Seq("v", "w"), "left_semi")
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("vid"))
      .groupBy("vid").agg(count(lit(1)).as("n_triangles"))
  }
}
