package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General analytics surface over the lake tables — the query shapes a user
  * of the engine runs beyond sync parity (aggregation, multi-way joins,
  * top-k, event-time windowing, sessionization).
  *
  * Determinism discipline for the DuckDB oracle: double arithmetic is
  * element-wise only (IEEE ops are bit-identical across engines); every
  * aggregation over doubles quantizes to exact integer units first
  * (`floor(x*scale + 0.5)` — single IEEE ops), sums exact BIGINTs
  * (order-independent), and divides once at the end. Decimal CASTs are NOT
  * portable: Spark casts double→decimal via the shortest string repr, DuckDB
  * via the full binary expansion — tails differ.
  */
object AnalyticsQueries {

  import org.apache.spark.sql.Column
  /** Quantize a double column to integer units (scale = 100 for cents). */
  private def units(c: Column, scale: Double): Column =
    floor(c * scale + lit(0.5)).cast("long")

  /** Temp dir deleted at JVM exit — query results lazily read from these,
    * so in-query deletion is impossible; without the hook every verify/
    * bench run leaks corpus copies + checkpoint state into tmpdir (the
    * ENOSPC orphan class the bench reaper handles for crashed runs — its
    * prefix list covers graft_stream; markerless dirs age out at 3 h). */
  private[queries] def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    dir
  }

  /** Shared AvailableNow sentinel harness for the windowed streaming
    * queries: write `ev` as ONE file (run 1 = one batch), run the stream,
    * then append two far-future sentinel batches (spacing i²·step — 4 h
    * then 16 h past max real ts, monotone and beyond watermark + window)
    * re-running after each, so Append finalizes every REAL window.
    * Returns (outDir, maxUs) — the caller filters sentinel windows
    * (`unix_micros(hour) <= maxUs` or a sentinel-marker column) and
    * projects its result. One copy of the scaffolding: the r7 review
    * found three drifting verbatim copies. */
  private def runSentineled(s: SparkSession,
      ev: org.apache.spark.sql.DataFrame, prefix: String,
      sentinelSelect: Long => String)(
      buildStream: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (String, Long) = {
    val dir = scratchDir(prefix)
    val (evDir, outDir, ckpt) = (s"$dir/ev", s"$dir/out", s"$dir/ckpt")
    ev.coalesce(1).write.parquet(evDir)
    def runOnce(): Unit = {
      val stream = s.readStream.schema(s.read.parquet(evDir).schema).parquet(evDir)
      buildStream(stream)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(300000) match {
        case true => ()
        case false => sys.error("streaming run did not finish in 300 s")
      }
    }
    runOnce()
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val step = 4L * 3600L * 1000000L
    Seq(1, 2).foreach { i =>
      s.sql(sentinelSelect(maxUs + i * step * i))
        .coalesce(1).write.mode("append").parquet(evDir)
      runOnce()
    }
    (outDir, maxUs)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing-summary aggregate (grouped agg with exact-decimal sums)
    "q_agg_pricing" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(units(col("l_quantity"), 1.0)).cast("double").as("sum_qty"),
          (sum(units(col("l_extendedprice"), 100.0)) / 100.0).as("sum_base_price"),
          // price-cents × (100 − discount-%) is exact integer arithmetic
          (sum(units(col("l_extendedprice"), 100.0) *
               (lit(100L) - units(col("l_discount"), 100.0))) / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Multi-way join + grouped agg: revenue per nation (broadcast small dims)
    "q_join_revenue_nation" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      val n = s.read.parquet(s"$d/nation.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          (sum(units(col("l_extendedprice"), 100.0) *
               (lit(100L) - units(col("l_discount"), 100.0))) / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Data-quality audit (Deequ-style stop-the-line gate): one-scan
    // completeness, one-shuffle key uniqueness, anti-join referential
    // integrity — long-format check rows a release gate filters on
    "q_dq_audit" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      graft.ext.Quality.audit(o,
        completenessCols = Seq("o_custkey", "o_orderdate", "o_orderpriority"),
        keyCols = Seq("o_orderkey"),
        refChecks = Seq(graft.ext.Quality.RefCheck("customer", c, "o_custkey", "c_custkey")))
    }),

    // Corpus-concentration audit: Gini + top-1 share of the per-source
    // row-count distribution — the mix-domination gate, one exact rational
    "q_dq_concentration" -> ((s, d) =>
      graft.ext.Quality.concentration(
        s.read.parquet(s"$d/documents.parquet"), col("source"))),

    // Benford first-digit audit of price cents — fabricated-numbers /
    // unit-mix screen; expectation constants inlined into both engines
    "q_dq_benford" -> ((s, d) =>
      graft.ext.Quality.benfordAudit(
        s.read.parquet(s"$d/lineitem.parquet"),
        floor(col("l_extendedprice") * 100 + 0.5))),

    // PER-GROUP top-k through the bounded mergeable aggregate (map-side
    // partial top-k, O(k) state — never a full per-group window sort):
    // each supplier's 3 priciest line items in integer cents
    "q_topk_pergroup" -> ((s, d) =>
      graft.ext.TopK.perGroup(
        s.read.parquet(s"$d/lineitem.parquet"), "l_suppkey",
        floor(col("l_extendedprice") * 100 + 0.5),
        col("l_orderkey") * 10 + col("l_linenumber"), k = 3)
        .withColumnRenamed("score", "score_cents")),

    // Top-k with deterministic tie-break (TakeOrderedAndProject, no full sort)
    "q_topk_orders" -> ((s, d) =>
      s.read.parquet(s"$d/orders.parquet")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // Semi-structured property bag: typed extraction from the events table's
    // JSON `props` column (codegen'd JsonToStructs, scan speed, no UDF),
    // then filter + aggregate on the extracted field — the metadata-filter
    // shape a crawl pipeline runs over record headers
    "q_events_props" -> ((s, d) => {
      val ev = graft.ext.SemiStructured.extractJson(
        s.read.parquet(s"$d/events.parquet"), "props", Seq("k" -> "BIGINT"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_k_ge_50"))
    }),

    // The dirt report for the same bag: parseability + per-field coverage
    // per group (decides whether a metadata field is trustworthy enough to
    // filter 100 TB on); `absent` quantifies a field that never occurs.
    // The fixture corpus is all well-formed AND well-typed, so a synthetic
    // 'typedirt' group is unioned in (ADVICE r8): type-dirty values for the
    // BIGINT field ("abc", 2.5, true, and the quoted-"42" coercion trap —
    // Spark's JSON parser does NOT coerce string to long), one malformed
    // doc, one JSON-null k, one fully valid control — so the corrupt-record
    // CONFORMANCE channel (valid JSON, wrong type) is actually exercised
    // against the oracle, not just json_valid
    "q_events_props_audit" -> ((s, d) => {
      import s.implicits._
      val ev = s.read.parquet(s"$d/events.parquet")
        .select("event_type", "props")
      val dirty = Seq(
          """{"k": "abc"}""", """{"k": 2.5}""", """{"k": true}""",
          """{"k": "42"}""", """not json""", """{"k": null}""",
          """{"k": 11, "absent": "seen"}""")
        .map(("typedirt", _)).toDF("event_type", "props")
      graft.ext.SemiStructured.jsonAudit(
        ev.unionByName(dirty), "props", "event_type",
        Seq("k" -> "BIGINT", "absent" -> "STRING"))
    }),

    // Event-time tumbling window (batch analog of the streaming agg)
    "q_events_hourly" -> ((s, d) =>
      EventsSource.load(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          (sum(units(col("value"), 1000000.0)) / 1000000.0).as("sum_value"))),

    // Event-time HOPPING window (1 h window, 15 min slide — each event
    // lands in exactly 4 overlapping windows): the trend-smoothing shape
    // tumbling windows can't give; epoch-aligned starts, exact micros
    "q_events_hopping" -> ((s, d) =>
      EventsSource.load(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(units(col("value"), 1000000.0)).as("sum_value_micros"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value_micros"))),

    // Built-in SESSION windows (session_window, 30 min gap) — the
    // merge-interval operator form of the gap-islands sessionization in
    // q_events_sessions; session end = last event + gap. The boundary
    // differs from the islands rule only at an EXACT 30:00.000000 gap
    // (session_window starts a new session, islands does not — the oracle
    // replays session_window's >= rule).
    "q_events_sessionwin" -> ((s, d) =>
      EventsSource.load(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n"))),

    // Fixed-iteration integer PageRank over the supplier↔part bipartite
    // graph from lineitem (both directions — an alternating random walk;
    // vertex ids disjoint via 2k / 2k+1 encoding)
    "q_graph_pagerank" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val sp = li.select((col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")).distinct()
      val edges = sp.union(sp.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.Graph.pagerankMicros(edges, iters = 3)
    }),

    // The DIRECTED supplier→part graph: every part is a dangling sink, so
    // this exercises the conserved-mass variant — pooled dangling mass is
    // floor-split uniformly into each round's damped share
    "q_graph_pagerank_dangling" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val edges = li.select((col("l_suppkey") * 2).as("src"),
        (col("l_partkey") * 2 + 1).as("dst")).distinct()
      graft.ext.Graph.pagerankMicros(edges, iters = 3,
        redistributeDangling = true)
    }),

    // Item-item co-occurrence (bought-together): basket-keyed pair join
    // with a basket-size cap, cosine over basket incidence in millis
    "q_cooccur" -> ((s, d) =>
      graft.ext.CoOccur.cosinePairs(
        s.read.parquet(s"$d/lineitem.parquet"), "l_orderkey", "l_partkey")),

    // Click-path mining: gap-islands sessions → ordered type sequences →
    // top-20 paths (TakeOrderedAndProject, no global sort)
    "q_event_paths" -> ((s, d) =>
      graft.ext.Paths.topPaths(
        graft.ext.Paths.sessionPaths(EventsSource.load(s, d),
          "user_id", "ts", "event_type", "event_id"), k = 20)),

    // Next-event training pairs: (context event, next type, exact gap) per
    // user — sequence-model example generation; last events keep NULL
    // targets (sequence boundaries stay visible)
    "q_events_nextpred" -> ((s, d) =>
      graft.ext.Paths.nextEventPairs(EventsSource.load(s, d),
        "user_id", "ts", "event_type", "event_id")),

    // Robust per-group outliers (Hampel rule): lower-median + MAD in pure
    // integer arithmetic — no sums of squares, no division anywhere
    "q_outliers_mad" -> ((s, d) =>
      graft.ext.Outliers.madOutliers(EventsSource.load(s, d),
        col("event_type"),
        floor(col("value") * 1000000.0 + lit(0.5)).cast("long"),
        col("event_id"))),

    // Ordered funnel conversion: earliest strictly-increasing chain
    // view → click → purchase, per-step user counts + permille vs step 1
    "q_funnel" -> ((s, d) =>
      graft.ext.Funnel.conversion(EventsSource.load(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))),

    // Cohort retention matrix: first-seen day × day offset → active users
    "q_cohort_retention" -> ((s, d) =>
      graft.ext.Cohort.retention(EventsSource.load(s, d),
        "user_id", "ts", maxOffsetDays = 30)),

    // Hourly resample with materialized gaps + forward fill (per-key grid
    // from the key's own span — never a global calendar cross join)
    "q_ts_resample" -> ((s, d) =>
      graft.ext.Resample.hourlyWithGapsFilled(EventsSource.load(s, d),
        "user_id", "ts", "value")),

    // Grouped distinct aggregation: vocabulary size per source
    "q_agg_distinct" -> ((s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source")
        .agg(countDistinct(col("tok")).as("vocab"), count(lit(1)).as("n_tokens"))),

    // ROLLUP: subtotal hierarchy over (returnflag, linestatus)
    "q_agg_rollup" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(units(col("l_quantity"), 1.0)).as("sum_qty"), count(lit(1)).as("n"))),

    // CUBE: every subtotal combination over (returnflag, linestatus) —
    // rollup's lattice completion (adds the linestatus-only slices)
    "q_agg_cube" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(units(col("l_quantity"), 1.0)).as("sum_qty"), count(lit(1)).as("n"))),

    // Pivot: per-returnflag quantity split by linestatus (conditional-agg
    // form so the DuckDB twin is dialect-independent)
    "q_agg_pivot" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(units(col("l_quantity"), 1.0)))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")),

    // Hive-partition pruning: events re-laid-out by ingest date; the
    // one-day filter prunes 29 of 30 directories at PLAN time
    // (PartitionFilters — before any footer is opened; pinned in
    // PlanQualitySpec) and the result equals the flat-table filter
    "q_part_prune" -> ((s, d) => {
      val tmp = scratchDir("graft_part")
      val ev = EventsSource.load(s, d).withColumn("event_date", to_date(col("ts")))
      graft.sync.PartitionedLayout.write(ev, tmp, "event_date")
      graft.sync.PartitionedLayout.read(s, tmp)
        .filter(col("event_date") === lit(java.sql.Date.valueOf("2024-01-15")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(units(col("value"), 1000000.0)).as("v_micros"))
    }),

    // Bucketed co-located join: both sides pre-hashed on the join key at
    // WRITE time, so the join AND the key-grouped aggregate read the
    // co-located layout with zero exchanges (pinned in PlanQualitySpec) —
    // pay the shuffle once per table, not once per query
    "q_bucket_join" -> ((s, d) => {
      val tmp = scratchDir("graft_bucket")
      val li = s.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"))
      val o = s.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
      graft.sync.Bucketing.writeBucketed(li, "b_lineitem", 8,
        keyCol = "l_orderkey", path = Some(s"$tmp/li"))
      graft.sync.Bucketing.writeBucketed(o, "b_orders", 8,
        keyCol = "o_orderkey", path = Some(s"$tmp/o"))
      val bl = graft.sync.Bucketing.readBucketed(s, "b_lineitem")
      val bo = graft.sync.Bucketing.readBucketed(s, "b_orders")
      bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("total"))
    }),

    // Salted two-phase aggregation over the schema's hottest key
    // (l_returnflag: 3 values across all of lineitem — the shape where one
    // reducer would otherwise own a third of the table). Result identical
    // to the direct groupBy; the salt only respreads the partials.
    "q_skew_salted_agg" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      graft.ext.Skew.saltedCount(li, "l_returnflag")
        .join(graft.ext.Skew.saltedSum(li, "l_returnflag", "l_linenumber"),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"), col("total"))
    }),

    // Salted replicated-dimension join (explicit, no AQE reliance): the
    // fact side salts deterministically, the dim replicates salts×, the
    // join key becomes (key, salt) — row-identical to the plain join.
    "q_skew_salted_join" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_suppkey"), col("l_linenumber"))
      val sup = s.read.parquet(s"$d/supplier.parquet")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.ext.Skew.saltedJoinSmall(li, sup, "l_suppkey")
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("total"))
    }),

    // Sessionization: 30-minute inactivity gap splits sessions per user
    "q_events_sessions" -> ((s, d) => {
      val ev = EventsSource.load(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // streaming sessionization run END TO END (flatMapGroupsWithState over
    // one checkpoint): run 1 feeds every event as one batch, two sentinel
    // runs advance the watermark past last+gap and give the engine a batch
    // in which every open session times out and flushes — the completed-
    // session table then equals batch gap-islands sessionization
    // (VERDICT r5 #4)
    "q_stream_sessions" -> ((s, d) => {
      val dir = scratchDir("graft_stream_sess")
      val (evDir, outDir, ckpt) = (s"$dir/ev", s"$dir/out", s"$dir/ckpt")
      val ev = EventsSource.load(s, d).select(col("user_id"), col("ts"))
      ev.coalesce(1).write.parquet(evDir) // ONE file → run 1 is one batch
      def runOnce(): Unit = {
        val stream = s.readStream.schema(s.read.parquet(evDir).schema).parquet(evDir)
        graft.streaming.StreamingSync.completedSessions(stream).toDF()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination(300000) match {
          case true => ()
          case false => sys.error("streaming run did not finish in 300 s")
        }
      }
      runOnce()
      // sentinels: past max(ts) + gap(30m) + watermark delay(10m) + margin
      val maxUs = ev.agg(max(unix_micros(col("ts")))).head.getLong(0)
      val step = 100L * 60L * 1000000L // 100 minutes in micros
      Seq(1, 2).foreach { i =>
        s.sql(s"SELECT -1L AS user_id, timestamp_micros(${maxUs + i * step}L) AS ts")
          .coalesce(1).write.mode("append").parquet(evDir)
        runOnce()
      }
      s.read.parquet(outDir).filter(col("user_id") >= 0)
        .select(col("user_id"), col("start_ts"), col("end_ts"), col("n_events"))
    }),

    // streaming windowed aggregation run END TO END (watermark + tumbling
    // window, Append mode): values are pre-quantized to integer micros so
    // the windowed sums are exact; sentinel batches push the watermark past
    // every real window's end so Append finalizes them all — the emitted
    // table then equals the batch hourly aggregate
    "q_stream_hourly" -> ((s, d) => {
      val ev = EventsSource.load(s, d).select(col("ts"), col("event_type"),
        floor(col("value") * 1000000.0 + 0.5).cast("long").as("value"))
      val (outDir, _) = runSentineled(s, ev, "graft_stream_hr",
        ts => s"SELECT timestamp_micros(${ts}L) AS ts, " +
          "'_sentinel' AS event_type, 0L AS value") { stream =>
        graft.streaming.StreamingSync.windowedEventCounts(stream)
          .select(col("window.start").as("hour"), col("event_type"),
            col("n"), col("sum_value"))
      }
      s.read.parquet(outDir).filter(col("event_type") =!= "_sentinel")
        .select(col("hour"), col("event_type"), col("n"), col("sum_value"))
    }),

    // streaming HOPPING-window aggregation end to end (1 h / 15 min slide
    // — each event in 4 overlapping windows, all held in the state store
    // until the watermark passes their ends): the q_stream_hourly pattern
    // with overlap; sentinel batches finalize every real window
    "q_stream_hopping" -> ((s, d) => {
      val ev = EventsSource.load(s, d).select(col("ts"), col("event_type"),
        floor(col("value") * 1000000.0 + 0.5).cast("long").as("value"))
      val (outDir, _) = runSentineled(s, ev, "graft_stream_hop",
        ts => s"SELECT timestamp_micros(${ts}L) AS ts, " +
          "'_sentinel' AS event_type, 0L AS value") { stream =>
        graft.streaming.StreamingSync
          .windowedEventCounts(stream, slide = "15 minutes")
          .select(col("window.start").as("window_start"), col("event_type"),
            col("n"), col("sum_value"))
      }
      s.read.parquet(outDir).filter(col("event_type") =!= "_sentinel")
        .select(col("window_start"), col("event_type"), col("n"), col("sum_value"))
    }),

    // streaming windowed QUANTILE sketch end to end: the mergeable
    // bottom-k buffer lives in the state store across batches; emitted
    // final sketches equal the batch build (pure function of the data),
    // estimates derived batch-side with the shared integer-rank pick
    "q_stream_quantile" -> ((s, d) => {
      val ev = EventsSource.load(s, d).select(col("ts"), col("event_id"),
        floor(col("value") * 1000000.0 + 0.5).cast("long").as("value"))
      val (outDir, maxUs) = runSentineled(s, ev, "graft_stream_qt",
        ts => s"SELECT timestamp_micros(${ts}L) AS ts, " +
          "-1L AS event_id, 0L AS value") { stream =>
        graft.streaming.StreamingSync
          .windowedQuantileSketch(stream, "event_id", "value")
          .select(col("window.start").as("hour"), col("sk"), col("n"))
      }
      // sentinel windows hold only sentinel rows — drop hours past the
      // last real event; estimate from the emitted sketches batch-side
      s.read.parquet(outDir)
        .filter(unix_micros(col("hour")) <= maxUs)
        .select(col("hour"), col("n"), col("sk"),
          explode(array(lit(500), lit(900))).as("q_permille"))
        .withColumn("_m", size(col("sk")).cast("long"))
        .withColumn("_vals", array_sort(expr("transform(sk, x -> x.v)")))
        .select(col("hour"), col("q_permille"), expr(
          "element_at(_vals, CAST(greatest((q_permille * _m + 999) div 1000, 1L) AS INT))")
          .as("est"), col("n"))
    }),

    // streaming windowed TOP-K end to end: the bounded buffer in the
    // state store; emitted windows equal the batch per-hour top-3
    "q_stream_topk" -> ((s, d) => {
      val ev = EventsSource.load(s, d).select(col("ts"), col("event_id"),
        floor(col("value") * 1000000.0 + 0.5).cast("long").as("value"))
      val (outDir, maxUs) = runSentineled(s, ev, "graft_stream_tk",
        ts => s"SELECT timestamp_micros(${ts}L) AS ts, " +
          "-1L AS event_id, 0L AS value") { stream =>
        graft.streaming.StreamingSync
          .windowedTopK(stream, "value", "event_id", k = 3)
          .select(col("window.start").as("hour"), col("tk"))
      }
      s.read.parquet(outDir)
        .filter(unix_micros(col("hour")) <= maxUs)
        .select(col("hour"), posexplode(col("tk")).as(Seq("_pos", "_e")))
        .select(col("hour"), (col("_pos") + 1).as("rank"),
          col("_e.id").as("event_id"), col("_e.score").as("value_micros"))
    }),

    // stream-stream interval join run END TO END: every event matched to
    // the user's signups in the hour before it. Inner interval joins emit
    // matches EAGERLY (the watermark only bounds state retention), so one
    // AvailableNow run over one batch per side emits every pair — no
    // sentinels needed; the emitted table equals the batch interval join
    "q_stream_interval" -> ((s, d) => {
      val dir = scratchDir("graft_stream_ij")
      val ev = EventsSource.load(s, d)
      ev.select("event_id", "user_id", "ts")
        .coalesce(1).write.parquet(s"$dir/l")
      ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("s_event_id"),
          col("ts").as("s_ts"))
        .coalesce(1).write.parquet(s"$dir/r")
      def stream(p: String) =
        s.readStream.schema(s.read.parquet(p).schema).parquet(p)
      graft.streaming.StreamingSync.intervalJoin(
          stream(s"$dir/l"), stream(s"$dir/r"), "user_id",
          leftTs = "ts", rightTs = "s_ts", maxDelay = "1 hour")
        .select(col("l.event_id"), col("s_event_id"))
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(300000) match {
          case true => ()
          case false => sys.error("streaming run did not finish in 300 s")
        }
      s.read.parquet(s"$dir/out")
    }),

    // stream-static enrichment run END TO END: streamed events pick up
    // customer dimension attributes per micro-batch (no state, no
    // watermark — the default production enrichment shape); one run over
    // one batch equals the batch left join
    "q_stream_enrich" -> ((s, d) => {
      val dir = scratchDir("graft_stream_en")
      graft.queries.EventsSource.load(s, d)
        .select("event_id", "user_id", "event_type")
        .coalesce(1).write.parquet(s"$dir/ev")
      val dim = s.read.parquet(s"$d/customer.parquet")
      val stream = s.readStream
        .schema(s.read.parquet(s"$dir/ev").schema).parquet(s"$dir/ev")
      graft.streaming.StreamingSync.enrichStream(
          stream, dim, "user_id", "c_custkey",
          Seq("c_nationkey", "c_mktsegment"))
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(300000) match {
          case true => ()
          case false => sys.error("streaming run did not finish in 300 s")
        }
      s.read.parquet(s"$dir/out")
    })
  )

  /** Unrolled PageRank rounds for the DuckDB twin — generated from the
    * same constants as [[graft.ext.Graph.pagerankMicros]] (teleport +
    * damped floor-split contributions, all BIGINT). Expects CTEs `edges`,
    * `outd`, `verts`, `p0` to exist. */
  private def pagerankRounds(iters: Int, damping: Int): String = {
    val teleport = (1000L - damping) * 1000000L / 1000L
    (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst AS vid, CAST(sum(p.pr // o.outdeg) AS BIGINT) AS cs
       FROM edges e JOIN p${k - 1} p ON p.vid = e.src
       JOIN outd o ON o.src = e.src GROUP BY 1),
p$k AS (SELECT v.vid,
          CAST($teleport + ($damping * COALESCE(c.cs, 0)) // 1000 AS BIGINT) AS pr
        FROM verts v LEFT JOIN c$k c ON c.vid = v.vid)"""
    }.mkString(",\n")
  }

  /** The conserved-mass twin of [[pagerankRounds]]: per round, the pooled
    * pr of dangling vertices (no outd row) is floor-split by |V| and added
    * into every vertex's damped share — the same integer ops the Spark
    * path runs. Expects the additional CTE `nv` (single BIGINT count). */
  private def pagerankRoundsDangling(iters: Int, damping: Int): String = {
    val teleport = (1000L - damping) * 1000000L / 1000L
    (1 to iters).map { k =>
      s"""d$k AS (SELECT CAST(COALESCE(sum(p.pr), 0) AS BIGINT) AS dsum
       FROM p${k - 1} p WHERE p.vid NOT IN (SELECT src FROM outd)),
c$k AS (SELECT e.dst AS vid, CAST(sum(p.pr // o.outdeg) AS BIGINT) AS cs
       FROM edges e JOIN p${k - 1} p ON p.vid = e.src
       JOIN outd o ON o.src = e.src GROUP BY 1),
p$k AS (SELECT v.vid,
          CAST($teleport + ($damping * (COALESCE(c.cs, 0) + d.dsum // nv.nv)) // 1000 AS BIGINT) AS pr
        FROM verts v LEFT JOIN c$k c ON c.vid = v.vid, d$k d, nv)"""
    }.mkString(",\n")
  }

  def oracles: Map[String, String] = Map(
    "q_graph_pagerank" -> s"""WITH sp AS (
  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem),
edges AS (SELECT src, dst FROM sp UNION ALL SELECT dst, src FROM sp),
outd AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
verts AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges),
p0 AS (SELECT vid, CAST(1000000 AS BIGINT) AS pr FROM verts),
${pagerankRounds(3, 850)}
SELECT vid, pr AS pr_micros FROM p3""",

    "q_graph_pagerank_dangling" -> s"""WITH edges AS (
  SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem),
outd AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
verts AS (SELECT src AS vid FROM edges UNION SELECT dst FROM edges),
nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM verts),
p0 AS (SELECT vid, CAST(1000000 AS BIGINT) AS pr FROM verts),
${pagerankRoundsDangling(3, 850)}
SELECT vid, pr AS pr_micros FROM p3""",

    // co-occurrence replay: basket dedup + size cap, basket-keyed pair
    // count, cosine = c/sqrt(na*nb) — sqrt+division are correctly-rounded
    // IEEE so the millis floor is engine-independent
    "q_cooccur" -> """WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
kept AS (SELECT bk, it FROM (
  SELECT bk, it, count(*) OVER (PARTITION BY bk) AS bsz FROM b)
  WHERE bsz <= 100),
sz AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY 1),
pr AS (SELECT a.it AS item_a, k.it AS item_b, CAST(count(*) AS BIGINT) AS c
       FROM kept a JOIN kept k ON a.bk = k.bk AND a.it < k.it
       GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT pr.item_a, pr.item_b, pr.c, sa.n AS na, sb.n AS nb,
  CAST(floor(pr.c * 1000.0 / sqrt(CAST(sa.n * sb.n AS DOUBLE))) AS BIGINT)
    AS cosine_millis
FROM pr JOIN sz sa ON sa.it = pr.item_a JOIN sz sb ON sb.it = pr.item_b""",

    // JSON property extraction replay: ->> path + BIGINT cast
    "q_events_props" -> """SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(sum(CASE WHEN CAST(props->>'k' AS BIGINT) >= 50 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_k_ge_50
FROM events GROUP BY event_type""",

    // audit replay: TYPE-CONFORMANCE validity, not just json_valid — a doc
    // is valid iff it parses AND its k is an integer token or absent/null
    // (json_type BIGINT/UBIGINT; Spark's parser rejects floats, bools and
    // quoted numbers for BIGINT — pinned empirically). try_cast AS JSON
    // NULL-degrades the malformed doc instead of erroring; json_extract
    // maps both absent and JSON-null to SQL NULL, exactly Spark's null
    // field. The dirty union mirrors the Spark side verbatim.
    "q_events_props_audit" -> """WITH ev AS (
  SELECT event_type, props FROM events
  UNION ALL
  SELECT 'typedirt', x FROM (VALUES ('{"k": "abc"}'), ('{"k": 2.5}'),
    ('{"k": true}'), ('{"k": "42"}'), ('not json'), ('{"k": null}'),
    ('{"k": 11, "absent": "seen"}')) t(x)),
p AS (SELECT event_type, try_cast(props AS JSON) AS j FROM ev)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN j IS NOT NULL
              AND (json_extract(j, '$.k') IS NULL
                   OR json_type(json_extract(j, '$.k'))
                        IN ('BIGINT', 'UBIGINT'))
           THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
  CAST(sum(CASE WHEN json_type(json_extract(j, '$.k'))
                     IN ('BIGINT', 'UBIGINT')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_k,
  CAST(sum(CASE WHEN json_extract(j, '$.absent') IS NOT NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_absent
FROM p GROUP BY event_type""",

    // path replay: lag/cumsum sessionization, ordered list agg capped at
    // 50 steps, count-desc top-20 with the path tiebreak
    "q_event_paths" -> """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                     THEN 1 ELSE 0 END AS ns FROM l),
s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        ROWS UNBOUNDED PRECEDING) AS sess FROM f),
p AS (SELECT user_id, sess,
        array_to_string(list(event_type ORDER BY us, event_id)[1:50], '>') AS path
      FROM s GROUP BY 1, 2)
SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1
ORDER BY n DESC, path ASC LIMIT 20""",

    // next-pair replay: one lead window over the same total order
    "q_events_nextpred" -> """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
SELECT user_id, event_id, event_type,
  lead(event_type) OVER w AS next_type,
  lead(us) OVER w - us AS gap_micros
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""",

    // MAD replay: positional lower-median twice, integer Hampel compare
    "q_outliers_mad" -> """WITH p AS (
  SELECT event_type AS g, event_id AS id,
    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events),
m AS (SELECT g, v AS med FROM (
        SELECT g, v, id,
          row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
          count(*) OVER (PARTITION BY g) AS n FROM p)
      WHERE rn = (n + 1) // 2),
dv AS (SELECT p.g, p.id, p.v, m.med, abs(p.v - m.med) AS abs_dev
       FROM p JOIN m ON m.g = p.g),
md AS (SELECT g, abs_dev AS mad FROM (
        SELECT g, abs_dev, id,
          row_number() OVER (PARTITION BY g ORDER BY abs_dev, id) AS rn,
          count(*) OVER (PARTITION BY g) AS n FROM dv)
      WHERE rn = (n + 1) // 2)
SELECT dv.g AS grp, dv.id, dv.v, dv.med, md.mad, dv.abs_dev,
  dv.abs_dev > md.mad * 3 AS is_outlier
FROM dv JOIN md ON md.g = dv.g""",

    // greedy earliest-chain funnel replay; scalar subqueries per step
    "q_funnel" -> """WITH s1 AS (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
       JOIN s1 ON s1.u = e.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
       JOIN s2 ON s2.u = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
b AS (SELECT count(*) AS n0 FROM s1)
SELECT 1 AS step_idx, 'view' AS step,
  (SELECT count(*) FROM s1) AS n_users,
  CASE WHEN b.n0 = 0 THEN 0
       ELSE ((SELECT count(*) FROM s1) * 1000) // b.n0 END AS conv_permille
FROM b
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2),
  CASE WHEN b.n0 = 0 THEN 0
       ELSE ((SELECT count(*) FROM s2) * 1000) // b.n0 END FROM b
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3),
  CASE WHEN b.n0 = 0 THEN 0
       ELSE ((SELECT count(*) FROM s3) * 1000) // b.n0 END FROM b""",

    "q_cohort_retention" -> """WITH f AS (
  SELECT user_id AS u, CAST(min(ts) AS DATE) AS cohort_day
  FROM events GROUP BY 1),
sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
       FROM f GROUP BY 1),
act AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
r AS (SELECT f.cohort_day, act.d - f.cohort_day AS day_offset,
        CAST(count(*) AS BIGINT) AS n_active
      FROM act JOIN f ON f.u = act.u
      WHERE act.d - f.cohort_day <= 30 GROUP BY 1, 2)
SELECT r.cohort_day, r.day_offset, r.n_active, sz.cohort_size,
  (r.n_active * 1000) // sz.cohort_size AS retention_permille
FROM r JOIN sz ON sz.cohort_day = r.cohort_day""",

    "q_ts_resample" -> """WITH e AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v FROM events),
a AS (SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(v) AS BIGINT) AS vsum FROM e GROUP BY 1, 2),
s AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM a GROUP BY 1),
grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM s),
j AS (SELECT g.user_id, g.bucket, COALESCE(a.n, 0) AS n, a.vsum
      FROM grid g LEFT JOIN a ON a.user_id = g.user_id AND a.bucket = g.bucket)
SELECT user_id, bucket, n, COALESCE(vsum, 0) AS v_micros,
  last_value(vsum IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill_micros
FROM j""",

    // per-group top-k replay: DuckDB ranks with the window the aggregate
    // form exists to avoid — same (score DESC, id ASC) total order, set
    // semantics irrelevant here because (orderkey·10+linenumber) is unique
    "q_topk_pergroup" -> """SELECT l_suppkey,
  CAST(rank AS INTEGER) AS rank, id, score_cents FROM (
  SELECT l_suppkey,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS score_cents,
    l_orderkey * 10 + l_linenumber AS id,
    row_number() OVER (PARTITION BY l_suppkey ORDER BY
      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DESC,
      l_orderkey * 10 + l_linenumber) AS rank
  FROM lineitem) WHERE rank <= 3""",

    // Benford replay: identical string-prefix digit extraction, identical
    // inlined expectation literals
    "q_dq_benford" -> s"""WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x FROM lineitem
  WHERE CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) > 0),
d AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM v),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM d),
b AS (SELECT unnest([${graft.ext.Quality.benfordPermille.map(_._1).mkString(", ")}]) AS digit,
             unnest([${graft.ext.Quality.benfordPermille.map(_._2).mkString(", ")}]) AS benford_permille)
SELECT g.digit, g.n, (g.n * 1000) // t.tot AS obs_permille,
  CAST(b.benford_permille AS BIGINT) AS benford_permille,
  abs((g.n * 1000) // t.tot - b.benford_permille) AS dev_permille
FROM g CROSS JOIN t JOIN b ON b.digit = g.digit""",

    // concentration replay: the same single-rational Gini over ascending
    // group sizes (two separately-floored terms would diverge)
    "q_dq_concentration" -> """WITH c AS (
  SELECT source AS g, count(*) AS x FROM documents GROUP BY 1),
r AS (SELECT x, x * row_number() OVER (ORDER BY x, g) AS ix FROM c),
a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(x) AS BIGINT) AS n,
        CAST(sum(ix) AS BIGINT) AS ix, CAST(max(x) AS BIGINT) AS xmax FROM r)
SELECT k, n,
  ((2 * ix - (k + 1) * n) * 1000000) // (k * n) AS gini_micros,
  (xmax * 1000) // n AS top1_permille
FROM a""",

    // long-format audit rows; value is BIGINT everywhere (permille for
    // fractions), passed mirrors the Scala thresholds exactly
    "q_dq_audit" -> """SELECT 'row_count' AS check_name, '*' AS col_name,
  CAST(count(*) AS BIGINT) AS value, count(*) > 0 AS passed FROM orders
UNION ALL SELECT 'completeness_permille', 'o_custkey',
  (count(o_custkey) * 1000) // count(*),
  (count(o_custkey) * 1000) // count(*) >= 1000 FROM orders
UNION ALL SELECT 'completeness_permille', 'o_orderdate',
  (count(o_orderdate) * 1000) // count(*),
  (count(o_orderdate) * 1000) // count(*) >= 1000 FROM orders
UNION ALL SELECT 'completeness_permille', 'o_orderpriority',
  (count(o_orderpriority) * 1000) // count(*),
  (count(o_orderpriority) * 1000) // count(*) >= 1000 FROM orders
UNION ALL SELECT 'key_duplicate_rows', 'o_orderkey',
  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
  count(*) = count(DISTINCT o_orderkey) FROM orders
UNION ALL SELECT 'ri_violations_customer', 'o_custkey',
  CAST(count(*) AS BIGINT), count(*) = 0
  FROM orders o WHERE o.o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",

    "q_part_prune" -> """SELECT event_type, count(*) AS n,
  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS v_micros
FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
GROUP BY event_type""",

    "q_bucket_join" -> """SELECT l_orderkey, o_custkey,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(l_linenumber) AS BIGINT) AS total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_custkey""",

    "q_skew_salted_agg" -> """SELECT l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(l_linenumber) AS BIGINT) AS total
FROM lineitem GROUP BY l_returnflag""",

    "q_skew_salted_join" -> """SELECT s_nationkey,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(l.l_linenumber) AS BIGINT) AS total
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s_nationkey""",

    "q_agg_pricing" -> """SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) / 10000.0 AS sum_disc_price,
  count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q_join_revenue_nation" -> """SELECT n_name,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
  count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",

    "q_topk_orders" -> """SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q_events_hourly" -> """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
  count(*) AS n,
  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_value
FROM events GROUP BY 1, 2""",

    // hopping replay: every event expands into its 4 slide-aligned window
    // starts (floor to the 15-min grid, back-shifted 0..3 slides)
    "q_events_hopping" -> """WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vmic
  FROM events),
x AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
           - k * 900000000) AS window_start,
         event_type, vmic
  FROM e, LATERAL (SELECT unnest(range(4)) AS k))
SELECT window_start, event_type, count(*) AS n,
  CAST(sum(vmic) AS BIGINT) AS sum_value_micros
FROM x GROUP BY 1, 2""",

    // session_window replay: gap-islands with the >= boundary (Spark's
    // session_window starts a new session at an exact-gap tie), session
    // end = last event + the 30-minute gap
    "q_events_sessionwin" -> """WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
    lag(epoch_us(CAST(ts AS TIMESTAMP)))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
    epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
g AS (
  SELECT user_id, ts,
    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800 * 1000000
               THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS sid
  FROM e)
SELECT user_id, min(ts) AS session_start,
  max(ts) + INTERVAL '30 minutes' AS session_end, count(*) AS n
FROM g GROUP BY user_id, sid""",

    // batch twin of the streamed hourly table: tumbling 1-hour windows are
    // epoch-aligned, so window.start ≡ date_trunc('hour'); sums are exact
    // integer micros (quantized before the stream)
    "q_stream_hourly" -> """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
  event_type, count(*) AS n,
  CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
FROM events GROUP BY 1, 2""",

    // batch twin of the streamed hopping table: the same 4-way slide
    // expansion as q_events_hopping (values pre-quantized to micros
    // before the stream, so sums are exact integers)
    "q_stream_hopping" -> """WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vmic
  FROM events),
x AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
           - k * 900000000) AS window_start,
         event_type, vmic
  FROM e, LATERAL (SELECT unnest(range(4)) AS k))
SELECT window_start, event_type, count(*) AS n,
  CAST(sum(vmic) AS BIGINT) AS sum_value
FROM x GROUP BY 1, 2""",

    // batch twin of the streamed top-k: per-hour (value DESC, id ASC)
    // head, distinct (score, id) pairs — TopKAgg's set semantics
    "q_stream_topk" -> """WITH h AS (
  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v, event_id
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL)
SELECT hour, CAST(rank AS INTEGER) AS rank, event_id, v AS value_micros
FROM (SELECT hour, event_id, v,
        row_number() OVER (PARTITION BY hour ORDER BY v DESC, event_id ASC) AS rank
      FROM h)
WHERE rank <= 3""",

    // batch twin of the streamed quantile sketch: per-hour bottom-64
    // distinct (h32(event_id), value-micros) pairs + the shared
    // integer-rank pick — the streamed state-store sketch must equal it
    "q_stream_quantile" -> """WITH hh AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
    (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT) AS h,
    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
sk AS (SELECT hour, h, v FROM (SELECT DISTINCT hour, h, v FROM hh)
       QUALIFY row_number() OVER (PARTITION BY hour ORDER BY h, v) <= 64),
m AS (SELECT hour, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY 1),
ordv AS (SELECT hour, v, row_number() OVER (PARTITION BY hour ORDER BY v) AS rv
         FROM sk),
qs AS (SELECT unnest([500, 900]) AS q_permille),
nn AS (SELECT hour, CAST(count(*) AS BIGINT) AS n FROM hh GROUP BY 1)
SELECT o.hour, q.q_permille, o.v AS est, nn.n
FROM ordv o JOIN m USING (hour) JOIN nn USING (hour) JOIN qs q
  ON o.rv = GREATEST((q.q_permille * m.m + 999) // 1000, 1)""",

    // batch twin of the streamed interval join: signups within the hour
    // before each event, inclusive bounds both ends
    "q_stream_interval" -> """SELECT e.event_id, s.event_id AS s_event_id
FROM events e JOIN (SELECT user_id, event_id, ts FROM events
                    WHERE event_type = 'signup') s
ON e.user_id = s.user_id AND s.ts <= e.ts
   AND s.ts >= CAST(e.ts AS TIMESTAMP) - INTERVAL 1 HOUR""",

    // batch twin of the streamed enrichment: plain left join to the dim
    "q_stream_enrich" -> """SELECT e.event_id, e.user_id, e.event_type,
  c.c_nationkey, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""",

    "q_agg_distinct" -> """SELECT source,
  CAST(count(DISTINCT tok) AS BIGINT) AS vocab, count(*) AS n_tokens
FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY source""",

    "q_agg_rollup" -> """SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
  count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q_agg_cube" -> """SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
  count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",

    "q_agg_pivot" -> """SELECT l_returnflag,
  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_f,
  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(floor(l_quantity * 1.0 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_o
FROM lineitem GROUP BY l_returnflag""",

    "q_events_sessions" -> """WITH g AS (
  SELECT user_id,
    CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM events)
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id""",

    // batch twin of the streamed completed-session table: gap-islands
    // sessionization (boundary when the gap to the previous event of the
    // same user exceeds 30 minutes), one row per island
    "q_stream_sessions" -> """WITH d AS (
  SELECT user_id, ts,
    CASE WHEN prev IS NULL
           OR epoch_us(ts) - epoch_us(prev) > 1800 * 1000000 THEN 1 ELSE 0
    END AS brk
  FROM (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM events)),
s AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sess
  FROM d)
SELECT user_id, min(ts) AS start_ts, max(ts) AS end_ts,
  CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sess"""
  )
}

/** events.parquet's timestamp unit has varied across driver testdata
  * generations: nanosecond files (which Spark's parquet reader has no type
  * for — [PARQUET_TYPE_ILLEGAL] — so the legacy conf reads them as raw
  * Long nanos) and plain microsecond files (read as TIMESTAMP_NTZ, since
  * isAdjustedToUTC=false). Dispatch on the loaded schema and normalize
  * both to a session-TZ microsecond TimestampType — the session TZ is
  * UTC everywhere, so the NTZ cast is identity on the micros value, and
  * the oracle's TIMESTAMP_NS/NTZ → TIMESTAMP cast lands on the same
  * instants.
  */
object EventsSource {
  def load(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: `/` on Long is DOUBLE division and nano epochs
        // exceed 2^53, so `/1000` rounds the microsecond (off-by-1 vs the
        // oracle's exact ns→µs truncation)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
