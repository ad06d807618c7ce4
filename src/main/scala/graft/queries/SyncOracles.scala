package graft.queries

/** DuckDB oracle SQL twins for [[SyncQueries]].
  *
  * The fixture CTEs reproduce [[graft.sync.SyncFixtures]] arithmetic
  * EXACTLY — any change there must be mirrored here. All expressions are
  * integer/verbatim-copy/single-IEEE-op so Spark and DuckDB agree
  * bit-for-bit.
  */
object SyncOracles {

  /** DuckDB twin of SyncFixtures.widePayload: `PayloadBlocks` md5 blocks of
    * the decimal string of SysRowVersion+j (version-dependent payload; block
    * count stays in lockstep via the shared constant). */
  private val payloadSql: String =
    (0 until graft.sync.SyncFixtures.PayloadBlocks)
      .map(j => s"md5(CAST(SysRowVersion + $j AS VARCHAR))")
      .mkString(" || ")

  /** WITH prefix shared by the maintained-IVF twins: the ivfLakeFixture
    * states (initial = the %5==1 band NEGATED, final = the %9==4 deletes
    * applied, true embeddings everywhere) quantized as nt/nf, plus the
    * unrolled integer-Lloyd CTEs training on the INITIAL state and
    * assigning the FINAL state — closing CTE `asg` = (vec_id, cluster). */
  private val ivfMaintainPrefix: String = s"""WITH ini AS (
  SELECT vec_id,
    CASE WHEN vec_id % 5 = 1 THEN list_transform(embedding, x -> -x)
         ELSE embedding END AS embedding
  FROM embeddings),
fin AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 9 <> 4),
nt AS (${graft.ext.KMeans.quantSelect("ini")}),
nf AS (${graft.ext.KMeans.quantSelect("fin")}),
""" + graft.ext.KMeans.trainAssignCteSql(8, 3, 64, "nt", "nf")

  /** Shared fixture CTE prefix (unused CTEs are free in DuckDB, and the
    * payload layer is projection-pruned unless a query reads it). */
  val prefix: String = s"""WITH li AS (
  SELECT *, ((l_orderkey * 8 + l_linenumber) * 262144 + l_partkey) * 2048 + l_suppkey AS RecId
  FROM lineitem
), mark AS (
  SELECT max(RecId) AS stored_mark FROM li
), src0 AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, RecId,
         RecId + CASE WHEN RecId % 20 = 3 THEN 10000000000000000 ELSE 0 END AS SysRowVersion,
         CASE WHEN RecId % 20 = 3 THEN 2 ELSE 1 END AS RECVERSION,
         l_shipdate AS CREATEDDATETIME,
         CASE WHEN RecId % 20 = 3 THEN l_shipdate + INTERVAL 30 DAY ELSE l_shipdate END AS MODIFIEDDATETIME
  FROM li WHERE RecId % 97 <> 0
), src AS (
  SELECT *, $payloadSql AS payload FROM src0
), tgt0 AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, RecId,
         RecId + CASE WHEN RecId % 131 = 5 THEN 20000000000000000 ELSE 0 END AS SysRowVersion,
         1 AS RECVERSION,
         l_shipdate AS CREATEDDATETIME,
         l_shipdate AS MODIFIEDDATETIME
  FROM li WHERE RecId % 89 <> 0
), tgt AS (
  SELECT *, $payloadSql AS payload FROM tgt0
), src50_0 AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, RecId,
         RecId + CASE WHEN RecId % 2 = 1 THEN 10000000000000000 ELSE 0 END AS SysRowVersion,
         CASE WHEN RecId % 2 = 1 THEN 2 ELSE 1 END AS RECVERSION,
         l_shipdate AS CREATEDDATETIME,
         CASE WHEN RecId % 2 = 1 THEN l_shipdate + INTERVAL 30 DAY ELSE l_shipdate END AS MODIFIEDDATETIME
  FROM li WHERE 1 = 1
), src50 AS (
  SELECT *, $payloadSql AS payload FROM src50_0
), perf0 AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, RecId,
         RecId AS SysRowVersion, 1 AS RECVERSION,
         l_shipdate AS CREATEDDATETIME, l_shipdate AS MODIFIEDDATETIME
  FROM li
), perf AS (
  SELECT *, $payloadSql AS payload FROM perf0
)
"""

  private val outCols = "RecId, SysRowVersion, RECVERSION, l_quantity, l_extendedprice, l_returnflag"

  private val classifySql = """SELECT COALESCE(s.RecId, t.RecId) AS RecId,
  CASE WHEN t.RecId IS NULL THEN 'NEW'
       WHEN s.RecId IS NULL THEN 'DELETED'
       WHEN s.RECVERSION = t.RECVERSION
            AND s.CREATEDDATETIME IS NOT DISTINCT FROM t.CREATEDDATETIME
            AND s.MODIFIEDDATETIME IS NOT DISTINCT FROM t.MODIFIEDDATETIME THEN 'UNCHANGED'
       ELSE 'MODIFIED' END AS change_type
FROM src s FULL OUTER JOIN tgt t ON s.RecId = t.RecId"""

  private def plannerSql(controlCte: String, targetCte: String): String =
    s"""SELECT source_window, changed, target_count, missing, change_pct, excess_pct,
  CASE WHEN changed = 0 AND missing = 0 AND target_count <= source_window THEN 'NOOP'
       WHEN change_pct >= 40.0 OR excess_pct >= 40.0 THEN 'TRUNCATE'
       ELSE 'INCREMENTAL' END AS mode
FROM (SELECT c.source_window, c.changed, t.target_count, m.missing,
  CASE WHEN c.source_window = 0 THEN 100.0
       ELSE c.changed * 100.0 / c.source_window END AS change_pct,
  CASE WHEN c.source_window = 0 THEN 100.0
       ELSE (t.target_count - c.source_window) * 100.0 / c.source_window END AS excess_pct
FROM (SELECT count(*) AS source_window,
             CAST(coalesce(sum(CASE WHEN s.SysRowVersion > (SELECT stored_mark FROM mark) THEN 1 ELSE 0 END), 0) AS BIGINT) AS changed
      FROM $controlCte s) c,
     (SELECT count(*) AS target_count FROM $targetCte) t,
     (SELECT count(*) AS missing FROM $controlCte s
      WHERE NOT EXISTS (SELECT 1 FROM $targetCte t2 WHERE t2.RecId = s.RecId)) m)"""

  def oracles: Map[String, String] = Map(
    "q_s5_topn" ->
      (prefix + "SELECT RecId, SysRowVersion, l_orderkey, l_quantity FROM src ORDER BY RecId DESC LIMIT 1000"),

    "q_s7_control" ->
      (prefix + "SELECT RecId, SysRowVersion FROM src ORDER BY RecId DESC LIMIT 5000"),

    "q_fixture_payload" ->
      (prefix + "SELECT RecId, payload FROM src ORDER BY RecId DESC LIMIT 2000"),

    "q_s8_delta" ->
      (prefix + """SELECT RecId, SysRowVersion, RECVERSION FROM src
WHERE SysRowVersion >= (SELECT stored_mark FROM mark) AND RecId >= 0
ORDER BY RecId DESC LIMIT 2000000"""),

    "q_s9_modified" ->
      (prefix + """SELECT RecId, MODIFIEDDATETIME FROM src
WHERE MODIFIEDDATETIME > (SELECT max(l_shipdate) - INTERVAL 90 DAY FROM li)"""),

    "q_s6_customsql" ->
      (prefix + """SELECT RecId, SysRowVersion, l_quantity FROM src
WHERE SysRowVersion >= (SELECT stored_mark FROM mark)
ORDER BY RecId DESC LIMIT 3000"""),

    "q_window_running" ->
      (prefix + """SELECT RecId, l_suppkey,
  CAST(sum(CAST(l_quantity AS BIGINT))
    OVER (PARTITION BY l_suppkey ORDER BY RecId
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
FROM li"""),

    "q_j1_classify" -> (prefix + classifySql),

    "q_j1_fallback" ->
      (prefix + """SELECT COALESCE(s.RecId, t.RecId) AS RecId,
  CASE WHEN t.RecId IS NULL THEN 'NEW'
       WHEN s.RecId IS NULL THEN 'DELETED'
       WHEN s.RECVERSION = 1 AND t.RECVERSION = 1
         THEN (CASE WHEN s.RecId <= (SELECT stored_mark - 1000 FROM mark)
                    THEN 'UNCHANGED' ELSE 'MODIFIED' END)
       WHEN s.RECVERSION = t.RECVERSION THEN 'UNCHANGED'
       ELSE 'MODIFIED' END AS change_type
FROM src s FULL OUTER JOIN tgt t ON s.RecId = t.RecId"""),

    "q_a4_counts" ->
      (prefix + s"SELECT change_type, count(*) AS n FROM ($classifySql) GROUP BY change_type"),

    "q_j2_missing" ->
      (prefix + """SELECT s.RecId FROM src s
WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.RecId = s.RecId)"""),

    "q_j3_notinsource" ->
      (prefix + """SELECT t.RecId FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.RecId = t.RecId)"""),

    "q_j4_changed" ->
      (prefix + """SELECT t.RecId FROM tgt t
WHERE EXISTS (SELECT 1 FROM src s
              WHERE s.RecId = t.RecId
                AND s.SysRowVersion > (SELECT stored_mark FROM mark))"""),

    "q_so2_delete_keys" ->
      (prefix + """SELECT t.RecId FROM tgt t
WHERE EXISTS (SELECT 1 FROM src s
              WHERE s.RecId = t.RecId
                AND s.SysRowVersion > (SELECT stored_mark FROM mark))
UNION
SELECT t.RecId FROM tgt t WHERE t.SysRowVersion > (SELECT stored_mark FROM mark)
UNION
SELECT t.RecId FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.RecId = t.RecId)"""),

    "q_a_marks" ->
      (prefix + """SELECT s.max_src_version, s.min_src_recid, s.max_src_recid, s.src_cnt,
       t.max_tgt_version, t.tgt_cnt
FROM (SELECT max(SysRowVersion) AS max_src_version, min(RecId) AS min_src_recid,
             max(RecId) AS max_src_recid, count(*) AS src_cnt FROM src) s,
     (SELECT max(SysRowVersion) AS max_tgt_version, count(*) AS tgt_cnt FROM tgt) t"""),

    // Incremental merge converges the target to the source window exactly
    // (locally-mutated rows are purged by delete 2-of-3 and re-inserted).
    "q_m2_incremental" -> (prefix + s"SELECT $outCols FROM src"),

    // base + delta commit + replay ≡ the in-memory incremental merge
    "q_lake_replay" -> (prefix + s"SELECT $outCols FROM src"),

    // as-of BETWEEN commit stamps 1000 and 2000 = exactly the commit-1
    // state (the later band-delete is excluded by the timestamp cut)
    "q_lake_asof_ts" -> (prefix + s"SELECT $outCols FROM src"),

    // partially-compacted state ≡ band upsert applied to tgt: tgt rows
    // whose key is outside the band's SOURCE keys, plus the band's source
    // rows (the manifest-carried files supply everything outside the band)
    "q_lake_compact_partial" -> (prefix + s"""SELECT $outCols FROM tgt
WHERE RecId NOT IN (SELECT RecId FROM src
                    WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                    AND ${graft.sync.SyncFixtures.SkipHi})
UNION ALL
SELECT $outCols FROM src
WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                AND ${graft.sync.SyncFixtures.SkipHi}"""),

    // replayed state ≡ src; the skip read is that state range-filtered
    "q_lake_skip" -> (prefix + s"""SELECT $outCols FROM src
WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo} AND ${graft.sync.SyncFixtures.SkipHi}"""),

    // version-threshold twin: replayed state (tgt with the hi band
    // upserted; the low re-upsert is value-identical) filtered to the
    // threshold — ≡ readVersionFrom's pruned plan
    "q_lake_skip_version" -> (prefix + s""", up AS (
  SELECT * FROM src WHERE RecId % 20 = 3 AND RecId % 131 <> 5)
SELECT $outCols FROM (
  SELECT $outCols FROM tgt WHERE RecId NOT IN (SELECT RecId FROM up)
  UNION ALL
  SELECT $outCols FROM up
) WHERE SysRowVersion >= 10000000000000000"""),

    // custom-band twin (v4): same replayed state thresholded on the
    // RECVERSION counter (tgt rows carry 1, the upserted band carries 2)
    "q_lake_skip_version_custom" -> (prefix + s""", up AS (
  SELECT * FROM src WHERE RecId % 20 = 3 AND RecId % 131 <> 5)
SELECT $outCols FROM (
  SELECT $outCols FROM tgt WHERE RecId NOT IN (SELECT RecId FROM up)
  UNION ALL
  SELECT $outCols FROM up
) WHERE RECVERSION >= 2"""),

    // maintained counts ≡ direct counts over the final replayed state:
    // (tgt minus upserted keys minus band keys) ∪ (upserts outside the band)
    "q_cdf_maintain" -> (prefix + s"""SELECT l_returnflag,
  CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT l_returnflag FROM tgt
  WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
    AND RecId NOT IN (SELECT RecId FROM src
                      WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                      AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT l_returnflag FROM src
  WHERE RecId % 20 = 3
    AND RecId NOT BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                      AND ${graft.sync.SyncFixtures.SkipHi}
) GROUP BY l_returnflag"""),

    // max twin: ≡ direct max over the same final state
    "q_cdf_maintain_max" -> (prefix + s"""SELECT l_returnflag,
  CAST(max(SysRowVersion) AS BIGINT) AS mx
FROM (
  SELECT l_returnflag, SysRowVersion FROM tgt
  WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
    AND RecId NOT IN (SELECT RecId FROM src
                      WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                      AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT l_returnflag, SysRowVersion FROM src
  WHERE RecId % 20 = 3
    AND RecId NOT BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                      AND ${graft.sync.SyncFixtures.SkipHi}
) GROUP BY l_returnflag"""),

    // streamed bootstrap + changed-band micro-batch ≡ upsert of the band
    // into the stale target (upsert-only: tgt-only keys survive)
    "q_stream_sync" -> (prefix + s"""SELECT $outCols FROM tgt
WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
UNION ALL
SELECT $outCols FROM src WHERE RecId % 20 = 3"""),

    // drift-report twin: per-column null-safe-difference counts over the
    // matched keys, one UNION ALL branch per compared column
    "q_column_drift" -> (prefix +
      Seq("SysRowVersion", "RECVERSION", "l_quantity",
          "l_extendedprice", "l_returnflag").map { c =>
        s"""SELECT '$c' AS column_name,
  CAST(sum(CASE WHEN s.$c IS DISTINCT FROM t.$c THEN 1 ELSE 0 END) AS BIGINT)
    AS n_changed,
  count(*) AS n_compared
FROM src s JOIN tgt t ON s.RecId = t.RecId"""
      }.mkString("\nUNION ALL\n")),

    // maintained-distinct twin: HLL registers built DIRECTLY over the same
    // final state (identical to the maintained merge — per-bucket max),
    // estimate replayed with the shared bucket/rank/alpha arithmetic
    "q_cdf_maintain_distinct" -> (prefix + s""", fin AS (
  SELECT l_returnflag, SysRowVersion FROM tgt
  WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
    AND RecId NOT IN (SELECT RecId FROM src
                      WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                      AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT l_returnflag, SysRowVersion FROM src
  WHERE RecId % 20 = 3
    AND RecId NOT BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                      AND ${graft.sync.SyncFixtures.SkipHi}
), hh AS (
  SELECT l_returnflag,
    (('0x' || substr(md5(CAST(SysRowVersion AS VARCHAR)), 1, 8))::BIGINT) AS h
  FROM fin
), bb AS (
  SELECT l_returnflag, h % 256 AS bucket,
    CASE WHEN (h >> 8) = 0 THEN 25
         ELSE 24 - length(bin(h >> 8)) + 1 END AS r
  FROM hh
), regs AS (
  SELECT l_returnflag, bucket, max(r) AS mr FROM bb GROUP BY 1, 2
), ssum AS (
  SELECT l_returnflag,
    sum(1.0 / CAST((CAST(1 AS BIGINT) << mr) AS DOUBLE))
      + (256 - count(*)) * 1.0 AS s
  FROM regs GROUP BY l_returnflag)
SELECT l_returnflag,
  CAST(floor(${graft.ext.Hll.alphaM2(8)} / s) AS BIGINT) AS est_floor
FROM ssum"""),

    // SCD-2 replay: the same per-key event timeline (start row at t=-1,
    // commit-k tombstone at 2k, insert at 2k+1), a version closes at the
    // next event's seq; version rows = start + inserts
    "q_scd2_history" -> (prefix + s""", ev AS (
  SELECT RecId, RECVERSION, -1 AS _t, CAST(NULL AS BIGINT) AS _from FROM tgt
  UNION ALL
  SELECT RecId, CAST(NULL AS INTEGER), 0, 0 FROM src WHERE RecId % 20 = 3
  UNION ALL
  SELECT RecId, RECVERSION, 1, 0 FROM src WHERE RecId % 20 = 3
  UNION ALL
  SELECT RecId, CAST(NULL AS INTEGER), 2, 1 FROM src
  WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                  AND ${graft.sync.SyncFixtures.SkipHi}
),
w AS (
  SELECT RecId, RECVERSION, _t, _from,
    lead(_from) OVER (PARTITION BY RecId ORDER BY _t) AS valid_to_seq
  FROM ev)
SELECT RecId, RECVERSION, _from AS valid_from_seq, valid_to_seq
FROM w WHERE _t = -1 OR _t % 2 = 1"""),

    // PIT replay: the history CTE chain, open bounds clamped, then the
    // half-open point predicate per probe
    "q_scd2_pit" -> (prefix + s""", ev AS (
  SELECT RecId, RECVERSION, -1 AS _t, CAST(NULL AS BIGINT) AS _from FROM tgt
  UNION ALL
  SELECT RecId, CAST(NULL AS INTEGER), 0, 0 FROM src WHERE RecId % 20 = 3
  UNION ALL
  SELECT RecId, RECVERSION, 1, 0 FROM src WHERE RecId % 20 = 3
  UNION ALL
  SELECT RecId, CAST(NULL AS INTEGER), 2, 1 FROM src
  WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                  AND ${graft.sync.SyncFixtures.SkipHi}
),
w AS (
  SELECT RecId, RECVERSION, _t, _from,
    lead(_from) OVER (PARTITION BY RecId ORDER BY _t) AS valid_to_seq
  FROM ev),
hist AS (
  SELECT RecId, RECVERSION,
    COALESCE(_from, -1) AS vf, COALESCE(valid_to_seq, 2) AS vt
  FROM w WHERE _t = -1 OR _t % 2 = 1),
probe AS (SELECT RecId, RecId % 2 AS as_of FROM tgt)
SELECT p.RecId, p.as_of, h.RECVERSION AS iv_RECVERSION
FROM probe p JOIN hist h ON h.RecId = p.RecId
WHERE p.as_of >= h.vf AND p.as_of < h.vt"""),

    // min twin: ≡ direct min over the same final state
    "q_cdf_maintain_min" -> (prefix + s"""SELECT l_returnflag,
  CAST(min(SysRowVersion) AS BIGINT) AS mn
FROM (
  SELECT l_returnflag, SysRowVersion FROM tgt
  WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
    AND RecId NOT IN (SELECT RecId FROM src
                      WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                      AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT l_returnflag, SysRowVersion FROM src
  WHERE RecId % 20 = 3
    AND RecId NOT BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                      AND ${graft.sync.SyncFixtures.SkipHi}
) GROUP BY l_returnflag"""),

    // quantile twin: the maintained sketch must equal the DIRECT
    // hash-bottom-k sketch over the same final state (k = 64; same
    // (h, v)-ordered distinct sample + integer rank pick as
    // q_quantile_sketch)
    "q_cdf_maintain_quantile" -> (prefix + s""", fin AS (
  SELECT RecId, l_returnflag, RECVERSION FROM tgt
  WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
    AND RecId NOT IN (SELECT RecId FROM src
                      WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                      AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT RecId, l_returnflag, RECVERSION FROM src
  WHERE RecId % 20 = 3
    AND RecId NOT BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                      AND ${graft.sync.SyncFixtures.SkipHi}),
hh AS (SELECT l_returnflag,
         (('0x' || substr(md5(CAST(RecId AS VARCHAR)), 1, 8))::BIGINT) AS h,
         CAST(RECVERSION AS BIGINT) AS v
       FROM fin WHERE RECVERSION IS NOT NULL AND RecId IS NOT NULL),
sk AS (SELECT l_returnflag, h, v
       FROM (SELECT DISTINCT l_returnflag, h, v FROM hh)
       QUALIFY row_number() OVER (PARTITION BY l_returnflag ORDER BY h, v) <= 64),
m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS m FROM sk GROUP BY 1),
ordv AS (SELECT l_returnflag, v,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rv
         FROM sk),
qs AS (SELECT unnest([250, 500, 750, 900]) AS q_permille)
SELECT o.l_returnflag, q.q_permille, o.v AS est
FROM ordv o JOIN m USING (l_returnflag) JOIN qs q
  ON o.rv = GREATEST((q.q_permille * m.m + 999) // 1000, 1)"""),

    // sum twin of q_cdf_maintain over the same final state
    "q_cdf_maintain_sum" -> (prefix + s"""SELECT l_returnflag,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(RECVERSION) AS BIGINT) AS total
FROM (
  SELECT l_returnflag, RECVERSION FROM tgt
  WHERE RecId NOT IN (SELECT RecId FROM src WHERE RecId % 20 = 3)
    AND RecId NOT IN (SELECT RecId FROM src
                      WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                                      AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT l_returnflag, RECVERSION FROM src
  WHERE RecId % 20 = 3
    AND RecId NOT BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                      AND ${graft.sync.SyncFixtures.SkipHi}
) GROUP BY l_returnflag"""),

    // bm25 twin: maintained (df, max_tf, n_docs, tot_len) ≡ a DIRECT
    // rebuild over the replayed final state — documents minus the %9==4
    // deletes, with true text everywhere (the %5==1 'zzqx'-mangled band
    // was upserted back to source text before the deletes)
    "q_cdf_maintain_bm25" -> """WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM fin)
  WHERE len(t) > 0),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
stats AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM fin) AS n_docs,
                 (SELECT CAST(count(*) AS BIGINT) FROM toks) AS tot_len)
SELECT d.term, d.df, m.max_tf, s.n_docs, s.tot_len
FROM (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY term) d
JOIN (SELECT term, CAST(max(tf) AS BIGINT) AS max_tf FROM tf GROUP BY term) m
  USING (term)
CROSS JOIN stats s""",

    // serve-from-maintained-stats twin: ≡ a from-scratch BM25 over the
    // same replayed final state (the q_text_bm25 arithmetic with a `fin`
    // CTE in place of the raw table)
    "q_bm25_maintained_serve" -> """WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
lens AS (
  SELECT doc_id,
    len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS len
  FROM fin),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len) AS BIGINT) AS tot_len FROM lens),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM fin),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term IN ('customer', 'window', 'stream') GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT t.doc_id,
    CAST(floor(1000000.0 * (
      ((CAST(s.n_docs - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5)) *
      ((CAST(t.tf AS DOUBLE) * 2.2) /
       (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
         (CAST(l.len AS DOUBLE) /
          (CAST(s.tot_len AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))))) AS BIGINT)
      AS contrib_micro
  FROM tf t JOIN dfreq f USING (term) JOIN lens l USING (doc_id), stats s),
scored AS (SELECT doc_id, CAST(SUM(contrib_micro) AS BIGINT) AS score_micro
           FROM contrib GROUP BY 1)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, score_micro FROM (
  SELECT doc_id, score_micro,
    row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scored) WHERE rank <= 10""",

    // maintained-feature-table twin: ≡ from-scratch per-doc features over
    // the replayed final state (the q_text_quality arithmetic + n_tokens,
    // generated from the same shared CTE builder)
    "q_cdf_maintain_docfeatures" -> (s"""WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
${ExtQueries.docFeaturesCtesSql("fin")}
SELECT doc_id, quality, lang_pred, n_tokens FROM feat"""),

    // serve-from-maintained-features twin: the q_corpus_shards curation
    // gate over the replayed final state, features re-derived from scratch
    "q_docfeatures_maintained_serve" -> (s"""WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
${ExtQueries.docFeaturesCtesSql("fin")}
SELECT f.doc_id, f.quality, f.n_tokens,
  CAST(len(fin.text) AS BIGINT) AS n_chars
FROM feat f JOIN fin USING (doc_id)
WHERE f.quality >= 0.55 AND f.lang_pred = 'en'"""),

    // serve-from-maintained-features token-budget twin: the q_token_budget
    // allocation rule (quality-ordered running token sum) over the
    // replayed final state, features re-derived from scratch
    "q_token_budget_maintained_serve" -> (s"""WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
${ExtQueries.docFeaturesCtesSql("fin")},
sel AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
      sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS running
    FROM feat) WHERE running <= 5000)
SELECT s.doc_id, s.n_tokens, CAST(len(fin.text) AS BIGINT) AS n_chars
FROM sel s JOIN fin USING (doc_id)"""),

    // maintained-minhash twin: the maintained band index ≡ a from-scratch
    // band derivation over the replayed final state (documents minus the
    // %9==4 deletes, true text everywhere) — banding CTEs generated from
    // the same constants as the Scala path
    "q_cdf_maintain_minhash" -> (s"""WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
${ExtQueries.minhashBandsCtesSql("fin")}
SELECT sid AS doc_id, band, bsig FROM bands"""),

    // serve-from-maintained-band-index twin: near-dup pairs over the
    // replayed final state with candidates from the same from-scratch
    // banding — the q_dedup_minhash arithmetic with `fin` in place of
    // the raw table
    "q_minhash_maintained_serve" -> (s"""WITH fin AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 <> 4),
${ExtQueries.minhashBandsCtesSql("fin")},
${ExtQueries.minhashVerifyTailSql}"""),

    // maintained-IVF twin: the maintained postings ≡ a from-scratch
    // nearest-centroid assignment of the replayed final state (documents
    // minus the %9==4 deletes, true embeddings everywhere) under centroids
    // trained on the INITIAL state (%5==1 band negated) — the unrolled
    // integer-Lloyd CTEs from KMeans, training src and assignment src
    // deliberately different
    "q_cdf_maintain_ivf" -> (ivfMaintainPrefix +
      "SELECT vec_id, cluster FROM asg"),

    // serve-from-maintained-postings twin: IVF top-3 over the replayed
    // final state with clusters from the same from-scratch assignment —
    // the q_sim_ivf arithmetic with `asg`-joined clusters in place of the
    // label column
    "q_ivf_maintained_serve" -> (ivfMaintainPrefix + s""", nn AS (
  SELECT f.vec_id, a.cluster, f.qe,
    sqrt(CAST(list_sum(list_transform(f.qe, x -> x * x)) AS DOUBLE)) AS nrm
  FROM nf f JOIN asg a USING (vec_id)),
p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
  (CAST(list_sum(list_transform(range(64), i -> a.qe[i+1] * b.qe[i+1])) AS DOUBLE)
   / a.nrm) / b.nrm AS cos
  FROM nn a JOIN nn b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM p) WHERE rank <= 3"""),

    // composed range+version twin: the q_lake_skip_version final state,
    // doubly filtered
    "q_lake_skip_rangeversion" -> (prefix + s""", up AS (
  SELECT * FROM src WHERE RecId % 20 = 3 AND RecId % 131 <> 5)
SELECT $outCols FROM (
  SELECT $outCols FROM tgt WHERE RecId NOT IN (SELECT RecId FROM up)
  UNION ALL
  SELECT $outCols FROM up
) WHERE SysRowVersion >= 10000000000000000
  AND RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                AND ${graft.sync.SyncFixtures.SkipHi}"""),

    // change-data feed: commit 0 upserts the changed band (tombstone +
    // payload re-insert per key), commit 1 tombstones the skip band —
    // the feed is exactly those events, deletes key-only
    "q_lake_cdf" -> (prefix + s"""SELECT $outCols, 'insert' AS _op, 0 AS _seq
FROM src WHERE RecId % 20 = 3
UNION ALL
SELECT RecId, NULL, NULL, NULL, NULL, NULL, 'delete', 0
FROM src WHERE RecId % 20 = 3
UNION ALL
SELECT RecId, NULL, NULL, NULL, NULL, NULL, 'delete', 1
FROM src WHERE RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo} AND ${graft.sync.SyncFixtures.SkipHi}"""),

    // net snapshot diff: closed-form after-state (c3 re-insert wins, then
    // band delete, then c1 upsert, then base), full-outer vs the base with
    // null-safe column equality filtering the NET no-ops
    "q_lake_diff" -> (prefix + s""", aft AS (
  SELECT * FROM tgt WHERE RecId % 23 = 7
  UNION ALL
  SELECT * FROM src WHERE RecId % 20 = 3
    AND NOT (RecId % 89 <> 0 AND RecId % 23 = 7)
    AND NOT (RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                       AND ${graft.sync.SyncFixtures.SkipHi})
  UNION ALL
  SELECT * FROM tgt WHERE RecId % 23 <> 7
    AND NOT (RecId % 97 <> 0 AND RecId % 20 = 3)
    -- the band tombstones come FROM src, so band keys absent from src
    -- (RecId % 97 = 0) are never deleted
    AND NOT (RecId % 97 <> 0
             AND RecId BETWEEN ${graft.sync.SyncFixtures.SkipLo}
                           AND ${graft.sync.SyncFixtures.SkipHi}))
SELECT COALESCE(a.RecId, b.RecId) AS RecId,
  CASE WHEN b.RecId IS NULL THEN 'insert'
       WHEN a.RecId IS NULL THEN 'delete'
       ELSE 'update' END AS change_type,
  a.SysRowVersion, a.RECVERSION, a.l_quantity, a.l_extendedprice, a.l_returnflag
FROM aft a FULL OUTER JOIN tgt b ON a.RecId = b.RecId
WHERE NOT (a.RecId IS NOT NULL AND b.RecId IS NOT NULL
  AND a.SysRowVersion IS NOT DISTINCT FROM b.SysRowVersion
  AND a.RECVERSION IS NOT DISTINCT FROM b.RECVERSION
  AND a.l_quantity IS NOT DISTINCT FROM b.l_quantity
  AND a.l_extendedprice IS NOT DISTINCT FROM b.l_extendedprice
  AND a.l_returnflag IS NOT DISTINCT FROM b.l_returnflag)"""),

    // Standard (J1-classified) merge: UNCHANGED keys keep the TARGET row —
    // J1 compares RECVERSION/datetimes, not SysRowVersion, so a target row
    // with a local version bump but equal comparison columns survives
    // untouched (no delete 2-of-3 in standard mode).
    "q_m1_standard" ->
      (prefix + s"""SELECT ${outCols.split(", ").map("t." + _).mkString(", ")} FROM tgt t
WHERE EXISTS (SELECT 1 FROM src s WHERE s.RecId = t.RecId
  AND s.RECVERSION = t.RECVERSION
  AND s.CREATEDDATETIME IS NOT DISTINCT FROM t.CREATEDDATETIME
  AND s.MODIFIEDDATETIME IS NOT DISTINCT FROM t.MODIFIEDDATETIME)
UNION ALL
SELECT ${outCols.split(", ").map("s." + _).mkString(", ")} FROM src s
WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.RecId = s.RecId
  AND s.RECVERSION = t.RECVERSION
  AND s.CREATEDDATETIME IS NOT DISTINCT FROM t.CREATEDDATETIME
  AND s.MODIFIEDDATETIME IS NOT DISTINCT FROM t.MODIFIEDDATETIME)"""),

    "q_m1_window" ->
      (prefix + s""", w AS (SELECT $outCols FROM src ORDER BY RecId DESC LIMIT 2000)
SELECT $outCols FROM tgt WHERE RecId < (SELECT min(RecId) FROM w)
UNION ALL SELECT $outCols FROM w"""),

    "q_m3_truncate" -> (prefix + s"SELECT $outCols FROM src50"),

    "q_planner_decide" -> (prefix + plannerSql("src", "tgt")),
    "q_planner_noop" -> (prefix + plannerSql("perf", "perf")),
    "q_planner_truncate" -> (prefix + plannerSql("src50", "tgt")),

    "q_discovery" -> ("""SELECT * FROM (
SELECT 'region' AS table_name, count(*) AS row_count FROM region
UNION ALL SELECT 'nation', count(*) FROM nation
UNION ALL SELECT 'customer', count(*) FROM customer
UNION ALL SELECT 'supplier', count(*) FROM supplier
UNION ALL SELECT 'part', count(*) FROM part
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'events', count(*) FROM events
UNION ALL SELECT 'documents', count(*) FROM documents
UNION ALL SELECT 'embeddings', count(*) FROM embeddings
) WHERE row_count > 0"""),

    // S10 source-format round trips: the oracle aggregates the PARQUET
    // table directly — a match proves the engine's CSV/JSON export+read
    // is lossless (per-string hash sums, exact cents, counts).
    // DuckDB sum(BIGINT) returns HUGEINT → cast back.
    "q_src_csv" -> ("""SELECT s_nationkey,
  count(*) AS n,
  CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents,
  CAST(sum(('0x' || substr(md5(s_name), 1, 8))::BIGINT) AS BIGINT) AS name_check
FROM supplier GROUP BY s_nationkey"""),

    "q_src_orc" -> ("""SELECT p_brand,
  count(*) AS n,
  CAST(sum(p_partkey) AS BIGINT) AS key_sum,
  CAST(sum(p_size) AS BIGINT) AS size_sum,
  CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents,
  CAST(sum(('0x' || substr(md5(p_name), 1, 8))::BIGINT) AS BIGINT) AS name_check,
  CAST(sum(('0x' || substr(md5(p_type), 1, 8))::BIGINT) AS BIGINT) AS type_check
FROM part GROUP BY p_brand"""),

    "q_src_json" -> ("""SELECT o_orderstatus,
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  count(*) AS n,
  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents,
  max(o_orderdate) AS max_ts,
  CAST(sum(('0x' || substr(md5(o_orderpriority), 1, 8))::BIGINT) AS BIGINT) AS prio_check
FROM orders GROUP BY o_orderstatus, year(o_orderdate)""")
  )
}
