package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.SemiStructured

/** Semi-structured extraction over dirty input — the oracle corpus is all
  * well-formed, so the degradation contract (malformed → null, never an
  * error) is pinned here. */
class SemiStructuredSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dirty = Seq(
    (1L, "a", """{"k": 7, "s": "x"}"""),   // full
    (2L, "a", """{"k": 8}"""),             // missing s
    (3L, "b", """{"s": "y"}"""),           // missing k
    (4L, "b", """not json at all"""),      // malformed
    (5L, "b", null.asInstanceOf[String]),  // null document
    (6L, "b", """{"k": "NaNish"}""")       // wrong type for k
  ).toDF("id", "grp", "props")

  test("extractJson: typed fields, missing/malformed/wrong-type degrade to " +
      "null, original columns kept") {
    val out = SemiStructured.extractJson(dirty, "props",
      Seq("k" -> "BIGINT", "s" -> "STRING"))
    assert(out.columns.toSeq == Seq("id", "grp", "props", "k", "s"))
    val m = out.select("id", "k", "s").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(m(1L) == ((Some(7L), Some("x"))))
    assert(m(2L) == ((Some(8L), None)))
    assert(m(3L) == ((None, Some("y"))))
    assert(m(4L) == ((None, None)), "malformed must degrade, not throw")
    assert(m(5L) == ((None, None)))
    assert(m(6L) == ((None, None)), "untypeable field degrades to null")
  }

  test("jsonAudit counts validity and per-field coverage per group") {
    val audit = SemiStructured.jsonAudit(dirty, "props", "grp",
        Seq("k" -> "BIGINT", "s" -> "STRING"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(audit("a") == ((2L, 2L, 2L, 1L)))
    // b: 4 rows; valid-and-conforming = {3} only (4 malformed, 5 null,
    // 6 parses but k fails BIGINT — schema conformance is part of validity);
    // k covered = none; s covered = {3}
    assert(audit("b") == ((4L, 1L, 0L, 1L)))
  }

  test("an input column named '_sj' is refused, not silently clobbered " +
      "(ADVICE r8: the internal staging column must be guarded like the " +
      "output collisions)") {
    val hasTemp = dirty.withColumnRenamed("grp", "_sj")
    intercept[IllegalArgumentException] {
      SemiStructured.extractJson(hasTemp, "props", Seq("k" -> "BIGINT"))
    }
    intercept[IllegalArgumentException] {
      SemiStructured.jsonAudit(hasTemp, "props", "id", Seq("k" -> "BIGINT"))
    }
  }

  test("jsonAudit distinguishes type-dirty from merely-valid JSON: integer " +
      "tokens conform to BIGINT, floats/bools/quoted numbers do not " +
      "(pins the parser semantics the DuckDB oracle mirrors)") {
    val typed = Seq(
      (1L, "t", """{"k": 7}"""),        // integer token → conformant
      (2L, "t", """{"k": -5}"""),       // negative integer → conformant
      (3L, "t", """{"k": null}"""),     // JSON null → conformant, k not covered
      (4L, "t", """{"k": 2.5}"""),      // float for BIGINT → corrupt
      (5L, "t", """{"k": "42"}"""),     // quoted number: NO coercion → corrupt
      (6L, "t", """{"k": true}""")      // bool → corrupt
    ).toDF("id", "grp", "props")
    val Array(r) = SemiStructured.jsonAudit(typed, "props", "grp",
      Seq("k" -> "BIGINT")).collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 3L, 2L)),
      s"(n, n_valid, n_k) was ${(r.getLong(1), r.getLong(2), r.getLong(3))}")
  }

  test("jsonPath gives the ->> scalar shape for ad hoc predicates") {
    import org.apache.spark.sql.functions.{col, expr}
    val n = dirty
      .select(SemiStructured.jsonPath(col("props"), "k").as("kk"))
      // try_cast: the path is stringly-typed by design — ad hoc predicates
      // over dirty bags must tolerate untypeable values under ANSI mode
      .filter(expr("try_cast(kk AS BIGINT) >= 8")).count()
    assert(n == 1L)
  }
}
