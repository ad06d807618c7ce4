package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BloomBuildAgg, BloomUtil, FreqSketchAgg}

/** Property tests of the sketch ALGEBRA itself (no Spark session): model
  * update/merge/serialize against brute-force truth over seeded random
  * streams, with random chunkings and random merge-tree shapes — the
  * distributed reality where partials combine in arbitrary order. */
class SketchPropertySpec extends AnyFunSuite {

  private def freqRow(tok: String): InternalRow = InternalRow(UTF8String.fromString(tok))
  private def longRow(v: Long): InternalRow = InternalRow(v)

  /** Build per-chunk MG buffers and merge them in a random tree order. */
  private def mgMergeAll(agg: FreqSketchAgg, chunks: Seq[Seq[String]],
      rnd: scala.util.Random): java.util.HashMap[String, Long] = {
    val bufs = scala.collection.mutable.Buffer(chunks.map { chunk =>
      val b = agg.createAggregationBuffer()
      chunk.foreach(t => agg.update(b, freqRow(t)))
      // serialization round-trip mid-flight, as a shuffle would do
      agg.deserialize(agg.serialize(b))
    }: _*)
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      val merged = agg.merge(bufs(i), bufs.remove(i + 1))
      bufs(i) = merged
    }
    bufs.head
  }

  test("Misra-Gries merged partials obey the N/(capacity+1) undercount bound") {
    val capacity = 32
    val agg = FreqSketchAgg(BoundReference(0, StringType, nullable = true), capacity)
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish stream: few heavy tokens + a long singleton tail
      val n = 1500 + rnd.nextInt(1500)
      val stream = Seq.fill(n) {
        val r = rnd.nextInt(100)
        if (r < 40) s"heavy_${rnd.nextInt(3)}"
        else if (r < 70) s"mid_${rnd.nextInt(20)}"
        else s"tail_${rnd.nextInt(5000)}"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val chunks = stream.grouped(1 + rnd.nextInt(400)).toSeq
      val sketch = mgMergeAll(agg, chunks, rnd)
      val bound = stream.size.toLong / (capacity + 1)

      assert(sketch.size <= capacity, s"seed $seed: state exceeded capacity")
      sketch.forEach { (term, est) =>
        val t = truth(term)
        assert(est <= t && t - est <= bound,
          s"seed $seed: $term est=$est truth=$t bound=$bound")
      }
      truth.foreach { case (term, t) =>
        if (t > bound)
          assert(sketch.containsKey(term),
            s"seed $seed: heavy term $term (freq $t > $bound) missing")
      }
    }
  }

  test("Bloom build/merge/probe: zero false negatives under random chunked builds") {
    val (numBits, numHashes) = BloomUtil.sizing(5000, 0.01)
    val agg = BloomBuildAgg(BoundReference(0, LongType, nullable = true),
      numBits, numHashes)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val keys = Seq.fill(5000)(rnd.nextLong())
      val chunks = keys.grouped(1 + rnd.nextInt(977)).toSeq
      val bufs = chunks.map { chunk =>
        val b = agg.createAggregationBuffer()
        chunk.foreach(k => agg.update(b, longRow(k)))
        agg.deserialize(agg.serialize(b))
      }
      val bits = bufs.reduce(agg.merge)
      keys.foreach(k =>
        assert(BloomUtil.mightContain(bits, k, numHashes),
          s"seed $seed: false negative for $k"))
      // false-positive rate stays in the configured ballpark
      val probes = Seq.fill(20000)(rnd.nextLong())
        .filterNot(keys.toSet)
      val fp = probes.count(BloomUtil.mightContain(bits, _, numHashes))
      assert(fp.toDouble / probes.size < 0.05,
        s"seed $seed: fp rate ${fp.toDouble / probes.size}")
    }
  }

  test("HLL registers are chunking- and merge-order-invariant with " +
      "serialize round-trips; merged estimate tracks the union") {
    val agg = graft.functions.HllSketchAgg(
      BoundReference(0, LongType, nullable = true), p = 8)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val n = 5000 + rnd.nextInt(10000)
      // h32's domain: uniform over the FULL 32 bits (a narrower domain
      // inflates every rank and the estimate with it), with duplicates
      val hashes = Seq.fill(n)(rnd.nextInt().toLong & 0xFFFFFFFFL)
      // reference registers: sequential single-buffer build
      val ref = agg.createAggregationBuffer()
      hashes.foreach(h => agg.update(ref, longRow(h)))
      // random chunking + random merge-tree order + mid-merge serialization
      val bufs = scala.collection.mutable.Buffer(
        hashes.grouped(1 + rnd.nextInt(700)).toSeq.map { chunk =>
          val b = agg.createAggregationBuffer()
          chunk.foreach(h => agg.update(b, longRow(h)))
          agg.deserialize(agg.serialize(b))
        }: _*)
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        val merged = agg.merge(bufs(i), bufs.remove(i + 1))
        bufs(i) = merged
      }
      assert(bufs.head.toSeq == ref.toSeq,
        s"seed $seed: merged registers differ from sequential build")
      // raw estimate vs true distinct: loose 4-sigma band (sigma ~ 6.5% at p=8)
      val m = 256
      val s = ref.map(r => 1.0 / (1L << r)).sum
      val est = graft.ext.Hll.alphaM2(8) / s
      val truth = hashes.distinct.size
      assert(math.abs(est - truth) / truth < 0.26,
        s"seed $seed: est $est vs truth $truth")
    }
  }

  test("quantile hash-bottom-k: any chunking + merge tree + serialize " +
      "round-trip yields exactly the brute-force bottom-k distinct sample") {
    val k = 64
    val agg = graft.functions.QuantileSketchAgg(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true), k)
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(seed)
      val n = 500 + rnd.nextInt(2000)
      // narrow hash domain so duplicate (h, v) pairs occur — the distinct
      // semantics are part of the cross-engine contract
      val pairs = Seq.fill(n)(
        (rnd.nextInt(1 << 12).toLong, rnd.nextInt(50).toLong))
      val bufs = scala.collection.mutable.Buffer(
        pairs.grouped(1 + rnd.nextInt(300)).toSeq.map { chunk =>
          val b = agg.createAggregationBuffer()
          chunk.foreach(p => agg.update(b, InternalRow(p._1, p._2)))
          agg.deserialize(agg.serialize(b))
        }: _*)
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        val merged = agg.merge(bufs(i), bufs.remove(i + 1))
        bufs(i) = merged
      }
      val got = {
        val it = bufs.head.iterator()
        val b = scala.collection.mutable.Buffer.empty[(Long, Long)]
        while (it.hasNext) b += it.next()
        b.toSeq
      }
      val want = pairs.distinct.sorted.take(k)
      assert(got == want, s"seed $seed: sketch content diverged from " +
        s"brute-force bottom-$k distinct")
      // rank estimates off the deterministic sample sit within the
      // 4/sqrt(k) rank band of truth for the mid quantile
      val vals = got.map(_._2).sorted
      val m = vals.size
      val est = vals((((500L * m + 999) / 1000).toInt - 1).max(0))
      val allVals = pairs.distinct.map(_._2).sorted
      val trueRank = allVals.count(_ <= est).toDouble / allVals.size
      assert(math.abs(trueRank - 0.5) < 4.0 / math.sqrt(k.toDouble),
        s"seed $seed: median est rank $trueRank")
    }
  }

  test("top-k aggregate: any chunking + merge tree equals the brute-force " +
      "(score DESC, id ASC) head") {
    val k = 16
    val agg = graft.functions.TopKAgg(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true), k)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(2000)
      // narrow score domain → heavy score ties, id tiebreak exercised
      val rows = (1 to n).map(i => (rnd.nextInt(40).toLong, i.toLong))
      val bufs = scala.collection.mutable.Buffer(
        rows.grouped(1 + rnd.nextInt(250)).toSeq.map { chunk =>
          val b = agg.createAggregationBuffer()
          chunk.foreach(p => agg.update(b, InternalRow(p._1, p._2)))
          agg.deserialize(agg.serialize(b))
        }: _*)
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        val merged = agg.merge(bufs(i), bufs.remove(i + 1))
        bufs(i) = merged
      }
      val got = {
        val it = bufs.head.iterator()
        val b = scala.collection.mutable.Buffer.empty[(Long, Long)]
        while (it.hasNext) b += it.next()
        b.toSeq
      }
      val want = rows.distinct.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == want, s"seed $seed: top-k diverged")
    }
  }
}
