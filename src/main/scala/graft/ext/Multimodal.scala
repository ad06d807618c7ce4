package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §7.4): media as opaque binary payloads
  * with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decode` is a STUB with a
  * deterministic fake (clearly marked below); everything around it — the
  * payload schema, the header layout, the mapPartitions batch shape, the
  * partition-local reuse of the "decoder" — is the real plumbing a codec
  * would drop into.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * materialization); decode is mapPartitions so a real decoder amortizes
  * init per partition, not per row; metadata lives in plain columns so
  * filters on width/format prune BEFORE any payload is decoded.
  */
object Multimodal {

  /** A media cell: binary payload with an 8-byte header (width, height as
    * big-endian int32) followed by the body bytes. */
  case class MediaCell(doc_id: Long, width: Int, height: Int, format: String,
      payload: Array[Byte])

  case class MediaFeature(doc_id: Long, width: Int, height: Int,
      feature_idx: Int, feature_value: Double)

  /** Synthesize payloads from the documents table: header(w,h) ++ utf8 body.
    * Deterministic: w = n_chars % 640 + 1, h = (doc_id*7) % 480 + 1. */
  def synthesizePayloads(spark: SparkSession, sfDir: String): Dataset[MediaCell] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "n_chars")
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, text, nChars) =>
          val w = (nChars % 640 + 1).toInt
          val h = ((id * 7) % 480 + 1).toInt
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val buf = java.nio.ByteBuffer.allocate(8 + body.length)
          buf.putInt(w).putInt(h).put(body)
          MediaCell(id, w, h, "fake/rgb8", buf.array())
        }
      }
  }

  /** "Resize" to a target width: keeps every ceil(w/targetW)-th body byte
    * (nearest-neighbor downsample of the fake 1-byte-per-pixel row) and
    * rewrites the header with the new dimensions. The payload schema stays
    * closed under the operation — downstream decode/feature steps run
    * unchanged on resized cells. */
  def resize(cells: Dataset[MediaCell], targetW: Int): Dataset[MediaCell] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.map { cell =>
        if (cell.width <= targetW) cell
        else {
          val step = math.ceil(cell.width.toDouble / targetW).toInt
          val body = cell.payload.drop(8)
          val sampled = body.indices.collect { case i if i % step == 0 => body(i) }.toArray
          val newW = math.min(targetW, sampled.length.max(1))
          val buf = java.nio.ByteBuffer.allocate(8 + sampled.length)
          buf.putInt(newW).putInt(cell.height).put(sampled)
          MediaCell(cell.doc_id, newW, cell.height, cell.format, buf.array())
        }
      }
    }
  }

  case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame-sampling: split the payload body into fixed-size frames and keep
    * every `stride`-th one — the video-ish access pattern (decode only what
    * survives sampling). Pure per-row byte slicing in mapPartitions; at
    * scale the win is that SAMPLING happens before any expensive decode. */
  def frameSample(cells: Dataset[MediaCell], frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.flatMap { cell =>
        val body = cell.payload.drop(8)
        val nFrames = body.length / frameBytes
        (0 until nFrames by stride).map { f =>
          MediaFrame(cell.doc_id, f, body.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }
  }

  // ------------------------------------------------ RLE codec (real decode)

  /** Aggregate features of a DECODED pixel buffer — every value derives
    * from the expanded pixels, so the oracle row only matches if the
    * byte-level encode → decode round trip is arithmetically right. */
  case class RleFeature(doc_id: Long, n_runs: Int, n_pixels: Long,
      sum_pix: Long, min_pix: Int, max_pix: Int, mean_millis: Long)

  /** Synthesize a REAL run-length-encoded "image" per document — the
    * deterministic-decoder fixture (VERDICT r6 #7): token i of the text
    * becomes the run (count = i%7 + 1, value = len(token)%256), the body
    * is the (count, value) byte pairs, the header carries (total_pixels,
    * 1). Unlike the md5-stub features, the DECODE of these payloads does
    * real codec arithmetic the oracle can audit end to end. */
  def synthesizeRlePayloads(spark: SparkSession, sfDir: String): Dataset[MediaCell] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(" ", -1)
          val body = new Array[Byte](2 * toks.length)
          var px = 0L
          var i = 0
          while (i < toks.length) {
            val cnt = i % 7 + 1
            body(2 * i) = cnt.toByte
            body(2 * i + 1) = (toks(i).length % 256).toByte
            px += cnt
            i += 1
          }
          val buf = java.nio.ByteBuffer.allocate(8 + body.length)
          buf.putInt(px.toInt).putInt(1).put(body)
          MediaCell(id, px.toInt, 1, "fake/rle8", buf.array())
        }
      }
  }

  /** REAL decode: expand each cell's RLE body into its pixel buffer (the
    * step a codec performs), then aggregate the buffer — count/sum/min/max
    * and the integer mean in millis. Everything flows from the payload
    * BYTES, so a broken encoder or decoder fails the oracle compare; the
    * DuckDB twin computes the same statistics from the relational form the
    * fixture was synthesized from. mapPartitions like [[decodeFeatures]]:
    * a real codec would init per partition and stream cells. */
  def decodeRleFeatures(cells: Dataset[MediaCell]): Dataset[RleFeature] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      it.map { cell =>
        val buf = java.nio.ByteBuffer.wrap(cell.payload)
        val declaredPixels = buf.getInt()
        buf.getInt() // height (always 1 for rle8)
        val nRuns = (cell.payload.length - 8) / 2
        // decode: expand runs into the pixel buffer
        val pixels = new Array[Int](declaredPixels)
        var p = 0
        var r = 0
        while (r < nRuns) {
          val cnt = buf.get() & 0xFF
          val v = buf.get() & 0xFF
          var c = 0
          while (c < cnt && p < pixels.length) { pixels(p) = v; p += 1; c += 1 }
          r += 1
        }
        // aggregate the DECODED buffer
        var sum = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var j = 0
        while (j < p) {
          val v = pixels(j); sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          j += 1
        }
        RleFeature(cell.doc_id, nRuns, p.toLong, sum,
          if (p == 0) 0 else mn, if (p == 0) 0 else mx,
          if (p == 0) 0L else sum * 1000L / p)
      }
    }
  }

  /** "Decode" + feature-extract, partition-at-a-time. Parses the real header
    * bytes back out of the payload; the body "decode" is the STUB — a
    * deterministic fake feature vector derived from an md5 of the body
    * (stands in for e.g. a JPEG decode + embedding model). */
  def decodeFeatures(cells: Dataset[MediaCell], nFeatures: Int = 8): Dataset[MediaFeature] = {
    import cells.sparkSession.implicits._
    cells.mapPartitions { it =>
      // per-partition "decoder" init (a real codec/model would load here)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { cell =>
        val buf = java.nio.ByteBuffer.wrap(cell.payload)
        val w = buf.getInt()
        val h = buf.getInt()
        val body = new Array[Byte](cell.payload.length - 8)
        buf.get(body)
        // ---- STUB decode: deterministic fake features from md5(body) ----
        digest.reset()
        val hex = digest.digest(body).take(4).map(b => f"$b%02x").mkString
        val h32 = java.lang.Long.parseLong(hex, 16)
        (0 until nFeatures).map { j =>
          MediaFeature(cell.doc_id, w, h, j, (h32 * (j + 1) % 997L).toDouble / 997.0)
        }
      }
    }
  }
}
