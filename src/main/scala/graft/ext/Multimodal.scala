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
