package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, and a batched decode /
  * feature-extract stage.
  *
  * The decode itself is STUBBED (no media libraries in this
  * environment): [[FakeDecoder.decode]] derives deterministic
  * "features" from the raw bytes. Everything around it is the real
  * 100 TB shape: binary payload column + metadata struct, a typed
  * Dataset, and `mapPartitions` batch processing (one decoder
  * instantiation per partition, streaming batches through it — the
  * Scala analog of `mapInPandas`: amortized setup, bounded memory,
  * no per-row interpreter crossings).
  */
object MultimodalQueries {

  /** A "media" record: payload + the metadata a lakehouse would carry. */
  final case class MediaRecord(doc_id: Long, mime: String, n_bytes: Long,
      payload: Array[Byte])
  /** Stub decoder output — deterministic functions of the payload. */
  final case class MediaFeatures(doc_id: Long, width: Long, height: Long,
      n_frames: Long, checksum: String)

  /** Deterministic fake decode: stands in for image decode /
    * resize / frame sampling. Derives shape from payload length and
    * boundary bytes only, so an external SQL oracle can recompute it.
    * Instantiated once per partition (the codec-handle contract) and
    * reused across the batch — the md5 digest is reset, not realloc'd. */
  final class FakeDecoder extends Serializable {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(r: MediaRecord): MediaFeatures = {
      val first = if (r.payload.nonEmpty) r.payload(0) & 0xffL else 0L
      val last = if (r.payload.nonEmpty) r.payload(r.payload.length - 1) & 0xffL else 0L
      md.reset()
      MediaFeatures(
        doc_id = r.doc_id,
        width = 16L + first % 16L,
        height = 16L + last % 16L,
        n_frames = 1L + r.n_bytes % 4L,
        checksum = md.digest(r.payload).map("%02x".format(_)).mkString)
    }
  }

  /** documents.text reinterpreted as a binary payload corpus — the
    * testdata has no real media, so text bytes stand in. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        lit("application/octet-stream").as("mime"),
        length(col("text")).cast(LongType).as("n_bytes"),
        col("text").cast(BinaryType).as("payload"))
      .as[MediaRecord]
  }

  /** Batched decode: mapPartitions so decoder setup happens once per
    * partition — the real pattern for heavyweight codec handles. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val decoder = new FakeDecoder // ONE handle per partition
      batch.map(decoder.decode)
    }
  }

  /** One sampled "frame": a byte-range of the payload plus its digest. */
  final case class FrameSample(doc_id: Long, frame_idx: Long, offset: Long,
      frame_len: Long, frame_hash: String)

  /** Frame sampling: treat each payload as `n_frames` equal byte
    * chunks (last chunk takes the remainder) and emit every `stride`-th
    * frame. The row-to-frames explosion happens inside mapPartitions
    * with one digest handle per partition — the video-pipeline shape
    * where a partition's decoder streams frames without re-opening the
    * container per frame. Output size is bounded by
    * rows × ceil(maxFrames/stride), not payload bytes. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5") // per partition
      batch.flatMap { r =>
        val nFrames = 1L + r.n_bytes % 4L
        val chunk = r.n_bytes / nFrames
        (0L until nFrames by stride.toLong).iterator.map { k =>
          val start = (k * chunk).toInt
          val end = if (k == nFrames - 1) r.n_bytes.toInt else ((k + 1) * chunk).toInt
          md.reset()
          val hash = md.digest(java.util.Arrays.copyOfRange(r.payload, start, end))
            .map("%02x".format(_)).mkString
          FrameSample(r.doc_id, k, k * chunk, end - start, hash)
        }
      }
    }
  }

  private def q(name: String, doc: String, sql: String)(
      build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(sql), doc)

  /** Metadata projection over the binary column — schema plumbing. */
  val mm01BinaryMeta: GraftQuery = q(
    "mm01_binary_meta",
    "binary payload column + typed metadata",
    """SELECT doc_id, 'application/octet-stream' AS mime,
      |  CAST(LENGTH(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum
      |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        lit("application/octet-stream").as("mime"),
        length(col("text")).cast(LongType).as("n_bytes"),
        md5(col("text").cast(BinaryType)).as("checksum"))
      .orderBy("doc_id")
  }

  /** The stubbed decode stage end-to-end through mapPartitions; the
    * oracle recomputes the same deterministic features from the text
    * bytes (ASCII corpus ⇒ first/last byte = first/last char). */
  val mm02DecodeFeatures: GraftQuery = q(
    "mm02_decode_features",
    "batched (mapPartitions) stub decode / feature extraction",
    """SELECT doc_id,
      |  CAST(16 + ascii(substr(text, 1, 1)) % 16 AS BIGINT) AS width,
      |  CAST(16 + ascii(substr(text, LENGTH(text), 1)) % 16 AS BIGINT) AS height,
      |  CAST(1 + LENGTH(text) % 4 AS BIGINT) AS n_frames,
      |  md5(text) AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    decodeFeatures(mediaTable(s, d)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"), col("checksum"))
      .orderBy("doc_id")
  }

  /** Frame sampling end-to-end: every 2nd frame of each payload with
    * its byte range and digest; the oracle recomputes the same chunking
    * arithmetic and digests over text substrings (ASCII corpus ⇒ byte
    * slices = char slices). */
  val mm03FrameSample: GraftQuery = q(
    "mm03_frame_sample",
    "frame sampling over binary payloads (mapPartitions flatMap)",
    """WITH m AS (
      |  SELECT doc_id, text, LENGTH(text) AS n_bytes,
      |         1 + LENGTH(text) % 4 AS n_frames
      |  FROM documents WHERE doc_id < 200),
      |fr AS (
      |  SELECT doc_id, text, n_bytes, n_frames,
      |         UNNEST(generate_series(0, n_frames - 1)) AS k,
      |         n_bytes // n_frames AS chunk
      |  FROM m)
      |SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
      |  CAST(k * chunk AS BIGINT) AS offset,
      |  CAST(CASE WHEN k = n_frames - 1 THEN n_bytes - k * chunk ELSE chunk END AS BIGINT) AS frame_len,
      |  md5(substr(text, CAST(k * chunk + 1 AS INTEGER),
      |      CAST(CASE WHEN k = n_frames - 1 THEN n_bytes - k * chunk ELSE chunk END AS INTEGER))) AS frame_hash
      |FROM fr WHERE k % 2 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    sampleFrames(mediaTable(s, d).filter(col("doc_id") < 200).as[MediaRecord])
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  val all: Seq[GraftQuery] = Seq(mm01BinaryMeta, mm02DecodeFeatures, mm03FrameSample)
}
