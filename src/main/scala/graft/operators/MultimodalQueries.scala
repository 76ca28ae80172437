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

  // ------------------------------------------------- real header decode

  final case class ImgMeta(doc_id: Long, fmt: String, width: Long,
      height: Long, channels: Long)

  /** Serialize a REAL image container header so the decode stage has
    * actual bytes to parse: BMP (BITMAPINFOHEADER, little-endian) for
    * even doc_ids, PNG (signature + IHDR chunk, big-endian) for odd.
    * Dimensions derive from doc_id with integer arithmetic the oracle
    * replays column-side. */
  private[operators] object ImgCodec {
    private def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def be32(v: Int) = le32(v).reverse

    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte)
        .putInt(54) // file size (header-only payload)
        .putInt(0).putInt(54) // reserved, pixel-data offset
        .putInt(40) // BITMAPINFOHEADER size
        .putInt(w).putInt(h)
        .putShort(1) // planes
        .putShort(24) // bpp → 3 channels
      b.array()
    }

    val PngSig: Array[Byte] = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a).map(_.toByte)
    def png(w: Int, h: Int): Array[Byte] =
      PngSig ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
        be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ // depth 8, colorType 6 (RGBA), ...
        be32(0) // CRC slot (not validated here)

    /** The actual byte-level parse: dispatch on magic, then read the
      * dimension fields at their container offsets in the container's
      * endianness. Throws on unknown magic — decode errors must
      * surface, not pass as zeros. */
    def parse(docId: Long, p: Array[Byte]): ImgMeta = {
      def leAt(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8) |
        ((p(i + 2) & 0xff) << 16) | ((p(i + 3) & 0xff) << 24)
      def beAt(i: Int) = ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      if (p.length >= 30 && p(0) == 'B' && p(1) == 'M') {
        val bpp = (p(28) & 0xff) | ((p(29) & 0xff) << 8)
        ImgMeta(docId, "bmp", leAt(18).toLong, leAt(22).toLong, bpp / 8L)
      } else if (p.length >= 26 && p.take(8).sameElements(PngSig)) {
        val channels = (p(25) & 0xff) match {
          case 0 => 1L; case 2 => 3L; case 4 => 2L; case 6 => 4L
          case c => throw new IllegalArgumentException(s"colorType $c")
        }
        ImgMeta(docId, "png", beAt(16).toLong, beAt(20).toLong, channels)
      } else throw new IllegalArgumentException(
        s"doc $docId: unknown image magic")
    }
  }

  /** mm04: REAL header decode, not the deterministic fake — the encode
    * stage writes genuine BMP/PNG container headers, the decode stage
    * byte-parses them back (magic dispatch, little- vs big-endian
    * dimension fields), both inside the per-partition batch path. The
    * oracle recomputes the expected scalars from the doc_id arithmetic
    * alone, so a parse that read the wrong offset, endianness, or
    * format would hash-mismatch. */
  val mm04HeaderDecode: GraftQuery = q(
    "mm04_header_decode",
    "real BMP/PNG header encode → byte-level decode (magic dispatch, both endiannesses)",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
      |  CAST(16 + doc_id % 240 AS BIGINT) AS width,
      |  CAST(16 + (doc_id // 3) % 200 AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS BIGINT) AS channels
      |FROM documents WHERE doc_id < 400
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val ids = Tables.documents(s, d).filter(col("doc_id") < 400)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions(_.map { id =>
      val w = (16 + id % 240).toInt
      val h = (16 + (id / 3) % 200).toInt
      val payload = if (id % 2 == 0) ImgCodec.bmp(w, h) else ImgCodec.png(w, h)
      MediaRecord(id, if (id % 2 == 0) "image/bmp" else "image/png",
        payload.length.toLong, payload)
    })
    media.mapPartitions(_.map(r => ImgCodec.parse(r.doc_id, r.payload)))
      .toDF()
      .orderBy("doc_id")
  }

  val all: Seq[GraftQuery] =
    Seq(mm01BinaryMeta, mm02DecodeFeatures, mm03FrameSample, mm04HeaderDecode)
}
