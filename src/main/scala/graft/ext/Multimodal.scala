package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs per-partition so a real codec binds
  * batch-wise (one codec init per partition, not per row).
  *
  * Container-header DECODE IS REAL: [[headerMeta]] parses format,
  * dimensions and sample rate from the payload's magic bytes (PNG IHDR,
  * JPEG SOF marker scan, GIF logical screen descriptor, WAV fmt chunk) —
  * no image library needed, headers are just bytes. Only the perceptual
  * FEATURE stage ([[decode]]'s phash/feat columns) remains a
  * deterministic md5-derived stand-in: real perceptual hashing needs a
  * full pixel decode and this container ships no codec. The seam where
  * that codec binds (mapPartitions, one init per partition, batch
  * iteration, output schema) is the same one the header parser runs in.
  *
  * Scale notes: media blobs dominate row size, so the asset table is
  * partitioned by content-hash prefix (uniform spread, no hot partitions)
  * and feature extraction is a projection — never a shuffle; extracted
  * features land in a narrow sidecar table joined back by `asset_id` only
  * when needed.
  */
object Multimodal {

  /** Typed envelope for a media asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("duration_ms", LongType))))))

  /** Wrap arbitrary source rows into the asset envelope: payload is the
    * raw bytes, id is the content hash (dedup-friendly), partition key is
    * the hash prefix. Rows with a NULL payload are dropped up front: they
    * would get a NULL asset_id (md5(NULL)), violating the envelope's
    * non-null id contract and silently vanishing from every equi-join on
    * asset_id (NULL never equals NULL) — filtering is explicit, not an
    * accident of join semantics. */
  def toAssets(src: DataFrame, bytesCol: String, mediaType: String): DataFrame =
    src.where(col(bytesCol).isNotNull).select(
      md5(col(bytesCol)).as("asset_id"),
      lit(mediaType).as("media_type"),
      col(bytesCol).cast("binary").as("payload"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")).as("meta"),
      substring(md5(col(bytesCol)), 1, 2).as("shard"))

  /** Parsed container-header metadata. */
  case class HeaderMeta(format: String, width: Option[Int], height: Option[Int],
                        sample_rate: Option[Int])

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def beShort(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** REAL magic-byte header parse — pure JVM, no codec:
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
    *    width/height at offsets 16/20;
    *  - JPEG: SOI then a marker scan to the first frame header (SOFn,
    *    n ∉ {4, 8, 12} — those are huffman/arithmetic tables, not
    *    frames), big-endian height/width at +5/+7 into the segment;
    *  - GIF: "GIF87a"/"GIF89a", little-endian u16 logical-screen
    *    width/height at 6/8;
    *  - WAV: "RIFF....WAVE", fmt-chunk scan for the little-endian u32
    *    sample rate (chunk-aligned walk, not a fixed offset — real files
    *    put LIST/JUNK chunks before fmt).
    * Anything else (or a truncated header) parses as "unknown"/None —
    * never a throw: a 100 TB corpus WILL contain garbage bytes. */
  def parseHeader(b: Array[Byte]): HeaderMeta = {
    if (b == null || b.length < 2) return HeaderMeta("unknown", None, None, None)
    // PNG
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return HeaderMeta("png", Some(beInt(b, 16)), Some(beInt(b, 20)), None)
    // JPEG: marker walk
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // Long cursor (as in the WAV chunk walk below): on a payload near
      // Int.MaxValue bytes, `i += 2 + len` (len ≤ 65535) can wrap an Int
      // cursor negative, slip past the `i + 3 < b.length` guard, and index
      // with a negative offset — the throw this parser promises never to
      // make. Long arithmetic can't wrap here and the guard bounds i.toInt.
      var i = 2L
      while (i + 3 < b.length && (b(i.toInt) & 0xff) == 0xff) {
        val o = i.toInt
        val marker = b(o + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd9 || marker == 0xda) {
          // EOI / SOS with no frame header seen: stop — past SOS lies
          // entropy-coded data (and past EOI arbitrary trailer bytes)
          // where a naive marker walk would misread payload bytes
          return HeaderMeta("jpeg", None, None, None)
        }
        else if (marker == 0x01 || marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone
        else {
          val len = beShort(b, o + 2)
          if (len < 2) return HeaderMeta("jpeg", None, None, None)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 < b.length)
              return HeaderMeta("jpeg", Some(beShort(b, o + 7)), Some(beShort(b, o + 5)), None)
            return HeaderMeta("jpeg", None, None, None)
          }
          i += 2L + len
        }
      }
      return HeaderMeta("jpeg", None, None, None)
    }
    // GIF
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return HeaderMeta("gif", Some(leShort(b, 6)), Some(leShort(b, 8)), None)
    // WAV: RIFF container, chunk walk to "fmt "
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // Long cursor: a garbage chunk size near Int.MaxValue would wrap an
      // Int cursor negative (and wrap the loop guard), indexing out of
      // bounds — exactly the throw this parser promises never to make
      var i = 12L
      while (i + 8 <= b.length) {
        val o = i.toInt
        val isFmt = b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' '
        val sz = leInt(b, o + 4)
        if (isFmt) {
          if (i + 16 <= b.length && sz >= 8)
            return HeaderMeta("wav", None, None, Some(leInt(b, o + 12)))
          return HeaderMeta("wav", None, None, None)
        }
        if (sz < 0) return HeaderMeta("wav", None, None, None)
        i += 8L + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      return HeaderMeta("wav", None, None, None)
    }
    HeaderMeta("unknown", None, None, None)
  }

  /** Extracted-feature row produced by the decode stage: REAL header
    * metadata (format/width/height/sample_rate from [[parseHeader]])
    * plus the stubbed perceptual features (phash/feat). */
  case class AssetFeatures(asset_id: String, n_bytes: Long, format: String,
                           width: Option[Int], height: Option[Int],
                           sample_rate: Option[Int], phash: String, feat: Array[Float])

  /** Per-partition decode stage. Header metadata is parsed for real from
    * the payload bytes; the perceptual phash/feat stand-ins stay
    * md5-derived (the documented stub — a pixel codec binds at this exact
    * seam, one init per partition). */
  def decode(assets: DataFrame): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE in a real codec (one ctx/partition)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val hm = parseHeader(b)
          md.reset()
          val h = md.digest(b).map("%02x".format(_)).mkString
          val feat = (0 until 8).map { i =>
            java.lang.Long.parseLong(h.substring(i * 4, i * 4 + 4), 16).toFloat / 65535f
          }.toArray
          AssetFeatures(id, b.length.toLong, hm.format, hm.width, hm.height,
            hm.sample_rate, h.substring(0, 16), feat)
        }
      }
  }

  /** Deterministic frame/window sampling plumbing: expand each asset into
    * `n` evenly spaced sample points — byte offsets over the payload here;
    * a real demuxer would seek timestamps at the same seam. The stride
    * math, row expansion, and per-sample addressing are the real
    * machinery: a pure projection + generator (expansion factor exactly
    * `n`, no shuffle), feeding the [[decode]]-shaped per-partition
    * codec stage downstream. Empty payloads opt out (nothing to seek). */
  def frameSample(assets: DataFrame, n: Int = 4): DataFrame =
    assets.select(col("asset_id"), length(col("payload")).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0L), lit((n - 1).toLong))))
      .withColumn("byte_offset",
        floor(col("frame_idx") * col("n_bytes") / lit(n)).cast("long"))

  /** Feature sidecar join-back: narrow table keyed by asset_id. Decode
    * runs once per DISTINCT content hash (duplicate payloads share an
    * asset_id by construction — decoding each copy would both waste the
    * codec and fan the join out t×t per duplicate group). */
  def withFeatures(assets: DataFrame): DataFrame =
    assets.join(decode(assets.dropDuplicates("asset_id")).toDF(), Seq("asset_id"))
}
