package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs per-partition so a real codec binds
  * batch-wise (one codec init per partition, not per row).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — with [[fakeDecode]], a deterministic stand-in computing
  * md5-derived pseudo-features. Everything around it (schema, partition
  * strategy, batch shape, the mapPartitions seam where a JNI/FFI codec
  * would bind) is real and tested.
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

  /** Extracted-feature row produced by the decode stage. */
  case class AssetFeatures(asset_id: String, n_bytes: Long, phash: String,
                           feat: Array[Float])

  /** STUB decode: where a real implementation would bind an image/audio
    * codec per partition (e.g. via JNI), this computes deterministic
    * pseudo-features from the bytes — md5-derived perceptual-hash stand-in
    * and an 8-dim float signature. The mapPartitions seam, batch iteration
    * and output schema are exactly what a real codec plugs into. */
  def fakeDecode(assets: DataFrame): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE in a real codec (one ctx/partition)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          md.reset()
          val h = md.digest(b).map("%02x".format(_)).mkString
          val feat = (0 until 8).map { i =>
            java.lang.Long.parseLong(h.substring(i * 4, i * 4 + 4), 16).toFloat / 65535f
          }.toArray
          AssetFeatures(id, b.length.toLong, h.substring(0, 16), feat)
        }
      }
  }

  /** Deterministic frame/window sampling plumbing: expand each asset into
    * `n` evenly spaced sample points — byte offsets over the payload here;
    * a real demuxer would seek timestamps at the same seam. The stride
    * math, row expansion, and per-sample addressing are the real
    * machinery: a pure projection + generator (expansion factor exactly
    * `n`, no shuffle), feeding the [[fakeDecode]]-shaped per-partition
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
    assets.join(fakeDecode(assets.dropDuplicates("asset_id")).toDF(), Seq("asset_id"))
}
