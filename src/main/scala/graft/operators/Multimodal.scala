package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2E): media payloads are
  * opaque `binary` columns with typed metadata travelling beside them.
  * The testdata has no media table, so the corpus is derived
  * deterministically from `documents` (utf-8 bytes as the payload) —
  * the Spark-side schema / partitioning / batch shape is the real
  * deliverable. Since r9 the IMAGE leg is real JVM code
  * (`ImageCodec`): `javax.imageio` decodes PNG/JPEG/GIF payloads
  * inside mapPartitions batches, true width/height/frames come from
  * the decoder, and near-dup fingerprints are a DCT perceptual hash
  * (pHash) over the decoded pixels. Payloads no decoder claims
  * (e.g. the documents-derived utf-8 corpus) fall back to the
  * deterministic byte-level path, so every operator stays total.
  * Only exotic codecs (video containers, audio) remain out of scope
  * — nothing here is a stub anymore.
  */
object Multimodal {

  /** documents → media table: payload as binary + metadata columns. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("payload"),
        col("source"),
        col("lang"))

  /** Typed metadata extraction over the binary payload — byte length,
    * content hash, and deterministic fake dimensions (what a real
    * decoder would emit from the header). Fully distributed projection;
    * oracle-checkable since everything derives from the bytes. */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("media_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        (length(col("payload")) % 640 + 16).as("fake_width"),
        (length(col("payload")) % 480 + 16).as("fake_height"),
        col("source"))
      .orderBy("media_id")

  val mediaMetadataSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS content_md5,
      |  CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS fake_width,
      |  CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS fake_height,
      |  source
      |FROM documents ORDER BY media_id""".stripMargin

  /** Feature extraction over the payload: a 16-bin code-point
    * histogram per media item (the real thing would be an image/audio
    * embedding — the DISTRIBUTED SHAPE is identical: narrow map,
    * fixed-width vector out, no shuffle). Oracle-checkable since the
    * histogram derives deterministically from the bytes. */
  def featureExtract(spark: SparkSession, dir: String, bins: Int = 16): DataFrame = {
    require(bins == 16, "fused histogram expression is 16-bin")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        call_function("codepoint_hist16", col("text")).as("feature_vec"),
        length(col("text")).as("n_chars"))
      .orderBy("media_id")
  }

  /** Long-format (media_id, bin, bin_count, n_chars) rows — the
    * driver-comparable shape (array output crashes the harness's
    * pandas compare); the array form above stays the library API. */
  def featureExtractLong(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        call_function("codepoint_hist16", col("text")).as("fv"),
        length(col("text")).as("n_chars"))
      .select(col("media_id"), posexplode(col("fv")).as(Seq("bin", "bin_count")), col("n_chars"))
      .orderBy("media_id", "bin")
  }

  val featureExtractSql: String =
    """WITH h AS (
      |  SELECT doc_id AS media_id,
      |    [len(list_filter(string_split(text, ''), c -> ascii(c) % 16 = b)) FOR b IN range(0, 16)] AS fv,
      |    CAST(length(text) AS INT) AS n_chars
      |  FROM documents
      |), longf AS (
      |  SELECT media_id,
      |    CAST(generate_subscripts(fv, 1) - 1 AS INT) AS bin,
      |    CAST(unnest(fv) AS INT) AS bin_count,
      |    n_chars
      |  FROM h
      |)
      |SELECT media_id, bin, bin_count, n_chars FROM longf
      |ORDER BY media_id, bin""".stripMargin

  /** Resize/truncate stub: clamp every payload to `targetBytes`,
    * zero-padding short ones — the fixed-shape normalization step
    * before batched tensor ops. Distributed as a pure projection. */
  def mediaResize(spark: SparkSession, dir: String, targetBytes: Int = 256): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("media_id"),
        expr(s"substring(rpad(payload, $targetBytes, x'00'), 1, $targetBytes)")
          .as("resized"),
        length(col("payload")).as("orig_bytes"))
      .orderBy("media_id")

  /** Fallback for payloads no installed decoder claims: slice the
    * bytes at fixed strides — deterministic, keeps the frame operators
    * total over arbitrary binary columns (the documents-derived
    * corpus exercises exactly this arm). */
  private def sliceFrameFallback(payload: Array[Byte], frameIdx: Int, stride: Int): Array[Byte] = {
    val start = frameIdx * stride
    java.util.Arrays.copyOfRange(payload, start, math.min(start + stride, payload.length))
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = true),
    StructField("frame_len", IntegerType, nullable = false)))

  /** Frame sampling over binary payloads via mapPartitions — the
    * batch-at-a-time shape a Pandas-UDF/Arrow pipeline would use, kept
    * partition-local (no shuffle; each task decodes its own split).
    * Payloads an installed `javax.imageio` reader claims (PNG, JPEG,
    * GIF — including multi-frame animated GIFs) decode for REAL:
    * frames come from the container, re-encoded as lossless PNG
    * bytes. Anything else takes the deterministic byte-slice fallback,
    * so the operator is total over arbitrary binary columns. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 100, maxFrames: Int = 8): DataFrame =
    frameSampleFrom(mediaTable(spark, dir), stride, maxFrames)

  def frameSampleFrom(media: DataFrame, stride: Int = 100, maxFrames: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          ImageCodec.decodeFrames(payload, maxFrames) match {
            case Some(frames) =>
              frames.iterator.zipWithIndex.map { case (img, i) =>
                val f = ImageCodec.encodePng(img)
                Row(id, i, f, f.length)
              }
            case None =>
              val n = math.min((payload.length + stride - 1) / stride, maxFrames)
              (0 until n).iterator.map { i =>
                val f = sliceFrameFallback(payload, i, stride)
                Row(id, i, f, f.length)
              }
          }
        }
      }(enc)
      .orderBy("media_id", "frame_idx")
  }

  private val imageMetaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)))

  /** TRUE image metadata from a real decode (vs `mediaMetadata`'s
    * byte-derived report): width/height/frame-count straight from the
    * container via `javax.imageio`, NULL + decode_ok=false for
    * payloads no reader claims. mapPartitions so decoder machinery
    * amortizes per task; pure projection, no shuffle. */
  def imageMetadata(spark: SparkSession, dir: String, maxFrames: Int = 64): DataFrame =
    imageMetadataFrom(mediaTable(spark, dir), maxFrames)

  def imageMetadataFrom(media: DataFrame, maxFrames: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(imageMetaSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          ImageCodec.decodeFrames(payload, maxFrames) match {
            case Some(frames) if frames.nonEmpty =>
              Row(id, payload.length, true,
                frames.head.getWidth, frames.head.getHeight, frames.length)
            case _ => Row(id, payload.length, false, null, null, null)
          }
        }
      }(enc)
      .orderBy("media_id")
  }

  /** Media near-dup pairs via a byte-shingle SimHash — the perceptual-
    * hash shape without the codec: payload bytes hex-encode into
    * fixed 8-char groups (the "patches"), group-shingle hashes vote
    * per bit into one 64-bit fingerprint, candidates come from the
    * same 16-bit band blocking the text SimHash uses, and pairs keep
    * at Hamming ≤ maxHamming. A real image pipeline swaps the hex
    * grouping for decoded patch features (pHash/dHash); everything
    * else — fingerprint, banding, bounded bucket pair enumeration —
    * is exactly this plan. Rows-only (iterative banding isn't SQL).
    *
    * Scale shape: fingerprint is a narrow map; one shuffle on
    * (band, value); per-bucket expansion bounded by maxBucket with
    * the same skew-guard semantics as the text family. */
  def mediaNearDup(spark: SparkSession, dir: String, maxHamming: Int = 7,
                   maxBucket: Int = 1024): DataFrame =
    mediaNearDupFrom(mediaTable(spark, dir), maxHamming, maxBucket)

  def mediaNearDupFrom(media: DataFrame, maxHamming: Int = 7,
                       maxBucket: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(media.sparkSession)
    val grouped = trim(regexp_replace(hex(col("payload")), "(.{8})", "$1 "))
    val fp = media
      .select(col("media_id"),
        call_function("simhash64",
          transform(split(grouped, " "), g => xxhash64(g))).as("phash"))
    fingerprintPairs(fp, maxHamming, maxBucket)
  }

  /** The shared banded near-dup join over any 64-bit fingerprint
    * frame (media_id, phash): 4×16-bit bands (≤3 differing bits
    * guarantee a shared band; up to maxHamming still near-certain),
    * bucket-bounded pair enumeration, Hamming cut. */
  private def fingerprintPairs(fp: DataFrame, maxHamming: Int,
                               maxBucket: Int): DataFrame = {
    val banded = fp
      .select(col("media_id"), col("phash"),
        expr("explode(transform(sequence(0, 3), b -> struct(b as band_idx, shiftright(phash, b * 16) & 65535 as band_val)))").as("band"))
      .select(col("media_id"), col("phash"), col("band.band_idx"), col("band.band_val"))
    val x = expr("element_at(members, p.i)")
    val y = expr("element_at(members, p.j)")
    Dedup.bucketPairs(banded, Seq("band_idx", "band_val"),
        Seq("media_id", "phash"), maxBucket)
      .select(
        least(x.getField("media_id"), y.getField("media_id")).as("media_a"),
        greatest(x.getField("media_id"), y.getField("media_id")).as("media_b"),
        bit_count(x.getField("phash").bitwiseXOR(y.getField("phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("media_a", "media_b")
  }

  /** PERCEPTUAL near-dup pairs — the real-image form of
    * `media_near_dup`: payloads a JVM image reader claims are decoded
    * and fingerprinted with the DCT pHash (`ImageCodec.pHash64` —
    * re-encodes, format conversions, and mild compression noise land
    * within a few bits, which raw byte hashing can NEVER see: a
    * PNG→JPEG twin shares almost no bytes); everything else keeps the
    * byte-shingle SimHash, so the operator is total and the
    * documents-derived corpus still exercises the full banding path.
    *
    * Scale shape: ONE scan — the byte fingerprint is computed by
    * codegen'd expressions first, then a mapPartitions pass decodes
    * and overrides it where a real image sits (decoder + DCT tables
    * amortize per task); banding/bucketing identical to the text
    * SimHash family, maxBucket skew guard included. */
  def phashNearDup(spark: SparkSession, dir: String, maxHamming: Int = 7,
                   maxBucket: Int = 1024): DataFrame =
    phashNearDupFrom(mediaTable(spark, dir), maxHamming, maxBucket)

  /** Perceptual near-dup CLUSTER census — the dedup unit the pair
    * frame can't serve directly: re-encode chains link transitively
    * (original ↔ JPEG ↔ JPEG-recompressed may pairwise clear
    * maxHamming only adjacently), so keeper selection and inventory
    * accounting need COMPONENTS over the pair graph, not pairs.
    * Pairs come from `phashNearDup` (banded, bucket-bounded);
    * clusters from the star-contraction CC core shared with
    * `graph_components` (O(log² n) rounds regardless of chain
    * length — a viral re-encode chain is exactly the high-diameter
    * case min-label propagation handles worst); every media row is a
    * vertex, so size-1 rows read off the UNIQUE share of the corpus
    * directly. rows-only (JVM decode + iterative CC); the spec pins
    * a planted original/re-encode/twin cluster exactly. */
  def mediaPhashClusters(spark: SparkSession, dir: String, maxHamming: Int = 7,
                         maxBucket: Int = 1024): DataFrame =
    mediaPhashClustersFrom(mediaTable(spark, dir), maxHamming, maxBucket)

  def mediaPhashClustersFrom(media: DataFrame, maxHamming: Int = 7,
                             maxBucket: Int = 1024): DataFrame = {
    val edges = phashNearDupFrom(media, maxHamming, maxBucket)
      .select(col("media_a").as("a"), col("media_b").as("b"))
      .localCheckpoint()
    Graph.connectedComponentsFrom(media.select(col("media_id").as("id")), edges)
      .groupBy("component").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .orderBy(desc("cluster_size"))
  }

  def phashNearDupFrom(media: DataFrame, maxHamming: Int = 7,
                       maxBucket: Int = 1024): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(media.sparkSession)
    val fpSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(fpSchema)
    val grouped = trim(regexp_replace(hex(col("payload")), "(.{8})", "$1 "))
    val fp = media
      .select(col("media_id"), col("payload"),
        call_function("simhash64",
          transform(split(grouped, " "), g => xxhash64(g))).as("byte_hash"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          ImageCodec.decode(payload) match {
            case Some(img) => Row(id, ImageCodec.pHash64(img), true)
            case None => Row(id, r.getLong(2), false)
          }
        }
      }(enc)
      .select("media_id", "phash")
    fingerprintPairs(fp, maxHamming, maxBucket)
  }
}
