package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Multimodal-column operators (SURVEY.md §2.3 Q19): opaque binary
  * payloads + typed metadata, struct packing with a JSON round-trip, and
  * the batched feature-extraction plumbing a real image/audio decoder
  * would plug into.
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container has no media libraries) — what is real and tested is the
  * Spark-side contract: schema, binary columns, partition-parallel
  * batched execution via mapPartitions over a typed Dataset (the Scala
  * analogue of mapInPandas batch processing), and columnar output.
  */
object MultimodalQueries {

  case class MediaRecord(doc_id: Long, media: Array[Byte], n_bytes: Long)
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_frames: Int, feature: Array[Float])

  /** STUB decoder — deterministic fake standing in for an image/audio
    * decode (real impl: decode bytes, resize, frame-sample). Derives
    * "dimensions" and a feature vector purely from the bytes so tests
    * are reproducible. */
  def fakeDecode(r: MediaRecord): MediaFeatures = {
    val n = r.media.length
    val head = if (n > 0) (r.media(0) & 0xff) else 0
    MediaFeatures(
      doc_id = r.doc_id,
      width = 64 + head % 64,
      height = 64 + (n % 64),
      n_frames = 1 + n % 8,
      feature = Array.tabulate(8)(i => ((head * 31 + i * 7 + n) % 97).toFloat / 97f))
  }

  /** Batched per-partition feature extraction: one decoder instance per
    * partition (the expensive init a real decoder has), records streamed
    * through it — the mapPartitions shape that scales to 1000 executors. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: open codec/library handle here, per partition
      it.map(fakeDecode)
    }
  }

  /** STUB resize — a real impl decodes, scales, re-encodes; the stub
    * transforms the fake dimensions deterministically, preserving the
    * aspect contract (never upscales, fits within maxW×maxH). */
  def resize(f: MediaFeatures, maxW: Int, maxH: Int): MediaFeatures = {
    val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
    f.copy(width = math.max(1, (f.width * scale).toInt),
           height = math.max(1, (f.height * scale).toInt))
  }

  /** STUB frame sampling — every k-th frame index of the fake clip
    * (real impl: seek+decode selected frames only). */
  def sampleFrames(f: MediaFeatures, every: Int): Seq[Int] =
    (0 until f.n_frames by math.max(1, every)).toSeq

  /** Resize + frame-sample over a feature Dataset — same per-partition
    * batched shape as extractFeatures. */
  def resizeAndSample(feats: Dataset[MediaFeatures], maxW: Int, maxH: Int,
                      every: Int): Dataset[(Long, Int, Int, Seq[Int])] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions(_.map { f =>
      val r = resize(f, maxW, maxH)
      (r.doc_id, r.width, r.height, sampleFrames(r, every))
    })
  }

  /** documents joined with embeddings as a media-ish table: text bytes as
    * the opaque binary column + typed metadata. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      // decode is the expensive step: spread it across all cores even
      // when the source is a single file (1 scan partition)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[MediaRecord]
  }

  /** Q19 — struct pack + to_json/from_json round-trip: the multimodal
    * metadata envelope. Each engine round-trips its own JSON (no
    * cross-engine JSON string compare — only the recovered fields are
    * hash-matched). */
  def q19Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val metaSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    Tables.load(spark, dir, "documents")
      .join(Tables.load(spark, dir, "embeddings"),
            col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("embedding"),
        to_json(struct(col("doc_id"), col("lang"), col("source"), col("n_chars"))).as("j"))
      .select(col("doc_id"), col("embedding"), from_json(col("j"), metaSchema).as("m"))
      .select(
        col("doc_id"),
        col("m.lang").as("lang_rt"),
        col("m.source").as("source_rt"),
        col("m.n_chars").as("n_chars_rt"),
        size(col("embedding")).cast("long").as("emb_dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("emb0"))
      .orderBy("doc_id")
  }

  /** Q19b — opaque binary columns with derived metadata (byte length +
    * content digest), the "treat media as bytes + metadata" posture. */
  def q19bBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("digest"))
      .orderBy("doc_id")

  /** Q19d — resize + frame-sample declared end-to-end: decode (stub) →
    * fit-within-96×96 resize → every-2nd-frame sampling → one row per
    * (doc, sampled frame). Unlike q19c this IS hash-checked: the stub
    * derives every number from the payload bytes with IEEE double
    * arithmetic only (min/divide/multiply/floor — each op bit-exact
    * cross-engine), so the oracle recomputes the whole pipeline in SQL
    * and any deviation in the typed mapPartitions path, the resize
    * contract, or the sampling stride breaks the hash. */
  def q19dFrameSample(spark: SparkSession, dir: String): DataFrame = {
    resizeAndSample(extractFeatures(mediaTable(spark, dir)), 96, 96, 2)
      .toDF("doc_id", "width", "height", "frames")
      .select(col("doc_id"), col("width"), col("height"),
        explode(col("frames")).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Q19c — the batched decode/feature pipeline end-to-end (rows-only
    * check: the stub decoder is engine-side by design). */
  def q19cFeatures(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(mediaTable(spark, dir))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        round(element_at(col("feature"), 1).cast("double"), 6).as("f0"))
      .orderBy("doc_id")
  }
}
