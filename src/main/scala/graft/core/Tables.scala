package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog over the driver-generated parquet star schema (TESTDATA.md).
  *
  * Spark-first posture: all tables are columnar parquet scans; predicate
  * pushdown / column pruning happen for free as long as queries stay
  * declarative. At 100 TB these would be partitioned/bucketed external
  * tables — the query code below only depends on logical names, so the
  * physical layout can change without touching operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Inferred-schema cache for the catalog's plain parquet FILES
  // (round 21, guide §5): every `spark.read.parquet` call re-infers the
  // footer schema — measured as a ~45 ms driver/listing job per call,
  // and harness queries call load() several times (streaming replays
  // dozens of times). Keyed by (absolute path, mtime, size, the
  // NTZ-inference conf that shapes the result): an in-place rewrite
  // changes mtime/size and re-infers, so entries cannot go stale —
  // metadata caching with revalidation, not result caching. Directories
  // and unreadable paths fall back to plain inference.
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long, String), org.apache.spark.sql.types.StructType]

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val p = java.nio.file.Paths.get(path)
    try {
      val attrs = java.nio.file.Files.readAttributes(
        p, classOf[java.nio.file.attribute.BasicFileAttributes])
      if (!attrs.isRegularFile) spark.read.parquet(path)
      else {
        val inferNtz = spark.conf
          .getOption("spark.sql.parquet.inferTimestampNTZ.enabled").getOrElse("true")
        val key = (p.toAbsolutePath.toString,
          attrs.lastModifiedTime.toMillis, attrs.size, inferNtz)
        val schema = schemaCache.getOrElseUpdate(key, spark.read.parquet(path).schema)
        spark.read.schema(schema).parquet(path)
      }
    } catch { case _: java.io.IOException => spark.read.parquet(path) }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark 4 has no
    // nanosecond timestamp type and throws PARQUET_TYPE_ILLEGAL unless the
    // column is surfaced as a raw long. Runtime conf so every session
    // (including driver-owned ones calling SparkEntry.entry) is covered.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normalizeNtz's NTZ→LTZ cast is value-preserving ONLY under a UTC
    // session (same micros ⟺ same wall clock); a driver-owned session on
    // a non-UTC JVM would silently shift instants and break oracle
    // parity. Pin it here, not just in GraftSession (ADVICE r8 #1).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = readCached(spark, s"$dir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        // nanos → micros by truncation (integer DIV keeps 64-bit exactness;
        // a double division would lose precision above 2^53 ns). DuckDB's
        // TIMESTAMP(NANOS) → TIMESTAMP auto-cast truncates identically.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    normalizeNtz(df)
  }

  /** The generator has emitted timestamps both WITH and WITHOUT parquet's
    * isAdjustedToUTC flag across rounds; a foreign session (the driver's
    * smoke) reads the naive flavor as TIMESTAMP_NTZ under the default
    * `inferTimestampNTZ`. The engine computes in LTZ (UTC session)
    * regardless: an NTZ→LTZ cast under a UTC session keeps the same
    * micros, and ops NTZ rejects (unix_micros, BIGINT casts, watermark
    * arithmetic) keep working. Runtime normalization here — not only the
    * GraftSession conf — so driver-owned sessions are covered too.
    * Verify mirrors the corpus flavor back on output (oracle byte-parity). */
  private def ltzify(dt: DataType): DataType = dt match {
    case TimestampNTZType => TimestampType
    case s: StructType    => StructType(s.fields.map(f => f.copy(dataType = ltzify(f.dataType))))
    case a: ArrayType     => a.copy(elementType = ltzify(a.elementType))
    case m: MapType       => m.copy(keyType = ltzify(m.keyType), valueType = ltzify(m.valueType))
    case o                => o
  }

  def normalizeNtz(df: DataFrame): DataFrame = {
    val needed = df.schema.fields.exists(f => ltzify(f.dataType) != f.dataType)
    if (!needed) df
    else df.select(df.schema.fields.map { f =>
      val t = ltzify(f.dataType)
      if (t == f.dataType) col(f.name) else col(f.name).cast(t).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Recursively swap LTZ→NTZ — Verify uses this to mirror a naive corpus
    * flavor back onto query outputs before the parquet dump. */
  def ntzify(dt: DataType): DataType = dt match {
    case TimestampType => TimestampNTZType
    case s: StructType => StructType(s.fields.map(f => f.copy(dataType = ntzify(f.dataType))))
    case a: ArrayType  => a.copy(elementType = ntzify(a.elementType))
    case m: MapType    => m.copy(keyType = ntzify(m.keyType), valueType = ntzify(m.valueType))
    case o             => o
  }

  def denormalizeNtz(df: DataFrame): DataFrame = {
    val needed = df.schema.fields.exists(f => ntzify(f.dataType) != f.dataType)
    if (!needed) df
    else df.select(df.schema.fields.map { f =>
      val t = ntzify(f.dataType)
      if (t == f.dataType) col(f.name) else col(f.name).cast(t).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** SparkSession factory with the engine's standing config: UTC, AQE on,
  * whole-stage codegen ON (deliberately inverting the reference's
  * `spark.sql.codegen.wholeStage=false`,
  * TwitterDatasetTrendingHashtag.java:58), shuffle partitions sized for
  * the local test harness (on a real cluster this is AQE-advised).
  */
object GraftSession {
  def build(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // The corpus parquet may carry timestamps with or without the
      // isAdjustedToUTC flag (the driver's generator has emitted both
      // flavors across rounds). The engine computes in session-time
      // TIMESTAMP (LTZ, UTC session) either way: naive micros read as
      // the same UTC wall clock, so values are unchanged — and ops that
      // require LTZ (unix_micros, BIGINT casts, watermarks) keep
      // working. Verify mirrors the corpus flavor back on output so the
      // oracle compare stays byte-exact in both worlds.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 128-way MinHash aggregate exceeds the default 100-field
      // codegen cutoff; without this the signature stage silently runs
      // interpreted (~2× slower measured)
      .config("spark.sql.codegen.maxFields", "256")
      // InferFiltersFromGenerate re-derives `size(arr) > 0` beneath every
      // explode and pushes it to the scan with the array-producing
      // expression tree fully inlined — for nested-lambda trees (shingles,
      // bigrams) the inlined copy re-evaluates the tokenizer per element,
      // interpreted, measured 8× on q16b. Our explode inputs carry
      // explicit cheap pre-filters instead.
      .config("spark.sql.optimizer.excludedRules",
              "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
