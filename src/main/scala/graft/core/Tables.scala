package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark 4 has no
    // nanosecond timestamp type and throws PARQUET_TYPE_ILLEGAL unless the
    // column is surfaced as a raw long. Runtime conf so every session
    // (including driver-owned ones calling SparkEntry.entry) is covered.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // nanos → micros by truncation (integer DIV keeps 64-bit exactness;
      // a double division would lose precision above 2^53 ns). DuckDB's
      // TIMESTAMP(NANOS) → TIMESTAMP auto-cast truncates identically.
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
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
