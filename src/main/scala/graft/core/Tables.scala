package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
