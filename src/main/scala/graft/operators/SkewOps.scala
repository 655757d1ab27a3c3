package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew escape hatches (SURVEY §4.2 "salted-key escape hatch").
  *
  * AQE's skew-join splitting handles join-side skew automatically; what
  * it cannot fix is a hot GROUP BY key whose partial aggregates still
  * all land on one reducer. Salting splits the hot key across
  * `saltBuckets` reducers in phase 1 and merges the per-salt partials in
  * a second, now-balanced aggregation.
  */
object SkewOps {

  /** Two-phase salted count: groupBy(key, salt) → groupBy(key).
    * Result is identical to `df.groupBy(key).count()` for any data; use
    * when one key dominates (the hot key's work spreads over
    * `saltBuckets` tasks instead of one straggler). */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("count"))
  }

  /** Two-phase salted sum, same contract. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("sum"))
  }

  /** Q21 — hot-key aggregation through the salted two-phase plan,
    * declared end-to-end: `event_type` has 5 values over the whole
    * table, the canonical hot-key shape where a single-phase groupBy
    * funnels each key through one reducer. Phase 1 spreads each key
    * over 8 salt buckets, phase 2 merges 5×8 partials — the straggler
    * becomes 8 balanced tasks. Oracle = the plain GROUP BY (the salted
    * plan is result-identical by construction). */
  def q21SkewAgg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    saltedCount(graft.core.Tables.load(spark, dir, "events"), col("event_type"), 8)
      .select(col("key").as("event_type"), col("count").as("n"))
      .orderBy("event_type")
}
