package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** As-of (point-in-time) join — the operator behind "latest feature
  * value at event time", the join every training pipeline needs and
  * Spark has no native operator for (SURVEY §2.3 extension; DuckDB
  * grew a native ASOF JOIN for the same reason, which is exactly what
  * makes it independently oracle-able).
  *
  * Shape: for each left row, attach the single most recent right value
  * with `right.ts <= left.ts` for the same key (or null — LEFT as-of).
  *
  * Implementation is the union-tag trick, chosen for scale:
  * both sides union into one stream tagged (side: right=0, left=1),
  * ONE hash shuffle by key, ONE partitioned running window computing
  * `last(right_val, ignoreNulls)` over rows ordered by
  * (ts, side, right_val) — right rows at ts sort before left rows at
  * the same ts (inclusive bound), and among equal-ts right rows the
  * LAST (max right_val) wins, making ties deterministic. No range
  * explosion (the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax
  * materializes O(|l|×|r|) per key), no broadcast, state O(1) per row
  * scanned — this survives 100 TB on both sides as long as keys
  * distribute (same property as any keyed window; hot keys would take
  * the q21 salting escape hatch).
  */
object AsofJoin {

  /** Contract: `left` = (key: long, ts: timestamp, left_id: long),
    * `right` = (key: long, ts: timestamp, right_val: long) with at most
    * one row per (key, ts) — pre-aggregate ties (e.g. max) so the
    * as-of pick is well-defined on BOTH engines. Output: one row per
    * left row, `asof_val` nullable. */
  def asof(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("key"), col("ts"), lit(1).as("side"),
      lit(null).cast("long").as("right_val"), col("left_id"))
    val r = right.select(col("key"), col("ts"), lit(0).as("side"),
      col("right_val"), lit(null).cast("long").as("left_id"))
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("side"), col("right_val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("asof_val", last(col("right_val"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("left_id"), col("key"), col("asof_val"))
  }

  /** As-of join with a MAX-STALENESS tolerance — the feature-store
    * contract: a feature value counts only if it is at most
    * `toleranceSec` old at event time; anything staler joins as NULL
    * (train-time must see exactly what serve-time would). Same
    * union-tag single-window plan as [[asof]] — the running state
    * carries the matched right row's OWN timestamp in the struct, and
    * the staleness test is one comparison applied after the pick, so
    * tolerance costs zero extra shuffles and no range explosion (the
    * naive `r.ts BETWEEN l.ts - tol AND l.ts` join is the same
    * O(|l|×|r|)-per-key blowup plain as-of avoids). Tie order inside
    * the struct is (rts, right_val) — identical to [[asof]]'s
    * (ts, side, right_val), so the picked row never differs from the
    * untolerated twin; only its admissibility does. */
  def asofTolerant(left: DataFrame, right: DataFrame, toleranceSec: Long): DataFrame = {
    val l = left.select(col("key"), col("ts"), lit(1).as("side"),
      lit(null).cast("struct<rts:timestamp,rv:bigint>").as("rrec"), col("left_id"))
    val r = right.select(col("key"), col("ts"), lit(0).as("side"),
      struct(col("ts").as("rts"), col("right_val").as("rv")).as("rrec"),
      lit(null).cast("long").as("left_id"))
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("side"), col("rrec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("last_r", last(col("rrec"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("left_id"), col("key"),
        when(col("last_r.rts") >= col("ts") - expr(s"INTERVAL $toleranceSec SECONDS"),
          col("last_r.rv")).as("asof_val"))
  }

  /** Q22 — each click joined as-of to the same user's most recent
    * purchase at or before the click (ties on (user, ts) resolved to
    * the max purchase id on both engines); oracle = DuckDB's native
    * ASOF LEFT JOIN. */
  def q22AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("key"), col("ts"))
      .agg(max(col("event_id")).as("right_val"))
    asof(clicks, purchases)
      .select(col("left_id").as("click_id"), col("key").as("user_id"),
              col("asof_val").as("purchase_id"))
      .orderBy("click_id")
  }

  /** Q22c's staleness horizon (seconds): purchases more than 2 days
    * old at click time join as NULL. */
  val ToleranceSec = 2L * 24 * 3600

  /** Q22c — q22 under the max-staleness contract: the same as-of pick,
    * admissible only within [[ToleranceSec]]; oracle = DuckDB's native
    * ASOF LEFT JOIN with the staleness test applied to the matched
    * row's own timestamp. */
  def q22cAsofTolerant(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts"), col("event_id").as("left_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("key"), col("ts"))
      .agg(max(col("event_id")).as("right_val"))
    asofTolerant(clicks, purchases, ToleranceSec)
      .select(col("left_id").as("click_id"), col("key").as("user_id"),
              col("asof_val").as("purchase_id"))
      .orderBy("click_id")
  }
}
