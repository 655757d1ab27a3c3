package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Event-time windowed analytics over the `events` stream table — the
  * batch twins of the reference's streaming operators (SURVEY.md §2 O4,
  * O7-O9, O12-O13). [[graft.streaming.StreamingPipelines]] runs the same
  * window/agg trees as continuous queries; q20a-c assert the replayed
  * final state equals these batch answers.
  */
object WindowQueries {

  /** The open-JSON projection policy from the reference's Tweet bean
    * (Tweet.java:10-21): declared schema over a dynamic JSON document,
    * unknown fields dropped, corrupt records → null (the permissive
    * DStream-path semantics from TwitterDStreamTrendingHashtag.java:228-232,
    * chosen over the throwing Dataset path — see SURVEY.md §1.2). */
  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Q2 — native JSON parse (`from_json`, never a typed lambda: keeps
    * pruning/pushdown and codegen intact, unlike the reference's
    * Jackson map at TwitterDatasetTrendingHashtag.java:74-75). */
  def q2JsonParse(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .select(col("event_type"), from_json(col("props"), propsSchema).as("p"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           count(col("p.k")).as("n_parsed"),
           sum(col("p.k")).cast("long").as("sum_k"))
      .orderBy("event_type")
  }

  /** Q5 — tumbling event-time window count (reference O12:
    * `groupBy(window(timestamp, "1 seconds")).count()` at
    * TwitterDatasetTrendingHashtag.java:90, re-parameterized to 1 minute
    * for the testdata's time spread). */
  def q5Tumbling(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .orderBy("window_start")
  }

  /** Q5b — session windows (gap-based): events within a 5-minute gap of
    * each other merge into one session; `session_window` is the native
    * primitive (works identically as a streaming aggregation with
    * watermark-driven state eviction). Beyond the reference's surface —
    * SURVEY §2.2 lists session windows as absent there. */
  def q5bSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"), col("n_events"))
      .orderBy("session_start")
  }

  /** Q6 — sliding event-time window (reference O9: 30s/5s sliding window
    * at TwitterDatasetTrendingHashtag.java:80; window/slide are query
    * parameters, here 5min/1min). Each event lands in window/slide = 5
    * overlapping windows. */
  def q6Sliding(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .orderBy("window_start")
  }

  /** Q7 — windowed top-1 (argmax) — the trending-hashtag semantics
    * (reference O8/O11). The reference's argmax tie-break is HashMap
    * iteration order (TwitterDatasetTrendingHashtag.java:187-196,
    * nondeterministic); the engine defines: highest count, then
    * lexicographically smallest key. Two-level aggregation: count per
    * (window, key) — partial-agg friendly — then argmax per window via
    * max_by on an ordering-encoded struct. */
  def q7WindowTop1(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    // max_by over struct(cnt, reversed-key) would need per-type negation;
    // a rank window keeps the tie-break explicit and engine-portable.
    import org.apache.spark.sql.expressions.Window
    val rankW = Window.partitionBy("w").orderBy(col("cnt").desc, col("event_type").asc)
    counts
      .withColumn("rn", row_number().over(rankW))
      .where(col("rn") === 1)
      .select(col("w.start").as("window_start"), col("event_type").as("top_type"), col("cnt"))
      .orderBy("window_start")
  }

  /** Q7b — windowed top-k (k=3) via the typed bounded [[graft.functions.TopKCounts]]
    * Aggregator — the declared UDAF surface (O11 re-principled; see
    * TopK.scala scaladoc for the contrast with the reference's map-buffer
    * Aggregator). Partial aggregation ships ≤k rows per (window,partition). */
  def q7bWindowTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{TagCount, TopKCounts}
    val counts = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
              col("event_type").as("tag"), col("cnt"))
    counts.as[(java.sql.Timestamp, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => TagCount(r._2, r._3))
      .agg(new TopKCounts(3).toColumn.name("topk"))
      .toDF("window_start", "topk")
      .select(col("window_start"), posexplode(col("topk")))
      .select(col("window_start"), col("col.tag").as("top_type"),
              col("col.cnt").as("cnt"), (col("pos") + 1).cast("long").as("rank"))
      .orderBy("window_start", "rank")
  }

  /** Q8 — running/cumulative count: the batch twin of the reference's
    * stateful running total (O13, mapGroupsWithState at
    * TwitterDatasetTrendingHashtag.java:97-107). Batch semantics =
    * unbounded-preceding count ordered by event time.
    *
    * Scale-safe two-phase plan (a global `Window.orderBy` would pull the
    * whole table into one task): range-partition by the sort key, rank
    * locally per partition, then add broadcast per-partition prefix
    * offsets. Every heavy operator runs per-partition; the only global
    * structure is the tiny (numPartitions)-row offset table. The
    * streaming twin is [[graft.streaming.StreamingPipelines]] O13. */
  def q8RunningCount(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = Tables.load(spark, dir, "events")
      .select("event_id", "ts")
    // DETERMINISTIC time bucket from the sort key itself (round 14,
    // the tokenBudgetSample fix applied family-wide): the ts span is
    // read once driver-side and baked into the plan as literals —
    // monotone in (ts, event_id) like the range partitioning was, but
    // immune to the two consumers (window + counts) materializing a
    // SAMPLED range exchange twice with different seeds and
    // disagreeing on boundary rows' buckets. Uniform-ts corpora (this
    // fixture) get balanced buckets; heavy time skew would pick
    // quantile cutpoints instead — same monotonicity argument.
    val span = base.agg(min(col("ts").cast("long")).as("lo"),
      max(col("ts").cast("long")).as("hi")).head()
    // empty table ⇒ min/max are null (ADVICE r14): constant-bucket
    // short-circuit — the plan still runs and yields the empty frame
    val (lo, hi) =
      if (span.isNullAt(0)) (0L, 0L) else (span.getLong(0), span.getLong(1))
    val width = (hi - lo) / n + 1
    val ranged = base
      .withColumn("pid", expr(s"CAST((CAST(ts AS LONG) - $lo) DIV $width AS INT)"))
    // per-partition local rank: Window partitioned by pid → parallel
    val localW = Window.partitionBy("pid").orderBy("ts", "event_id")
    val local  = ranged.withColumn("local_rn", row_number().over(localW))
    // prefix offsets: one row per partition. A window here would need an
    // empty/constant partition spec (the optimizer folds `lit(0)` away →
    // an all-data-to-one-task WindowExec warning); a triangular self-join
    // over the ≤numPartitions count rows computes the same prefix sums
    // with no WindowExec at all — O(P²) rows where P is the partition
    // count, never a function of data size.
    val counts = ranged.groupBy("pid").agg(count(lit(1)).as("n"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.pid") < col("a.pid"), "left_outer")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.n")), lit(0L)).as("offset"))
    local
      .join(broadcast(offsets), "pid")
      .select(col("event_id"), col("ts"),
              (col("offset") + col("local_rn")).as("running_cnt"))
      .orderBy("ts", "event_id") // oracle-harness determinism only
  }

  /** Q8b — gap-based sessionization with EXPOSED session ids: a session
    * breaks after >12 h of per-user inactivity (sized to this corpus's
    * ~7 h median inter-event gap so sessions actually merge). Two windows and one
    * agg, all partitioned by user_id — the natural scale unit, so unlike
    * q8 there is no global ordering anywhere and no prefix-offset
    * machinery needed: lag() marks break rows, a running sum assigns the
    * ids, a grouped agg summarizes each session. This is the
    * assignment-style twin of q5b's `session_window` (which merges
    * gap-windows without surfacing ids — ids are what downstream
    * per-session features join on). Gaps compare in integer
    * MICROSECONDS so both engines cut sessions on the exact same
    * boundary (a double-seconds diff could straddle the cut). */
  def q8bSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events")
                 .select("user_id", "event_id", "ts", "value"),
               gapSeconds = 43200L)
      .orderBy("user_id", "session_id")

  /** Q24 — time-series gap-fill + forward-fill, the resample step a
    * metrics/feature pipeline runs before modeling: per event_type, an
    * hourly grid spans [first, last] observed hour, every missing hour
    * is synthesized carrying the last observed average forward. The
    * grid is built in-plan (`sequence` + `explode`), never as a
    * driver-side range, and everything is keyed by event_type — the
    * scale unit (at 100 TB the partition key is the series id; a
    * global spine would funnel). n_events is 0 on gap rows, filled_avg
    * is the carried value, and is_gap marks rows with no observed
    * average — synthesized hours plus observed hours whose values are
    * all NULL (those forward-fill too). Averages
    * round to 6dp — the one-division determinism rule (§5.3).
    *
    * ONE reference to the aggregated frame, not two: the textbook
    * spine-then-left-join plan reads the hourly aggregate from both the
    * spine branch and the join's probe side — and a DataFrame subtree
    * referenced from two join inputs is recomputed twice (the
    * nearDupPairs CSE trap, this repo's most-relearned lesson). Instead
    * each observed hour looks at its successor (`lead`) and EMITS ITS
    * OWN RUN of spine rows [hour, next) carrying its average — same
    * rows, one scan, one window, one generator, no join at all. */
  def q24GapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.load(spark, dir, "events")).orderBy("event_type", "hour")

  /** Library surface behind q24: hourly gap-fill + forward-fill of any
    * (event_type, ts, value) frame. See [[q24GapFill]] for semantics. */
  def gapFill(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Det._
    val order = Window.partitionBy("event_type").orderBy("hour")
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
           round(davg(col("value")), 6).as("avg_v"))
      // an observed hour whose every `value` is NULL has avg_v NULL and
      // is itself a gap in the filled series: carry the last non-null
      // average across it (same per-series window the successor lookup
      // uses) and flag it, matching last_value(… IGNORE NULLS) +
      // `avg_v IS NULL` on the oracle side (ADVICE r6 #1)
      .withColumn("carried_avg",
        last(col("avg_v"), ignoreNulls = true)
          .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_hour", lead(col("hour"), 1).over(order))
      .select(col("event_type"), col("n_events"), col("avg_v"), col("carried_avg"),
        col("hour").as("obs_hour"),
        explode(sequence(
          col("hour"),
          coalesce(col("next_hour") - expr("INTERVAL 1 HOUR"), col("hour")),
          expr("INTERVAL 1 HOUR"))).as("hour"))
      .select(col("event_type"), col("hour"),
        when(col("hour") === col("obs_hour"), col("n_events")).otherwise(lit(0L)).as("n_events"),
        col("carried_avg").as("filled_avg"),
        (col("hour") =!= col("obs_hour") || col("avg_v").isNull).cast("long").as("is_gap"))
  }

  /** Q24b — LINEAR INTERPOLATION across gaps (q24's second fill
    * policy: forward-fill carries a stale reading flat, interpolation
    * draws the line to the next one — what metric backfills and
    * feature pipelines usually want): hours between consecutive
    * non-null hourly anchors get a0 + (a1−a0)·k/n. Same in-plan spine
    * trick as q24 (per-anchor `sequence` explode — no driver loop, no
    * cross join against a global calendar); the interpolation
    * arithmetic is the same IEEE expression both engines evaluate on
    * identical rounded anchors, so the row is fully hash-checked.
    * All-null observed hours count as gaps (no anchor), matching the
    * q24 carried-average treatment of the same rows. */
  def q24bInterpolate(spark: SparkSession, dir: String): DataFrame =
    interpolate(Tables.load(spark, dir, "events")).orderBy("event_type", "hour")

  /** Library surface behind q24b over any (event_type, ts, value)
    * frame. */
  def interpolate(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Det._
    val order = Window.partitionBy("event_type").orderBy("h0")
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h0"))
      .agg(round(davg(col("value")), 6).as("a0"))
      .where(col("a0").isNotNull)
      .withColumn("nh", lead(col("h0"), 1).over(order))
      .withColumn("na", lead(col("a0"), 1).over(order))
      .select(col("event_type"), col("h0"), col("a0"), col("nh"), col("na"),
        explode(sequence(
          col("h0"),
          coalesce(col("nh") - expr("INTERVAL 1 HOUR"), col("h0")),
          expr("INTERVAL 1 HOUR"))).as("hour"))
      .withColumn("k",
        ((unix_micros(col("hour")) - unix_micros(col("h0"))) / lit(3600000000L)).cast("long"))
      .withColumn("n",
        ((unix_micros(col("nh")) - unix_micros(col("h0"))) / lit(3600000000L)).cast("long"))
      .select(col("event_type"), col("hour"),
        round(when(col("k") === 0, col("a0"))
          .otherwise(col("a0") + (col("na") - col("a0")) * col("k") / col("n")), 6)
          .as("interp_avg"),
        (col("k") > 0).cast("long").as("is_interp"))
  }

  /** Library surface behind q8b: sessionize any (user_id, event_id, ts,
    * value) frame with a strict `> gapSeconds` inactivity cut. Session
    * ids start at 0 per user; a gap of exactly `gapSeconds` does NOT
    * break (strict inequality — pinned in WindowSemanticsSpec). */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Det._
    val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run   = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // first row per user: lag is NULL → condition NULL → otherwise(0),
      // matching SQL CASE semantics on the oracle side; ids start at 0
      .withColumn("brk",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(order))
               > gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(run))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           dsum(col("value")).as("sum_value"))
  }

  /** Q27 — ORDERED FUNNEL analysis (view → click → purchase, in event
    * order per user): stage N's cohort is the users whose first
    * stage-(N−1) completion precedes a stage-N event — the product
    * analytics query every event warehouse serves. Three keyed
    * aggregations on `user_id`: stage 1 is one conditional min; each
    * later stage joins the previous stage's (user, ts) — all three
    * shuffles share the `user_id` key, so a real cluster co-partitions
    * them (one exchange reused), and per-stage state is one timestamp
    * per user, never the event list. Counts only in the output (exact
    * longs — cross-engine hash-stable without float ratios). */
  def q27Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").select("user_id", "event_type", "ts")
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("tv"))
    val c = e.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") > col("tv"))
      .groupBy("user_id").agg(min(col("ts")).as("tc"))
    val p = e.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") > col("tc"))
      .groupBy("user_id").agg(min(col("ts")).as("tp"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(v, "1_view").unionByName(stage(c, "2_click"))
      .unionByName(stage(p, "3_purchase"))
      .orderBy("stage")
  }

  /** Q27b — COHORT RETENTION matrix: users cohorted by their first
    * active day, activity bucketed by day offset from that cohort day —
    * the (cohort × offset) triangle every growth dashboard draws. Two
    * keyed aggregations (first-day per user; distinct active days per
    * user) and one join, all on `user_id`; the output is bounded by
    * days² regardless of corpus size. Exact long counts only. */
  def q27bRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val cohort = e.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    val active = e.distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }
}
