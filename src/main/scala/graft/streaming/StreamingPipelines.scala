package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, ForeachWriter, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._
import graft.core.Tables

/** Structured Streaming twins of the reference's three continuous
  * queries (TwitterDatasetTrendingHashtag.java:64-109), replayed from a
  * chunked file stream (this environment has no Kafka; the file source
  * exercises the same micro-batch machinery — offsets, watermark, state
  * stores, update mode, sinks).
  *
  * Operators covered: O1/O2 source (file stream, maxFilesPerTrigger as
  * the rate-limit knob), O9 sliding / O12 tumbling event-time windows,
  * O10 watermark (300 s, S:79/89/98), O13 mapGroupsWithState running
  * count (S:458-492), O17 ForeachWriter sink lifecycle (S:212-263),
  * O18 update output mode, O19 multi-query orchestration on one session.
  *
  * Parity contract (SURVEY.md Q20): after the replay drains, the upserted
  * sink state must equal the batch answers — checked by the oracle rows
  * of q20/q20b/q20c and by StreamingParitySpec.
  */
object StreamingPipelines {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  /** O13 state/output beans (S:398-456). */
  case class CountInfo(count: Long)
  case class CountUpdate(count: Long, timestamp: Timestamp)

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Sink state for one replay: the "InfluxDB measurements" of the
    * reference, as upsertable in-memory tables. */
  final class SinkState {
    val windowCounts  = TrieMap.empty[Timestamp, Long]                   // O12 twin
    val slidingCounts = TrieMap.empty[Timestamp, Long]                   // O9 twin (5m/1m)
    val typeCounts    = TrieMap.empty[(Timestamp, String), Long]         // O11 input
    val runningLog    = new java.util.concurrent.ConcurrentLinkedQueue[CountUpdate]() // O13
    val joinPairs     = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]() // stream-stream join
  }

  /** ForeachWriter instances are serialized to executors — a captured
    * sink reference would be a lost copy. Writers resolve their queue
    * through this JVM-static registry (the stand-in for the external
    * connection a real sink opens in `open()`). */
  object WriterRegistry {
    val queues = TrieMap.empty[String, java.util.concurrent.ConcurrentLinkedQueue[CountUpdate]]
  }

  /** O17 — ForeachWriter with the reference's open/process/close
    * lifecycle (S:218-232), writing running-count points. Runs on
    * executors per partition per epoch; the registry lookup in `open`
    * plays the role of the reference's per-partition InfluxDB
    * connection setup (S:218-223). */
  final class RunningCountWriter(runId: String) extends ForeachWriter[CountUpdate] {
    @transient private var q: java.util.concurrent.ConcurrentLinkedQueue[CountUpdate] = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      q = WriterRegistry.queues(runId) // "connect"
      true
    }
    override def process(value: CountUpdate): Unit = q.add(value)
    override def close(errorOrNull: Throwable): Unit = () // "disconnect"
  }

  // ---- replay input ----------------------------------------------------

  /** Write `events` as one parquet file per day, modification times
    * strictly increasing in day order, so the file-stream source replays
    * the month in event-time order (the in-order-producer assumption the
    * reference's 300 s watermark relies on). Idempotent per (dir). */
  def chunkEvents(spark: SparkSession, dir: String): Path = {
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft-stream",
      Integer.toHexString(dir.hashCode))
    val chunkDir = root.resolve("chunks")
    if (Files.exists(chunkDir.resolve("_DONE"))) return chunkDir
    Files.createDirectories(chunkDir)
    val staging = root.resolve("staging").toString
    Tables.load(spark, dir, "events")
      .withColumn("day", date_format(col("ts"), "yyyyMMdd"))
      .repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(staging)
    val dayDirs = Files.list(Paths.get(staging)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("day=")).toSeq
      .sortBy(_.getFileName.toString)
    dayDirs.zipWithIndex.foreach { case (dayDir, i) =>
      val parts = Files.list(dayDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.getFileName.toString)
      parts.zipWithIndex.foreach { case (part, j) =>
        val dst = chunkDir.resolve(f"chunk_$i%03d_$j%02d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 1000L))
      }
    }
    Files.createFile(chunkDir.resolve("_DONE"))
    chunkDir
  }

  // ---- source seam -----------------------------------------------------

  /** Where a production source plugs in (O1/O2). The reference consumes
    * a Kafka topic of JSON tweets
    * (TwitterDatasetTrendingHashtag.java:64-72); this environment has no
    * Kafka broker or connector jar, so the default is the chunked
    * parquet file stream — same micro-batch machinery (offsets,
    * rate-limit knob, watermark, state). Swapping in Kafka is a config
    * change, not a code change: the kafka branch below carries the full
    * option surface and the wire-format decode (binary value →
    * from_json → typed columns, the reference's O4), and only needs the
    * spark-sql-kafka connector on the classpath. */
  final case class SourceConfig(
      format: String = "parquet",               // "parquet" | "kafka"
      path: String = "",                        // file-source dir
      filesPerTrigger: Int = 10,                // file-source rate knob
      kafkaBootstrap: String = "localhost:9092",
      kafkaTopic: String = "events",
      kafkaStartingOffsets: String = "earliest",
      kafkaMaxOffsetsPerTrigger: Long = 100000L) // kafka rate knob

  /** Build the canonical typed event stream from a source config; every
    * pipeline downstream is source-agnostic. */
  def eventStream(spark: SparkSession, src: SourceConfig): DataFrame = src.format match {
    case "kafka" =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", src.kafkaBootstrap)
        .option("subscribe", src.kafkaTopic)
        .option("startingOffsets", src.kafkaStartingOffsets)
        .option("maxOffsetsPerTrigger", src.kafkaMaxOffsetsPerTrigger)
        .load()
        // wire contract: value = JSON event (reference O4); corrupt
        // records null out and are dropped, per SURVEY §1.2
        .select(from_json(col("value").cast("string"), eventSchema).as("e"))
        .where(col("e").isNotNull)
        .select(col("e.*"))
    case _ =>
      spark.readStream
        .schema(eventSchema)
        .option("maxFilesPerTrigger", src.filesPerTrigger)
        .parquet(src.path)
  }

  // ---- the three reference pipelines, replayed to completion -----------

  /** Run all the streaming queries concurrently on one session (O19,
    * S:86-109) over the chunked replay; block until drained; return the
    * final sink state.
    *
    * filesPerTrigger sizes the replay at ~3 triggers + drain per query
    * (30 day-chunks / 10): multi-trigger semantics (watermark advance,
    * state carry-over, per-trigger upserts) are still exercised, but the
    * wall clock is not dominated by trigger bookkeeping — r3 ran 11
    * triggers × 5 queries and spent ~26 s mostly on offset/commit-log
    * and state-store churn. Parity is batch-size-independent here: the
    * replay is event-time-ordered, so a row's window is never below the
    * watermark when it arrives (no drops at any trigger granularity). */
  def replay(spark: SparkSession, dir: String, filesPerTrigger: Int = 10): SinkState = {
    import spark.implicits._
    val sink = new SinkState
    val chunkDir = chunkEvents(spark, dir)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    // Streaming state here is tiny per trigger (≤ a few thousand window
    // rows); 32 state-store partitions would mean 3 queries × N triggers
    // × 32 near-empty state tasks of pure overhead. 8 is plenty locally;
    // on a real cluster this is sized to state volume, not cores.
    // (The partition count is baked into each query's checkpoint at
    // first start, so set it before start() and restore after.)
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def source: DataFrame = eventStream(spark,
      SourceConfig(path = chunkDir.toString, filesPerTrigger = filesPerTrigger))

    // O12 — tumbling 1-minute count, update mode, upsert sink
    val tumbling = source
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$ckpt/tumbling")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r => // bounded: only windows updated this trigger
          sink.windowCounts.put(r.getTimestamp(0), r.getLong(1))
        }
      }.start()

    // O9 — sliding event-time window (the reference's trending window
    // shape, 30s/5s at S:80, re-parameterized 5m/1m for the data's
    // spread): each event lands in window/slide = 5 overlapping windows
    val sliding = source
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$ckpt/sliding")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          sink.slidingCounts.put(r.getTimestamp(0), r.getLong(1))
        }
      }.start()

    // O11 input — per-(window, type) counts; trending top-1 is derived
    // from the upserted sink (the reference charts the sink, S:237-263)
    val perType = source
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$ckpt/pertype")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          sink.typeCounts.put((r.getTimestamp(0), r.getString(1)), r.getLong(2))
        }
      }.start()

    // O13 — global stateful running count (constant key, S:99), state =
    // CountInfo, output stamped with the current watermark (S:473-484)
    val updateFn: (String, Iterator[Event], GroupState[CountInfo]) => CountUpdate =
      (_, events, state) => {
        val prev = state.getOption.map(_.count).getOrElse(0L)
        val next = CountInfo(prev + events.size)
        state.update(next)
        CountUpdate(next.count, new Timestamp(state.getCurrentWatermarkMs()))
      }
    val runId = java.util.UUID.randomUUID().toString
    WriterRegistry.queues.put(runId, sink.runningLog)
    val running = source.as[Event]
      .withWatermark("ts", "300 seconds")
      .groupByKey(_ => "count")
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFn)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$ckpt/running")
      .trigger(Trigger.AvailableNow())
      .foreach(new RunningCountWriter(runId))
      .start()

    // stream-stream interval join (beyond the reference's surface; the
    // canonical funnel query): each click joined to same-user purchases
    // within the following 5 minutes. Both sides carry the 300 s
    // watermark; the range condition bounds join state, so buffered rows
    // are evicted as the watermark advances — state is O(join window ×
    // rate), never O(stream). Inner join + append mode: each match is
    // emitted exactly once, and the event-time-ordered replay guarantees
    // a row's match partner always arrives before eviction (partner ts
    // within 300 s < the 600 s arrival-to-eviction horizon), so the
    // drained result equals the batch interval join.
    val clicks = source
      .withWatermark("ts", "300 seconds")
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val purchases = source
      .withWatermark("ts", "300 seconds")
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val joined = clicks.join(purchases,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 5 minutes"))
      .select(col("c_user"), col("click_id"), col("purchase_id"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$ckpt/joined")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          sink.joinPairs.add((r.getLong(0), r.getLong(1), r.getLong(2)))
        }
      }.start()

    try Seq(tumbling, sliding, perType, running, joined).foreach(_.awaitTermination())
    finally {
      WriterRegistry.queues.remove(runId)
      spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    }
    sink
  }

  /** Replay results memoized per sfDir (the three q20 entries share one
    * replay; Bench clears this to time real replays). */
  private val cache = TrieMap.empty[String, SinkState]
  def replayCached(spark: SparkSession, dir: String): SinkState =
    cache.getOrElseUpdate(dir, replay(spark, dir))
  def clearCache(): Unit = { cache.clear(); dedupCache.clear() }

  // ---- streaming dropDuplicates (q20f) ---------------------------------

  /** Streaming exact dedup: first occurrence per user_id across the
    * whole replay (`dropDuplicates` keyed state). Its own replay, timed
    * separately from the shared one in Bench.
    *
    * Scale note: key-only dropDuplicates state is O(distinct keys) and
    * never evicted — correct for the exact global-dedup contract this
    * query declares (oracle = DISTINCT over the batch table). When the
    * dedup contract is time-bounded, `dropDuplicatesWithinWatermark`
    * bounds state to the watermark horizon; the batch-side digest dedup
    * (q16) is the exact-at-rest path at 100 TB. */
  def dropDupReplay(spark: SparkSession, dir: String, filesPerTrigger: Int = 10): Seq[Long] = {
    val chunkDir = chunkEvents(spark, dir)
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = eventStream(spark, SourceConfig(path = chunkDir.toString, filesPerTrigger = filesPerTrigger))
        .withWatermark("ts", "300 seconds")
        .dropDuplicates("user_id")
        .select("user_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r => seen.add(r.getLong(0)))
        }.start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    seen.asScala.toSeq
  }

  private val dedupCache = TrieMap.empty[String, Seq[Long]]
  def dropDupReplayCached(spark: SparkSession, dir: String): Seq[Long] =
    dedupCache.getOrElseUpdate(dir, dropDupReplay(spark, dir))

  /** Q20f — drained streaming dropDuplicates state; oracle = batch
    * DISTINCT user_id. */
  def q20fStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dropDupReplayCached(spark, dir).toDF("user_id").orderBy("user_id")
  }

  // ---- continuous operation (ProcessingTime trigger) -------------------

  /** The reference's actual operating mode: an unbounded micro-batch
    * loop on a fixed cadence (500 ms,
    * TwitterDStreamTrendingHashtag.java:49; default trigger at
    * TwitterDatasetTrendingHashtag.java:86) — not replay-to-drain. Runs
    * the trending per-(window, type) pipeline under
    * `Trigger.ProcessingTime(triggerMs)`, polls progress until the
    * source is exhausted, stops the query, and returns the final upsert
    * state plus each trigger's `triggerExecution` duration so the SLA
    * the reference implies (work per trigger < slide) is *measured*,
    * not assumed — see StreamingParitySpec and BASELINE.md. */
  def processingTimeReplay(spark: SparkSession, dir: String, triggerMs: Long = 500,
                           filesPerTrigger: Int = 3): (Map[(Timestamp, String), Long], Seq[Long]) = {
    val chunkDir = chunkEvents(spark, dir)
    val ckpt = Files.createTempDirectory("graft-pt-ckpt").toString
    val state = TrieMap.empty[(Timestamp, String), Long]
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = eventStream(spark, SourceConfig(path = chunkDir.toString, filesPerTrigger = filesPerTrigger))
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"), col("cnt"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach(r => state.put((r.getTimestamp(0), r.getString(1)), r.getLong(2)))
      }.start()
    try {
      // drain detection: stop after two consecutive empty triggers
      var emptyStreak = 0
      var lastBatchId = -1L
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (emptyStreak < 2 && System.nanoTime() < deadline) {
        Thread.sleep(triggerMs)
        val p = q.lastProgress
        if (p != null && p.batchId != lastBatchId) {
          lastBatchId = p.batchId
          emptyStreak = if (p.numInputRows == 0) emptyStreak + 1 else 0
        }
      }
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    }
    val durations = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(_.durationMs.get("triggerExecution").longValue())
    (state.toMap, durations)
  }

  // ---- durable sink (foreachBatch → parquet, idempotent) ---------------

  /** The durable-sink path (VERDICT r3 gap #3): the reference writes
    * (measurement, time, tags, fields) points to InfluxDB
    * (TwitterDatasetTrendingHashtag.java:242-248); the portable
    * equivalent is an idempotent `foreachBatch` parquet append — each
    * epoch writes to `sink/batch_id=N`, so a replayed epoch after
    * failure OVERWRITES its own directory instead of duplicating rows
    * (exactly-once at rest on top of the source's replayable offsets).
    * Returns the sink path; rows carry the point shape
    * (measurement, time, tag, value). */
  def durableSinkReplay(spark: SparkSession, dir: String, filesPerTrigger: Int = 10): String = {
    val chunkDir = chunkEvents(spark, dir)
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val out = Files.createTempDirectory("graft-sink-out").toString
    val q = eventStream(spark, SourceConfig(path = chunkDir.toString, filesPerTrigger = filesPerTrigger))
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("events_per_minute").as("measurement"),
              col("window.start").as("time"),
              col("event_type").as("tag"),
              col("cnt").as("value"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch_id=$batchId")
      }.start()
    q.awaitTermination()
    out
  }

  /** O13 on the modern arbitrary-state API (`transformWithState`,
    * Spark 4): same semantics as the mapGroupsWithState pipeline —
    * per-batch increment of a single keyed counter, output stamped with
    * the current watermark. Requires the RocksDB state store provider
    * (the 100 TB-grade state backend; also what production streaming
    * state should run on). */
  class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Event, CountUpdate] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var countState: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[CountUpdate] = {
      val prev = Option(countState.get()).getOrElse(0L)
      val next = prev + rows.size
      countState.update(next)
      Iterator.single(CountUpdate(next, new Timestamp(timerValues.getCurrentWatermarkInMs())))
    }
  }

  /** Running count via transformWithState over a chunked replay; returns
    * the final count (must equal the event total — see
    * StreamingParitySpec). Scoped to its own method (not the main
    * replay) so the RocksDB provider conf stays local. */
  def runningCountViaTransformWithState(spark: SparkSession, dir: String): Long = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val chunkDir = chunkEvents(spark, dir)
    val ckpt = Files.createTempDirectory("graft-tws-ckpt").toString
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    try {
      val q = eventStream(spark, SourceConfig(path = chunkDir.toString))
        .as[Event]
        .withWatermark("ts", "300 seconds")
        .groupByKey(_ => "count")
        .transformWithState(new RunningCountProcessor, TimeMode.EventTime(), OutputMode.Update())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[CountUpdate], _: Long) =>
          batch.collect().foreach(u => sink.add(u.count))
        }
        .start()
      q.awaitTermination()
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    var m = 0L
    sink.forEach(c => m = math.max(m, c))
    m
  }

  /** The reference's actual flagship flow (O5+O9/O12): hashtag explode →
    * sliding event-time window → per-hashtag counts. One declarative
    * tree, valid as a batch or streaming plan (callers add watermark +
    * output mode on the stream side). */
  def trendingHashtagCounts(tweets: DataFrame, windowDur: String, slide: String): DataFrame =
    tweets
      .select(explode(graft.functions.TextFunctions.hashtags(col("text"))).as("hashtag"),
              col("timestamp"))
      .groupBy(window(col("timestamp"), windowDur, slide), col("hashtag"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("hashtag"), col("cnt"))

  // ---- q20 parity queries: final sink state as DataFrames --------------

  /** Q20 — streamed tumbling counts; oracle = the batch q5 SQL. */
  def q20StreamTumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    replayCached(spark, dir).windowCounts.toSeq
      .toDF("window_start", "n_events")
      .orderBy("window_start")
  }

  /** Q20b — trending top-1 per window from the streamed per-type counts
    * (deterministic tie-break: count desc, type asc); oracle = batch q7. */
  def q20bStreamTop1(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val counts = replayCached(spark, dir).typeCounts.toSeq
      .map { case ((w, t), c) => (w, t, c) }
      .toDF("window_start", "top_type", "cnt")
    val w = Window.partitionBy("window_start").orderBy(col("cnt").desc, col("top_type"))
    counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("window_start", "top_type", "cnt")
      .orderBy("window_start")
  }

  /** Q20d — streamed sliding-window counts (O9); oracle = batch q6 SQL. */
  def q20dStreamSliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    replayCached(spark, dir).slidingCounts.toSeq
      .toDF("window_start", "n_events")
      .orderBy("window_start")
  }

  /** Q20e — stream-stream interval join result (click → same-user
    * purchases within 5 minutes); oracle = the batch interval join in
    * DuckDB (timestamps compared at microsecond precision on both
    * engines). */
  def q20eStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    replayCached(spark, dir).joinPairs.asScala.toSeq
      .toDF("user_id", "click_id", "purchase_id")
      .orderBy("click_id", "purchase_id")
  }

  /** Q20c — final running-count state; oracle = COUNT(*) over events. */
  def q20cStreamRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val finalCount = replayCached(spark, dir).runningLog.asScala
      .map(_.count).foldLeft(0L)(math.max)
    Seq(finalCount).toDF("running_cnt")
  }
}
