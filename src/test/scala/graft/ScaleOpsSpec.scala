package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.core.Tables
import graft.operators.SkewOps

/** Scale-posture mechanics: salted aggregation equivalence and bucketed
  * co-located joins (the zero-shuffle join path a 100 TB layout uses). */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("band-bucket skew cap: a pathological hot bucket is dropped, candidates stay bounded") {
    import spark.implicits._
    import graft.operators.DedupQueries
    // 2000 identical boilerplate docs → one 2000-doc bucket in EVERY
    // band (O(n²) ≈ 2M candidate pairs without the guard) + one genuine
    // duplicate pair with its own content
    val hotText = "the same boilerplate template text repeated for every single spam document here"
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = ((1 to 2000).map(i => (i.toLong, hotText)) ++
      Seq((5001L, dupText), (5002L, dupText))).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
    graft.functions.MinHash.ensureRegistered(spark)
    val sh = graft.functions.TextFunctions.shingles(col("toks"), 3)
    val pairs = DedupQueries.nearDupPairs(docs,
      sigCol = call_function(graft.functions.MinHash.sigFnName, sh),
      payloadCol = sh,
      jacOf = DedupQueries.arrayJaccard,
      threshold = 0.8,
      bucketCap = 500, skewSampleMod = 1)
      .as[(Long, Long, Double)].collect()
    // the hot cluster is excised (exact-dup-grade mass belongs to q16's
    // digest dedup upstream); the small bucket survives untouched
    assert(pairs.toSeq == Seq((5001L, 5002L, 1.0)),
      s"expected only the genuine pair, got ${pairs.length} pairs")
    // and the monitoring surface reports the hot buckets
    val sigs = docs.select(col("doc_id"),
      call_function(graft.functions.MinHash.sigFnName, sh).as("sig"))
    val bands = sigs.select(col("doc_id"), explode(DedupQueries.bandKeys(col("sig"))).as("band"))
    val nHot = DedupQueries.hotBuckets(bands, 500, 1).count()
    assert(nHot >= 1, "hotBuckets must surface the pathological buckets")
  }

  test("connected components: chains collapse to one representative, singletons untouched") {
    import spark.implicits._
    import graft.operators.DedupQueries
    // chain 1-2-3 (no direct 1-3 edge), separate pair 10-11, chain 20-21-22-23
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L), (22L, 23L))
      .toDF("doc_i", "doc_j")
    val got = DedupQueries.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L),
      s"transitive closure wrong: $got")
  }

  test("salted count/sum equal direct aggregation (skewed input)") {
    import spark.implicits._
    // 90% of rows share one hot key
    val df = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 50}" else "HOT", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("count"), sum("v").as("sum"))
      .as[(String, Long, Long)].collect().map { case (k, c, s) => k -> ((c, s)) }.toMap
    val viaCnt = SkewOps.saltedCount(df, col("k"), 8).as[(String, Long)].collect().toMap
    val viaSum = SkewOps.saltedSum(df, col("k"), col("v"), 8).as[(String, Long)].collect().toMap
    assert(viaCnt == direct.view.mapValues(_._1).toMap)
    assert(viaSum == direct.view.mapValues(_._2).toMap)
  }

  test("salted exact-distinct and collect_set equal direct aggregation (hot key, duplicate values)") {
    import spark.implicits._
    // hot key with heavy value duplication (the non-combinable case
    // salting actually exists for), plus nulls that both paths must drop
    val rnd = new scala.util.Random(42)
    val rows = (1 to 20000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 50}" else "HOT"
      val v: java.lang.Long = if (i % 97 == 0) null else java.lang.Long.valueOf(rnd.nextInt(300).toLong)
      (k, v)
    }
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k").agg(count_distinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedCountDistinct(df, col("k"), col("v"), 8)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    val directSets = df.where(col("v").isNotNull).groupBy("k").agg(collect_set(col("v")).as("s"))
      .as[(String, Seq[Long])].collect().map { case (k, s) => k -> s.sorted }.toMap
    val saltedSets = SkewOps.saltedCollectSet(df, col("k"), col("v"), 8)
      .as[(String, Seq[Long])].collect().map { case (k, s) => k -> s.sorted }.toMap
    assert(saltedSets == directSets)
    // disjointness means no re-dedup was needed: sizes must also agree
    assert(saltedSets.view.mapValues(_.size).toMap == directSets.view.mapValues(_.size).toMap)
  }

  test("salted join equals the plain inner join (hot fact key, unmatched keys both sides)") {
    import spark.implicits._
    // 90% of fact rows share one hot key; "orphan" has no dim row and
    // "unused" no fact row — inner-join semantics must hold exactly
    val fact = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 50}" else if (i % 97 == 0) "orphan" else "HOT"
      (i.toLong, k)
    }.toDF("id", "k")
    val dim = (Seq("HOT", "unused") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 100L) }.toDF("k", "payload")
    val direct = fact.join(dim, "k").select("id", "k", "payload")
      .as[(Long, String, Long)].collect().toSet
    val salted = SkewOps.saltedJoin(fact, dim, "k", 8)
      .select("id", "k", "payload")
      .as[(Long, String, Long)].collect().toSet
    assert(salted == direct)
    assert(!direct.exists(_._2 == "orphan"), "orphan fact rows must not match")
    // null join keys must keep inner-join semantics (dropped on both
    // paths), and the degenerate bucket counts must stay exact
    val factN = fact.unionAll(Seq((99990L, null: String), (99991L, null: String)).toDF("id", "k"))
    val dimN  = dim.unionAll(Seq((null: String, 777L)).toDF("k", "payload"))
    val directN = factN.join(dimN, "k").select("id", "k", "payload")
      .as[(Long, String, Long)].collect().toSet
    assert(directN == direct, "null keys must not join")
    for (s <- Seq(1, 3, 16)) {
      val viaS = SkewOps.saltedJoin(factN, dimN, "k", s)
        .select("id", "k", "payload").as[(Long, String, Long)].collect().toSet
      assert(viaS == directN, s"saltBuckets=$s diverged")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val s = TestSpark.spark
    s.sql("DROP TABLE IF EXISTS orders_b")
    s.sql("DROP TABLE IF EXISTS customer_b")
    // external bucketed tables (warehouse.dir is a static conf; an
    // explicit path keeps the test out of the repo working dir)
    Tables.load(s, "/root/testdata/sf0.001", "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.load(s, "/root/testdata/sf0.001", "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val joined = s.table("orders_b")
      .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    joined.collect() // force final (adaptive) plan
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // the JOIN itself must be shuffle-free (bucket co-location); the only
    // allowed exchange is the one feeding the final groupBy
    assert(shuffles.size <= 1,
      s"expected bucket-co-located join (≤1 exchange for the agg), got ${shuffles.size}")
    assert(joined.count() > 0)
  }

  test("partitioned+sorted layout: directory pruning engages, file count bounded, files sorted") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft-layout").toString
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    graft.sources.Layout.writePartitioned(events, out, Seq("event_type"), Seq("ts"))
    // the repartition-first guard: each partition dir holds a bounded
    // file count (without it: one file per write task per dir)
    val typeDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("event_type=")).toSeq
    assert(typeDirs.nonEmpty)
    typeDirs.foreach { d =>
      val files = Files.list(d).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(files <= 2, s"write amplification: $files files in $d")
    }
    // a partition-column filter must become directory pruning, and the
    // pruned read must equal filtering the unpartitioned table
    val someType = events.select("event_type").limit(1).collect()(0).getString(0)
    val pruned = spark.read.parquet(out).where(col("event_type") === someType)
    val rows = pruned.collect()
    val scanStr = pruned.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters") && scanStr.contains("event_type"),
      s"expected a PartitionFilters entry on the scan:\n$scanStr")
    assert(rows.length ==
      events.where(col("event_type") === someType).count())
    // sortWithinPartitions clustered each file on ts (what row-group
    // min/max pruning rides): a single file must read back ts-sorted
    val oneFile = Files.list(typeDirs.head).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.toString
    val ts = spark.read.parquet(oneFile).select(col("ts").cast("long"))
      .collect().map(_.getLong(0))
    assert(ts.zip(ts.drop(1)).forall { case (a, b) => a <= b },
      "file not clustered on the sort key")
  }

  test("q15g bloom: no false negatives, real pruning, and the verified result is exact") {
    import spark.implicits._
    import graft.operators.RelationalQueries
    val sf = "/root/testdata/sf0.001"
    val dim = Tables.load(spark, sf, "customer")
      .where(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("user_id"))
    val mask = RelationalQueries.bloomMask(dim, "user_id")
    // completeness: every dim key passes its own bloom (structural, but
    // a packing bug would break exactly this)
    assert(dim.where(!RelationalQueries.bloomMayContain(col("user_id"), mask)).count() == 0,
      "a bloom must never reject a key it was built from")
    val events = Tables.load(spark, sf, "events")
    val total = events.count()
    val passed = events.where(RelationalQueries.bloomMayContain(col("user_id"), mask)).count()
    val exact = events.join(dim, Seq("user_id"), "left_semi").count()
    // superset + pruning: bloom passes cover every true match, yet
    // reject most of the fact table (the point of the pre-filter)
    assert(passed >= exact, s"bloom passes ($passed) below true matches ($exact)")
    assert(passed < total / 2,
      s"bloom rejected too little: $passed of $total rows passed")
    // the composed operator is exact
    val got = RelationalQueries.q15gBloomSemijoin(spark, sf).collect().toSeq
    val want = events.join(dim, Seq("user_id"), "left_semi")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect().toSeq
    assert(got == want, "bloom pre-filter + exact verify diverged from the plain semi-join")
  }

  test("q26: the layout is load-bearing — pruned scan reads strictly fewer files, same answer as flat") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val sf = "/root/testdata/sf0.001"
    val q26 = graft.operators.LayoutQueries.q26LayoutScan(spark, sf)
    val rows = q26.collect()
    // same answer as the identical query over the flat table
    val flat = Tables.load(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("hour").collect()
    assert(rows.toSeq == flat.toSeq, "layout scan diverged from the flat twin")
    // the scan pruned: PartitionFilters engaged, and the files it read
    // are strictly fewer than the layout table holds
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    val scan = nodes(q26.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScan in the q26 plan"))
    assert(scan.partitionFilters.mkString(",").contains("event_type"),
      "q26 scan carries no event_type partition filter")
    val filesRead = scan.selectedPartitions.totalNumberOfFiles
    val layoutRoot = graft.core.IndexStore.root("graft-layout-events", sf).resolve("data")
    val totalFiles = Files.walk(layoutRoot).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(filesRead > 0 && filesRead < totalFiles,
      s"expected a pruned read, got $filesRead of $totalFiles files")
    // the second pruning level: a ts-range predicate must reach the
    // parquet reader as a pushed filter (riding the in-file ts sort for
    // row-group min/max skipping), ON TOP of the directory pruning
    val ranged = graft.operators.LayoutQueries.eventsByType(spark, sf)
      .where(col("event_type") === "purchase" &&
             col("ts") >= lit("2024-01-02").cast("timestamp"))
    ranged.collect()
    val rangedScan = nodes(ranged.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScan in the ranged plan"))
    assert(rangedScan.partitionFilters.mkString(",").contains("event_type"))
    assert(rangedScan.dataFilters.mkString(",").contains("ts"),
      s"ts range must be a data filter on the scan: ${rangedScan.dataFilters}")
    assert(rangedScan.metadata.getOrElse("PushedFilters", "").contains("ts"),
      s"ts range must push to the parquet reader: ${rangedScan.metadata.get("PushedFilters")}")
  }

  test("q26b: backfill rewrites exactly the click partition; untouched files bit-identical; answers hold") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val sf = "/root/testdata/sf0.001"
    // ensure the layout exists, then snapshot the physical state of an
    // UNTOUCHED partition and the pre-backfill q26 answer
    val root = graft.operators.LayoutQueries.eventsByTypeRoot(spark, sf).resolve("data")
    def filesOf(dir: String): Map[String, FileTime] =
      Files.list(root.resolve(dir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p)).toMap
    val purchaseBefore = filesOf("event_type=purchase")
    val clickBefore = filesOf("event_type=click")
    val q26Before = graft.operators.LayoutQueries.q26LayoutScan(spark, sf).collect().toSeq
    val got = graft.operators.LayoutQueries.q26bLayoutBackfill(spark, sf).collect().toSeq
    // the rewrite really happened: fresh files in the click dir (names
    // are write-UUID-stamped, so any rewrite changes them); file COUNT
    // stays bounded by the filesPerDir knob (AQE may coalesce the tiny
    // fixture to 1 — the spread mechanics are pinned in the
    // filesPerDir spec below)
    val clickFiles = filesOf("event_type=click")
    assert(clickFiles.nonEmpty && clickFiles.size <= 2,
      s"backfilled partition should hold 1..2 files, got ${clickFiles.keys}")
    assert(clickFiles.keySet.intersect(clickBefore.keySet).isEmpty,
      "backfill left the original click files in place — no rewrite happened")
    // partitions absent from the backfill frame: same files, same mtimes
    assert(filesOf("event_type=purchase") == purchaseBefore,
      "backfill touched a partition absent from the incoming frame")
    // the composed answer equals the flat corpus (rewritten + untouched)
    val flat = Tables.load(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type", "hour").collect().toSeq
    assert(got == flat, "post-backfill composed read diverged from the flat corpus")
    // and q26 (same table, different partition) is unaffected
    assert(graft.operators.LayoutQueries.q26LayoutScan(spark, sf).collect().toSeq == q26Before)
  }

  test("layout filesPerDir: a hot partition value spreads over n write tasks/files, each still sorted") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    // skewed: 10k rows of one hot key, 100 of a cold one
    val skewed = ((0 until 10000).map(i => ("hot", i.toLong)) ++
        (0 until 100).map(i => ("cold", i.toLong)))
      .toDF("k", "ts")
    val out = Files.createTempDirectory("graft-layout-skew").toString
    // at this fixture's size AQE correctly coalesces the whole shuffle
    // into one partition (small data → no straggler to spread); disable
    // coalescing here to exercise the at-scale mechanics, where a hot
    // value exceeds the advisory partition size and AQE keeps the split
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try graft.sources.Layout.writePartitioned(skewed, out, Seq("k"), Seq("ts"), filesPerDir = 4)
    finally spark.conf.set(coalesceKey, saved)
    def filesIn(dir: String): Seq[java.nio.file.Path] =
      Files.list(Paths.get(out, dir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    // the hot dir spread over >1 task (no single-task straggler) while
    // file count stays bounded by the knob
    val hot = filesIn("k=hot")
    assert(hot.size > 1 && hot.size <= 4,
      s"hot partition should spread over 2..4 files, got ${hot.size}")
    assert(filesIn("k=cold").size <= 4)
    // each file individually sorted on ts (per-file row-group pruning holds)
    hot.foreach { f =>
      val ts = spark.read.parquet(f.toString).select("ts").as[Long].collect()
      assert(ts.zip(ts.drop(1)).forall { case (a, b) => a <= b },
        s"file $f not sorted on ts")
    }
    // no row lost or duplicated by the spread
    assert(spark.read.parquet(out).count() == 10100L)
  }

  test("overwritePartitions: only the incoming partitions rewrite; others' files stay bit-identical") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val out = Files.createTempDirectory("graft-layout-dynamic").toString
    val full = ((1 to 100).map(i => ("a", i.toLong, i.toLong)) ++
        (1 to 100).map(i => ("b", i.toLong, i.toLong * 10)))
      .toDF("k", "ts", "v")
    graft.sources.Layout.writePartitioned(full, out, Seq("k"), Seq("ts"))
    def filesOf(dir: String): Map[String, FileTime] =
      Files.list(Paths.get(out, dir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p)).toMap
    val aBefore = filesOf("k=a")
    // backfill partition b only — corrected values
    val patch = (1 to 100).map(i => ("b", i.toLong, i.toLong * 100)).toDF("k", "ts", "v")
    graft.sources.Layout.overwritePartitions(patch, out, Seq("k"), Seq("ts"))
    // untouched partition: same files, same mtimes (never rewritten)
    assert(filesOf("k=a") == aBefore,
      "dynamic overwrite must not touch partitions absent from the incoming frame")
    // touched partition: fully replaced; reads compose old a + new b
    val got = spark.read.parquet(out).groupBy("k").sum("v")
      .as[(String, Long)].collect().toMap
    assert(got("a") == (1 to 100).map(_.toLong).sum)
    assert(got("b") == (1 to 100).map(_.toLong * 100).sum,
      "backfilled partition must serve the new values")
  }

  test("binned band join: equals the naive range join, including boundaries and zero-neighbor rows") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    // events straddling bin edges: pairs at exactly ±60s (inclusive),
    // ±60.000001s (out), same-type neighbors (excluded), isolated rows
    val rows = Seq(
      (1L, ts(0), "click"),
      (2L, ts(60), "purchase"),      // +60s from e1: in (boundary), cross-bin
      (3L, ts(121), "purchase"),     // +121s from e1: out of band
      (4L, ts(50), "click"),         // same type as e1: not its neighbor
      (5L, ts(1000), "view"),        // isolated
      (6L, ts(-60), "view")          // -60s from e1: in (boundary, negative side)
    ).toDF("event_id", "ts", "event_type")
      .withColumn("user_id", lit(0L)).withColumn("value", lit(0.0))
    val got = graft.operators.RangeJoin.neighborCounts(rows, 60L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // naive ground truth computed inline
    val raw = rows.select("event_id", "ts", "event_type")
      .as[(Long, Timestamp, String)].collect()
    val want = raw.map { case (id, t, ty) =>
      id -> raw.count { case (id2, t2, ty2) =>
        id2 != id && ty2 != ty && math.abs(t2.getTime - t.getTime) <= 60000L
      }.toLong
    }.toMap
    assert(got == want, s"got $got want $want")
    assert(got(5L) == 0L, "isolated row must survive with 0 neighbors")
  }

  test("q22b plans as an equi-join on bins — never a cartesian/nested-loop") {
    val q = graft.operators.RangeJoin.q22bRangeJoin(spark, "/root/testdata/sf0.001")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "range join must be rewritten to a binned equi-join")
  }

  // tree walk that descends into AQE query stages (a bare .collect on
  // the adaptive root sees only stage boundaries)
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val below = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ below)
  }

  test("q15d: unioned day-sketches estimate within 5% of the exact distinct count") {
    import graft.operators.RelationalQueries
    val est = RelationalQueries.q15dSketchUnion(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k).toDouble - n) / n <= 0.05,
        s"$k: sketch estimate ${est(k)} vs exact $n") }
  }

  test("q15e: approximate quantiles land inside the exact p25..p99 envelope per group") {
    import graft.operators.RelationalQueries
    val dir = "/root/testdata/sf0.001"
    val approx = RelationalQueries.q15eApproxQuantiles(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.25)").as("p25"),
           expr("percentile(value, 0.75)").as("p75"),
           expr("percentile(value, 0.90)").as("p90"),
           expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p25, p75, p90, p99)) =>
      val (a50, a95) = approx(k)
      // approx_percentile returns a real order statistic; at accuracy
      // 10000 over a few hundred rows per group it must not wander
      // outside the bracketing exact quantiles
      assert(a50 >= p25 && a50 <= p75, s"$k: p50≈$a50 outside [$p25, $p75]")
      assert(a95 >= p90 && a95 <= p99, s"$k: p95≈$a95 outside [$p90, $p99]")
    }
  }

  test("runtime bloom-filter pruning: a selective dim filter reaches the fact side of a shuffle join") {
    // the row-level twin of dynamic PARTITION pruning: when the fact
    // side isn't partitioned by the join key, Spark can still inject a
    // bloom filter built from the filtered dim into the fact scan,
    // turning a shuffle of all fact rows into a shuffle of probable
    // matches. Local data sits under the 10 GiB application-side
    // default, so lower the threshold to make the optimizer's decision
    // visible at test scale (at 100 TB the defaults fire on their own).
    val s = TestSpark.spark
    def withConf[T](kv: (String, String)*)(body: => T): T = {
      val old = kv.map { case (k, _) => k -> s.conf.getOption(k) }
      kv.foreach { case (k, v) => s.conf.set(k, v) }
      try body finally old.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None)    => s.conf.unset(k)
      }
    }
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = Tables.load(s, "/root/testdata/sf0.001", "lineitem")
      val dim  = Tables.load(s, "/root/testdata/sf0.001", "orders")
        .where(col("o_totalprice") > 450000.0)
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"fact side must carry an injected bloom-filter probe: ${opt.take(600)}")
      q.collect() // and the filtered plan still executes
    }
  }

  test("static partition pruning: a filter on the partition column reads one directory") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-part").toString
    val s = TestSpark.spark
    Tables.load(s, "/root/testdata/sf0.001", "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val nLangs = Tables.load(s, "/root/testdata/sf0.001", "documents")
      .select("lang").distinct().count()
    assert(nLangs > 1, "corpus must span several langs for pruning to mean anything")
    val q = s.read.parquet(dir).where(col("lang") === "en").groupBy("source").count()
    q.collect()
    val scans = allNodes(q.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // pruning happens at plan time: only lang=en's directory is listed
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"expected 1 of $nLangs partition dirs after pruning, got ${scans.head.selectedPartitions.partitionCount}")
    assert(scans.head.partitionFilters.nonEmpty, "lang filter must be a partition filter, not a data filter")
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions through the join") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-dpp").toString
    val s = TestSpark.spark
    // fact partitioned by status; dim carries the filter the fact scan
    // can't see statically — DPP pushes the dim's surviving keys into
    // the fact's partition listing as a runtime subquery filter
    Tables.load(s, "/root/testdata/sf0.001", "orders")
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(dir)
    // the dim must be a file source: a literal LocalRelation's filter
    // constant-folds at plan time and DPP sees no selective predicate
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("st", "label").write.mode("overwrite").parquet(dimDir)
    val q = s.read.parquet(dir)
      .join(s.read.parquet(dimDir).where(col("label") === "finished"),
        col("o_orderstatus") === col("st"))
      .groupBy("st").count()
    q.collect()
    val factScans = allNodes(q.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(factScans.nonEmpty)
    val pruned = factScans.exists(_.partitionFilters.exists(
      _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])))
    assert(pruned,
      s"fact scan must carry a dynamic pruning filter: ${factScans.map(_.partitionFilters).mkString(";")}")
  }

  test("q26d: manifest selects strictly fewer files; the scan reads exactly those; answer matches flat") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val sf = "/root/testdata/sf0.001"
    val q = graft.operators.LayoutQueries.q26dManifestScan(spark, sf)
    val rows = q.collect()
    val flat = Tables.load(spark, sf, "events")
      .where(col("user_id").between(5, 9) &&
             col("ts") >= lit("2024-01-20").cast("timestamp") &&
             col("ts") < lit("2024-01-25").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect()
    assert(rows.toSeq == flat.toSeq, "manifest-pruned scan diverged from the flat twin")
    // the manifest covers every file exactly once, and the box selects
    // a strict subset
    val root = graft.core.IndexStore.root("graft-layout-events-zorder", sf)
    val mf = spark.read.parquet(root.resolve("manifest").toString)
    assert(mf.count() == graft.operators.LayoutQueries.ZOrderFiles,
      "manifest must hold one row per layout file")
    val t0 = lit("2024-01-20").cast("timestamp")
    val t1 = lit("2024-01-25").cast("timestamp")
    val selected = mf.where(col("uhi") >= 5 && col("ulo") <= 9 &&
      col("thi") >= t0 && col("tlo") < t1).count()
    assert(selected > 0 && selected < graft.operators.LayoutQueries.ZOrderFiles,
      s"expected a strict manifest subset, got $selected of ${graft.operators.LayoutQueries.ZOrderFiles}")
    // the physical scan reads exactly the manifest selection — the
    // planner never re-lists the table
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(qs.plan)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    val scan = nodes(q.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScan in the q26d plan"))
    assert(scan.selectedPartitions.totalNumberOfFiles == selected,
      s"scan must read exactly the manifest selection: ${scan.selectedPartitions.totalNumberOfFiles} vs $selected")
  }

  test("q26e: metadata-only aggregate — the plan's only file scan is the manifest, answers exact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val sf = "/root/testdata/sf0.001"
    val q = graft.operators.LayoutQueries.q26eMetadataCount(spark, sf)
    val row = q.collect().head
    val flat = Tables.load(spark, sf, "events")
      .agg(count(lit(1)).as("n_rows"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts")).collect().head
    assert(row == flat, s"manifest aggregate diverged: $row vs $flat")
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(qs.plan)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    val scans = nodes(q.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.metadata.getOrElse("Location", "").contains("manifest")),
      s"metadata-only query must never open a data file: ${scans.map(_.metadata.get("Location"))}")
  }

  test("morton interleave: spread16 places bits on even positions; zorder2 bits are disjoint") {
    import spark.implicits._
    val r = spark.range(1).select(
      graft.sources.Layout.spread16(lit(0xFFFFL)).as("all"),
      graft.sources.Layout.spread16(lit(0x0001L)).as("one"),
      graft.sources.Layout.zorder2(lit(0xFFFFL), lit(0L)).as("a_only"),
      graft.sources.Layout.zorder2(lit(0L), lit(0xFFFFL)).as("b_only"),
      graft.sources.Layout.zorder2(lit(0xFFFFL), lit(0xFFFFL)).as("both"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._1 == 0x55555555L)           // 16 bits → even positions
    assert(r._2 == 1L)
    assert(r._3 == 0x55555555L)           // dim A → even bits
    assert(r._4 == 0xAAAAAAAAL)           // dim B → odd bits
    assert((r._3 & r._4) == 0 && r._5 == 0xFFFFFFFFL) // disjoint, complete
  }

  test("q26c: z-order clusters BOTH dims per file — 2-D box skips files the linear layout cannot") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val sf = "/root/testdata/sf0.001"
    val q = graft.operators.LayoutQueries.q26cZorderScan(spark, sf)
    val rows = q.collect()
    // same answer as the identical box over the flat table
    val flat = Tables.load(spark, sf, "events")
      .where(col("user_id").between(10, 30) &&
             col("ts") >= lit("2024-01-08").cast("timestamp") &&
             col("ts") < lit("2024-01-13").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect()
    assert(rows.toSeq == flat.toSeq, "z-order scan diverged from the flat twin")
    // both box edges reach the parquet reader as pushed filters
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(qs.plan)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    val scan = nodes(q.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScan in the q26c plan"))
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("user_id") && pushed.contains("ts"),
      s"both box dims must push to the parquet reader: $pushed")
    // THE MECHANISM, measured: per-file (min,max) envelopes. In the
    // z-ordered copy a file bounds BOTH user_id and ts, so each box
    // edge disqualifies (= makes skippable) some files; in the
    // ts-sorted q26 layout every file's user_id envelope spans the
    // whole user domain and the user edge disqualifies nothing — the
    // one-key sort cannot serve the second dimension.
    def envelopes(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
           min(col("ts")).as("tlo"), max(col("ts")).as("thi"))
      .collect()
    val t0 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-13 00:00:00")
    def userSkips(env: Array[org.apache.spark.sql.Row]) =
      env.count(r => r.getLong(r.fieldIndex("uhi")) < 10 || r.getLong(r.fieldIndex("ulo")) > 30)
    def tsSkips(env: Array[org.apache.spark.sql.Row]) =
      env.count(r => r.getTimestamp(r.fieldIndex("thi")).before(t0) ||
                     !r.getTimestamp(r.fieldIndex("tlo")).before(t1))
    val zEnv = envelopes(graft.operators.LayoutQueries.eventsZOrdered(spark, sf))
    val linEnv = envelopes(graft.operators.LayoutQueries.eventsByType(spark, sf))
    assert(zEnv.length == graft.operators.LayoutQueries.ZOrderFiles,
      s"expected ${graft.operators.LayoutQueries.ZOrderFiles} z-files, got ${zEnv.length}")
    assert(userSkips(zEnv) > 0,
      s"z layout must skip files on the user_id edge: ${zEnv.map(r => (r.getLong(1), r.getLong(2))).mkString(",")}")
    assert(tsSkips(zEnv) > 0, "z layout must skip files on the ts edge")
    assert(userSkips(linEnv) == 0,
      "the ts-sorted layout should not be user_id-skippable (else the A/B proves nothing)")
    assert(userSkips(zEnv) + tsSkips(zEnv) < zEnv.length,
      "some files must remain eligible — the box is not empty")
  }

  test("q26f snapshots: two-load history under one pointer; pinned v1 is exactly the pre-cutoff corpus") {
    import graft.core.SnapshotStore
    import graft.operators.LayoutQueries
    val sf = "/root/testdata/sf0.001"
    val root = LayoutQueries.eventsSnapRoot(spark, sf)
    assert(SnapshotStore.headVersion(root).contains(2L), "build must leave HEAD at v2")
    val events = Tables.load(spark, sf, "events")
    val cut = lit(LayoutQueries.SnapCutoff).cast("timestamp")
    val nPre = events.where(col("ts") < cut).count()
    val nAll = events.count()
    // metadata-only counts at both versions — no data file opened
    assert(SnapshotStore.countAt(spark, root, Some(1L)) == nPre,
      "v1 manifest row count must equal the initial load")
    assert(SnapshotStore.countAt(spark, root) == nAll,
      "HEAD manifest row count must equal the full corpus")
    // the pinned read's CONTENT equals the pre-cutoff corpus exactly
    val v1Ids = SnapshotStore.readAt(spark, root, Some(1L))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val preIds = events.where(col("ts") < cut)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(v1Ids == preIds, "pinned v1 read diverged from the pre-cutoff corpus")
    // partition-dir columns survive the manifest read path: an
    // event_type predicate still prunes as a PartitionFilters entry
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    val pinnedScan = SnapshotStore.readAt(spark, root, Some(1L))
      .where(col("event_type") === "purchase")
    pinnedScan.collect()
    val scan = nodes(pinnedScan.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScan in the pinned-read plan"))
    assert(scan.partitionFilters.mkString(",").contains("event_type"),
      "manifest-served read lost partition pruning")
  }

  test("q26g: manifest prunes v1 to strictly fewer files; selected envelopes intersect the box; answer matches flat") {
    import graft.core.SnapshotStore
    import graft.operators.LayoutQueries
    val sf = "/root/testdata/sf0.001"
    val root = LayoutQueries.eventsSnapRoot(spark, sf)
    val t0 = java.sql.Timestamp.valueOf("2024-01-12 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    val allPurchaseV1 = SnapshotStore.filesAtWhere(spark, root, 1L,
      col("file").startsWith("data/event_type=purchase/"))
    val selected = SnapshotStore.filesAtWhere(spark, root, 1L,
      col("file").startsWith("data/event_type=purchase/") &&
        col("max_ts") >= lit(t0) && col("min_ts") < lit(t1))
    // the ranged layout must give the partition >1 ts-contiguous file,
    // and the envelope filter must skip at least one of them
    assert(allPurchaseV1.size > 1,
      s"ranged load should split the purchase partition, got ${allPurchaseV1.size} file(s)")
    assert(selected.nonEmpty && selected.size < allPurchaseV1.size,
      s"envelope pruning must skip files: ${selected.size} of ${allPurchaseV1.size} selected")
    // answer ≡ the flat corpus restricted to the v1 horizon
    val got = LayoutQueries.q26gSnapshotSkipScan(spark, sf).collect().toSeq
    val flat = Tables.load(spark, sf, "events")
      .where(col("event_type") === "purchase" &&
        col("ts") >= lit(t0) && col("ts") < lit(t1) &&
        col("ts") < lit(LayoutQueries.SnapCutoff).cast("timestamp"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("day").collect().toSeq
    assert(got == flat, "version-pinned skipped scan diverged from the flat twin")
  }

  test("q23c expectations: the enum-drift row fails loudly, clean constraints pass, FK checked count is the fact table") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.RelationalQueries.q23cExpectations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the deliberately failing expectation: 'error' rows violate the enum
    val (_, enumViol, enumPass) = rows(("events", "event_type_in_enum"))
    assert(enumViol > 0 && enumPass == 0, "enum drift must surface as a failed expectation")
    // clean constraints pass with zero violations
    for (k <- Seq(("orders", "orderkey_unique"), ("lineitem", "fk_orderkey_exists"),
                  ("events", "value_nonneg_notnull"), ("documents", "text_nonempty"))) {
      val (_, v, p) = rows(k)
      assert(v == 0 && p == 1, s"$k expected clean, got $v violations")
    }
    val li = Tables.load(spark, sf, "lineitem").count()
    assert(rows(("lineitem", "fk_orderkey_exists"))._1 == li,
      "FK expectation must report the fact table's row count as checked")
  }

  test("q27 funnel: stage cohorts are nested (monotone non-increasing) and order-sensitive") {
    import graft.operators.WindowQueries
    val sf = "/root/testdata/sf0.001"
    val stages = WindowQueries.q27Funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(stages("1_view") >= stages("2_click") &&
           stages("2_click") >= stages("3_purchase"),
      s"funnel must narrow: $stages")
    assert(stages("3_purchase") > 0, "the fixture has complete funnels")
    // order-sensitivity: stage 2 counts clicks AFTER the first view,
    // so it must undercount the users who merely have both types
    val both = Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
           max(when(col("event_type") === "click", 1).otherwise(0)).as("c"))
      .where(col("v") === 1 && col("c") === 1).count()
    assert(stages("2_click") <= both)
  }

  test("q27b retention: offset-0 diagonal equals cohort sizes; cells sum to total user-days") {
    import graft.operators.WindowQueries
    val sf = "/root/testdata/sf0.001"
    val cells = WindowQueries.q27bRetention(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells.keys.forall(_._2 >= 0), "offsets are non-negative by construction")
    // every user is active on their cohort day → the offset-0 column
    // sums to the distinct-user count
    val nUsers = Tables.load(spark, sf, "events").select("user_id").distinct().count()
    assert(cells.collect { case ((_, 0L), n) => n }.sum == nUsers)
    // cells partition the distinct (user, day) activity set
    val userDays = Tables.load(spark, sf, "events")
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    assert(cells.values.sum == userDays)
  }

  test("q26k schema evolution: pinned v1 has no props column; merged HEAD nulls exactly the pre-evolution rows") {
    import graft.core.SnapshotStore
    import graft.operators.LayoutQueries
    val sf = "/root/testdata/sf0.001"
    val root = LayoutQueries.eventsSnapEvoRoot(spark, sf)
    // the pre-evolution snapshot genuinely lacks the column
    val v1 = SnapshotStore.readAt(spark, root, Some(1L), inferPartitions = false)
    assert(!v1.columns.contains("props"), "v1 must predate the column")
    // the merged read serves the union schema, NULL exactly where the
    // column predates the row's file
    val head = SnapshotStore.readAt(spark, root, inferPartitions = false,
      mergeSchema = true)
    assert(head.columns.contains("props"))
    val cut = lit(LayoutQueries.SnapCutoff).cast("timestamp")
    assert(head.where(col("ts") < cut && col("props").isNotNull).count() == 0,
      "pre-evolution rows must surface the new column as NULL")
    val events = Tables.load(spark, sf, "events")
    assert(head.where(col("props").isNotNull).count() ==
      events.where(col("ts") >= cut).count(),
      "every post-evolution row carries the column")
  }

  test("snapshot isolation: a reader pinned at N is untouched by a concurrent commit; vacuum retires only unreferenced files") {
    import graft.core.SnapshotStore
    import graft.sources.Layout
    // private table root — this test commits and vacuums destructively
    val root = java.nio.file.Files.createTempDirectory("snap-iso")
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    Layout.writePartitioned(events, root.resolve("data").toString,
      partitionCols = Seq("event_type"), sortCols = Seq("ts"))
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("s"))
      .orderBy("event_type").collect().toSeq
    val pinned = rollup(SnapshotStore.readAt(spark, root, Some(1L)))
    val v1Files = SnapshotStore.filesAt(spark, root, 1L)
    // concurrent backfill: the click partition's content is REWRITTEN
    // (values doubled — a real correction, not an idempotent re-derive)
    // as fresh files; v2's manifest swaps the old click files out
    Layout.appendPartitioned(
      events.where(col("event_type") === "click")
        .withColumn("value", col("value") * 2),
      root.resolve("data").toString,
      partitionCols = Seq("event_type"), sortCols = Seq("ts"))
    val newFiles = SnapshotStore.dataFiles(root).filterNot(v1Files.toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("event_type=click")))
    val oldClick = v1Files.filter(_.contains("event_type=click"))
    SnapshotStore.commit(spark, root,
      v1Files.filterNot(oldClick.toSet) ++ newFiles) // v2
    assert(SnapshotStore.headVersion(root).contains(2L))
    // the pinned reader: same answer, and the plan reads EXACTLY v1's files
    val pinnedAfter = SnapshotStore.readAt(spark, root, Some(1L))
    assert(rollup(pinnedAfter) == pinned,
      "pinned v1 answer changed under a concurrent commit")
    val readFiles = pinnedAfter.select(input_file_name()).distinct()
      .collect().map(r => root.relativize(
        java.nio.file.Paths.get(new java.net.URI(r.getString(0)))).toString)
      .sorted.toSeq
    assert(readFiles == v1Files, "pinned read touched files outside v1's manifest")
    // HEAD reflects the correction
    val head = rollup(SnapshotStore.readAt(spark, root))
    val pinnedClick = pinned.find(_.getString(0) == "click").get
    val headClick = head.find(_.getString(0) == "click").get
    assert(headClick.getLong(1) == pinnedClick.getLong(1))
    assert(math.abs(headClick.getDouble(2) - 2 * pinnedClick.getDouble(2)) < 1e-6,
      "HEAD must serve the corrected click values")
    // vacuum retain=1: v1 expires; exactly the replaced click files die
    val dead = SnapshotStore.vacuum(spark, root, retain = 1)
    assert(dead.sorted == oldClick.sorted,
      s"vacuum must retire exactly the superseded click files, got $dead")
    assert(rollup(SnapshotStore.readAt(spark, root)) == head,
      "HEAD read must survive vacuum untouched")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("snapshot CAS commit: two interleaved committers — one wins, one fails cleanly, no torn state (VERDICT r11 #4)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap-cas")
    def writeLoad(name: String, ids: Seq[Long]): Unit =
      ids.toDF("id").coalesce(1).write.mode("overwrite")
        .parquet(root.resolve(s"data/$name").toString)
    writeLoad("load1", 1L to 10L)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
    val base = SnapshotStore.headVersion(root).get
    // both committers derive their file lists FROM v1 …
    val v1Files = SnapshotStore.filesAt(spark, root, base)
    writeLoad("loadA", 100L to 104L)
    writeLoad("loadB", 200L to 209L)
    val filesA = SnapshotStore.dataFiles(root).filter(f =>
      v1Files.contains(f) || f.contains("loadA"))
    val filesB = SnapshotStore.dataFiles(root).filter(f =>
      v1Files.contains(f) || f.contains("loadB"))
    // … B commits first; A's commit — pinned to the base its manifest
    // derives from — must FAIL, not last-wins-overwrite B
    assert(SnapshotStore.commit(spark, root, filesB, expectedBase = base) == base + 1)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commit(spark, root, filesA, expectedBase = base)
    }
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    // no torn state: HEAD is B's version, its content is exactly B's
    // files, no version-3 manifest or temp litter exists
    assert(SnapshotStore.headVersion(root).contains(base + 1))
    assert(SnapshotStore.filesAt(spark, root, base + 1) == filesB.sorted)
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 20)
    import scala.jdk.CollectionConverters._
    val snapNames = java.nio.file.Files.list(root.resolve("_snapshots"))
      .iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    assert(snapNames == Seq("HEAD", "manifests", "v=1", "v=2"),
      s"unexpected snapshot-dir residue: $snapNames")
    // and the LOSER left no manifest-part litter either: every part on
    // disk is referenced by a surviving version's list (round 14)
    val referenced = Seq(1L, 2L).flatMap { v =>
      new String(java.nio.file.Files.readAllBytes(
        root.resolve(s"_snapshots/v=$v/_list.tsv")), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map(_.split("\t")(0))
    }.toSet
    val partsOnDisk = java.nio.file.Files.list(root.resolve("_snapshots/manifests"))
      .iterator().asScala.map(p => s"_snapshots/manifests/${p.getFileName}").toSeq
    assert(partsOnDisk.toSet == referenced,
      s"orphaned manifest parts: ${partsOnDisk.filterNot(referenced)}")
    // the genuinely concurrent path: two threads race the SAME base;
    // exactly one wins, the other fails with CME, HEAD advances once
    writeLoad("loadC", 300L to 304L)
    writeLoad("loadD", 400L to 404L)
    val base2 = SnapshotStore.headVersion(root).get
    val head2Files = SnapshotStore.filesAt(spark, root, base2)
    val ready = new java.util.concurrent.CyclicBarrier(2)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = Seq("loadC", "loadD").map { tag =>
      new Thread(() => {
        val mine = SnapshotStore.dataFiles(root).filter(f =>
          head2Files.contains(f) || f.contains(tag))
        ready.await()
        try { SnapshotStore.commit(spark, root, mine, expectedBase = base2); outcomes.add(s"ok:$tag") }
        catch { case _: java.util.ConcurrentModificationException => outcomes.add(s"cme:$tag") }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    val res = outcomes.asScala.toSeq.sorted
    assert(res.count(_.startsWith("ok:")) == 1 && res.count(_.startsWith("cme:")) == 1,
      s"expected exactly one winner and one clean loser, got $res")
    assert(SnapshotStore.headVersion(root).contains(base2 + 1))
    // crash recovery: a writer that published v=N+1 but died before the
    // pointer swing (simulated by rewinding HEAD) is reclaimed by the
    // next commit — the documented pre-CAS behavior, preserved
    val headBefore = SnapshotStore.headVersion(root).get
    java.nio.file.Files.write(root.resolve("_snapshots/HEAD"),
      (headBefore - 1).toString.getBytes("UTF-8"))
    writeLoad("loadE", 500L to 504L)
    val orphanBase = headBefore - 1
    val keepFiles = SnapshotStore.filesAt(spark, root, orphanBase)
    val filesE = SnapshotStore.dataFiles(root).filter(f =>
      keepFiles.contains(f) || f.contains("loadE"))
    assert(SnapshotStore.commit(spark, root, filesE) == headBefore,
      "the orphaned version number must be reclaimed")
    assert(SnapshotStore.filesAt(spark, root, headBefore) == filesE.sorted)
    // single-writer loops unaffected: a plain sequential commit still works
    writeLoad("loadF", 600L to 604L)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root).filter(f =>
      SnapshotStore.filesAt(spark, root, headBefore).contains(f) || f.contains("loadF")))
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("snapshot commit: zero-row data files commit as n_rows=0 manifest entries (ADVICE r11)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap-zero")
    (1L to 5L).toDF("id").coalesce(1).write.parquet(root.resolve("data/load1").toString)
    // a schema-only parquet file — what an empty micro-batch epoch or an
    // empty partition write leaves behind
    spark.range(0).select(col("id")).coalesce(1)
      .write.parquet(root.resolve("data/empty1").toString)
    val v = SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("id"))
    val m = SnapshotStore.manifest(spark, root, v)
      .select("file", "n_rows").as[(String, Long)].collect().toMap
    assert(m.values.sum == 5, s"manifest rows: $m")
    assert(m.exists { case (f, n) => f.contains("empty1") && n == 0L },
      s"zero-row file missing from the manifest: $m")
    assert(SnapshotStore.countAt(spark, root) == 5)
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 5)
    // stats shape inheritance (ADVICE r11): the next commit passes no
    // statsCols yet the envelope columns must survive for skipping
    (6L to 8L).toDF("id").coalesce(1).write.parquet(root.resolve("data/load2").toString)
    val v2 = SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
    val cols = SnapshotStore.manifest(spark, root, v2).columns.toSet
    assert(cols.contains("min_id") && cols.contains("max_id"),
      s"inherited stats columns missing: $cols")
    assert(SnapshotStore.filesAtWhere(spark, root, v2,
      col("max_id") >= 7).forall(_.contains("load2")))
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("snapshot rollback keeps files still referenced by earlier live versions (ADVICE r11)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap-rbkeep")
    def load(name: String, ids: Seq[Long]): Unit =
      ids.toDF("id").coalesce(1).write.mode("overwrite")
        .parquet(root.resolve(s"data/$name").toString)
    load("orig", 1L to 10L)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
    val v1Files = SnapshotStore.filesAt(spark, root, 1L)
    // v2 REPLACES orig with a rewrite; v3 is a REVERT that re-lists
    // v1's files (the file-replacement + revert pattern); v4 adds more
    load("rewrite", 1L to 10L)
    val rewrite = SnapshotStore.dataFiles(root).filterNot(v1Files.toSet)
    SnapshotStore.commit(spark, root, rewrite)              // v2
    SnapshotStore.commit(spark, root, v1Files)              // v3 (revert)
    load("extra", 11L to 15L)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root).filter(f =>
      v1Files.contains(f) || f.contains("extra")))          // v4
    // roll v4 back to v3: `orig` is absent from nothing later… make the
    // hazard real — roll back to v2, whose manifest does NOT list orig,
    // while v1 (earlier, still live) and v3 (later, being deleted) do
    SnapshotStore.rollbackTo(spark, root, 2L)
    assert(SnapshotStore.headVersion(root).contains(2L))
    // v1 must still be fully readable: its files survived the rollback
    // because an EARLIER live version references them
    assert(SnapshotStore.readAt(spark, root, Some(1L), inferPartitions = false).count() == 10,
      "rollback deleted files an earlier live version still references")
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 10)
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("q26l COW merge: only envelope-intersecting files rewritten; untouched files byte-identical; both versions correct") {
    import graft.core.{SnapshotStore, Tables}
    import graft.operators.LayoutQueries
    val sf = "/root/testdata/sf0.001"
    val root = LayoutQueries.eventsMergeRoot(spark, sf)
    assert(SnapshotStore.headVersion(root).contains(2L), "build must leave HEAD at v2")
    val v1Files = SnapshotStore.filesAt(spark, root, 1L)
    val v2Files = SnapshotStore.filesAt(spark, root, 2L)
    // COW pruning engaged: SOME v1 files were rewritten, but strictly
    // fewer than the table holds — the change keys live in the first
    // ~2 deciles of a key-range-clustered table
    val dropped = v1Files.filterNot(v2Files.toSet)
    val carried = v1Files.filter(v2Files.toSet)
    assert(dropped.nonEmpty, "merge must rewrite the files its keys live in")
    assert(carried.nonEmpty && dropped.size < v1Files.size,
      s"COW must not rewrite the whole table: ${dropped.size} of ${v1Files.size} files touched")
    // carried files are the SAME paths — immutable, byte-identical by
    // construction (nothing ever rewrites a committed file in place);
    // pin the invariant via modification-free existence + manifest rows
    carried.foreach(f => assert(java.nio.file.Files.exists(root.resolve(f))))
    // correctness of both versions vs direct recomputation
    val flat = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val b = flat.agg(min(col("event_id")), max(col("event_id"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1)); val span = hi - lo
    val (cut1, cut2, cut3) = (lo + span / 10, lo + 2 * span / 10, lo + 3 * span / 10)
    val expectedMerged = flat
      .where(!(col("event_id") > cut1 && col("event_id") <= cut2))
      .withColumn("value", when(col("event_id") <= cut1, col("value") + 1000.0)
        .otherwise(col("value")))
      .unionByName(flat.where(col("event_id") > cut2 && col("event_id") <= cut3)
        .select((col("event_id") + 1000000000L).as("event_id"),
          (col("ts") + expr("INTERVAL 30 DAYS")).as("ts"),
          col("user_id"), lit("merged").as("event_type"),
          (col("value") * 2.0).as("value")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect().toSeq
    assert(canon(SnapshotStore.readAt(spark, root, Some(1L), inferPartitions = false)
        .select("event_id", "ts", "user_id", "event_type", "value")) == canon(flat),
      "pinned v1 must be the pre-merge table")
    assert(canon(SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select("event_id", "ts", "user_id", "event_type", "value")) == canon(expectedMerged),
      "HEAD must equal the update/delete/insert recomputation")
    // key uniqueness survived (no double insert / resurrected delete)
    val headKeys = SnapshotStore.readAt(spark, root, inferPartitions = false)
      .groupBy("event_id").count().where(col("count") > 1).count()
    assert(headKeys == 0, "merge produced duplicate keys")
  }

  test("q26o MOR deletes: delete commits rewrite NO data file; MOR read == folded read == recomputation") {
    import graft.core.{SnapshotStore, Tables}
    import graft.operators.LayoutQueries
    val sf = "/root/testdata/sf0.001"
    val root = LayoutQueries.eventsMorRoot(spark, sf)
    assert(SnapshotStore.headVersion(root).contains(4L))
    val v1 = SnapshotStore.filesAt(spark, root, 1L)
    val v2 = SnapshotStore.filesAt(spark, root, 2L)
    val v3 = SnapshotStore.filesAt(spark, root, 3L)
    val v4 = SnapshotStore.filesAt(spark, root, 4L)
    // the MOR contract: each delete commit CARRIES every prior file and
    // adds exactly one tiny delete file — no data rewrite on the delete
    // path (the O(|keys|) write cost claim, pinned structurally)
    assert(v2.filterNot(SnapshotStore.isDeleteFile) == v1,
      "delete commit must carry v1's data files untouched")
    assert(v2.count(SnapshotStore.isDeleteFile) == 1)
    assert(v3.filterNot(SnapshotStore.isDeleteFile) == v1)
    assert(v3.count(SnapshotStore.isDeleteFile) == 2, "delete files accumulate")
    // the fold: only fresh files, no delete files, clustered count
    assert(v4.count(SnapshotStore.isDeleteFile) == 0)
    val flat = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val b = flat.agg(min(col("event_id")), max(col("event_id"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1)); val span = hi - lo
    // the fold is ENVELOPE-SCOPED (round 13): v4 = fresh morfold files
    // plus EXACTLY the v1 data files whose key envelope is provably
    // disjoint from the deleted deciles — carried by reference, never
    // rewritten (at 100 TB the fold costs the touched region, not the
    // table); delete files gone either way
    val (cut3, cut5) = (lo + 3 * span / 10, lo + 5 * span / 10)
    val env = SnapshotStore.manifest(spark, root, 1L)
      .select("file", "min_event_id", "max_event_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expectCold = v1.filter { f =>
      val (mn, mx) = env(f); mx <= cut3 || mn > cut5
    }
    assert(v4.filter(v1.toSet) == expectCold,
      s"fold must carry exactly the envelope-disjoint files: " +
      s"carried ${v4.filter(v1.toSet).size}, expected ${expectCold.size}")
    assert(v4.filterNot(v1.toSet).nonEmpty &&
      v4.filterNot(v1.toSet).forall(_.contains("morfold")),
      "rewritten content must land in fresh morfold files")
    // three-way equality: MOR read at v3 == plain read at v4 == direct
    // recomputation from the corpus
    val expected = flat.where(
      !(col("event_id") > lo + 3 * span / 10 && col("event_id") <= lo + 5 * span / 10))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id").collect().toSeq
    val mor = canon(SnapshotStore.readAtMor(spark, root, Some(3L), "event_id"))
    assert(mor == canon(expected), "MOR read diverged from the recomputation")
    assert(canon(SnapshotStore.readAt(spark, root, Some(4L), inferPartitions = false)) == mor,
      "post-fold plain read diverged from the MOR read")
    // the fold re-tightened key envelopes: manifest skipping works on v4
    val hits = SnapshotStore.filesAtWhere(spark, root, 4L,
      col("max_event_id") >= lo && col("min_event_id") <= lo)
    assert(hits.size < v4.size, "folded files must carry prunable envelopes")
  }

  test("maintenance ops refuse under a live staging branch (the fork chain references mainline files)") {
    import graft.core.SnapshotStore
    import graft.operators.LayoutQueries
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap-branch-guard")
    (1L to 10L).toDF("id").coalesce(1).write.parquet(root.resolve("data/load1").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
    (11L to 12L).toDF("id").coalesce(1).write.parquet(root.resolve("data/load2").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v2
    LayoutQueries.commitBatchToBranch(spark, root, "staging",
      Seq(100L).toDF("id"), "guard") // branch forked at v2
    // rollback below the fork would delete files the branch serves;
    // vacuum could retire versions its chain still references
    intercept[IllegalArgumentException] {
      SnapshotStore.rollbackTo(spark, root, 1L)
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.vacuum(spark, root, retain = 1)
    }
    // after the branch retires, maintenance proceeds normally
    SnapshotStore.dropBranch(spark, root, "staging")
    SnapshotStore.rollbackTo(spark, root, 1L)
    assert(SnapshotStore.headVersion(root).contains(1L))
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 10)
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("q26q tags: a tag pins its version through vacuum (counterfactual: without it v1 dies); tags immutable; rollback refuses") {
    import graft.core.SnapshotStore
    import spark.implicits._
    def mkTable(): java.nio.file.Path = {
      val root = java.nio.file.Files.createTempDirectory("snap-tags")
      (1L to 10L).toDF("id").coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      (11L to 15L).toDF("id").coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v2
      (16L to 18L).toDF("id").coalesce(1).write.parquet(root.resolve("data/l3").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v3
      root
    }
    // counterfactual: without a tag, retain=1 expires v1 and v2
    val bare = mkTable()
    SnapshotStore.vacuum(spark, bare, retain = 1)
    assert(SnapshotStore.manifestVersions(bare) == Seq(3L))
    graft.core.IndexStore.deleteRecursively(bare)
    // with the tag: v1 survives the same sweep, fully readable; v2 dies
    val root = mkTable()
    SnapshotStore.tagVersion(root, "train_v1", 1L)
    SnapshotStore.vacuum(spark, root, retain = 1)
    assert(SnapshotStore.manifestVersions(root) == Seq(1L, 3L),
      "the tagged version must survive the retention sweep")
    assert(SnapshotStore.readAtTag(spark, root, "train_v1", inferPartitions = false).count() == 10)
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 18)
    // tags are immutable
    intercept[IllegalStateException] { SnapshotStore.tagVersion(root, "train_v1", 3L) }
    assert(SnapshotStore.tagVersionOf(root, "train_v1").contains(1L))
    // rollback below a pin pointing above the target is fine; rollback
    // that would destroy tagged history is refused... here the tag is
    // at v1, so rolling back to v1 is allowed and leaves the pin valid
    SnapshotStore.rollbackTo(spark, root, 1L)
    assert(SnapshotStore.readAtTag(spark, root, "train_v1", inferPartitions = false).count() == 10)
    // a tag ABOVE the rollback target blocks the rollback
    (19L to 20L).toDF("id").coalesce(1).write.parquet(root.resolve("data/l4").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
    val v2b = SnapshotStore.headVersion(root).get
    SnapshotStore.tagVersion(root, "pinned_high", v2b)
    intercept[IllegalArgumentException] { SnapshotStore.rollbackTo(spark, root, 1L) }
    // dropping the pin unblocks it
    SnapshotStore.dropTag(root, "pinned_high")
    SnapshotStore.rollbackTo(spark, root, 1L)
    assert(SnapshotStore.headVersion(root).contains(1L))
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("mergeCow orderCols: out-of-order epochs converge to the same per-key argmax as in-order") {
    import graft.core.SnapshotStore
    import spark.implicits._
    // two epochs of changes for the same keys, applied in BOTH orders
    // on twin tables — recency resolution must make the results equal
    def build(): java.nio.file.Path = {
      val root = java.nio.file.Files.createTempDirectory("merge-ooo")
      (1L to 6L).map(k => (k, s"base$k", 0L)).toDF("k", "payload", "ord")
        .coalesce(2).write.parquet(root.resolve("data/base").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k"))
      root
    }
    val older = Seq((1L, "older1", 10L), (2L, "older2", 10L), (7L, "olderIns", 10L))
      .toDF("k", "payload", "ord").withColumn("_delete", lit(false))
    val newer = Seq((1L, "newer1", 20L), (3L, "newer3", 20L), (7L, "newerIns", 20L))
      .toDF("k", "payload", "ord").withColumn("_delete", lit(false))
    def state(root: java.nio.file.Path) =
      SnapshotStore.readAt(spark, root, inferPartitions = false)
        .orderBy("k").collect().toSeq
    val a = build()
    SnapshotStore.mergeCow(spark, a, older, "k", orderCols = Seq("ord"))
    SnapshotStore.mergeCow(spark, a, newer, "k", orderCols = Seq("ord"))
    val b = build()
    SnapshotStore.mergeCow(spark, b, newer, "k", orderCols = Seq("ord"))
    SnapshotStore.mergeCow(spark, b, older, "k", orderCols = Seq("ord")) // LATE arrival
    assert(state(a) == state(b),
      "recency-resolved merges must be arrival-order independent")
    // and the converged state is the per-key argmax, not last-writer
    val byK = state(a).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byK(1L) == "newer1", "the higher-ord change must win regardless of arrival")
    assert(byK(2L) == "older2" && byK(3L) == "newer3" && byK(7L) == "newerIns")
    assert(byK(4L) == "base4", "untouched keys pass through")
    graft.core.IndexStore.deleteRecursively(a)
    graft.core.IndexStore.deleteRecursively(b)
  }

  test("changesBetween on a stats-less table: the no-envelope fallback still diffs correctly") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cdf-nostats")
    (1L to 5L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1, NO statsCols
    val changes = Seq((2L, "V2", false), (4L, "v4", true), (9L, "v9", false))
      .toDF("k", "p", "_delete")
    SnapshotStore.mergeCow(spark, root, changes, "k") // v2 (no orderCols)
    val feed = SnapshotStore.changesBetween(spark, root, 1L, 2L, "k")
      .orderBy("change_type", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(feed == Seq(
      ("delete", 4L, "v4"),
      ("insert", 9L, "v9"),
      ("update_postimage", 2L, "V2"),
      ("update_preimage", 2L, "v2")), s"unexpected feed: $feed")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("q26p change feed: a fold/compaction emits an EMPTY feed; a MOR delete feeds as deletes") {
    import graft.core.SnapshotStore
    import graft.operators.LayoutQueries
    val sf = "/root/testdata/sf0.001"
    val root = LayoutQueries.eventsMorRoot(spark, sf)
    // v3 → v4 is the fold: every file rewritten, logical content
    // unchanged — the derived feed must see through the rewrite
    assert(SnapshotStore.changesBetween(spark, root, 3L, 4L, "event_id").count() == 0,
      "a content-preserving fold must emit an empty change feed")
    // v1 → v2 is the first MOR delete batch: the feed is exactly those
    // keys as deletes (deletes live in a tiny delete file, the deleted
    // rows in CARRIED files — the changed-key restriction must still
    // find them)
    val feed = SnapshotStore.changesBetween(spark, root, 1L, 2L, "event_id")
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val delKeys = SnapshotStore.readFiles(spark, root,
        SnapshotStore.filesAt(spark, root, 2L).filter(SnapshotStore.isDeleteFile),
        inferPartitions = false).select("event_id").distinct().count()
    assert(feed == Map("delete" -> delKeys),
      s"expected exactly $delKeys deletes, got $feed")
  }

  test("q26m WAP: staged batches invisible to HEAD; reject prunes without a trace; publish is a pointer fast-forward") {
    import graft.core.{SnapshotStore, Tables}
    import graft.operators.LayoutQueries
    import spark.implicits._
    // drive the cycle by hand on a private table (the q26m build runs
    // the same code; here each intermediate state is asserted)
    val root = java.nio.file.Files.createTempDirectory("snap-wap-spec")
    (1L to 20L).map(i => (i, i * 1.5)).toDF("id", "value").coalesce(2)
      .write.parquet(root.resolve("data/load1").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1 = HEAD
    val v1Files = SnapshotStore.filesAt(spark, root, 1L)
    def headCount = SnapshotStore.readAt(spark, root, inferPartitions = false).count()
    assert(headCount == 20)
    // stage a poisoned batch on the branch
    val bad = Seq((100L, -5.0), (101L, -6.0)).toDF("id", "value")
    val badV = LayoutQueries.commitBatchToBranch(spark, root, "staging", bad, "bad")
    assert(badV == 2L)
    assert(SnapshotStore.headVersion(root).contains(1L),
      "a branch commit must not move HEAD")
    assert(headCount == 20, "HEAD readers must not see staged rows")
    assert(SnapshotStore.readAt(spark, root, Some(badV), inferPartitions = false).count() == 22,
      "the branch tip must serve base + staged batch")
    // audit fails (negative values) → drop: ref gone, manifest pruned,
    // staged files pruned, base untouched
    val auditBad = SnapshotStore.readAt(spark, root, Some(badV), inferPartitions = false)
      .where(col("value") < 0).count()
    assert(auditBad == 2)
    val pruned = SnapshotStore.dropBranch(spark, root, "staging")
    assert(pruned.nonEmpty && pruned.forall(_.contains("branch_bad")),
      s"drop must prune exactly the staged files, got $pruned")
    assert(SnapshotStore.refVersion(root, "staging").isEmpty)
    assert(SnapshotStore.manifestVersions(root) == Seq(1L),
      "the rejected manifest must be gone")
    assert(SnapshotStore.filesAt(spark, root, 1L) == v1Files && headCount == 20)
    // the version number is reusable after the prune: stage the good
    // batch, audit passes, publish fast-forwards HEAD atomically
    val good = Seq((200L, 7.0), (201L, 8.0), (202L, 9.0)).toDF("id", "value")
    val goodV = LayoutQueries.commitBatchToBranch(spark, root, "staging", good, "good")
    assert(goodV == 2L, "the pruned version number must be reclaimed by the next cycle")
    assert(SnapshotStore.headVersion(root).contains(1L) && headCount == 20)
    val published = SnapshotStore.publishBranch(spark, root, "staging")
    assert(published == goodV)
    assert(SnapshotStore.headVersion(root).contains(goodV))
    assert(SnapshotStore.refVersion(root, "staging").isEmpty, "publish retires the ref")
    assert(headCount == 23, "published HEAD = base + good batch")
    // time travel across the publish: v1 still serves the base exactly
    assert(SnapshotStore.readAt(spark, root, Some(1L), inferPartitions = false).count() == 20)
    // a second publish of a dead branch fails loudly; non-fast-forward
    // publishes are refused
    intercept[IllegalStateException] {
      SnapshotStore.publishBranch(spark, root, "staging")
    }
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("z-order strict mode: an event_type-ONLY in-place edit rebuilds the clustered copy (VERDICT r11 #2)") {
    import graft.operators.LayoutQueries
    // private copy of the sf0.001 events under its own path — the
    // z-order family is keyed by dataset dir, so this never perturbs
    // the standing index other tests share
    val dataDir = java.nio.file.Files.createTempDirectory("zorder-strict-data")
    val src = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tgt = dataDir.resolve("events.parquet")
    src.write.mode("overwrite").parquet(tgt.toString)
    def byType(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    LayoutQueries.eventsZOrderedRoot(spark, dataDir.toString)
    val built = LayoutQueries.zorderBuildCount.get()
    // the edit q26c/q26d actually group by: event_type flips on a slice
    // of rows; count, event_id range, user_id, ts, value all preserved
    val tmp = dataDir.resolve("events2.parquet").toString
    Tables.load(spark, dataDir.toString, "events")
      .withColumn("event_type",
        when(col("event_id") % 7 === 0, lit("edited_type"))
          .otherwise(col("event_type")))
      .write.mode("overwrite").parquet(tmp)
    tgt.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.deleteIfExists(tgt)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), tgt)
    // cheap fingerprint: the documented tradeoff — no rebuild
    LayoutQueries.clearZOrderMemo()
    LayoutQueries.eventsZOrderedRoot(spark, dataDir.toString)
    assert(LayoutQueries.zorderBuildCount.get() == built,
      "the (count, id-range) fingerprint cannot see an event_type-only edit — documented")
    // strict mode: the content hash covers event_type → rebuild, and the
    // clustered copy then answers the edited corpus, not the stale one
    sys.props("graft.index.strict") = "true"
    try {
      LayoutQueries.clearZOrderMemo()
      LayoutQueries.eventsZOrderedRoot(spark, dataDir.toString)
      assert(LayoutQueries.zorderBuildCount.get() == built + 1,
        "strict mode must rebuild the z-order copy on an event_type-only edit")
      assert(byType(LayoutQueries.eventsZOrdered(spark, dataDir.toString)) ==
             byType(Tables.load(spark, dataDir.toString, "events")),
        "rebuilt clustered copy must serve the edited per-type counts")
      // unchanged content under strict mode revalidates without rebuilding
      LayoutQueries.clearZOrderMemo()
      LayoutQueries.eventsZOrderedRoot(spark, dataDir.toString)
      assert(LayoutQueries.zorderBuildCount.get() == built + 1,
        "strict revalidation of unchanged content must reuse the index")
    } finally sys.props.remove("graft.index.strict")
    graft.core.IndexStore.deleteRecursively(
      graft.core.IndexStore.root("graft-layout-events-zorder", dataDir.toString))
  }

  test("mergeCow on un-folded MOR deletes: no resurrected null rows; upsert re-inserts a deleted key; delete set rewritten (ADVICE r12)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("merge-mor")
    (1L to 10L).map(k => (k, s"v$k")).toDF("k", "p")
      .repartitionByRange(2, col("k")).sortWithinPartitions("k")
      .write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("k")) // v1
    SnapshotStore.deleteMor(spark, root, Seq(3L, 4L, 8L).toDF("k"), "k") // v2
    // the merge: re-insert deleted 4, update 5, delete 6, insert 11
    val changes = Seq((4L, "V4", false), (5L, "V5", false),
      (6L, "v6", true), (11L, "v11", false)).toDF("k", "p", "_delete")
    val v3 = SnapshotStore.mergeCow(spark, root, changes, "k") // MOR-aware
    val got = SnapshotStore.readAtMor(spark, root, Some(v3), "k")
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = Seq(1L -> "v1", 2L -> "v2", 4L -> "V4", 5L -> "V5",
      7L -> "v7", 9L -> "v9", 10L -> "v10", 11L -> "v11")
    assert(got == expected, s"MOR merge state diverged: $got")
    // the advisor's failure mode: a delete-key file read as standing
    // data resurrects deleted keys as null-payload rows — there must be
    // NO null payload anywhere in the data files
    val dataRows = SnapshotStore.readFiles(spark, root,
      SnapshotStore.filesAt(spark, root, v3).filterNot(SnapshotStore.isDeleteFile),
      inferPartitions = false)
    assert(dataRows.where(col("p").isNull).count() == 0,
      "merge resurrected delete-marker rows as null-payload data")
    // delete set rewritten minus the change keys: 3 and 8 survive
    // (their rows live on in untouched/rewritten files minus the keys),
    // 4 does not (the merge decided its fate physically)
    val delKeys = SnapshotStore.readFiles(spark, root,
        SnapshotStore.filesAt(spark, root, v3).filter(SnapshotStore.isDeleteFile),
        inferPartitions = false)
      .select("k").as[Long].collect().toSeq.sorted
    assert(delKeys == Seq(3L, 8L), s"surviving delete keys wrong: $delKeys")
    // and the data files genuinely do not carry keys 3/8 as live rows
    // reachable after a fold: fold == MOR read, pinning consistency
    val v4 = SnapshotStore.foldMor(spark, root, "k", numFiles = 2, statsCols = Seq("k"))
    val folded = SnapshotStore.readAt(spark, root, Some(v4), inferPartitions = false)
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(folded == expected, "post-fold read diverged from the MOR merge state")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("CDC delta rung: out-of-order delta epochs converge to the COW merge; ties go to the change; fold preserves content (q26r)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    def mkBase(tag: String): java.nio.file.Path = {
      val r = java.nio.file.Files.createTempDirectory(s"cdc-delta-$tag")
      (1L to 10L).map(k => (k, s"v$k", 0L)).toDF("k", "p", "ord")
        .repartitionByRange(3, col("k")).sortWithinPartitions("k")
        .write.parquet(r.resolve("data/base").toString)
      SnapshotStore.commit(spark, r, SnapshotStore.dataFiles(r), statsCols = Seq("k"))
      r
    }
    // epoch A (newer order), epoch B (OLDER order, arrives later):
    // convergence must follow ord, with _seq only breaking exact ties
    val dNewer = Seq((1L, "newer1", 5L), (11L, "ins11", 5L)).toDF("k", "p", "ord")
    val dOlder = Seq((1L, "older1", 3L), (2L, "older2", 3L), (3L, "tie3", 0L))
      .toDF("k", "p", "ord")
    val mor = mkBase("mor")
    SnapshotStore.commitCdcDelta(spark, mor, dNewer, "k")
    SnapshotStore.commitCdcDelta(spark, mor, dOlder, "k")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "p", "ord").orderBy("k").collect().toSeq
    val morRead = canon(SnapshotStore.readAtCdc(spark, mor, None, "k", Seq("ord")))
    // the COW twin: same changes, same arrival order, same orderCols
    val cow = mkBase("cow")
    SnapshotStore.mergeCow(spark, cow, dNewer.withColumn("_delete", lit(false)),
      "k", orderCols = Seq("ord"))
    SnapshotStore.mergeCow(spark, cow, dOlder.withColumn("_delete", lit(false)),
      "k", orderCols = Seq("ord"))
    assert(morRead == canon(SnapshotStore.readAt(spark, cow, inferPartitions = false)),
      "MOR read must equal the COW merge on identical epochs")
    val byK = morRead.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byK(1L) == "newer1", "higher-ord change must win over a later lower-ord epoch")
    assert(byK(2L) == "older2" && byK(11L) == "ins11")
    assert(byK(3L) == "tie3", "an order TIE must go to the change (base enters at seq 0)")
    // write cost is the MOR class: both delta commits carried every
    // base file untouched and added exactly one tiny delta file
    val v3 = SnapshotStore.filesAt(spark, mor, 3L)
    assert(v3.count(SnapshotStore.isCdcDeltaFile) == 2, "deltas must accumulate")
    assert(v3.filterNot(SnapshotStore.isCdcDeltaFile) ==
           SnapshotStore.filesAt(spark, mor, 1L),
      "delta commits must never rewrite a data file")
    // the fold: content-preserving, deltas gone, plain read thereafter —
    // and ENVELOPE-SCOPED (r13): v1 files disjoint from every delta key
    // are carried untouched; only the hot region is rewritten
    val v4 = SnapshotStore.foldCdc(spark, mor, "k", Seq("ord"), numFiles = 2)
    val v4files = SnapshotStore.filesAt(spark, mor, v4)
    assert(v4files.count(SnapshotStore.isCdcDeltaFile) == 0)
    val deltaKeySet = Seq(1L, 2L, 3L, 11L)
    val expectedCold = SnapshotStore.manifest(spark, mor, 3L)
      .select("file", "min_k", "max_k").collect()
      .filter(r => !SnapshotStore.isCdcDeltaFile(r.getString(0)))
      .filterNot(r => deltaKeySet.exists(k => r.getLong(1) <= k && k <= r.getLong(2)))
      .map(_.getString(0)).toSet
    assert(expectedCold.nonEmpty, "fixture must have at least one delta-disjoint file")
    assert(v4files.filter(SnapshotStore.filesAt(spark, mor, 1L).toSet).toSet == expectedCold,
      "fold must carry exactly the delta-disjoint files untouched")
    assert(v4files.exists(_.contains("cdcfold")), "fold must rewrite the hot region fresh")
    assert(canon(SnapshotStore.readAt(spark, mor, inferPartitions = false)) == morRead,
      "post-fold plain read diverged from the CDC read")
    assert(canon(SnapshotStore.readAtCdc(spark, mor, None, "k", Seq("ord"))) == morRead,
      "readAtCdc on a folded table must degrade to the plain scan")
    graft.core.IndexStore.deleteRecursively(mor)
    graft.core.IndexStore.deleteRecursively(cow)
  }

  test("foldMor is envelope-scoped: delete-disjoint files are carried untouched; content preserved; no-op with nothing pending") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("morfold-scope")
    (1L to 300L).map(k => (k, s"v$k")).toDF("k", "p")
      .repartitionByRange(3, col("k")).sortWithinPartitions("k")
      .write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root), statsCols = Seq("k")) // v1
    // a fold with nothing pending must be a NO-OP, not a rewrite
    assert(SnapshotStore.foldMor(spark, root, "k", 3, Seq("k")) == 1L)
    assert(SnapshotStore.headVersion(root).contains(1L))
    // deletes hitting exactly one file's envelope
    SnapshotStore.deleteMor(spark, root, Seq(150L, 160L).toDF("k"), "k") // v2
    val v1files = SnapshotStore.filesAt(spark, root, 1L)
    val expectedCold = SnapshotStore.manifest(spark, root, 2L)
      .select("file", "min_k", "max_k").collect()
      .filter(r => !SnapshotStore.isDeleteFile(r.getString(0)))
      .filterNot(r => Seq(150L, 160L).exists(k => r.getLong(1) <= k && k <= r.getLong(2)))
      .map(_.getString(0)).toSet
    assert(expectedCold.size == 2, s"fixture must leave 2 files cold, got $expectedCold")
    val v3 = SnapshotStore.foldMor(spark, root, "k", 1, Seq("k"))
    val v3files = SnapshotStore.filesAt(spark, root, v3)
    assert(v3files.count(SnapshotStore.isDeleteFile) == 0)
    assert(v3files.filter(v1files.toSet).toSet == expectedCold,
      "fold must carry exactly the delete-disjoint files untouched")
    assert(v3files.exists(_.contains("morfold")), "fold must rewrite the hot file fresh")
    val got = SnapshotStore.readAt(spark, root, Some(v3), inferPartitions = false)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == (1L to 300L).filterNot(Set(150L, 160L)),
      "post-fold content must equal the MOR-resolved table")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("readAtCdc plan shape: cold files bypass the per-key argmax shuffle; a replayed delta epoch is content-idempotent") {
    import graft.core.SnapshotStore
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cdc-cold")
    (1L to 300L).map(k => (k, s"v$k", 0L)).toDF("k", "p", "ord")
      .repartitionByRange(3, col("k")).sortWithinPartitions("k")
      .write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root), statsCols = Seq("k")) // v1
    // a delta touching keys that land in exactly ONE base file's envelope
    SnapshotStore.commitCdcDelta(spark, root,
      Seq((150L, "V150", 1L), (160L, "V160", 1L)).toDF("k", "p", "ord"), "k") // v2
    val man = SnapshotStore.manifest(spark, root, 2L)
      .select("file", "min_k", "max_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hotFiles = man.filter { case (f, lo, hi) =>
      !SnapshotStore.isCdcDeltaFile(f) && lo <= 150L && 150L <= hi }.map(_._1)
    val coldFiles = man.map(_._1).filterNot(SnapshotStore.isCdcDeltaFile)
      .filterNot(hotFiles.toSet)
    assert(hotFiles.length == 1 && coldFiles.length == 2,
      s"fixture must split 1 hot / 2 cold, got hot=$hotFiles cold=$coldFiles")

    val df = SnapshotStore.readAtCdc(spark, root, None, "k", Seq("ord"))
    assert(df.where(col("k") === 150L).select("p").as[String].head() == "V150")
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    def scanBases(p: SparkPlan): Seq[String] = nodes(p).collect {
      case f: FileSourceScanExec => f.relation.location.inputFiles.toSeq
    }.flatten.map(u => u.substring(u.lastIndexOf("/data/") + 1))
    val plan = df.queryExecution.executedPlan
    // the per-key argmax subtrees (partial+final agg) must read ONLY the
    // hot file and the delta — the cold files' bytes never enter a
    // shuffle, which is the whole 100 TB story: delta-disjoint regions
    // of the table stream through at plain-scan cost
    val aggScanned = nodes(plan).collect { case a: BaseAggregateExec => a }
      .flatMap(scanBases).toSet
    val hotBase = hotFiles.toSet
    val coldBase = coldFiles.toSet
    assert(aggScanned.nonEmpty && aggScanned.exists(_.startsWith("data/_cdcdelta")),
      s"argmax subtree must read the delta, read: $aggScanned")
    assert(hotBase.subsetOf(aggScanned), s"hot file must enter the argmax: $aggScanned")
    assert(aggScanned.intersect(coldBase).isEmpty,
      s"COLD files leaked into the argmax shuffle: ${aggScanned.intersect(coldBase)}")
    // and the cold files ARE read (plain side of the union)
    assert(coldBase.subsetOf(scanBases(plan).toSet), "cold files must still be scanned")

    // replay idempotency: the crash-window case — an epoch whose commit
    // LANDED but whose checkpoint didn't re-delivers the same rows as a
    // fresh delta; the recency argmax (ties to the higher _seq of equal
    // content) must leave table content exactly unchanged
    val before = df.orderBy("k").collect().toSeq
    SnapshotStore.commitCdcDelta(spark, root,
      Seq((150L, "V150", 1L), (160L, "V160", 1L)).toDF("k", "p", "ord"), "k") // v3 = replay
    val after = SnapshotStore.readAtCdc(spark, root, None, "k", Seq("ord"))
      .orderBy("k").collect().toSeq
    assert(after == before, "a replayed delta epoch changed table content")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("tags: staging-branch versions above HEAD are not taggable; dropBranch leaves no dangling pins (ADVICE r12)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tag-branch")
    (1L to 5L).toDF("id").coalesce(1).write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1 (HEAD)
    (6L to 8L).toDF("id").coalesce(1).write.parquet(root.resolve("data/staged").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      ref = "staging") // v2, branch-only
    // v2's manifest exists but sits above HEAD — tagging it must refuse
    // (dropBranch would prune the chain and strand the pin)
    intercept[IllegalArgumentException] {
      SnapshotStore.tagVersion(root, "pin", 2L)
    }
    SnapshotStore.dropBranch(spark, root, "staging")
    assert(SnapshotStore.tags(root).isEmpty && SnapshotStore.manifestVersions(root) == Seq(1L))
    // dropBranch pruned the staged-only files; stage fresh ones
    (6L to 8L).toDF("id").coalesce(1).write.parquet(root.resolve("data/staged2").toString)
    // after publish the version IS mainline and taggable
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root), ref = "s2")
    SnapshotStore.publishBranch(spark, root, "s2")
    SnapshotStore.tagVersion(root, "pin", 2L)
    assert(SnapshotStore.readAtTag(spark, root, "pin", inferPartitions = false).count() == 8)
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("tag race: concurrent taggers of one name — exactly one wins and the pin holds the WINNER's version (ADVICE r12)") {
    import graft.core.SnapshotStore
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tag-race")
    (1L to 4L).toDF("id").coalesce(1).write.parquet(root.resolve("data/a").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
    (5L to 6L).toDF("id").coalesce(1).write.parquet(root.resolve("data/b").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v2
    // with the old FIXED tmp name, the loser's write could replace the
    // winner's bytes before its link landed — the pin then pointed at
    // the loser's version despite the EEXIST immutability guarantee
    for (round <- 1 to 20) {
      val name = s"t$round"
      val winners = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val ts = Seq(1L, 2L).map { v =>
        new Thread(() => {
          try { SnapshotStore.tagVersion(root, name, v); winners.add(v) }
          catch { case _: IllegalStateException => () }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val won = winners.asScala.toSeq
      assert(won.size == 1, s"round $round: expected exactly one winner, got $won")
      assert(SnapshotStore.tagVersionOf(root, name) == won.headOption,
        s"round $round: pin holds a different version than the winning tagger wrote")
    }
    graft.core.IndexStore.deleteRecursively(root)
  }
}
