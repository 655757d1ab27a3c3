package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators._

/** Physical-plan shape guards: the properties that make these queries
  * scale are asserted, not assumed — a regression that silently turns a
  * pushed filter into a post-scan filter or a TakeOrdered into a global
  * sort fails here, not at 100 TB. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Execute once; return both the rows and the AQE-finalized plan. */
  private def executedRowsAndPlan(df: DataFrame): (Array[org.apache.spark.sql.Row], SparkPlan) = {
    val rows = df.collect() // force AQE to finalize
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (rows, plan)
  }
  private def finalPlan(df: DataFrame): SparkPlan = executedRowsAndPlan(df)._2
  private def planString(df: DataFrame): String = finalPlan(df).toString

  test("q1: filter and projection reach the parquet scan") {
    val p = planString(RelationalQueries.q1ScanFilter(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), p.take(500))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"),
      "scan must read exactly the 4 projected columns")
  }

  test("q10: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planString(RelationalQueries.q10TopCustomers(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q9: nation joins as broadcast") {
    val p = planString(RelationalQueries.q9JoinRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ below)
  }

  test("q8: no unpartitioned data-sized window (only the tiny offset table)") {
    val plan = finalPlan(WindowQueries.q8RunningCount(spark, dir))
    val windows = allNodes(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the data-sized window (local rank over ts, event_id) must be
    // partitioned; the only single-partition window allowed is the
    // numPartitions-row offsets cumsum, recognizable by ordering on pid
    // (its constant partition key is folded away by the optimizer)
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val ordersOnPidOnly = w.orderSpec.forall(_.child.references.forall(_.name == "pid"))
      assert(w.partitionSpec.nonEmpty || ordersOnPidOnly,
        s"data-sized WindowExec without partitioning: ${w.simpleString(200)}")
    }
  }

  test("q16b: no cartesian/nested-loop join anywhere in the LSH pipeline") {
    val p = planString(DedupQueries.q16bNearDup(spark, dir))
    assert(!p.contains("CartesianProduct"), "LSH must never plan a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidates must come from equi-joins on band keys")
  }

  test("q16j/q16k batch probe: the persisted band index is SCANNED, never re-signed") {
    import org.apache.spark.sql.functions._
    // the exact per-micro-batch plan the streaming ingest loops build:
    // an incoming chunk probing the standing corpus through the index
    val idx = DedupQueries.baseBandIndex(spark, dir)
    val batch = DedupQueries.wordShingleDocs(spark, dir)
      .where(col("doc_id") % DedupQueries.IngestSplitMod === DedupQueries.IngestSplitRem
          && pmod(col("doc_id"), lit(DedupQueries.IngestChunks)) === 0)
    val base = DedupQueries.wordShingleDocs(spark, dir)
      .where(col("doc_id") % DedupQueries.IngestSplitMod =!= DedupQueries.IngestSplitRem)
    val df = DedupQueries.nearDupPairsAcross(
      base = base, batch = batch,
      sigCol = call_function(graft.functions.MinHash.sigFnName, col("sh")),
      payloadCol = col("sh"),
      jacOf = DedupQueries.arrayJaccard, threshold = 0.8,
      baseIndex = Some(idx))
    val plan = finalPlan(df) // one execution serves both checks
    val scans = allNodes(plan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.rootPaths.mkString(",")
    }
    // both persisted tables (sigs + bands) appear as parquet scans …
    assert(scans.count(_.contains("graft-lsh")) >= 2,
      s"expected the persisted sig+band tables in the scan list: $scans")
    // … and the minhash signature expression is evaluated ONLY for the
    // incoming batch side: every sig computation in the plan sits above
    // a scan of documents filtered to the batch slice, so the number of
    // sig-computing projections must not exceed the probe references
    val sigExprProjections = allNodes(plan).count(
      _.expressions.exists(_.find(_.isInstanceOf[graft.functions.MinHashSig]).isDefined))
    assert(sigExprProjections <= 2, // probe sig for bands + screen reference
      s"base-side signatures must come from the index, found $sigExprProjections sig projections")
  }

  test("q16k growing probe: accumulated index is scanned batch_id-filtered, corpus never re-signed") {
    import org.apache.spark.sql.functions._
    // the exact per-micro-batch plan the GROWING text ingest builds for
    // epoch 1, with epoch 0's accept writes already on disk
    val grow = java.nio.file.Files.createTempDirectory("pin-grow")
    val sigDir  = grow.resolve("sigs").toString
    val bandDir = grow.resolve("bands").toString
    val idx = DedupQueries.baseBandIndex(spark, dir)
    val payload = DedupQueries.wordShingleDocs(spark, dir)
    def chunkOf(c: Int) = payload.where(
      col("doc_id") % DedupQueries.IngestSplitMod === DedupQueries.IngestSplitRem
        && pmod(col("doc_id"), lit(DedupQueries.IngestChunks)) === c)
    val sigs0 = chunkOf(0).select(col("doc_id"),
      call_function(graft.functions.MinHash.sigFnName, col("sh")).as("sig"))
    sigs0.write.mode("overwrite").parquet(s"$sigDir/batch_id=0")
    sigs0.select(col("doc_id"), explode(DedupQueries.bandKeys(col("sig"))).as("band"))
      .write.mode("overwrite").parquet(s"$bandDir/batch_id=0")
    val df = graft.streaming.StreamingPipelines.growingIngestProbe(
      spark, idx, payload, chunkOf(1), 1L, sigDir, bandDir)
    val plan = finalPlan(df)
    val p = plan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "growing-probe candidates must come from the band equi-join")
    // round 21: batch-side sigs (sig_i) broadcast — bounded by
    // admission control; the accumulated-index side (sig_j) must still
    // stream, never broadcast (it grows with the corpus)
    assert(!broadcastOutputs(plan).exists(_.startsWith("sig_j")),
      "standing-index signature columns must stream, not broadcast")
    val scans = allNodes(plan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        (f.relation.location.rootPaths.mkString(","), f.partitionFilters.mkString(","))
    }
    // persisted base tables AND the accumulated batch dirs are scanned…
    assert(scans.count(_._1.contains("graft-lsh")) >= 2,
      s"expected the persisted base sig+band tables in the scan list: $scans")
    val accScans = scans.filter(s => s._1.contains("pin-grow"))
    assert(accScans.size >= 2,
      s"expected the accumulated sig+band dirs in the scan list: $scans")
    // …with the strictly-earlier-epoch condition as a PARTITION filter
    // (directory pruning — a retried epoch's own dir is never even read)
    assert(accScans.forall(_._2.contains("batch_id")),
      s"accumulated scans must partition-filter on batch_id: $accScans")
    // and the corpus is never re-signed: sig expressions only for the
    // incoming batch (bands + screen reference)
    val sigExprProjections = allNodes(plan).count(
      _.expressions.exists(_.find(_.isInstanceOf[graft.functions.MinHashSig]).isDefined))
    assert(sigExprProjections <= 2,
      s"standing signatures must come from the index, found $sigExprProjections sig projections")
  }

  test("q16l/q16m embedding probes: persisted key index scanned, corpus never re-keyed, broadcasts batch-sided") {
    import org.apache.spark.sql.functions._
    val (bits, baseKeys) = SimilarityQueries.embKeyIndex(spark, dir)
    val base = graft.core.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val incoming = SimilarityQueries.plantedEmbeddings(spark, dir)
      .where(col("vec_id") >= 1000000L)
      .unionAll(SimilarityQueries.plantedEmbeddingsGen2(spark, dir))
    def chunkOf(c: Int) = incoming.where(pmod(col("vec_id"), lit(3)) === c)
    // q16m's epoch-1 probe with epoch 0 already accepted
    val grow = java.nio.file.Files.createTempDirectory("pin-embgrow")
    val keysDir = grow.resolve("keys").toString
    val vecsDir = grow.resolve("vecs").toString
    chunkOf(0).select(col("vec_id").as("id"),
        posexplode(call_function(graft.functions.HyperplaneLsh.wideFnName,
          col("v"), lit(bits))).as(Seq("table_id", "key")))
      .write.mode("overwrite").parquet(s"$keysDir/batch_id=0")
    chunkOf(0).select("vec_id", "v").write.mode("overwrite").parquet(s"$vecsDir/batch_id=0")
    // both loops' probes: q16l (fixed corpus) and q16m (growing)
    val probes = Seq(
      "q16l" -> SimilarityQueries.embeddingNearDupAcross(
        base, chunkOf(0), threshold = 0.9, bits = bits, baseKeys = baseKeys),
      "q16m" -> graft.streaming.StreamingPipelines.embGrowingProbe(
        spark, bits, baseKeys, base, chunkOf(1), 1L, keysDir, vecsDir))
    for ((name, df) <- probes) {
      val plan = finalPlan(df)
      val p = plan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name: candidates must come from the (table_id, key) equi-join")
      // every broadcast build side must be batch-sized (carries the
      // batch's new_id) — a corpus-side broadcast OOMs at scale
      val bcasts = allNodes(plan).collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b.output.map(_.name)
      }
      assert(bcasts.nonEmpty && bcasts.forall(_.contains("new_id")),
        s"$name: only batch-sided builds may broadcast, got $bcasts")
      val scans = allNodes(plan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.rootPaths.mkString(",")
      }
      assert(scans.exists(_.contains("graft-emblsh")),
        s"$name: the persisted key index must be scanned: $scans")
      // the standing corpus is never re-keyed: exactly one wide-key
      // projection (the incoming batch's)
      val keyProjections = allNodes(plan).count(
        _.expressions.exists(_.find(_.isInstanceOf[graft.functions.HyperplaneKeysWide]).isDefined))
      assert(keyProjections == 1,
        s"$name: standing keys must come from the index, found $keyProjections key projections")
    }
  }

  test("q16i: incremental near-dup — no cartesian, no base×base pairing, corpus sigs never broadcast") {
    val df = DedupQueries.q16iIncrementalNearDup(spark, dir)
    // one execution serves all three checks
    val (rows, plan) = executedRowsAndPlan(df)
    val p = plan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "incremental candidates must come from the asymmetric band equi-join")
    // round 21: the BATCH side (bands, candidates, sig_i, payload p_i)
    // broadcasts — bounded by admission control, the
    // embeddingNearDupAcross discipline — so the corpus-sized index
    // tables stream with zero exchanges. The CORPUS side's signatures
    // (sig_j) must still never broadcast: that is the side that OOMs
    // at billions of docs.
    assert(!broadcastOutputs(plan).exists(_.startsWith("sig_j")),
      "corpus signature columns must stream past the probe, not broadcast")
    // semantics: every result pairs an incoming doc with a base doc —
    // and there must BE results, else the pin is vacuous (sf0.001 has 9)
    assert(rows.nonEmpty, "the batch slice must near-duplicate the base corpus somewhere")
    rows.foreach { r =>
      assert(r.getLong(0) % DedupQueries.IngestSplitMod == DedupQueries.IngestSplitRem
          && r.getLong(1) % DedupQueries.IngestSplitMod != DedupQueries.IngestSplitRem,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) is not batch-vs-base")
    }
  }

  test("q9c: both sides aggregate BEFORE the full-outer join (rollup-join rule)") {
    val p = finalPlan(RelationalQueries.q9cFullOuterJoin(spark, dir))
    val nodes = allNodes(p)
    val join = nodes.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(join.isDefined, "q9c must plan a join")
    assert(join.get.joinType.toString == "FullOuter", s"got ${join.get.joinType}")
    // each join input subtree must contain an aggregate: the outer join
    // runs over one-row-per-key rollups, never raw fact rows
    join.get.children.foreach { side =>
      assert(allNodes(side).exists(_.isInstanceOf[
        org.apache.spark.sql.execution.aggregate.BaseAggregateExec]),
        "join input must be a pre-aggregated rollup")
    }
  }

  test("q24: gap-fill runs as ONE scan, in-plan generator, series-partitioned window") {
    val plan = finalPlan(WindowQueries.q24GapFill(spark, dir))
    val p = plan.toString
    assert(p.contains("Generate"), "the spine must come from an in-plan generator (sequence+explode)")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "run-expansion must not re-read events for a spine branch")
    val ws = allNodes(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      "the carry window must partition by the series id")
  }

  test("q17g: the filtered-search predicate reaches the candidate parquet scan") {
    val p = planString(SimilarityQueries.q17gFilteredTopK(spark, dir))
    assert(p.contains("EqualTo(label,3)"),
      s"label predicate must push into the candidate scan (pre-filter, not post-filter): ${p.take(400)}")
  }

  test("q23: profile computes all metrics from ONE scan of events") {
    val p = planString(RelationalQueries.q23Profile(spark, dir))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"profiling must not re-scan per column/metric: ${p.take(400)}")
  }

  private def broadcastOutputs(p: SparkPlan): Seq[String] =
    allNodes(p).collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        b.output.map(_.name)
    }.flatten

  test("q16b/q16d: the corpus-sized signature table is never broadcast") {
    // the screen's sig lookups must be shuffle joins — a broadcast of
    // the signature table ships ~1 KB × corpus to every executor and
    // OOMs at 100 TB (VERDICT r3 #1)
    for (df <- Seq(DedupQueries.q16bNearDup(spark, dir),
                   DedupQueries.q16dCharNgramNearDup(spark, dir))) {
      val names = broadcastOutputs(finalPlan(df))
      assert(!names.exists(n => n.startsWith("sig")),
        s"signature columns crossed a broadcast exchange: $names")
    }
  }

  test("q16b: declared via the SimilarityJoin operator, lowered by the injected rule") {
    val df = DedupQueries.q16bNearDup(spark, dir)
    val declared = df.queryExecution.analyzed.collect {
      case s: graft.plans.SimilarityJoin => s
    }
    assert(declared.nonEmpty, "analyzed plan must contain the SimilarityJoin node")
    assert(declared.head.mode == graft.plans.SimilarityJoin.WordMode)
    // the node must declare which child columns it consumes (doc id +
    // payload) so pruning/renaming rules see real references
    assert(declared.head.references.nonEmpty, "SimilarityJoin.references must not be empty")
    assert(declared.head.references.exists(_.name == "doc_id"))
    val lowered = df.queryExecution.optimizedPlan.collect {
      case s: graft.plans.SimilarityJoin => s
    }
    assert(lowered.isEmpty, "optimizer must lower SimilarityJoin to the band-join assembly")
    // lowering is semantics-preserving: same pairs as the direct assembly
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val raw = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
    val direct = DedupQueries.nearDupPairs(raw,
      sigCol = call_function(graft.functions.MinHash.sigFnName, shingles(col("toks"), 3)),
      payloadCol = shingles(col("toks"), 3),
      jacOf = DedupQueries.arrayJaccard,
      threshold = 0.8).collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == direct)
  }

  test("SimilarityJoin: a child missing the payload column fails at declaration") {
    import spark.implicits._
    val bad = Seq((1L, "some text")).toDF("doc_id", "wrong_name")
    val e = intercept[IllegalArgumentException] {
      graft.plans.SimilarityJoin.wordNearDup(bad, 0.8)
    }
    assert(e.getMessage.contains("toks"), e.getMessage)
  }

  test("q18j: eval shingles broadcast — the train corpus never shuffles its shingles") {
    val p = planString(TextQueries.q18jDecontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "the corpus-side shingle explode must stream past the broadcast eval set")
  }

  test("q18k: redaction is a pure map — no joins, one exchange (the oracle sort)") {
    val plan = finalPlan(TextQueries.q18kPiiRedact(spark, dir))
    val s = plan.toString
    assert(!s.contains("Join"), "PII redaction must not join")
    val exchanges = allNodes(plan).count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    assert(exchanges == 1, s"expected only the orderBy range exchange, got $exchanges")
  }

  test("q17e: quantized scoring keeps q17's broadcast-probe shape") {
    val p = planString(SimilarityQueries.q17eInt8TopK(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "probes must broadcast — the corpus side never shuffles for scoring")
    assert(!p.contains("SortMergeJoin"), p.take(400))
  }

  test("q18l: corpus mix is map + one partial-aggregated key shuffle") {
    val plan = finalPlan(TextQueries.q18lCorpusMix(spark, dir))
    val s = plan.toString
    assert(!s.contains("Join"), "the mix report must not join")
    // partial_count/partial_sum before the exchange = map-side combine
    assert(s.contains("partial_count") || s.contains("partial count"), s.take(600))
  }

  test("q18n: keyed prefix sums — every window is slice+partition-scoped, no slice funnel") {
    val plan = finalPlan(TextQueries.q18nTokenBudgetSample(spark, dir))
    val windows = allNodes(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    // the running sum must be partitioned by (source, lang, pid) — a
    // bare PARTITION BY (source, lang) would funnel each slice's corpus
    // share through one task
    windows.foreach { w =>
      assert(w.partitionSpec.exists(_.references.exists(_.name == "pid")),
        s"slice-funnel WindowExec: ${w.simpleString(200)}")
    }
  }

  test("q9b: semi and anti joins plan as such — no inner-join-plus-distinct") {
    val s = planString(RelationalQueries.q9bSemiAntiJoin(spark, dir))
    assert(s.contains("LeftSemi"), s.take(400))
    assert(s.contains("LeftAnti"), s.take(400))
  }

  test("q18m: corpus pre-aggregates to the doc-term frame before the vocab join") {
    val s = planString(TextQueries.q18mRarityScore(spark, dir))
    // partial aggregation of (doc_id, token) must sit below the join —
    // the shuffle carries distinct doc-terms, never raw token instances
    assert(s.contains("partial_count") || s.contains("partial count"), s.take(600))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      "vocab joins by token key only")
  }

  test("q16g: semantic dedup candidates come from the cluster equi-join, never all-pairs") {
    val s = planString(SimilarityQueries.q16gSemanticDedup(spark, dir))
    assert(!s.contains("CartesianProduct"), "no cartesian anywhere")
    // the pair-forming join must be an equi-join keyed on the cluster id
    // (the only nested-loop joins allowed are the k×dim centroid
    // broadcasts inside the assign step — corpus × centroid-matrix, the
    // designed fan-out, bounded by k ≈ √N rows on the build side)
    assert(s.contains("Join [cid") || s.contains("Join [coalesce(cid"),
      "within-cluster pairs must come from a cid-keyed equi-join:\n" + s.take(800))
  }

  test("q16p: the substring-dedup occurrence pipeline shuffles digests only — text never enters a digest exchange") {
    val plan = finalPlan(DedupQueries.q16pSubstringDedup(spark, dir))
    val shuffled = allNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }
    // the g-keyed exchanges (first-occurrence agg, occurrence join,
    // span positions) carry (doc_id, pos, g)-class columns only; the
    // ONE exchange allowed to carry the token array is the final
    // doc_id-keyed reassembly (and AQE may broadcast the tiny removed
    // side instead, dropping even that)
    val textBearing = shuffled.filter(cols =>
      cols.exists(c => c == "ts" || c == "text" || c.startsWith("kept")))
    assert(textBearing.size <= 1,
      s"more than the reassembly shuffle carries text/tokens: $shuffled")
    assert(shuffled.exists(cols => cols.exists(_.startsWith("g")) &&
      !cols.exists(c => c == "ts" || c == "text")),
      s"expected a digest-keyed exchange free of text: $shuffled")
  }

  test("q21: salted aggregation is two-phase (salt crosses the first shuffle)") {
    val plan = finalPlan(SkewOps.q21SkewAgg(spark, dir))
    val shuffled = allNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }
    assert(shuffled.exists(_.contains("__salt")),
      s"phase-1 shuffle must be keyed by (key, salt): $shuffled")
  }

  test("q21b: salted distinct is two-phase and the distinct never collapses to one reducer per key") {
    val plan = finalPlan(SkewOps.q21bSaltedDistinct(spark, dir))
    val shuffled = allNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }
    // the value-salt must cross the first shuffle: each (key, salt)
    // bucket dedups its own disjoint value slice before the per-key sum
    assert(shuffled.exists(_.contains("__salt")),
      s"phase-1 shuffle must be keyed by (key, salt): $shuffled")
  }

  test("q21c: the salted join shuffles on (key, salt) and never broadcasts the dim") {
    val plan = finalPlan(SkewOps.q21cSaltedJoin(spark, dir))
    val planStr = plan.toString
    assert(!planStr.contains("BroadcastHashJoin"),
      s"the salted join must stay on the shuffle path (broadcast is the plan this op replaces):\n$planStr")
    val shuffled = allNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }
    // the hot key's fact stream must spread over salt buckets: the join
    // input shuffles carry the salt column
    assert(shuffled.exists(_.contains("__salt")),
      s"join-side shuffles must be keyed by (key, salt): $shuffled")
    assert(planStr.contains("ShuffledHashJoin"),
      s"replicated-dim build must be a per-task hash build:\n$planStr")
  }

  test("q16e: adaptive LSH key width — no cartesian, no cache residency, wide keys") {
    val df = SimilarityQueries.q16eEmbeddingNearDup(spark, dir)
    val plan = finalPlan(df)
    val str = plan.toString
    // r5 persisted the input frame and the cache residency regressed the
    // whole bench under memory pressure; with constant-size buckets
    // (bits ~ log2 N) the recomputed scans are cheaper than cache
    // management — the plan must NOT pin executor storage memory
    assert(!str.contains("InMemoryTableScan"),
      "q16e must not hold cached blocks across queries (r5 regression)")
    assert(!str.contains("CartesianProduct") && !str.contains("BroadcastNestedLoopJoin"),
      "candidates must come from equi-joins on (table_id, key)")
    // the key expression must be the corpus-sized (wide) variant, not
    // the 6-bit ANN tables (N/64-per-bucket ⇒ O(N²/64) candidate pairs)
    assert(str.contains("hyperplane_keys_wide"),
      s"q16e must bucket with adaptive-width keys: ${str.take(400)}")
  }

  test("q16: exact dedup shuffles a digest key, never the document text") {
    val plan = finalPlan(DedupQueries.q16ExactDedup(spark, dir))
    val shuffled = allNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }.flatten
    assert(!shuffled.contains("text"),
      s"full text crossed a shuffle — group on the digest instead: $shuffled")
    assert(plan.toString.contains("xxhash64"), "digest key must be in the grouping")
  }

  test("q16h: keep-best dedup also shuffles digests only, argmax rides the aggregate") {
    val plan = finalPlan(DedupQueries.q16hKeepBest(spark, dir))
    val shuffled = allNodes(plan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }.flatten
    assert(!shuffled.contains("text"),
      s"normalized text crossed a shuffle — group on the digest instead: $shuffled")
    // the keep-best selection must be a max(struct) partial aggregate,
    // not a window function (a window would need a second sort pass)
    assert(allNodes(plan).collectFirst {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "keep-best must not plan a window function")
  }

  test("q12b: cube expands grouping sets from ONE scan of orders") {
    val p = planString(RelationalQueries.q12bCube(spark, dir))
    assert(p.contains("Expand"), "cube must plan through the Expand operator")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"cube must not re-scan orders per grouping set: ${p.take(400)}")
  }

  test("q12c: explicit grouping sets expand from ONE scan of orders") {
    val p = planString(RelationalQueries.q12cGroupingSets(spark, dir))
    assert(p.contains("Expand"), "grouping sets must plan through the Expand operator")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"grouping sets must not re-scan orders per set: ${p.take(400)}")
  }

  test("q14c: unpivot is one Expand over one scan — never a union of re-scans") {
    val p = planString(RelationalQueries.q14cUnpivot(spark, dir))
    assert(p.contains("Expand"), "unpivot must plan through the Expand operator")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"unpivot must scan lineitem exactly once: ${p.take(400)}")
    assert(p.contains("GreaterThan(l_quantity,48.0)"),
      "the pre-reshape filter must still push into the scan")
  }

  test("q8b: every sessionize window is user-partitioned — no global-order funnel") {
    // AQE hides materialized stages behind QueryStageExec; recurse into them
    val ws = allNodes(finalPlan(WindowQueries.q8bSessionize(spark, dir))).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(ws.nonEmpty, "sessionize must plan window functions")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "every window must partition by user_id (a global window pulls the table into one task)")
  }

  test("q17j: the ADC stage reads 8-byte codes only; LUT broadcasts are probe-bounded") {
    val (_, plan) = executedRowsAndPlan(SimilarityQueries.q17jPqTopK(spark, dir))
    val scans = allNodes(plan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // the scan feeding ADC is the persisted code table — and it reads
    // (id, codes) ONLY: no f64 vector column crosses that stage (the
    // 64× bandwidth claim, asserted on the plan)
    val codeScans = scans.filter(_.metadata.getOrElse("Location", "").contains("graft-pq"))
    assert(codeScans.nonEmpty, "q17j must scan the persisted PQ code table")
    assert(codeScans.forall { s =>
      val schema = s.schema.fieldNames.toSet
      schema.contains("codes") && !schema.contains("embedding") && !schema.contains("v")
    }, s"ADC scan must read codes only: ${codeScans.map(_.schema.fieldNames.mkString(","))}")
    // the only nested-loop join is the deliberate probe-LUT cross (10
    // broadcast rows); its broadcast side must be the local LUT
    // relation, never a corpus-derived frame
    val bnlj = allNodes(plan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.size == 1, s"expected exactly the LUT cross join, got ${bnlj.size}")
    val buildSide = (bnlj.head.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bnlj.head.left
      case _ => bnlj.head.right
    }).toString
    assert(buildSide.contains("LocalTableScan") || buildSide.contains("lut"),
      s"LUT cross join must broadcast the bounded local LUT frame:\n$buildSide")
  }

  test("q14b: explicit pivot values — single scan, single aggregate pass, no discovery job") {
    val df = RelationalQueries.q14bPivot(spark, dir)
    // plan shape is checkable BEFORE execution: value discovery would
    // have to run a collect during analysis, which would show up as a
    // second scan in the analyzed plan
    val p = planString(df)
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"pivot with declared values must scan orders exactly once: ${p.take(400)}")
  }

  test("q23c: one scan per predicate-expectation table; the FK anti-join reads key columns only") {
    val p = planString(RelationalQueries.q23cExpectations(spark, dir))
    // events carries 3 expectations, lineitem 2 — each table's
    // predicate expectations must FUSE into one scan (events appears
    // once; lineitem appears for the fused row AND the FK probe AND the
    // checked-count — 3 scans total for 3 distinct jobs, never 1 per
    // expectation)
    assert("Scan parquet .*events".r.findAllIn(p).size == 1,
      s"events' three expectations must fuse into one scan:\n${p.take(600)}")
    assert("Scan parquet .*documents".r.findAllIn(p).size == 1)
    // the referential-integrity join must read ONLY the key columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      "FK probe must prune lineitem to the key column")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"),
      "FK build must prune orders to the key column")
  }

  test("q27: funnel stages share the user_id shuffle key — no cartesian, no global sort") {
    val p = planString(graft.operators.WindowQueries.q27Funnel(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "stage joins must stay keyed")
    // every exchange in the funnel hashes on user_id (stage aggs + joins)
    val exchanges = "hashpartitioning\\(([a-z_#0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("user_id")),
      s"all funnel shuffles must key on user_id, got: $exchanges")
  }

  test("q26g: the scan reads exactly the manifest-selected files of pinned v1") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.core.SnapshotStore
    import graft.operators.LayoutQueries
    val root = LayoutQueries.eventsSnapRoot(spark, dir)
    val df = LayoutQueries.q26gSnapshotSkipScan(spark, dir)
    val (_, plan) = executedRowsAndPlan(df)
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(nodes) ++ below)
    }
    val dataScan = nodes(plan).collect {
      case f: FileSourceScanExec => f
    }.find(_.relation.location.inputFiles.exists(_.contains(root.getFileName.toString)))
      .getOrElse(fail("no pruned data scan in the q26g plan"))
    val expected = SnapshotStore.filesAtWhere(spark, root, 1L,
      org.apache.spark.sql.functions.col("file")
        .startsWith("data/event_type=purchase/") &&
      org.apache.spark.sql.functions.col("max_ts") >=
        org.apache.spark.sql.functions.lit("2024-01-12").cast("timestamp") &&
      org.apache.spark.sql.functions.col("min_ts") <
        org.apache.spark.sql.functions.lit("2024-01-25").cast("timestamp")).size
    assert(dataScan.selectedPartitions.totalNumberOfFiles == expected,
      s"q26g must read exactly the $expected manifest-selected files")
  }

  test("q26o: the MOR read plans the delete keys as a broadcast LEFT ANTI join, and reads only data files") {
    import graft.core.SnapshotStore
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val root = LayoutQueries.eventsMorRoot(spark, dir)
    val (_, plan) = executedRowsAndPlan(
      SnapshotStore.readAtMor(spark, root, Some(3L), "event_id"))
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => all(q.plan)
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(all) ++ below)
    }
    val anti = all(plan).collectFirst {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty,
      "the delete-key application must be a broadcast LEFT ANTI hash join, " +
      s"got:\n${plan.toString.take(600)}")
    // the probe side reads only data files — delete keys never ride the
    // big scan
    val scans = all(plan).collect { case f: FileSourceScanExec => f }
    val dataScan = scans.maxBy(_.selectedPartitions.totalNumberOfFiles)
    val v3Data = SnapshotStore.filesAt(spark, root, 3L)
      .filterNot(SnapshotStore.isDeleteFile).size
    assert(dataScan.selectedPartitions.totalNumberOfFiles == v3Data,
      "the MOR probe scan must read exactly the version's data files")
  }

  test("q26n: the merge resolution is a partial-aggregable argmax (map-side combine before the key shuffle)") {
    // the mergeCow pool aggregate: max_by over (orderCols, _src) must
    // plan as a two-phase aggregate — partial (before the exchange) +
    // final — so hot keys collapse map-side; a plan that shuffled raw
    // pool rows to a single-phase aggregate would ship every standing
    // row per epoch
    import spark.implicits._
    val table = (1L to 1000L).map(i => (i, s"t$i", i * 1.0)).toDF("k", "payload", "ord")
    val changes = (500L to 1500L).map(i => (i, s"c$i", i * 2.0)).toDF("k", "payload", "ord")
    import org.apache.spark.sql.functions._
    val pool = table.withColumn("_src", lit(0))
      .unionByName(changes.withColumn("_src", lit(1)))
    val merged = pool.groupBy(col("k"))
      .agg(max_by(struct(col("payload")), struct(col("ord"), col("_src"))).as("w"))
    val (_, plan) = executedRowsAndPlan(merged)
    val s = plan.toString
    val aggs = "(?i)(SortAggregate|ObjectHashAggregate|HashAggregate)".r
      .findAllIn(s).length
    assert(aggs >= 2, s"expected a partial+final aggregate pair, got:\n${s.take(600)}")
    assert(s.contains("partial_max_by") || s.contains("partial_maxby") ||
           "(?i)functions=\\[partial".r.findFirstIn(s).nonEmpty,
      s"expected a PARTIAL aggregation phase before the exchange:\n${s.take(600)}")
  }

  test("q28h: the DV read is a broadcast LEFT ANTI positional join; data filters still push to parquet under the metadata tag") {
    import graft.core.SnapshotStore
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.functions.col
    val root = LayoutQueries.eventsDvRoot(spark, dir)
    val df = SnapshotStore.readAtDv(spark, root, Some(3L))
      .where(col("event_type") === "view")
    val (_, plan) = executedRowsAndPlan(df)
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => all(q.plan)
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(all) ++ below)
    }
    val anti = all(plan).collectFirst {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty,
      "DV application must be a broadcast LEFT ANTI hash join on " +
      s"(file, position), got:\n${plan.toString.take(600)}")
    // the positional tag costs no pushdown: the user predicate still
    // reaches the parquet scan under the _metadata projection
    val scans = all(plan).collect { case f: FileSourceScanExec => f }
    val dataScan = scans.maxBy(_.selectedPartitions.totalNumberOfFiles)
    assert(dataScan.metadata.getOrElse("PushedFilters", "")
      .contains("EqualTo(event_type,view)"),
      s"user filter lost from the DV base scan: ${dataScan.metadata.get("PushedFilters")}")
    // the probe side reads only data files — the vectors never ride
    // the big scan
    val v3Data = SnapshotStore.filesAt(spark, root, 3L)
      .filterNot(SnapshotStore.isDvFile).size
    assert(dataScan.selectedPartitions.totalNumberOfFiles == v3Data,
      "the DV base scan must read exactly the version's data files")
  }
}
