package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch perf probe (not part of the driver contract): times the q20
  * shared replay in isolation with per-trigger progress so trigger-level
  * costs are observable. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Probe /root/testdata/sf0.1 10 2"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir  = args.headOption.getOrElse("/root/testdata/sf0.1")
    def fpt  = args.lift(1).map(_.toInt).getOrElse(10)
    def reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.build(master = s"local[$cpus]", shufflePartitions = cpus.toInt)

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] q=${p.id.toString.take(8)} batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${p.durationMs.get("triggerExecution")}ms addBatch=${p.durationMs.get("addBatch")}ms " +
          s"getBatch=${p.durationMs.get("getBatch")}ms walCommit=${p.durationMs.get("walCommit")}ms " +
          s"stateCommit=${Option(p.stateOperators).filter(_.nonEmpty).map(_.map(_.commitTimeMs).sum).getOrElse(0L)}ms")
      }
    })

    if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("q")) {
      // isolate named queries: 1 warmup + 3 timed noop-sink runs each.
      // Replay-backed queries (q16j/k/l/m, q20k, …) memoize their drained
      // sink per JVM; clear those caches before each timed run so the
      // measurement covers the replay itself (what Bench pays each pass),
      // not a parquet re-read of the memoized sink.
      val names = args.drop(1)
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val times = (0 until 3).map { _ =>
          graft.streaming.StreamingPipelines.clearCache()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $n times=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    } else if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("hybrid")) {
      // the q17i overlap-vs-depth curve (VERDICT r10 #1): fused-set
      // agreement with exact q17h per (fusionK, nprobeFrac) combo
      val exact = operators.SimilarityQueries.q17hHybridRrf(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      for (fk <- Seq(20, 30, 40); frac <- Seq(0.25, 0.5, 0.75, 1.0)) {
        val idx = operators.LayoutQueries.q17iHybridIndexed(spark, dir, fk, frac)
          .collect().map(r => (r.getLong(0), r.getLong(2)))
        val ov = idx.count(exact)
        println(f"[probe] hybrid fusionK=$fk nprobeFrac=$frac%.2f overlap=$ov/${idx.length}")
      }
    } else if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("recall")) {
      // the ANN recall stamps Bench computes, in isolation — for
      // checking a codebook/quantizer change against the committed
      // artifact without an 8-minute full bench run
      import operators.{LayoutQueries, SimilarityQueries}
      def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
        df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def vs(x: Set[(Long, Long)], e: Set[(Long, Long)]): Double =
        math.rint(1000.0 * (x & e).size / e.size) / 1000
      val exact = pairs(SimilarityQueries.q17CosineTopK(spark, dir), "probe_id", "neighbor_id")
      val hExact = pairs(SimilarityQueries.q17hHybridRrf(spark, dir), "probe_id", "doc_id")
      println(s"[probe] recall q17b=${vs(pairs(SimilarityQueries.q17bAnnTopK(spark, dir), "probe_id", "neighbor_id"), exact)}")
      println(s"[probe] recall q17c=${vs(pairs(SimilarityQueries.q17cIvfTopK(spark, dir), "probe_id", "neighbor_id"), exact)}")
      println(s"[probe] recall q17f=${vs(pairs(SimilarityQueries.q17fIvfInt8TopK(spark, dir), "probe_id", "neighbor_id"), exact)}")
      println(s"[probe] recall q17j=${vs(pairs(SimilarityQueries.q17jPqTopK(spark, dir), "probe_id", "neighbor_id"), exact)}")
      println(s"[probe] recall q17k=${vs(pairs(SimilarityQueries.q17kIvfPqTopK(spark, dir), "probe_id", "neighbor_id"), exact)}")
      println(s"[probe] recall q17m=${vs(pairs(SimilarityQueries.q17mBinaryHammingTopK(spark, dir), "probe_id", "neighbor_id"), exact)}")
      println(s"[probe] recall q17i=${vs(pairs(LayoutQueries.q17iHybridIndexed(spark, dir), "probe_id", "doc_id"), hExact)}")
    } else if (sys.env.get("SPARK_GRAFT_PROBE_MODE").contains("pt")) {
      val (state, durations) = graft.streaming.StreamingPipelines
        .processingTimeReplay(spark, dir, triggerMs = 500, filesPerTrigger = fpt)
      println(s"[probe] pt keys=${state.size} triggers=${durations.size} " +
        s"durationsMs=${durations.mkString(",")} max=${durations.max} " +
        s"mean=${durations.sum / durations.size}")
    } else {
      for (i <- 0 until reps) {
        val t0 = System.nanoTime()
        val s = graft.streaming.StreamingPipelines.replay(spark, dir, fpt)
        println(s"[probe] rep=$i fpt=$fpt replay=${(System.nanoTime() - t0) / 1e9}s " +
          s"running=${s.runningLog.size()} shards=${s.shardPartials.size}")
      }
    }
    spark.stop()
  }
}
