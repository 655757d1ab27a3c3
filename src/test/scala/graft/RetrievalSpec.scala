package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{RelationalQueries, SimilarityQueries, TextQueries}

/** Retrieval surface (round 9): BM25 lexical search (q18o), hybrid
  * reciprocal-rank fusion (q17h), and the count-min heavy-hitter
  * sketch (q15f) — behavioral contracts plus the plan shapes the
  * 100 TB posture depends on. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ below)
  }

  // ---- BM25 (q18o) ---------------------------------------------------

  test("bm25: a rare discriminative term outranks ubiquitous-term matches") {
    import spark.implicits._
    // "needle" appears in one doc; "filler" in all 40. With idf doing
    // its job the needle doc must rank first for the two-term query
    // even though its filler tf is the same as everyone else's.
    val docs = ((1 to 39).map(i => (i.toLong, "filler words filler again filler")) :+
      (40L, "filler words needle appears here")).toDF("doc_id", "text")
    val top = TextQueries.bm25Search(docs, Seq("q" -> Seq("needle", "filler")), 5)
      .select("rk", "doc_id", "n_hit").as[(Long, Long, Long)].collect()
    assert(top.head == ((1L, 40L, 2L)), top.toSeq.toString)
  }

  test("bm25: length normalization — same tf prefers the shorter document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "term alpha beta"),
      (2L, "term alpha beta gamma delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val r = TextQueries.bm25Search(docs, Seq("q" -> Seq("term")), 2)
      .select("rk", "doc_id").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L), (2L, 2L)), r.toString)
  }

  test("bm25 postings: linear run-length tf ≡ the explode/groupBy count oracle") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    // real corpus docs + edge shapes: empty text, single token, all-equal
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
      .unionAll(Seq((900001L, ""), (900002L, "solo"),
        (900003L, "rep rep rep rep")).toDF("doc_id", "text"))
    val got = TextQueries.bm25Postings(docs, None)
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet
    val oracle = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"),
        explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .select("doc_id", "token", "tf", "dl")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == oracle,
      s"diff: ${(got diff oracle).take(5)} / ${(oracle diff got).take(5)}")
    assert(got.exists(_._3 > 1), "fixture has no repeated token — tf untested")
  }

  test("bm25 plan: every join side broadcasts — no sort-merge join, bounded shuffles") {
    val plan = finalPlan(TextQueries.q18oBm25Search(spark, dir))
    val nodes = allNodes(plan)
    assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      "query/df/stats sides must broadcast, never shuffle the postings for a join")
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    // final (query, doc) combine + ranking window + output sort, plus
    // the two partial-aggregated side reductions (per-term df over the
    // already-filtered postings; the one-row corpus stats) — nothing
    // data-sized moves unaggregated
    assert(shuffles <= 5, s"expected <= 5 shuffles, got $shuffles\n$plan")
  }

  // ---- hybrid RRF (q17h) ---------------------------------------------

  test("rrf: fused scores are exactly the two-addend reciprocal-rank sum") {
    import spark.implicits._
    val rows = SimilarityQueries.q17hHybridRrf(spark, dir)
      .select("probe_id", "rk", "vec_rank", "lex_rank", "rrf")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, vr, lr, rrf) =>
      val expect = (if (vr > 0) 1.0 / (60 + vr) else 0.0) +
        (if (lr > 0) 1.0 / (60 + lr) else 0.0)
      assert(math.abs(BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble - rrf) < 1e-9, s"vr=$vr lr=$lr rrf=$rrf")
      assert(vr >= 0 && vr <= 20 && lr >= 0 && lr <= 20 && (vr > 0 || lr > 0))
    }
    // 10 fused results per probe, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 10L), s"probe $p")
    }
  }

  test("rrf: both rankers are load-bearing in the fused top-10") {
    import spark.implicits._
    val rows = SimilarityQueries.q17hHybridRrf(spark, dir)
      .select("vec_rank", "lex_rank").as[(Long, Long)].collect()
    // fusion must surface candidates each ranker found alone AND
    // consensus candidates — otherwise it degenerates to one ranker
    assert(rows.exists { case (v, l) => v > 0 && l == 0 }, "no vector-only rows")
    assert(rows.exists { case (v, l) => v == 0 && l > 0 }, "no lexical-only rows")
    assert(rows.exists { case (v, l) => v > 0 && l > 0 }, "no consensus rows")
  }

  // ---- CMS heavy hitters (q15f) --------------------------------------

  test("q18p posting layout: partition-pruned scan, answer identical to q18o") {
    val q18o = TextQueries.q18oBm25Search(spark, dir).collect().toSeq
    val q18p = graft.operators.LayoutQueries.q18pBm25Indexed(spark, dir)
    val rows = q18p.collect().toSeq
    // identical answer — the layout buys I/O, never semantics
    assert(rows == q18o, "posting-layout BM25 diverged from the corpus-derived q18o")
    // the posting scan must prune to the query terms' bucket partitions
    val scans = allNodes(finalPlan(q18p)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.endsWith("/postings")) => f
    }
    assert(scans.nonEmpty, "no FileSourceScan over the posting layout found")
    scans.foreach { f =>
      val pf = f.partitionFilters.mkString(",")
      assert(pf.contains("bucket"),
        s"posting scan carries no bucket partition filter: $pf")
      // pruning engaged: strictly fewer partition dirs selected than exist
      val selected = f.selectedPartitions.partitionCount
      assert(selected < graft.operators.LayoutQueries.PostingBuckets &&
        selected > 0,
        s"expected a pruned bucket scan, got $selected dirs selected")
    }
  }

  test("q18q posting ingest: streamed appendices compose to exactly the full-corpus answer, and compact") {
    import scala.jdk.CollectionConverters._
    val q18o = TextQueries.q18oBm25Search(spark, dir).collect().toSeq
    val got = graft.streaming.StreamingPipelines.q18qBm25StreamIngest(spark, dir).collect().toSeq
    assert(got == q18o,
      "base layout ∪ streamed posting batches diverged from the full-corpus BM25 answer")
    // the replay's post-drain quiesced slot already compacted both
    // appendices; the fold target is the HIGHEST accepted batch id, so
    // a single surviving `batch_id=2` dir proves both that THREE accept
    // epochs ran and that the compaction folded them
    val root = graft.operators.LayoutQueries.basePostingsRoot(spark, dir)
    def dirsIn(name: String) = java.nio.file.Files.list(root.resolve(name))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("batch_id=")).toSeq
    assert(dirsIn("postings_inc") == Seq("batch_id=2"),
      s"post-drain compaction should leave one highest-id dir, got ${dirsIn("postings_inc")}")
    assert(dirsIn("stats_inc") == Seq("batch_id=2"))
    // the three per-epoch stats partials survive the fold individually
    // (distinct-compaction keyed by src_batch — two identical (n,
    // sum_dl) partials must stay two rows or avgdl composes wrong)
    assert(spark.read.parquet(root.resolve("stats_inc").toString).count() == 3,
      "per-epoch stats partials lost in the fold")
    val composed = graft.operators.LayoutQueries.q18qAfterIngest(spark, dir)
    val afterCompact = composed.collect().toSeq
    assert(afterCompact == q18o, "compaction changed the composed answer")
    // the bucket filter must push THROUGH the union into the base
    // layout's scan: the composed read still partition-prunes the base
    val baseScans = allNodes(finalPlan(composed)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.endsWith("/postings")) => f
    }
    assert(baseScans.nonEmpty, "no base posting scan in the composed plan")
    baseScans.foreach { f =>
      assert(f.partitionFilters.mkString(",").contains("bucket"),
        "composed read lost the base layout's bucket partition filter")
    }
  }

  test("q17i indexed hybrid: fuses the sublinear rankers, substantial overlap with exact q17h") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(2))
    val exact = SimilarityQueries.q17hHybridRrf(spark, dir).collect().map(key).toSet
    val idx = graft.operators.LayoutQueries.q17iHybridIndexed(spark, dir).collect()
    assert(idx.length == 100, s"10 probes x top-10 expected, got ${idx.length}")
    // both rankers must be load-bearing in the fused list
    val vecOnly = idx.count(r => r.getLong(3) > 0 && r.getLong(4) == 0)
    val lexOnly = idx.count(r => r.getLong(3) == 0 && r.getLong(4) > 0)
    assert(vecOnly > 0, "no vector-only candidate survived fusion")
    assert(lexOnly > 0, "no lexical-only candidate survived fusion")
    // the sublinear pair (IVF + layout-served Jaccard) must agree with
    // the exact pair (brute cosine + brute Jaccard) on the fused
    // (probe, doc) set. Same ranker SEMANTICS on both sides now (round
    // 11): the only approximation left is IVF probing k/2 lists, and
    // the measured curve (Probe mode `hybrid`) is 98/100 at sf0.001,
    // 97/100 at sf0.01, 100/100 with nprobe=k — so 85 is a floor with
    // real margin, not the r10 sat-at-the-floor 40
    val overlap = idx.map(key).count(exact)
    assert(overlap >= 85,
      s"fused overlap with exact q17h too low: $overlap/100")
  }

  test("cms heavy hitters: superset of true heavy hitters, estimates never undercount") {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    val n = events.count()
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    val out = RelationalQueries.q15fCmsHeavyHitters(spark, dir)
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    // CMS can only overcount: est >= exact for every reported key
    out.foreach { case (u, est) =>
      assert(est >= exact(u), s"user $u est $est < exact ${exact(u)}")
    }
    // and every TRUE heavy hitter (count*128 >= n) is reported
    val reported = out.map(_._1).toSet
    exact.foreach { case (u, c) =>
      if (c * 128 >= n) assert(reported.contains(u), s"missed true heavy hitter $u")
    }
  }

  test("cms sketch: bounded summary — at most d*w cells regardless of key cardinality") {
    import spark.implicits._
    // 50k distinct keys fold into <= 4*256 cells; estimates stay
    // overcounts under heavy collision load (the bounded-memory claim)
    val wide = (1L to 50000L).toDF("user_id")
    val cellCount = wide
      .select(explode(array(RelationalQueries.cmsHashes.map { case (r, a, b) =>
        struct(lit(r).as("r"),
          pmod(pmod(col("user_id") * lit(a) + lit(b), lit(RelationalQueries.cmsP)),
            lit(RelationalQueries.cmsWidth)).as("cell"))
      }: _*)).as("h"))
      .groupBy(col("h.r"), col("h.cell")).agg(count(lit(1)).as("c"))
      .count()
    assert(cellCount <= 4 * 256, s"sketch grew past d*w: $cellCount")
  }
}
