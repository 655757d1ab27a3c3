package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The snapshot seam's commit machinery under contention and at scale
  * posture (VERDICT r12 #1/#3): O(delta) driver transfer, Iceberg-style
  * append rebase, and conflict refusal. Lives in `graft.core` to reach
  * the package-private deterministic race seam
  * ([[SnapshotStore.commitAttemptHook]]). */
class SnapshotCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def resetHook(): Unit =
    SnapshotStore.commitAttemptHook = (_, _) => ()

  test("CAS retry: two non-conflicting appends from one base BOTH land (VERDICT r12 #3)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cas-rebase")
    (1L to 6L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/base").toString)
    val baseFiles = SnapshotStore.dataFiles(root)
    SnapshotStore.commit(spark, root, baseFiles, statsCols = Seq("k")) // v1
    // stage both appends' files up front
    (7L to 8L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/loadX").toString)
    (9L to 10L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/loadY").toString)
    val all = SnapshotStore.dataFiles(root)
    val x = all.filter(_.contains("loadX"))
    val y = all.filter(_.contains("loadY"))
    // the deterministic interleave: the OUTER commit (base+X) resolves
    // its base at v1; before its first CAS attempt a COMPETING append
    // (base+Y) lands as v2; the outer loses the CAS, detects a pure
    // append, rebases onto v2, and lands as v3 = base ∪ Y ∪ X
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.commitAttemptHook = (r, _) =>
      if (r == root && fired.compareAndSet(false, true))
        SnapshotStore.commit(spark, root, baseFiles ++ y)
    try {
      val v = SnapshotStore.commit(spark, root, baseFiles ++ x)
      assert(v == 3L, s"rebased append must land as v3, got v$v")
    } finally resetHook()
    assert(fired.get, "the competing commit never fired — seam broken")
    assert(SnapshotStore.headVersion(root).contains(3L))
    assert(SnapshotStore.filesAt(spark, root, 3L).toSet == (baseFiles ++ x ++ y).toSet,
      "the rebased manifest must hold BOTH appends plus the base")
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false)
      .select("k").as[Long].collect().sorted.toSeq == (1L to 10L),
      "both appends' rows must be readable at HEAD")
    // stats shape survived the rebase (inherited envelope columns)
    val m = SnapshotStore.manifest(spark, root, 3L)
    assert(m.columns.contains("min_k") && m.columns.contains("max_k"))
    assert(m.where(col("file").contains("loadY")).select("min_k").as[Long].head() == 9L,
      "the competing append's envelope rows must be carried intact")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("CAS conflict: a file-REPLACING commit racing an append still dies with one clean CME") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cas-conflict")
    (1L to 4L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/base").toString)
    val baseFiles = SnapshotStore.dataFiles(root)
    SnapshotStore.commit(spark, root, baseFiles) // v1
    (1L to 4L).map(k => (k, s"V$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/rewrite").toString)
    (5L to 6L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/loadZ").toString)
    val all = SnapshotStore.dataFiles(root)
    val rewrite = all.filter(_.contains("rewrite"))
    val z = all.filter(_.contains("loadZ"))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    SnapshotStore.commitAttemptHook = (r, _) =>
      if (r == root && fired.compareAndSet(false, true))
        SnapshotStore.commit(spark, root, baseFiles ++ z)
    try {
      // a compaction-shaped commit (replaces every base file) derived
      // from v1 — once the append lands first, its content is stale;
      // rebase would silently drop the append, so it must REFUSE
      intercept[java.util.ConcurrentModificationException] {
        SnapshotStore.commit(spark, root, rewrite)
      }
    } finally resetHook()
    assert(fired.get)
    // the winner's state is intact, the loser left no trace
    assert(SnapshotStore.headVersion(root).contains(2L))
    assert(SnapshotStore.filesAt(spark, root, 2L).toSet == (baseFiles ++ z).toSet)
    import scala.jdk.CollectionConverters._
    val residue = java.nio.file.Files.list(root.resolve("_snapshots"))
    val names = try residue.iterator().asScala.map(_.getFileName.toString).toSeq
                finally residue.close()
    assert(!names.exists(_.startsWith("_tmp")), s"torn tmp manifest left behind: $names")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("commit driver transfer is O(delta), not O(table): fat carried stat rows never cross the driver (VERDICT r12 #1)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("commit-odelta")
    // 48 files whose min/max envelopes are FAT (8 KB strings): the full
    // carried manifest is ~48 × 2 × 8 KB ≈ 768 KB of stat payload. The
    // old collect-the-manifest commit pulls all of it to the driver on
    // EVERY commit; the DataFrame-composed commit moves only names.
    val pad = "x" * 8192
    (0 until 48).foreach { i =>
      Seq((i.toLong, s"$i$pad")).toDF("k", "fat")
        .coalesce(1).write.parquet(root.resolve(f"data/load$i%03d").toString)
    }
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("k", "fat")) // v1, fat envelopes
    Seq((999L, s"delta$pad")).toDF("k", "fat")
      .coalesce(1).write.parquet(root.resolve("data/load_delta").toString)
    // meter every task-result byte of the commit's own jobs (job-group
    // scoped, so parallel suites can't pollute the counter)
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val resultBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.properties != null &&
            "commit-odelta-probe" == j.properties.getProperty("spark.jobGroup.id"))
          j.stageIds.foreach(id => stages.add(id))
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (stages.contains(t.stageId) && t.taskMetrics != null)
          resultBytes.addAndGet(t.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup("commit-odelta-probe", "commit O(delta) probe")
      val v = SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
      spark.sparkContext.clearJobGroup()
      assert(v == 2L)
      // drain the listener bus (poll until the counter quiesces)
      var last = -1L; var spins = 0
      while (resultBytes.get != last && spins < 50) {
        last = resultBytes.get; spins += 1; Thread.sleep(100)
      }
      val bytes = resultBytes.get
      assert(bytes > 0, "probe captured no tasks — job-group scoping broke")
      // the carried fat payload alone is ~768 KB; names + agg rows for
      // the 1-file delta are a few KB. 300 KB cleanly separates the
      // O(delta) regime from the collect-the-manifest regime.
      assert(bytes < 300L * 1024,
        s"commit moved $bytes result bytes to the driver — O(table) manifest collect is back")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      resetHook()
    }
    // and the commit is still CORRECT: all 49 rows, envelopes intact
    assert(SnapshotStore.countAt(spark, root) == 49L)
    val m = SnapshotStore.manifest(spark, root, 2L)
    assert(m.count() == 49L)
    assert(m.where(col("file") === "data/load_delta").count() +
           m.where(col("file").contains("load_delta")).count() >= 1)
    assert(SnapshotStore.filesAtWhere(spark, root, 2L,
      col("min_k") <= 999L && col("max_k") >= 999L).exists(_.contains("load_delta")),
      "the delta file's fresh envelope must be queryable")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("CatalogArbiter: the race / torn-commit / tag suites hold WITHOUT atomic rename (VERDICT r12 #5)") {
    arbiterMatrix("cat-arbiter", new CatalogArbiter)
  }

  test("ObjectStoreArbiter: the same matrix holds on conditional-put alone — no rename, no link (VERDICT r19 #7)") {
    arbiterMatrix("os-arbiter", new ObjectStoreArbiter)
  }

  private def arbiterMatrix(tag: String, arbiter: CommitArbiter): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(tag)
    SnapshotStore.setArbiter(root, arbiter)
    try {
      (1L to 6L).map(k => (k, s"v$k")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/base").toString)
      val baseFiles = SnapshotStore.dataFiles(root)
      SnapshotStore.commit(spark, root, baseFiles, statsCols = Seq("k")) // v1
      // -- append rebase under the catalog arbiter ----------------------
      (7L to 8L).map(k => (k, s"v$k")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/loadX").toString)
      (9L to 10L).map(k => (k, s"v$k")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/loadY").toString)
      val all = SnapshotStore.dataFiles(root)
      val x = all.filter(_.contains("loadX"))
      val y = all.filter(_.contains("loadY"))
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      SnapshotStore.commitAttemptHook = (r, _) =>
        if (r == root && fired.compareAndSet(false, true))
          SnapshotStore.commit(spark, root, baseFiles ++ y)
      try assert(SnapshotStore.commit(spark, root, baseFiles ++ x) == 3L)
      finally resetHook()
      assert(SnapshotStore.filesAt(spark, root, 3L).toSet == (baseFiles ++ x ++ y).toSet)
      // -- torn commit: published manifest, pointer never swung ---------
      // (writer died between publish and swing — simulate by rolling
      // the pointer text back; the next commit must reclaim v4)
      (11L to 12L).map(k => (k, s"v$k")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/loadT").toString)
      val t = SnapshotStore.dataFiles(root).filter(_.contains("loadT"))
      SnapshotStore.commit(spark, root, baseFiles ++ x ++ y ++ t) // v4
      java.nio.file.Files.write(root.resolve("_snapshots/HEAD"),
        "3".getBytes("UTF-8")) // tear: v4 manifest exists, HEAD says 3
      val v4 = SnapshotStore.commit(spark, root, baseFiles ++ x ++ y ++ t)
      assert(v4 == 4L, "orphan reclaim under the catalog arbiter must land v4")
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 12)
      // -- tag exclusivity without link(2) ------------------------------
      SnapshotStore.tagVersion(root, "pin", 2L)
      intercept[IllegalStateException] { SnapshotStore.tagVersion(root, "pin", 3L) }
      assert(SnapshotStore.tagVersionOf(root, "pin").contains(2L))
      assert(SnapshotStore.readAtTag(spark, root, "pin", inferPartitions = false)
        .count() == 8)
      // -- vacuum + rollback still honor pins under the arbiter ---------
      SnapshotStore.vacuum(spark, root, retain = 1)
      assert(SnapshotStore.manifestVersions(root).contains(2L), "tagged v2 must survive")
      intercept[IllegalArgumentException] { SnapshotStore.rollbackTo(spark, root, 1L) }
    } finally {
      SnapshotStore.clearArbiter(root)
      resetHook()
    }
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("CAS stress: six genuinely concurrent appenders ALL land; versions linearize; every manifest is a superset of its parent") {
    casStress(arbiter = None)
  }

  test("CAS stress WITHOUT atomic rename: the six-way race linearizes under the CatalogArbiter too") {
    casStress(arbiter = Some(new CatalogArbiter))
  }

  test("CAS stress on conditional-put alone: the six-way race linearizes under the ObjectStoreArbiter (VERDICT r19 #7)") {
    casStress(arbiter = Some(new ObjectStoreArbiter))
  }

  private def casStress(arbiter: Option[CommitArbiter]): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cas-stress")
    arbiter.foreach(SnapshotStore.setArbiter(root, _))
    try casStressBody(root)
    finally arbiter.foreach(_ => SnapshotStore.clearArbiter(root))
    graft.core.IndexStore.deleteRecursively(root)
  }

  private def casStressBody(root: java.nio.file.Path): Unit = {
    import spark.implicits._
    (1L to 4L).map(k => (k, s"v$k")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/base").toString)
    val baseFiles = SnapshotStore.dataFiles(root)
    SnapshotStore.commit(spark, root, baseFiles, statsCols = Seq("k")) // v1
    val n = 6
    val loads = (0 until n).map { i =>
      Seq((100L + i, s"load$i")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve(s"data/load$i").toString)
      SnapshotStore.dataFiles(root).filter(_.startsWith(s"data/load$i/"))
    }
    // real thread race through the real filesystem CAS — no hook, no
    // interleave scripting; the rebase loop must absorb up to n−1
    // competing winners per thread
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Either[Throwable, Long]]()
    val threads = (0 until n).map { i =>
      val t = new Thread(() => {
        gate.await()
        try results.put(i, Right(
          SnapshotStore.commit(spark, root, baseFiles ++ loads(i))))
        catch { case e: Throwable => results.put(i, Left(e)) }
      })
      t.start(); t
    }
    gate.countDown()
    threads.foreach(_.join(120000))
    val got = (0 until n).map(results.get)
    val failed = got.collect { case Left(e) => e }
    assert(failed.isEmpty, s"appenders died: ${failed.map(_.getMessage)}")
    val versions = got.collect { case Right(v) => v }.sorted
    assert(versions == (2L to (n + 1L)), s"versions not linearized: $versions")
    assert(SnapshotStore.headVersion(root).contains(n + 1L))
    // every version's manifest strictly extends its parent's (nothing
    // lost, nothing torn, exactly one load added per step)
    (2L to (n + 1L)).foreach { v =>
      val parent = SnapshotStore.filesAt(spark, root, v - 1).toSet
      val mine = SnapshotStore.filesAt(spark, root, v).toSet
      assert(parent.subsetOf(mine), s"v$v dropped files from v${v - 1}")
      assert((mine -- parent).nonEmpty, s"v$v added nothing")
    }
    assert(SnapshotStore.filesAt(spark, root, n + 1L).toSet ==
      (baseFiles ++ loads.flatten).toSet, "final manifest != base ∪ all loads")
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 4L + n)
  }

  test("torn fold: a crash mid-fold leaves the table untouched; the retry overwrites the partial attempt dir cleanly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("torn-fold")
    (1L to 9L).map(k => (k, s"v$k", 0L)).toDF("k", "p", "ord")
      .repartitionByRange(3, col("k")).sortWithinPartitions("k")
      .write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root), statsCols = Seq("k")) // v1
    SnapshotStore.commitCdcDelta(spark, root,
      Seq((2L, "V2", 1L), (10L, "ins10", 1L)).toDF("k", "p", "ord"), "k") // v2
    // simulate the crash window: the NEXT fold's attempt dir exists,
    // partially written with garbage, and no commit happened
    val torn = root.resolve("data/cdcfold_a3")
    java.nio.file.Files.createDirectories(torn)
    Seq((999L, "junk", 9L)).toDF("k", "p", "ord")
      .coalesce(1).write.mode("overwrite").parquet(torn.toString)
    // the table is untouched — readers never see the torn attempt
    assert(SnapshotStore.headVersion(root).contains(2L))
    val want = Seq(1L -> "v1", 2L -> "V2", 3L -> "v3", 4L -> "v4", 5L -> "v5",
      6L -> "v6", 7L -> "v7", 8L -> "v8", 9L -> "v9", 10L -> "ins10")
    def content() = SnapshotStore.readAtCdc(spark, root, None, "k", Seq("ord"))
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(content() == want)
    // the RETRY folds into the same attempt dir (overwrite): garbage
    // gone, content exact, nothing junk-referenced in the manifest
    val v3 = SnapshotStore.foldCdc(spark, root, "k", Seq("ord"), 2, statsCols = Seq("k"))
    assert(v3 == 3L)
    assert(content() == want, "post-retry fold content diverged")
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false)
      .where(col("p") === "junk").count() == 0, "torn garbage leaked into the table")
    graft.core.IndexStore.deleteRecursively(root)
  }

  test("pending-file guard: plain-data ops refuse on un-folded CDC deltas / MOR deletes; the fold unblocks") {
    import spark.implicits._
    def boom(op: String)(body: => Any): Unit = {
      val e = intercept[IllegalStateException](body)
      assert(e.getMessage.contains("un-folded") && e.getMessage.contains("fold"),
        s"$op refusal message unhelpful: ${e.getMessage}")
    }

    // -- a table with one pending CDC delta ---------------------------
    val r1 = java.nio.file.Files.createTempDirectory("guard-cdc")
    (1L to 6L).map(k => (k, s"v$k", 0L)).toDF("k", "p", "ord")
      .coalesce(1).write.parquet(r1.resolve("data/base").toString)
    SnapshotStore.commit(spark, r1, SnapshotStore.dataFiles(r1), statsCols = Seq("k")) // v1
    SnapshotStore.commitCdcDelta(spark, r1,
      Seq((2L, "V2", 1L)).toDF("k", "p", "ord"), "k") // v2, pending
    boom("mergeCow")(SnapshotStore.mergeCow(spark, r1,
      Seq((3L, "X", false)).toDF("k", "p", "_delete").withColumn("ord", lit(9L)), "k"))
    boom("compact")(SnapshotStore.compact(spark, r1, 1))
    boom("deleteMor")(SnapshotStore.deleteMor(spark, r1, Seq(1L).toDF("k"), "k"))
    boom("readAtMor")(SnapshotStore.readAtMor(spark, r1, None, "k"))
    boom("changesBetween")(SnapshotStore.changesBetween(spark, r1, 1L, 2L, "k"))
    boom("countAt")(SnapshotStore.countAt(spark, r1))
    // readAtCdc — the op that DOES understand deltas — still answers
    assert(SnapshotStore.readAtCdc(spark, r1, None, "k", Seq("ord"))
      .where(col("k") === 2L).select("p").as[String].head() == "V2")
    // the fold unblocks every refused op
    val v3 = SnapshotStore.foldCdc(spark, r1, "k", Seq("ord"), 1, statsCols = Seq("k"))
    assert(SnapshotStore.countAt(spark, r1, Some(v3)) == 6L)
    SnapshotStore.compact(spark, r1, 1) // no throw
    graft.core.IndexStore.deleteRecursively(r1)

    // -- a table with one pending MOR delete file ---------------------
    val r2 = java.nio.file.Files.createTempDirectory("guard-mor")
    (1L to 6L).map(k => (k, s"v$k", 0L)).toDF("k", "p", "ord")
      .coalesce(1).write.parquet(r2.resolve("data/base").toString)
    SnapshotStore.commit(spark, r2, SnapshotStore.dataFiles(r2), statsCols = Seq("k")) // v1
    SnapshotStore.deleteMor(spark, r2, Seq(5L).toDF("k"), "k") // v2, pending
    boom("commitCdcDelta")(SnapshotStore.commitCdcDelta(spark, r2,
      Seq((2L, "V2", 1L)).toDF("k", "p", "ord"), "k"))
    boom("readAtCdc")(SnapshotStore.readAtCdc(spark, r2, None, "k", Seq("ord")))
    boom("compact")(SnapshotStore.compact(spark, r2, 1))
    boom("countAt")(SnapshotStore.countAt(spark, r2))
    // foldMor unblocks the CDC rung on the same table
    SnapshotStore.foldMor(spark, r2, "k", 1, statsCols = Seq("k"))
    val vd = SnapshotStore.commitCdcDelta(spark, r2,
      Seq((2L, "V2", 1L)).toDF("k", "p", "ord"), "k")
    assert(SnapshotStore.readAtCdc(spark, r2, Some(vd), "k", Seq("ord"))
      .count() == 5L) // 6 base − 1 deleted, k=2 superseded not doubled
    graft.core.IndexStore.deleteRecursively(r2)
  }
}
