package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** MAINTENANCE-vs-INGEST commit races (VERDICT r13 #3): the CAS rebase
  * suite covers append-append; the production collision is a
  * file-REMOVING maintenance commit (fold/compaction) racing a
  * streaming epoch append on the same table. Contract under the
  * optimistic-commit discipline:
  *
  *  - maintenance wins → the APPEND REBASES over it (its files are new
  *    and disjoint by construction, the one always-rebase-legal shape)
  *    — no epoch lost, no fold undone;
  *  - the append wins → the maintenance commit fails with ONE clean
  *    CME (its content derived from a base the append invalidated —
  *    re-derive, never re-apply), and a retry from the new head
  *    succeeds.
  *
  * Interleavings are pinned with the deterministic
  * [[SnapshotStore.commitAttemptHook]] seam (fires after base
  * resolution, before the CAS), the same single-writer interleave a
  * thread race produces minus the flake. */
class SnapshotMaintenanceRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def resetHook(): Unit =
    SnapshotStore.commitAttemptHook = (_, _) => ()

  /** Arm the hook to run `op` exactly once, ignoring the re-entrant
    * attempts op's own commit fires. */
  private def injectOnce(at: java.nio.file.Path)(op: => Unit): Unit = {
    val state = new java.util.concurrent.atomic.AtomicInteger(0) // 0=armed 1=running/spent
    SnapshotStore.commitAttemptHook = (r, _) =>
      if (r == at && state.compareAndSet(0, 1)) op
  }

  private def writeLoad(root: java.nio.file.Path, rel: String,
                        rows: Seq[(Long, String)]): Seq[String] = {
    import spark.implicits._
    rows.toDF("k", "p").coalesce(1).write.parquet(root.resolve(rel).toString)
    import scala.jdk.CollectionConverters._
    val w = java.nio.file.Files.walk(root.resolve(rel))
    try w.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString).toSeq.sorted
    finally w.close()
  }

  test("foldCdc wins the race: the epoch append rebases over it — no epoch lost, no fold undone (VERDICT r13 #3)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("race-fold-wins")
    SnapshotStore.commit(spark, root,
      writeLoad(root, "data/base", (1L to 8L).map(k => k -> "old")),
      statsCols = Seq("k")) // v1
    SnapshotStore.commitCdcDelta(spark, root,
      Seq((1L, "new")).toDF("k", "p"), keyCol = "k") // v2: pending delta
    // the fold lands BETWEEN the epoch's base resolution and its CAS
    injectOnce(root) {
      SnapshotStore.foldCdc(spark, root, keyCol = "k", orderCols = Nil, numFiles = 2)
    }
    try {
      val v = SnapshotStore.commitEpoch(spark, root,
        (100L to 103L).map(k => k -> s"e$k").toDF("k", "p"), epochId = 7L)
      assert(v == 4L, s"epoch must rebase onto the fold (v3) and land as v4, got v$v")
    } finally resetHook()
    val head = SnapshotStore.headVersion(root).get
    assert(head == 4L)
    val files = SnapshotStore.filesAt(spark, root, head)
    // the fold is NOT undone: no pending delta survived, the folded
    // files are the standing base
    assert(!files.exists(SnapshotStore.isCdcDeltaFile), s"fold undone: $files")
    assert(files.exists(_.startsWith("data/cdcfold_a")), s"fold output missing: $files")
    // the epoch is NOT lost
    assert(files.exists(_.startsWith("data/epoch_7_")), s"epoch lost: $files")
    // and the drained content equals the batch oracle: base upserted by
    // the delta, plus the epoch's rows
    val got = SnapshotStore.readAtCdc(spark, root, keyCol = "k", orderCols = Nil)
      .select("k", "p").as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = ((1L, "new") +: (2L to 8L).map(k => k -> "old")) ++
      (100L to 103L).map(k => k -> s"e$k")
    assert(got == want, s"content diverged:\n got=$got\nwant=$want")
    IndexStore.deleteRecursively(root)
  }

  test("the epoch append wins: foldCdc dies with ONE clean CME, nothing partial lands, and the retry folds over the new head") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("race-append-wins")
    SnapshotStore.commit(spark, root,
      writeLoad(root, "data/base", (1L to 8L).map(k => k -> "old")),
      statsCols = Seq("k")) // v1
    SnapshotStore.commitCdcDelta(spark, root,
      Seq((2L, "new2")).toDF("k", "p"), keyCol = "k") // v2: pending delta
    // the epoch lands BETWEEN the fold's base resolution and its CAS
    injectOnce(root) {
      SnapshotStore.commitEpoch(spark, root,
        Seq((200L, "e200"), (201L, "e201")).toDF("k", "p"), epochId = 9L)
    }
    val e = try {
      intercept[java.util.ConcurrentModificationException] {
        SnapshotStore.foldCdc(spark, root, keyCol = "k", orderCols = Nil, numFiles = 2)
      }
    } finally resetHook()
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    // the lost fold left the table WHOLE: epoch landed as v3, the delta
    // is still pending, no folded file leaked into the manifest
    val head = SnapshotStore.headVersion(root).get
    assert(head == 3L, s"expected the epoch at v3, got v$head")
    val files = SnapshotStore.filesAt(spark, root, head)
    assert(files.exists(SnapshotStore.isCdcDeltaFile), "the pending delta vanished")
    assert(files.exists(_.startsWith("data/epoch_9_")), "the winning epoch vanished")
    assert(!files.exists(_.startsWith("data/cdcfold_a")), "a lost fold leaked files")
    // re-derive and retry: the fold now bases on the epoch's head
    val v4 = SnapshotStore.foldCdc(spark, root, keyCol = "k", orderCols = Nil, numFiles = 2)
    assert(v4 == 4L)
    assert(!SnapshotStore.filesAt(spark, root, 4L).exists(SnapshotStore.isCdcDeltaFile))
    val got = SnapshotStore.readAt(spark, root, inferPartitions = false)
      .select("k", "p").as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = Seq(1L -> "old", 2L -> "new2") ++ (3L to 8L).map(k => k -> "old") ++
      Seq(200L -> "e200", 201L -> "e201")
    assert(got == want, s"content diverged after the retried fold:\n got=$got\nwant=$want")
    IndexStore.deleteRecursively(root)
  }

  test("compact wins the race: the epoch append rebases over the rewritten file set") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("race-compact")
    val loads = (0 until 6).flatMap(i =>
      writeLoad(root, s"data/load$i", Seq(i.toLong -> s"v$i")))
    SnapshotStore.commit(spark, root, loads, statsCols = Seq("k")) // v1: 6 small files
    injectOnce(root) {
      SnapshotStore.compact(spark, root, numFiles = 2, sortCol = Some("k"))
    }
    try {
      val v = SnapshotStore.commitEpoch(spark, root,
        (50L to 52L).map(k => k -> s"e$k").toDF("k", "p"), epochId = 1L)
      assert(v == 3L, s"epoch must rebase onto the compaction (v2) and land as v3, got v$v")
    } finally resetHook()
    val files = SnapshotStore.filesAt(spark, root, 3L)
    assert(!files.exists(_.startsWith("data/load")),
      s"compacted-away files resurrected: $files")
    assert(files.exists(_.startsWith("data/compact_a")), s"compaction undone: $files")
    assert(files.exists(_.startsWith("data/epoch_1_")), s"epoch lost: $files")
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 9L)
    IndexStore.deleteRecursively(root)
  }
}
