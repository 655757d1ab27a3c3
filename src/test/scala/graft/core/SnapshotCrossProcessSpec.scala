package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CROSS-PROCESS commit safety (VERDICT r13 #2): every prior race spec
  * ran real threads in ONE JVM, where `lockFor(root)` serializes
  * attempts before the rename CAS is ever contested. Here a second JVM
  * (a plain `java` child running [[CrossProcessCommitter]]) races
  * appends against this one on the same table root, so the only thing
  * standing between two committers is the arbiter's filesystem CAS —
  * rename(2) refusing to replace a non-empty directory, and the atomic
  * pointer swing. Run under [[RenameArbiter]], the arbiter whose
  * primitives CLAIM cross-process atomicity; [[CatalogArbiter]] is by
  * design a single in-process serialization point standing in for a
  * catalog service/DB — two independent instances in two JVMs is not
  * its deployment shape (the service's own transaction is), so its
  * cross-process story is exercised by the in-process suite that owns
  * the one instance. */
class SnapshotCrossProcessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("cross-process CAS: appends race from two JVMs — all land, versions linearize, no torn state; a stale pin dies with one clean CME (VERDICT r13 #2)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("xproc-cas")
    Seq((0L, "base")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("k")) // v1

    // the child process: same classpath as this forked test JVM
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val nEach = 4
    val cmd: Seq[String] = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.core.CrossProcessCommitter", root.toString, nEach.toString, "B")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val childLog = new java.lang.StringBuilder
    val ready = new java.util.concurrent.CountDownLatch(1)
    val pump = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      var ln = br.readLine()
      while (ln != null) {
        childLog.append(ln).append('\n')
        if (ln.contains("READY")) ready.countDown()
        ln = br.readLine()
      }
    })
    pump.setDaemon(true)
    pump.start()
    try {
      assert(ready.await(120, java.util.concurrent.TimeUnit.SECONDS),
        s"child session never came up:\n$childLog")
      // GO: both racers enter their commit loops together
      java.nio.file.Files.write(root.resolve("_go"), "go".getBytes("UTF-8"))
      (1 to nEach).foreach { i =>
        val rel = s"data/A_$i"
        Seq((100L + i, s"A$i")).toDF("k", "p")
          .coalesce(1).write.parquet(root.resolve(rel).toString)
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(root.resolve(rel))
        val add = try w.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(p => root.relativize(p).toString).toSeq.sorted
          finally w.close()
        SnapshotStore.commitAppend(spark, root, add)
      }
      assert(proc.waitFor(240, java.util.concurrent.TimeUnit.SECONDS),
        s"child never finished:\n$childLog")
      assert(proc.exitValue() == 0, s"child failed:\n$childLog")
      assert(childLog.toString.contains("B DONE"), s"child log:\n$childLog")
    } finally {
      if (proc.isAlive) proc.destroyForcibly()
    }

    // ALL 8 racing appends landed: the CAS never let a committer
    // last-wins-overwrite another's version
    val head = SnapshotStore.headVersion(root).get
    assert(head == 1L + 2 * nEach, s"expected v${1 + 2 * nEach}, got v$head")
    val headFiles = SnapshotStore.filesAt(spark, root, head)
    (1 to nEach).foreach { i =>
      assert(headFiles.exists(_.startsWith(s"data/A_$i/")), s"parent append $i lost")
      assert(headFiles.exists(_.startsWith(s"data/B_$i/")), s"child append $i lost")
    }
    assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() ==
      1L + 2 * nEach)
    // versions LINEARIZE: every manifest is a strict superset of its
    // parent (pure appends), every version dir is whole (list + uuid),
    // and the losers left no temp litter
    (2L to head).foreach { v =>
      val prev = SnapshotStore.filesAt(spark, root, v - 1).toSet
      val cur = SnapshotStore.filesAt(spark, root, v).toSet
      assert(prev.subsetOf(cur) && cur.size == prev.size + 1,
        s"v$v is not a single-file append over v${v - 1}")
      assert(java.nio.file.Files.exists(
        root.resolve(s"_snapshots/v=$v/_commit_uuid")), s"v$v torn: no uuid")
    }
    val uuids = (1L to head).map(v => new String(java.nio.file.Files.readAllBytes(
      root.resolve(s"_snapshots/v=$v/_commit_uuid")), "UTF-8"))
    assert(uuids.distinct.size == uuids.size, "two versions share a commit uuid")
    import scala.jdk.CollectionConverters._
    val litter = java.nio.file.Files.list(root.resolve("_snapshots"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_tmp_")).toSeq
    assert(litter.isEmpty, s"publish-race losers left temp manifests: $litter")

    // and a STALE PIN across the process boundary dies with one clean
    // CME: this JVM derived at v1, the child has long since moved HEAD
    Seq((999L, "stale")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/stale").toString)
    val staleAdd = SnapshotStore.dataFiles(root).filter(_.startsWith("data/stale/"))
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.commitAppend(spark, root, staleAdd, expectedBase = 1L)
    }
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    assert(SnapshotStore.headVersion(root).contains(head), "stale pin moved HEAD")
    IndexStore.deleteRecursively(root)
  }
}
