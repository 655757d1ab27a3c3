package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Column rename via NAME MAPPING (VERDICT r15 #7 — field-IDs lite):
  * the rename is a metadata-only commit; reads group files by
  * generation and alias forward; pinned reads below the boundary keep
  * the old name; retention cannot expire the boundary manifest; and
  * every single-relation surface refuses until a compaction +
  * dropRetiredRenames retires the mapping. */
class RenameMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rename is metadata-only; both generations read under the logical name; pinned reads keep the old one; chains compose") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rename-map")
    try {
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      val v1Files = SnapshotStore.filesAt(spark, root, 1L)
      SnapshotStore.renameColumnMapped(spark, root, "v", "amount") // v2
      assert(SnapshotStore.filesAt(spark, root, 2L) == v1Files,
        "rename must rewrite zero data files")
      assert(SnapshotStore.opTypeOf(root, 2L).contains("rename"))
      // a post-rename append carries the NEW physical name
      Seq((3L, 30.0)).toDF("k", "amount")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v3
      val got = SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select("k", "amount").as[(Long, Double)].collect().sorted.toSeq
      assert(got == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)),
        s"both generations must serve the logical name: $got")
      // pinned read below the boundary keeps the OLD name
      assert(SnapshotStore.readAt(spark, root, Some(1L), inferPartitions = false)
        .columns.toSeq == Seq("k", "v"))
      // chained rename: amount -> amt, three generations
      SnapshotStore.renameColumnMapped(spark, root, "amount", "amt") // v4
      Seq((4L, 40.0)).toDF("k", "amt")
        .coalesce(1).write.parquet(root.resolve("data/l3").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l3/"))) // v5
      val chained = SnapshotStore.readAt(spark, root, inferPartitions = false)
        .agg(sum(col("amt"))).as[Double].head()
      assert(chained == 100.0, s"chained generations must compose: $chained")
      // retired-name reuse refused
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.renameColumnMapped(spark, root, "k", "amount")
      }
      assert(e.getMessage.contains("RETIRED"), e.getMessage)
    } finally IndexStore.deleteRecursively(root)
  }

  test("single-relation surfaces refuse a renamed table; compaction + dropRetiredRenames reopens them; retention spares the boundary") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rename-guard")
    try {
      SnapshotStore.setClock(root, () => 1700000000000L)
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "p", "v")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      SnapshotStore.setClock(root, () => 1700000060000L)
      SnapshotStore.renameColumnMapped(spark, root, "v", "amount") // v2
      // the SQL catalog READS the renamed table via its chain-
      // coalescing scan (VERDICT r16 #5) — no compaction needed; the
      // full pre-compaction contract is pinned in SqlRenamedReadSpec
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      assert(spark.sql(s"SELECT k, amount FROM $t ORDER BY k")
        .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0), (2L, 2.0)),
        "pre-compaction SQL reads must serve the logical schema")
      // row-op rung refuses
      val mErr = intercept[IllegalArgumentException] {
        SnapshotStore.mergeCow(spark, root,
          Seq((1L, "a", 9.9, false)).toDF("k", "p", "amount", "_delete"), "k")
      }
      assert(mErr.getMessage.contains("name mapping"), mErr.getMessage)
      // age-based retention cannot expire the boundary manifest: the
      // rename tagged v1, and tags pin versions
      SnapshotStore.setClock(root, () => 1700009999000L)
      SnapshotStore.vacuumOlderThan(spark, root, 1700009000000L)
      assert(java.nio.file.Files.exists(root.resolve("_snapshots/v=1")),
        "the rename boundary manifest must survive retention")
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select("amount").as[Double].collect().sorted.toSeq == Seq(1.0, 2.0))
      // compact rewrites everything under current names; the mapping
      // retires; every surface reopens
      SnapshotStore.compact(spark, root, numFiles = 1)
      SnapshotStore.dropRetiredRenames(spark, root)
      assert(SnapshotStore.renamesAt(root,
        SnapshotStore.headVersion(root).get).isEmpty)
      assert(spark.sql(s"SELECT k, amount FROM $t ORDER BY k")
        .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0), (2L, 2.0)),
        "post-retirement SQL reads must serve the logical schema")
    } finally {
      SnapshotStore.clearClock(root)
      IndexStore.deleteRecursively(root)
    }
  }

  test("addColumn refuses a RETIRED rename source name (ADVICE r17): re-adding it would duplicate the chain-extended read schema") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rename-readd")
    try {
      Seq((1L, 10.0)).toDF("k", "v")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      SnapshotStore.renameColumnMapped(spark, root, "v", "amount") // v2
      // re-adding the retired source refuses — both API reads and the
      // SQL chain-coalescing scan would otherwise read `v` twice
      val e = intercept[IllegalArgumentException](
        SnapshotStore.addColumn(spark, root, "v", "double"))
      assert(e.getMessage.contains("RETIRED rename source"), e.getMessage)
      // the implicit merge path is guarded too: a fresh file physically
      // carrying the retired name must not re-graduate it
      Seq((2L, 20.0, 99.0)).toDF("k", "amount", "v")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v3
      val declared = SnapshotStore.declaredSchema(root,
        SnapshotStore.headVersion(root).get).get
      assert(!declared.split(',').exists(_.trim.startsWith("v ")),
        s"retired name re-graduated into the declaration: $declared")
      // HEAD stays readable — the stray physical column is ignored…
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select(sum(col("amount"))).as[Double].head() == 30.0)
      // …and once compaction + retirement clear the ledger, the name
      // reopens (the documented unblock path)
      SnapshotStore.compact(spark, root, numFiles = 1)
      SnapshotStore.dropRetiredRenames(spark, root)
      SnapshotStore.addColumn(spark, root, "v", "double")
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false)
        .columns.toSeq.count(_ == "v") == 1)
    } finally IndexStore.deleteRecursively(root)
  }

  test("readAt on a renamed table refuses LOUDLY when a boundary manifest is missing (VERDICT r17 wrong #1) — never silent NULLs") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("rename-boundary")
    try {
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      SnapshotStore.renameColumnMapped(spark, root, "v", "amount") // v2, boundary v1
      Seq((3L, 30.0)).toDF("k", "amount")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v3
      // destroy the boundary manifest OUT-OF-BAND (the pin tag exists
      // precisely to prevent this; simulate an operator mistake)
      IndexStore.deleteRecursively(root.resolve("_snapshots/v=1"))
      val e = intercept[IllegalArgumentException](
        SnapshotStore.readAt(spark, root, inferPartitions = false).collect())
      assert(e.getMessage.contains("MISSING"), e.getMessage)
      // the SQL chain-coalescing path never groups by generation, so it
      // stays NATURALLY immune — same rows, no boundary consulted
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val got = spark.sql(
          s"SELECT k, amount FROM graft_lake.`${root.toAbsolutePath.normalize}` ORDER BY k")
        .as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)), got.toString)
    } finally IndexStore.deleteRecursively(root)
  }
}
