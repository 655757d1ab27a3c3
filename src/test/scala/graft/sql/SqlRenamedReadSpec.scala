package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{IndexStore, SnapshotStore}

/** RENAMED tables through the SQL catalog (VERDICT r16 #5): the
  * chain-coalescing scan serves the generation-grouped union as ONE
  * relation — no compaction required — while row-level DML keeps the
  * store's refusal. Pins: SQL == API `readAt` across generations and
  * chained renames; the logical-only visible schema; filters on
  * renamed columns surviving the old generation (held back from
  * parquet pushdown); full pushdown retained for everything else;
  * `_file` composing with the coalesce; `ALTER TABLE RENAME COLUMN`
  * wiring; and the refusal matrix. */
class SqlRenamedReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(root: java.nio.file.Path): String = {
    spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
    s"graft_lake.`${root.toAbsolutePath.normalize}`"
  }

  /** v1: (k, v, tag) twice-file generation fixture — l1 under `v`,
    * rename v→amount, l2 under `amount`, rename amount→amt (no file
    * anywhere carries the final name). */
  private def mkRenamed(): java.nio.file.Path = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sql-renamed")
    Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"), (3L, None: Option[Double], "a"))
      .toDF("k", "v", "tag")
      .coalesce(1).write.parquet(root.resolve("data/l1").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("k")) // v1
    SnapshotStore.renameColumnMapped(spark, root, "v", "amount") // v2
    Seq((4L, 40.0, "b"), (5L, 5.0, "a")).toDF("k", "amount", "tag")
      .coalesce(1).write.parquet(root.resolve("data/l2").toString)
    SnapshotStore.commitAppend(spark, root,
      SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v3
    SnapshotStore.renameColumnMapped(spark, root, "amount", "amt") // v4
    root
  }

  test("SQL read == API readAt across generations and a chained rename; schema shows logical names only") {
    val root = mkRenamed()
    try {
      val sql = spark.sql(s"SELECT * FROM ${t(root)}")
      assert(sql.columns.toSeq == Seq("k", "amt", "tag"),
        s"retired physical names leaked: ${sql.columns.toSeq}")
      val api = SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select("k", "amt", "tag")
      assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
      assert(sql.count() == 5L)
      // the coalescing scan is in the plan (not a silent plain read)
      assert(sql.queryExecution.executedPlan.toString
        .contains("snapshot-rename-coalesce"))
      // genuine NULL in the OLD generation stays NULL (k = 3)
      assert(spark.sql(s"SELECT amt FROM ${t(root)} WHERE k = 3")
        .head().isNullAt(0))
      // projection of the renamed column alone still resolves the chain
      assert(spark.sql(s"SELECT SUM(amt) AS s FROM ${t(root)}")
        .head().getDouble(0) == 75.0)
    } finally IndexStore.deleteRecursively(root)
  }

  test("filters on a renamed column cross the generation boundary; other filters keep parquet pushdown") {
    val root = mkRenamed()
    try {
      // old generation holds 10.0 and 20.0 — a filter pushed to parquet
      // against the newest physical name alone would lose both
      val f = spark.sql(s"SELECT k FROM ${t(root)} WHERE amt > 9.0 ORDER BY k")
      assert(f.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
      val plan = f.queryExecution.executedPlan.toString
      assert(!plan.contains("PushedFilters: [IsNotNull(amt)"),
        "renamed-column filter must stay a post-scan residual")
      // a filter on an untouched column still reaches parquet
      val g = spark.sql(s"SELECT amt FROM ${t(root)} WHERE k = 4")
      val gplan = g.queryExecution.executedPlan.toString
      assert(gplan.contains("EqualTo(k,4)"),
        s"non-renamed pushdown lost:\n$gplan")
      assert(g.head().getDouble(0) == 40.0)
      // `_file` composes with the coalesce: both generations tagged
      val files = spark.sql(s"SELECT DISTINCT _file FROM ${t(root)} WHERE amt > 9.0")
        .collect().map(_.getString(0)).toSet
      assert(files.exists(_.startsWith("data/l1/")) &&
        files.exists(_.startsWith("data/l2/")), s"got $files")
    } finally IndexStore.deleteRecursively(root)
  }

  test("ALTER TABLE RENAME COLUMN wires to the mapped rename; DML refuses until compaction retires the mapping; INSERT stays live") {
    import spark.implicits._
    val root = mkRenamed()
    try {
      // INSERT INTO under the logical name lands a newest-generation file
      spark.sql(s"INSERT INTO ${t(root)} VALUES (6, 60.0, 'b')") // v5
      assert(spark.sql(s"SELECT SUM(amt) AS s FROM ${t(root)}")
        .head().getDouble(0) == 135.0)
      // row-level DML refuses loudly (generation mixing)
      val e = intercept[Exception](
        spark.sql(s"UPDATE ${t(root)} SET tag = 'x' WHERE k = 1"))
      assert(e.getMessage.contains("RENAMED"), e.getMessage)
      val e2 = intercept[Exception](
        spark.sql(s"DELETE FROM ${t(root)} WHERE k = 1"))
      assert(e2.getMessage.toLowerCase.contains("rename"), e2.getMessage)
      // the SQL rename itself: ALTER TABLE → renameColumnMapped
      spark.sql(s"ALTER TABLE ${t(root)} RENAME COLUMN tag TO label") // v6
      assert(SnapshotStore.renamesAt(root,
        SnapshotStore.headVersion(root).get).exists(r => r._1 == "label"))
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM ${t(root)} WHERE label = 'a'")
        .head().getLong(0) == 3L)
      // compaction + retirement reopens the vectorized single-relation
      // path: no coalescing wrapper left in the plan
      SnapshotStore.compact(spark, root, numFiles = 1)
      SnapshotStore.dropRetiredRenames(spark, root)
      val after = spark.sql(s"SELECT * FROM ${t(root)}")
      assert(after.columns.toSeq == Seq("k", "amt", "label"))
      assert(!after.queryExecution.executedPlan.toString
        .contains("snapshot-rename-coalesce"))
      assert(after.count() == 6L)
      spark.sql(s"UPDATE ${t(root)} SET label = 'x' WHERE k = 1")
      assert(spark.sql(s"SELECT label FROM ${t(root)} WHERE k = 1")
        .head().getString(0) == "x")
    } finally IndexStore.deleteRecursively(root)
  }
}
