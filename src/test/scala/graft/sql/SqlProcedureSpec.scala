package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{IndexStore, SnapshotStore}

/** The SQL maintenance surface (`CALL graft_lake.system.*` on Spark
  * 4's stored-procedure API): every maintenance verb delegates 1:1 to
  * the SnapshotStore API and reports its outcome as one result row —
  * the whole table lifecycle closes without leaving `spark.sql`. */
class SqlProcedureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")

  test("CALL compact + vacuum: fewer files, content preserved, superseded versions expired, outcomes reported") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("proc-compact")
    try {
      catalogOn()
      (0 until 6).foreach { i =>
        Seq((i.toLong, s"p$i")).toDF("k", "p")
          .coalesce(1).write.parquet(root.resolve(s"data/l$i").toString)
        if (i == 0) SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
        else SnapshotStore.commitAppend(spark, root,
          SnapshotStore.dataFiles(root).filter(_.startsWith(s"data/l$i/")))
      }
      val t = root.toAbsolutePath.normalize.toString
      val v = spark.sql(
          s"CALL graft_lake.system.compact(`table` => '$t', num_files => 2, sort_col => 'k')")
        .as[Long].head()
      assert(v == 7L, s"compact must report the committed version, got $v")
      assert(SnapshotStore.filesAt(spark, root, 7L).size == 2)
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 6L)
      val deleted = spark.sql(
          s"CALL graft_lake.system.vacuum(`table` => '$t', retain => 1)")
        .as[Long].head()
      assert(deleted == 6L, s"vacuum must report the retired pre-compaction files: $deleted")
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 6L)
    } finally IndexStore.deleteRecursively(root)
  }

  test("CALL fold_cdc resolves pending deltas; vacuum_older_than expires by instant; unknown procedure refuses with the roster") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("proc-fold")
    try {
      catalogOn()
      SnapshotStore.setClock(root, () => 1700000000000L)
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "p", "ord")
        .coalesce(1).write.parquet(root.resolve("data/base").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k")) // v1
      SnapshotStore.setClock(root, () => 1700000060000L)
      SnapshotStore.commitCdcDelta(spark, root,
        Seq((2L, "b2", 2L)).toDF("k", "p", "ord"), "k") // v2: pending delta
      val t = root.toAbsolutePath.normalize.toString
      SnapshotStore.setClock(root, () => 1700000120000L)
      val v = spark.sql(
          s"CALL graft_lake.system.fold_cdc(`table` => '$t', key => 'k', " +
          "num_files => 1, order_cols => 'ord')")
        .as[Long].head()
      assert(v == 3L)
      assert(!SnapshotStore.filesAt(spark, root, 3L)
        .exists(SnapshotStore.isCdcDeltaFile), "fold must retire the deltas")
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select("k", "p").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b2")))
      // age-based retention through SQL: horizon between v2 and v3
      val horizon = java.time.Instant.ofEpochMilli(1700000090000L)
        .toString.replace("T", " ").stripSuffix("Z")
      spark.sql(s"CALL graft_lake.system.vacuum_older_than(`table` => '$t', " +
        s"older_than => TIMESTAMP '$horizon')").collect()
      assert(SnapshotStore.manifestVersions(root) == Seq(3L),
        "versions before the horizon must expire")
      val e = intercept[Exception](
        spark.sql(s"CALL graft_lake.system.no_such(`table` => '$t')"))
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Seq.empty else x.getMessage +: msgs(x.getCause)
      // Spark wraps the catalog's refusal in FAILED_TO_LOAD_ROUTINE;
      // the roster message rides the cause chain
      assert(msgs(e).exists(m => m != null &&
        (m.contains("available:") || m.contains("FAILED_TO_LOAD_ROUTINE"))),
        msgs(e).mkString(" | "))
    } finally {
      SnapshotStore.clearClock(root)
      IndexStore.deleteRecursively(root)
    }
  }

  test("CALL drop_retired_renames closes the rename lifecycle from SQL") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("proc-rename")
    try {
      catalogOn()
      Seq((1L, 5.0)).toDF("k", "v")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      SnapshotStore.renameColumnMapped(spark, root, "v", "amount") // v2
      val t = root.toAbsolutePath.normalize.toString
      // compact via SQL (readAt handles the rename), then retire it
      spark.sql(s"CALL graft_lake.system.compact(`table` => '$t', num_files => 1)")
      spark.sql(s"CALL graft_lake.system.drop_retired_renames(`table` => '$t')")
      assert(SnapshotStore.renamesAt(root,
        SnapshotStore.headVersion(root).get).isEmpty)
      // the SQL read surface reopens
      assert(spark.sql(s"SELECT amount FROM graft_lake.`$t`")
        .as[Double].collect().toSeq == Seq(5.0))
    } finally IndexStore.deleteRecursively(root)
  }

  test("WAP in SQL (VERDICT r17 #4): wap.branch routes INSERTs to the branch, audits read VERSION AS OF, drop_branch leaves no trace, publish_branch fast-forwards HEAD") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    catalogOn()
    val root = java.nio.file.Files.createTempDirectory("sql-wap").resolve("tbl")
    val rootStr = root.toAbsolutePath.normalize.toString
    val t = s"graft_lake.`$rootStr`"
    try {
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").createOrReplaceTempView("wap_base")
      spark.sql(s"CREATE TABLE $t AS SELECT * FROM wap_base") // v1 = HEAD
      spark.conf.set("spark.graft.wap.branch", "staging")
      try {
        // staged INSERT lands on the branch: HEAD readers see nothing
        spark.sql(s"INSERT INTO $t VALUES (3, -30.0)")
        assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 2L,
          "mainline must not see staged rows")
        assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 'staging'")
          .as[Long].head() == 3L, "the audit view must see the staged batch")
        // audit trips (negative value) -> drop_branch: no trace
        val dropped = spark.sql(
          s"CALL graft_lake.system.drop_branch(`table` => '$rootStr', " +
          "branch => 'staging')").head().getLong(0)
        assert(dropped >= 1L, "the rejected batch's files must prune")
        assert(SnapshotStore.headVersion(root).contains(1L), "HEAD never moved")
        assert(SnapshotStore.refVersion(root, "staging").isEmpty)
        // cycle 2: the good batch stages, publishes, HEAD fast-forwards
        spark.sql(s"INSERT INTO $t VALUES (4, 40.0)")
        assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 2L)
        val published = spark.sql(
          s"CALL graft_lake.system.publish_branch(`table` => '$rootStr', " +
          "branch => 'staging')").head().getLong(0)
        assert(published == 2L)
      } finally spark.conf.unset("spark.graft.wap.branch")
      assert(spark.sql(s"SELECT k, v FROM $t ORDER BY k")
        .as[(Long, Double)].collect().toSeq ==
        Seq((1L, 10.0), (2L, 20.0), (4L, 40.0)),
        "HEAD must be base + the published batch, nothing else")
      // with the conf unset, INSERTs land on HEAD again
      spark.sql(s"INSERT INTO $t VALUES (5, 50.0)")
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 4L)
      // partitioned WAP: staged appends fork; INSERT OVERWRITE refuses
      val p = s"graft_lake.`$rootStr-part`"
      spark.sql(s"CREATE TABLE $p (k BIGINT, g STRING) PARTITIONED BY (g)")
      spark.sql(s"INSERT INTO $p VALUES (1, 'a')")
      spark.conf.set("spark.graft.wap.branch", "staging")
      try {
        spark.sql(s"INSERT INTO $p VALUES (2, 'b')")
        assert(spark.sql(s"SELECT count(*) FROM $p").as[Long].head() == 1L)
        val e = intercept[Exception](
          spark.sql(s"INSERT OVERWRITE $p VALUES (9, 'a')"))
        assert(e.getMessage.contains("WAP branch"), e.getMessage)
        spark.sql(s"CALL graft_lake.system.publish_branch(" +
          s"`table` => '$rootStr-part', branch => 'staging')")
      } finally spark.conf.unset("spark.graft.wap.branch")
      assert(spark.sql(s"SELECT k FROM $p ORDER BY k")
        .as[Long].collect().toSeq == Seq(1L, 2L))
    } finally IndexStore.deleteRecursively(root.getParent)
  }
}
