package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** The pure-SQL lifecycle (SURVEY §3.4): registered catalog views +
  * `spark.sql` strings must produce the same results as the DataFrame
  * DSL — including the engine's custom SQL function. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over registered views equals the DataFrame plan") {
    Tables.registerAll(spark, dir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect().toSeq
    val viaDsl = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    }
    assert(viaSql == viaDsl)
  }

  test("custom hashtags() function composes inside SQL pipelines") {
    import spark.implicits._
    graft.functions.ExtractHashtags.ensureRegistered(spark)
    Tables.registerAll(spark, dir)
    val out = spark.sql(
      """SELECT tag, COUNT(*) AS cnt
        |FROM (SELECT explode(hashtags(concat('#', event_type))) AS tag FROM events)
        |GROUP BY tag ORDER BY cnt DESC, tag""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._1.startsWith("#")))
    assert(out.map(_._2).sum == 1000L) // every event contributes exactly one tag
  }

  test("snapshot catalog: VERSION AS OF number/tag/branch through spark.sql is hash-identical to the API path (VERDICT r13 #5)") {
    import org.apache.spark.sql.functions._
    import graft.core.SnapshotStore
    // the q26s/q26f pair itself (shared fixture, shared oracle)
    val viaSql = graft.operators.LayoutQueries.q26sSqlTimeTravel(spark, dir).collect().toSeq
    val viaApi = graft.operators.LayoutQueries.q26fTimeTravel(spark, dir)
      .select("snap", "event_type", "n_events", "sum_value", "max_ts")
      .collect().toSeq
    assert(viaSql.map(_.toSeq).sortBy(_.toString) == viaApi.map(_.toSeq).sortBy(_.toString),
      "SQL surface drifted from the DataFrame surface")
    // version-number, tag, and BRANCH resolution on a scratch table
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sqlcat")
    Seq((1L, "a"), (2L, "b")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/l1").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
    Seq((3L, "c")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/l2").toString)
    SnapshotStore.commitAppend(spark, root,
      SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v2 = HEAD
    SnapshotStore.tagVersion(root, "pin", 1L)
    // a staging branch one commit ahead of HEAD
    Seq((4L, "d")).toDF("k", "p")
      .coalesce(1).write.parquet(root.resolve("data/l3").toString)
    SnapshotStore.commit(spark, root,
      SnapshotStore.filesAt(spark, root, 2L) ++
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l3/")),
      ref = "audit")
    spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
    val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
    def ks(q: String): Seq[Long] =
      spark.sql(q).as[Long].collect().sorted.toSeq
    assert(ks(s"SELECT k FROM $t") == Seq(1L, 2, 3), "bare table must read HEAD")
    assert(ks(s"SELECT k FROM $t VERSION AS OF 1") == Seq(1L, 2))
    assert(ks(s"SELECT k FROM $t VERSION AS OF 'pin'") == Seq(1L, 2), "tag travel")
    assert(ks(s"SELECT k FROM $t VERSION AS OF 'audit'") == Seq(1L, 2, 3, 4),
      "branch-ref travel must see the staged commit")
    assert(ks(s"SELECT k FROM $t WHERE k >= 2") == Seq(2L, 3), "pushdown path")
    // wall-clock travel BEFORE the first stamped commit still refuses
    // (these commits are stamped with the real clock, far after 2024)
    val ts = intercept[Exception] {
      spark.sql(s"SELECT k FROM $t TIMESTAMP AS OF '2024-01-01'").collect()
    }
    assert(ts.getMessage.contains("TIMESTAMP AS OF") || ts.getMessage.contains("timestamp"),
      ts.getMessage)
    // SQL DML is a feature since r15 — but only after the staging
    // branch retires (mainline commits must not interleave with a live
    // branch chain, the standing branch contract)
    graft.core.SnapshotStore.publishBranch(spark, root, "audit") // HEAD → 3
    spark.sql(s"INSERT INTO $t VALUES (9, 'x')")
    assert(ks(s"SELECT k FROM $t") == Seq(1L, 2, 3, 4, 9),
      "INSERT INTO must land through the CAS append")
    graft.core.IndexStore.deleteRecursively(root)
  }
}
