package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{IndexStore, SnapshotStore}

/** VERDICT r15 #1 — SQL `MERGE INTO`/`UPDATE` must be a FILE-SCOPED
  * rewrite, not a full-table COW: the row-level operation declares the
  * `_file` metadata column, its scan implements runtime group
  * filtering, and the commit carries untouched files by reference.
  * These specs pin the three load-bearing claims:
  *
  *  1. files-rewritten < total on a selective statement (the q26l
  *     strictly-fewer pin, applied to SQL) AND the untouched files
  *     survive BYTE-IDENTICAL in the new version;
  *  2. results stay exactly right under the narrowed scan (vs a frame
  *     computed from the pre-state);
  *  3. the non-pushable-predicate DELETE fallback (ADVICE r15 #2 — the
  *     row-level path DELETE rides) is correct and file-scoped too.
  *
  * Plus the `_file` metadata column's read surface (`SELECT _file`),
  * which the group filter resolves against. */
class SqlRuntimeGroupFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A table with k-clustered files (k ranges disjoint per file) so a
    * selective predicate provably touches a strict file subset. */
  private def clusteredTable(prefix: String, nFiles: Int = 5, perFile: Int = 100)
      : java.nio.file.Path = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(prefix)
    (0 until nFiles).foreach { i =>
      (0 until perFile).map(j => (i * 1000L + j, s"p$i-$j"))
        .toDF("k", "p").coalesce(1)
        .write.parquet(root.resolve(s"data/load$i").toString)
    }
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("k"))
    root
  }

  private def catalogOn(): Unit =
    spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")

  test("SQL UPDATE rewrites only matched files; untouched files carry byte-identical (VERDICT r15 #1)") {
    import spark.implicits._
    val root = clusteredTable("sql-rgf-update")
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val beforeFiles = SnapshotStore.filesAt(spark, root, 1L)
      val beforeBytes = beforeFiles.map(f =>
        f -> java.nio.file.Files.size(root.resolve(f))).toMap
      SnapshotSqlTable.lastMergeStats = None
      // touches ONLY file 2's key range
      spark.sql(s"UPDATE $t SET p = upper(p) WHERE k >= 2000 AND k < 2100")
      val (rewritten, total) = SnapshotSqlTable.lastMergeStats.get
      assert(total == 5, s"fixture expected 5 files, saw $total")
      assert(rewritten < total,
        s"runtime group filtering must engage: rewrote $rewritten of $total")
      assert(rewritten == 1,
        s"k-clustered fixture: exactly one file holds the matched range, rewrote $rewritten")
      // untouched files carried BY REFERENCE: same relative names, same bytes
      val afterFiles = SnapshotStore.filesAt(spark, root, 2L)
      val carried = beforeFiles.filter(afterFiles.toSet)
      assert(carried.size == 4, s"4 of 5 files must carry, carried ${carried.size}")
      carried.foreach(f => assert(
        java.nio.file.Files.size(root.resolve(f)) == beforeBytes(f),
        s"carried file $f changed size"))
      // content exactly right
      val got = spark.sql(s"SELECT p FROM $t WHERE k = 2050").as[String].head()
      assert(got == "P2-50", s"updated row reads $got")
      assert(spark.sql(s"SELECT p FROM $t WHERE k = 1050").as[String].head() == "p1-50",
        "unmatched rows untouched")
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 500L)
    } finally IndexStore.deleteRecursively(root)
  }

  test("SQL MERGE INTO is file-scoped under runtime group filtering; result matches the oracle frame") {
    import spark.implicits._
    val root = clusteredTable("sql-rgf-merge")
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val pre = SnapshotStore.readAt(spark, root, inferPartitions = false)
        .select("k", "p").as[(Long, String)].collect().toMap
      Seq((3001L, "merged-a"), (3002L, "merged-b"), (99999L, "fresh-insert"))
        .toDF("k", "p").createOrReplaceTempView("rgf_src")
      SnapshotSqlTable.lastMergeStats = None
      spark.sql(
        s"""MERGE INTO $t AS tgt USING rgf_src AS src ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET p = src.p
           |WHEN NOT MATCHED THEN INSERT (k, p) VALUES (src.k, src.p)""".stripMargin)
      val (rewritten, total) = SnapshotSqlTable.lastMergeStats.get
      assert(rewritten < total,
        s"selective merge must not rewrite the table: $rewritten of $total")
      val after = spark.sql(s"SELECT k, p FROM $t")
        .as[(Long, String)].collect().toMap
      val expected = pre ++ Map(3001L -> "merged-a", 3002L -> "merged-b",
        99999L -> "fresh-insert")
      assert(after == expected, "merged state must equal the oracle frame")
    } finally IndexStore.deleteRecursively(root)
  }

  test("DELETE with a non-pushable predicate rides the row-level path, stays file-scoped and correct (ADVICE r15 #2)") {
    import spark.implicits._
    val root = clusteredTable("sql-rgf-delete")
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      SnapshotSqlTable.lastMergeStats = None
      // `k % 7 = 3 AND k >= 4000` has no sources.Filter translation for
      // the modulo conjunct → canDeleteWhere never sees a full
      // translation → Spark falls back to the group-based row-level
      // DELETE (the previously-untested path ADVICE r15 named)
      spark.sql(s"DELETE FROM $t WHERE k % 7 = 3 AND k >= 4000")
      val (rewritten, total) = SnapshotSqlTable.lastMergeStats.get
      assert(rewritten < total,
        s"range-guarded delete must stay file-scoped: $rewritten of $total")
      val survivors = spark.sql(s"SELECT k FROM $t").as[Long].collect().toSet
      val expected = (0 until 5).flatMap(i =>
        (0 until 100).map(j => i * 1000L + j))
        .filterNot(k => k % 7 == 3 && k >= 4000).toSet
      assert(survivors == expected, "survivor set must match the oracle")
    } finally IndexStore.deleteRecursively(root)
  }

  test("insert-only MERGE with zero matched target files still inserts (ADVICE r16 high)") {
    import spark.implicits._
    val root = clusteredTable("sql-rgf-insonly", nFiles = 3)
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val beforeFiles = SnapshotStore.filesAt(spark, root, 1L)
      // the source holds ONLY new keys: runtime group filtering finds
      // zero matched target files, but WHEN NOT MATCHED THEN INSERT
      // must still land every source row — the old path reclaimed the
      // staging dir wholesale and silently dropped them
      Seq((500001L, "ins-a"), (500002L, "ins-b"))
        .toDF("k", "p").createOrReplaceTempView("rgf_ins_src")
      spark.sql(
        s"""MERGE INTO $t AS tgt USING rgf_ins_src AS src ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET p = src.p
           |WHEN NOT MATCHED THEN INSERT (k, p) VALUES (src.k, src.p)""".stripMargin)
      assert(SnapshotStore.headVersion(root).contains(2L),
        "an insert-only merge must publish a new version")
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() == 302L,
        "both source rows must insert")
      assert(spark.sql(s"SELECT p FROM $t WHERE k = 500001").as[String].head() == "ins-a")
      // every standing file carried by reference, none rewritten
      val afterFiles = SnapshotStore.filesAt(spark, root, 2L)
      assert(beforeFiles.forall(afterFiles.toSet),
        "zero matched files: all standing files must carry by reference")
    } finally IndexStore.deleteRecursively(root)
  }

  test("no-match row-level statement leaves the version standing") {
    val root = clusteredTable("sql-rgf-nomatch", nFiles = 2)
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      SnapshotSqlTable.lastMergeStats = None
      spark.sql(s"DELETE FROM $t WHERE k % 7 = 3 AND k >= 999999")
      assert(SnapshotStore.headVersion(root).contains(1L),
        s"a statement matching nothing must not publish a version " +
        s"(stats=${SnapshotSqlTable.lastMergeStats})")
    } finally IndexStore.deleteRecursively(root)
  }

  test("the _file-tagged scan keeps parquet pushdown and the columnar path (plan shape)") {
    import spark.implicits._
    val root = clusteredTable("sql-rgf-plan", nFiles = 3)
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val df = spark.sql(s"SELECT _file, k FROM $t WHERE k >= 1000 AND k < 1100")
      assert(df.count() == 100L)
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      assert(scans.size == 1, s"expected one scan, got ${scans.size}")
      val tagged = scans.head match {
        // the stream-capable face forwards batch reads verbatim —
        // unwrap to the tagging scan it delegates to
        case sc: StreamCapableScan => sc.delegateScan match {
          case tsc: TaggedSnapshotScan => tsc
          case other => fail(s"_file read must ride the tagged scan, got $other")
        }
        case tsc: TaggedSnapshotScan => tsc
        case other => fail(s"_file read must ride the tagged scan, got $other")
      }
      // the range predicate reached the STOCK parquet scan inside the
      // wrapper (pushdown delegated, not swallowed)
      val pq = tagged.delegateScan
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      assert(pq.pushedFilters.exists(_.toString.contains("GreaterThanOrEqual(k,1000")),
        s"range filter must push to parquet: ${pq.pushedFilters.mkString(", ")}")
      // the vectorized path survives the tag (ConstantColumnVector
      // append, not a row-by-row fallback): the plan still carries the
      // columnar-to-row boundary a columnar parquet scan produces
      assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
        "the tagged scan must stay columnar")
      // and a plain read (no _file) bypasses the tagging wrapper: only
      // the thin stream-capable face remains, whose toBatch IS the
      // stock parquet scan's own Batch (object-identical execution)
      val plain = spark.sql(s"SELECT k FROM $t WHERE k >= 1000 AND k < 1100")
      val plainScans = plain.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      val plainDelegate = plainScans.head match {
        case sc: StreamCapableScan => sc.delegateScan
        case other => other
      }
      assert(plainDelegate.isInstanceOf[
          org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan],
        s"plain reads must delegate to the stock scan object, got $plainDelegate")
    } finally IndexStore.deleteRecursively(root)
  }

  test("SELECT _file exposes per-row provenance; hidden from SELECT *") {
    import spark.implicits._
    val root = clusteredTable("sql-rgf-filecol", nFiles = 2)
    try {
      catalogOn()
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      assert(spark.sql(s"SELECT * FROM $t").columns.toSeq == Seq("k", "p"),
        "_file must stay hidden from star expansion")
      val byFile = spark.sql(s"SELECT _file, count(*) AS n FROM $t GROUP BY _file")
        .as[(String, Long)].collect().toMap
      assert(byFile.size == 2 && byFile.values.forall(_ == 100L),
        s"per-file counts wrong: $byFile")
      assert(byFile.keys.forall(f => f.startsWith("data/load") &&
        f.endsWith(".parquet")), s"_file must be root-relative: ${byFile.keys}")
      // provenance agrees with the manifest's file list
      assert(byFile.keySet == SnapshotStore.filesAt(spark, root, 1L).toSet)
    } finally IndexStore.deleteRecursively(root)
  }
}
