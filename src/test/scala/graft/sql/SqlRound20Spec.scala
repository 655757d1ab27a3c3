package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{IndexStore, SnapshotStore}

/** Round-20 SQL surfaces: the batch-addressed change feed
  * (`changes` namespace + VERSION AS OF '<v1>..<v2>'), partition-spec
  * evolution (`CALL system.set_partition_spec` + the evolved composed
  * read), the `_stream_epochs` commit-metadata ledger (replay
  * detection that survives rewrites — ADVICE r19 #2), and the
  * update-mode `toTable` contracts. */
class SqlRound20Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpRoot(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(tag).resolve("tbl")

  // ---- batch-addressed change feed -----------------------------------

  private def mergeFixture(tag: String): java.nio.file.Path = {
    import spark.implicits._
    val root = tmpRoot(tag)
    (1L to 9L).map(k => (k, s"v$k")).toDF("k", "p")
      .repartitionByRange(3, col("k")).sortWithinPartitions("k")
      .write.parquet(root.resolve("data/base").toString)
    SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
      statsCols = Seq("k")) // v1
    SnapshotStore.mergeCow(spark, root,
      Seq((2L, "V2", false), (5L, null.asInstanceOf[String], true),
        (10L, "ins10", false)).toDF("k", "p", "_delete"), "k") // v2
    root
  }

  test("changes batch: VERSION AS OF '1..2' equals changesBetween; the key defaults from the single envelope column and the option overrides") {
    import spark.implicits._
    val root = mergeFixture("chg-batch")
    try {
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.changes.`${root.toAbsolutePath.normalize}`"
      val got = spark.sql(s"SELECT * FROM $t VERSION AS OF '1..2'")
        .orderBy("change_type", "k")
        .select("change_type", "k", "p").as[(String, Long, String)]
        .collect().toSeq
      val want = SnapshotStore.changesBetween(spark, root, 1L, 2L, "k")
        .orderBy("change_type", "k")
        .select("change_type", "k", "p").as[(String, Long, String)]
        .collect().toSeq
      assert(got == want, s"batch addressing diverged:\n$got\nvs\n$want")
      assert(got.nonEmpty && got.exists(_._1 == "insert") &&
        got.exists(_._1 == "delete") && got.exists(_._1 == "update_preimage"))
      // the explicit `key` read option rides the relation options and
      // overrides the envelope default — same result by construction
      val viaOpt = spark.read.option("key", "k")
        .option("versionAsOf", "1..2").table(t)
        .orderBy("change_type", "k")
        .select("change_type", "k", "p").as[(String, Long, String)]
        .collect().toSeq
      assert(viaOpt == want, s"key-option addressing diverged: $viaOpt")
    } finally IndexStore.deleteRecursively(root.getParent)
  }

  test("changes batch refusals: a bare version pin names the range form; an inverted range refuses") {
    val root = mergeFixture("chg-refuse")
    try {
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.changes.`${root.toAbsolutePath.normalize}`"
      val bare = intercept[Exception](
        spark.sql(s"SELECT * FROM $t VERSION AS OF '2'").collect())
      assert(bare.getMessage != null && bare.getMessage.contains("RANGE"),
        s"bare version must name the range form: ${bare.getMessage}")
      val inv = intercept[Exception](
        spark.sql(s"SELECT * FROM $t VERSION AS OF '2..1'").collect())
      assert(inv.getMessage != null && inv.getMessage.contains("empty range"),
        s"inverted range must refuse: ${inv.getMessage}")
    } finally IndexStore.deleteRecursively(root.getParent)
  }

  // ---- partition-spec evolution --------------------------------------

  test("set_partition_spec: the flip is zero-rewrite, later inserts land under the new dirs, and the composed read serves both generations") {
    import spark.implicits._
    val root = tmpRoot("spec-evo")
    try {
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val rootStr = root.toAbsolutePath.normalize.toString
      val t = s"graft_lake.`$rootStr`"
      Seq((1L, "a", "d1", 1.0), (2L, "b", "d1", 2.0), (3L, "a", "d2", 3.0))
        .toDF("k", "g", "d", "v").createOrReplaceTempView("specevo_base")
      spark.sql(s"CREATE TABLE $t PARTITIONED BY (g) AS " +
        "SELECT k, d, v, g FROM specevo_base") // v1: spec (g)
      val v1Files = SnapshotStore.filesAt(spark, root,
        SnapshotStore.headVersion(root).get)
      spark.sql("CALL graft_lake.system.set_partition_spec(" +
        s"`table` => '$rootStr', cols => 'g,d')")
      // zero rewrite: the flip moved no files, committed no version
      assert(SnapshotStore.filesAt(spark, root,
        SnapshotStore.headVersion(root).get).toSet == v1Files.toSet)
      // reads BEFORE any new insert still compose (one old generation)
      assert(spark.sql(s"SELECT COUNT(*) FROM $t").head().getLong(0) == 3L)
      spark.sql(s"INSERT INTO $t VALUES (4, 'd2', 4.0, 'b'), (5, 'd3', 5.0, 'a')")
      val head = SnapshotStore.headVersion(root).get
      val fresh = SnapshotStore.filesAt(spark, root, head)
        .filterNot(v1Files.toSet)
      assert(fresh.nonEmpty && fresh.forall(f =>
          SnapshotStore.specOfFile(f) == Seq("g", "d")),
        s"new files must land under the new spec dirs: $fresh")
      assert(v1Files.filterNot(SnapshotCatalog.isSeedFile).forall(f =>
        SnapshotStore.specOfFile(f) == Seq("g")))
      // the composed read: both generations, dir values recovered on each
      val all = spark.sql(s"SELECT k, g, d, v FROM $t ORDER BY k")
        .as[(Long, String, String, Double)].collect().toSeq
      assert(all == Seq((1L, "a", "d1", 1.0), (2L, "b", "d1", 2.0),
        (3L, "a", "d2", 3.0), (4L, "b", "d2", 4.0), (5L, "a", "d3", 5.0)),
        s"composed read diverged: $all")
      // a filter on the NEW spec column still answers across generations
      assert(spark.sql(s"SELECT COUNT(*) FROM $t WHERE d = 'd2'")
        .head().getLong(0) == 2L)
      // refusals on the mixed table: overwrite + row-level rewrites
      val ow = intercept[Exception](spark.sql(
        s"INSERT OVERWRITE $t VALUES (9, 'd9', 9.0, 'a')"))
      assert(ow.getMessage.contains("partition-spec generations"))
      val del = intercept[Exception](spark.sql(
        s"DELETE FROM $t WHERE k = 1"))
      assert(del.getMessage != null &&
        del.getMessage.contains("partition-spec generations"),
        s"row-level DELETE must refuse on the mixed table: ${del.getMessage}")
    } finally IndexStore.deleteRecursively(root.getParent)
  }

  test("set_partition_spec guards: flat tables, empty specs, and non-declared columns refuse") {
    val root = tmpRoot("spec-guard")
    try {
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val rootStr = root.toAbsolutePath.normalize.toString
      spark.sql(s"CREATE TABLE graft_lake.`$rootStr` (k BIGINT, g STRING)")
      val flat = intercept[Exception](spark.sql(
        s"CALL graft_lake.system.set_partition_spec(`table` => '$rootStr', cols => 'g')"))
      assert(flat.getMessage.contains("FLAT"))
      val root2 = tmpRoot("spec-guard2")
      val root2Str = root2.toAbsolutePath.normalize.toString
      spark.sql(s"CREATE TABLE graft_lake.`$root2Str` (k BIGINT, g STRING) " +
        "PARTITIONED BY (g)")
      val bad = intercept[Exception](spark.sql(
        s"CALL graft_lake.system.set_partition_spec(`table` => '$root2Str', cols => 'nope')"))
      assert(bad.getMessage.contains("not a declared column"))
      IndexStore.deleteRecursively(root2.getParent)
    } finally IndexStore.deleteRecursively(root.getParent)
  }

  // ---- the _stream_epochs ledger -------------------------------------

  test("stream-epoch ledger: stamps max-merge per query token, carries through compaction and folds (ADVICE r19 #2 — replay detection survives rewrites)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("epoch-ledger")
    try {
      (1L to 6L).map(k => (k, s"v$k", 0L)).toDF("k", "p", "ord")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k")
        .write.parquet(root.resolve("data/base").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k")) // v1: no ledger
      val v1 = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.streamEpochOf(root, v1, "qA").isEmpty)
      // epoch 0 of query A stamps with its content, atomically
      Seq((7L, "v7", 0L)).toDF("k", "p", "ord")
        .coalesce(1).write.parquet(root.resolve("data/e0").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/e0/")),
        streamEpoch = Some("qA" -> 0L))
      val v2 = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.streamEpochOf(root, v2, "qA").contains(0L))
      assert(SnapshotStore.streamEpochOf(root, v2, "qB").isEmpty)
      // an unrelated commit INHERITS the ledger verbatim
      SnapshotStore.compact(spark, root, numFiles = 1, sortCol = Some("k"))
      val v3 = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.streamEpochOf(root, v3, "qA").contains(0L),
        "compaction must carry the epoch ledger — file names are gone, " +
        "the metadata survives")
      // the high-water only moves FORWARD (a replayed lower epoch
      // max-merges to the standing mark)
      Seq((8L, "v8", 0L)).toDF("k", "p", "ord")
        .coalesce(1).write.parquet(root.resolve("data/e1").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/e1/")),
        streamEpoch = Some("qA" -> 5L))
      Seq((9L, "v9", 0L)).toDF("k", "p", "ord")
        .coalesce(1).write.parquet(root.resolve("data/e2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/e2/")),
        streamEpoch = Some("qA" -> 3L))
      val v5 = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.streamEpochOf(root, v5, "qA").contains(5L),
        "a lower stamp must not move the high-water backwards")
      // a second query's token is independent; CDC deltas stamp too
      SnapshotStore.commitCdcDelta(spark, root,
        Seq((2L, "V2", 1L)).toDF("k", "p", "ord"), "k",
        streamEpoch = Some("qB" -> 7L))
      val v6 = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.streamEpochOf(root, v6, "qA").contains(5L))
      assert(SnapshotStore.streamEpochOf(root, v6, "qB").contains(7L))
      // ...and the fold carries both
      SnapshotStore.foldCdc(spark, root, "k", Seq("ord"), 1, statsCols = Seq("k"))
      val v7 = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.streamEpochOf(root, v7, "qA").contains(5L))
      assert(SnapshotStore.streamEpochOf(root, v7, "qB").contains(7L))
    } finally IndexStore.deleteRecursively(root)
  }

  test("update-mode toTable happy path: per-epoch CDC-delta merges converge to the latest aggregate; a no-data restart re-lands nothing") {
    import spark.implicits._
    val root = tmpRoot("upd-happy")
    val ckpt = java.nio.file.Files.createTempDirectory("upd-happy-ckpt")
    try {
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val rootStr = root.toAbsolutePath.normalize.toString
      val t = s"graft_lake.`$rootStr`"
      spark.sql(s"CREATE TABLE $t (g STRING, n BIGINT)")
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](
        org.apache.spark.sql.Encoders.STRING, spark.sqlContext)
      def start() = mem.toDF().toDF("g")
        .groupBy("g").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .option("mergeKeys", "g")
        .toTable(t)
      val q = start()
      try {
        mem.addData("a", "b", "a")
        q.processAllAvailable()
        mem.addData("a", "c")
        q.processAllAvailable()
      } finally q.stop()
      // a restart with nothing new must not re-merge (the epoch ledger)
      val vBefore = SnapshotStore.headVersion(root).get
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      assert(SnapshotStore.headVersion(root).contains(vBefore),
        "a no-data restart must not commit")
      // resolve pending deltas, then plain SQL serves the final state
      spark.sql("CALL graft_lake.system.fold_cdc(" +
        s"`table` => '$rootStr', key => 'g', num_files => 1)")
      val got = spark.sql(s"SELECT g, n FROM $t ORDER BY g")
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("a", 3L), ("b", 1L), ("c", 1L)),
        s"drained update-mode state diverged: $got")
    } finally {
      IndexStore.deleteRecursively(root.getParent)
      IndexStore.deleteRecursively(ckpt)
    }
  }

  // ---- update-mode toTable contracts ---------------------------------

  test("update-mode toTable contracts: update without mergeKeys keeps Spark's loud refusal; mergeKeys on a partitioned table refuses; composite keys refuse") {
    import spark.implicits._
    val root = tmpRoot("upd-contract")
    val ckpt = java.nio.file.Files.createTempDirectory("upd-contract-ckpt")
    val src = java.nio.file.Files.createTempDirectory("upd-contract-src")
    try {
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val rootStr = root.toAbsolutePath.normalize.toString
      spark.sql(s"CREATE TABLE graft_lake.`$rootStr` (g STRING, n BIGINT)")
      Seq(("a", 1L), ("b", 2L)).toDF("g", "n")
        .write.parquet(src.resolve("in").toString)
      def agg() = spark.readStream.schema("g STRING, n BIGINT")
        .parquet(src.resolve("in").toString)
        .groupBy("g").agg(count(lit(1)).as("n"))
      // update mode WITHOUT mergeKeys: Spark's own gate fires (the
      // builder only claims SupportsStreamingUpdateAsAppend when the
      // option names the key)
      val noKeys = intercept[Exception] {
        val q = agg().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.resolve("c1").toString)
          .toTable(s"graft_lake.`$rootStr`")
        try q.processAllAvailable() finally q.stop()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(noKeys).exists(m => m.toLowerCase.contains("update")),
        s"update-without-mergeKeys must surface Spark's mode refusal: ${chain(noKeys)}")
      // composite mergeKeys refuse loudly
      val multi = intercept[Exception] {
        val q = agg().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.resolve("c2").toString)
          .option("mergeKeys", "g,n")
          .toTable(s"graft_lake.`$rootStr`")
        try q.processAllAvailable() finally q.stop()
      }
      assert(chain(multi).exists(_.contains("ONE key column")),
        s"composite mergeKeys must refuse: ${chain(multi)}")
      // mergeKeys into a PARTITIONED table refuses (flat-table contract)
      val proot = tmpRoot("upd-part")
      val prootStr = proot.toAbsolutePath.normalize.toString
      spark.sql(s"CREATE TABLE graft_lake.`$prootStr` (n BIGINT, g STRING) " +
        "PARTITIONED BY (g)")
      val part = intercept[Exception] {
        val q = agg().select(col("n"), col("g")).writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.resolve("c3").toString)
          .option("mergeKeys", "g")
          .toTable(s"graft_lake.`$prootStr`")
        try q.processAllAvailable() finally q.stop()
      }
      assert(chain(part).exists(_.contains("PARTITIONED")),
        s"mergeKeys on a partitioned table must refuse: ${chain(part)}")
      IndexStore.deleteRecursively(proot.getParent)
    } finally {
      IndexStore.deleteRecursively(root.getParent)
      IndexStore.deleteRecursively(ckpt)
      IndexStore.deleteRecursively(src)
    }
  }

  // ---- abort-after-commit (the q28q 32-core flake, VERDICT r20 #1) ----

  test("streaming-write abort after a landed commit is a no-op; abort of an uncommitted epoch still cleans its staging") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val root = tmpRoot("abort-commit")
    try {
      // base table: one committed version, no ledger yet
      Seq((1L, "a")).toDF("k", "p").coalesce(1)
        .write.parquet(root.resolve("data/base").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("p", StringType)))
      val qid = "deadbeef-0000-0000-0000-000000000000"
      val w = new SnapshotStreamingWrite(root, "t", qid, schema, schema, Nil)
      def stage(name: String): String = {
        val rel = s"data/stream_deadbeef0000_e0/$name.parquet"
        Seq((2L, "b")).toDF("k", "p").coalesce(1)
          .write.mode("overwrite").parquet(root.resolve("stage-tmp").toString)
        val part = java.nio.file.Files.list(root.resolve("stage-tmp")).toArray
          .map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.getFileName.toString.endsWith(".parquet")).head
        java.nio.file.Files.createDirectories(root.resolve(rel).getParent)
        java.nio.file.Files.move(part, root.resolve(rel))
        rel
      }
      val rel0 = stage("f0")
      val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
        Array(EpochFilesMessage(Seq(rel0)))
      w.commit(0L, msgs) // epoch 0 lands: manifest references rel0
      // stop() mid-batch makes Spark call abort on the SAME epoch after
      // the sink commit already landed — the file must survive
      w.abort(0L, msgs)
      assert(java.nio.file.Files.exists(root.resolve(rel0)),
        "abort after a landed commit deleted a manifest-referenced file")
      val head = SnapshotStore.headVersion(root).get
      assert(SnapshotStore.filesAt(spark, root, head).contains(rel0))
      // the table still reads (the restart-time schema probe path)
      assert(spark.read.parquet(
        SnapshotStore.filesAt(spark, root, head)
          .map(f => root.resolve(f).toString): _*).count() == 2L)
      // an epoch that never committed still cleans its staging on abort
      val rel1 = stage("f1")
      val msgs1: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
        Array(EpochFilesMessage(Seq(
          rel1.replace("_e0/", "_e1/"))))
      java.nio.file.Files.createDirectories(
        root.resolve(rel1.replace("_e0/", "_e1/")).getParent)
      java.nio.file.Files.move(root.resolve(rel1),
        root.resolve(rel1.replace("_e0/", "_e1/")))
      w.abort(1L, msgs1)
      assert(!java.nio.file.Files.exists(
        root.resolve(rel1.replace("_e0/", "_e1/"))),
        "abort of an uncommitted epoch must delete its staged files")
    } finally IndexStore.deleteRecursively(root.getParent)
  }
}
