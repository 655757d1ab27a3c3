package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The ADVICE-r14 closure set: manifest STAT-SHAPE discipline (one
  * column shape per version, even across statsCols-narrowing commits),
  * DECLARED-SCHEMA evolution (a widened table must not drop later
  * additive columns; the SQL catalog must read under the same schema
  * rules as [[SnapshotStore.readAt]]), and the gcParts-vs-in-flight-
  * commit race (a maintenance op must never delete a part a racing
  * commit is about to reference). */
class SnapshotShapeEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def partsOf(root: java.nio.file.Path, v: Long): Seq[String] =
    SnapshotStore.readList(root, v).getOrElse(Seq.empty).map(_.mpath)

  private def partCols(root: java.nio.file.Path, mpath: String): Set[String] =
    spark.read.parquet(root.resolve(mpath).toString).columns.toSet

  test("statsCols-narrowing commit keeps ONE manifest shape per version; envelope pruning stays null-free (ADVICE r14 #2)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-narrow")
    try {
      // three loads with disjoint k ranges so envelope pruning is checkable
      Seq((1L, 10L), (2L, 20L)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k", "m")) // v1: wide shape (k + m envelopes)
      Seq((100L, 1000L), (200L, 2000L)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v2: 2 wide parts
      assert(partsOf(root, 2L).size == 2)
      assert(partsOf(root, 2L).forall(p => partCols(root, p) ==
        Set("file", "n_rows", "min_k", "max_k", "min_m", "max_m")))
      // the narrowing commit: statsCols strict subset of the prior shape.
      // Pre-fix, the clean v2 parts carried verbatim WITH their m
      // envelopes next to a narrow fresh part — a mixed-shape version
      Seq((5000L, 9L)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l3").toString)
      val v3 = SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k"))
      val expect = Set("file", "n_rows", "min_k", "max_k")
      assert(partsOf(root, v3).nonEmpty)
      partsOf(root, v3).foreach { p =>
        assert(partCols(root, p) == expect,
          s"part $p shape ${partCols(root, p)} — version must hold ONE shape")
      }
      // every file's envelope is populated — pruning on min_k/max_k sees
      // no null rows and drops exactly the non-intersecting files
      val m = SnapshotStore.manifest(spark, root, v3)
      assert(m.where(col("min_k").isNull).count() == 0)
      val hit = SnapshotStore.filesAtWhere(spark, root, v3,
        col("min_k") <= lit(20L) && col("max_k") >= lit(1L))
      assert(hit == SnapshotStore.dataFiles(root).filter(_.startsWith("data/l1/")),
        s"pruning returned $hit")
      assert(SnapshotStore.countAt(spark, root) == 5L)
    } finally IndexStore.deleteRecursively(root)
  }

  test("append onto a narrowed table keeps the narrow shape through the fast path") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-append")
    try {
      Seq((1L, 10L)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k", "m"))
      // narrow at v2, then a plain append at v3 must inherit the NARROW
      // shape (pre-fix the per-head-footer probe let the shapes drift)
      Seq((50L, 77L)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k"))
      Seq((90L, 99L)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l3").toString)
      val v3 = SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l3/")))
      assert(SnapshotStore.lastCommitStats.exists(_.appendFastPath),
        "same-shape append must stay on the O(delta) fast path")
      partsOf(root, v3).foreach { p =>
        assert(partCols(root, p) == Set("file", "n_rows", "min_k", "max_k"))
      }
    } finally IndexStore.deleteRecursively(root)
  }

  test("widened table + later add-column commit: the declared schema EXTENDS, reads keep both (ADVICE r14 #3); SQL path reads identically (ADVICE r14 #1)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("shape-widen-add")
    try {
      Seq((1L, 10), (2L, 20)).toDF("k", "m")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      SnapshotStore.widenColumn(spark, root, "m", "bigint")            // v2
      // the additive-evolution commit the widenColumn docs point to:
      // fresh files carry a NEW column x (m still int32 — upcasts)
      Seq((3L, 30, "late")).toDF("k", "m", "x")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      val v3 = SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/")))
      // API read: widening held AND the added column surfaced
      val head = SnapshotStore.readAt(spark, root, Some(v3), inferPartitions = false)
      assert(head.schema("m").dataType == LongType)
      assert(head.schema.fieldNames.contains("x"),
        "add-column after widening was silently dropped from reads")
      assert(head.select("k", "m", "x").as[(Long, Long, Option[String])]
        .collect().sortBy(_._1).toSeq ==
        Seq((1L, 10L, None), (2L, 20L, None), (3L, 30L, Some("late"))))
      // SQL path: same schema rules as readAt — widened type AND late column
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val sql = spark.sql(s"SELECT k, m, x FROM $t ORDER BY k")
      assert(sql.schema("m").dataType == LongType,
        "SQL path must apply the declared (widened) schema")
      assert(sql.as[(Long, Long, Option[String])].collect().toSeq ==
        Seq((1L, 10L, None), (2L, 20L, None), (3L, 30L, Some("late"))))
      // version-pinned SQL below the widening keeps the original INT
      val v1 = spark.sql(s"SELECT k, m FROM $t VERSION AS OF 1")
      assert(v1.schema("m").dataType == IntegerType)
    } finally IndexStore.deleteRecursively(root)
  }

  test("SQL path on an UNDECLARED (legacy) evolved table merges footers instead of dropping late columns (ADVICE r14 #1)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-sql-merge")
    try {
      Seq((1L, "a")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
      Seq((2L, "b", 7.5)).toDF("k", "p", "score")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/")))
      // simulate a PRE-declaration-at-birth table (ADVICE r15): strip
      // the stamped declarations so the mergeSchema fallback is what
      // the SQL path exercises
      (1L to 2L).foreach(v => java.nio.file.Files.deleteIfExists(
        root.resolve(s"_snapshots/v=$v/_schema.ddl")))
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val out = spark.sql(s"SELECT k, p, score FROM $t ORDER BY k")
        .as[(Long, String, Option[Double])].collect().toSeq
      assert(out == Seq((1L, "a", None), (2L, "b", Some(7.5))),
        s"late column lost on the SQL path: $out")
    } finally IndexStore.deleteRecursively(root)
  }

  test("a flat table's FIRST commit stamps a declared schema; appends extend it; internal _cols never graduate (ADVICE r15)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("shape-birth-ddl")
    try {
      Seq((1L, "a")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
      // birth declaration: HEAD loads (the SQL catalog above all)
      // resolve schema from O(1) metadata, not an all-footers job
      assert(SnapshotStore.declaredSchema(root, 1L).exists(
        d => d.contains("k") && d.contains("p")),
        "flat first commit must stamp the declared schema")
      // additive evolution still extends the declaration (r14 semantics)
      Seq((2L, "b", 7.5)).toDF("k", "p", "score")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/")))
      assert(SnapshotStore.declaredSchema(root, 2L).exists(_.contains("score")))
      // a CDC delta's _seq marker must NOT graduate into the logical
      // schema — post-fold plain reads would carry a permanent null col
      val croot = java.nio.file.Files.createTempDirectory("shape-birth-cdc")
      try {
        Seq((1L, "a"), (2L, "b")).toDF("k", "p")
          .coalesce(1).write.parquet(croot.resolve("data/base").toString)
        SnapshotStore.commit(spark, croot, SnapshotStore.dataFiles(croot),
          statsCols = Seq("k"))
        SnapshotStore.commitCdcDelta(spark, croot,
          Seq((1L, "a2")).toDF("k", "p"), "k")
        assert(SnapshotStore.declaredSchema(croot, 2L).forall(!_.contains("_seq")),
          "internal _seq leaked into the declared schema")
        SnapshotStore.foldCdc(spark, croot, "k", Seq.empty, numFiles = 1)
        val cols = SnapshotStore.readAt(spark, croot, inferPartitions = false)
          .columns.toSeq
        assert(cols == Seq("k", "p"),
          s"post-fold plain read must carry data columns only: $cols")
      } finally IndexStore.deleteRecursively(croot)
      // a PARTITIONED load's first commit must NOT stamp (the declared
      // schema would replace partition-dir recovery wholesale)
      val proot = java.nio.file.Files.createTempDirectory("shape-birth-part")
      try {
        Seq((1L, "x", "a"), (2L, "y", "b")).toDF("k", "p", "side")
          .write.partitionBy("side").parquet(proot.resolve("data").toString)
        SnapshotStore.commit(spark, proot, SnapshotStore.dataFiles(proot))
        assert(SnapshotStore.declaredSchema(proot, 1L).isEmpty,
          "partitioned layouts must stay undeclared (dir recovery)")
      } finally IndexStore.deleteRecursively(proot)
    } finally IndexStore.deleteRecursively(root)
  }

  test("gcParts spares in-flight parts and reaps them once deregistered (ADVICE r14 #4)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gc-inflight")
    try {
      Seq((1L, "a")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      Seq((2L, "b")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v2
      // two unreferenced parts on disk: one REGISTERED (an in-flight
      // commit's write), one not (a publish-race loser's leftover)
      val mdir = root.resolve("_snapshots/manifests")
      val inflight = "m_test_inflight"
      val orphan = "m_test_orphan"
      Seq((0L, "x")).toDF("k", "p")
        .coalesce(1).write.parquet(mdir.resolve(inflight).toString)
      Seq((0L, "y")).toDF("k", "p")
        .coalesce(1).write.parquet(mdir.resolve(orphan).toString)
      SnapshotStore.inFlightFor(root).add(s"_snapshots/manifests/$inflight")
      SnapshotStore.vacuum(spark, root, retain = 1) // expires v1 → gc runs
      assert(!java.nio.file.Files.exists(mdir.resolve(orphan)),
        "unreferenced orphan part must be reaped")
      assert(java.nio.file.Files.exists(mdir.resolve(inflight)),
        "in-flight part was deleted under a racing maintenance op")
      // once the commit completes (deregisters), the next gc reaps it
      SnapshotStore.inFlightFor(root).remove(s"_snapshots/manifests/$inflight")
      Seq((3L, "c")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l3").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l3/"))) // v3
      SnapshotStore.vacuum(spark, root, retain = 1) // expires v2 → gc runs
      assert(!java.nio.file.Files.exists(mdir.resolve(inflight)))
    } finally IndexStore.deleteRecursively(root)
  }

  test("appends racing an in-loop vacuum never publish a list whose parts are gone (ADVICE r14 #4, threaded)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("gc-race")
    try {
      Seq((0L, "base")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l0").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      val n = 8
      val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val writer = new Thread(() => {
        try {
          (1 to n).foreach { i =>
            Seq((i.toLong, s"row$i")).toDF("k", "p")
              .coalesce(1).write.parquet(root.resolve(s"data/l$i").toString)
            SnapshotStore.commitAppend(spark, root,
              SnapshotStore.dataFiles(root).filter(_.startsWith(s"data/l$i/")))
          }
        } catch { case t: Throwable => failed.set(t) }
      })
      writer.start()
      while (writer.isAlive) SnapshotStore.vacuum(spark, root, retain = 2)
      writer.join()
      assert(failed.get() == null, s"writer failed: ${failed.get()}")
      // the corruption symptom pre-fix: a published list referencing a
      // gc-deleted part directory → FileNotFound on read. Every
      // surviving version must be fully readable.
      SnapshotStore.manifestVersions(root).foreach { v =>
        SnapshotStore.readList(root, v).getOrElse(Seq.empty).foreach { r =>
          assert(java.nio.file.Files.exists(root.resolve(r.mpath)),
            s"v=$v references reaped part ${r.mpath}")
        }
      }
      assert(SnapshotStore.readAt(spark, root).count() == (n + 1).toLong)
    } finally IndexStore.deleteRecursively(root)
  }

  test("TIMESTAMP AS OF boundary semantics: exact instant, between commits, before first, unstamped history (VERDICT r14 #3)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ts-travel")
    try {
      val t1 = 1700000000000L
      val t2 = t1 + 60000L
      Seq((1L, "a")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.setClock(root, () => t1)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1 @ t1
      Seq((2L, "b")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.setClock(root, () => t2)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v2 @ t2
      assert(SnapshotStore.commitTimeOf(root, 1L).contains(t1))
      assert(SnapshotStore.commitTimeOf(root, 2L).contains(t2))
      // exact commit instant → that version; between → the earlier;
      // at-or-after the last → HEAD
      assert(SnapshotStore.versionAtTimestamp(root, t1) == 1L)
      assert(SnapshotStore.versionAtTimestamp(root, t1 + 30000L) == 1L)
      assert(SnapshotStore.versionAtTimestamp(root, t2) == 2L)
      assert(SnapshotStore.versionAtTimestamp(root, t2 + 999999L) == 2L)
      assert(SnapshotStore.readAtTimestamp(spark, root, t1 + 1L,
        inferPartitions = false).count() == 1L)
      // before the first stamped commit: refused, named
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.versionAtTimestamp(root, t1 - 1L)
      }
      assert(e.getMessage.contains("predates"), e.getMessage)
      // SQL surface: micros→millis conversion + the same boundary rule
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      val between = java.time.Instant.ofEpochMilli(t1 + 30000L)
        .toString.replace("T", " ").stripSuffix("Z")
      assert(spark.sql(s"SELECT k FROM $t TIMESTAMP AS OF '$between'")
        .as[Long].collect().toSeq == Seq(1L))
      // a history with NO stamps (pre-upgrade table): refused, named
      val old = java.nio.file.Files.createTempDirectory("ts-unstamped")
      try {
        Seq((1L, "x")).toDF("k", "p")
          .coalesce(1).write.parquet(old.resolve("data/l1").toString)
        SnapshotStore.commit(spark, old, SnapshotStore.dataFiles(old))
        java.nio.file.Files.delete(
          old.resolve("_snapshots/v=1/_commit_ms")) // simulate pre-upgrade
        val u = intercept[IllegalArgumentException] {
          SnapshotStore.versionAtTimestamp(old, t1)
        }
        assert(u.getMessage.contains("no version carries a commit instant"))
      } finally IndexStore.deleteRecursively(old)
    } finally {
      SnapshotStore.clearClock(root)
      IndexStore.deleteRecursively(root)
    }
  }

  test("SQL INSERT INTO lands through commitAppend: VALUES form, CAS convergence with an API writer, refusals (VERDICT r14 #5)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sql-insert")
    try {
      Seq((1L, "a")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      // VALUES form: one O(delta) append commit, new version readable
      spark.sql(s"INSERT INTO $t VALUES (2, 'b'), (3, 'c')")
      assert(SnapshotStore.headVersion(root).contains(2L))
      assert(SnapshotStore.lastCommitStats.exists(s =>
        s.appendFastPath && s.version == 2L),
        "SQL insert must ride the O(delta) append fast path")
      assert(spark.sql(s"SELECT k FROM $t ORDER BY k").as[Long].collect().toSeq ==
        Seq(1L, 2L, 3L))
      // CAS convergence: a SQL insert racing an API append — both land,
      // neither overwrites the other (the rebase discipline)
      val apiErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val api = new Thread(() => {
        try {
          Seq((100L, "api")).toDF("k", "p")
            .coalesce(1).write.parquet(root.resolve("data/l-api").toString)
          SnapshotStore.commitAppend(spark, root,
            SnapshotStore.dataFiles(root).filter(_.startsWith("data/l-api/")))
        } catch { case x: Throwable => apiErr.set(x) }
      })
      api.start()
      spark.sql(s"INSERT INTO $t VALUES (200, 'sql')")
      api.join()
      assert(apiErr.get() == null, s"API writer failed: ${apiErr.get()}")
      assert(spark.sql(s"SELECT k FROM $t ORDER BY k").as[Long].collect().toSeq ==
        Seq(1L, 2L, 3L, 100L, 200L))
      // refusal: INSERT OVERWRITE on a FLAT table — the TRUNCATE
      // capability admits the statement (it is what enables dynamic
      // partition overwrite on PARTITIONED tables, VERDICT r16 #4),
      // and the write path then refuses the flat-table truncate
      // (content replacement is compact/merge territory)
      val o = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE $t VALUES (9, 'x')")
      }
      assert(o.getMessage.contains("INSERT OVERWRITE on a FLAT table refused"),
        s"unexpected: ${o.getMessage}")
    } finally IndexStore.deleteRecursively(root)
  }

  test("partition evolution: pruning engages on each side's OWN spec, reads compose over common columns (VERDICT r14 #7)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("spec-evo")
    try {
      // v1: spec = (t) — two type dirs, one file each
      Seq((1L, "a", "x1"), (2L, "a", "x2")).toDF("k", "t", "p")
        .coalesce(1).write.partitionBy("t")
        .parquet(root.resolve("data/load1").toString)
      Seq((3L, "b", "x3")).toDF("k", "t", "p")
        .coalesce(1).write.mode("append").partitionBy("t")
        .parquet(root.resolve("data/load1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k")) // v1
      // v2: spec EVOLVES to (t, g) — old files untouched
      Seq((10L, "a", "g1", "y1"), (11L, "a", "g2", "y2"), (12L, "b", "g1", "y3"))
        .toDF("k", "t", "g", "p")
        .coalesce(1).write.partitionBy("t", "g")
        .parquet(root.resolve("data/load2").toString)
      val v2 = SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/load2/")))
      val all = SnapshotStore.filesAt(spark, root, v2)
      assert(all.exists(f => SnapshotStore.specOfFile(f) == Seq("t")))
      assert(all.exists(f => SnapshotStore.specOfFile(f) == Seq("t", "g")))
      // t-pruning drops BOTH generations' t=b dirs; g-pruning drops
      // only new-spec files (old files can't be proven dead by g)
      val pruned = SnapshotStore.filesAtWherePartitioned(spark, root, v2,
        Seq("t" -> ((v: org.apache.spark.sql.Column) => v === "a"),
            "g" -> ((v: org.apache.spark.sql.Column) => v === "g1")))
      assert(pruned.forall(_.contains("/t=a/")), s"t=b leaked: $pruned")
      assert(pruned.count(_.contains("/g=")) == 1 &&
        pruned.exists(_.contains("/g=g1/")), s"g pruning wrong: $pruned")
      assert(pruned.exists(f => SnapshotStore.specOfFile(f) == Seq("t")),
        "old-spec t=a file must survive the g predicate it cannot encode")
      // composition: g is storage-only (hidden), t and data cols logical
      val composed = SnapshotStore.readFilesEvolved(spark, root, all)
      assert(composed.columns.toSet == Set("k", "p", "t"), composed.columns.mkString(","))
      assert(composed.as[(Long, String, String)].collect().map(_._1).sorted.toSeq ==
        Seq(1L, 2L, 3L, 10L, 11L, 12L))
      // pruned read + residual = exact surviving rows: the old-spec
      // t=a file (1, 2) + the new-spec t=a/g=g1 file (10); 11 lives in
      // g=g2 (g-pruned), 3 and 12 in t=b (t-pruned on both specs)
      val rows = SnapshotStore.readFilesEvolved(spark, root, pruned)
        .where(col("t") === "a").select("k").as[Long].collect().sorted.toSeq
      assert(rows == Seq(1L, 2L, 10L), s"pruned+residual rows: $rows")
    } finally IndexStore.deleteRecursively(root)
  }

  test("SQL DELETE FROM is a file-scoped COW rewrite: untouched files carry by reference, NULL-predicate rows survive") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sql-delete")
    try {
      // two loads with disjoint k ranges — only one should be touched
      Seq((1L, Some("a")), (2L, None), (3L, Some("c"))).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
      Seq((100L, Some("z"))).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/"))) // v2
      val l2File = SnapshotStore.filesAt(spark, root, 2L).filter(_.startsWith("data/l2/"))
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      // p = 'a' matches k=1 only; k=2 has p NULL — the predicate is
      // NULL there, and SQL DELETE must keep NULL-predicate rows
      spark.sql(s"DELETE FROM $t WHERE p = 'a'")
      assert(SnapshotStore.headVersion(root).contains(3L))
      assert(spark.sql(s"SELECT k FROM $t ORDER BY k").as[Long].collect().toSeq ==
        Seq(2L, 3L, 100L), "k=1 deleted; NULL-predicate k=2 must survive")
      // file-scoped: the untouched l2 file is carried BYTE-IDENTICAL
      // (same relative path) into the new version
      val v3Files = SnapshotStore.filesAt(spark, root, 3L)
      assert(l2File.forall(v3Files.contains),
        s"untouched file must carry by reference: $v3Files")
      assert(!v3Files.exists(_.startsWith("data/l1/")),
        "the touched file must be superseded by the rewrite")
      // a no-match delete leaves the version untouched
      spark.sql(s"DELETE FROM $t WHERE p = 'no-such-value'")
      assert(SnapshotStore.headVersion(root).contains(3L), "no-op delete must not commit")
      // pinned reader below the delete still sees the deleted row
      assert(SnapshotStore.readAt(spark, root, Some(2L), inferPartitions = false)
        .count() == 4L)
    } finally IndexStore.deleteRecursively(root)
  }

  test("SQL DELETE's probe prunes candidate files against manifest envelopes before opening a footer") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sql-delete-env")
    try {
      // three k-ranged loads with stamped k envelopes
      Seq((1L, "a"), (5L, "b")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root),
        statsCols = Seq("k"))
      Seq((100L, "c"), (150L, "d")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l2").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l2/")))
      Seq((1000L, "e")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l3").toString)
      SnapshotStore.commitAppend(spark, root,
        SnapshotStore.dataFiles(root).filter(_.startsWith("data/l3/")))
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      graft.sql.SnapshotSqlTable.lastDeleteStats = None
      spark.sql(s"DELETE FROM $t WHERE k >= 100 AND k < 200")
      val (cand, total) = graft.sql.SnapshotSqlTable.lastDeleteStats.getOrElse(
        fail("delete planning stamp missing"))
      assert(total == 3 && cand == 1,
        s"envelope pruning must pass exactly the [100,150] file to the probe: $cand/$total")
      assert(spark.sql(s"SELECT k FROM $t ORDER BY k").as[Long].collect().toSeq ==
        Seq(1L, 5L, 1000L))
    } finally IndexStore.deleteRecursively(root)
  }

  test("SQL MERGE INTO and UPDATE run as CAS-pinned COW replacements (group-based row-level ops)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sql-merge")
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      Seq((2L, "B", "upd"), (3L, "", "del"), (9L, "z", "ins"))
        .toDF("k", "p", "op").createOrReplaceTempView("merge_src")
      spark.sql(
        s"""MERGE INTO $t AS tgt USING merge_src AS src ON tgt.k = src.k
           |WHEN MATCHED AND src.op = 'del' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET p = src.p
           |WHEN NOT MATCHED THEN INSERT (k, p) VALUES (src.k, src.p)
           |""".stripMargin)
      assert(SnapshotStore.headVersion(root).contains(2L), "merge commits ONE version")
      assert(spark.sql(s"SELECT k, p FROM $t ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "B"), (9L, "z")),
        "matched-update, matched-delete, not-matched-insert")
      // UPDATE statement rides the same machinery
      spark.sql(s"UPDATE $t SET p = upper(p) WHERE k = 1")
      assert(spark.sql(s"SELECT k, p FROM $t ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "A"), (2L, "B"), (9L, "z")))
      // pinned time travel still sees the pre-merge state
      assert(spark.sql(s"SELECT k, p FROM $t VERSION AS OF 1 ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally IndexStore.deleteRecursively(root)
  }

  test("SQL MERGE racing a concurrent append dies with a clean CME — stale COW replacements never last-wins") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sql-merge-race")
    try {
      Seq((1L, "a")).toDF("k", "p")
        .coalesce(1).write.parquet(root.resolve("data/l1").toString)
      SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root)) // v1
      spark.conf.set("spark.sql.catalog.graft_lake", "graft.sql.SnapshotCatalog")
      val t = s"graft_lake.`${root.toAbsolutePath.normalize}`"
      Seq((1L, "A")).toDF("k", "p").createOrReplaceTempView("race_src")
      // inject a competing append inside the merge's OWN commit attempt
      // (after base resolution, before publish) — deterministic, no
      // thread timing
      val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
      val saved = SnapshotStore.commitAttemptHook
      SnapshotStore.commitAttemptHook = (r, prev) => {
        if (r == root && prev.contains(1L) && injected.compareAndSet(false, true)) {
          Seq((50L, "raced")).toDF("k", "p")
            .coalesce(1).write.parquet(root.resolve("data/l-race").toString)
          SnapshotStore.commitAppend(spark, root,
            SnapshotStore.dataFiles(root).filter(_.startsWith("data/l-race/"))) // v2
        }
      }
      try {
        val e = intercept[Exception] {
          spark.sql(
            s"""MERGE INTO $t AS tgt USING race_src AS src ON tgt.k = src.k
               |WHEN MATCHED THEN UPDATE SET p = src.p""".stripMargin)
        }
        def msgs(x: Throwable): Seq[String] =
          if (x == null) Seq.empty else s"${x.getClass.getName}:${x.getMessage}" +: msgs(x.getCause)
        assert(msgs(e).exists(_.contains("ConcurrentModificationException")),
          s"expected a CME, got ${msgs(e)}")
      } finally SnapshotStore.commitAttemptHook = saved
      // the winner's append stands; the stale merge left no trace
      assert(spark.sql(s"SELECT k, p FROM $t ORDER BY k")
        .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (50L, "raced")))
      // the re-derived merge (fresh plan over the new HEAD) succeeds
      spark.sql(
        s"""MERGE INTO $t AS tgt USING race_src AS src ON tgt.k = src.k
           |WHEN MATCHED THEN UPDATE SET p = src.p""".stripMargin)
      assert(spark.sql(s"SELECT k, p FROM $t ORDER BY k")
        .as[(Long, String)].collect().toSeq == Seq((1L, "A"), (50L, "raced")))
    } finally IndexStore.deleteRecursively(root)
  }

  test("age-based retention: vacuumOlderThan expires by commit instant, spares HEAD and tags, treats unstamped history as old") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vacuum-age")
    try {
      val t0 = 1700000000000L
      def commitAt(i: Int, ms: Long): Unit = {
        Seq((i.toLong, s"r$i")).toDF("k", "p")
          .coalesce(1).write.parquet(root.resolve(s"data/l$i").toString)
        SnapshotStore.setClock(root, () => ms)
        if (i == 1) SnapshotStore.commit(spark, root, SnapshotStore.dataFiles(root))
        else SnapshotStore.commitAppend(spark, root,
          SnapshotStore.dataFiles(root).filter(_.startsWith(s"data/l$i/")))
      }
      commitAt(1, t0)           // v1 @ t0
      commitAt(2, t0 + 1000L)   // v2
      commitAt(3, t0 + 2000L)   // v3 (tagged below)
      commitAt(4, t0 + 3000L)   // v4 = HEAD
      SnapshotStore.tagVersion(root, "pin", 3L)
      // horizon between v2 and v3: v1/v2 expire, v3 survives (at-or-
      // after... v3 is after the horizon), v4 is HEAD
      SnapshotStore.vacuumOlderThan(spark, root, t0 + 1500L)
      assert(SnapshotStore.manifestVersions(root) == Seq(3L, 4L))
      // horizon past everything: HEAD survives, tagged v3 survives
      SnapshotStore.vacuumOlderThan(spark, root, t0 + 999999L)
      assert(SnapshotStore.manifestVersions(root) == Seq(3L, 4L),
        "HEAD and the tagged pin must outlive any horizon")
      assert(SnapshotStore.readAtTag(spark, root, "pin",
        inferPartitions = false).count() == 3L)
      assert(SnapshotStore.readAt(spark, root, inferPartitions = false).count() == 4L)
      // unstamped legacy history counts as infinitely old
      val old = java.nio.file.Files.createTempDirectory("vacuum-age-legacy")
      try {
        SnapshotStore.setClock(old, () => t0)
        Seq((1L, "x")).toDF("k", "p")
          .coalesce(1).write.parquet(old.resolve("data/l1").toString)
        SnapshotStore.commit(spark, old, SnapshotStore.dataFiles(old))
        Seq((2L, "y")).toDF("k", "p")
          .coalesce(1).write.parquet(old.resolve("data/l2").toString)
        SnapshotStore.commitAppend(spark, old,
          SnapshotStore.dataFiles(old).filter(_.startsWith("data/l2/")))
        java.nio.file.Files.delete(old.resolve("_snapshots/v=1/_commit_ms"))
        SnapshotStore.vacuumOlderThan(spark, old, t0 - 999999L)
        assert(SnapshotStore.manifestVersions(old) == Seq(2L),
          "an unstamped version is older than any horizon")
      } finally {
        SnapshotStore.clearClock(old)
        IndexStore.deleteRecursively(old)
      }
    } finally {
      SnapshotStore.clearClock(root)
      IndexStore.deleteRecursively(root)
    }
  }

  test("two-phase prefix-sum operators survive an empty table (ADVICE r14 #5)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("empty-fixture")
    try {
      val events = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("event_id", LongType), StructField("ts", TimestampType),
          StructField("event_type", StringType), StructField("user_id", LongType),
          StructField("value", DoubleType))))
      events.coalesce(1).write.parquet(dir.resolve("events.parquet").toString)
      val docs = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType))))
      docs.coalesce(1).write.parquet(dir.resolve("documents.parquet").toString)
      assert(graft.operators.WindowQueries.q8RunningCount(spark, dir.toString).count() == 0)
      assert(graft.operators.TextQueries.q18fSequencePack(spark, dir.toString).count() == 0)
    } finally IndexStore.deleteRecursively(dir)
  }
}
