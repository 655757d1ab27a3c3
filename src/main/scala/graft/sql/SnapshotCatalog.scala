package graft.sql

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The snapshot seam's SQL SURFACE (VERDICT r13 #5): a DataSourceV2
  * [[TableCatalog]] so a plain `spark.sql` user can time-travel a
  * [[graft.core.SnapshotStore]] table with the standard syntax —
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_lake", classOf[SnapshotCatalog].getName)
  *   spark.sql("SELECT … FROM graft_lake.`/path/to/table`")                     -- HEAD
  *   spark.sql("… FROM graft_lake.`/path/to/table` VERSION AS OF 1")           -- pinned version
  *   spark.sql("… FROM graft_lake.`/path/to/table` VERSION AS OF 'train-v1'")  -- tag
  *   spark.sql("… FROM graft_lake.`/path/to/table` VERSION AS OF 'audit'")     -- branch ref
  * }}}
  *
  * (the reference exposes every pipeline stage as "SQL string |
  * DataFrame DSL", S:99-106 — this closes the SQL half for the
  * versioned-table family; SURVEY §3.4). Table identity is the table
  * ROOT PATH (backquoted absolute path), or `<warehouse>/<name>` when
  * the catalog is configured with a `warehouse` option — path identity
  * avoids any session-lifetime re-initialization question when
  * fixtures live under per-corpus cache dirs.
  *
  * Planning delegates to Spark's own DSv2 parquet [[ParquetTable]]
  * handed EXACTLY the pinned version's manifest files (the same file
  * list the API path reads): pushdown, column pruning, and
  * partition-dir recovery (`basePath` = the data root) all ride the
  * stock parquet scan — zero bespoke read code, so the SQL path cannot
  * drift from the DataFrame path. `VERSION AS OF` resolves a version
  * NUMBER, then a TAG, then a BRANCH ref (HEAD included), in that
  * order — numbers and names cannot collide because tags/branches
  * never parse as longs. Timestamp travel (`TIMESTAMP AS OF`) is
  * refused: the seam stamps no wall-clock on commits (determinism
  * contract), so there is no honest timestamp→version mapping.
  *
  * READ-ONLY by design: writes go through the commit API, whose CAS/
  * rebase discipline SQL DML cannot express; create/alter/drop throw.
  * At 100 TB the catalog costs what the API path costs — one list
  * read + the version's manifest parts — per query planning. */
class SnapshotCatalog extends TableCatalog {
  import graft.core.SnapshotStore

  private var cname: String = "graft_lake"
  private var warehouse: Option[Path] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    cname = name
    warehouse = Option(options.get("warehouse")).map(Paths.get(_))
  }
  override def name(): String = cname

  private def rootOf(ident: Identifier): Path = {
    require(ident.namespace().isEmpty,
      s"$cname tables have no namespaces: ${ident.namespace().mkString(".")}")
    val n = ident.name()
    if (n.startsWith("/")) Paths.get(n)
    else warehouse.map(_.resolve(n)).getOrElse(
      throw new IllegalArgumentException(
        s"$cname.$n: relative table names need the catalog's warehouse option " +
        s"(spark.sql.catalog.$cname.warehouse) — or use an absolute root path"))
  }

  private def load(ident: Identifier, version: Option[String]): Table = {
    val root = rootOf(ident)
    if (!Files.exists(root.resolve("_snapshots"))) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val v: Long = version match {
      case None => SnapshotStore.headVersion(root).getOrElse(
        throw new NoSuchTableException(ident))
      case Some(s) =>
        val named = s.stripPrefix("'").stripSuffix("'") // quoted literal form
        named.toLongOption
          .orElse(SnapshotStore.tagVersionOf(root, named))
          .orElse(SnapshotStore.refVersion(root, named))
          .getOrElse(throw new IllegalArgumentException(
            s"$cname.${ident.name()}: '$named' is neither a version number, " +
            "a tag, nor a live ref"))
    }
    val files = SnapshotStore.filesAt(spark, root, v).map(f => root.resolve(f).toString)
    val opts = new java.util.HashMap[String, String]()
    opts.put("basePath", root.resolve("data").toString)
    // the version's DECLARED read schema binds the SQL path exactly like
    // readAt (ADVICE r14): a widened table scans narrow and wide files
    // as ONE type; with no declaration, mergeSchema makes an
    // add-column-evolved version surface late columns instead of
    // silently dropping them behind one footer's schema
    val declared = SnapshotStore.declaredSchema(root, v)
      .map(StructType.fromDDL)
    if (declared.isEmpty) opts.put("mergeSchema", "true")
    ParquetTable(s"$cname.${ident.name()}@v$v", spark,
      new CaseInsensitiveStringMap(opts), files, declared, classOf[ParquetFileFormat])
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      s"$cname: TIMESTAMP AS OF is refused — snapshot commits carry no wall-clock " +
      "(determinism contract); pin a version number, tag, or ref with VERSION AS OF")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse match {
      case None => Array.empty
      case Some(w) =>
        if (!Files.exists(w)) return Array.empty
        import scala.jdk.CollectionConverters._
        val s = Files.list(w)
        try s.iterator().asScala
          .filter(p => Files.exists(p.resolve("_snapshots")))
          .map(p => Identifier.of(Array.empty, p.getFileName.toString))
          .toArray
        finally s.close()
    }
  override def tableExists(ident: Identifier): Boolean =
    Files.exists(rootOf(ident).resolve("_snapshots"))

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$cname is the READ surface of the snapshot seam — $op goes through " +
      "the SnapshotStore commit API (CAS/rebase discipline SQL DML cannot express)")
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    readOnly("createTable")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("alterTable")
  override def dropTable(ident: Identifier): Boolean = readOnly("dropTable")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("renameTable")
}
