package graft.sql

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.SnapshotStore

/** BATCH-ADDRESSED CHANGE FEED (VERDICT r19 missing #1 — the last rung
  * of the CDC addressing story): Delta's `table_changes(tbl, v1, v2)` /
  * Iceberg's incremental batch read, spelled on the catalog's existing
  * `changes` namespace with a version RANGE pin:
  *
  * {{{ SELECT * FROM graft_lake.changes.`/t` VERSION AS OF '1..2' }}}
  *
  * resolves to one row per changed row between the two versions —
  * `change_type` ∈ insert / delete / update_preimage /
  * update_postimage plus the table's own columns — by delegating to
  * [[graft.core.SnapshotStore.changesBetween]], the file-pruned
  * derivation q26p proves (only keys living in physically-changed
  * files enter the diff join; carried-file rows provably never
  * shuffle).
  *
  * MECHANICS, Spark-first: a DSv2 `Table` cannot lazily serve an
  * arbitrary derived DataFrame through `toBatch` without reimplementing
  * the derivation as bespoke readers — so the catalog returns a MARKER
  * table ([[SnapshotChangesBatchTable]]) and an analyzer rule
  * ([[ChangesBatchSubstitution]], injected by
  * [[graft.functions.GraftExtensions]]) substitutes the relation with
  * the derivation's own logical plan, aliased onto the relation's
  * output attribute ids — the view-expansion pattern, so Catalyst
  * optimizes the real plan (the diff join, the envelope-restricted
  * scans) with zero driver-side rows. The diff key defaults to the
  * table's single manifest-envelope stats column; tables with zero or
  * several envelope columns name it via `spark.read.option("key", …)`.
  *
  * The un-versioned `changes` addressing stays MICRO_BATCH_READ only
  * ("the changes" of a table has no one-relation batch meaning without
  * a range); a bare version pin keeps a loud refusal naming the range
  * form. */
private[sql] class SnapshotChangesBatchTable(tname: String, val root: Path,
                                             val fromV: Long, val toV: Long,
                                             val defaultKey: Option[String],
                                             tableSchema: StructType)
    extends Table with SupportsRead {
  private val batchSchema = StructType(
    StructField("change_type", StringType, nullable = false) +:
    tableSchema.fields.toSeq)
  override def name(): String = tname
  override def schema(): StructType = batchSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = batchSchema
      override def description(): String = s"$tname changesBetween($fromV,$toV)"
      override def toBatch: Batch =
        // never reached under a graft session: the analyzer rule
        // substitutes this relation before physical planning
        throw new IllegalStateException(
          s"$tname: the changes-batch relation plans through the " +
          "ChangesBatchSubstitution analyzer rule — build the session " +
          "with graft.functions.GraftExtensions (GraftSession does)")
    }
}

/** The substitution rule: replace every resolved
  * [[SnapshotChangesBatchTable]] relation with
  * [[graft.core.SnapshotStore.changesBetween]]'s analyzed plan,
  * projected to the declared column order and aliased onto the
  * relation's own attribute ids so downstream operators keep their
  * references. Runs once per relation (the match disappears after
  * substitution). */
class ChangesBatchSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotChangesBatchTable] =>
        val t = r.table.asInstanceOf[SnapshotChangesBatchTable]
        val key = Option(r.options.get("key")).filter(_.nonEmpty)
          .orElse(t.defaultKey).getOrElse(throw new IllegalArgumentException(
            s"${t.name()}: no diff key — the table has no single " +
            "manifest-envelope stats column to default from; name one " +
            "via spark.read.option(\"key\", <column>)"))
        val df = SnapshotStore.changesBetween(spark, t.root, t.fromV, t.toV, key)
        val ordered = df.select(
          t.schema().fieldNames.map(col).toIndexedSeq: _*)
        val child = ordered.queryExecution.analyzed
        Project(r.output.zip(child.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId) }, child)
    }
}

/** SPEC-EVOLVED READ substitution (q28s —
  * `CALL graft_lake.system.set_partition_spec`): a version whose data
  * files span partition-spec GENERATIONS cannot plan as one parquet
  * relation (one aligned dir depth per relation — Spark's partition
  * inference refuses mixed listings, and a single-spec read would
  * silently NULL the other generation's dir columns). The rule expands
  * the flagged relation into the PER-FILE-SPEC composition the API's
  * [[graft.core.SnapshotStore.readFilesEvolved]] proves (q26x): files
  * group by their own dir-encoded spec ([[graft.core.SnapshotStore
  * .specOfFile]] — the path IS the spec record), each group reads with
  * ITS dir recovery under the shared basePath and the DECLARED schema
  * (partition columns last, the split order), groups union by name in
  * declared order. Catalyst then pushes filters into every side — each
  * generation prunes by the dirs it actually encodes, which is the
  * q26x "pruned by their own dirs" contract through plain SQL. Writes
  * are untouched: INSERT's target never appears as a plan CHILD
  * (V2WriteCommand holds it out-of-band), and row-level commands
  * refuse on the table itself before planning. */
class EvolvedReadSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, MergeIntoTable, UpdateTable}

  private def evolvedIn(p: LogicalPlan): Option[String] =
    p.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotSqlTable] &&
             r.table.asInstanceOf[SnapshotSqlTable].evolvedRead =>
        r.table.name()
    }

  private def refuse(verb: String, tname: String): Nothing =
    throw new IllegalArgumentException(
      s"$tname: $verb on a table spanning partition-spec generations is " +
      "refused — a COW rewrite binds one layout; compact across the spec " +
      "boundary first (CALL system.compact)")

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // row-level commands hold their target as a plan CHILD — substituting
    // it would feed Spark's rewrite a Union instead of a relation
    // (INTERNAL_ERROR); refuse here, loudly, before any substitution
    case d: DeleteFromTable if evolvedIn(d.table).isDefined =>
      refuse("DELETE", evolvedIn(d.table).get)
    case u: UpdateTable if evolvedIn(u.table).isDefined =>
      refuse("UPDATE", evolvedIn(u.table).get)
    case m: MergeIntoTable if evolvedIn(m.targetTable).isDefined =>
      refuse("MERGE INTO", evolvedIn(m.targetTable).get)
    case _ => substitute(plan)
  }

  private def substitute(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotSqlTable] &&
             r.table.asInstanceOf[SnapshotSqlTable].evolvedRead =>
        val (root, files, logical, _) =
          r.table.asInstanceOf[SnapshotSqlTable].evolvedReadInfo.get
        require(r.output.map(_.name) == logical.fieldNames.toSeq,
          s"${r.table.name()}: spec-evolved reads serve the declared " +
          s"columns ${logical.fieldNames.mkString(", ")} — metadata " +
          "columns (_file) are not available across spec generations")
        val groups = files
          .filterNot(SnapshotCatalog.isSeedFile)
          .groupBy(SnapshotStore.specOfFile).toSeq
          .sortBy(_._1.mkString(" "))
        val dfs = groups.map { case (sig, fs) =>
          spark.read
            .option("basePath", root.resolve("data").toString)
            .schema(SnapshotCatalog.partitionLast(logical, sig))
            .parquet(fs.map(f => root.resolve(f).toString): _*)
            .select(logical.fieldNames.map(col).toIndexedSeq: _*)
        }
        val child = dfs.reduce(_.unionByName(_)).queryExecution.analyzed
        Project(r.output.zip(child.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId) }, child)
    }
}
