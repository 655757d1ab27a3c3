package graft.sql

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.core.SnapshotStore

/** STREAMING WRITE through the SQL catalog (VERDICT r18 missing #3 —
  * the write-side symmetry of q28l's `readStream.table`):
  *
  * {{{ df.writeStream.toTable("graft_lake.`/t`") }}}
  *
  * binds each micro-batch epoch to ONE idempotent
  * [[graft.core.SnapshotStore.commitAppend]] — exactly the per-epoch
  * commit discipline the durable `foreachBatch` sink proves, packaged
  * as a DSv2 `STREAMING_WRITE` so the user needs no incantation.
  *
  * Exactly-once at rest, mechanically: every epoch's task files land
  * under ONE deterministic attempt dir
  * (`data/stream_<query>_e<epoch>/` — unique file names inside, so
  * task retries never collide), and the driver-side `commit(epoch)`
  * first asks the MANIFEST whether HEAD already references that dir: a
  * failure-replayed epoch (stream restarted from the checkpoint after
  * committing the sink but before recording progress) finds its dir
  * committed, deletes its freshly-written duplicates, and returns —
  * the snapshot CAS makes the commit itself atomic, so there is no
  * torn state between "files referenced" and "epoch done". This is the
  * Delta transactional-sink txnVersion pattern with the attempt dir as
  * the transaction id.
  *
  * Tasks write parquet through Spark's OWN write path —
  * [[ParquetFileFormat.prepareWrite]]'s [[OutputWriterFactory]] under
  * the session's hadoop conf, so epoch files are byte-compatible with
  * `df.write.parquet` — no driver round-trip, no rows in commit
  * messages: at 100 TB/day the driver sees only file NAMES. Contracts
  * kept loud: append output mode only (complete's truncate-per-epoch
  * has no honest snapshot meaning), flat-table layout (partition-dir
  * streaming lands through the foreachBatch epoch sink until the
  * writer learns the Layout discipline), no WAP branch (staging a
  * continuous stream is a batch concept). */
private[sql] class SnapshotStreamingWrite(root: Path, tableName: String,
                                          queryId: String,
                                          writeSchema: StructType,
                                          declared: StructType,
                                          partitionCols: Seq[String])
    extends StreamingWrite {

  require(partitionCols.isEmpty,
    s"$tableName: writeStream.toTable on a PARTITIONED table is refused — " +
    "the streaming writer lands flat epoch files (the Layout partition " +
    "discipline needs a per-epoch repartition the sink cannot impose); " +
    "stream through foreachBatch + INSERT INTO instead")
  require(writeSchema.fieldNames.sameElements(declared.fieldNames) &&
      writeSchema.fields.zip(declared.fields).forall {
        case (a, b) => org.apache.spark.sql.types.DataType
          .equalsIgnoreNullability(a.dataType, b.dataType) },
    s"$tableName: streaming write schema ${writeSchema.toDDL} does not " +
    s"match the table's declared schema ${declared.toDDL} — align the " +
    "query's output (names, order, types) to the table")

  private val rootStr = root.toAbsolutePath.normalize.toString
  // the deterministic per-epoch attempt dir — the idempotence token
  private val dirPrefixRel =
    s"data/stream_${queryId.replaceAll("[^0-9a-fA-F]", "").take(12)}"
  private def epochDirRel(epochId: Long): String = s"${dirPrefixRel}_e$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    // driver-side: Spark's own parquet write stamping (legacy-format,
    // timestamp type, rebase modes, codec — everything df.write sets)
    val spark = SparkSession.active
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, writeSchema)
    new EpochParquetWriterFactory(rootStr, dirPrefixRel, writeSchema, owf,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    require(spark.conf.getOption("spark.graft.wap.branch")
        .forall(_.trim.isEmpty),
      s"$tableName: streaming writes under a WAP branch are refused — " +
      "staging a continuous stream is a batch concept; unset " +
      "spark.graft.wap.branch or stage through INSERT INTO")
    val fresh = messages.toSeq
      .collect { case m: EpochFilesMessage => m.files }.flatten.sorted
    if (fresh.isEmpty) return // an empty epoch commits nothing
    val dirRel = epochDirRel(epochId) + "/"
    val head = SnapshotStore.headVersion(root)
    val already = head.exists(v =>
      SnapshotStore.filesAt(spark, root, v).exists(_.startsWith(dirRel)))
    if (already) {
      // failure-replayed epoch: the manifest already references this
      // epoch's dir — drop the duplicate files, keep the committed ones
      fresh.foreach(f => Files.deleteIfExists(root.resolve(f)))
      return
    }
    SnapshotStore.commitAppend(spark, root, fresh, opType = "stream-epoch")
    ()
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case m: EpochFilesMessage => m.files }.flatten
      .foreach(f => Files.deleteIfExists(root.resolve(f)))
}

/** One epoch's file names, table-root-relative (names only — never
  * rows — cross the driver). */
private[sql] case class EpochFilesMessage(files: Seq[String])
    extends WriterCommitMessage

/** Task-side parquet writer: Spark's own [[OutputWriterFactory]] (the
  * exact writer `df.write.parquet` tasks run), opened lazily so empty
  * partitions write nothing. */
private[sql] class EpochParquetWriterFactory(rootStr: String,
                                             dirPrefixRel: String,
                                             schema: StructType,
                                             owf: OutputWriterFactory,
                                             conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
      private var rel: String = _

      private def open(): Unit = {
        val tac = new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
          conf.value,
          new org.apache.hadoop.mapreduce.TaskAttemptID("graft",
            (epochId % Int.MaxValue).toInt,
            org.apache.hadoop.mapreduce.TaskType.MAP, partitionId, 0))
        rel = s"${dirPrefixRel}_e$epochId/part-$partitionId-" +
          s"${java.util.UUID.randomUUID().toString.take(12)}" +
          owf.getFileExtension(tac)
        val p = Paths.get(rootStr).resolve(rel)
        Files.createDirectories(p.getParent)
        writer = owf.newInstance(p.toString, schema, tac)
      }

      override def write(row: InternalRow): Unit = {
        if (writer == null) open()
        writer.write(row)
      }
      override def commit(): WriterCommitMessage =
        if (writer == null) EpochFilesMessage(Seq.empty)
        else { writer.close(); EpochFilesMessage(Seq(rel)) }
      override def abort(): Unit = if (writer != null) {
        writer.close()
        Files.deleteIfExists(Paths.get(rootStr).resolve(rel))
      }
      override def close(): Unit = ()
    }
}
