package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-layout writer — the data-layout side of the 100 TB posture.
  *
  * Two pruning levels compose at read time:
  *  - `partitionBy` gives DIRECTORY-level pruning: a filter on a
  *    partition column becomes a `PartitionFilters` entry on the scan
  *    and non-matching directories are never listed, let alone read;
  *  - `sortWithinPartitions` on the sort keys clusters each written
  *    file on those keys, so parquet row-group min/max statistics
  *    prune WITHIN files for range predicates on them.
  *
  * The `repartition(partitionCols)` before the write is load-bearing,
  * not cosmetic: without it every write task holds rows of every
  * partition value, so a dynamic-partition write fans out to
  * numTasks × numPartitions small files — the classic write
  * amplification that turns a 1000-executor job into a
  * million-file table. Repartitioning first sends each partition
  * value's rows to one task: one (large, sorted) file per partition
  * dir per task that owns it.
  *
  * Both behaviors — directory pruning engaged on read, bounded file
  * count per partition dir — are pinned in ScaleOpsSpec.
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
