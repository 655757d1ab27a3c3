package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` plan↔DataFrame constructors for graft's
  * custom logical operator API ([[graft.plans.SimilarityJoin]]) — the
  * standard shim pattern for Spark extension libraries that introduce
  * their own `LogicalPlan` nodes. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Unload every loaded state-store provider on this JVM (closing
    * RocksDB native instances). `StateStore.unloadAll` is
    * `private[sql]`; graft calls it after a replay drains so native
    * store lifetime tracks query lifetime instead of the 60 s
    * maintenance cadence (see StreamingPipelines.unloadStateStores). */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
