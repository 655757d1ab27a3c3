package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession

/** One shared local session for all suites (Spark startup dominates
  * test wall time otherwise). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
}
