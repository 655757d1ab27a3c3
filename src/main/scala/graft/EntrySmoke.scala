package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's t1 smoke: a *plain* SparkSession (none of
  * GraftSession's configs — the driver owns its own session) calling
  * `SparkEntry.entry` and requiring rows > 0. Exists to prove the engine
  * works under a session it did not build (e.g. the nanosAsLong runtime
  * conf is applied defensively in Tables.load, not assumed at build). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry() rows=$rows " + (if (rows > 0) "OK" else "FAIL"))
    spark.stop()
    if (rows <= 0) sys.exit(1)
  }
}
