package graft

/** Throwaway measurement main (round 21) — times pipeline COMPONENTS of
  * the q16 probe path through the noop sink. Never run by the driver;
  * deleted before round end. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.build(s"local[$cpus]", cpus.toInt)
    import org.apache.spark.sql.functions._
    import graft.operators.DedupQueries

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm + 2 passes, min
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"[scratch] $name%-40s $t%8.3f s")
    }

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    time("docs_scan")(docs)
    time("tokens_only")(docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks")))
    time("shingles_full")(DedupQueries.wordShingleDocs(spark, sfDir))
    val base = DedupQueries.wordShingleDocs(spark, sfDir)
      .where(col("doc_id") % DedupQueries.IngestSplitMod =!= DedupQueries.IngestSplitRem)
    val batch = DedupQueries.wordShingleDocs(spark, sfDir)
      .where(col("doc_id") % DedupQueries.IngestSplitMod === DedupQueries.IngestSplitRem)
    time("batch_sigs")(batch.select(col("doc_id"),
      call_function(graft.functions.MinHash.sigFnName, col("sh")).as("sig")))
    val idx = DedupQueries.baseBandIndex(spark, sfDir)
    time("idx_bands_scan")(idx.bands)
    time("q16i_full")(DedupQueries.q16iIncrementalNearDup(spark, sfDir))
    spark.stop()
  }
}
