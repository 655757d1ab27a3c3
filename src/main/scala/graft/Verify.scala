package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (builder-side
    // spot-checks; the driver always passes 2 args = full dump)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.build(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // The oracle (DuckDB) reads the corpus parquet verbatim, so its
    // timestamp flavor follows the corpus's isAdjustedToUTC flag. The
    // engine computes in LTZ either way (Tables.normalizeNtz); mirror the
    // corpus flavor back onto outputs so the value compare is byte-exact
    // whichever flavor the generator emitted this round.
    // Probe every corpus table that exists (not just events/orders), and
    // never let a missing/unreadable file abort the whole dump — a failed
    // probe defaults to the LTZ flavor instead of zeroing the round
    // (ADVICE r8 #2).
    val corpusNaive = try {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      try graft.core.Tables.names.exists { t =>
        val p = s"$sfDir/$t.parquet"
        java.nio.file.Files.exists(java.nio.file.Paths.get(p)) &&
          (try spark.read.parquet(p).schema.fields
             .exists(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
           catch { case _: Throwable => false })
      } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    } catch { case _: Throwable => false }
    def flavor(df: org.apache.spark.sql.DataFrame) =
      if (corpusNaive) graft.core.Tables.denormalizeNtz(df) else df
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try flavor(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // bounded verdicts for the rows-only entries (VERDICT r11 #8):
    // never let a bounds failure abort the dump — the oracle compare is
    // the primary gate, bound_checks.json is the secondary artifact
    if (only.isEmpty) try {
      val checks = Bounds.all(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/bound_checks.json"), Bounds.toJson(checks))
      checks.foreach(c => println(
        s"[verify] bound ${c.name}: ${c.kind} within=${c.within} bound=${c.bound} pass=${c.pass}"))
    } catch { case e: Throwable =>
      System.err.println(s"[verify] bound checks failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
