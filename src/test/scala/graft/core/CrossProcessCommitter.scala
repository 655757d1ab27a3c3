package graft.core

import org.apache.spark.sql.SparkSession

/** Child-JVM half of the cross-process CAS race spec
  * ([[SnapshotCrossProcessSpec]], VERDICT r13 #2): appends `n`
  * single-file commits to the table at `args(0)` from its OWN process,
  * so the parent JVM's per-root commit lock cannot serialize the
  * rename(2) CAS — the publish race is contested at the filesystem,
  * exactly the multi-writer deployment shape the seam's scaladoc
  * claims. Prints `READY` once its session is up, then spins on the
  * parent's `_go` flag so both racers enter their commit loops
  * together; prints one line per landed version and `DONE` on success
  * (exit 0). Any CAS bug surfaces as a lost file, a duplicated
  * version, or a non-zero exit. */
object CrossProcessCommitter {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Paths.get(args(0))
    val n = args(1).toInt
    val tag = args(2)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"xproc-committer-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      println(s"[xproc] $tag READY")
      Console.flush()
      val go = root.resolve("_go")
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(go) && System.nanoTime < deadline)
        Thread.sleep(5)
      require(java.nio.file.Files.exists(go), "parent never raised _go")
      (1 to n).foreach { i =>
        val rel = s"data/${tag}_$i"
        Seq((1000L * tag.hashCode.abs + i, s"$tag$i")).toDF("k", "p")
          .coalesce(1).write.parquet(root.resolve(rel).toString)
        // walk only OUR load dir: a whole-tree walk would race the
        // other process's in-flight _temporary write dirs
        val w = java.nio.file.Files.walk(root.resolve(rel))
        val add =
          try {
            import scala.jdk.CollectionConverters._
            w.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map(p => root.relativize(p).toString).toSeq.sorted
          } finally w.close()
        val v = SnapshotStore.commitAppend(spark, root, add)
        println(s"[xproc] $tag commit $i -> v$v")
        Console.flush()
      }
      println(s"[xproc] $tag DONE")
      Console.flush()
    } finally spark.stop()
  }
}
