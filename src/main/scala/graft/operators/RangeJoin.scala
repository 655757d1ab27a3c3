package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Range (band) join without an equi-key — the temporal-neighborhood
  * query family: "for each row, aggregate the rows whose timestamp falls
  * within ±w of mine". The reference has no joins at all (SURVEY §2.2);
  * this is the beyond-reference operator that complements [[AsofJoin]]
  * (nearest predecessor) with symmetric-interval semantics.
  *
  * Spark's built-in planning for a pure range predicate is a broadcast
  * nested-loop / cartesian — O(N²) comparisons and a single-task
  * broadcast at corpus scale. The scale-correct shape is the BINNED BAND
  * JOIN (the published interval-join technique in Flink's interval join
  * and DuckDB's IEJoin literature): quantize time into bins exactly as
  * wide as the band, equi-join on the bin id — probe side exploded to
  * its 3 adjacent bins {b-1, b, b+1}, build side kept at 1 row/bin —
  * then apply the exact |Δt| ≤ w predicate to the co-binned candidates.
  * Every true match lands in exactly one (probe-bin, build-bin) pair, so
  * no dedup is needed; the equi-join shuffles by bin (hash-partitioned,
  * AQE-skew-splittable) and comparisons drop from O(N²) to
  * O(N × bin population). The probe-side 3× fan-out is the whole cost —
  * constant, not data-dependent.
  */
object RangeJoin {

  /** The library surface: for each row of `events` (event_id,
    * event_type, ts), count the OTHER-typed events within ±`bandSec`
    * seconds (cross-type temporal correlation — e.g. "purchases near
    * clicks"). Zero-neighbor rows are kept (left outer on the bin). */
  def neighborCounts(events: DataFrame, bandSec: Long): DataFrame = {
    val bandUs = bandSec * 1000000L
    val ev = events.select(col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val probe = ev
      .select(col("event_id"), col("event_type"), col("us"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("d"))
      .select(col("event_id"), col("event_type"), col("us"),
        (expr(s"us DIV $bandUs") + col("d")).as("bin"))
    val build = ev.select(col("event_id").as("n_id"),
      col("event_type").as("n_type"), col("us").as("n_us"),
      expr(s"us DIV $bandUs").as("bin"))
    probe.join(build, Seq("bin"), "left_outer")
      .groupBy("event_id", "event_type")
      .agg(sum(
        when(col("n_id").isNotNull && col("n_id") =!= col("event_id") &&
             col("n_type") =!= col("event_type") &&
             abs(col("n_us") - col("us")) <= bandUs, 1L)
          .otherwise(0L)).as("n_neighbors"))
  }

  /** Q22b — [[neighborCounts]] over `events` at a ±60 s band, declared
    * end-to-end: the DuckDB oracle is the plain inequality join (an
    * independent implementation — DuckDB plans it as an IEJoin), so the
    * binned rewrite is verified row-for-row against the naive
    * semantics. */
  def q22bRangeJoin(spark: SparkSession, dir: String): DataFrame =
    neighborCounts(Tables.load(spark, dir, "events"), 60L)
      .orderBy("event_id")
}
