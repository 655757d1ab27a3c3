package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle hash-matching (SURVEY.md §5.3).
  *
  * Double summation order differs between engines, so every SUM/AVG that
  * feeds a hash-compared result goes through an exact DECIMAL accumulator
  * and is only converted back to DOUBLE at the very end — the decimal sum
  * is bit-reproducible on both Spark and DuckDB, and the final
  * decimal→double conversion is deterministic.
  */
object Det {
  /** Exact sum: cast each term to DECIMAL(18,4) (one deterministic
    * rounding per row), sum exactly, emit DOUBLE. DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Exact average built from dsum/count so both engines perform the
    * same single double division. DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column =
    dsum(c) / count(c)
}
