package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** Batch relational operator surface (SURVEY.md §2.3 Q1, Q4, Q9-Q15).
  *
  * Everything here is deliberately declarative DataFrame code: filters and
  * projections reach the parquet scan (PushedFilters / ReadSchema), joins
  * are left to Catalyst+AQE with explicit broadcast hints only where a side
  * is known-small at ANY scale (nation/region are bounded dimension tables;
  * customer/orders/lineitem are not and must shuffle-join on their keys).
  */
object RelationalQueries {
  import Det._

  /** Q1 — scan + projection + filter. The filter and the 4-column
    * projection must both push into the parquet scan. */
  def q1ScanFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .where(col("l_quantity") > 30)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Q4 — grouped aggregation, TPC-H Q1 shape (reference operator O7
    * re-expressed batch-side). Partial aggregation (map-side combine)
    * happens automatically for all of these. */
  def q4Pricing(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q9 — multi-way equi-join, TPC-H Q5 shape: revenue by nation.
    * nation is a bounded dimension → broadcast; the
    * customer⋈orders⋈lineitem chain shuffles on its join keys (at 100 TB
    * those are the real exchanges; AQE handles skew/size re-planning). */
  def q9JoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val orders   = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val nation   = Tables.load(spark, dir, "nation")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_lineitems"))
      .orderBy("n_name")
  }

  /** Q9b — the semi/anti join surface Q9's inner join doesn't exercise:
    * customers WITH at least one order (left_semi — the EXISTS plan, no
    * row multiplication) and WITHOUT any 'F'-status order (left_anti,
    * NOT EXISTS). Both are build-side-deduplicating hash joins in
    * Spark — the scale shape for existence predicates, never a join +
    * distinct (which would shuffle the multiplied fact rows only to
    * collapse them again). */
  def q9bSemiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    cust
      .join(orders.select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .join(orders.where(col("o_orderstatus") === "F").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Q9c — FULL OUTER join, completing the join-type matrix (inner q9,
    * left-outer q8's offsets, semi/anti q9b, as-of q22, range q22b):
    * per-HOUR click vs purchase activity where either side may be
    * absent (hour grain so both unmatched directions actually occur in
    * the corpus). Both sides pre-aggregate to one row per key BEFORE
    * the join — the scale rule for outer joins on fact tables (join the
    * rollups, not the facts; an outer join of raw facts multiplies rows
    * then re-aggregates). COALESCE makes the unmatched sides explicit. */
  def q9cFullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    def hourly(t: String) = ev.where(col("event_type") === t)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as(s"n_$t"), dsum(col("value")).as(s"sum_$t"))
    hourly("click").join(hourly("purchase"), Seq("hour"), "full_outer")
      .select(col("hour"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        coalesce(col("sum_click"), lit(0.0)).as("sum_click"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("sum_purchase"), lit(0.0)).as("sum_purchase"))
      .orderBy("hour")
  }

  /** Q10 — sort/limit top-k: top-10 customers by total order value.
    * TakeOrderedAndProject physically: no global sort materialization. */
  def q10TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(dsum(col("o_totalprice")).as("total_spend"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)
  }

  /** Q11 — set operations: (1998 orders ∪ big orders) ∖ finished orders,
    * distinct set semantics on both engines.
    *
    * Planned as ONE scan + ONE shuffle: membership flags per row, then
    * `groupBy(key).agg(max(flag)…)` + a filter — semantically identical
    * to `union.distinct.except` for any key multiplicity, without the
    * naive plan's three scans of `orders` and three shuffles
    * (union-distinct + except are each an exchange). At 100 TB the
    * difference is 3× scan I/O and 2 extra wide shuffles. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        (year(col("o_orderdate")) === 1998).as("in_1998"),
        (col("o_totalprice") > 400000.0).as("in_big"),
        (col("o_orderstatus") === "F").as("in_done"))
      .groupBy("o_orderkey")
      .agg(max(col("in_1998")).as("f_1998"), max(col("in_big")).as("f_big"),
           max(col("in_done")).as("f_done"))
      .where((col("f_1998") || col("f_big")) && !col("f_done"))
      .select("o_orderkey")
      .orderBy("o_orderkey")
  }

  /** Q12 — rollup by (nation, order year) with explicit NULLS FIRST so
    * the subtotal rows sort identically on both engines. */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation   = Tables.load(spark, dir, "nation")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("order_year"), col("o_totalprice"))
      // rollup by Column ref, not by name: name-based re-resolution after a
      // multi-join trips Spark 4's ambiguous-column check (SPARK dataset-id
      // metadata survives the projection); Column refs resolve directly.
      .rollup(col("n_name"), col("order_year"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name").asc_nulls_first, col("order_year").asc_nulls_first)
  }

  /** Q12b — full CUBE over (status, order year) with `grouping_id()`,
    * the grouping-set surface q12's ROLLUP doesn't reach: all four
    * grouping combinations materialize from ONE scan through Spark's
    * Expand operator (each input row fans out to its grouping sets
    * before the single shuffle — no per-set re-scan, which at 100 TB
    * would multiply scan I/O by the number of sets). gid uses the SQL
    * convention both engines share: first cube column = MSB. */
  def q12bCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), year(col("o_orderdate")).as("order_year"),
              col("o_totalprice"))
      .cube(col("o_orderstatus"), col("order_year"))
      .agg(grouping_id().cast("int").as("gid"),
           dsum(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
               col("order_year").asc_nulls_first)
  }

  /** Q12c — arbitrary GROUPING SETS, the general surface behind q12's
    * ROLLUP and q12b's CUBE: {(status, year), (year), ()}. Not a rollup
    * of (status, year) — the (year)-only set skips status — and not a
    * cube (no (status)-only set), so only the explicit-sets API
    * expresses it. Same single-scan Expand plan as q12b: each input row
    * fans out to its 3 grouping sets before ONE shuffle (per-set
    * re-scans would multiply 100 TB scan I/O by the set count). gid is
    * built from per-column GROUPING() bits (status = MSB) — the
    * portable convention for any set list. */
  def q12cGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), year(col("o_orderdate")).as("order_year"),
              col("o_totalprice"))
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("order_year")),
            Seq(col("order_year")), Seq.empty[Column]),
        col("o_orderstatus"), col("order_year"))
      .agg((grouping(col("o_orderstatus")) * 2 + grouping(col("order_year")))
             .cast("int").as("gid"),
           dsum(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
               col("order_year").asc_nulls_first)
  }

  /** Q13 — SQL window functions: per-customer order sequence, running
    * spend (decimal-exact inside the frame), previous order gap. */
  def q13WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.load(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).as("order_seq"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_spend"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
      .orderBy("o_custkey", "order_seq")
  }

  /** Q13b — the ranking/distribution window-function family q13's
    * row_number/lag/sum doesn't cover: dense_rank, ntile, percent_rank,
    * cume_dist, lead, first_value. One WindowExec partitioned by
    * customer (both engines use the standard SQL definitions: ntile
    * front-loads remainder rows, percent_rank = (rank−1)/(n−1),
    * cume_dist = peers-inclusive fraction — rounded 6dp to absorb
    * last-ulp double drift). first_value needs no explicit frame: with
    * an ORDER BY the default RANGE UNBOUNDED PRECEDING..CURRENT ROW
    * frame always contains the partition's first row. */
  def q13bRankFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.load(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("drank"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        first_value(col("o_orderkey")).over(w).as("first_orderkey"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q13c — RANGE-framed window with time-value bounds, the frame
    * family q13's ROWS frames don't reach: per event_type, each event's
    * trailing-10-minute event count and decimal-exact value sum (the
    * per-event rolling feature a realtime scorer reads). The order key
    * is integer epoch-SECONDS — `rangeBetween` needs a numeric key, and
    * integer seconds put the frame boundary on the exact same instant
    * in both engines. RANGE means ts-peers share one frame value by
    * definition, so the result is deterministic without a tie-break. */
  def q13cRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("ts_sec")
      .rangeBetween(-600, 0)
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("ts"),
              unix_seconds(col("ts")).as("ts_sec"), col("value"))
      .select(col("event_id"), col("event_type"), col("ts"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("sum_10m"))
      .orderBy("event_id")
  }

  /** Q14 — scalar function pack: string/date/math/array built-ins in one
    * wide projection (every one stays inside whole-stage codegen). */
  def q14ScalarPack(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        lower(col("o_orderstatus")).as("status_lc"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_prio"),
        substring(col("o_orderpriority"), 1, 3).as("prio3"),
        length(col("o_orderpriority")).as("prio_len"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        date_trunc("month", col("o_orderdate")).as("order_month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_1995"),
        abs(col("o_totalprice") - 200000.0).as("dist_200k"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price_dec"),
        element_at(array(col("o_orderstatus"), col("o_orderpriority")), 2).as("arr_pick"))
      .orderBy("o_orderkey")
  }

  /** Q14b — pivot (long→wide reshape): per-year revenue and order count
    * by order status, one column pair per status. The pivot values are
    * EXPLICIT (`Seq("F","O","P")`): with declared values the pivot is a
    * single-pass grouped aggregation with conditional aggregates — no
    * value-discovery pre-query, no second scan, and the output schema is
    * static (what a 100 TB plan needs; auto-discovery collects the
    * distinct values to the driver first). Each cell is a decimal-exact
    * conditional sum, NULL where the (year, status) cell is empty on
    * both engines. */
  def q14bPivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("order_year"),
              col("o_orderstatus"), col("o_totalprice"))
      .groupBy("order_year")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
      .orderBy("order_year")
  }

  /** Q14c — unpivot/melt (wide→long, the inverse reshape of q14b's
    * pivot): the four lineitem measures become (measure, val) pairs,
    * 4 output rows per input row. Spark's native `unpivot` plans ONE
    * Expand over ONE scan — no per-measure re-scan and no join-back;
    * the UNION-ALL-of-4-selects alternative costs 4× scan I/O at
    * 100 TB (that union IS the DuckDB oracle, where the plans differ
    * but the semantics can't). The filter runs before the reshape so
    * pushdown still reaches the scan. */
  def q14cUnpivot(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .where(col("l_quantity") > 48)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
        "measure", "val")
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  /** Q15 — exact distinct counting (the approximate path is benched
    * separately as a rows-only query; hashes can't match a sketch). */
  def q15Distinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** Rows-only: approx_count_distinct (HyperLogLog++) — the 100 TB path
    * for cardinality, sketch-mergeable across partitions. */
  def q15ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")
  }

  /** Rows-only: the mergeable-sketch cardinality WORKFLOW q15b's single
    * approx_count_distinct doesn't show — the 100 TB pattern where
    * per-partition HLL sketches are materialized (one binary cell per
    * (event_type, day); in production a persisted rollup table) and
    * later re-aggregated by sketch UNION without touching raw data
    * again. Stage 1 builds a DataSketches HLL per (type, day); stage 2
    * unions the day sketches per type and estimates. A sketch estimate
    * can't hash-match a different engine, so the oracle is rows-only;
    * ScaleOpsSpec pins the estimate within 5% of the exact count. */
  def q15dSketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
           hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
             .as("approx_users"))
      .orderBy("event_type")
  }

  /** Count-min sketch geometry for q15f: d hash rows × w cells, row
    * hashes h_r(u) = ((u·a_r + b_r) mod P) mod w with P = 1e9+7 and
    * small fixed (a_r, b_r) — every op is exact 64-bit integer
    * arithmetic, so the whole sketch (and everything derived from it)
    * is bit-identical on any engine that can multiply and mod. */
  val cmsHashes: Seq[(Int, Long, Long)] = Seq(
    (0, 1103L, 12345L), (1, 12289L, 54321L),
    (2, 786433L, 1299709L), (3, 10007L, 7919L))
  val cmsWidth = 256L
  val cmsP = 1000000007L

  /** Q15f — count-min-sketch HEAVY HITTERS, completing the mergeable-
    * summary family (q15b/q15d cardinality, q15e quantiles): find every
    * user whose event count clears 1/128 of the stream using a sketch
    * of d×w = 4×256 integer cells — O(1) memory regardless of key
    * cardinality, the frequency-summary path when distinct keys
    * outgrow a groupBy at 100 TB.
    *
    * Stage 1 folds the stream into the sketch: each row increments one
    * cell per hash row, so the sketch IS a (r, cell) → count grouped
    * aggregate — map-side combine does the folding and cell counts
    * merge by + (the CMS mergeability property, for free from the
    * relational form). Stage 2 queries it: each candidate key reads its
    * d cells and takes the MIN as its estimate (est ≥ true count,
    * overestimate only — the CMS guarantee), keeping keys with
    * est·128 ≥ N (integer compare, no FP threshold). The candidate set
    * here is the distinct keys (exact at this cardinality); at true
    * stream scale the candidate set comes from a bounded space-saving
    * pass or the key dictionary.
    *
    * Unlike the HLL/KLL rows (estimates of a RANDOMIZED sketch —
    * rows-only by design), every CMS number is a deterministic integer
    * function of the data, so q15f is FULLY hash-checked: the DuckDB
    * oracle recomputes sketch, estimates, and threshold bit-for-bit
    * (the q19d recompute-the-pipeline pattern). The superset guarantee
    * (no true heavy hitter missed, est ≥ exact) is pinned in
    * ScaleOpsSpec. */
  def q15fCmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events").select(col("user_id"))
    def cell(u: Column, a: Long, b: Long): Column =
      pmod(pmod(pmod(u, lit(cmsP)) * lit(a) + lit(b), lit(cmsP)), lit(cmsWidth))
    val rowStructs = cmsHashes.map { case (r, a, b) =>
      struct(lit(r).as("r"), cell(col("user_id"), a, b).as("cell"))
    }
    val sketch = events
      .select(explode(array(rowStructs: _*)).as("h"))
      .groupBy(col("h.r").as("r"), col("h.cell").as("cell"))
      .agg(count(lit(1)).as("c"))
    val stats = events.agg(count(lit(1)).as("n"))
    val probes = events.distinct()
      .select(col("user_id"), explode(array(rowStructs: _*)).as("h"))
      .select(col("user_id"), col("h.r").as("r"), col("h.cell").as("cell"))
    probes
      .join(broadcast(sketch), Seq("r", "cell"))
      .groupBy("user_id")
      .agg(min(col("c")).as("est"))
      .crossJoin(broadcast(stats))
      .where(col("est") * lit(128L) >= col("n"))
      .select(col("user_id"), col("est"))
      .orderBy(col("est").desc, col("user_id"))
  }

  /** Bloom geometry for q15g: m bits, k=4 of the same exact-integer
    * universal hashes the CMS uses (h(u) = ((u·a + b) mod P) mod m) —
    * deterministic on any engine, no FP anywhere. */
  val bloomBits = 8192L
  val bloomHashes: Seq[(Long, Long)] = Seq(
    (1103L, 12345L), (12289L, 54321L), (786433L, 1299709L), (10007L, 7919L))

  /** h(u) = (((u mod P)·a + b) mod P) mod m. The inner `pmod(u, P)`
    * (ADVICE r9 #3) keeps the product within Long for ANY 64-bit key:
    * (P−1)·max(a) ≈ 8·10^14 ≪ 2^63, where the bare `u·a` would overflow
    * — and under Spark 4's ANSI default, THROW — at u ≥ ~1.17·10^13
    * (plausible synthetic wide ids at 100 TB). Mathematically identical
    * mod P (standard universal-hash formulation), so build/probe values
    * are unchanged for every in-range key. */
  private def bloomPos(u: Column, a: Long, b: Long): Column =
    pmod(pmod(pmod(u, lit(cmsP)) * lit(a) + lit(b), lit(cmsP)), lit(bloomBits))

  /** Build the Bloom filter over a key frame as a 64-bit-packed mask.
    * The ONLY driver transfer is the distinct set-bit POSITION list —
    * bounded by m (here 8 KB of longs), never by the key cardinality:
    * a billion-row dim still collapses to ≤ m positions via the same
    * distinct aggregate. At 100 TB the mask travels to every executor
    * as ~1 KB of plan literal — the broadcast no-brainer that makes the
    * pre-filter free next to a scan. */
  def bloomMask(keys: DataFrame, keyCol: String): Seq[Long] = {
    val posStructs = bloomHashes.map { case (a, b) => bloomPos(col(keyCol), a, b) }
    val positions = keys.select(explode(array(posStructs: _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val mask = new Array[Long]((bloomBits / 64L).toInt)
    positions.foreach(p => mask((p / 64L).toInt) |= (1L << (p % 64L).toInt))
    mask.toIndexedSeq
  }

  /** Membership test against the literal mask — pure integer codegen
    * (element_at + shifts + bitwise AND), no UDF, no lookup join: the
    * key may be in the set iff ALL k bit positions are set. */
  def bloomMayContain(u: Column, mask: Seq[Long]): Column = {
    val maskLit = array(mask.map(lit): _*)
    bloomHashes.map { case (a, b) =>
      val p = bloomPos(u, a, b)
      val word = element_at(maskLit, (call_function("shiftright", p, lit(6)) + 1).cast("int"))
      val bit = call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
      word.bitwiseAND(bit) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Q15g — broadcast-BLOOM semi-join pre-filter, the runtime-filter
    * pattern as a first-class operator: aggregate events belonging to
    * one customer segment's users by pre-filtering the fact scan with
    * a Bloom mask built over the dim keys, then exact-verifying the
    * survivors with the real semi-join (false positives — and only
    * false positives — die there, so the composition is EXACT and q15g
    * is fully hash-checked against the plain semi-join oracle).
    *
    * Why it matters at 100 TB: Spark's own runtime filters
    * (InSubqueryExec / bloom pushdown) exist only where AQE can inject
    * them — batch equi-joins it owns. This operator is the same
    * pruning for the plans AQE cannot reach (streaming micro-batches,
    * pinned plans, pre-filtering BEFORE an expensive derivation), the
    * q21-salting story's sibling. The mask test is codegen'd integer
    * arithmetic on the scan (no join, no shuffle); the semi-join then
    * runs on the surviving fraction instead of the full fact table.
    * Pruning and the superset guarantee (bloom passes ⊇ true matches,
    * no false negatives) are pinned in ScaleOpsSpec. */
  def q15gBloomSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("user_id"))
    val mask = bloomMask(dim, "user_id")
    Tables.load(spark, dir, "events")
      .where(bloomMayContain(col("user_id"), mask))
      .join(dim, Seq("user_id"), "left_semi")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** Q25 — CDC latest-wins upsert compaction, the MERGE INTO shape a
    * lakehouse table maintenance job runs: a changelog keyed by entity
    * (events as the log; `error` rows play the delete tombstone)
    * compacts to the current snapshot — per key, the latest record by
    * (ts, event_id) wins, and a winning tombstone removes the key.
    *
    * The compaction is a single-shuffle `max_by(payload, struct(ts,
    * event_id))` aggregate, NOT a row_number window: the aggregate
    * combines map-side (each partition ships one candidate row per key,
    * not its whole changelog slice) and never sorts — a window plan
    * sorts every key's full history inside the shuffle. The window
    * formulation IS the DuckDB oracle, where the plans differ but the
    * semantics can't. The delete filter applies AFTER the argmax —
    * a tombstone must win (suppress the key), not lose to the
    * newest non-delete. */
  def q25CdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(max_by(
        struct(col("op"), col("event_type"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("last"))
      .where(col("last.op") =!= "D")
      .select(col("user_id"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"),
        col("last.ts").as("last_ts"))
      .orderBy("user_id")
  }

  /** Q23 — one-pass column profiling, the data-quality report a
    * training pipeline runs before anything else: per profiled column,
    * non-null count, exact distinct, min/max/mean. ONE scan computes
    * every metric as an aggregate (the multi-distinct plans through
    * Spark's Expand — still one scan, never per-column passes, which at
    * 100 TB multiply scan I/O by the column count); the 1-row wide
    * result then reshapes to (metric, v) long form via the same native
    * unpivot as q14c — trivially small by then. Exact distinct is the
    * oracle-able twin; at 100 TB swap `approx_count_distinct` into the
    * identical shape (q15b/q15d are that path). */
  def q23Profile(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    def metrics(c: String): Seq[Column] = Seq(
      count(col(c)).cast("double").as(s"${c}_n"),
      countDistinct(col(c)).cast("double").as(s"${c}_distinct"),
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max"),
      (dsum(col(c)) / count(col(c))).as(s"${c}_mean"))
    val all = Seq("event_id", "user_id", "value").flatMap(metrics)
    e.agg(all.head, all.tail: _*)
      .unpivot(Array.empty[Column], "metric", "v")
      .orderBy("metric")
  }

  /** Rows-only: the approximate-quantile path q15c's scaladoc names as
    * the production shape — `percentile_approx` (t-digest-style
    * mergeable summaries, bounded memory per group regardless of group
    * size; the exact path buffers O(group)). Returns order statistics,
    * not interpolations, so it can't hash-match q15c's oracle;
    * ScaleOpsSpec pins each approximate quantile within the
    * neighboring-exact-quantile envelope. */
  def q15eApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"),
        expr("approx_percentile(value, 0.95, 10000)").as("p95_approx"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Q15c — exact interpolated quantiles per group (both engines use the
    * same linear-interpolation definition, rank = p·(n−1), so the
    * doubles hash-match after 6dp rounding). Like q15/q15b, the exact
    * path is the oracle-able twin: at 100 TB per-group exact percentile
    * buffers O(group) values — production uses `percentile_approx`
    * (t-digest, mergeable partials) for the same shape at bounded
    * memory. */
  def q15cQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.75)"), 6).as("p75"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Q25e — SCD TYPE 2 dimension history from the changelog: every
    * upsert opens a validity interval `[eff_from, eff_to)` closed by
    * the user's next change (update OR delete — a delete closes the
    * standing version and opens nothing, so a deleted user simply has
    * no current row), `is_current` marks the open intervals. This is
    * the warehouse pattern the q25 CDC family's latest-wins snapshot
    * deliberately discards — history — and the table the as-of join
    * family (q22) would serve point-in-time lookups from. One keyed
    * window (`lead` over (ts, event_id) per user): state is a single
    * carried row per partition stream, key-sharded — no global funnel,
    * the q13-family scale shape. Deterministic total order via the
    * event_id tie-break, carried into the output for hash stability. */
  /** The SCD2 interval derivation shared by q25e (the history table)
    * and q25f (point-in-time lookups): one keyed `lead` window per
    * user over the changelog. Keeps the delete rows (they CLOSE the
    * predecessor's interval — dropping them first would extend it past
    * the delete); callers filter to `op = 'U'` afterwards. */
  private def scd2Intervals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        col("event_type"), col("value"))
      .withColumn("eff_to", lead(col("ts"), 1).over(w))
  }

  def q25eScd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Intervals(Tables.load(spark, dir, "events"))
      .where(col("op") === "U")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts").as("eff_from"), col("eff_to"),
        col("eff_to").isNull.cast("long").as("is_current"))
      .orderBy("user_id", "eff_from", "event_id")

  /** Q25f — POINT-IN-TIME lookup against the SCD2 history: "every
    * user's state AS OF T" = the version row whose validity interval
    * contains T (`eff_from ≤ T < eff_to`, open current rows included;
    * a user whose latest change before T was a delete has NO row) —
    * the reproducible-training-features read (q22's as-of join answers
    * one probe's nearest past row; this answers the whole dimension at
    * an instant) and the reason SCD2 histories exist. Three as-of
    * instants reported side by side: interval containment is a FILTER
    * over the derived intervals — per instant one predicate, no join,
    * no re-derivation of history (the window runs once; the three
    * instants share it via one union over the same frame). */
  def q25fPitLookup(spark: SparkSession, dir: String): DataFrame = {
    val iv = scd2Intervals(Tables.load(spark, dir, "events"))
      .where(col("op") === "U")
    val asOf = Seq("2024-01-08", "2024-01-15", "2024-01-22")
    asOf.map { t =>
      val ts = lit(t).cast("timestamp")
      iv.where(col("ts") <= ts && (col("eff_to").isNull || col("eff_to") > ts))
        .groupBy(lit(t).as("as_of"), col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
    }.reduce(_.unionByName(_))
      .orderBy("as_of", "event_type")
  }

  /** Q23c — DECLARATIVE DATA-QUALITY EXPECTATIONS (the Great
    * Expectations / dbt-tests operator): a fixed contract of
    * constraints — key uniqueness, referential integrity, enum
    * membership, range/null policy, freshness window, non-empty
    * payloads — evaluated in bulk and reported as one violations table
    * (tbl, expectation, n_checked, n_violations, passed). Every
    * training-data pipeline gates ingestion on exactly this report.
    *
    * Plan shape for 100 TB: ALL of a table's predicate expectations
    * fuse into ONE column-pruned scan with conditional partial
    * aggregates (map-side combine, a 1-row result per table);
    * uniqueness rides the same scan as `n − countDistinct`; the only
    * shuffle is the referential-integrity anti-join, on the pruned key
    * column alone. The report deliberately includes a FAILING row on
    * this corpus — `event_type` enum membership, which the 'error'
    * rows violate — so the surfacing path is exercised, not just the
    * all-green path. */
  def q23cExpectations(spark: SparkSession, dir: String): DataFrame = {
    def fused(df: DataFrame, tbl: String, exps: Seq[(String, Column)],
              unique: Option[(String, Column)] = None): DataFrame = {
      val aggs =
        (count(lit(1)).as("n_checked") +:
          exps.map { case (n, viol) => sum(when(viol, 1L).otherwise(0L)).as(s"v_$n") }) ++
          unique.map { case (n, key) => countDistinct(key).as(s"d_$n") }.toSeq
      val rows =
        exps.map { case (n, _) =>
          struct(lit(tbl).as("tbl"), lit(n).as("expectation"),
            col("n_checked"), col(s"v_$n").as("n_violations"))
        } ++ unique.map { case (n, _) =>
          struct(lit(tbl).as("tbl"), lit(n).as("expectation"),
            col("n_checked"), (col("n_checked") - col(s"d_$n")).as("n_violations"))
        }.toSeq
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rows: _*)).as("e")).select("e.*")
    }
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val events = Tables.load(spark, dir, "events")
    val docs = Tables.load(spark, dir, "documents")
    // the one shuffled expectation: anti-join on the pruned key column
    // alone; the 1-row × 1-row crossJoin is the broadcast-stats pattern
    val fkViol = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n_checked")))
      .select(lit("lineitem").as("tbl"), lit("fk_orderkey_exists").as("expectation"),
        col("n_checked"), col("n_violations"))
    val perTable = Seq(
      fused(orders, "orders", Nil, unique = Some(("orderkey_unique", col("o_orderkey")))),
      fused(lineitem, "lineitem", Seq(
        "discount_in_policy" -> (col("l_discount") < 0 || col("l_discount") > 0.05),
        "quantity_in_range" -> (col("l_quantity") < 1 || col("l_quantity") > 50))),
      fused(events, "events", Seq(
        "event_type_in_enum" ->
          !col("event_type").isin("view", "click", "purchase", "signup"),
        "value_nonneg_notnull" -> (col("value").isNull || col("value") < 0),
        "ts_in_freshness_window" ->
          (col("ts") < lit("2024-01-01").cast("timestamp") ||
           col("ts") >= lit("2024-02-01").cast("timestamp")))),
      fused(docs, "documents", Seq(
        "text_nonempty" -> (col("text").isNull || length(col("text")) === 0))))
    (perTable :+ fkViol.select("tbl", "expectation", "n_checked", "n_violations"))
      .reduce(_.unionByName(_))
      .withColumn("passed", (col("n_violations") === 0).cast("long"))
      .orderBy("tbl", "expectation")
  }
}
