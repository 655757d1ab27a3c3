package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one declared capability from SURVEY.md
  * §2.3; [[oracleSql]] holds its DuckDB twin (same column names, same
  * ORDER BY, decimal-exact double handling per SURVEY.md §5.3).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WindowQueries.q7WindowTop1(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_scan_filter"   -> (RelationalQueries.q1ScanFilter _),
    "q2_json_parse"    -> (WindowQueries.q2JsonParse _),
    "q4_agg_pricing"   -> (RelationalQueries.q4Pricing _),
    "q5_window_tumbling" -> (WindowQueries.q5Tumbling _),
    "q6_window_sliding"  -> (WindowQueries.q6Sliding _),
    "q7_window_top1"     -> (WindowQueries.q7WindowTop1 _),
    "q8_running_count"   -> (WindowQueries.q8RunningCount _),
    "q9_join_revenue"    -> (RelationalQueries.q9JoinRevenue _),
    "q10_topk_orders"    -> (RelationalQueries.q10TopCustomers _),
    "q11_set_ops"        -> (RelationalQueries.q11SetOps _),
    "q12_rollup"         -> (RelationalQueries.q12Rollup _),
    "q13_window_funcs"   -> (RelationalQueries.q13WindowFuncs _),
    "q14_scalar_pack"    -> (RelationalQueries.q14ScalarPack _),
    "q15_distinct"       -> (RelationalQueries.q15Distinct _),
    "q15b_approx_distinct" -> (RelationalQueries.q15ApproxDistinct _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q2_json_parse" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_parsed,
        |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q4_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_window_tumbling" ->
      """SELECT date_trunc('minute', ts) AS window_start, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_window_sliding" ->
      """SELECT window_start, COUNT(*) AS n_events FROM (
        |  SELECT date_trunc('minute', ts) - to_minutes(CAST(k.k AS INT)) AS window_start
        |  FROM events CROSS JOIN (SELECT unnest([0,1,2,3,4]) AS k) k
        |) t GROUP BY window_start ORDER BY window_start""".stripMargin,
    "q7_window_top1" ->
      """SELECT window_start, top_type, cnt FROM (
        |  SELECT window_start, event_type AS top_type, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY window_start ORDER BY cnt DESC, event_type) AS rn
        |  FROM (SELECT date_trunc('minute', ts) AS window_start, event_type, COUNT(*) AS cnt
        |        FROM events GROUP BY 1, 2) c
        |) t WHERE rn = 1 ORDER BY window_start""".stripMargin,
    "q8_running_count" ->
      """SELECT event_id, ts,
        |  COUNT(*) OVER (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
        |FROM events ORDER BY ts, event_id""".stripMargin,
    "q9_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q10_topk_orders" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q11_set_ops" ->
      """SELECT o_orderkey FROM (
        |  (SELECT o_orderkey FROM orders WHERE year(o_orderdate) = 1998
        |   UNION
        |   SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |  EXCEPT
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |) t ORDER BY o_orderkey""".stripMargin,
    "q12_rollup" ->
      """SELECT n_name, order_year,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM (SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year, o_totalprice
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey) t
        |GROUP BY ROLLUP(n_name, order_year)
        |ORDER BY n_name NULLS FIRST, order_year NULLS FIRST""".stripMargin,
    "q13_window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend,
        |  LAG(o_orderkey, 1) OVER w AS prev_orderkey,
        |  CAST(date_diff('day', LAG(o_orderdate, 1) OVER w, o_orderdate) AS INT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "q14_scalar_pack" ->
      """SELECT o_orderkey,
        |  lower(o_orderstatus) AS status_lc,
        |  o_orderstatus || '-' || o_orderpriority AS status_prio,
        |  substring(o_orderpriority, 1, 3) AS prio3,
        |  CAST(length(o_orderpriority) AS INT) AS prio_len,
        |  CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(month(o_orderdate) AS INT) AS order_month,
        |  date_trunc('month', o_orderdate) AS order_month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_1995,
        |  abs(o_totalprice - 200000.0) AS dist_200k,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  ([o_orderstatus, o_orderpriority])[2] AS arr_pick
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q15_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
