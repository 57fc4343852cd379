package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.{dsum, sqlDsum}

/** Second wave of the relational catalog: as-of join, pivot, approximate
  * distinct, moment statistics, SQL grouping sets, array/map scalar
  * functions, ALL-variant set ops, min_by/max_by, exact median.
  */
object Relational2 {

  type Q = (SparkSession, String) => DataFrame

  /** As-of join: for each event, the latest order of the same customer at
    * or before the event time. Composed from an equi-join + latest-per-key
    * window (preference (a) of the custom-operator ladder: built-ins
    * express the semantics; a merge-join SparkPlan is only worth it when
    * the per-key order history is huge). */
  def q26AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_id", $"user_id", $"ts")
      .filter($"event_id" % 50 === 0)
    val ord = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
    val joined = ev.join(ord,
      $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts", "left")
    val w = Window.partitionBy($"event_id")
      .orderBy($"o_orderdate".desc_nulls_last, $"o_orderkey".desc_nulls_last)
    joined.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"user_id", $"o_orderkey".as("asof_orderkey"),
              $"o_totalprice".as("asof_totalprice"))
  }

  /** Pivot: order counts by status × priority (explicit when-aggs so the
    * column names match the oracle exactly; `DataFrame.pivot` generates
    * the same plan shape). */
  def q27Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(when($"o_orderstatus" === "F", 1)).as("n_f"),
        count(when($"o_orderstatus" === "O", 1)).as("n_o"),
        count(when($"o_orderstatus" === "P", 1)).as("n_p"))
  }

  /** Approximate count-distinct (HLL++). No oracle — DuckDB's HLL differs
    * by construction; driver records the rows-only check. The spec asserts
    * the estimate is within rsd of exact. */
  def q28ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
           approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
  }

  /** Moment statistics from exact decimal sums: stddev/variance computed
    * via the n·Σx² − (Σx)² identity so both engines do the identical
    * double arithmetic on identical exact inputs. */
  def q29Stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
           sum(Tables.dec($"o_totalprice")).cast("double").as("s1"),
           sum(Tables.dec($"o_totalprice") * Tables.dec($"o_totalprice")).cast("double").as("s2"))
      .select($"o_orderstatus", $"n",
        (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("variance"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("stddev"))
  }

  /** GROUPING SETS through the SQL entry point (EP2 — spark.sql IS part of
    * the engine surface), including grouping_id disambiguation. */
  def q30GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("li_gs")
    spark.sql(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             COUNT(*) AS n, ${Tables.sqlDsum("l_quantity")} AS qty
      FROM li_gs
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """)
  }

  /** Array & map scalar functions over JSON props: keys, values, sequences,
    * array algebra — emitted as joined strings for engine-neutral compare. */
  def q31ArrayMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir).select(
      $"event_id",
      array_join(map_keys(from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))), ",").as("prop_keys"),
      array_join(map_values(from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))), ",").as("prop_vals"),
      array_join(transform(sequence(lit(1), ($"event_id" % 5 + 1).cast("int")),
        x => x.cast("string")), "-").as("seq_str"),
      size(array_intersect(split($"event_type", ""),
                           array(lit("c"), lit("i"), lit("k")))).as("n_common_letters"))
  }

  /** ALL-variant set operations (duplicate-preserving). */
  def q32SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.orders(spark, dir).select($"o_custkey".as("k")).filter($"k" < 200)
    val b = Tables.customer(spark, dir).filter($"c_acctbal" > 0)
      .select($"c_custkey".as("k")).filter($"k" < 200)
    a.intersectAll(b).groupBy(lit("intersect_all").as("op")).agg(count(lit(1)).as("n"))
      .unionByName(a.exceptAll(b).groupBy(lit("except_all").as("op")).agg(count(lit(1)).as("n")))
      .unionByName(a.unionAll(b).groupBy(lit("union_all").as("op")).agg(count(lit(1)).as("n")))
  }

  /** min_by / max_by (argmin/argmax) with tie-safe composite ordering. */
  def q33MinMaxBy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("max_price_order"),
        min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("min_price_order"),
        max($"o_totalprice").as("max_price"))
  }

  /** Exact lower-median without interpolation (portable across engines —
    * interpolating percentile implementations differ in the last ulp). */
  def q34Median(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    val n = Window.partitionBy($"o_orderstatus")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(n))
      .filter($"rn" === expr("(cnt + 1) div 2")) // Column./ would be double division
      .select($"o_orderstatus", $"o_totalprice".as("lower_median"))
  }

  /** Correlated aggregate subquery (decorrelated by Catalyst into an
    * aggregate + join): customers above their own nation's mean balance. */
  def q35CorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("cust_cs")
    spark.sql("""
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM cust_cs o
      WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(i.c_acctbal AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
                                / COUNT(*)
                         FROM cust_cs i
                         WHERE i.c_nationkey = o.c_nationkey)
    """)
  }

  /** Distribution window functions: ntile, percent_rank, cume_dist
    * (integer-derived doubles — identical formulas in both engines). */
  def q36WindowDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 50)
      .select($"o_orderstatus", $"o_orderkey",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  val queries: Map[String, Q] = Map(
    "q26_asof_join"      -> q26AsofJoin _,
    "q27_pivot"          -> q27Pivot _,
    "q28_approx_distinct" -> q28ApproxDistinct _,
    "q29_stats"          -> q29Stats _,
    "q30_grouping_sets"  -> q30GroupingSets _,
    "q31_array_map_funcs" -> q31ArrayMapFuncs _,
    "q32_set_ops_all"    -> q32SetOpsAll _,
    "q33_min_max_by"     -> q33MinMaxBy _,
    "q34_median"         -> q34Median _,
    "q35_correlated_subquery" -> q35CorrelatedSubquery _,
    "q36_window_distribution" -> q36WindowDistribution _,
  )

  val oracles: Map[String, String] = Map(
    "q26_asof_join" ->
      """SELECT event_id, user_id, o_orderkey AS asof_orderkey,
                o_totalprice AS asof_totalprice
         FROM (
           SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY e.event_id
                                     ORDER BY o.o_orderdate DESC NULLS LAST,
                                              o.o_orderkey DESC NULLS LAST) AS rn
           FROM (SELECT * FROM events WHERE event_id % 50 = 0) e
           LEFT JOIN orders o
             ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
         WHERE rn = 1""",
    "q27_pivot" ->
      """SELECT o_orderpriority,
                COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    // q28: no oracle on purpose (engine-specific HLL) → rows-only check
    "q29_stats" ->
      """SELECT o_orderstatus, n,
                (s2 - s1 * s1 / n) / (n - 1) AS variance,
                sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev
         FROM (
           -- DECIMAL(12,4): DuckDB refuses 18x18 decimal multiplication
           -- (product precision > 38); prices are 2-decimal so (12,4) is
           -- still exact, and exactness is all parity needs
           SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS STRING) AS DOUBLE) AS s1,
                  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))
                           * CAST(o_totalprice AS DECIMAL(12,4))) AS STRING) AS DOUBLE) AS s2
           FROM orders GROUP BY o_orderstatus)""",
    "q30_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
          CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
          CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
          COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",
    "q31_array_map_funcs" ->
      """SELECT event_id,
                array_to_string(json_keys(props), ',') AS prop_keys,
                array_to_string(list_transform(json_keys(props),
                  k -> json_extract_string(props, '$.' || k)), ',') AS prop_vals,
                array_to_string(range(1, CAST(event_id % 5 AS INT) + 2), '-') AS seq_str,
                CAST(len(list_intersect(string_split(event_type, ''),
                                        ['c', 'i', 'k'])) AS INT) AS n_common_letters
         FROM events""",
    "q32_set_ops_all" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_custkey < 200),
              b AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0 AND c_custkey < 200)
         SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
         UNION ALL
         SELECT 'except_all', COUNT(*) FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
         UNION ALL
         SELECT 'union_all', COUNT(*) FROM (SELECT k FROM a UNION ALL SELECT k FROM b)""",
    // DuckDB's arg_max can't order by a struct — rewrite via row_number
    "q33_min_max_by" ->
      """WITH ranked AS (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey) AS rmin
           FROM orders)
         SELECT o_orderpriority,
                MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_price_order,
                MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_price_order,
                MAX(o_totalprice) AS max_price
         FROM ranked GROUP BY o_orderpriority""",
    "q34_median" ->
      """SELECT o_orderstatus, o_totalprice AS lower_median
         FROM (
           SELECT o_orderstatus, o_totalprice, o_orderkey,
                  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                     ORDER BY o_totalprice, o_orderkey) AS rn,
                  COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
           FROM orders) t
         WHERE rn = (cnt + 1) // 2""",
    "q35_correlated_subquery" ->
      """SELECT c_custkey, c_nationkey, c_acctbal
         FROM customer o
         WHERE c_acctbal > (SELECT CAST(CAST(SUM(CAST(i.c_acctbal AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
                                   / COUNT(*)
                            FROM customer i
                            WHERE i.c_nationkey = o.c_nationkey)""",
    "q36_window_distribution" ->
      """SELECT o_orderstatus, o_orderkey,
                CAST(NTILE(4) OVER w AS INT) AS quartile,
                PERCENT_RANK() OVER w AS pct_rank,
                CUME_DIST() OVER w AS cume
         FROM orders
         WHERE o_custkey < 50
         WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""",
  )
}
