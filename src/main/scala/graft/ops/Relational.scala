package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.Tables.{dec, dsum, davg, sqlDsum, sqlDavg}

/** The relational operator catalog (SURVEY.md §2.2): one named query per
  * operator family, each with a DuckDB oracle in [[oracles]].
  *
  * Scale notes (100 TB posture), applied throughout:
  *  - dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *    explicitly `broadcast()` so fact-table joins never shuffle the big side;
  *  - aggregations are expressed declaratively so Catalyst plans partial
  *    (map-side) aggregation before the exchange;
  *  - double sums are cast to decimal (exact, order-independent) — also the
  *    right call at 1000 executors where partition order is nondeterministic;
  *  - no collect(), no driver-side loops; every query is a single lazy plan.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 flavor: scan → filter → hash-agg (partial+final) → sort.
    * The filter and the 7-column projection both push into the parquet scan. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Projection + conjunctive predicates, all pushed to the parquet scan. */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1998-01-01").cast("timestamp") &&
              $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount")
  }

  /** TPC-H Q3 flavor: 3-way join (fact-fact shuffle join + filters),
    * agg, deterministic top-10. */
  def q03TopRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord  = Tables.orders(spark, dir)
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** Left-semi join (EXISTS): orders having any heavy lineitem. */
  def q04PrioritySemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val heavy = Tables.lineitem(spark, dir).filter($"l_quantity" > 45)
      .select($"l_orderkey")
    Tables.orders(spark, dir)
      .join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q5 flavor: snowflake join over a 1-year order window.
    *
    * Scale shape (the 100 TB story): the region/nation restriction is
    * pushed to the *inputs* of the fact joins, not applied after them —
    * customer and supplier are each semi-/equi-joined against the
    * broadcast ASIA nation-key set first, and orders carries the date
    * filter, so the expensive shuffles (orders⋈customer on custkey,
    * lineitem⋈orders on orderkey) move ~1/5 of customers and ~1/7 of
    * orders instead of everything. The earlier form joined the full
    * lineitem⋈orders⋈customer fact chain and only then dropped non-ASIA
    * rows at the supplier broadcast — at 1000 executors that full
    * fact-fact shuffle dominates the query. */
  def q05NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tiny: ASIA nation keys (+ names for the final rollup), broadcast
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val custAsia = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), $"c_nationkey" === $"n_nationkey", "left_semi")
      .select($"c_custkey", $"c_nationkey")
    val supAsia = Tables.supplier(spark, dir)
      .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey", "left_semi")
      .select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    // orders ⋈ ASIA customers first: the orderkey-side shuffles below move
    // only the surviving ~1/5 of the date-filtered orders
    val ordAsia = ord.join(custAsia, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_nationkey")
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(supAsia), $"l_suppkey" === $"s_suppkey")
      .join(ordAsia, $"l_orderkey" === $"o_orderkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(asiaNations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
  }

  /** Scalar (ungrouped) aggregate — TPC-H Q6 flavor. */
  def q06RevenueForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount".between(0.03, 0.07) && $"l_quantity" < 25)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Left-anti join (NOT EXISTS): customers that never placed an urgent
    * order (plain "never ordered" is empty at every SF of this dataset). */
  def q07CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
              .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_acctbal")
  }

  /** Left outer join preserving customers with zero orders; count(col)
    * skips the nulls the outer join introduces — matches SQL semantics. */
  def q08CustomerOrderCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"), dsum($"o_totalprice").as("total_spend"))
  }

  /** Full outer join of two aggregates (nation-level customer vs supplier
    * balance); aggregate-then-join keeps both sides small before the join. */
  def q09NationBalanceFullOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).groupBy($"c_nationkey")
      .agg(dsum($"c_acctbal").as("cust_bal"))
    val s = Tables.supplier(spark, dir).groupBy($"s_nationkey")
      .agg(dsum($"s_acctbal").as("supp_bal"))
    c.join(s, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
              $"cust_bal", $"supp_bal")
  }

  /** Ranking window: deterministic top-3 orders per priority class. */
  def q10TopOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice", $"rn")
  }

  /** Running-total window frame (exact decimal running sum). */
  def q11RunningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 100)
      .withColumn("running_spend", sum(dec($"o_totalprice")).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"running_spend")
  }

  /** lag/lead windows: per-customer inter-order gap in seconds. */
  def q12OrderGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 100)
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .withColumn("next_key", lead($"o_orderkey", 1).over(w))
      .select($"o_custkey", $"o_orderkey",
              (unix_timestamp($"o_orderdate") - unix_timestamp($"prev_date")).as("gap_seconds"),
              $"next_key")
  }

  /** Set operations: INTERSECT / EXCEPT / UNION on key sets, tagged.
    * r19 shape: the three set operations are evaluated as boolean flags
    * over ONE full-outer join of the two distinct key sets (custkey is
    * unique on both sides), and the tag rows fall out of a map-side
    * explode — 2 exchanges (buyers' distinct, customer's join shuffle)
    * instead of the per-branch intersect/except/union-distinct plans
    * that re-shuffled the same key sets once per branch. Row set is
    * identical (oracle-pinned): intersect ⇔ b∧p, except ⇔ p∧¬b,
    * union-distinct ⇔ r∨b over unique keys. */
  def q13SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buyers = Tables.orders(spark, dir).select($"o_custkey".as("custkey"))
      .distinct().withColumn("is_buyer", lit(true))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey".as("custkey"),
        ($"c_acctbal" > 0).as("is_positive"), ($"c_acctbal" > 900).as("is_rich"))
    cust.join(buyers, Seq("custkey"), "full_outer")
      .select($"custkey",
        coalesce($"is_buyer", lit(false)).as("b"),
        coalesce($"is_positive", lit(false)).as("p"),
        coalesce($"is_rich", lit(false)).as("r"))
      .select($"custkey", explode(array(
        when($"b" && $"p", "buyer_positive"),
        when($"p" && !$"b", "positive_nonbuyer"),
        when($"r" || $"b", "rich_or_buyer"))).as("tag"))
      .filter($"tag".isNotNull)
      .select($"tag", $"custkey")
  }

  /** Distinct aggregates (exact). */
  def q14DistinctCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
           countDistinct($"l_suppkey").as("n_supps"),
           count(lit(1)).as("n_rows"))
  }

  /** ROLLUP grouping sets with subtotal rows. */
  def q15RollupSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("sales"))
  }

  /** CUBE grouping sets. */
  def q16CubeSales(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("sales"))
  }

  /** Scalar string-function gallery (all codegen'd built-ins). */
  def q17StringGallery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir).select(
      $"p_partkey",
      upper($"p_name").as("name_upper"),
      length($"p_name").as("name_len"),
      substring($"p_name", 1, 5).as("name_head"),
      concat($"p_brand", lit("-"), $"p_type").as("brand_type"),
      regexp_replace($"p_name", "a", "@").as("name_at"),
      split($"p_name", " ").getItem(0).as("first_word"),
      lpad($"p_brand", 10, "*").as("brand_pad"))
  }

  /** Date/time functions: extraction + truncation grouping. */
  def q18DateBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("o_year"),
               month($"o_orderdate").as("o_month"),
               date_trunc("month", $"o_orderdate").cast("timestamp_ntz").as("month_start"))
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sales"))
  }

  /** JSON scalar functions over the events.props column. */
  def q19JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(sum($"k").cast("long").as("sum_k"),
           count($"k").as("n"),
           max($"k").as("max_k"))
  }

  /** CASE WHEN bucketing + conditional aggregation. */
  def q20PriceBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("band",
        when($"o_totalprice" < 50000, "low")
          .when($"o_totalprice" < 150000, "mid")
          .otherwise("high"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n"),
           dsum(when($"o_orderstatus" === "F", $"o_totalprice").otherwise(lit(0.0))).as("finished_sales"))
  }

  /** GROUP BY ... HAVING. */
  def q21Having(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"), davg($"c_acctbal").as("avg_bal"))
      .filter($"n_cust" >= 50)
  }

  /** IN-subquery (rewritten by Catalyst to a semi join). */
  def q22InSubquery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val debtors = Tables.customer(spark, dir).filter($"c_acctbal" < 0)
      .select($"c_custkey")
    Tables.orders(spark, dir)
      .join(debtors, $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
  }

  /** Scalar subquery: parts priced above the (deterministic) global mean. */
  def q23AboveAvgParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, dir)
    val stats = p.agg((sum(dec($"p_retailprice")).cast("double") / count(lit(1))).as("avg_price"))
    p.join(broadcast(stats))
      .filter($"p_retailprice" > $"avg_price")
      .select($"p_partkey", $"p_retailprice")
  }

  /** Cross join (small-small) with inequality dedup of pairs. */
  def q24RegionPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r1 = Tables.region(spark, dir).select($"r_regionkey".as("k1"), $"r_name".as("name1"))
    val r2 = Tables.region(spark, dir).select($"r_regionkey".as("k2"), $"r_name".as("name2"))
    r1.crossJoin(r2).filter($"k1" < $"k2").select($"name1", $"name2")
  }

  /** Range (non-equi) self-join: events of the same user within 5 minutes.
    * Equi key (user_id) bounds the join; the range predicate filters inside
    * each key group — at cluster scale this shuffles by user, never cross. */
  def q25EventRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e  = Tables.events(spark, dir)
    val e1 = e.select($"user_id", $"event_id".as("id1"), $"ts".as("ts1"))
    val e2 = e.select($"user_id".as("uid2"), $"event_id".as("id2"), $"ts".as("ts2"))
    e1.join(e2, $"user_id" === $"uid2" && $"id1" < $"id2" &&
                $"ts2" >= $"ts1" && $"ts2" <= $"ts1" + expr("INTERVAL 5 MINUTES"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_pairs"))
  }

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary"    -> q01PricingSummary _,
    "q02_filter_project"     -> q02FilterProject _,
    "q03_top_revenue_orders" -> q03TopRevenueOrders _,
    "q04_priority_semi_join" -> q04PrioritySemiJoin _,
    "q05_nation_revenue"     -> q05NationRevenue _,
    "q06_revenue_forecast"   -> q06RevenueForecast _,
    "q07_customers_without_orders" -> q07CustomersWithoutOrders _,
    "q08_customer_order_counts"    -> q08CustomerOrderCounts _,
    "q09_nation_balance_full_outer" -> q09NationBalanceFullOuter _,
    "q10_top_orders_per_priority"  -> q10TopOrdersPerPriority _,
    "q11_running_customer_spend"   -> q11RunningCustomerSpend _,
    "q12_order_gaps"         -> q12OrderGaps _,
    "q13_set_ops"            -> q13SetOps _,
    "q14_distinct_counts"    -> q14DistinctCounts _,
    "q15_rollup_sales"       -> q15RollupSales _,
    "q16_cube_sales"         -> q16CubeSales _,
    "q17_string_gallery"     -> q17StringGallery _,
    "q18_date_buckets"       -> q18DateBuckets _,
    "q19_json_extract"       -> q19JsonExtract _,
    "q20_price_bands"        -> q20PriceBands _,
    "q21_having"             -> q21Having _,
    "q22_in_subquery"        -> q22InSubquery _,
    "q23_above_avg_parts"    -> q23AboveAvgParts _,
    "q24_region_pairs"       -> q24RegionPairs _,
    "q25_event_range_join"   -> q25EventRangeJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${sqlDsum("l_quantity")} AS sum_qty,
         ${sqlDsum("l_extendedprice")} AS sum_base_price,
         ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         ${sqlDavg("l_quantity")} AS avg_qty,
         ${sqlDavg("l_extendedprice")} AS avg_price,
         ${sqlDavg("l_discount")} AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""",
    "q03_top_revenue_orders" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q04_priority_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderpriority""",
    "q05_nation_revenue" ->
      s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "q06_revenue_forecast" ->
      s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""",
    "q07_customers_without_orders" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')""",
    "q08_customer_order_counts" ->
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         ${sqlDsum("o_totalprice")} AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q09_nation_balance_full_outer" ->
      s"""WITH c AS (SELECT c_nationkey, ${sqlDsum("c_acctbal")} AS cust_bal
                     FROM customer GROUP BY c_nationkey),
              s AS (SELECT s_nationkey, ${sqlDsum("s_acctbal")} AS supp_bal
                     FROM supplier GROUP BY s_nationkey)
         SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, cust_bal, supp_bal
         FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey""",
    "q10_top_orders_per_priority" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
                CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q11_running_customer_spend" ->
      """SELECT o_custkey, o_orderkey,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS STRING) AS DOUBLE) AS running_spend
         FROM orders WHERE o_custkey < 100""",
    "q12_order_gaps" ->
      """SELECT o_custkey, o_orderkey,
                date_diff('second',
                          LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                          o_orderdate) AS gap_seconds,
                LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key
         FROM orders WHERE o_custkey < 100""",
    "q13_set_ops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
              positive AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0),
              rich AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 900)
         SELECT 'buyer_positive' AS tag, custkey FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM positive)
         UNION ALL
         SELECT 'positive_nonbuyer' AS tag, custkey FROM (SELECT custkey FROM positive EXCEPT SELECT custkey FROM buyers)
         UNION ALL
         SELECT 'rich_or_buyer' AS tag, custkey FROM (SELECT custkey FROM rich UNION SELECT custkey FROM buyers)""",
    "q14_distinct_counts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
                COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "q15_rollup_sales" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${sqlDsum("l_extendedprice")} AS sales
          FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q16_cube_sales" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          ${sqlDsum("o_totalprice")} AS sales
          FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "q17_string_gallery" ->
      """SELECT p_partkey, UPPER(p_name) AS name_upper,
                CAST(LENGTH(p_name) AS INT) AS name_len,
                SUBSTRING(p_name, 1, 5) AS name_head,
                p_brand || '-' || p_type AS brand_type,
                REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_at,
                SPLIT_PART(p_name, ' ', 1) AS first_word,
                LPAD(p_brand, 10, '*') AS brand_pad
         FROM part""",
    "q18_date_buckets" ->
      s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
          CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS o_month,
          CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
          COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sales
          FROM orders GROUP BY 1, 2, 3""",
    "q19_json_extract" ->
      """SELECT event_type,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                COUNT(json_extract_string(props, '$.k')) AS n,
                MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type""",
    "q20_price_bands" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                      WHEN o_totalprice < 150000 THEN 'mid'
                      ELSE 'high' END AS band,
          COUNT(*) AS n,
          ${sqlDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS finished_sales
          FROM orders GROUP BY 1""",
    "q21_having" ->
      s"""SELECT c_nationkey, COUNT(*) AS n_cust, ${sqlDavg("c_acctbal")} AS avg_bal
          FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 50""",
    "q22_in_subquery" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
         GROUP BY o_orderstatus""",
    "q23_above_avg_parts" ->
      """SELECT p_partkey, p_retailprice FROM part
         WHERE p_retailprice > (SELECT CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
                                       / COUNT(*) FROM part)""",
    "q24_region_pairs" ->
      """SELECT r1.r_name AS name1, r2.r_name AS name2
         FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey < r2.r_regionkey""",
    "q25_event_range_join" ->
      """SELECT e1.user_id, COUNT(*) AS n_pairs
         FROM events e1 JOIN events e2
           ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
          AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
         GROUP BY e1.user_id""",
  )
}
