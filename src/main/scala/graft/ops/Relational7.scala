package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.{davg, dec, dsum, sqlDavg, sqlDec2Dbl, sqlDsum}

/** Seventh wave of the delegated-engine SQL surface (SURVEY §2.2): the
  * decision-support query shapes a warehouse user runs daily that hadn't
  * appeared yet — linear-regression aggregates, disjunctive-predicate
  * star joins, argmax-by-scalar-subquery, correlated per-group-average
  * filters, HAVING-driven semi joins, and the double-correlated
  * EXISTS / NOT EXISTS "exactly one offender per group" pattern
  * (reformulated as one grouped pass for scale).
  *
  * Numeric parity follows the q29 discipline (Relational2.scala): every
  * moment is an exact decimal sum cast to double, and both engines then
  * run the textually identical double formula, so order-of-addition can
  * never diverge the hashes.
  */
object Relational7 {

  type Q = (SparkSession, String) => DataFrame

  private val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  /** q82: regression/correlation aggregate family (regr_slope,
    * regr_intercept, regr_r2, corr) of extended price on quantity per
    * return flag. Implemented through the five exact-decimal moments
    * rather than the built-in regr_* aggregates: the built-ins stream
    * doubles in partition order (non-deterministic across engines and
    * runs), while moment sums are order-independent and reduce map-side —
    * one partial-agg pass at any scale, no second shuffle. */
  def q82RegrStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = dec($"l_quantity")
    val y = dec($"l_extendedprice")
    val m = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"), sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
    val cov = $"n" * $"sxy" - $"sx" * $"sy"
    val vx  = $"n" * $"sxx" - $"sx" * $"sx"
    val vy  = $"n" * $"syy" - $"sy" * $"sy"
    m.select($"l_returnflag", $"n",
      (cov / vx).as("slope"),
      (($"sy" - cov / vx * $"sx") / $"n").as("intercept"),
      (cov * cov / (vx * vy)).as("r2"),
      (cov / sqrt(vx * vy)).as("corr"))
  }

  /** q83: shipping-priority split by ship month (TPC-H Q12 shape) — did
    * critical-priority orders ship late in some month? Conditional counts
    * after an orders⋈lineitem equi-join; counts are exact so no decimal
    * machinery is needed. Scale: one shuffle on the join key, the
    * 12-group agg is map-side partial. */
  def q83PriorityShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .filter(year($"l_shipdate") === 1997)
      .groupBy(month($"l_shipdate").as("ship_month"))
      .agg(
        sum(when($"o_orderpriority".isin(hi: _*), 1L).otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin(hi: _*), 0L).otherwise(1L)).as("low_line_count"))
  }

  /** q84: promotion revenue share per ship month (TPC-H Q14 shape) — the
    * conditional-numerator / total-denominator percentage. part is the
    * small dimension, so it BROADCASTS; both sums come out of one agg
    * pass and the division is one double op on exact inputs. */
  def q84PromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .filter(year($"l_shipdate") === 1997)
      .groupBy(month($"l_shipdate").as("ship_month"))
      .agg(
        sum(when($"p_type" === "PROMO", dec(revenue)).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("double").as("promo_revenue"),
        dsum(revenue).as("total_revenue"))
      .select($"ship_month",
        (lit(100.0) * $"promo_revenue" / $"total_revenue").as("promo_share_pct"),
        $"total_revenue")
  }

  /** q85: top supplier(s) by quarterly revenue (TPC-H Q15 shape) — the
    * argmax-via-scalar-subquery pattern. The per-supplier revenue agg is
    * one shuffle; its 1-row MAX broadcasts back as a cross join, so the
    * "WHERE total = (SELECT MAX…)" never materializes a second shuffle.
    * Ties return every winner, identically in both engines because the
    * totals are exact-decimal-derived doubles. */
  def q85TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(dsum(revenue).as("total_revenue"))
    // r19: the global max as an unpartitioned window over the
    // supplier-cardinality revenue frame — the scalar-agg + cross-join
    // form re-ran the fact filter+agg a second time to produce it (no
    // exchange reuse). The single-partition window holds (suppkey,
    // revenue) pairs only, the s18-style bounded scalar shape.
    val mx = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.supplier(spark, dir)
      .join(rev.withColumn("mx", max($"total_revenue").over(mx)),
        $"s_suppkey" === $"l_suppkey")
      .filter($"total_revenue" === $"mx")
      .select($"s_suppkey", $"s_name", $"total_revenue")
  }

  /** q86: small-quantity-order revenue (TPC-H Q17 shape) — lineitems of
    * one brand under 20% of their part's average quantity. The r19 form
    * hand-applies the rewrite Catalyst's decorrelation stops short of:
    * the correlated average is only ever probed for the one brand's
    * parts, so the brand filter (a broadcast semi-reduction of part)
    * lands on the fact table BEFORE the per-part average — the
    * per-part agg shuffles ~1/1000 of lineitem instead of all of it,
    * and no second full fact scan feeds the subquery. The average is
    * unchanged per part (it reads every lineitem OF THAT PART — part
    * membership, not the WHERE, defines its input), so the result is
    * row-identical; the oracle keeps the correlated-subquery SQL to pin
    * the equivalence. The 0.2·avg threshold keeps the davg identity so
    * the doubles are bit-identical across engines. */
  def q86SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val brandParts = Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#11").select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val avgQ = li.groupBy($"l_partkey".as("pk"))
      .agg((sum(dec($"l_quantity")).cast("double") / count($"l_quantity"))
        .as("avg_qty"))
    li.join(broadcast(avgQ), $"l_partkey" === $"pk")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((dsum($"l_extendedprice") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** q87: large-volume customers (TPC-H Q18 shape) — orders whose total
    * quantity clears a HAVING threshold, then enriched with customer and
    * order attributes. The heavy agg happens FIRST on the fact table
    * (map-side partials), and only the ~1% surviving orderkeys join back
    * — the join input shrinks before it shuffles. */
  def q87LargeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(dec($"l_quantity")).as("qty"))
      .filter($"qty" > 250)
      .select($"l_orderkey", $"qty".cast("double").as("total_qty"))
    big.join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"total_qty")
  }

  /** q88: disjunctive-predicate star join (TPC-H Q19 shape) — revenue
    * from three OR'd brand/size/quantity bands. The per-band conjuncts
    * straddle both tables, so no single band can be pushed below the
    * join; what CAN be pushed is the union envelope on each side
    * (brand ∈ {…} on part, quantity in the covering range on lineitem),
    * which Catalyst derives from the OR automatically. part broadcasts. */
  def q88DisjunctiveJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val band1 = $"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)
    val band2 = $"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)
    val band3 = $"p_brand" === "Brand#34" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), $"l_partkey" === $"p_partkey")
      .filter(band1 || band2 || band3)
      .agg(dsum(revenue).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** q89: suppliers who kept orders waiting (TPC-H Q21 shape) — late
    * lineitems (shipped >90 days after the order date) in finished
    * multi-supplier orders where this supplier was the ONLY late one.
    * The reference SQL is a double correlated EXISTS / NOT EXISTS; that
    * reformulates exactly to two distinct-counts per order (suppliers,
    * late suppliers), which is ONE grouped pass over the fact table plus
    * a join back — the 100 TB plan. The oracle keeps the EXISTS form to
    * pin the equivalence. */
  def q89WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r19 shape: the fact⋈orders join is computed ONCE — per-(order,
    // supplier) late counts first (the join's l_orderkey partitioning
    // already satisfies the grouping, so the agg adds no exchange), the
    // per-order distinct-supplier counts as a window over that
    // order-keyed frame, never a second fact join. The previous form
    // built the join twice and re-joined the per-order agg back on
    // orderkey. numwait still counts late line items (sum of per-pair
    // late counts), oracle-pinned against the EXISTS form.
    val perOS = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
        1L).otherwise(0L)).as("n_late_items"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
    perOS
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp",
        sum(when($"n_late_items" > 0, 1L).otherwise(0L)).over(w))
      .filter($"n_late_items" > 0 && $"n_supp" > 1 && $"n_late_supp" === 1)
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(sum($"n_late_items").as("numwait"))
  }

  /** q90: idle high-balance customers (TPC-H Q22 shape) — customers above
    * the positive-balance average with no recent orders, rolled up by
    * market segment. The global average is a 1-row broadcast; the "no
    * recent orders" test is a left-anti join against the distinct recent
    * buyer set (Spark's null-safe anti-join shape, same as NOT EXISTS). */
  def q90IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter($"c_acctbal" > 0).agg(davg($"c_acctbal").as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2000-08-01").cast("timestamp"))
      .select($"o_custkey").distinct()
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
  }

  /** q91: median absolute deviation — the robust spread statistic (the
    * outlier-insensitive sibling of q29's stddev). Two exact-interpolation
    * percentile passes: per-group median (5 rows, broadcast back), then
    * the median of |x − med|. The interpolation was proven engine-identical
    * in q55; the |x − med| input is one IEEE subtraction on both sides. */
  def q91Mad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val med = orders.groupBy($"o_orderpriority")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("med"))
    orders.join(broadcast(med), "o_orderpriority")
      .withColumn("adev", abs($"o_totalprice" - $"med"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        min($"med").as("median_price"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").as("mad"))
  }

  /** q92: deterministic mode — most frequent quantity per return flag with
    * an explicit (count desc, value asc) tie-break, because both engines'
    * built-in mode() leave ties unspecified. Count-then-rank: the heavy agg
    * shrinks the data to (group × distinct value) before the tiny window. */
  def q92Mode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("n_mode"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"n_mode".desc, $"l_quantity".asc)
    counts.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"n_mode")
  }

  /** q93: first-touch attribution — every purchase attributed to the
    * user's most recent click within the preceding 24 h. The as-of logic
    * is the union + last(IGNORE NULLS) device (clicks sort before
    * purchases at equal timestamps): ONE shuffle by user_id, no
    * range-join blowup — at 100 TB this is the only as-of plan that
    * doesn't explode, and it complements q26's filtered-probe window
    * form. */
  def q93FirstTouch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val uni = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"),
          lit(null).cast("long").as("purchase_id"))
      .unionByName(ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(null).cast("long").as("click_id"),
          $"event_id".as("purchase_id")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy($"ts",
        when($"click_id".isNotNull, 0).otherwise(1),
        coalesce($"click_id", $"purchase_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    uni
      .withColumn("last_click", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when($"click_id".isNotNull, $"ts"), ignoreNulls = true).over(w))
      .filter($"purchase_id".isNotNull)
      .select($"purchase_id", $"user_id",
        when($"last_click_ts" >= $"ts" - expr("INTERVAL 24 HOURS"), $"last_click")
          .as("attributed_click_id"),
        coalesce($"last_click_ts" >= $"ts" - expr("INTERVAL 24 HOURS"), lit(false))
          .as("attributed"))
  }

  /** q94: event-transition matrix — per-user next-event Markov counts and
    * conditional probabilities (the funnel-free way to read behavioral
    * flow; q56's funnel is one row of this matrix). One user-keyed window
    * for the lead, one (from, to) agg; the from-marginals are
    * event-type-cardinality rows, broadcast back. The probability is one
    * exact-integer division, so the matrix is engine-exact. */
  def q94EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val counts = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val marginals = counts.groupBy($"from_type").agg(sum($"n").as("n_from"))
    counts.join(broadcast(marginals), "from_type")
      .select($"from_type", $"to_type", $"n",
        ($"n".cast("double") / $"n_from").as("prob"))
  }

  /** q95: ratio-to-report — each (priority, status) revenue cell as a
    * share of its priority row and of the grand total (the percent-of-
    * total read every BI layer ships). The windows run over the AGG
    * output (group-cardinality rows, never the fact table), and the
    * summed values stay exact decimal until the final division, so the
    * shares are engine-exact despite being window sums of "doubles". */
  def q95ShareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val agg = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(sum(dec($"o_totalprice")).as("revd"))
    agg.select($"o_orderpriority", $"o_orderstatus",
      $"revd".cast("double").as("revenue"),
      ($"revd".cast("double")
        / sum($"revd").over(w.partitionBy($"o_orderpriority")).cast("double"))
        .as("share_in_priority"),
      ($"revd".cast("double")
        / sum($"revd").over(w.partitionBy()).cast("double"))
        .as("share_of_total"))
  }

  /** q96: Pareto concentration — per market segment, how many customers
    * (and what fraction of the base) carry 80% of revenue. The cumulative
    * share runs over per-customer aggregates (never the fact table) and
    * stays exact decimal end-to-end: the 80% test is the integer-scaled
    * decimal comparison 5·cum_before < 4·total, so no double ever enters
    * a cumulative sum and both engines agree exactly. */
  def q96Pareto(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"c_custkey")
      .agg(sum(dec($"o_totalprice")).as("revd"))
    val cumW = w.partitionBy($"c_mktsegment")
      .orderBy($"revd".desc, $"c_custkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val totW = w.partitionBy($"c_mktsegment")
    rev
      .withColumn("cum", sum($"revd").over(cumW))
      .withColumn("tot", sum($"revd").over(totW))
      // a customer is in the top set while the revenue BEFORE them hasn't
      // yet covered 80% of the segment
      .withColumn("in_top", ($"cum" - $"revd") * 5 < $"tot" * 4)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(when($"in_top", 1L).otherwise(0L)).as("n_top80"),
        (sum(when($"in_top", 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("top80_frac"))
  }

  /** q97: decile lift table — customers ranked into spend deciles
    * (NTILE(10) over exact-decimal totals), with per-decile revenue,
    * share of total, and cumulative share: the concentration readout a
    * marketing/curation run uses to pick a cutoff (q96 answers "how many
    * carry 80%?", this answers "what does each tenth carry?"). NTILE's
    * remainder rule (earlier buckets get the extra row) is identical in
    * Spark and DuckDB, and every sum is decimal until the final share
    * divisions, so the table is engine-exact. Shape: one per-customer
    * agg, one decile window over the (small) aggregate, one 10-row
    * rollup — the fact table shuffles once. */
  def q97DecileLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(dec($"o_totalprice")).as("revd"), count(lit(1)).as("n_orders"))
    val decile = rev.withColumn("decile",
      ntile(10).over(w.orderBy($"revd".desc, $"o_custkey")))
    val per = decile.groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        sum($"n_orders").as("n_orders"),
        sum($"revd").as("rev_dec"))
    val cumW = w.orderBy($"decile")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    per
      .withColumn("cum_dec", sum($"rev_dec").over(cumW))
      .withColumn("tot", sum($"rev_dec").over(w.partitionBy()))
      .select($"decile", $"n_customers", $"n_orders",
        $"rev_dec".cast("double").as("revenue"),
        ($"rev_dec".cast("double") / $"tot".cast("double")).as("share"),
        ($"cum_dec".cast("double") / $"tot".cast("double")).as("cum_share"))
  }

  /** q98: the modern SQL entry-point affordances a migrating user
    * reaches for, exercised together so the SURFACE is covered, not just
    * the semantics: (1) a named-parameter query (`spark.sql(text, args)`
    * with `:name` markers — the injection-safe form, no string
    * interpolation), (2) a declarative SQL scalar UDF
    * (`CREATE TEMPORARY FUNCTION … RETURNS … RETURN expr`, Spark 4's
    * engine-side function definition — the body INLINES into the plan
    * and stays inside whole-stage codegen, unlike a JVM closure UDF),
    * and (3) `GROUP BY ALL`. The oracle replays the same query with the
    * parameters and function body inlined (DuckDB shares the
    * GROUP BY ALL affordance). */
  def q98ModernSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("ord_q98")
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS price_band")
    spark.sql(
      """CREATE TEMPORARY FUNCTION price_band(p DOUBLE) RETURNS STRING
         RETURN CASE WHEN p >= 200000 THEN 'big'
                     WHEN p >= 100000 THEN 'mid'
                     ELSE 'small' END""")
    spark.sql(
      """SELECT o_orderpriority, price_band(o_totalprice) AS band,
                COUNT(*) AS n,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING)
                     AS DOUBLE) AS total
         FROM ord_q98
         WHERE o_orderdate >= :lo AND o_orderdate < :hi
         GROUP BY ALL""",
      Map("lo" -> "1996-01-01", "hi" -> "1997-01-01"))
  }

  /** q99: join-key skew audit — the measurement that DECIDES q42's
    * salting (its `buckets = 8` is a choice; this is where the number
    * comes from, run before any big keyed join at 100 TB). Per-key
    * frequency is one map-side-combined groupBy — the same shuffle the
    * join itself would pay, so the audit costs nothing extra in a
    * pipeline that joins next; the corpus-wide scalars (total rows, key
    * cardinality) come back as a 1-row broadcast; the report is the
    * top-5 heaviest keys (TakeOrderedAndProject, never a global sort)
    * with each key's share, its skew factor n·n_keys/total (how many
    * times an average partition this key alone is), and the salt-bucket
    * count an even split of it needs (ceil of the skew factor). The
    * factor multiplies in DOUBLE deliberately: the exact integer product
    * n·n_keys overflows Long on a big enough table (10^10-row key ×
    * 10^9 keys), while n and n_keys each stay far below 2^53 — the two
    * IEEE operations are the same on both engines, so parity holds. */
  def q99SkewAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = Tables.events(spark, dir).groupBy($"user_id")
      .agg(count(lit(1)).as("n"))
    val t = k.agg(sum($"n").as("total"), count(lit(1)).as("n_keys"))
    k.crossJoin(broadcast(t))
      .withColumn("skew_factor", $"n".cast("double") * $"n_keys" / $"total")
      .select($"user_id", $"n",
        (($"n" * 100).cast("double") / $"total").as("share_pct"),
        $"skew_factor",
        ceil($"skew_factor").as("recommended_salt"))
      .orderBy($"n".desc, $"user_id")
      .limit(5)
  }

  val queries: Map[String, Q] = Map(
    "q99_skew_audit"            -> q99SkewAudit _,
    "q98_modern_sql"            -> q98ModernSql _,
    "q97_decile_lift"           -> q97DecileLift _,
    "q96_pareto"                -> q96Pareto _,
    "q95_share_of_total"        -> q95ShareOfTotal _,
    "q94_event_transitions"     -> q94EventTransitions _,
    "q91_mad"                   -> q91Mad _,
    "q92_mode"                  -> q92Mode _,
    "q93_first_touch"           -> q93FirstTouch _,
    "q82_regr_stats"            -> q82RegrStats _,
    "q83_priority_shipping"     -> q83PriorityShipping _,
    "q84_promo_share"           -> q84PromoShare _,
    "q85_top_supplier"          -> q85TopSupplier _,
    "q86_small_qty_revenue"     -> q86SmallQtyRevenue _,
    "q87_large_volume_customers" -> q87LargeVolumeCustomers _,
    "q88_disjunctive_join"      -> q88DisjunctiveJoin _,
    "q89_waiting_suppliers"     -> q89WaitingSuppliers _,
    "q90_idle_customers"        -> q90IdleCustomers _,
  )

  // DuckDB twins. Decimal sums use (12,4)-based casts where products are
  // involved (DuckDB's product precision = p1+p2 must stay ≤ 38; inputs
  // are 4-decimal-exact, probe-verified) and the string→double hop from
  // Tables.sqlDec2Dbl everywhere a decimal leaves the aggregate.
  val oracles: Map[String, String] = Map(
    // skew factor multiplies in DOUBLE (overflow-safe), matching Spark
    "q99_skew_audit" ->
      """WITH k AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
          t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                       CAST(COUNT(*) AS BIGINT) AS n_keys FROM k)
         SELECT user_id, n,
                CAST(n * 100 AS DOUBLE) / total AS share_pct,
                CAST(n AS DOUBLE) * n_keys / total AS skew_factor,
                CAST(CEIL(CAST(n AS DOUBLE) * n_keys / total) AS BIGINT)
                  AS recommended_salt
         FROM k CROSS JOIN t
         ORDER BY n DESC, user_id LIMIT 5""",
    // parameters and the SQL-UDF body inlined; GROUP BY ALL is shared
    "q98_modern_sql" ->
      """SELECT o_orderpriority,
                CASE WHEN o_totalprice >= 200000 THEN 'big'
                     WHEN o_totalprice >= 100000 THEN 'mid'
                     ELSE 'small' END AS band,
                COUNT(*) AS n,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING)
                     AS DOUBLE) AS total
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY ALL""",
    "q97_decile_lift" ->
      s"""WITH rev AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revd,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1),
          ranked AS (
            SELECT *, NTILE(10) OVER (ORDER BY revd DESC, o_custkey) AS decile
            FROM rev),
          per AS (
            SELECT decile, COUNT(*) AS n_customers,
                   CAST(SUM(n_orders) AS BIGINT) AS n_orders,
                   SUM(revd) AS rev_dec
            FROM ranked GROUP BY 1)
          SELECT CAST(decile AS INT) AS decile, n_customers, n_orders,
                 ${sqlDec2Dbl("rev_dec")} AS revenue,
                 ${sqlDec2Dbl("rev_dec")} / ${sqlDec2Dbl("SUM(rev_dec) OVER ()")}
                   AS share,
                 ${sqlDec2Dbl("""SUM(rev_dec) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")}
                   / ${sqlDec2Dbl("SUM(rev_dec) OVER ()")} AS cum_share
          FROM per""",
    "q96_pareto" ->
      """WITH rev AS (
           SELECT c_mktsegment, c_custkey,
                  SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revd
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         cum AS (
           SELECT c_mktsegment, revd,
                  SUM(revd) OVER (PARTITION BY c_mktsegment
                                  ORDER BY revd DESC, c_custkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum,
                  SUM(revd) OVER (PARTITION BY c_mktsegment) AS tot
           FROM rev)
         SELECT c_mktsegment, COUNT(*) AS n_customers,
                CAST(SUM(CASE WHEN (cum - revd) * 5 < tot * 4
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
                CAST(SUM(CASE WHEN (cum - revd) * 5 < tot * 4
                              THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                  AS top80_frac
         FROM cum GROUP BY 1""",
    "q95_share_of_total" ->
      s"""WITH agg AS (
            SELECT o_orderpriority, o_orderstatus,
                   SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revd
            FROM orders GROUP BY 1, 2)
          SELECT o_orderpriority, o_orderstatus,
                 ${sqlDec2Dbl("revd")} AS revenue,
                 ${sqlDec2Dbl("revd")} / ${sqlDec2Dbl(
                   "SUM(revd) OVER (PARTITION BY o_orderpriority)")}
                   AS share_in_priority,
                 ${sqlDec2Dbl("revd")} / ${sqlDec2Dbl("SUM(revd) OVER ()")}
                   AS share_of_total
          FROM agg""",
    "q94_event_transitions" ->
      """WITH pairs AS (
           SELECT event_type AS from_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
           FROM events),
         counts AS (
           SELECT from_type, to_type, COUNT(*) AS n
           FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
         m AS (
           SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
           FROM counts GROUP BY 1)
         SELECT from_type, to_type, n, CAST(n AS DOUBLE) / n_from AS prob
         FROM counts JOIN m USING (from_type)""",
    "q91_mad" ->
      """WITH med AS (
           SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
           FROM orders GROUP BY 1)
         SELECT o_orderpriority, COUNT(*) AS n,
                MIN(med) AS median_price,
                quantile_cont(abs(o_totalprice - med), 0.5) AS mad
         FROM orders JOIN med USING (o_orderpriority)
         GROUP BY 1""",
    "q92_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, n_mode
         FROM (
           SELECT l_returnflag, l_quantity, COUNT(*) AS n_mode,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY COUNT(*) DESC, l_quantity) AS rn
           FROM lineitem GROUP BY 1, 2)
         WHERE rn = 1""",
    "q93_first_touch" ->
      """WITH uni AS (
           SELECT user_id, ts, event_id AS click_id, NULL::BIGINT AS purchase_id
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts, NULL, event_id FROM events
           WHERE event_type = 'purchase'),
         wv AS (
           SELECT *,
                  last_value(click_id IGNORE NULLS) OVER w AS last_click,
                  last_value(CASE WHEN click_id IS NOT NULL THEN ts END
                             IGNORE NULLS) OVER w AS last_click_ts
           FROM uni
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY ts,
                                 CASE WHEN click_id IS NOT NULL THEN 0 ELSE 1 END,
                                 COALESCE(click_id, purchase_id)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT purchase_id, user_id,
                CASE WHEN last_click_ts >= ts - INTERVAL 24 HOUR
                     THEN last_click END AS attributed_click_id,
                COALESCE(last_click_ts >= ts - INTERVAL 24 HOUR, FALSE)
                  AS attributed
         FROM wv WHERE purchase_id IS NOT NULL""",
    "q82_regr_stats" ->
      s"""WITH m AS (
            SELECT l_returnflag, COUNT(*) AS n,
              ${sqlDec2Dbl("SUM(CAST(l_quantity AS DECIMAL(12,4)))")} AS sx,
              ${sqlDec2Dbl("SUM(CAST(l_extendedprice AS DECIMAL(12,4)))")} AS sy,
              ${sqlDec2Dbl("SUM(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(12,4)))")} AS sxx,
              ${sqlDec2Dbl("SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(12,4)))")} AS syy,
              ${sqlDec2Dbl("SUM(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(12,4)))")} AS sxy
            FROM lineitem GROUP BY 1)
          SELECT l_returnflag, n,
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                 (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
                 (n * sxy - sx * sy) * (n * sxy - sx * sy)
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2,
                 (n * sxy - sx * sy)
                   / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
          FROM m""",
    "q83_priority_shipping" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE year(l_shipdate) = 1997
         GROUP BY 1""",
    "q84_promo_share" ->
      s"""SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
                 100.0 * ${sqlDec2Dbl(
                   s"SUM(CASE WHEN p_type = 'PROMO' THEN CAST($revenueSql AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)")}
                   / ${sqlDsum(revenueSql)} AS promo_share_pct,
                 ${sqlDsum(revenueSql)} AS total_revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE year(l_shipdate) = 1997
          GROUP BY 1""",
    "q85_top_supplier" ->
      s"""WITH rev AS (
            SELECT l_suppkey, ${sqlDsum(revenueSql)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY 1)
          SELECT s_suppkey, s_name, total_revenue
          FROM supplier JOIN rev ON s_suppkey = l_suppkey
          WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
    "q86_small_qty_revenue" ->
      s"""SELECT ${sqlDec2Dbl("SUM(CAST(l_extendedprice AS DECIMAL(18,6)))")} / 7.0
                   AS avg_yearly,
                 COUNT(*) AS n_items
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#11'
            AND l_quantity < 0.2 * (
              SELECT ${sqlDavg("l_quantity")}
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    "q87_large_volume_customers" ->
      """WITH big AS (
           SELECT l_orderkey,
                  SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
           FROM lineitem GROUP BY 1
           HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 250)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                CAST(CAST(qty AS STRING) AS DOUBLE) AS total_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey""",
    "q88_disjunctive_join" ->
      s"""SELECT ${sqlDsum(revenueSql)} AS revenue, COUNT(*) AS n_items
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 11)
             OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                 AND l_quantity BETWEEN 20 AND 30)""",
    "q89_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
         FROM supplier, lineitem l1, orders o
         WHERE s_suppkey = l1.l_suppkey
           AND o.o_orderkey = l1.l_orderkey
           AND o.o_orderstatus = 'F'
           AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
           AND EXISTS (
             SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (
             SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         GROUP BY s_name""",
    "q90_idle_customers" ->
      s"""SELECT c_mktsegment,
                 COUNT(*) AS n_customers,
                 ${sqlDsum("c_acctbal")} AS total_bal
          FROM customer c
          WHERE c_acctbal > (
              SELECT ${sqlDavg("c_acctbal")} FROM customer WHERE c_acctbal > 0)
            AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c.c_custkey
                AND o_orderdate >= TIMESTAMP '2000-08-01')
          GROUP BY 1""",
  )
}
