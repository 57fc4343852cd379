package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.dsum

/** Sixth wave of the delegated-engine SQL surface (SURVEY §2.2): skyline
  * (Pareto-frontier) queries, percentile-based winsorization, and
  * recursive CTEs (hierarchy walks) — all shapes a ClickHouse/Spark
  * analytics shell user reaches for that hadn't appeared yet.
  */
object Relational6 {

  type Q = (SparkSession, String) => DataFrame

  /** Skyline / Pareto frontier per brand: the parts for which no
    * same-brand part is both cheaper-or-equal and larger-or-equal (with
    * one strict). Not an all-pairs dominance test: group to per-(brand,
    * price) max size, one PARTITIONED window (running max over strictly
    * cheaper prices — `rows … 1 preceding` on the per-price grouped set),
    * then a join back. Scale: both the window and the join key on
    * p_brand — one shuffle family, no global sort, no n² pairs. */
  def q63Skyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir)
    val perPrice = part.groupBy($"p_brand", $"p_retailprice")
      .agg(max($"p_size").as("ms"))
    // on the per-price set, the previous ROW is the previous strictly
    // smaller price, so this running max sees exactly the cheaper parts
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPrice.withColumn("prev_max", max($"ms").over(w))
      .filter($"prev_max".isNull || $"ms" > $"prev_max")
    part.join(frontier, Seq("p_brand", "p_retailprice"))
      .filter($"p_size" === $"ms") // same-price smaller parts are dominated
      .select($"p_brand", $"p_partkey", $"p_retailprice", $"p_size")
  }

  /** Winsorization: clip o_totalprice to the exact [p05, p95] band of its
    * priority group (percentile_cont interpolation — verified identical
    * to DuckDB's quantile_cont in q55), then aggregate the clipped
    * distribution. The per-group bounds are a 5-row aggregate joined
    * back broadcast; clipping is comparison-only (LEAST/GREATEST), so
    * the decimal re-sum stays engine-exact. */
  def q64Winsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
    val bounds = orders.groupBy($"o_orderpriority")
      .agg(
        expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice)").as("lo"),
        expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice)").as("hi"))
    orders.join(broadcast(bounds), Seq("o_orderpriority"))
      .withColumn("clipped", least(greatest($"o_totalprice", $"lo"), $"hi"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"o_totalprice" < $"lo", 1L).otherwise(0L)).as("n_low"),
        sum(when($"o_totalprice" > $"hi", 1L).otherwise(0L)).as("n_high"),
        min($"lo").as("lo"), min($"hi").as("hi"),
        dsum($"clipped").as("total_clipped"))
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): walk the synthetic
    * customer hierarchy parent(k) = k div 2 from root 0 and aggregate
    * per depth. Spark executes the recursion as iterated UnionLoop
    * steps — each level is one distributed join against the previous
    * level's frontier, ~log2(N) rounds total, never a driver loop. */
  def q65RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("cust_q65")
    spark.sql(
      s"""WITH RECURSIVE walk AS (
            SELECT c_custkey, c_acctbal, 0 AS depth FROM cust_q65 WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, c.c_acctbal, w.depth + 1
            FROM cust_q65 c JOIN walk w ON c.c_custkey DIV 2 = w.c_custkey
            WHERE c.c_custkey > 0)
          SELECT depth, COUNT(*) AS n_customers,
                 MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
                 ${sqlDsumSpark("c_acctbal")} AS total_acctbal
          FROM walk GROUP BY depth""")
  }

  /** Spark-side SQL twin of [[Tables.dsum]] (decimal-exact sum emitted as
    * DOUBLE) — Spark's decimal→double cast is correctly rounded, so no
    * string hop is needed on this side. */
  private def sqlDsumSpark(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"

  /** Equi-depth (equal-count) histogram per return flag: NTILE(8) over
    * each group's price order — the quantile-binning complement of q61's
    * equi-width buckets. The window is PARTITIONED by l_returnflag (3
    * per-group sorts, no global sort); the tie-break on (orderkey,
    * linenumber) makes the row order — and therefore which of two equal
    * prices lands in which bucket — identical on both engines. */
  def q66EquidepthBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(spark, dir)
      .withColumn("bucket", ntile(8).over(w))
      .groupBy($"l_returnflag", $"bucket")
      .agg(count(lit(1)).as("n"),
        min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"),
        dsum($"l_extendedprice").as("total"))
  }

  /** Scale-path twin of q55/q64's exact percentiles: approx_percentile's
    * mergeable quantile sketch (map-side partial, one small state per
    * group) replaces the full per-group sort that exact percentile_cont
    * pays — at 100 TB the exact form is the bottleneck, the sketch is
    * not. Rows-only driver check (sketch merge order is engine-specific);
    * Round5Spec bounds the rank error against the exact quartiles. */
  def q67ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(o_totalprice, array(0.05, 0.5, 0.95), 10000)").as("pcts"))
      .select($"o_orderpriority", $"n",
        element_at($"pcts", 1).as("p05"),
        element_at($"pcts", 2).as("p50"),
        element_at($"pcts", 3).as("p95"))
  }

  /** Z-order (Morton) key: bit-interleave two 10-bit dimensions into one
    * sort key — the layout device that makes a single file-level sort
    * serve range pruning on BOTH columns (the lakehouse OPTIMIZE ZORDER
    * primitive; our sortWithinPartitions analog of MergeTree ORDER BY).
    * Pure bit arithmetic, identical in both engines; LayoutSpec-style
    * roundtrip assertions live in Round5Spec. */
  def q68ZorderKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = ($"l_partkey" % 1024).cast("long")
    val b = ($"l_suppkey" % 1024).cast("long")
    val z = (0 until 10).map { i =>
      (shiftleft(shiftright(a, i) % 2, 2 * i) +
       shiftleft(shiftright(b, i) % 2, 2 * i + 1)): Column
    }.reduce(_ + _)
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", a.as("da"), b.as("db"), z.as("zkey"))
  }

  /** IGNORE NULLS window gallery: forward-fill (last non-null in the
    * running frame), first/second non-null over the whole partition —
    * the gap-tolerant window reads (Debezium streams carry sparse
    * columns: a ROW-image update only populates changed fields, so
    * "latest known value per key as of each row" is exactly
    * last_value IGNORE NULLS). Sparse values are simulated by nulling
    * every 7th order. Windows are PARTITIONED by customer — per-group
    * sorts after one keyed exchange, no global sort; all three reads
    * share the same (partition, order) so Spark plans ONE Window node. */
  def q69IgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wRun = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .withColumn("v",
        when($"o_orderkey" % 7 === 0, lit(null)).otherwise($"o_totalprice"))
      .select($"o_custkey", $"o_orderkey", $"v",
        last($"v", ignoreNulls = true).over(wRun).as("ffill"),
        first($"v", ignoreNulls = true).over(wAll).as("first_nn"),
        nth_value($"v", 2, ignoreNulls = true).over(wAll).as("second_nn"))
  }

  /** Date-sequence generation + explode: each order contributes its
    * following (o_orderkey % 3) month-starts — the calendar-densify
    * primitive behind "bill every month until horizon" / slowly-changing
    * coverage tables. `sequence()` + `explode` is map-side row
    * generation (no shuffle, no driver loop); only the final small
    * per-month rollup exchanges. Month arithmetic on month-start
    * timestamps is exact in both engines. */
  def q70SequenceExplode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("m0", date_trunc("month", $"o_orderdate"))
      .withColumn("month", explode(sequence(
        $"m0", expr("m0 + make_interval(0, CAST(o_orderkey % 3 AS INT))"),
        expr("interval 1 month"))))
      // naive timestamp on the output boundary (session TZ pinned UTC),
      // matching the driver's DuckDB read of the source parquet
      .withColumn("month", $"month".cast("timestamp_ntz"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"),
        dsum($"o_totalprice").as("total"))
  }

  private val profileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** ANALYZE-style column profile of `orders`: per column — row count,
    * null count, exact NDV, min/max (typed compare, then rendered as
    * string). This is the statistics collector behind CBO/data-quality
    * dashboards (the reference's ClickHouse side gets it from
    * system.columns + ANALYZE). ONE pass over the table: Spark plans the
    * 6 DISTINCT aggregates via a single Expand (one shuffle family, no
    * per-column jobs); the `stack` reshape runs on the 1-row aggregate.
    * At 100 TB exact NDV would swap to approx_count_distinct — the q28
    * sketch — without changing the output contract. */
  def q71ColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    // two 1-row aggregates, crossed: min/max(string) has a non-fixed-width
    // buffer, and fused with the multi-DISTINCT it drags the whole 7×
    // Expand through a SortAggregate with a 7-column sort (2.3s at sf0.1).
    // Split, the NDV pass stays an all-long HashAggregate over the Expand
    // and the min/max pass runs straight on the scan with no Expand — 4×.
    val basic = o.agg(count(lit(1)).as("n_rows"),
      profileCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))): _*)
    val nd = o.agg(
      countDistinct(col(profileCols.head)).as(s"${profileCols.head}__nd"),
      profileCols.tail.map(c => countDistinct(col(c)).as(s"${c}__nd")): _*)
    val stacked = profileCols.map(c =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max").mkString(", ")
    basic.crossJoin(nd)
      .select($"n_rows", expr(
        s"stack(${profileCols.length}, $stacked)" +
          " AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
      .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct",
        $"min_val", $"max_val")
  }

  /** Semi-structured VARIANT path (Spark 4's `parse_json`/`variant_get`):
    * the open-schema JSON ingestion the reference leans on ClickHouse
    * JSON-String columns for. `parse_json` materializes the binary
    * variant once per row, typed `variant_get` extraction replaces
    * per-field string re-parsing; all map-side, one small rollup
    * exchange. (q19 is the classic get_json_object form; this is the
    * Spark-4-native typed path.) */
  def q72VariantJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("n_null_k"),
        min($"k").as("k_min"), max($"k").as("k_max"),
        sum($"k".cast("long")).as("k_sum"),
        countDistinct($"k").as("k_ndv"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    * mode CDC pipelines need when the key itself can be legitimately
    * NULL (Debezium ROW images carry nullable keys; a plain `=` join
    * silently drops those rows). Planted nulls on both sides must
    * match each other. Still a hash-partitioned equi-join — null-safe
    * equality hashes NULL as a regular key value, so the shuffle shape
    * is identical to `=`. */
  def q73NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
      .select($"c_custkey",
        when($"c_nationkey" % 7 === 0, lit(null)).otherwise($"c_nationkey").as("cn"))
    val n = Tables.nation(spark, dir)
      .select($"n_name",
        when($"n_nationkey" % 7 === 0, lit(null)).otherwise($"n_nationkey").as("nn"))
    c.join(broadcast(n), $"cn" <=> $"nn")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(when($"cn".isNull, 1L).otherwise(0L)).as("n_null_matches"))
  }

  /** Time-interval RANGE frame: per user, the trailing-1-hour event count
    * and exact value sum at every event — the batch twin of w02's sliding
    * window (same semantics, per-row anchored instead of grid-bucketed).
    * RANGE over the timestamp order includes ties as peers, so the result
    * is deterministic even with duplicate timestamps; the sum folds in
    * decimal inside the frame and lands as double. One keyed exchange +
    * per-user sort — the frame scan itself is the streaming-window
    * two-pointer, O(n) per partition. */
  def q74IntervalRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        expr(
          """COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")
          .as("n_1h"),
        expr(
          """SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")
          .cast("double").as("sum_1h"))
  }

  /** Discrete percentiles (percentile_disc): the quantile that returns an
    * actual population member — the form that stays meaningful for
    * non-interpolatable domains (and is trivially engine-exact, unlike
    * interpolated quantiles which need q55's care). Same partitioned
    * one-sort shape as q55. */
  def q75PercentileDisc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").as("p75"))
  }

  /** Frequent-items sketch (approx_top_k): the heavy-hitters counterpart
    * of q28's HLL / q46's count-min / q67's quantile sketch — the fourth
    * member of the mergeable-sketch family a 100 TB profiler runs instead
    * of exact groupBy-count-sort. Registered rows-only like its siblings
    * (sketch binaries are engine-specific); Round5Spec pins the estimates
    * to the exact counts, which the sketch guarantees whenever its
    * capacity covers the domain (5 event types here). */
  def q76ApproxTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .agg(expr("approx_top_k(event_type, 3)").as("top"))
      .select(explode($"top").as("t"))
      .select($"t.item".as("event_type"), $"t.count".as("est_count"))
  }

  /** Cumulative DISTINCT count over a running window — the metric Spark's
    * window functions cannot express directly (COUNT(DISTINCT) OVER is
    * unsupported): distinct users reached per event type, day by day.
    * The standard first-occurrence decomposition: row_number over
    * (type, user) ordered by time marks each user's first day (one keyed
    * exchange), a daily rollup counts first-timers, and a running SUM
    * turns new-per-day into distinct-to-date. Every step is partitioned;
    * nothing resembles the naive per-day re-scan. */
  def q77CumulativeDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val firstSeen = Window.partitionBy($"event_type", $"user_id")
      .orderBy($"day", $"event_id")
    val running = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select($"event_type", $"user_id", $"event_id",
        date_trunc("day", $"ts").cast("timestamp_ntz").as("day"))
      .withColumn("rn", row_number().over(firstSeen))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_new_users"))
      .withColumn("distinct_users_to_date", sum($"n_new_users").over(running))
  }

  /** NOT IN vs NOT EXISTS under three-valued logic: the most common
    * silent-wrong-answer trap in SQL migration. The subquery's key set
    * contains a NULL (every 7th supplier's nationkey nulled), so
    * `NOT IN` is never TRUE — zero rows — while `NOT EXISTS` keeps its
    * two-valued semantics. Both forms per nation, side by side. Plans:
    * NOT IN is a null-aware anti join (broadcast here); NOT EXISTS a
    * plain anti join. */
  def q78NotInNulls(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.nation(spark, dir).createOrReplaceTempView("nation_q78")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q78")
    spark.sql(
      """WITH sk AS (
           SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END AS k
           FROM supplier_q78)
         SELECT
           (SELECT COUNT(*) FROM nation_q78
            WHERE n_nationkey NOT IN (SELECT k FROM sk)) AS n_not_in,
           (SELECT COUNT(*) FROM nation_q78 n
            WHERE NOT EXISTS (SELECT 1 FROM sk WHERE sk.k = n.n_nationkey))
             AS n_not_exists,
           (SELECT COUNT(*) FROM nation_q78
            WHERE n_nationkey NOT IN (SELECT k FROM sk WHERE k IS NOT NULL))
             AS n_not_in_filtered""")
  }

  /** Nested (document-model) layout: lineitems collapse into a per-order
    * `array<struct>` sorted by line number — the denormalized shape a
    * document store or a nested-parquet lake keeps — and the per-order
    * reads run as array aggregates over the nested column (no join, no
    * second shuffle): item count, quantity total, and the revenue fold
    * in linenumber order (engine-exact doubles, the s05 device). ONE
    * groupBy builds the nest; everything after is map-side. The flat →
    * nested → aggregate path is how you'd materialize an order-centric
    * serving table from the fact stream at 100 TB. */
  def q79NestUnnest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nested = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list(struct(
        $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount")))
        .as("items"))
    nested.select(
      $"l_orderkey",
      size($"items").as("n_items"),
      aggregate(transform($"items", it => it.getField("l_quantity")),
        lit(0.0), (a, x) => a + x).as("total_qty"),
      aggregate(transform($"items",
          it => it.getField("l_extendedprice") * (lit(1.0) - it.getField("l_discount"))),
        lit(0.0), (a, x) => a + x).as("revenue"))
  }

  /** Weighted median (here: order price weighted by line quantity) — a
    * read Spark has no native aggregate for. Standard cumulative-weight
    * construction: per group, walk values in (value, tie-break) order and
    * take the first whose running weight reaches half the total. Both
    * windows share one partitioned sort; the total broadcasts back. All
    * comparisons are integer-derived doubles — engine-exact. */
  def q80WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity",
        $"l_orderkey", $"l_linenumber")
    val ord = Window.partitionBy($"l_returnflag")
      .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
    // r19: group totals as UNBOUNDED window aggregates over the same
    // returnflag-keyed sort the running sum already pays — the separate
    // groupBy + broadcast join-back scanned the fact table a second
    // time (no exchange reuse across the two consumers).
    val wAll = Window.partitionBy($"l_returnflag")
    val cum = li
      .withColumn("cw",
        sum($"l_quantity").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum($"l_quantity").over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
    cum.filter($"cw" * 2 >= $"tw")
      .groupBy($"l_returnflag")
      // cw is nondecreasing along the price sort, so the min price among
      // rows at/past the half-weight crossing IS the crossing row's price
      .agg(min($"l_extendedprice").as("weighted_median"),
        min($"tw").as("total_weight"), min($"n").as("n"))
  }

  /** Key-less range join, bucketed: every pair of events (any users)
    * within 1 minute of each other. With no equi key Spark would plan a
    * BroadcastNestedLoopJoin — O(n²) comparisons at any scale. Bucketing
    * time into 1-minute cells and exploding one side to its 3 candidate
    * cells turns it into a plain equi-join on the cell id (each true
    * pair matches on EXACTLY one exploded cell, so no distinct is
    * needed), with the precise interval predicate as a residual filter.
    * This is the range-join-hint optimization, hand-planned; PlanSpec
    * asserts no nested-loop join survives. */
  def q81BucketedRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cellUs = 60000000L // 1-minute cells, microseconds
    val e = Tables.events(spark, dir)
      .select($"event_id", $"event_type", $"ts",
        expr(s"unix_micros(CAST(ts AS TIMESTAMP)) div $cellUs").as("cell"))
    val probe = e.select($"event_id".as("id1"), $"event_type".as("type1"),
        $"ts".as("ts1"),
        explode(array($"cell" - 1, $"cell", $"cell" + 1)).as("cell"))
    val build = e.select($"event_id".as("id2"), $"event_type".as("type2"),
        $"ts".as("ts2"), $"cell")
    probe.join(build, Seq("cell"))
      .filter($"id1" < $"id2" &&
        $"ts2" >= $"ts1" - expr("INTERVAL 1 MINUTES") &&
        $"ts2" <= $"ts1" + expr("INTERVAL 1 MINUTES"))
      .groupBy($"type1", $"type2")
      .agg(count(lit(1)).as("n_pairs"))
  }

  val queries: Map[String, Q] = Map(
    "q63_skyline"       -> q63Skyline _,
    "q81_bucketed_range_join" -> q81BucketedRangeJoin _,
    "q80_weighted_median" -> q80WeightedMedian _,
    "q79_nest_unnest"   -> q79NestUnnest _,
    "q78_not_in_nulls"  -> q78NotInNulls _,
    "q77_cumulative_distinct" -> q77CumulativeDistinct _,
    // rows-only (sketch state is engine-specific, like q28/q46/q67)
    "q76_approx_top_k"  -> q76ApproxTopK _,
    "q74_interval_range_frame" -> q74IntervalRangeFrame _,
    "q75_percentile_disc" -> q75PercentileDisc _,
    "q71_column_profile" -> q71ColumnProfile _,
    "q72_variant_json"  -> q72VariantJson _,
    "q73_null_safe_join" -> q73NullSafeJoin _,
    "q69_ignore_nulls"  -> q69IgnoreNulls _,
    "q70_sequence_explode" -> q70SequenceExplode _,
    "q68_zorder_key"    -> q68ZorderKey _,
    "q64_winsorize"     -> q64Winsorize _,
    "q65_recursive_cte" -> q65RecursiveCte _,
    "q66_equidepth_bins" -> q66EquidepthBins _,
    // rows-only (sketch state is engine-specific, like q28/q46)
    "q67_approx_percentiles" -> q67ApproxPercentiles _,
  )

  val oracles: Map[String, String] = Map(
    "q71_column_profile" -> {
      val rows = profileCols.map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT $c) AS n_distinct,
               CAST(MIN($c) AS VARCHAR) AS min_val,
               CAST(MAX($c) AS VARCHAR) AS max_val
            FROM orders"""
      }
      rows.mkString("\n UNION ALL\n")
    },
    "q74_interval_range_frame" ->
      """SELECT user_id, event_id,
                COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                  (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS sum_1h
         FROM events""",
    "q75_percentile_disc" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
                quantile_disc(o_totalprice, 0.25) AS p25,
                quantile_disc(o_totalprice, 0.5) AS p50,
                quantile_disc(o_totalprice, 0.75) AS p75
         FROM orders GROUP BY 1""",
    "q81_bucketed_range_join" ->
      """SELECT a.event_type AS type1, b.event_type AS type2,
                COUNT(*) AS n_pairs
         FROM events a JOIN events b
           ON a.event_id < b.event_id
          AND b.ts >= a.ts - INTERVAL 1 MINUTE
          AND b.ts <= a.ts + INTERVAL 1 MINUTE
         GROUP BY 1, 2""",
    "q80_weighted_median" ->
      """WITH cum AS (
           SELECT l_returnflag, l_extendedprice, l_quantity,
                  SUM(l_quantity) OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
           FROM lineitem),
         tot AS (
           SELECT l_returnflag, SUM(l_quantity) AS tw, COUNT(*) AS n
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median,
                MIN(tw) AS total_weight, MIN(n) AS n
         FROM cum JOIN tot USING (l_returnflag)
         WHERE cw * 2 >= tw
         GROUP BY 1""",
    "q79_nest_unnest" ->
      """SELECT l_orderkey, CAST(COUNT(*) AS INT) AS n_items,
                list_reduce(list_prepend(0.0,
                  list(l_quantity ORDER BY l_linenumber, l_quantity,
                       l_extendedprice, l_discount)), (a, b) -> a + b)
                  AS total_qty,
                list_reduce(list_prepend(0.0,
                  -- tie-break on every struct field: l_linenumber is NOT
                  -- unique per order, and the fold order must match
                  -- array_sort's full lexicographic struct comparison
                  list(l_extendedprice * (1.0 - l_discount)
                       ORDER BY l_linenumber, l_quantity,
                                l_extendedprice, l_discount)),
                  (a, b) -> a + b) AS revenue
         FROM lineitem GROUP BY 1""",
    "q78_not_in_nulls" ->
      """WITH sk AS (
           SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END AS k
           FROM supplier)
         SELECT
           (SELECT COUNT(*) FROM nation
            WHERE n_nationkey NOT IN (SELECT k FROM sk)) AS n_not_in,
           (SELECT COUNT(*) FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM sk WHERE sk.k = n.n_nationkey))
             AS n_not_exists,
           (SELECT COUNT(*) FROM nation
            WHERE n_nationkey NOT IN (SELECT k FROM sk WHERE k IS NOT NULL))
             AS n_not_in_filtered""",
    "q77_cumulative_distinct" ->
      """WITH e AS (
           SELECT event_type, user_id, event_id,
                  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
           FROM events),
         flagged AS (
           SELECT event_type, day,
                  ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                     ORDER BY day, event_id) AS rn
           FROM e),
         daily AS (
           SELECT event_type, day, COUNT(*) AS n_events,
                  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_new_users
           FROM flagged GROUP BY 1, 2)
         SELECT event_type, day, n_events, n_new_users,
                CAST(SUM(n_new_users) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS distinct_users_to_date
         FROM daily""",
    "q72_variant_json" ->
      """WITH e AS (
           SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
           FROM events)
         SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
                MIN(k) AS k_min, MAX(k) AS k_max,
                CAST(SUM(k) AS BIGINT) AS k_sum,
                COUNT(DISTINCT k) AS k_ndv
         FROM e GROUP BY 1""",
    "q73_null_safe_join" ->
      """WITH c AS (
           SELECT c_custkey,
                  CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS cn
           FROM customer),
         n AS (
           SELECT n_name,
                  CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS nn
           FROM nation)
         SELECT n_name, COUNT(*) AS n_customers,
                CAST(SUM(CASE WHEN cn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_matches
         FROM c JOIN n ON cn IS NOT DISTINCT FROM nn
         GROUP BY 1""",
    "q69_ignore_nulls" ->
      """WITH o AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS v
           FROM orders)
         SELECT o_custkey, o_orderkey, v,
                last_value(v IGNORE NULLS) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
                first_value(v IGNORE NULLS) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nn,
                nth_value(v, 2 IGNORE NULLS) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_nn
         FROM o""",
    "q70_sequence_explode" ->
      s"""WITH m AS (
            SELECT o_custkey, o_totalprice,
                   unnest(generate_series(
                     date_trunc('month', o_orderdate),
                     date_trunc('month', o_orderdate)
                       + (o_orderkey % 3) * INTERVAL 1 MONTH,
                     INTERVAL 1 MONTH)) AS month
            FROM orders)
          SELECT month, COUNT(*) AS n_orders,
                 COUNT(DISTINCT o_custkey) AS n_customers,
                 ${Tables.sqlDsum("o_totalprice")} AS total
          FROM m GROUP BY 1""",
    "q63_skyline" ->
      """WITH pm AS (
           SELECT p_brand, p_retailprice, MAX(p_size) AS ms
           FROM part GROUP BY 1, 2),
         fr AS (
           SELECT p_brand, p_retailprice, ms,
                  MAX(ms) OVER (PARTITION BY p_brand ORDER BY p_retailprice
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS prev_max
           FROM pm)
         SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
         FROM part p
         JOIN fr ON fr.p_brand = p.p_brand AND fr.p_retailprice = p.p_retailprice
         WHERE p.p_size = fr.ms AND (fr.prev_max IS NULL OR fr.ms > fr.prev_max)""",
    "q64_winsorize" ->
      s"""WITH b AS (
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.05) AS lo,
                   quantile_cont(o_totalprice, 0.95) AS hi
            FROM orders GROUP BY 1)
          SELECT o.o_orderpriority, COUNT(*) AS n,
                 CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                 CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                 MIN(lo) AS lo, MIN(hi) AS hi,
                 ${Tables.sqlDsum("LEAST(GREATEST(o_totalprice, lo), hi)")} AS total_clipped
          FROM orders o JOIN b USING (o_orderpriority)
          GROUP BY 1""",
    "q65_recursive_cte" ->
      s"""WITH RECURSIVE walk AS (
            SELECT c_custkey, c_acctbal, 0 AS depth FROM customer WHERE c_custkey = 0
            UNION ALL
            SELECT c.c_custkey, c.c_acctbal, w.depth + 1
            FROM customer c JOIN walk w ON c.c_custkey // 2 = w.c_custkey
            WHERE c.c_custkey > 0)
          SELECT CAST(depth AS INT) AS depth, COUNT(*) AS n_customers,
                 MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
                 ${Tables.sqlDsum("c_acctbal")} AS total_acctbal
          FROM walk GROUP BY depth""",
    "q68_zorder_key" -> {
      val zExpr = (0 until 10).map { i =>
        s"((((l_partkey % 1024) >> $i) % 2) << ${2 * i})" +
          s" + ((((l_suppkey % 1024) >> $i) % 2) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""SELECT l_orderkey, l_linenumber,
                 l_partkey % 1024 AS da, l_suppkey % 1024 AS db,
                 CAST($zExpr AS BIGINT) AS zkey
          FROM lineitem"""
    },
    "q66_equidepth_bins" ->
      s"""WITH b AS (
            SELECT l_returnflag, l_extendedprice,
                   NTILE(8) OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                     AS bucket
            FROM lineitem)
          SELECT l_returnflag, CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
                 MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
                 ${Tables.sqlDsum("l_extendedprice")} AS total
          FROM b GROUP BY 1, 2""",
  )
}
