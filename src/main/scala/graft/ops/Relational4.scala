package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.dsum

/** Fourth wave: UNPIVOT (wide→long reshape) and stratified sampling —
  * the remaining reshape/sampling surface of the delegated engines
  * (reference exposes them through its SQL shells; see SURVEY §2.2).
  */
object Relational4 {

  type Q = (SparkSession, String) => DataFrame

  /** UNPIVOT/melt: three measure columns reshaped into (metric, val)
    * rows, then re-aggregated. The unpivot itself is map-side (an Expand
    * node — no shuffle); the only exchange is the final 3-group agg. */
  def q50Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .unpivot(
        Array($"l_orderkey"),
        Array($"l_quantity", $"l_discount", $"l_tax"),
        "metric", "val")
      .groupBy($"metric")
      .agg(count(lit(1)).as("n"), dsum($"val").as("total"))
  }

  /** Stratified sampling (`sampleBy` surface) made cross-engine
    * deterministic: per-stratum rates via the same Knuth multiplicative
    * hash as q40, so each stratum keeps a stable pseudo-random fraction
    * (F≈10%, O≈5%, P≈50%) on any engine and any partitioning. */
  def q51StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rate = when($"o_orderstatus" === "F", 100L)
      .when($"o_orderstatus" === "O", 50L)
      .otherwise(500L)
    Tables.orders(spark, dir)
      .filter(pmod($"o_orderkey" * 2654435761L, lit(1000L)) < rate)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_sampled"), dsum($"o_totalprice").as("sampled_total"))
  }

  /** Time-series resample + forward-fill: each user's event stream
    * re-gridded to hourly slots between their first and last event, gaps
    * carrying the last observed value forward. The grid is a generator
    * expression (sequence+explode — map-side), the per-hour "last" is a
    * keyed window, and the fill is `last(ignoreNulls)` over the slot
    * order — everything shuffles once by user. */
  def q52ResampleFfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir).filter($"user_id" < 20)
      .withColumn("slot", date_trunc("hour", $"ts").cast("timestamp_ntz"))
    val wLast = Window.partitionBy($"user_id", $"slot").orderBy($"ts".desc, $"event_id".desc)
    val lastPerHour = ev.withColumn("rn", row_number().over(wLast)).filter($"rn" === 1)
      .select($"user_id", $"slot", $"value")
    val grid = ev.groupBy($"user_id")
      .agg(min($"slot").as("t0"), max($"slot").as("t1"))
      .select($"user_id", explode(sequence($"t0", $"t1", expr("INTERVAL 1 HOUR"))).as("slot"))
    val wFill = Window.partitionBy($"user_id").orderBy($"slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerHour, Seq("user_id", "slot"), "left")
      .withColumn("filled_value", last($"value", ignoreNulls = true).over(wFill))
      .withColumn("is_gap", $"value".isNull)
      .select($"user_id", $"slot", $"filled_value", $"is_gap")
  }

  /** Keyset-stable pagination: ORDER BY a total order + LIMIT/OFFSET.
    * Shared SQL text runs verbatim on both engines (EP2 surface). Spark
    * compiles the limit+offset into a single TakeOrdered-style collect —
    * no global sort materialization. */
  val q53Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 20 OFFSET 40"""

  def q53Pagination(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(q53Sql)
  }

  /** Regex function gallery: extract / extract-group / global replace /
    * match count. Patterns kept in the RE2 ∩ java.util.regex common
    * subset so both engines match identically. */
  def q54RegexGallery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 500)
      .select(
        $"p_partkey",
        regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
        regexp_extract($"p_type", "([A-Z]+)$", 1).as("type_tail"),
        regexp_replace($"p_name", "[aeiou]", "_").as("devoweled"),
        regexp_count($"p_name", lit("[aeiou]")).as("n_vowels"),
        ($"p_name" rlike "ab").as("has_ab"))
  }

  /** Percentile battery (exact, interpolated): percentile_cont at the
    * quartiles per order status. Both engines use the (n-1)·q offset
    * convention and the same lower+(upper−lower)·frac interpolation, so
    * the doubles agree exactly (q34's median established this). */
  def q55Percentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q55")
    spark.sql(
      """SELECT o_orderstatus,
                percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
                percentile_cont(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
                percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
                COUNT(*) AS n
         FROM orders_q55 GROUP BY o_orderstatus""")
  }

  /** Ordered funnel: signup → first click strictly after it → first
    * purchase strictly after that, per user; one row of stage counts.
    * ONE shuffle total (r19): a single per-user aggregation collects the
    * min signup time plus the click/purchase time lists, the
    * strictly-after stage times fall out of map-side array arithmetic
    * (`array_min(filter(...))`), and the three stage counts are one
    * 1-row rollup. The staged min-agg + equi-join form this replaces
    * shuffled the event stream three times and re-joined it twice —
    * same rows (oracle-pinned), 6 exchanges → 1. Per-user time lists
    * are bounded by per-user activity, the same boundedness q52's
    * resample grid already assumes. */
  def q56Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"event_type".isin("signup", "click", "purchase"))
      .select($"user_id", $"event_type", $"ts")
    ev.groupBy($"user_id")
      .agg(
        min(when($"event_type" === "signup", $"ts")).as("t1"),
        collect_list(when($"event_type" === "click", $"ts")).as("clicks"),
        collect_list(when($"event_type" === "purchase", $"ts")).as("purchases"))
      .withColumn("t2",
        array_min(filter($"clicks", c => $"t1".isNotNull && c > $"t1")))
      .withColumn("t3",
        array_min(filter($"purchases", p => $"t2".isNotNull && p > $"t2")))
      .agg(count($"t1").as("n_signup"),
        count($"t2").as("n_click_after"),
        count($"t3").as("n_purchase_after"))
  }

  /** Cohort retention: users cohorted by the week of their first event;
    * per (cohort week, week offset), distinct active users. The cohort
    * table is user-keyed (smaller than events by the activity factor)
    * and broadcasts; the count is one (cohort, offset) agg. */
  def q57CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // r19: ONE user-keyed agg computes the cohort week AND the user's
    // distinct active weeks together; offsets explode map-side, and the
    // (user, week_no) rows are distinct by construction (weeks is a
    // set, week ↦ week_no injective per user), so the retention count
    // is a plain count. The previous form re-scanned the event stream
    // for a broadcast join against the cohort table and paid a
    // countDistinct expand in the final agg.
    ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).cast("date").as("cohort_week"),
        collect_set(date_trunc("week", $"ts").cast("date")).as("weeks"))
      .select($"cohort_week", explode($"weeks").as("event_week"))
      .withColumn("week_no", expr("datediff(event_week, cohort_week) div 7").cast("int"))
      .groupBy($"cohort_week", $"week_no")
      .agg(count(lit(1)).as("n_active"))
  }

  /** q100: exponentially-weighted moving average (α = 1/2) over each
    * event type's DAILY mean value — the smoother a monitoring pipeline
    * runs over ingest metrics. EWMA is defined by a recursion
    * (s_n = α·x_n + (1−α)·s_{n−1}), which plain SQL can't express — but
    * with α pinned to 1/2 (the p11 device: the one coefficient whose
    * arithmetic is exact halving, bit-identical in any IEEE engine) the
    * recursion is a left fold of `(acc + x) / 2` seeded with the first
    * day's value, and a fold over an explicit day-ordered array IS
    * expressible on both engines (`aggregate` here,
    * `list_reduce`/`list_slice` in DuckDB) with an identical operation
    * sequence. Per day n the fold runs over the n-day prefix — O(days²)
    * per group, fine because the array is calendar-bounded (the fixture
    * spans one month; a year is 365), never corpus-bounded: the one
    * shuffle is the (event_type, day) mean agg, map-side-combined, and
    * everything after operates on day-cardinality arrays. The daily mean
    * is exact-decimal sum → one division, so both engines fold the same
    * doubles. */
  def q100Ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").cast("timestamp_ntz").as("day"))
      .agg((dsum($"value") / count(lit(1))).as("x"))
    daily.groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"x"))).as("xs"))
      .select($"event_type",
        transform($"xs", e => e.getField("x")).as("xv"),
        posexplode($"xs").as(Seq("i", "dx")))
      .select($"event_type", $"dx.day".as("day"), $"dx.x".as("x_day"),
        aggregate(slice($"xv", lit(2), $"i"), element_at($"xv", 1),
          (a, x) => (a + x) / lit(2)).as("ewma"))
  }

  val queries: Map[String, Q] = Map(
    "q100_ewma"             -> q100Ewma _,
    "q56_funnel"            -> q56Funnel _,
    "q57_cohort_retention"  -> q57CohortRetention _,
    "q50_unpivot"           -> q50Unpivot _,
    "q51_stratified_sample" -> q51StratifiedSample _,
    "q52_resample_ffill"    -> q52ResampleFfill _,
    "q53_pagination"        -> q53Pagination _,
    "q54_regex_gallery"     -> q54RegexGallery _,
    "q55_percentiles"       -> q55Percentiles _,
  )

  val oracles: Map[String, String] = Map(
    // the same seeded left fold over the same day-ordered array:
    // list_reduce's implicit first-element init == aggregate's explicit
    // element_at(xv, 1) init with the fold starting at element 2
    "q100_ewma" ->
      s"""WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   ${Tables.sqlDsum("value")} / COUNT(*) AS x
            FROM events GROUP BY 1, 2),
          arr AS (
            SELECT event_type,
                   list(x ORDER BY day) AS xv,
                   list(day ORDER BY day) AS ds
            FROM daily GROUP BY 1)
          SELECT event_type, ds[i] AS day, xv[i] AS x_day,
                 list_reduce(list_slice(xv, 1, i), (a, b) -> (a + b) / 2) AS ewma
          FROM arr, (SELECT unnest(range(1, 400)) AS i) t
          WHERE i <= len(xv)""",
    // portable long-form of UNPIVOT: one UNION ALL branch per measure
    "q50_unpivot" ->
      s"""WITH m AS (
            SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT 'l_tax', l_tax FROM lineitem)
          SELECT metric, COUNT(*) AS n, ${Tables.sqlDsum("val")} AS total
          FROM m GROUP BY metric""",
    "q51_stratified_sample" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_sampled,
                 ${Tables.sqlDsum("o_totalprice")} AS sampled_total
          FROM orders
          WHERE (o_orderkey * 2654435761) % 1000 <
                CASE o_orderstatus WHEN 'F' THEN 100 WHEN 'O' THEN 50 ELSE 500 END
          GROUP BY o_orderstatus""",
    "q52_resample_ffill" ->
      """WITH ev AS (
           SELECT user_id, event_id, value, ts,
                  date_trunc('hour', ts) AS slot
           FROM events WHERE user_id < 20),
         hourly AS (
           SELECT user_id, slot, value FROM (
             SELECT user_id, slot, value,
                    ROW_NUMBER() OVER (PARTITION BY user_id, slot
                                       ORDER BY ts DESC, event_id DESC) AS rn
             FROM ev) t WHERE rn = 1),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
           FROM (SELECT user_id, MIN(slot) AS t0, MAX(slot) AS t1
                 FROM ev GROUP BY user_id) b)
         SELECT g.user_id, CAST(g.slot AS TIMESTAMP) AS slot,
                LAST_VALUE(h.value IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.slot
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
                h.value IS NULL AS is_gap
         FROM grid g LEFT JOIN hourly h USING (user_id, slot)""",
    "q53_pagination" -> q53Sql,
    "q56_funnel" ->
      """WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
          c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
                JOIN s ON s.user_id = e.user_id AND e.ts > s.t1
                WHERE e.event_type = 'click' GROUP BY e.user_id),
          p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
                JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
                WHERE e.event_type = 'purchase' GROUP BY e.user_id)
          SELECT (SELECT COUNT(*) FROM s) AS n_signup,
                 (SELECT COUNT(*) FROM c) AS n_click_after,
                 (SELECT COUNT(*) FROM p) AS n_purchase_after""",
    "q57_cohort_retention" ->
      """WITH cohort AS (
            SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id)
          SELECT c.cohort_week,
                 CAST(date_diff('day', c.cohort_week,
                                CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT) AS week_no,
                 COUNT(DISTINCT e.user_id) AS n_active
          FROM events e JOIN cohort c USING (user_id)
          GROUP BY 1, 2""",
    "q54_regex_gallery" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
                regexp_extract(p_type, '([A-Z]+)$', 1) AS type_tail,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
                regexp_matches(p_name, 'ab') AS has_ab
         FROM part WHERE p_partkey < 500""",
    "q55_percentiles" ->
      """SELECT o_orderstatus,
                quantile_cont(o_totalprice, 0.25) AS p25,
                quantile_cont(o_totalprice, 0.5)  AS p50,
                quantile_cont(o_totalprice, 0.75) AS p75,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderstatus""",
  )
}
