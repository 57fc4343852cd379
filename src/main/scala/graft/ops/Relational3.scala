package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.dsum

/** Third wave: generators (explode/posexplode), string-distance and
  * extended string functions, boolean/conditional aggregates.
  */
object Relational3 {

  type Q = (SparkSession, String) => DataFrame

  /** Generators: explode tokens with position, re-aggregate. posexplode is
    * the engine's UDTF surface (the reference's per-row Python loops map
    * to generator expressions here). */
  def q37Explode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 100)
      .select($"doc_id", posexplode(split($"text", "\\s+")).as(Seq("pos", "tok")))
      .filter($"tok" =!= "")
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"),
           min($"doc_id").as("first_doc"),
           max($"pos").as("max_pos"))
  }

  /** String distance + extended string functions. */
  def q38StringDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 500)
      .select(
        $"p_partkey",
        levenshtein($"p_name", $"p_type").as("lev_name_type"),
        initcap($"p_name").as("name_cap"),
        reverse($"p_name").as("name_rev"),
        translate($"p_name", "aeiou", "AEIOU").as("name_vowels"),
        repeat($"p_brand", 2).as("brand_twice"),
        substring($"p_name", 1, 3).as("name_left"),
        expr("right(p_name, 3)").as("name_right"))
  }

  /** Boolean + conditional aggregates: bool_and/bool_or, count_if,
    * sum(DISTINCT). */
  def q39BoolAggs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        bool_and($"l_quantity" > 0).as("all_positive_qty"),
        bool_or($"l_discount" > 0.09).as("any_big_discount"),
        count_if($"l_tax" > 0.05).as("n_high_tax"),
        sum_distinct(Tables.dec($"l_quantity")).cast("double").as("sum_distinct_qty"))
  }

  /** Deterministic hash sampling — the cross-engine TABLESAMPLE: a Knuth
    * multiplicative hash over the key picks a stable ~10% sample, so the
    * same rows are chosen on any engine, any partitioning, any run
    * (`TABLESAMPLE BERNOULLI` is engine-seeded and unverifiable). */
  def q40Sampling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter(pmod($"o_orderkey" * 2654435761L, lit(1000L)) < 100)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_sampled"), dsum($"o_totalprice").as("sampled_total"))
  }

  /** Bitwise function gallery over integer keys. */
  def q41Bitwise(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 200)
      .select(
        $"o_orderkey",
        // explicit long outputs: Spark's bitwise ops preserve the input's
        // int width while DuckDB's promote — pin both to BIGINT
        expr("o_orderkey & 255").cast("long").as("and_mask"),
        expr("o_orderkey | 4096").cast("long").as("or_flag"),
        expr("o_orderkey ^ o_custkey").cast("long").as("xor_cust"),
        shiftleft($"o_orderkey", 3).cast("long").as("shl3"),
        shiftright($"o_orderkey", 2).cast("long").as("shr2"),
        bit_count($"o_orderkey").cast("int").as("popcount"))
  }

  /** Salted skew join registered as a query: the oracle is the PLAIN join
    * — the salting rewrite must be semantically invisible. */
  def q42SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.orders(spark, dir)
      .select($"o_custkey".as("custkey"), $"o_totalprice")
    val small = Tables.customer(spark, dir)
      .filter($"c_acctbal" > 9000)
      .select($"c_custkey".as("custkey"), $"c_nationkey")
    Skew.saltedJoin(big, small, "custkey", buckets = 8)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("spend"))
  }

  /** Value-based (RANGE) window frame: peers within a price band. The
    * frame is defined by the ORDER BY *value*, so membership — and thus
    * the aggregate — is deterministic under any row order; the windowed
    * sum still goes through the exact-decimal + string-hop dance. Shared
    * SQL text runs verbatim on both engines (EP2 surface). */
  val q43Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
              COUNT(*) OVER w AS n_within_10k,
              CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS STRING) AS DOUBLE)
                AS sum_within_10k
       FROM orders WHERE o_custkey < 50
       WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                    RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"""

  def q43RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(q43Sql)
  }

  /** first/last/nth_value over an explicit full-partition frame with a
    * total order (tie-broken by key) — deterministic on both engines. */
  def q44ValueWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 100)
      .select($"o_orderpriority", $"o_orderkey",
        first($"o_orderkey").over(w).as("cheapest_order"),
        last($"o_orderkey").over(w).as("dearest_order"),
        nth_value($"o_orderkey", 3).over(w).as("third_cheapest"))
  }

  /** Correlated LATERAL join (top-2-per-customer through a lateral
    * subquery with ORDER BY/LIMIT — Catalyst decorrelates it into a
    * ranked join). Shared SQL text runs verbatim on both engines. */
  val q45Sql: String =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
       FROM customer c, LATERAL (
         SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 2) t
       WHERE c_custkey < 100"""

  def q45Lateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(q45Sql)
  }

  /** Count-min sketch: sub-linear heavy-hitter counting (the classic
    * training-corpus frequency sketch). The sketch binary is Spark's
    * implementation — no oracle by construction (rows-only driver check);
    * Relational3Spec bounds every estimate: exact ≤ est ≤ exact + ε·N. */
  def q46CountMinSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count_min_sketch($"l_suppkey", lit(0.001), lit(0.99), lit(42)).as("cms"),
        count(lit(1)).as("n_rows"))
  }

  /** Date arithmetic: day diffs, month shifts (both engines clamp to
    * month end), month boundaries, component extraction. */
  def q47DateArithmetic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 300)
      .select(
        $"o_orderkey",
        datediff(lit("1998-12-31").cast("date"), $"o_orderdate".cast("date")).as("days_to_eoh"),
        add_months($"o_orderdate", 3).as("plus_3_months"),
        date_add($"o_orderdate".cast("date"), 45).as("plus_45_days"),
        last_day($"o_orderdate").as("month_end"),
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        quarter($"o_orderdate").as("q"))
  }

  /** Ordered string aggregation (LISTAGG surface): collect_list has no
    * deterministic order, so the canonical form sorts before joining —
    * exactly what an ORDER BY inside the aggregate pins in SQL engines. */
  def q48StringAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.supplier(spark, dir)
      .groupBy($"s_nationkey")
      .agg(
        array_join(array_sort(collect_list($"s_name")), "|").as("supplier_names"),
        count(lit(1)).as("n_supp"))
  }

  /** Conditional scalar functions: nullif / coalesce / greatest / least /
    * CASE — identical three-valued-logic semantics on both engines. */
  def q49Conditionals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 300)
      .select(
        $"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("status_or_null"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_label"),
        greatest($"o_totalprice", lit(100000.0)).as("price_floor_100k"),
        least($"o_totalprice", lit(200000.0)).as("price_cap_200k"),
        when($"o_totalprice" > 250000.0, "jumbo")
          .when($"o_totalprice" > 100000.0, "large")
          .otherwise("regular").as("size_class"))
  }

  val queries: Map[String, Q] = Map(
    "q37_explode"        -> q37Explode _,
    "q47_date_arithmetic" -> q47DateArithmetic _,
    "q48_string_agg"     -> q48StringAgg _,
    "q49_conditionals"   -> q49Conditionals _,
    "q38_string_distance" -> q38StringDistance _,
    "q39_bool_aggs"      -> q39BoolAggs _,
    "q40_sampling"       -> q40Sampling _,
    "q41_bitwise"        -> q41Bitwise _,
    "q42_salted_join"    -> q42SaltedJoin _,
    "q43_range_frame"    -> q43RangeFrame _,
    "q44_value_windows"  -> q44ValueWindows _,
    "q45_lateral_join"   -> q45Lateral _,
    // rows-only: engine-specific sketch binary (like q28's HLL)
    "q46_count_min"      -> q46CountMinSketch _,
  )

  val oracles: Map[String, String] = Map(
    "q37_explode" ->
      """SELECT tok, COUNT(*) AS n, MIN(doc_id) AS first_doc,
                CAST(MAX(pos) AS INT) AS max_pos
         FROM (SELECT doc_id,
                      unnest(string_split_regex(text, '\s+')) AS tok,
                      unnest(range(0, len(string_split_regex(text, '\s+')))) AS pos
               FROM documents WHERE doc_id < 100)
         WHERE tok <> ''
         GROUP BY tok""",
    "q38_string_distance" ->
      """SELECT p_partkey,
                CAST(levenshtein(p_name, p_type) AS INT) AS lev_name_type,
                -- initcap: capitalize first letter of each word
                array_to_string(list_transform(string_split(p_name, ' '),
                  w -> upper(w[1]) || lower(w[2:])), ' ') AS name_cap,
                reverse(p_name) AS name_rev,
                translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
                repeat(p_brand, 2) AS brand_twice,
                p_name[1:3] AS name_left,
                p_name[-3:] AS name_right
         FROM part WHERE p_partkey < 500""",
    "q39_bool_aggs" ->
      """SELECT l_returnflag,
                bool_and(l_quantity > 0) AS all_positive_qty,
                bool_or(l_discount > 0.09) AS any_big_discount,
                -- DuckDB count_if returns HUGEINT (int128); pin to BIGINT to
                -- match Spark's LongType under the driver's content hash
                CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_high_tax,
                CAST(CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_distinct_qty
         FROM lineitem GROUP BY l_returnflag""",
    "q40_sampling" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_sampled,
                 ${Tables.sqlDsum("o_totalprice")} AS sampled_total
         FROM orders
         WHERE (o_orderkey * 2654435761) % 1000 < 100
         GROUP BY o_orderstatus""",
    "q41_bitwise" ->
      """SELECT o_orderkey,
                CAST(o_orderkey & 255 AS BIGINT) AS and_mask,
                CAST(o_orderkey | 4096 AS BIGINT) AS or_flag,
                CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS xor_cust,
                CAST(o_orderkey << 3 AS BIGINT) AS shl3,
                CAST(o_orderkey >> 2 AS BIGINT) AS shr2,
                CAST(bit_count(o_orderkey) AS INT) AS popcount
         FROM orders WHERE o_orderkey < 200""",
    "q42_salted_join" ->
      s"""SELECT c_nationkey, COUNT(*) AS n_orders,
                 ${Tables.sqlDsum("o_totalprice")} AS spend
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_acctbal > 9000
         GROUP BY c_nationkey""",
    "q43_range_frame" -> q43Sql,
    "q45_lateral_join" -> q45Sql,
    "q47_date_arithmetic" ->
      """SELECT o_orderkey,
                CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoh,
                CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
                CAST(o_orderdate AS DATE) + 45 AS plus_45_days,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS d,
                CAST(quarter(o_orderdate) AS INT) AS q
         FROM orders WHERE o_orderkey < 300""",
    "q48_string_agg" ->
      """SELECT s_nationkey,
                string_agg(s_name, '|' ORDER BY s_name) AS supplier_names,
                COUNT(*) AS n_supp
         FROM supplier GROUP BY s_nationkey""",
    "q49_conditionals" ->
      """SELECT o_orderkey,
                nullif(o_orderstatus, 'O') AS status_or_null,
                coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
                greatest(o_totalprice, 100000.0) AS price_floor_100k,
                least(o_totalprice, 200000.0) AS price_cap_200k,
                CASE WHEN o_totalprice > 250000.0 THEN 'jumbo'
                     WHEN o_totalprice > 100000.0 THEN 'large'
                     ELSE 'regular' END AS size_class
         FROM orders WHERE o_orderkey < 300""",
    "q44_value_windows" ->
      """SELECT o_orderpriority, o_orderkey,
                FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
                LAST_VALUE(o_orderkey) OVER w AS dearest_order,
                NTH_VALUE(o_orderkey, 3) OVER w AS third_cheapest
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
  )
}
