package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.dsum

/** Fifth wave: the remaining everyday-SQL surface of the delegated
  * engines (SURVEY §2.2 — the reference exposes full ClickHouse/Spark SQL
  * shells): URL dissection, error-tolerant casts, interval arithmetic,
  * value histograms, and gaps-and-islands sessionization.
  */
object Relational5 {

  type Q = (SparkSession, String) => DataFrame

  /** URL parsing gallery: scheme/host/path/query-param extraction with
    * regexes in the RE2 ∩ java.util.regex common subset. The URL is
    * derived deterministically from document columns (the corpus has no
    * native URLs), then dissected — projection-only, no shuffle. */
  def q58UrlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val url = concat(
      lit("https://"), $"source", lit(".example.com/docs/"),
      $"doc_id".cast("string"), lit("?lang="), $"lang",
      lit("&p="), ($"doc_id" % 7).cast("string"))
    Tables.documents(spark, dir)
      .select($"doc_id", url.as("url"))
      .select(
        $"doc_id", $"url",
        regexp_extract($"url", "^([a-z]+)://", 1).as("scheme"),
        regexp_extract($"url", "^[a-z]+://([^/?]+)", 1).as("host"),
        regexp_extract($"url", "^[a-z]+://[^/?]+(/[^?]*)", 1).as("path"),
        regexp_extract($"url", "[?&]p=([0-9]+)", 1).as("p_param"))
  }

  /** Error-tolerant casting (TRY_CAST): dirty numeric strings (valid /
    * suffixed junk / empty) and partially-invalid dates (month 00) must
    * come back as NULL, never as a runtime error — the ingest posture a
    * CDC pipeline needs for malformed upstream values (reference routes
    * these to the DLQ; the engine surface is TRY_CAST). */
  def q59TryCast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 400)
      .withColumn("dirty_int",
        when($"p_partkey" % 3 === 0, $"p_size".cast("string"))
          .when($"p_partkey" % 3 === 1, concat($"p_size".cast("string"), lit("x")))
          .otherwise(lit("")))
      .withColumn("dirty_date",
        concat(lit("2024-"), lpad(($"p_partkey" % 13).cast("string"), 2, "0"), lit("-15")))
      .select(
        $"p_partkey", $"dirty_int", $"dirty_date",
        expr("TRY_CAST(dirty_int AS INT)").as("try_int"),
        expr("TRY_CAST(dirty_int || '.5' AS DOUBLE)").as("try_dbl"),
        expr("TRY_CAST(dirty_date AS DATE)").as("try_date"))
  }

  /** Interval arithmetic over naive (NTZ) timestamps: literal day-time
    * intervals, a column-driven dynamic interval, and day-grain distance
    * to an anchor date. All projection-only. */
  def q60IntervalArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"user_id" < 10)
      .select(
        $"event_id", $"ts",
        ($"ts" + expr("INTERVAL 90 MINUTE")).as("plus90m"),
        ($"ts" - expr("INTERVAL 1 DAY")).as("minus1d"),
        // FLOOR first: Spark's double→int cast truncates while DuckDB's
        // rounds, so the fractional minutes must be cut explicitly
        ($"ts" + expr("make_dt_interval(0, 0, CAST(FLOOR(value) AS INT), 0)")).as("plus_val_min"),
        hour($"ts").as("hr"),
        datediff($"ts".cast("date"), lit("2024-01-01").cast("date")).as("days_since"))
  }

  /** Equi-width value histogram: bucket bounds from one 1-row min/max
    * aggregate (broadcast), bucket id = one floor over identically-ordered
    * IEEE double ops on both engines. One shuffle (the 16-group agg);
    * at 100 TB the min/max pass is a metadata-cheap scan and the
    * histogram agg is map-side partial. */
  def q61Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val bounds = li.agg(min($"l_extendedprice").as("mn"), max($"l_extendedprice").as("mx"))
    li.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        // NULLIF guards the degenerate all-equal column: Spark's non-ANSI
        // divide yields NULL there while DuckDB's IEEE divide yields NaN,
        // so both sides must route through NULL → bucket 0
        coalesce(
          least(floor(($"l_extendedprice" - $"mn") / nullif($"mx" - $"mn", lit(0.0)) * 16),
                lit(15L)),
          lit(0L)).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
  }

  /** Gaps-and-islands: maximal runs of the same event_type per user in
    * (ts, event_id) order, via the row_number-difference device. Both
    * windows share the user_id partition key — one shuffle, two sorts;
    * runs of length 1 are dropped to keep the island semantics visible. */
  def q62GapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w1 = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val w2 = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("grp", row_number().over(w1) - row_number().over(w2))
      .groupBy($"user_id", $"event_type", $"grp")
      .agg(count(lit(1)).as("run_len"), min($"ts").as("run_start"), max($"ts").as("run_end"))
      .filter($"run_len" >= 2)
      .select($"user_id", $"event_type", $"run_start", $"run_end", $"run_len")
  }

  val queries: Map[String, Q] = Map(
    "q58_url_extract"    -> q58UrlExtract _,
    "q59_try_cast"       -> q59TryCast _,
    "q60_interval_arith" -> q60IntervalArith _,
    "q61_histogram"      -> q61Histogram _,
    "q62_gaps_islands"   -> q62GapsIslands _,
  )

  val oracles: Map[String, String] = Map(
    "q58_url_extract" ->
      """WITH u AS (
           SELECT doc_id,
                  'https://' || source || '.example.com/docs/' || doc_id
                    || '?lang=' || lang || '&p=' || (doc_id % 7) AS url
           FROM documents)
         SELECT doc_id, url,
                regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
                regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS host,
                regexp_extract(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
                regexp_extract(url, '[?&]p=([0-9]+)', 1) AS p_param
         FROM u""",
    "q59_try_cast" ->
      """WITH d AS (
           SELECT p_partkey,
                  CASE WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR)
                       WHEN p_partkey % 3 = 1 THEN CAST(p_size AS VARCHAR) || 'x'
                       ELSE '' END AS dirty_int,
                  '2024-' || lpad(CAST(p_partkey % 13 AS VARCHAR), 2, '0') || '-15' AS dirty_date
           FROM part WHERE p_partkey < 400)
         SELECT p_partkey, dirty_int, dirty_date,
                TRY_CAST(dirty_int AS INT) AS try_int,
                TRY_CAST(dirty_int || '.5' AS DOUBLE) AS try_dbl,
                TRY_CAST(dirty_date AS DATE) AS try_date
         FROM d""",
    "q60_interval_arith" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                CAST(ts + INTERVAL 90 MINUTE AS TIMESTAMP) AS plus90m,
                CAST(ts - INTERVAL 1 DAY AS TIMESTAMP) AS minus1d,
                CAST(ts + to_minutes(CAST(FLOOR(value) AS INT)) AS TIMESTAMP) AS plus_val_min,
                CAST(hour(ts) AS INT) AS hr,
                CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since
         FROM events WHERE user_id < 10""",
    "q61_histogram" ->
      s"""WITH b AS (SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
                     FROM lineitem)
          SELECT CAST(COALESCE(
                   LEAST(FLOOR((l_extendedprice - mn) / NULLIF(mx - mn, 0) * 16), 15),
                   0) AS INT) AS bucket,
                 COUNT(*) AS n, ${Tables.sqlDsum("l_extendedprice")} AS total
          FROM lineitem, b
          GROUP BY 1""",
    "q62_gaps_islands" ->
      """WITH r AS (
           SELECT user_id, event_type, ts,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS grp
           FROM events)
         SELECT user_id, event_type,
                CAST(MIN(ts) AS TIMESTAMP) AS run_start,
                CAST(MAX(ts) AS TIMESTAMP) AS run_end,
                COUNT(*) AS run_len
         FROM r GROUP BY user_id, event_type, grp
         HAVING COUNT(*) >= 2""",
  )
}
