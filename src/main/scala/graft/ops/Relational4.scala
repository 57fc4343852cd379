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

  val queries: Map[String, Q] = Map(
    "q50_unpivot"           -> q50Unpivot _,
    "q51_stratified_sample" -> q51StratifiedSample _,
  )

  val oracles: Map[String, String] = Map(
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
  )
}
