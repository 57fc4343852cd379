package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the query registries of every operator module; each entry has
  * a DuckDB oracle in [[oracleSql]] unless its semantics are not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * CDC-flavored "latest state per key then aggregate" over the events
    * stream stand-in — scan → window(latest-per-key) → agg → sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"), Tables.dsum($"value").as("total_value"))
      .orderBy($"event_type")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Relational2.queries ++ ops.Relational3.queries ++
      ops.Relational4.queries ++ ops.Relational5.queries ++ ops.Relational6.queries ++
      ops.Relational7.queries ++
      ops.Streaming.queries ++ cdc.CdcQueries.queries ++
      ext.TextAnalysis.queries ++ ext.Dedup.queries ++
      ext.Similarity.queries ++ ext.Multimodal.queries ++ ext.Curation.queries ++
      sources.Jdbc.queries ++ sources.Sources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Relational2.oracles ++ ops.Relational3.oracles ++
      ops.Relational4.oracles ++ ops.Relational5.oracles ++ ops.Relational6.oracles ++
      ops.Relational7.oracles ++
      ops.Streaming.oracles ++ cdc.CdcQueries.oracles ++
      ext.TextAnalysis.oracles ++ ext.Dedup.oracles ++
      ext.Similarity.oracles ++ ext.Multimodal.oracles ++ ext.Curation.oracles ++
      sources.Jdbc.oracles ++ sources.Sources.oracles
}
