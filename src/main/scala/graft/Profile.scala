package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: times named queries under Bench's exact warm-cache
  * setup (3 passes each, min) and prints the formatted physical plan.
  * Usage: runMain graft.Profile <sfDir> <query...> [--plan]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).filterNot(_.startsWith("--")).toSeq
    val showPlan = args.contains("--plan")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.scan.repartition", "32")
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).cache().count())
    Tables.events(spark, sfDir).cache().count()
    val qs = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names
    qs.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (showPlan) {
        println(s"==== $name plan ====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
