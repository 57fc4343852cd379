package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: execute a registry query under Bench's setup and print the
  * POST-EXECUTION adaptive plan (shows AQE stage reuse, final join
  * strategies, runtime coalescing — what explain-before-run cannot).
  * Usage: runMain graft.ExecPlan <sfDir> <query...>
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.scan.repartition", "32")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).cache().count())
    Tables.events(spark, sfDir).cache().count()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"==== $name executed plan ====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
