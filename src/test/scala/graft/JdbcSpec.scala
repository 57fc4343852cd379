package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

/** JDBC source/sink against embedded Derby (`jdbc:derby:memory:`), which
  * ships on the Spark classpath — the same surface that mounts MySQL /
  * ClickHouse drivers in production [spark.sh:21-25, data_inserter.py:3-14].
  * local-mode executors share the JVM, so every task can reach the
  * in-memory database.
  */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def conn() = DriverManager.getConnection(url)

  test("jdbc round-trip: spark write, partition-parallel read") {
    val df = Tables.nation(spark, sf0001)
      .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
              $"n_regionkey".cast("long").as("n_regionkey"))
    df.write.format("jdbc").option("url", url).option("dbtable", "nation_rt")
      .mode("overwrite").save()
    val back = Jdbc.readPartitioned(spark, url, "nation_rt",
      "n_nationkey", 0L, 24L, 4)
    assert(back.rdd.getNumPartitions == 4, "range slicing must yield one cursor per slice")
    assert(back.collect().map(_.getLong(0)).sorted.toSeq ==
           df.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("jdbc read pushes predicates down to the remote WHERE") {
    val scan = Jdbc.read(spark, url, "nation_rt")
      .filter($"n_regionkey" === 2L).select($"n_nationkey")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("n_regionkey"),
      s"filter must reach the JDBC scan:\n$physical")
    assert(scan.collect().nonEmpty)
  }

  test("distributed upsert is idempotent and updates in place") {
    val c = conn()
    Jdbc.createTableIfAbsent(c, "kv_up",
      new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("v", "string"), Seq("k"))
    c.close()
    Jdbc.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), url, "kv_up", Seq("k"))
    // overlapping second batch: k=2 updated, k=3 inserted
    val batch2 = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    Jdbc.upsert(batch2, url, "kv_up", Seq("k"))
    Jdbc.upsert(batch2, url, "kv_up", Seq("k")) // replay must converge
    val state = Jdbc.read(spark, url, "kv_up")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("streaming foreachBatch upsert converges to latest-per-key") {
    val c = conn()
    Jdbc.createTableIfAbsent(c, "kv_stream",
      new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("v", "string"), Seq("k"))
    c.close()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Jdbc.foreachBatchUpsert(
      mem.toDS().toDF("k", "v"), url, "kv_stream", Seq("k"))
      .start()
    try {
      mem.addData((10L, "x"), (11L, "y")); q.processAllAvailable()
      mem.addData((11L, "Y"), (12L, "z")); q.processAllAvailable()
    } finally q.stop()
    val state = Jdbc.read(spark, url, "kv_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(10L -> "x", 11L -> "Y", 12L -> "z"))
  }
}
