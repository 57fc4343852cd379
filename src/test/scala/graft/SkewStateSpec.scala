package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Skew, Streaming}

class SkewStateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of fact rows hit one hot key
    val big = spark.range(20000)
      .select(when($"id" % 10 =!= 0, 7L).otherwise($"id" % 100).as("k"),
              ($"id" * 3).as("payload"))
    val small = spark.range(100).select($"id".as("k"), concat(lit("dim"), $"id").as("name"))
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", buckets = 8)
    assert(salted.count() == plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col).toIndexedSeq: _*)).count() == 0)
    assert(salted.select(plain.columns.map(col).toIndexedSeq: _*).exceptAll(plain).count() == 0)
  }

  test("two-phase de-skewed sum equals direct sum") {
    val df = spark.range(50000)
      .select(when($"id" % 5 =!= 0, 1L).otherwise($"id" % 20).as("k"),
              ($"id" % 97).as("v"))
    val direct = df.groupBy($"k").agg(sum($"v").as("sum_v"))
      .as[(Long, Long)].collect().toMap
    val twoPhase = Skew.twoPhaseSum(df, "k", "v", buckets = 16)
      .as[(Long, Long)].collect().toMap
    assert(twoPhase == direct)
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    implicit val sq = spark.sqlContext
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[Streaming.UserEvent].collect().toSeq
    val ms = MemoryStream[Streaming.UserEvent]
    rows.grouped(300).foreach(b => ms.addData(b))
    val q = Streaming.statefulUserTotals(ms.toDS())
      .writeStream.outputMode("append").format("memory").queryName("state_tot")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last update per user == batch aggregate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"last_event_id".desc)
    val finalState = spark.table("state_tot")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"n_events", $"total_value")
      .as[(Long, Long, Double)].collect().toMap2
    val expected = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("tv"))
      .as[(Long, Long, Double)].collect().toMap2
    assert(finalState.keySet == expected.keySet)
    finalState.foreach { case (u, (n, tv)) =>
      assert(n == expected(u)._1, s"user $u count")
      // summation order differs between state fold and groupBy — fp tolerance
      assert(math.abs(tv - expected(u)._2) < 1e-9, s"user $u total")
    }
  }

  test("transition state carries across micro-batches and matches the batch matrix") {
    implicit val sq = spark.sqlContext
    // in-order per-key arrival (the keyed-Kafka contract): feed batches in
    // global (ts, event_id) order so cross-batch transitions are exercised
    val rows = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .as[Streaming.TransEvent].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val ms = MemoryStream[Streaming.TransEvent]
    rows.grouped(250).foreach(b => ms.addData(b))
    val q = Streaming.userTransitions(ms.toDS())
      .writeStream.outputMode("append").format("memory").queryName("trans_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("trans_stream")
      .groupBy($"from_type", $"to_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val batch = Streaming.w13StreamTransitions(spark, sf0001)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "cross-batch state must stitch per-user transitions identically to one batch")
  }

  implicit class TripleOps[A, B, C](arr: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = arr.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
