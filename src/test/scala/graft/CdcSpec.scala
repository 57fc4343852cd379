package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{Apply, CdcQueries, Envelope, Normalize, SchemaEvolution}
import graft.gen.Workload

class CdcSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val goodEnv =
    """{"payload": {"op": "u", "before": {"id": "7", "name": "Alice"},
      |"after": {"id": "7", "name": "Alicia"}, "source": {"table": "employees"},
      |"ts_ms": 1722900000000}}""".stripMargin.replace("\n", " ")

  test("envelope parse extracts op/before/after and routes the table") {
    val raw = Seq(("dbserver1.testdb.employees", goodEnv)).toDF("topic", "value")
    val p = Envelope.parse(raw).collect().head
    assert(p.getAs[String]("table") == "employees")
    assert(p.getAs[String]("op") == "u")
    assert(p.getAs[Map[String, String]]("after")("name") == "Alicia")
    assert(p.getAs[Map[String, String]]("before")("id") == "7")
    assert(!p.getAs[Boolean]("is_dlq"))
  }

  test("malformed and payload-less records route to DLQ; good ones don't") {
    val raw = Seq(
      ("t.a", goodEnv),
      ("t.b", """{"no_payload": 1}"""),
      ("t.c", """not json at all"""),
    ).toDF("topic", "value")
    val parsed = Envelope.parse(raw)
    assert(Envelope.dlq(parsed).select("topic").as[String].collect().sorted.toSeq == Seq("t.b", "t.c"))
    assert(Envelope.good(parsed).count() == 1)
  }

  test("topic prefix filter matches reference semantics") {
    val t = Seq("config.x.y", "sourcing.a", "dbserver1.testdb.employees").toDF("topic")
    val kept = t.filter(Envelope.topicHasPrefix($"topic", Seq("config.", "sourcing.")))
      .as[String].collect().toSet
    assert(kept == Set("config.x.y", "sourcing.a"))
  }

  test("pk candidate precedence is uuid,id,pk,employee_id,record_id then first") {
    assert(Apply.pkCandidate(Seq("name", "id", "uuid")) == "uuid")
    assert(Apply.pkCandidate(Seq("name", "pk", "id")) == "id")
    assert(Apply.pkCandidate(Seq("name", "record_id")) == "record_id")
    assert(Apply.pkCandidate(Seq("alpha", "beta")) == "alpha")
  }

  test("delete key prefers before.uuid over before.id") {
    val df = Seq(
      Map("uuid" -> "u-1", "id" -> "9"),
      Map("id" -> "9"),
    ).toDF("before").select(Apply.deleteKey($"before").as("k"))
    assert(df.as[String].collect().toSeq == Seq("u-1", "9"))
  }

  test("snapshot = latest per key, tombstones removed, replay idempotent") {
    val log = Seq(
      // (offset, op, id, salary)
      (0L, "r", 1, 100.0), (1L, "r", 2, 200.0),
      (2L, "u", 1, 150.0), (3L, "d", 2, 200.0),
      (4L, "c", 3, 300.0), (5L, "u", 3, 310.0),
    ).toDF("offset", "op", "id", "salary")
    val snap = Apply.snapshot(log, Seq("id"), Seq($"offset"))
      .select($"id", $"salary").as[(Int, Double)].collect().toMap
    assert(snap == Map(1 -> 150.0, 3 -> 310.0)) // 2 deleted
    val replayed = Apply.snapshot(log.union(log).dropDuplicates("offset"),
      Seq("id"), Seq($"offset"))
      .select($"id", $"salary").as[(Int, Double)].collect().toMap
    assert(replayed == snap)
  }

  test("model-based: random CDC stream snapshot == in-memory map replay") {
    // Deterministic pseudo-random op stream, mirroring data_inserter.py's
    // uniform insert/update/delete workload shape.
    val rnd = new scala.util.Random(42)
    val events = (0 until 500).map { i =>
      val op = Seq("c", "u", "d")(rnd.nextInt(3))
      val id = rnd.nextInt(20)
      (i.toLong, op, id, rnd.nextInt(100000).toDouble)
    }
    // Model: sequential apply into a map (upsert-as-latest; delete removes).
    val model = scala.collection.mutable.Map[Int, Double]()
    events.foreach { case (_, op, id, v) =>
      if (op == "d") model.remove(id) else model(id) = v
    }
    val log = events.toDF("offset", "op", "id", "salary")
    val got = Apply.snapshot(log, Seq("id"), Seq($"offset"))
      .select($"id", $"salary").as[(Int, Double)].collect().toMap
    assert(got == model.toMap)
  }

  test("normalize: epoch-ms heuristic boundary and legacy null erasure") {
    val df = Seq(
      (1L, 1.0e12),       // exactly 1e12: NOT converted (strictly greater)
      (2L, 1.0e12 + 1000),// converted, ms → s
      (3L, 1722900000000.0), // realistic epoch-ms
      (4L, 42.0),
    ).toDF("id", "v")
    val out = df.select($"id", Normalize.epochMillisHeuristic($"v").cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1000000000000L)
    assert(out(2L) == 1000000001L)
    assert(out(3L) == 1722900000L)
    assert(out(4L) == 42L)
    val nulls = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "s")
      .select(Normalize.legacyNullToEmpty($"s").as("s")).as[String].collect().toSeq
    assert(nulls == Seq("", "x"))
  }

  test("schema inference precedence: bool before int, json-ish to string") {
    assert(SchemaEvolution.inferType(true) == BooleanType)
    assert(SchemaEvolution.inferType(3L) == LongType)
    assert(SchemaEvolution.inferType(3.5) == DoubleType)
    assert(SchemaEvolution.inferType(Map("a" -> 1)) == StringType)
    val s = SchemaEvolution.schemaFor(Map(
      "id" -> 7L, "config" -> 123L, "updated_on" -> 1722900000000L))
    assert(s("config").dataType == StringType)   // forced-string name
    assert(s("updated_on").dataType == TimestampType) // _on + >1e12
    assert(s("id").dataType == LongType)
  }

  test("schema evolution widens by name union and conforms batches") {
    val base = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val incoming = StructType(Seq(StructField("id", LongType), StructField("salary", DoubleType)))
    val widened = SchemaEvolution.widen(base, incoming)
    assert(widened.fieldNames.toSeq == Seq("id", "name", "salary"))
    val batch = Seq((1L, 9.5)).toDF("id", "salary")
    val conformed = SchemaEvolution.conform(batch, widened)
    assert(conformed.columns.toSeq == Seq("id", "name", "salary"))
    assert(conformed.select("name").first().isNullAt(0))
  }

  test("pipeline: end-to-end ingest types columns, routes DLQ, snapshots correctly") {
    val raw = Workload.employeeCdc(spark, n = 400, nKeys = 40)
      // plant two malformed records
      .withColumn("value",
        when($"offset" === 5L, lit("not json")).otherwise($"value"))
    val result = cdc.Pipeline.ingest(raw)
    assert(result.dlq.count() == 1)
    assert(result.tables.keySet == Set("employees"))
    val flow = result.tables("employees")
    // inferred types: id integral, salary numeric, name/position strings
    val types = flow.log.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("id") == "bigint")
    assert(types("salary") == "bigint" || types("salary") == "double")
    assert(types("name") == "string")
    // snapshot: latest non-deleted per id, never more rows than keys
    assert(flow.snapshot.count() <= 40)
    assert(flow.snapshot.groupBy($"id").count().filter($"count" > 1).count() == 0)
    // snapshot matches the independent Apply-based computation
    val direct = Apply.snapshot(
      Envelope.good(Envelope.parse(raw))
        .withColumn("id", coalesce(element_at($"after", "id"), element_at($"before", "id")).cast("long")),
      Seq("id"), Seq($"offset"))
      .select($"id", element_at(coalesce($"after", $"before"), "salary").cast("double").as("salary"))
    val viaPipeline = flow.snapshot.select($"id", $"salary".cast("double"))
    assert(viaPipeline.exceptAll(direct).count() == 0 && direct.exceptAll(viaPipeline).count() == 0)
  }

  test("compact: replacement log preserves snapshot semantics across later appends") {
    val raw = Workload.employeeCdc(spark, n = 400, nKeys = 40)
    val log = Envelope.good(Envelope.parse(raw))
      .withColumn("id", coalesce(element_at($"after", "id"), element_at($"before", "id")).cast("int"))
      .select($"offset", $"op", $"id", $"after")
    val (early, late) = (log.filter($"offset" < 300), log.filter($"offset" >= 300))
    val compacted = Apply.compact(early, Seq("id"), Seq($"offset"))
    // compaction shrinks history to at most one row per key
    assert(compacted.count() <= 40 && compacted.count() < early.count())
    // live tombstones survive compaction (they must shadow earlier versions)
    val latestIsDelete = Apply.compact(early, Seq("id"), Seq($"offset"))
      .filter($"op" === "d").count()
    assert(latestIsDelete == early.groupBy($"id").agg(max_by($"op", $"offset").as("lop"))
      .filter($"lop" === "d").count())
    // appending the remaining changes to the COMPACTED log snapshots
    // identically to the full log
    // maps don't support set ops — compare scalar projections of the state
    def proj(df: org.apache.spark.sql.DataFrame) = df.select($"id",
      element_at($"after", "salary").as("salary"),
      element_at($"after", "name").as("name"))
    val viaCompacted = proj(Apply.snapshot(compacted.unionByName(late), Seq("id"), Seq($"offset")))
    val viaFull = proj(Apply.snapshot(log, Seq("id"), Seq($"offset")))
    assert(viaCompacted.exceptAll(viaFull).count() == 0 &&
           viaFull.exceptAll(viaCompacted).count() == 0)
  }

  test("per-column DLQ blame names the first offending column (O12 second half)") {
    val raw = Workload.employeeCdc(spark, n = 100, nKeys = 10)
      // plant: offset 3 → salary not numeric; offset 7 → id not integral;
      // offset 11 → wholly unparseable
      .withColumn("value",
        when($"offset" === 3L, regexp_replace($"value", "\"salary\":[0-9.]+", "\"salary\":\"NaN-ish\""))
        .when($"offset" === 7L, regexp_replace($"value", "\"id\":\\d+", "\"id\":\"seven\""))
        .when($"offset" === 11L, lit("{broken"))
        .otherwise($"value"))
    val parsed = Envelope.parse(raw)
    val expected = Map("id" -> LongType, "salary" -> DoubleType, "name" -> StringType)
    val dlq = Envelope.dlqWithBlame(parsed, expected)
      .select($"offset", $"blame", $"error").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getString(2))).toMap
    assert(dlq.keySet == Set(3L, 7L, 11L))
    assert(dlq(3L)._1.contains("salary") && dlq(3L)._2 == "type violation in column salary")
    assert(dlq(7L)._1.contains("id"))
    assert(dlq(11L)._1.isEmpty, "unparseable records carry no blame")
    // good side excludes exactly the three (n=100 events + 10 snapshot rows)
    assert(Envelope.goodWithBlame(parsed, expected).count() == 107)
  }

  test("c08 scd2: versions contiguous, intervals chain, exactly one current per key") {
    val rows = CdcQueries.c08Scd2History(spark, sf0001)
      .select($"user_id", $"valid_from", $"valid_to", $"version", $"is_current")
      .collect()
      // ts is timestamp_ntz → LocalDateTime, not java.sql.Timestamp
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
                 Option(r.getAs[java.time.LocalDateTime](2)),
                 r.getInt(3), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (u, h) =>
      val sorted = h.sortBy(_._4)
      assert(sorted.map(_._4).sameElements(1 to h.length), s"user $u versions not 1..n")
      assert(h.count(_._5) == 1, s"user $u must have exactly one current row")
      assert(sorted.last._3.isEmpty && sorted.last._5, s"user $u current row must be last")
      // each interval's end is the next interval's start
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"user $u intervals don't chain")
        case _ =>
      }
    }
  }

  test("workload generator: deterministic, parseable, snapshot-seeded") {
    val gen = Workload.employeeCdc(spark, n = 200, nKeys = 20)
    val parsed = Envelope.parse(gen)
    assert(Envelope.dlq(parsed).count() == 0)
    assert(parsed.filter($"op" === "r").count() == 20)
    val ops = parsed.select("op").distinct().as[String].collect().toSet
    assert(ops == Set("r", "c", "u", "d"))
    // snapshot applies cleanly end-to-end
    val typed = Envelope.good(parsed)
      .withColumn("id", coalesce(element_at($"after", "id"), element_at($"before", "id")).cast("int"))
    val snap = Apply.snapshot(typed, Seq("id"), Seq($"offset"))
    assert(snap.count() > 0)
    // deterministic: same args → same content
    val again = Workload.employeeCdc(spark, n = 200, nKeys = 20)
    assert(gen.exceptAll(again).count() == 0 && again.exceptAll(gen).count() == 0)
  }
}
