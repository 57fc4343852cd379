package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic workload generator (reference data_inserter.py:28-78 —
  * a uniform random insert/update/delete loop against MySQL `employees`;
  * victims chosen by ORDER BY RAND() LIMIT 1).
  *
  * Spark-native: a seeded, fully distributed generator over `spark.range`
  * — no driver loop, no sleep; n events materialize in one map stage.
  * Emits Debezium-style envelope JSON strings so [[graft.cdc.Envelope]]
  * can consume them like a Kafka topic; includes an initial `r` snapshot
  * burst (snapshot.mode=initial [register-connector.sh:20]).
  */
object Workload {

  val positions: Seq[String] =
    Seq("Engineer", "Analyst", "Manager", "Director", "Intern")
  val firstNames: Seq[String] =
    Seq("Alice", "Bob", "Chitra", "Deepak", "Elena", "Farid", "Grace", "Hao")

  /** 32-bit md5-prefix hash of `tag:seed:x` — the generator's seeded
    * uniform choice device. md5 is the one keyed hash both engines
    * evaluate identically on identical strings (the d29/c15 pattern),
    * which is what makes the whole generated workload — and therefore
    * g01's snapshot — DuckDB-replayable, unlike Spark's Murmur3
    * `hash()`. Non-negative by construction (8 hex chars = 32 bits), so
    * plain `%` is already the uniform bucket. */
  private def h32(tag: String, seed: Long, x: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"$tag:$seed:"), x.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")

  /** The same derivation as DuckDB SQL text (for the g01 oracle). */
  def h32Sql(tag: String, seed: Long, x: String): String =
    s"CAST('0x' || substr(md5('$tag:$seed:' || $x), 1, 8) AS BIGINT)"

  /** `n` CDC events for table `employees` over `nKeys` employee ids,
    * preceded by `nKeys` snapshot `r` events. Deterministic in (n, nKeys,
    * seed). Column layout mimics a Kafka record: topic, offset, value. */
  def employeeCdc(spark: SparkSession, n: Long, nKeys: Int = 100,
                  seed: Long = 42L, topic: String = "dbserver1.testdb.employees"): DataFrame = {
    import spark.implicits._
    val posArr  = array(positions.map(lit): _*)
    val nameArr = array(firstNames.map(lit): _*)

    // Snapshot burst: op='r' for every existing key, offsets 0..nKeys-1.
    val snap = spark.range(nKeys.toLong)
      .select($"id".as("offset"), lit("r").as("op"), $"id".cast("int").as("id"))
    // Stream: uniform c/u/d; victim key chosen by seeded hash (the
    // distributed analog of ORDER BY RAND() LIMIT 1). The range value is
    // the Kafka-style offset — stable under any partitioning.
    val stream = spark.range(nKeys.toLong, nKeys.toLong + n)
      .select($"id".as("offset"),
              element_at(array(lit("c"), lit("u"), lit("d")),
                (h32("op", seed, $"id") % 3 + 1).cast("int")).as("op"),
              (h32("key", seed, $"id") % nKeys).cast("int").as("id"))

    snap.unionByName(stream)
      .withColumn("name",
        concat(element_at(nameArr,
                 (h32("nm", seed, $"id") % firstNames.size + 1).cast("int")),
               (h32("n2", seed, $"id") % 900 + 100).cast("string")))
      .withColumn("position",
        element_at(posArr, (h32("pos", seed, $"id") % positions.size + 1).cast("int")))
      .withColumn("salary",
        (h32("sal", seed, concat($"offset".cast("string"), lit("_"), $"id".cast("string")))
          % 150000 + 50000).cast("double"))
      .withColumn("row", struct($"id", $"name", $"position", $"salary"))
      .select(
        lit(topic).as("topic"),
        $"offset",
        to_json(struct(
          struct(
            $"op",
            when($"op" === "d", $"row").as("before"),
            when($"op" =!= "d", $"row").as("after"),
            struct(lit("employees").as("table")).as("source"),
            (lit(1722900000000L) + $"offset").as("ts_ms")
          ).as("payload"))).as("value"))
  }
}
