package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

/** EP1 end-to-end (SURVEY.md §3): raw Kafka-shaped records → envelope
  * parse → DLQ split → per-table typed change logs → snapshot views.
  *
  * This is the whole reference consumer [consumer_to_file.py:196-250] as
  * one declarative composition. Differences that matter at scale:
  *  - schema inference runs as ONE distributed aggregation per table
  *    (regex-vote over exploded key/values), not a DESCRIBE per message;
  *  - the typed log is the durable output (append-only); snapshots are
  *    views — replays and restarts are idempotent;
  *  - the only driver-side data is table names and key lists (metadata,
  *    not rows).
  *
  * Works identically in batch and inside `foreachBatch` (StreamingSpec
  * exercises the streaming path for the apply step).
  */
object Pipeline {

  case class TableFlow(table: String, log: DataFrame, snapshot: DataFrame)
  case class IngestResult(dlq: DataFrame, tables: Map[String, TableFlow],
                          /** Unpersist the batch's parse cache once every
                            * output has been consumed (ingestStream calls
                            * this per micro-batch; long-lived streams must
                            * not accumulate cached batches). */
                          cleanup: () => Unit = () => ())

  /** Value-pattern type inference over the schemaless string payload:
    * every value integral → long; every value numeric → double; else
    * string. (The runtime twin of SchemaEvolution.inferType, which types
    * already-decoded values.) */
  private[cdc] def inferKeyTypes(keyed: DataFrame): Map[String, DataType] = {
    import keyed.sparkSession.implicits._
    inferTableKeyTypes(keyed.withColumn("table", lit("_")))
      .getOrElse("_", Map.empty)
  }

  /** One distributed aggregation inferring EVERY table's column types at
    * once: `groupBy(table, k)` — job count is O(1), not O(tables); the
    * collected result is metadata-sized (tables × columns rows). */
  private[cdc] def inferTableKeyTypes(keyed: DataFrame): Map[String, Map[String, DataType]] = {
    import keyed.sparkSession.implicits._
    keyed.groupBy($"table", $"k")
      .agg(
        max(when(!$"v".rlike("^-?\\d+$"), 1).otherwise(0)).as("not_int"),
        max(when(!$"v".rlike("^-?\\d+(\\.\\d+)?([eE]-?\\d+)?$"), 1).otherwise(0)).as("not_num"))
      .collect()
      .map { r =>
        val t = (r.getAs[Int]("not_int"), r.getAs[Int]("not_num")) match {
          case (0, _) => LongType
          case (_, 0) => DoubleType
          case _      => StringType
        }
        (r.getAs[String]("table"), r.getAs[String]("k"), t)
      }
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.map(r => r._2 -> r._3).toMap }
  }

  /** The startable streaming form of [[ingest]]: raw Kafka-shaped records
    * from any streaming source (`Sources.kafkaStream` in production,
    * MemoryStream in tests) → per-micro-batch envelope parse, inference,
    * typed append-only logs under `outDir/<table>` and a DLQ under
    * `outDir/_dlq`. Checkpointed, so restarts resume from the last batch;
    * the append-only log + snapshot-view design makes replays idempotent
    * downstream. Returns the running [[StreamingQuery]].
    */
  def ingestStream(raw: DataFrame, outDir: String,
                   checkpoint: String,
                   declared: Map[String, Map[String, String]] = Map.empty,
                   /** e.g. `Trigger.AvailableNow()` for drain-and-stop
                     * runs (c17); None keeps the default continuous
                     * micro-batch trigger. */
                   trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val res = ingest(batch, declared)
        res.tables.foreach { case (t, flow) =>
          flow.log.write.mode("append").parquet(s"$outDir/$t")
        }
        res.dlq.write.mode("append").parquet(s"$outDir/_dlq")
        res.cleanup()
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Ingest a batch of raw records (`topic`, `offset`, `value`). */
  def ingest(raw: DataFrame): IngestResult =
    ingest(raw, Map.empty[String, Map[String, String]])

  /** Ingest with declared source schemas: `declared` maps table →
    * column → MySQL type string, resolved through
    * [[TypeMapping.toSparkType]] (the reference's `TYPE_MAPPING` path,
    * consumer_to_file.py:15-55). Declared tables skip value-based
    * inference entirely — their column set and types come from the
    * declaration, so the per-batch inference aggregation only ever scans
    * the UNdeclared tables' payloads. A declared table with no rows in
    * the batch still gets a (typed, empty) flow. */
  def ingest(raw: DataFrame, declared: Map[String, Map[String, String]]): IngestResult = {
    val spark = raw.sparkSession
    import spark.implicits._
    val parsed = Envelope.parse(raw).cache()
    val good = Envelope.good(parsed)
      .withColumn("payload", coalesce($"after", $"before"))
    // single inference job across all undeclared tables; table names fall
    // out of the same result (a table appears iff it has a payload key)
    val keyed = good.select($"table", explode($"payload").as(Seq("k", "v")))
    val toInfer =
      if (declared.isEmpty) keyed
      else keyed.filter(!$"table".isin(declared.keys.toSeq: _*))
    val declaredTypes = declared.map { case (t, cols) =>
      t -> cols.map { case (c, my) => c -> TypeMapping.toSparkType(my) }
    }
    val typesByTable = inferTableKeyTypes(toInfer) ++ declaredTypes

    val flows = typesByTable.keys.toSeq.sorted.map { t =>
      val rows = good.filter($"table" === t)
      val types = typesByTable(t)
      val keys = types.keys.toSeq.sorted
      val typedCols = keys.map(k => element_at($"payload", k).cast(types(k)).as(k))
      val log = rows.select(($"offset" +: $"op" +: $"ts_ms" +: typedCols): _*)
      val pk = Apply.pkCandidate(keys)
      val snapshot = Apply.snapshot(log, Seq(pk), Seq($"offset")).drop("_rn")
      t -> TableFlow(t, log, snapshot)
    }.toMap

    IngestResult(Envelope.dlq(parsed), flows, () => { parsed.unpersist(); () })
  }
}
