package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply semantics (reference consumer_to_file.py):
  *  - `c`/`u`/`r` are upserts applied as plain appends — the reference never
  *    merges, duplicates accumulate (MergeTree, not ReplacingMergeTree)
  *    [214-224];
  *  - `d` issues a hard delete [237-246];
  *  - `snapshot.mode=initial` seeds with `r` events [register-connector.sh:20].
  *
  * Spark-native model: the change log is the durable table (append-only —
  * the only write shape that scales on object storage); deletes are kept as
  * tombstones; the *snapshot view* is latest-per-key with tombstones
  * filtered. This also makes full-topic replays (the reference's fresh
  * group-id + earliest [185-186] duplicates data on every restart)
  * idempotent: replaying the log changes nothing because latest-per-key is
  * a set operation, not an accumulation.
  *
  * Scale: snapshotting shuffles once on the key — the same exchange a
  * MergeTree background merge pays, but explicit and AQE-sized. For skewed
  * keys the window degrades gracefully (row_number needs no buffering
  * beyond sort); at 100 TB, partition the log table by `table` and
  * date so snapshots prune.
  */
object Apply {

  /** Upsert ops (reference [214]). */
  val upsertOps: Seq[String] = Seq("c", "u", "r")

  /** PK-candidate selection, verbatim precedence from the reference
    * [consumer_to_file.py:57, 143]: first of uuid,id,pk,employee_id,
    * record_id present, else the first column. */
  val pkCandidates: Seq[String] = Seq("uuid", "id", "pk", "employee_id", "record_id")

  def pkCandidate(columns: Seq[String]): String =
    pkCandidates.find(columns.contains).getOrElse(columns.head)

  /** Split a parsed envelope log into the upsert and delete branches
    * (op dispatch, reference [212-214, 237]). */
  def upserts(log: DataFrame): DataFrame = log.filter(col("op").isin(upsertOps: _*))
  def deletes(log: DataFrame): DataFrame = log.filter(col("op") === "d")

  /** Delete key extraction: before.uuid, else before.id (reference
    * [239-241]; its WHERE hardcodes the `id` column even for uuid keys — a
    * bug we do not replicate: the tombstone carries the actual key). */
  def deleteKey(before: Column): Column =
    coalesce(element_at(before, "uuid"), element_at(before, "id"))

  /** Snapshot reconstruction: latest row per key by (orderCol) with
    * delete-tombstones removed. This is the engine's replacement for both
    * O10 (upsert-as-append) and O11 (delete apply). */
  def snapshot(log: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "d")
      .drop("_rn")
  }

  /** Log compaction — the OPTIMIZE/FINAL analog for the append-only log:
    * collapse history to the latest row per key, but KEEP the newest
    * tombstone of keys whose latest op is a delete. Unlike [[snapshot]]
    * (a read view), the compacted log is a valid replacement *log*:
    * appending later changes and re-snapshotting yields the same state as
    * against the full log, because a still-live tombstone must survive to
    * shadow earlier (already discarded) versions. Run it when the
    * log-to-live ratio makes snapshot reads pay for too much history. */
  def compact(log: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1) // latest per key, tombstone or not
      .drop("_rn")
  }
}
