package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (100 TB posture: one hot key must not pin a
  * whole join on one task).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) handles sort-merge joins at runtime; [[saltedJoin]] is
  * the explicit fallback for the cases AQE can't rewrite (e.g. when the
  * skewed side feeds an aggregation, or on engines/paths without AQE):
  * the big side gets a pseudo-random salt per row, the small side is
  * replicated once per salt value, and the join key becomes (key, salt) —
  * a hot key now spreads over `buckets` tasks at the cost of a
  * `buckets`× replication of the (broadcast-sized) small side.
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): hashes all columns so
    * rows of a hot key spread without needing a random source. */
  def salt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)).cast("int")

  /** Inner equi-join `big ⋈ small` on `key`, salted into `buckets`
    * sub-keys. Result is row-identical to the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val b = big.withColumn("_salt", salt(big, buckets))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)))) // int sequence already
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Aggregation-side two-phase de-skew: aggregate by (key, salt) first
    * (partial shrink happens across `buckets` tasks), then re-aggregate
    * by key. `aggs` must be decomposable (sum/count/min/max). */
  def twoPhaseSum(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df.withColumn("_salt", salt(df, buckets))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
}
