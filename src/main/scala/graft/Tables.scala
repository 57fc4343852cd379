package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus
  * shared helpers for DuckDB-oracle numeric parity.
  *
  * Design note (100 TB posture): all loaders return lazy DataFrames over
  * parquet — Catalyst pushes filters/column pruning down to the scan, so
  * callers never pay for columns they don't read. Nothing here collects.
  */
object Tables {

  /** Local-mode scan parallelism knob. The driver's testdata is one
    * parquet file with ONE row group per table, so a scan — and anything
    * cached from it — is a single partition and every downstream narrow
    * stage runs on one core. A real 100 TB table is thousands of
    * row-groups and splits naturally; `graft.scan.repartition=N` emulates
    * that locally by fanning the scan out to N partitions. Applied inside
    * `load` so cached plans and query plans stay equal (CacheManager
    * substitutes on plan equality). Default 0 = off. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val n = spark.conf.getOption("graft.scan.repartition").map(_.toInt).getOrElse(0)
    if (n > 0) df.repartition(n) else df
  }

  /** HARNESS SHIM for FIXTURE-SIZED results only: pin the rows on the
    * driver and rebuild the frame from them, cutting its lineage — so
    * the scratch dirs / checkpoints the plan reads can be deleted (or
    * session confs restored) before the entry returns. Every call site
    * is bounded by construction (key-count or top-k results); never
    * use on corpus-sized output. One shared helper replaces the
    * per-call-site copies. */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = df.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), df.schema)
  }

  /** Recursive scratch-dir delete with the walk stream CLOSED — Files.walk
    * holds directory fds until its Stream closes, and the registry's
    * sink/scratch queries run twice per bench session. One shared helper
    * replaces the per-call-site copies. */
  def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.parquet` has shipped in two layouts: INT64 TIMESTAMP(NANOS)
    * (older driver drops) and plain TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (current). Branch on the type the reader actually infers; both paths
    * normalize `ts` to TIMESTAMP_NTZ at microsecond precision — the same
    * value DuckDB sees — so oracle comparisons on `ts` agree bit-for-bit.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      // legacy nanos-as-long layout: truncate to micros like DuckDB's
      // TIMESTAMP_NS -> TIMESTAMP coercion
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      // micros layout: already the oracle's value; pin NTZ (session TZ UTC)
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  // ---- Oracle-parity numeric helpers -----------------------------------
  //
  // Double summation is order-dependent, and Spark and DuckDB will not add
  // partitions in the same order — so any SUM over doubles is cast to
  // decimal first (exact, order-independent). The FINAL output column is
  // cast to DOUBLE: the exact decimal total converts to the same nearest
  // double in both engines, so results stay deterministic while the output
  // type is the one the driver's content hash treats canonically (round-1
  // finding: DECIMAL(38,x) outputs hash-mismatch even when values agree).
  // Inputs are 2-decimal money values, so DECIMAL(18,6) loses nothing.

  /** Cast a (possibly computed) double column to exact decimal before
    * aggregation. */
  def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** Order-independent exact sum of a double column, emitted as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum, then one double division. */
  def davg(c: Column): Column =
    sum(dec(c)).cast("double") / count(c)

  /** SQL fragments for the same helpers, for DuckDB oracle text.
    *
    * The decimal→double hop goes through a string: DuckDB's direct
    * DECIMAL→DOUBLE cast computes `double(int128 units) / double(10^scale)`
    * — two roundings, off by 1 ulp once the unit count passes 2^53 —
    * while its string→double parse is correctly rounded at any magnitude,
    * matching Spark's BigDecimal-based cast (probe-verified, round 2). */
  def sqlDec2Dbl(e: String): String = s"CAST(CAST($e AS STRING) AS DOUBLE)"
  def sqlDsum(e: String): String =
    sqlDec2Dbl(s"SUM(CAST($e AS DECIMAL(18,6)))")
  def sqlDavg(e: String): String =
    s"${sqlDsum(e)} / COUNT($e)"
}
