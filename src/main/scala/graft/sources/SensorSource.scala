package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 implementation: a deterministic synthetic
  * "sensor readings" table generated from pure integer arithmetic over the
  * row index — the Spark-native form of the reference's source-side data
  * generator (data_inserter.py:31-45 fabricates rows in a driver loop and
  * INSERTs them one connection at a time; here generation IS the scan, so
  * it parallelizes to any cluster width with zero driver work and zero
  * storage).
  *
  * Why DSv2 and not `spark.range(n).select(...)`: the point is the
  * connector surface itself — the same interfaces a real source (Kafka,
  * Iceberg, JDBC) implements. This source demonstrates, and PlanSpec
  * asserts, the three scan-time contracts that matter at 100 TB:
  *
  *   - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): the
  *     reader materializes ONLY the projected fields — a 2-column read of
  *     a 5-column table never computes the other 3 (`ReadSchema` in
  *     explain shows the pruned struct).
  *   - '''Filter pushdown''' ([[SupportsPushDownFilters]]): conjunctive
  *     range/equality predicates on `id` clamp the generated index range
  *     itself (`PushedFilters` in explain). Pushed filters are FULLY
  *     absorbed — the source returns no rows outside the clamp, and
  *     Spark does not re-evaluate them.
  *   - '''Partition pruning''': the index range splits into `slices`
  *     [[InputPartition]]s (default 8) AFTER clamping, so a selective id
  *     predicate shrinks the partition count — the DSv2 analogue of
  *     hive-partition pruning (o03), observable as `rdd.getNumPartitions`.
  *   - '''Limit / TopN pushdown''' ([[SupportsPushDownLimit]] /
  *     [[SupportsPushDownTopN]]): a LIMIT k (or ORDER BY id LIMIT k)
  *     shrinks the planned range itself to the k-row prefix/suffix of
  *     the clamp — `LIMIT 10` over a billion-row table generates 10
  *     rows and plans 1 partition (o07; Dsv2Spec-asserted).
  *
  * Row formula (exact integer arithmetic, replayed verbatim by the DuckDB
  * oracle over `range(n)` — every column is engine-exact):
  * {{{
  *   id      BIGINT        0..n-1
  *   sensor  INT           id % 97
  *   ts      TIMESTAMP_NTZ 2024-01-01 00:00:00 + id seconds
  *   reading DOUBLE        ((id * 2654435761) % 100000) / 1000.0
  *   status  STRING        id%13=0 -> 'alert' | id%5=0 -> 'warn' | 'ok'
  * }}}
  * (2654435761 is the Knuth multiplicative-hash constant already used by
  * the q40/p03/p10 sampler family; the product stays far below 2^63 for
  * any plausible n, and the final division of an exact integer by 1000.0
  * is one correctly-rounded IEEE operation in both engines.)
  */
object SensorSource {
  val NAME = "graft.sources.SensorSourceProvider"

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sensor", IntegerType, nullable = false),
    StructField("ts", TimestampNTZType, nullable = false),
    StructField("reading", DoubleType, nullable = false),
    StructField("status", StringType, nullable = false)))

  /** 2024-01-01T00:00:00 as epoch micros (NTZ micros == DuckDB TIMESTAMP). */
  val baseMicros: Long = 1704067200L * 1000000L

  private[sources] def statusOf(id: Long): String =
    if (id % 13 == 0) "alert" else if (id % 5 == 0) "warn" else "ok"

  /** Clamp [0, n) by the pushable `id` predicates; None = empty result.
    * The `v + 1` exclusive-bound conversions are overflow-guarded: a
    * `<= Long.MaxValue` / `= Long.MaxValue` filter must clamp to `n`
    * (match everything / the boundary row), not wrap to Long.MinValue
    * and report an incorrectly-empty absorbed result. */
  private[graft] def clamp(n: Long, filters: Seq[Filter]): Option[(Long, Long)] = {
    var lo = 0L
    var hi = n // exclusive
    def excl(v: Long): Long = if (v == Long.MaxValue) n else v + 1
    filters.foreach {
      case GreaterThan("id", v: Long)        =>
        // v = MaxValue: nothing can exceed it — empty via lo > any hi
        lo = if (v == Long.MaxValue) Long.MaxValue else math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, excl(v))
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, excl(v))
      case _                                 => ()
    }
    if (lo < hi) Some((lo, hi)) else None
  }

  /** Which of `filters` the source absorbs completely. */
  private[sources] def pushable(filters: Array[Filter]): Array[Filter] =
    filters.filter {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
          LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
          EqualTo("id", _: Long) => true
      case _ => false
    }

  /** Split the ORIGINAL [0,n) grid into `slices`, keep the ones that
    * intersect the pushed-filter clamp — grid stability is what makes
    * the pruning observable (a selective filter keeps few of the same
    * slices). Shared by the row scan and the aggregate scan.
    *
    * `takeFirst`/`takeLast` are the pushed LIMIT / TopN bounds: because
    * rows are generated in id order, "any k rows" (LIMIT) and "the k
    * largest/smallest ids" (TopN on id) are both contiguous sub-ranges
    * of the clamp — the k-bounded range replaces the full one, so a
    * LIMIT over a terabyte-scale range generates k rows, not a scan.
    * The min() forms keep `lo + k` / `hi - k` overflow-safe for any
    * rows value. */
  private[sources] def plannedSlices(rows: Long, slices: Int,
      pushed: Seq[Filter], takeFirst: Option[Long] = None,
      takeLast: Option[Long] = None): Array[InputPartition] =
    clamp(rows, pushed) match {
      case None => Array.empty
      case Some((lo0, hi0)) =>
        val hi = takeFirst.fold(hi0)(k => lo0 + math.min(math.max(k, 0L), hi0 - lo0))
        val lo = takeLast.fold(lo0)(k => hi - math.min(math.max(k, 0L), hi - lo0))
        val out = ArrayBuffer.empty[InputPartition]
        var i = 0
        while (i < slices) {
          val s = rows * i / slices
          val e = rows * (i + 1) / slices
          val a = math.max(s, lo)
          val b = math.min(e, hi)
          if (a < b) out += SensorPartition(a, b)
          i += 1
        }
        out.toArray
    }
}

/** `spark.read.format("graft-sensors").option("rows", n).option("slices", p)` */
class SensorSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sensors"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SensorSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val slices = Option(properties.get("slices")).map(_.toInt).getOrElse(8)
    // validate at table resolution, not at plan time: slices = 0 would
    // otherwise surface as a divide-by-zero deep inside plannedSlices,
    // and rows * slices overflow as negative partition bounds
    require(slices >= 1, s"graft-sensors: slices must be >= 1, got $slices")
    require(rows >= 0, s"graft-sensors: rows must be >= 0, got $rows")
    require(rows <= Long.MaxValue / math.max(slices, 1),
      s"graft-sensors: rows * slices overflows Long (rows=$rows, slices=$slices)")
    new SensorTable(rows, slices)
  }
}

class SensorTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_sensors($rows)"
  override def schema(): StructType = SensorSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SensorScanBuilder(rows, slices,
      Option(options.get("streamBatchRows")).map(_.toLong).getOrElse(math.max(rows / 4, 1L)))
}

class SensorScanBuilder(rows: Long, slices: Int, streamBatchRows: Long = 1L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var required: StructType = SensorSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggs: Array[AggregateFunc] = Array.empty
  private var takeFirst: Option[Long] = None
  private var takeLast: Option[Long] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = SensorSource.pushable(filters)
    // residual = everything we did NOT absorb; Spark re-evaluates those
    filters.filterNot(pushed.contains)
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our own field order; an empty projection (COUNT(*)) is legal
    required = StructType(
      SensorSource.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** PARTIAL aggregate pushdown: COUNT(*) / MIN(id) / MAX(id) over an id
    * range are closed-form per partition (b-a, a, b-1), so the "scan"
    * emits one arithmetic row per surviving slice and touches no data at
    * all; Spark merges the partials. Complete pushdown is declined — the
    * per-partition form is what distributes. */
  private def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case f: NamedReference => f.fieldNames.length == 1 && f.fieldNames()(0) == "id"
      case _ => false
    }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    val funcs = aggregation.aggregateExpressions
    val ok = funcs.nonEmpty && funcs.forall {
      case _: CountStar => true
      case m: Min => isId(m.column)
      case m: Max => isId(m.column)
      case _ => false
    }
    if (ok) aggs = funcs
    ok
  }

  /** LIMIT pushdown: rows generate in id order, so "any `limit` rows"
    * is the first `limit` ids of the filter clamp — the planned range
    * shrinks to a k-row prefix and slices outside it are pruned.
    * Reported as PARTIALLY pushed (Spark keeps its own limit operator —
    * at most k rows ever reach it, so the re-check is k-sized). */
  override def pushLimit(limit: Int): Boolean = {
    takeFirst = Some(limit.toLong)
    true
  }

  /** TopN pushdown, accepted only for a single sort key on `id`: the
    * top-k by id ASC is the k-row prefix of the clamp, by id DESC the
    * k-row suffix — contiguous either way, so the scan generates exactly
    * the k candidate rows and Spark's (partial-push) final sort orders
    * k rows instead of the clamp. Any other sort key is declined and
    * the full sort runs above the scan. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean =
    orders match {
      case Array(o) if isId(o.expression()) =>
        if (o.direction() == SortDirection.ASCENDING) takeFirst = Some(limit.toLong)
        else takeLast = Some(limit.toLong)
        true
      case _ => false
    }

  // both pushdown interfaces declare this default; Spark re-applies the
  // limit/sort above the scan, over at most k source rows
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    if (aggs.nonEmpty) new SensorAggScan(rows, slices, pushed, aggs)
    else new SensorScan(rows, slices, required, pushed, takeFirst, takeLast,
      streamBatchRows)
}

/** The aggregate-pushdown scan: one closed-form partial row per
  * surviving partition, no generated data rows anywhere. */
class SensorAggScan(rows: Long, slices: Int, pushed: Array[Filter],
    aggs: Array[AggregateFunc]) extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.map {
    case _: CountStar => StructField("count(*)", LongType, nullable = false)
    case m: Min       => StructField("min(id)", LongType, nullable = true)
    case _            => StructField("max(id)", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_sensors rows=$rows slices=$slices " +
      s"PushedFilters=[${pushed.mkString(", ")}] " +
      s"PushedAggregates=[${aggs.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    SensorSource.plannedSlices(rows, slices, pushed.toSeq)

  override def createReaderFactory(): PartitionReaderFactory =
    new SensorAggReaderFactory(aggs)
}

class SensorAggReaderFactory(aggs: Array[AggregateFunc])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SensorPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(aggs.toSeq.map {
        case _: CountStar => p.end - p.start
        case _: Min       => p.start
        case _            => p.end - 1
      })
      override def close(): Unit = ()
    }
  }
}

/** The row scan, with '''runtime filtering''' ([[SupportsRuntimeFiltering]]
  * — the DSv2 contract behind dynamic partition pruning): when this scan
  * sits on the probe side of a broadcast join, Spark builds the join keys
  * first and hands them to [[filter]] BEFORE partitions are planned; the
  * source absorbs the key set conservatively as a [min, max+1] range
  * clamp — a superset of the matching rows, which is all the contract
  * requires (the join re-checks) — so a selective dimension side shrinks
  * the generated range and the planned slices at RUNTIME, exactly like
  * hive-style DPP prunes partitions (o03) but negotiated through the
  * connector API. */
class SensorScan(rows: Long, slices: Int, required: StructType,
    pushed: Array[Filter], takeFirst: Option[Long] = None,
    takeLast: Option[Long] = None, streamBatchRows: Long = 1L)
    extends Scan with Batch
    with SupportsRuntimeFiltering {
  // runtime IN-filter clamp, conservative [min, max+1] over the key set;
  // mutated by Spark via filter() before planInputPartitions
  private var runtimeClamp: Option[(Long, Long)] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("id", vs) if vs != null =>
        val longs = vs.collect { case l: java.lang.Long => l.longValue() }
        if (longs.nonEmpty)
          runtimeClamp = Some((longs.min,
            if (longs.max == Long.MaxValue) Long.MaxValue else longs.max + 1))
        else runtimeClamp = Some((0L, 0L)) // empty build side: nothing matches
      case _ => ()
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_sensors rows=$rows slices=$slices " +
      s"PushedFilters=[${pushed.mkString(", ")}] " +
      s"ReadSchema=${required.fieldNames.mkString(",")}" +
      takeFirst.map(k => s" PushedLimit=$k").getOrElse("") +
      takeLast.map(k => s" PushedTopNDescLimit=$k").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val extra = runtimeClamp.toSeq.flatMap { case (lo, hi) =>
      Seq(GreaterThanOrEqual("id", lo): Filter, LessThan("id", hi): Filter)
    }
    SensorSource.plannedSlices(rows, slices, pushed.toSeq ++ extra,
      takeFirst, takeLast)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SensorReaderFactory(required)

  /** The STREAMING read contract ([[SensorMicroBatchStream]]): the same
    * deterministic id space consumed as an unbounded-source emulation,
    * `streamBatchRows` new ids per trigger. Column pruning applies to
    * the streaming scan unchanged; filter pushdown does NOT — Spark's
    * micro-batch planner keeps query filters above the streaming scan
    * (Dsv2Spec measures the source emitting the full admitted window),
    * so `pushed` carries only what batch planning absorbed, and the
    * per-batch planning slices the SAME grid as the batch scan. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SensorMicroBatchStream(rows, slices, required, pushed, streamBatchRows)
}

/** Offset = the count of ids made available so far (ids ARE the stream
  * position — the Kafka-offset analogy is exact). */
case class SensorOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/** DSv2 MICRO-BATCH streaming read — the fourth and last connector
  * contract after batch scan (o05), pushdowns (o06/o07/o08), and the
  * write path (o09/CommitSink): `latestOffset` admits `batchRows` more
  * ids per trigger (the rate-limiting a real source derives from its
  * log tail), `planInputPartitions(start, end)` slices exactly the
  * admitted [start, end) window over the SAME stable grid as the batch
  * scan — so a micro-batch parallelizes like any batch read and the
  * union of all micro-batches is by construction the batch result —
  * and `commit` marks progress (a no-op here: the generator can replay
  * any range, the replayability Kafka gives via seek). Offsets
  * round-trip through JSON for checkpoint recovery. */
class SensorMicroBatchStream(rows: Long, slices: Int, required: StructType,
    pushed: Array[Filter], batchRows: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  private var available = 0L

  override def initialOffset(): Offset = SensorOffset(0L)

  /** Checkpoint recovery lives HERE, not in deserializeOffset: on restart
    * the engine asks for new data BEFORE the source ever sees its restored
    * offsets, so a driver-memory admission counter alone would restart at
    * 0, plan a backwards (end < start) batch, commit the regressed offset,
    * and re-emit already-committed ids as duplicates (the r10 advice
    * finding — Round11Spec restarts a checkpointed stream and proves
    * exactly-once). SupportsAdmissionControl passes the restored start
    * offset into every latestOffset call, the hook a real source uses to
    * resume its rate-limited tail from the committed position. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val committed = start.asInstanceOf[SensorOffset].pos
    available = math.max(available, committed)
    available = math.min(available + math.max(batchRows, 1L), rows)
    // a `rows` option SHRUNK below the committed offset across a restart
    // must not regress it — returning < start would plan a backwards
    // batch, commit the regressed offset, and re-emit on the next
    // restart (the same duplicate class as the counter-reset bug)
    available = math.max(available, committed)
    SensorOffset(available)
  }

  /** Unreachable when SupportsAdmissionControl is implemented (the engine
    * always calls the (start, limit) form); kept as its documented
    * fallback contract. */
  override def latestOffset(): Offset = {
    available = math.min(available + math.max(batchRows, 1L), rows)
    SensorOffset(available)
  }
  override def deserializeOffset(json: String): Offset = {
    val off = SensorOffset(json.toLong)
    // defense in depth: any restored offset that passes through also
    // seeds the admission counter
    available = math.max(available, off.pos)
    off
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SensorOffset].pos
    val hi = end.asInstanceOf[SensorOffset].pos
    available = math.max(available, math.max(lo, hi))
    val window = Seq(GreaterThanOrEqual("id", lo): Filter, LessThan("id", hi): Filter)
    SensorSource.plannedSlices(rows, slices, pushed.toSeq ++ window)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SensorReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SensorPartition(start: Long, end: Long) extends InputPartition

class SensorReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SensorPartition]
    new SensorReader(p.start, p.end, required)
  }
}

/** Generates exactly the projected columns for ids in [start, end). */
class SensorReader(start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  // resolve the projection ONCE, not per row
  private val cols: Array[Long => Any] = required.fieldNames.map {
    case "id"      => (i: Long) => i
    case "sensor"  => (i: Long) => (i % 97).toInt
    case "ts"      => (i: Long) => SensorSource.baseMicros + i * 1000000L
    case "reading" => (i: Long) => ((i * 2654435761L) % 100000L) / 1000.0
    case "status"  => (i: Long) => UTF8String.fromString(SensorSource.statusOf(i))
  }
  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow = InternalRow.fromSeq(cols.map(_(id)).toSeq)
  override def close(): Unit = ()
}
