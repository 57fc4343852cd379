package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StructType, TimestampNTZType, TimestampType}

/** The temporal partition transforms as DSv2 FUNCTIONS (o46) — the
  * counterpart of [[BucketFunction.unbound]] for `days` / `months` /
  * `years` / `truncate`, served by [[CommitCatalog]]'s FunctionCatalog
  * face exactly the way Iceberg's Spark integration ships its
  * SparkFunctions. Single-transform temporal layouts never needed them
  * (a monotone transform plans an ORDERED distribution on the raw
  * column — no function resolution anywhere, see CommitWriteBuilder);
  * what does need them is the MULTI-transform spec: clustering a write
  * by `(days(ts), bucket(8, user_id))` requires Spark to resolve every
  * component through the relation's FunctionCatalog, so each transform
  * must exist as a bound function. Results are BIT-IDENTICAL to the
  * corresponding [[CommitSink.PartSpec]].keyOf — the writer re-derives
  * each row's recorded key with keyOf, and the clustered distribution
  * must group rows by exactly that value or one key could land in two
  * tasks (legal — the grouped scan collects multi-file keys — but a
  * file-count regression).
  *
  * Ref: Iceberg spec "Partition Transforms" — months since 1970-01,
  * years since 1970, epoch days; truncate W: v - (v mod W). */
private[graft] object TransformFunctions {

  /** Epoch day of a raw temporal value (micros for timestamps, days for
    * DATE) — one shared branch, the [[CommitSink.DaysSpec]] rule. */
  def epochDay(raw: Long, dt: DataType): Long = dt match {
    case DateType => raw
    case _ => Math.floorDiv(raw, 86400000000L)
  }

  def monthOrdinal(raw: Long, dt: DataType): Int = {
    val d = java.time.LocalDate.ofEpochDay(epochDay(raw, dt))
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  def yearOrdinal(raw: Long, dt: DataType): Int =
    java.time.LocalDate.ofEpochDay(epochDay(raw, dt)).getYear - 1970

  private def temporalOk(dt: DataType): Boolean =
    dt == DateType || dt == TimestampType || dt == TimestampNTZType

  private def rawOf(input: InternalRow, dt: DataType): Long =
    if (dt == DateType) input.getInt(0).toLong else input.getLong(0)

  /** One unbound temporal transform; `eval` gets (raw, dt). */
  private def temporal(fnName: String, doc: String,
                       eval: (Long, DataType) => Int): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fnName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.length == 1,
          s"graft-commit: $fnName takes one temporal column, got ${inputType.length} args")
        val dt = inputType(0).dataType
        require(temporalOk(dt),
          s"graft-commit: $fnName needs DATE or TIMESTAMP, got ${dt.simpleString}")
        new ScalarFunction[Integer] {
          override def inputTypes(): Array[DataType] = Array(dt)
          override def resultType(): DataType = IntegerType
          override def name(): String = fnName
          override def canonicalName(): String = s"graft.$fnName"
          override def isResultNullable: Boolean = false
          override def produceResult(input: InternalRow): Integer =
            eval(rawOf(input, dt), dt)
        }
      }
    }

  val days: UnboundFunction = temporal("days",
    "days(col): epoch day of a DATE/TIMESTAMP (Iceberg days transform)",
    (raw, dt) => epochDay(raw, dt).toInt)

  /** hours is TIMESTAMP-only (its PartSpec refuses DATE at create), but
    * the bound form shares the temporal scaffold — a DATE input can only
    * reach it through a hand-built catalog call, where the epoch-day
    * branch would still be wrong by a factor of 24, so refuse there. */
  val hours: UnboundFunction = temporal("hours",
    "hours(col): hours since epoch of a TIMESTAMP (Iceberg hours transform)",
    (raw, dt) => {
      require(dt != DateType, "graft-commit: hours(col) needs TIMESTAMP, got DATE")
      Math.floorDiv(raw, 3600000000L).toInt
    })

  val months: UnboundFunction = temporal("months",
    "months(col): months since 1970-01 (Iceberg months transform)",
    (raw, dt) => monthOrdinal(raw, dt))

  val years: UnboundFunction = temporal("years",
    "years(col): years since 1970 (Iceberg years transform)",
    (raw, dt) => yearOrdinal(raw, dt))

  val truncate: UnboundFunction = new UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width, col): width-band truncation of an integral key " +
        "(Iceberg truncate transform: v - (v mod width))"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"graft-commit: truncate takes (width, key), got ${inputType.length} args")
      require(inputType(0).dataType == IntegerType ||
          inputType(0).dataType == LongType,
        s"graft-commit: truncate's width must be integral, got " +
          inputType(0).dataType.simpleString)
      val widthType = inputType(0).dataType
      val keyType = inputType(1).dataType
      require(keyType == LongType || keyType == IntegerType,
        s"graft-commit: truncate keys must be BIGINT or INT, got ${keyType.simpleString}")
      new ScalarFunction[java.lang.Long] {
        override def inputTypes(): Array[DataType] = Array(widthType, keyType)
        override def resultType(): DataType = LongType
        override def name(): String = "truncate"
        override def canonicalName(): String = "graft.truncate"
        override def isResultNullable: Boolean = false
        override def produceResult(input: InternalRow): java.lang.Long = {
          val w = if (widthType == LongType) input.getLong(0) else input.getInt(0).toLong
          val v = if (keyType == LongType) input.getLong(1) else input.getInt(1).toLong
          Math.floorDiv(v, w) * w
        }
      }
    }
  }
}
