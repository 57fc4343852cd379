package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema synthesis + evolution (reference: `infer_clickhouse_type`
  * [consumer_to_file.py:115-127], `ensure_table` [129-153],
  * `alter_table_if_new_keys` [155-168]).
  *
  * The reference pays a DESCRIBE-TABLE round trip per message and an ALTER
  * per new column; here evolution happens once per micro-batch: widen the
  * catalog schema by name-union, then conform the batch with
  * `unionByName(allowMissingColumns)` semantics. No per-row work at all.
  */
object SchemaEvolution {

  /** Value-based type inference with the reference's precedence
    * (bool before int — [116-119]); dict/list → String (JSON). */
  def inferType(v: Any): DataType = v match {
    case _: Boolean            => BooleanType
    case _: Int | _: Long      => LongType
    case _: Float | _: Double  => DoubleType
    case _: String             => StringType
    case _: Map[_, _] | _: Seq[_] => StringType // JSON-stringified
    case _                     => StringType
  }

  /** Schema for a first record, with the reference's name heuristics
    * (forced-string names [135-136]; `_on` epoch-millis columns → timestamp
    * [137-138]). */
  def schemaFor(record: Map[String, Any]): StructType =
    StructType(record.toSeq.map { case (name, v) =>
      val t =
        if (Normalize.forcedStringColumns.contains(name)) StringType
        else v match {
          case n: Long if name.endsWith("_on") && n > 1e12.toLong => TimestampType
          case d: Double if name.endsWith("_on") && d > 1e12      => TimestampType
          case other                                              => inferType(other)
        }
      StructField(name, t, nullable = true)
    })

  /** Widen `base` with any fields present only in `incoming` (ALTER ADD
    * COLUMN IF NOT EXISTS semantics [162-168]); existing fields keep their
    * type — the reference never retypes. */
  def widen(base: StructType, incoming: StructType): StructType = {
    val known = base.fieldNames.toSet
    StructType(base.fields ++ incoming.fields.filterNot(f => known.contains(f.name)))
  }

  /** Conform a batch to a target schema: add missing columns as nulls,
    * cast matching names, project in target order. The batch-level
    * equivalent of per-record evolution. */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** unionByName with evolution across both sides. */
  def evolveUnion(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}
