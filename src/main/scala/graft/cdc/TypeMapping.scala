package graft.cdc

import org.apache.spark.sql.types._

/** Declared-schema ingestion: the reference's MySQL→ClickHouse
  * `TYPE_MAPPING` [consumer_to_file.py:15-55] re-expressed as
  * MySQL→Spark `DataType`. This is the "I know the source table's DDL"
  * path that complements value-based inference
  * ([[SchemaEvolution.inferType]] / [[Pipeline.inferTableKeyTypes]]):
  * with a declared schema the per-batch inference job disappears
  * entirely and column types are exact instead of voted.
  *
  * Documented improvements over the reference's lossy picks (each is a
  * deliberate divergence, not an omission):
  *  - `decimal(p,s)` → `DecimalType(p,s)` (reference: `Float64`, which
  *    silently loses exactness for money columns — the one mapping the
  *    reference gets observably wrong);
  *  - `datetime` → `TimestampNTZType` (MySQL DATETIME carries no zone)
  *    while `timestamp` → `TimestampType` (MySQL TIMESTAMP is
  *    UTC-normalized); the reference folds both into `DateTime`;
  *  - `bit`/`bool`/`boolean` → `BooleanType` (reference: `UInt8` 0/1 —
  *    [[Normalize.boolToInt]] recovers that representation on demand);
  *  - `year` → `ShortType` (reference `UInt16`; YEAR values are
  *    1901–2155, so a signed short holds them).
  * Everything else is faithful, including the deliberately stringy
  * entries: `time`→String, blobs/binary→String (decoded utf-8 with
  * replacement, [[Normalize.bytesToUtf8]]), `json`/`uuid`/`enum`→String,
  * and the `null` fallback→String.
  */
object TypeMapping {

  /** The reference's mapping table, keyed by lowercase MySQL base type.
    * `decimal` appears here with MySQL's default (10,0); declared
    * precision/scale is handled by [[toSparkType]]'s argument parsing. */
  val mapping: Map[String, DataType] = Map(
    "tinyint"    -> ByteType,
    "smallint"   -> ShortType,
    "mediumint"  -> IntegerType,
    "int"        -> IntegerType,
    "integer"    -> IntegerType,
    "bigint"     -> LongType,
    "float"      -> FloatType,
    "double"     -> DoubleType,
    "decimal"    -> DecimalType(10, 0),

    "bit"        -> BooleanType,
    "boolean"    -> BooleanType,
    "bool"       -> BooleanType,

    "char"       -> StringType,
    "varchar"    -> StringType,
    "text"       -> StringType,
    "tinytext"   -> StringType,
    "mediumtext" -> StringType,
    "longtext"   -> StringType,

    "blob"       -> StringType,
    "tinyblob"   -> StringType,
    "mediumblob" -> StringType,
    "longblob"   -> StringType,

    "date"       -> DateType,
    "datetime"   -> TimestampNTZType,
    "timestamp"  -> TimestampType,
    "time"       -> StringType,
    "year"       -> ShortType,

    "json"       -> StringType,
    "uuid"       -> StringType,
    "binary"     -> StringType,
    "varbinary"  -> StringType,
    "enum"       -> StringType,

    "null"       -> StringType // fallback, faithful to the reference
  )

  private val argsRe = """\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r

  /** A full MySQL column type (`"varchar(255)"`, `"decimal(12,4)"`,
    * `"int unsigned"`, `"enum('a','b')"`) → Spark type. The base name is
    * everything before the first `(` or space (so length args, enum
    * value lists, and `unsigned`/`zerofill` modifiers are ignored);
    * unknown bases take the reference's `null` fallback (String). */
  def toSparkType(mysqlType: String): DataType = {
    val t = mysqlType.trim.toLowerCase
    val base = t.takeWhile(c => c != '(' && c != ' ')
    base match {
      case "decimal" | "numeric" =>
        argsRe.findFirstMatchIn(t) match {
          case Some(m) =>
            // MySQL allows precision up to 65; Spark decimals cap at 38.
            // Clamp instead of throwing — a declared decimal(65,s) keeps
            // 38 significant digits, still strictly better than the
            // reference's unconditional Float64 (~16 digits).
            val p = math.min(m.group(1).toInt, DecimalType.MAX_PRECISION)
            val s = math.min(Option(m.group(2)).map(_.toInt).getOrElse(0), p)
            DecimalType(math.max(p, 1), s)
          case None => DecimalType(10, 0) // MySQL's default decimal
        }
      case b => mapping.getOrElse(b, StringType)
    }
  }
}
