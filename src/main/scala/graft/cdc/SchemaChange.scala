package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium schema-change-topic handling — the last reference behavior
  * with no counterpart until round 8. The reference's connector sets
  * `include.schema.changes=true` [register-connector.sh:23], so Debezium
  * emits DDL events (payload carries a `ddl` statement plus the database
  * name) onto the SERVER-NAME topic (`dbserver1` — no dots, unlike the
  * `server.db.table` data topics). The reference's consumer silently
  * ignores that topic; here the DDL stream becomes what it should be: a
  * source of DECLARED-SCHEMA hints ([[TypeMapping]]) that spare the
  * ingest any value-based inference for tables whose DDL has been seen,
  * and give exact types (`smallint` stays 16-bit instead of voting to
  * long) — the same benefit as a hand-declared schema (c15), but driven
  * by the change stream itself.
  *
  * Scale shape: the DDL topic is METADATA-sized (one event per DDL
  * statement ever executed — thousands, not billions), so collecting it
  * on the driver and folding statements in offset order is the correct
  * plan at any corpus size; the hints then ride the normal declared
  * path ([[Pipeline.ingest]]'s `declared` argument), which keeps the
  * per-batch inference aggregation OFF the data topics entirely.
  */
object SchemaChange {

  /** Schema-change envelope: Debezium puts `databaseName` + `ddl` in the
    * payload (no before/after). Parsed leniently — unknown fields are
    * simply absent. */
  val schema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("databaseName", StringType),
      StructField("ddl", StringType),
      StructField("ts_ms", LongType))))))

  /** The server-name topic carries schema changes; data topics are
    * `server.db.table`. */
  def isSchemaChangeTopic(topic: Column): Column = !topic.contains(".")

  private val createRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[`"]?(?:[\w$]+[`"]?\.[`"]?)?([\w$]+)[`"]?\s*\((.*)\)[^)]*""".r
  private val alterAddRe =
    """(?is)\s*ALTER\s+TABLE\s+[`"]?(?:[\w$]+[`"]?\.[`"]?)?([\w$]+)[`"]?\s+ADD\s+(?:COLUMN\s+)?[`"]?([\w$]+)[`"]?\s+(.+?)\s*;?\s*""".r

  private val constraintKeywords =
    Set("primary", "unique", "key", "constraint", "index", "foreign", "check")

  /** Split a CREATE TABLE column list on TOP-LEVEL commas only (commas
    * inside `decimal(12,4)` / `enum('a','b')` parens don't split). */
  private[cdc] def splitColumns(defs: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    defs.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** One parsed DDL statement: the table it touches and the MySQL column
    * types it contributes (CREATE: all columns; ALTER ADD: one). */
  case class DdlHint(table: String, columns: Seq[(String, String)])

  /** Parse one DDL statement into a hint. Statements that do not add
    * columns (DROP, RENAME, TRUNCATE, constraint-only ALTERs) return
    * None — the reference never drops, and a dropped column simply stops
    * appearing in payloads (the append-only log keeps history). */
  def parseDdl(ddl: String): Option[DdlHint] = ddl match {
    case createRe(table, defs) =>
      val cols = splitColumns(defs).flatMap { d =>
        val name = d.takeWhile(c => !c.isWhitespace).stripPrefix("`").stripSuffix("`")
        val rest = d.drop(d.takeWhile(c => !c.isWhitespace).length).trim
        if (constraintKeywords.contains(name.toLowerCase) || rest.isEmpty) None
        else Some(name -> rest)
      }
      if (cols.isEmpty) None else Some(DdlHint(table, cols))
    case alterAddRe(table, column, mysqlType) =>
      Some(DdlHint(table, Seq(column -> mysqlType)))
    case _ => None
  }

  /** Fold a schema-change topic into declared-schema hints for
    * [[Pipeline.ingest]]: parse every DDL event, apply in `orderCol`
    * order, name-union per table — an existing column is never retyped
    * (the same widen-only rule as [[SchemaEvolution.widen]] and the
    * reference's ALTER ADD COLUMN IF NOT EXISTS [155-168]). The
    * `mysqlType` strings keep their modifiers (`NOT NULL`, `DEFAULT`);
    * [[TypeMapping.toSparkType]] reads the base type through them. */
  def hints(schemaChanges: DataFrame,
            topicCol: String = "topic", valueCol: String = "value",
            orderCol: String = "offset"): Map[String, Map[String, String]] = {
    val parsed = schemaChanges
      .filter(isSchemaChangeTopic(col(topicCol)))
      .withColumn("_sc", from_json(col(valueCol), schema))
      .select(col(orderCol), col("_sc.payload.ddl").as("ddl"))
      .filter(col("ddl").isNotNull)
      .orderBy(col(orderCol))
      .collect() // metadata-sized: one row per DDL statement ever seen
    parsed.foldLeft(Map.empty[String, Map[String, String]]) { (acc, row) =>
      parseDdl(row.getAs[String]("ddl")) match {
        case Some(DdlHint(table, cols)) =>
          val existing = acc.getOrElse(table, Map.empty)
          val added = cols.filterNot { case (c, _) => existing.contains(c) }
          acc + (table -> (existing ++ added))
        case None => acc
      }
    }
  }
}
