package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave: the 64-bit pigeonhole widening (d26 / m08) that removes
  * the 256-key quadratic band join from the scale fingerprint family,
  * plus the hash-render guards added after r07's c15 driver-hash lesson.
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --- m08: wide perceptual near-dup ------------------------------------

  test("m08: full planted recall at 64 bits, pigeonhole-complete, strictly more precise than m07") {
    val pairs = ext.Multimodal.m08PhashNearDupWide(spark, sf0001)
      .select($"id1", $"id2", $"h1", $"h2", $"hamming")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (_, _, h1, h2, h) =>
      assert(h == java.lang.Long.bitCount(h1 ^ h2) && h <= 3)
    }
    // the sign-pack is real: bits 62/63 fire somewhere in the corpus, so
    // the negative-fingerprint path (xor/bit_count/shift-mask on a
    // negative long) is actually exercised, not just theoretically safe
    assert(pairs.exists(t => t._3 < 0L || t._4 < 0L),
      "expected at least one negative (bit-63) fingerprint in the pair set")
    val keys = pairs.map(t => (t._1, t._2)).toSet
    val base = Tables.documents(spark, sf0001).select($"doc_id").as[Long].collect()
    base.filter(_ % 10 == 0).foreach { d =>
      assert(keys.contains((d, d + 1000000L)), s"exact copy of $d missing")
    }
    base.filter(_ % 10 == 5).foreach { d =>
      assert(keys.contains((d, d + 2000000L)), s"re-encode of $d missing")
    }
    // pigeonhole COMPLETENESS at 4×16 bits: 3 flips cannot touch all 4
    // bands, so the banded join must equal the brute-force hamming<=3 set
    val fps = {
      val baseDf = Tables.documents(spark, sf0001).select($"doc_id", $"text")
      val corpus = baseDf
        .unionByName(baseDf.filter($"doc_id" % 10 === 0)
          .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
        .unionByName(baseDf.filter($"doc_id" % 10 === 5)
          .select(($"doc_id" + 2000000L).as("doc_id"),
            expr("""concat(substr(text, 1, length(text) div 2 - 1), 'z',
                           substr(text, length(text) div 2 + 1))""").as("text")))
      val pixels = expr(
        """transform(sequence(0, 63),
                     i -> ascii(substr(text, 1 + cast((i * length(text)) div 64 as int), 1)))""")
      corpus.select($"doc_id", pixels.as("px"))
        .withColumn("total", aggregate($"px", lit(0L), (acc, x) => acc + x))
        .withColumn("phash",
          (0 until 64).map(b =>
            when(element_at($"px", b + 1) * 64 > $"total", lit(1L << b)).otherwise(lit(0L)))
            .reduce(_ + _))
        .select($"doc_id", $"phash").as[(Long, Long)].collect()
    }
    val brute = (for {
      (i1, h1) <- fps; (i2, h2) <- fps
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    assert(keys == brute,
      s"banding missed ${(brute -- keys).size}, invented ${(keys -- brute).size}")
  }

  // --- c18: schema-change-topic DDL parsing -------------------------------

  test("SchemaChange.parseDdl: CREATE/ALTER forms parse; constraints, drops, renames don't contribute") {
    import graft.cdc.SchemaChange
    import graft.cdc.SchemaChange.DdlHint
    assert(SchemaChange.parseDdl(
      "CREATE TABLE testdb.sensor (id BIGINT NOT NULL, base INT, PRIMARY KEY (id))")
      .contains(DdlHint("sensor", Seq("id" -> "BIGINT NOT NULL", "base" -> "INT"))))
    // backticks, IF NOT EXISTS, paren-typed columns, enum commas
    assert(SchemaChange.parseDdl(
      """CREATE TABLE IF NOT EXISTS `testdb`.`orders` (`id` int, price decimal(12,4), e enum('a','b'))""")
      .contains(DdlHint("orders",
        Seq("id" -> "int", "price" -> "decimal(12,4)", "e" -> "enum('a','b')"))))
    assert(SchemaChange.parseDdl(
      "ALTER TABLE testdb.sensor ADD COLUMN extra SMALLINT DEFAULT NULL")
      .contains(DdlHint("sensor", Seq("extra" -> "SMALLINT DEFAULT NULL"))))
    assert(SchemaChange.parseDdl("ALTER TABLE sensor ADD note varchar(64)")
      .contains(DdlHint("sensor", Seq("note" -> "varchar(64)"))))
    assert(SchemaChange.parseDdl("DROP TABLE testdb.sensor").isEmpty)
    assert(SchemaChange.parseDdl("RENAME TABLE a TO b").isEmpty)
    assert(SchemaChange.parseDdl("TRUNCATE TABLE sensor").isEmpty)
    // the declared types resolve through TYPE_MAPPING despite modifiers
    import graft.cdc.TypeMapping
    import org.apache.spark.sql.types.{ShortType, DecimalType}
    assert(TypeMapping.toSparkType("SMALLINT DEFAULT NULL".toLowerCase) == ShortType)
    assert(TypeMapping.toSparkType("decimal(12,4)") == DecimalType(12, 4))
  }

  test("SchemaChange.hints: DDL events fold in offset order, widen-only, data topics ignored") {
    import graft.cdc.SchemaChange
    val rows = Seq(
      // a data-topic record must not contribute even if it carried ddl-ish text
      (0L, "dbserver1.testdb.sensor", """{"payload":{"op":"c","after":{"id":"1"}}}"""),
      (1L, "dbserver1", """{"payload":{"databaseName":"testdb","ddl":"CREATE TABLE sensor (id BIGINT, base INT)","ts_ms":1}}"""),
      (2L, "dbserver1", """{"payload":{"databaseName":"testdb","ddl":"ALTER TABLE sensor ADD COLUMN extra SMALLINT","ts_ms":2}}"""),
      // widen-only: a re-CREATE cannot retype an existing column
      (3L, "dbserver1", """{"payload":{"databaseName":"testdb","ddl":"CREATE TABLE sensor (id VARCHAR(10), brand_new DOUBLE)","ts_ms":3}}"""),
      // unparseable / non-additive events are skipped, not fatal
      (4L, "dbserver1", """{"payload":{"databaseName":"testdb","ddl":"DROP TABLE gone","ts_ms":4}}"""),
      (5L, "dbserver1", """not json at all"""))
      .toDF("offset", "topic", "value")
    val h = SchemaChange.hints(rows)
    assert(h.keySet == Set("sensor"))
    assert(h("sensor") == Map(
      "id" -> "BIGINT", "base" -> "INT", "extra" -> "SMALLINT",
      "brand_new" -> "DOUBLE"))
  }

  // --- hash-render guard --------------------------------------------------

  test("every oracle-eligible query renders driver-hashable columns only") {
    // codifies the r07 c15 lesson (and the round-1 decimal and round-6
    // t14 array findings): the driver's content hash digests SCALAR
    // typed values, so an oracle-checked query must never emit a
    // container/binary column, a VARIANT, or a zero-precision decimal.
    // Width/zone parity with the oracle SQL is checked on the DuckDB
    // side by tools/verify_local.py; this spec pins the Spark side.
    import org.apache.spark.sql.types._
    val oracled = SparkEntry.oracleSql.keySet
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.filter(q => oracled(q._1)).foreach { case (name, fn) =>
      fn(spark, sf0001).schema.fields.foreach { f =>
        f.dataType match {
          case _: ArrayType | _: MapType | _: StructType | BinaryType |
               _: VariantType | CalendarIntervalType =>
            bad += s"$name.${f.name}: ${f.dataType.catalogString}"
          case d: DecimalType if d.scale < 0 =>
            bad += s"$name.${f.name}: negative-scale ${d.catalogString}"
          case _ => // scalar, hashable
        }
      }
    }
    assert(bad.isEmpty, s"non-driver-hashable columns in oracled queries:\n${bad.mkString("\n")}")
  }
}
