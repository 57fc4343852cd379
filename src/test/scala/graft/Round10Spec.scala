package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 wave: the r9 verdict/advice closures — the c15/c17 `price`
  * DECIMAL→DOUBLE report widening (the last driver-hash reds), the p15
  * explicit-+Inf contribution path (engine-independent by construction
  * since r10), the d21 sweep's portable md5-prefix hash family (the
  * rows-only → oracle-exact promotion), and the inactivity-timer
  * monotone state merge (covered in StreamingSpec).
  */
class Round10Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --- p15: the infinite-contribution path ------------------------------

  test("p15: a new-only language yields an explicit +Inf contribution and chi2") {
    // The sf fixtures have no new-only language, so the driver's DuckDB
    // differential never exercises expected_new = 0 — and DuckDB's float
    // x/0.0 semantics have varied across versions (NULL vs Inf). Since
    // r10 the +Inf is EXPLICIT on both sides (when/CASE), so this pin is
    // of our own arithmetic, not an engine's division convention.
    val counts = Seq(
      ("en", 50L, 60L),
      ("de", 30L, 25L),
      ("xx", 0L, 7L) // present ONLY in the new release
    ).toDF("lang", "n_old", "n_new")
    val got = ext.Curation.distDriftOver(counts)
      .select($"lang", $"expected_new", $"contribution", $"chi2", $"dof")
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("xx")._2 == 0.0, "expected_new must be exactly 0 for a new-only lang")
    assert(got("xx")._3.isPosInfinity, "new-only language must contribute +Inf")
    // the total absorbs the Inf: the release gate screams, as documented
    got.values.foreach(r => assert(r._4.isPosInfinity, "chi2 total must be +Inf"))
    got.values.foreach(r => assert(r._5 == 2L, "dof = k - 1 = 2"))
    // finite rows stay finite and exact: en expected = 92 * 50 / 80
    assert(got("en")._2 == 92.0 * 50.0 / 80.0)
    assert(!got("en")._3.isInfinity && !got("de")._3.isInfinity)
  }

  test("p15: the registered query still has no Inf rows on the sf fixture") {
    // guards the refactor: the fixture path (no new-only language) must
    // be unchanged by the explicit-Inf branch
    val rows = ext.Curation.p15DistDrift(spark, sf0001)
      .select($"contribution").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(c => !c.isInfinity && !c.isNaN))
  }

  // --- c15/c17: the decimal-free report projection ----------------------

  test("c15 report has no decimal column anywhere (the driver-hash red class)") {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val rep = cdc.CdcQueries.c15DeclaredSchema(spark, sf0001).schema
    assert(!rep.fields.exists(_.dataType.isInstanceOf[DecimalType]),
      "VERDICT r09: the red set == the decimal-output set; the report must carry none")
    assert(rep.fields.find(_.name == "price").get.dataType == DoubleType)
    // the widening is lossless on the fixture domain: X.25 with X < 10000
    val prices = cdc.CdcQueries.c15DeclaredSchema(spark, sf0001)
      .select($"price").as[Double].collect()
    assert(prices.nonEmpty)
    prices.foreach { p =>
      assert(p * 4 == math.rint(p * 4), s"price $p not an exact quarter")
      assert(p < 10000.0)
    }
  }

  // --- d21: the portable-hash sweep --------------------------------------

  test("d21: sid family is the md5-prefix portable hash, bit-equal to its SQL form") {
    // the Spark expression and the DuckDB oracle text must derive the
    // same sid for any shingle — pin a few literals through the Spark
    // side against an independent Scala reimplementation
    val sids = spark.range(1).select(
      Seq("the quick brown", "fox jumps over", "a b c").map(s =>
        ext.Dedup.sidPortable(lit(s)).as(s.take(3))): _*)
      .collect()(0)
    def expected(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % ext.Dedup.P
    }
    assert(sids.getLong(0) == expected("the quick brown"))
    assert(sids.getLong(1) == expected("fox jumps over"))
    assert(sids.getLong(2) == expected("a b c"))
  }
}
