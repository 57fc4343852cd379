package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup
import graft.functions.MinHash

/** The codegen'd map-side MinHash signature and the zero-explode LSH
  * pipeline built on it (d18): bit parity with the exploded signature
  * build, exact pair parity with the oracle-checked dictionary LSH, and
  * the plan guarantee that makes it the 100 TB path — no shuffle before
  * the band join.
  */
class MinHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhash_sig is bit-identical to the exploded xxhash64 signature build") {
    val corpus = Dedup.corpusWithCopies(Tables.documents(spark, sf0001))
    val exploded = Dedup.signatures(
        Dedup.shingles(corpus)
          .select($"doc_id", pmod(xxhash64($"shingle"), lit(Dedup.P)).as("sid")))
      .collect()
      .map(r => r.getLong(0) -> (1 to Dedup.K).map(i => r.getLong(i)).toSeq).toMap
    val mapSide = Dedup.shingleArrays(corpus).filter(size($"shingles") > 0)
      .select($"doc_id", MinHash.minhashSig($"shingles", Dedup.K, Dedup.P).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(mapSide.keySet == exploded.keySet)
    mapSide.foreach { case (id, sig) =>
      assert(sig == exploded(id), s"signature mismatch for doc $id")
    }
  }

  test("interpreted eval agrees with codegen (empty, single, many shingles)") {
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a b c")),
      (3L, Seq("a b c", "b c d", "c d e", "x y z"))
    ).toDF("doc_id", "shingles")
    val viaExpr = df.select($"doc_id",
      MinHash.minhashSig($"shingles", Dedup.K, Dedup.P).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // independent reference: the affine-min definition over pmod(xxhash64)
    val hashed = df.select($"doc_id", transform($"shingles",
        s => pmod(xxhash64(s), lit(Dedup.P))).as("sids"))
      .as[(Long, Seq[Long])].collect().toMap
    hashed.foreach { case (id, sids) =>
      val expect = (0 until Dedup.K).map { i =>
        if (sids.isEmpty) Dedup.P
        else sids.map(sid => (sid * Dedup.aCoef(i) + Dedup.bCoef(i)) % Dedup.P).min
      }
      assert(viaExpr(id) == expect, s"doc $id")
    }
  }

  test("d18 pairs: superset of the dictionary form, exact values, same candidates as d06") {
    val corpus = Dedup.corpusWithCopies(Tables.documents(spark, sf0001))
    val mapSide = Dedup.d18MinHashMapSide(spark, sf0001)
      .select($"id1", $"id2", $"inter", $"n1", $"n2")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(mapSide.nonEmpty)
    // every reported pair recomputes exactly from the raw shingle sets and
    // clears the jaccard ≥ 0.5 verification
    val sets = Dedup.shingleArrays(corpus)
      .as[(Long, Seq[String])].collect().map(t => t._1 -> t._2.toSet).toMap
    mapSide.foreach { case (id1, id2, inter, n1, n2) =>
      val (s1, s2) = (sets(id1), sets(id2))
      assert(inter == (s1 & s2).size.toLong && n1 == s1.size.toLong && n2 == s2.size.toLong,
        s"pair ($id1,$id2)")
      assert(inter * 2 >= n1 + n2 - inter)
    }
    // recall is at least the dictionary form's: its affine permutations
    // over dense ranks correlate more than xxhash64's, so banding there
    // can miss a true pair that the map-side path keeps (observed at
    // sf0.001: 4 extra jaccard≈0.98 pairs) — never the reverse
    val pairKeys = mapSide.map(t => (t._1, t._2)).toSet
    val dict = Dedup.minHashPairsDict(corpus)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(dict.subsetOf(pairKeys), s"dict pairs missing: ${dict -- pairKeys}")
    // identical hashing + banding to the exploded d06 path → identical
    // candidate survivors
    val exploded = Dedup.minHashLshScale(spark, sf0001)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairKeys == exploded)
    // the planted exact copies must all be found
    val planted = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 10 === 0).select($"doc_id").as[Long].collect()
    planted.foreach { id =>
      assert(pairKeys.contains((id, id + 1000000L)), s"planted copy of $id missing")
    }
  }

  test("map-side signature plan has no exchange before the band join") {
    val corpus = Dedup.corpusWithCopies(Tables.documents(spark, sf0001))
    val sig = Dedup.shingleArrays(corpus).filter(size($"shingles") > 0)
      .select($"doc_id", MinHash.minhashSig($"shingles", Dedup.K, Dedup.P).as("sig"))
    val exchanges = sig.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"signature build must be map-side:\n${sig.queryExecution.executedPlan}")
  }
}
