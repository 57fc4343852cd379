package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level assertions for the round-4 wave: PII redaction,
  * repetition signals, benchmark contamination, temperature mixture
  * rebalancing, and the new relational surface (q58–q62).
  */
class Round4Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("t12: every doc has exactly one planted email/phone/ip, and redaction removes them all") {
    val rows = ext.TextAnalysis.t12PiiRedact(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 1 && r.getAs[Int]("n_phones") == 1 &&
             r.getAs[Int]("n_ips") == 1, s"doc ${r.get(0)}: expected 1 of each PII kind")
      val red = r.getAs[String]("redacted")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
      assert(!red.matches(s".*${ext.TextAnalysis.EmailRe}.*"), "email must not survive redaction")
      assert(!red.matches(s".*${ext.TextAnalysis.PhoneRe}.*"), "phone must not survive redaction")
    }
  }

  test("t13: repetition fractions are well-formed and detect a planted repeat") {
    val rows = ext.TextAnalysis.t13Repetition(spark, sf0001).collect()
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_token_frac")
      val top = r.getAs[Double]("top_bigram_share")
      assert(dup >= 0.0 && dup < 1.0, s"dup_token_frac out of range: $dup")
      assert(top >= 0.0 && top <= 1.0, s"top_bigram_share out of range: $top")
    }
    // a fully-repetitive document must dominate both signals
    val docs = Seq((1L, "spam spam spam spam spam spam"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    // reuse the same computation through a temp view of the query body shape
    val base = docs.select($"doc_id",
      size(ext.TextAnalysis.tokens($"text")).as("n_tokens"),
      size(array_distinct(ext.TextAnalysis.tokens($"text"))).as("n_distinct"))
    val r = base.withColumn("dup",
      ($"n_tokens" - $"n_distinct").cast("double") / $"n_tokens").collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("dup")).toMap
    assert(r(1L) > 0.8 && r(2L) == 0.0)
  }

  test("d11: planted copies of benchmark docs come back contaminated") {
    // derive the fixture from the table: a benchmark doc (doc_id % 97 == 0)
    // that also gets a planted exact copy (doc_id % 10 == 0, copy at +1e6) —
    // no dependence on the generator's id range starting at 0
    val benchIds = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 97 === 0 && $"doc_id" % 10 === 0)
      .select($"doc_id").as[Long].collect().sorted
    assert(benchIds.nonEmpty,
      "fixture precondition: need a doc with doc_id % 97 == 0 and % 10 == 0 at sf0.001")
    val benchId = benchIds.head
    val rows = ext.Dedup.d11Contamination(spark, sf0001).collect()
    val copy = rows.find(_.getAs[Long]("doc_id") == benchId + 1000000L)
    assert(copy.isDefined, s"planted exact copy of benchmark doc $benchId must be in the eval set")
    assert(copy.get.getAs[Boolean]("contaminated"), "exact copy must be flagged")
    assert(copy.get.getAs[Long]("n_shared") == copy.get.getAs[Long]("n_shingles"),
      "exact copy shares every shingle")
    // the benchmark docs themselves are excluded from the eval side
    assert(!rows.exists(r => { val id = r.getAs[Long]("doc_id"); id % 97 == 0 && id < 1000000L }))
  }

  test("d12: exact copies flagged, near copies flagged, fresh docs admitted") {
    val byId = ext.Dedup.d12IncrementalDedup(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.nonEmpty)
    // matched_id is the MIN matching index doc, which may be a smaller
    // near/exact twin of the source rather than the source itself — assert
    // the contract (a valid index doc; identical text for exact dups), not
    // the specific id
    val idxText = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    byId.foreach { case (id, r) =>
      val src = id % 1000000L
      if (id >= 3000000L) { // token-sorted rewrite: genuinely new
        assert(r.getAs[Boolean]("admit"), s"fresh doc $id must be admitted")
        assert(r.isNullAt(r.fieldIndex("matched_id")))
      } else if (id >= 2000000L) { // first token dropped: near dup of src
        assert(r.getAs[Boolean]("is_near_dup"), s"near copy $id must be flagged")
        assert(!r.getAs[Boolean]("admit"))
        val m = r.getAs[Long]("matched_id")
        assert(m >= 0L && m < 1000000L && idxText.contains(m),
          s"near copy $id must match an index doc, got $m")
      } else { // verbatim copy: exact dup of src
        assert(r.getAs[Boolean]("is_exact_dup"), s"exact copy $id must be flagged")
        assert(!r.getAs[Boolean]("admit"))
        val m = r.getAs[Long]("matched_id")
        assert(idxText.get(m).contains(idxText(src)),
          s"exact copy $id matched $m whose text differs from source $src")
      }
    }
  }

  test("p02: the smallest language keeps everything; larger ones downsample monotonically") {
    val rows = ext.Curation.p02DomainMix(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_orig"), r.getAs[Long]("n_kept")))
    assert(rows.nonEmpty)
    rows.foreach { case (l, orig, kept) => assert(kept <= orig, s"$l kept more than it had") }
    val minOrig = rows.map(_._2).min
    rows.filter(_._2 == minOrig).foreach { case (l, orig, kept) =>
      assert(kept == orig, s"smallest language $l must keep all docs (rate 1.0)")
    }
  }

  test("q59: try_cast maps junk to NULL, never errors") {
    val rows = ops.Relational5.q59TryCast(spark, sf0001).collect()
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      if (pk % 3 == 0) assert(!r.isNullAt(r.fieldIndex("try_int")))
      else assert(r.isNullAt(r.fieldIndex("try_int")), s"junk int for $pk must be NULL")
      if (pk % 13 == 0) assert(r.isNullAt(r.fieldIndex("try_date")), "month 00 must be NULL")
      else assert(!r.isNullAt(r.fieldIndex("try_date")))
    }
  }

  test("q61 plan: histogram bounds broadcast; one exchange for the bucket agg") {
    val p = ops.Relational5.q61Histogram(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), "1-row bounds must broadcast")
  }

  test("q62 plan: both windows and the island agg share one user_id shuffle") {
    val p = ops.Relational5.q62GapsIslands(spark, sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected a single user_id exchange, got $exchanges\n$p")
  }

  test("q62: island runs are maximal and ordered") {
    val rows = ops.Relational5.q62GapsIslands(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("run_len") >= 2)
      assert(!r.getAs[java.time.LocalDateTime]("run_start")
        .isAfter(r.getAs[java.time.LocalDateTime]("run_end")))
    }
  }
}
