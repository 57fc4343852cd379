package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Curation, Dedup, TextAnalysis}

class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("curatedDocs: planted duplicates gone, quality floor enforced, langs tagged") {
    val docs = Curation.curatedDocs(spark, sf0001)
      .select($"doc_id", $"quality", $"lang").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(docs.nonEmpty)
    // dedup stage: no planted exact copy survives
    assert(!docs.exists(d => d._1 >= 1000000L && d._1 < 2000000L))
    // quality gate
    assert(docs.forall(_._2 >= Curation.QualityFloor))
    // language tag comes from the marker sets
    val langs = TextAnalysis.langMarkers.map(_._1).toSet
    assert(docs.forall(d => langs.contains(d._3)))
  }

  test("p01 chunk manifest: doc ranges ordered, budget respected, counts consistent") {
    val docs = Curation.curatedDocs(spark, sf0001)
    val nDocs = docs.count()
    val totalTokens = docs.agg(sum($"n_tokens")).as[Long].head()
    val chunks = Curation.p01CurateCorpus(spark, sf0001)
      .select($"chunk_id", $"n_docs", $"n_tokens", $"first_doc", $"last_doc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(chunks.map(_._2).sum == nDocs, "every curated doc is in exactly one chunk")
    assert(chunks.map(_._3).sum == totalTokens)
    // chunks partition the doc_id order: ranges don't interleave
    chunks.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, s"chunks ${a._1}/${b._1} interleave")
      case _ =>
    }
    // a chunk holds at most budget tokens beyond its last doc's spill-in
    // (docs aren't split, so a chunk can only exceed the budget by less
    // than its final doc's length); with ~50-token docs this bounds well
    val maxDocTokens = docs.agg(max($"n_tokens")).as[Long].head()
    assert(chunks.forall(_._3 < Curation.ChunkBudget + maxDocTokens))
  }

  test("s05 centroids: every cluster averages to finite components, 64 per cluster") {
    val rows = ext.Similarity.s05CentroidAgg(spark, sf0001)
      .select($"cid", $"pos", $"n_members", $"centroid_comp")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byCid = rows.groupBy(_._1)
    assert(byCid.nonEmpty && byCid.forall(_._2.length == 64))
    assert(rows.forall(r => !r._4.isNaN && !r._4.isInfinite))
    // n_members is constant across a cluster's 64 components
    byCid.foreach { case (_, rs) => assert(rs.map(_._3).distinct.length == 1) }
    // members are partitioned: cluster sizes sum to the corpus
    val total = byCid.values.map(_.head._3).sum
    assert(total == Tables.embeddings(spark, sf0001).count())
  }
}
