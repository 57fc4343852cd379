package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational7

/** Operator-level assertions for the round-6 decision-support wave:
  * regression aggregates, argmax-by-subquery, HAVING-semi-join,
  * disjunctive star join, and the "exactly one late supplier" double
  * correlation — each checked against an independent in-memory
  * recomputation at sf0.001 (the DuckDB differential runs at sf0.01).
  */
class Round6Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q82: moment-identity slope/corr match a direct driver-side computation") {
    val xy = Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[(String, Double, Double)].collect()
    val rows = Relational7.q82RegrStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = xy.filter(_._1 == r.getString(0))
      val n = g.length.toDouble
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => t._3 * t._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val cov = n * sxy - sx * sy
      val slope = cov / (n * sxx - sx * sx)
      val corr = cov / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6 * math.abs(slope),
        s"slope ${r.getAs[Double]("slope")} vs $slope for ${r.getString(0)}")
      assert(math.abs(r.getAs[Double]("corr") - corr) < 1e-6,
        s"corr ${r.getAs[Double]("corr")} vs $corr for ${r.getString(0)}")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1, s"r2 out of range: $r2")
      assert(math.abs(r.getAs[Double]("corr") * r.getAs[Double]("corr") - r2) < 1e-9)
    }
  }

  test("q85: every winner's revenue equals the max per-supplier revenue") {
    val perSupp = Tables.lineitem(spark, sf0001)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(Tables.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("t"))
      .select($"l_suppkey", $"t").as[(Long, Double)].collect()
    val mx = perSupp.map(_._2).max
    val winners = Relational7.q85TopSupplier(spark, sf0001)
      .select($"s_suppkey", $"total_revenue").as[(Long, Double)].collect()
    assert(winners.nonEmpty)
    winners.foreach { case (k, t) => assert(t == mx, s"supplier $k revenue $t != max $mx") }
    assert(winners.map(_._1).toSet == perSupp.filter(_._2 == mx).map(_._1).toSet)
  }

  test("q87: returned orders are exactly those whose quantity sum clears 250") {
    val sums = Tables.lineitem(spark, sf0001)
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      .select($"l_orderkey", $"q").as[(Long, Double)].collect().toMap
    val got = Relational7.q87LargeVolumeCustomers(spark, sf0001)
      .select($"o_orderkey", $"total_qty").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (ok, q) =>
      assert(q > 250 && math.abs(sums(ok) - q) < 1e-9, s"order $ok qty $q vs ${sums(ok)}")
    }
    assert(got.map(_._1).toSet == sums.filter(_._2 > 250).keySet)
  }

  test("q88: plan broadcasts the part dimension") {
    val plan = Relational7.q88DisjunctiveJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q89: grouped-pass reformulation matches the brute-force EXISTS semantics") {
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val ord = Tables.orders(spark, sf0001)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate").as[(Long, java.sql.Timestamp)]
      .collect().toMap
    val supp = Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap
    val byOrder = li.groupBy(_._1)
    val expected = li.flatMap { case (ok, sk, ship) =>
      ord.get(ok).flatMap { odate =>
        val lateCut = odate.toInstant.plus(java.time.Duration.ofDays(90))
        val sibs = byOrder(ok)
        val late = ship.toInstant.isAfter(lateCut)
        val othersExist = sibs.exists(_._2 != sk)
        val otherLate = sibs.exists(t => t._2 != sk && t._3.toInstant.isAfter(lateCut))
        if (late && othersExist && !otherLate) Some(supp(sk)) else None
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Relational7.q89WaitingSuppliers(spark, sf0001)
      .select($"s_name", $"numwait").as[(String, Long)].collect().toMap
    assert(got.nonEmpty)
    assert(got == expected, s"got $got expected $expected")
  }

  test("q96: top-80% customer counts recompute from a brute-force cumulative scan") {
    val rev = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"c_custkey")
      .agg(sum($"o_totalprice").as("rev"))
      .as[(String, Long, Double)].collect()
    val expected = rev.groupBy(_._1).map { case (seg, g) =>
      val ordered = g.sortBy(t => (-t._3, t._2)).map(t => BigDecimal(t._3))
      val tot = ordered.sum
      var cumBefore = BigDecimal(0); var nTop = 0L
      ordered.foreach { r =>
        if (cumBefore * 5 < tot * 4) nTop += 1
        cumBefore += r
      }
      seg -> (g.length.toLong, nTop)
    }
    val got = ops.Relational7.q96Pareto(spark, sf0001)
      .select($"c_mktsegment", $"n_customers", $"n_top80")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == expected)
    // sanity: revenue is concentrated — the top set is a strict minority nowhere near 0
    got.values.foreach { case (n, top) => assert(top > 0 && top < n) }
  }

  test("q95: shares sum to one per priority row and across the report") {
    val got = ops.Relational7.q95ShareOfTotal(spark, sf0001)
      .select($"o_orderpriority", $"revenue", $"share_in_priority", $"share_of_total")
      .as[(String, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._3).sum - 1.0) < 1e-9, "priority shares must sum to 1")
    }
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9, "total shares must sum to 1")
    val total = got.map(_._2).sum
    got.foreach { r => assert(math.abs(r._4 - r._2 / total) < 1e-9) }
  }

  test("d19: exactly one keeper per dup cluster, and it maximizes (quality, -doc_id)") {
    val rows = ext.Dedup.d19KeepBestDedup(spark, sf0001)
      .select($"doc_id", $"cluster_id", $"cluster_size", $"quality", $"is_kept")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.length == g.head._3.toInt, "every member of the cluster is present")
      assert(g.count(_._5) == 1, "exactly one keeper")
      val keeper = g.find(_._5).get
      val best = g.minBy(t => (-t._4, t._1))
      assert(keeper._1 == best._1, s"cluster ${keeper._2}: keeper not the best doc")
    }
    // the policy must actually diverge from min-id somewhere: a near copy
    // (original minus its first word) can out-score its source
    val minIdWins = rows.groupBy(_._2).values
      .count(g => g.find(_._5).get._1 == g.map(_._1).min)
    assert(minIdWins < rows.groupBy(_._2).size,
      "keep-best must pick a non-min-id doc in at least one cluster")
  }

  test("q94: transition counts equal a brute-force per-user ordered scan") {
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val expected = ev.groupBy(_._1).values.flatMap { g =>
      val ordered = g.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      ordered.dropRight(1).zip(ordered.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = ops.Relational7.q94EventTransitions(spark, sf0001)
      .select($"from_type", $"to_type", $"n", $"prob")
      .as[(String, String, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == expected)
    // probabilities are per-from conditional: each from-row sums to 1
    got.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("t21: confusion matrix rows reconcile with the per-doc t04 output") {
    val perDoc = ext.TextAnalysis.t04LangId(spark, sf0001)
      .select($"tagged_lang", $"predicted").as[(String, String)].collect()
    val expected = perDoc.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = ext.TextAnalysis.t21LangConfusion(spark, sf0001)
      .select($"tagged_lang", $"predicted", $"n", $"share")
      .as[(String, String, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2) -> t._3).toMap == expected)
    got.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9, "shares must sum to 1 per tagged lang")
    }
  }

  test("s12: exact re-rank never loses true-neighbor recall vs raw ADC order") {
    val embs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = embs.toMap
    val rows = ext.Similarity.s12RerankedPq(spark, sf0001)
      .select($"qid", $"rank", $"nid", $"cos_sim", $"coarse_rank")
      .as[(Long, Int, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    val adcTop1 = ext.Similarity.s09PqAnn(spark, sf0001)
      .filter($"rank" === 1).select($"qid", $"nid")
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val sorted = g.sortBy(_._2)
      // reported cosines recompute from the raw vectors and are rank-monotone
      sorted.foreach { case (_, _, nid, cs, crank) =>
        assert(math.abs(cs - cos(byId(qid), byId(nid))) < 1e-12, s"cos q$qid n$nid")
        assert(crank >= 1 && crank <= 50)
      }
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._4 >= b._4, s"q$qid rank order not cosine-monotone")
      case _ => ()
      }
      // re-ranking can only improve the winner: s09's ADC top-1 is in the
      // coarse pool, so the exact-cosine argmax over that pool beats it
      val best = sorted.head
      assert(best._4 >= cos(byId(qid), byId(adcTop1(qid))) - 1e-12,
        s"q$qid rerank winner worse than raw ADC winner")
    }
  }

  test("s13: truncation-recall overlap recomputes from brute-force rankings") {
    val embs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = embs.toMap
    def top10(qid: Long, dims: Int): Set[Long] =
      embs.filter(_._1 != qid)
        .map { case (id, e) => (id, cos(byId(qid).take(dims), e.take(dims))) }
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val got = ext.Similarity.s13MatryoshkaRecall(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (qid, n) =>
      val expect = (top10(qid, 64) & top10(qid, 16)).size.toLong
      assert(n == expect, s"q$qid overlap $n vs $expect")
      assert(n >= 1 && n <= 10)
    }
  }

  test("c14: snapshot diff equals brute-force latest-per-key states at both cuts") {
    val t1 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    def snap(cut: java.sql.Timestamp): Map[Long, Long] =
      ev.filter(!_._3.after(cut)).groupBy(_._1)
        .view.mapValues(_.maxBy(e => (e._3.getTime, e._2))._2).toMap
    val (s1, s2) = (snap(t1), snap(t2))
    val expected = (s1.keySet ++ s2.keySet).flatMap { u =>
      (s1.get(u), s2.get(u)) match {
        case (None, Some(n))            => Some(u -> ("added", None, Some(n)))
        case (Some(o), None)            => Some(u -> ("removed", Some(o), None))
        case (Some(o), Some(n)) if o != n => Some(u -> ("changed", Some(o), Some(n)))
        case _                          => None
      }
    }.toMap
    val got = cdc.CdcQueries.c14SnapshotDiff(spark, sf0001).collect().map { r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toMap
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("q91: MAD matches a driver-side interpolated-percentile recomputation") {
    def pctCont(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * p
      val lo = idx.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
    }
    val prices = Tables.orders(spark, sf0001)
      .select($"o_orderpriority", $"o_totalprice")
      .as[(String, Double)].collect().groupBy(_._1)
    val got = Relational7.q91Mad(spark, sf0001)
      .select($"o_orderpriority", $"median_price", $"mad")
      .as[(String, Double, Double)].collect()
    assert(got.length == prices.size)
    got.foreach { case (prio, med, mad) =>
      val xs = prices(prio).map(_._2)
      val expMed = pctCont(xs, 0.5)
      val expMad = pctCont(xs.map(x => math.abs(x - expMed)), 0.5)
      assert(math.abs(med - expMed) < 1e-9, s"median $prio")
      assert(math.abs(mad - expMad) < 1e-9, s"mad $prio")
    }
  }

  test("q92: mode is the max-count value with min-value tie-break") {
    val qty = Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_quantity").as[(String, Double)].collect()
    val got = Relational7.q92Mode(spark, sf0001)
      .select($"l_returnflag", $"mode_qty", $"n_mode")
      .as[(String, Double, Long)].collect()
    got.foreach { case (flag, mq, n) =>
      val counts = qty.filter(_._1 == flag).groupBy(_._2).view.mapValues(_.length).toMap
      val best = counts.toSeq.sortBy(t => (-t._2, t._1)).head
      assert((mq, n) == (best._1, best._2.toLong), s"mode for $flag")
    }
  }

  test("q93: attribution equals the brute-force latest-click-within-24h scan") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val expected = ev.filter(_._3 == "purchase").map { case (pid, uid, _, ts) =>
      val cand = clicksByUser.getOrElse(uid, Array.empty)
        .filter(c => !c._4.after(ts) &&
          !c._4.toInstant.isBefore(ts.toInstant.minus(java.time.Duration.ofHours(24))))
      // same tie-break as the query: latest ts, then max click_id among ties
      val att = if (cand.isEmpty) None
        else Some(cand.maxBy(c => (c._4.getTime, c._1))._1)
      pid -> att
    }.toMap
    val got = Relational7.q93FirstTouch(spark, sf0001)
      .select($"purchase_id", $"attributed_click_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("p07: splits partition the planted corpus and leaks are exactly the straddling texts") {
    val corpus = ext.Dedup.corpusWithCopies(Tables.documents(spark, sf0001))
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def splitOf(id: Long): String = {
      val b = (id * 2654435761L) % 1000L
      if (b < 800) "train" else if (b < 900) "val" else "test"
    }
    val bySplit = corpus.groupBy(t => splitOf(t._1))
    val leakTexts = corpus.groupBy(_._2).filter(_._2.map(t => splitOf(t._1)).distinct.size > 1).keySet
    val got = ext.Curation.p07HashSplit(spark, sf0001)
      .select($"split", $"n_docs", $"n_leaked").as[(String, Long, Long)].collect()
    assert(got.map(_._2).sum == corpus.length, "splits must partition the corpus")
    got.foreach { case (split, nDocs, nLeaked) =>
      assert(nDocs == bySplit(split).length.toLong)
      assert(nLeaked == bySplit(split).count(t => leakTexts.contains(t._2)).toLong,
        s"leak count for $split")
    }
  }

  test("t20: lift recomputes from brute-force bigram counts") {
    val docs = Tables.documents(spark, sf0001).select($"text").as[String].collect()
    val bgs = docs.flatMap { txt =>
      val t = txt.split("\\s+").filter(_.nonEmpty)
      t.dropRight(1).zip(t.drop(1))
    }
    val n = bgs.length.toDouble
    val nab = bgs.groupBy(identity).view.mapValues(_.length).toMap
    val na = bgs.groupBy(_._1).view.mapValues(_.length).toMap
    val nb = bgs.groupBy(_._2).view.mapValues(_.length).toMap
    val got = ext.TextAnalysis.t20Cooccurrence(spark, sf0001)
      .select($"w1", $"w2", $"n_ab", $"lift")
      .as[(String, String, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w1, w2, c, lift) =>
      assert(c == nab((w1, w2)).toLong && c >= 20)
      val expect = c.toDouble * n / (na(w1).toLong * nb(w2).toLong)
      assert(math.abs(lift - expect) < 1e-12 * expect, s"lift($w1,$w2)")
    }
    assert(got.length == nab.count(_._2 >= 20))
  }

  test("q90: rolled-up counts equal the brute-force idle-customer set") {
    val cust = Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect()
    val avgBal = {
      val pos = cust.map(_._3).filter(_ > 0)
      // same exact-decimal identity as davg
      pos.map(BigDecimal(_)).sum.toDouble / pos.length
    }
    val recent = Tables.orders(spark, sf0001)
      .filter($"o_orderdate" >= lit("2000-08-01").cast("timestamp"))
      .select($"o_custkey").as[Long].collect().toSet
    val expected = cust.filter(c => c._3 > avgBal && !recent.contains(c._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Relational7.q90IdleCustomers(spark, sf0001)
      .select($"c_mktsegment", $"n_customers").as[(String, Long)].collect().toMap
    assert(got.nonEmpty)
    assert(got == expected)
  }
}
