package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 wave: the scale fixes from the r8 verdict — the centroid fold
  * ported onto the s15 hierarchical bucket device (no aggregation buffer
  * grows with IVF-cell membership), s17's per-slice top-k moved from a
  * window sort to the bounded-heap pair aggregator, the d29 packed-key
  * position field widened to 43 bits, and the SensorSource boundary /
  * option-validation hardening from ADVICE.
  */
class Round9Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --- s05/s16: hierarchical centroid fold ------------------------------

  test("s05: every collect_list aggregates within a bucket or over bucket partials, never raw cell membership") {
    val plan = ext.Similarity.s05CentroidAgg(spark, sf0001)
      .queryExecution.optimizedPlan
    val collectAggs = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.collectFirst { case e if e.prettyName == "collect_list" => e }.isDefined) => a
    }
    assert(collectAggs.nonEmpty, "expected collect_list aggregates in the fold")
    collectAggs.foreach { a =>
      val keys = a.groupingExpressions.flatMap(_.references.map(_.name)).toSet
      // level 1 groups by (cid, pos, b) — the 256-vector bucket bounds the
      // collect; level 2 groups by (cid, pos) but collects only the
      // |cell|/256 bucket PARTIALS (its child is the level-1 aggregate)
      val level1 = keys.exists(_ == "b")
      val childIsL1 = a.child.collectFirst {
        case c: Aggregate if c.groupingExpressions.size == 3 => c
      }.isDefined
      assert(level1 || childIsL1,
        s"collect_list aggregate bounded neither by bucket nor by partials:\n$a")
    }
  }

  test("s05: bucketed fold is bit-identical to a locally-replayed two-level ordered fold") {
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    // replicate the IVF assignment: nearest of the first-16 centroids by
    // double-fold dot, ties to the smaller cid
    val cents = e.filter(_._1 < ext.Similarity.NList)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val assigned = e.map { case (id, emb) =>
      val best = cents.map { case (cid, ce) => (-dot(emb, ce), cid) }.min._2
      (id, best, emb)
    }
    // two-level fold: members by vec_id inside floor(id/256) buckets,
    // bucket partials by bucket id
    val expect = assigned
      .flatMap { case (id, cid, emb) =>
        emb.zipWithIndex.map { case (c, pos) => ((cid, pos), (id, c.toDouble)) } }
      .groupBy(_._1)
      .map { case ((cid, pos), xs) =>
        val byBucket = xs.map(_._2).groupBy { case (id, _) => id / 256 }
        val partials = byBucket.toSeq.sortBy(_._1).map { case (_, m) =>
          m.sortBy(_._1).foldLeft(0.0) { case (a, (_, c)) => a + c }
        }
        val s = partials.foldLeft(0.0)(_ + _)
        ((cid, pos), (xs.size.toLong, s / xs.size))
      }
    val got = ext.Similarity.s05CentroidAgg(spark, sf0001)
      .select($"cid", $"pos", $"n_members", $"centroid_comp")
      .as[(Long, Int, Long, Double)].collect()
      .map { case (cid, pos, n, m) => ((cid, pos), (n, m)) }.toMap
    assert(got.size == expect.size)
    expect.foreach { case (k, (n, m)) =>
      val (gn, gm) = got(k)
      assert(gn == n, s"n_members mismatch at $k")
      assert(java.lang.Double.doubleToLongBits(gm) ==
        java.lang.Double.doubleToLongBits(m),
        s"mean not bit-identical at $k: $gm vs $m")
    }
  }

  // --- s17: bounded-heap pair top-k -------------------------------------

  test("s17: no window sort in the plan; result equals the window form exactly") {
    val df = ext.Similarity.s17CrosslingualMining(spark, sf0001)
    val physical = df.queryExecution.executedPlan.toString
    // the per-vector IVF assignment window (partitioned by vec_id, key
    // cardinality = corpus) is fine; what must be gone is the top-k
    // window over the Σ|cell|² candidate volume partitioned by the
    // ~languages² (lang1, lang2) slices
    assert(!physical.contains("windowspecdefinition(lang1"),
      s"s17 must not window-sort the candidate volume by lang pair:\n$physical")
    assert(physical.contains("ObjectHashAggregate") || physical.contains("SortAggregate"),
      "expected the TopKPairByScore partial aggregation")
    // window-form reference, built inline (the pre-r9 shape)
    val got = df.select($"lang1", $"lang2", $"rank", $"id1", $"id2", $"cos_sim")
      .as[(String, String, Int, Long, Long, Double)].collect().toSet
    val pairsRef = {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, sf0001).select($"vec_id", $"embedding")
      val lang = Tables.documents(spark, sf0001).select($"doc_id".as("vec_id"), $"lang")
      val a = ext.Similarity.ivfAssigned(e).join(lang, "vec_id")
      val pairs = a.as("x").join(a.as("y"),
          col("x.cid") === col("y.cid") && col("x.vec_id") < col("y.vec_id") &&
            col("x.lang") =!= col("y.lang"))
        .select(col("x.lang").as("lang1"), col("y.lang").as("lang2"),
          col("x.vec_id").as("id1"), col("y.vec_id").as("id2"),
          ext.Similarity.cosine(col("x.embedding"), col("y.embedding")).as("cos_sim"))
      val w = Window.partitionBy($"lang1", $"lang2")
        .orderBy($"cos_sim".desc, $"id1", $"id2")
      pairs.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
        .select($"lang1", $"lang2", $"rank", $"id1", $"id2", $"cos_sim")
        .as[(String, String, Int, Long, Long, Double)].collect().toSet
    }
    assert(got == pairsRef, "aggregator top-3 differs from the window form")
  }

  // --- d29: widened packed position field -------------------------------

  test("d29 packing survives positions beyond 2^20 (the old field width)") {
    // p = 3,000,000 would underflow a 20-bit position field into the hash
    // bits; at 43 bits the decode must round-trip for any realistic doc
    val df = Seq(("fffff", 3000000L), ("00001", 5L), ("abcde", 1048576L))
      .toDF("h5", "p")
      .withColumn("key",
        conv($"h5", 16, 10).cast("long") * 8796093022208L +
          (lit(8796093022207L) - $"p"))
      .withColumn("h_back", ($"key" / 8796093022208L).cast("long"))
      .withColumn("p_back", lit(8796093022207L) - pmod($"key", lit(8796093022208L)))
    df.select($"h5", $"p", $"h_back", $"p_back")
      .as[(String, Long, Long, Long)].collect().foreach {
        case (h5, p, hb, pb) =>
          assert(hb == java.lang.Long.parseLong(h5, 16), s"hash corrupted for $h5/$p")
          assert(pb == p, s"position corrupted for $h5/$p")
      }
  }

  // --- d30: containment pairing on winnowed anchors ---------------------

  test("d30: planted exact copies pair at 100% containment; near copies pair; bounds hold") {
    val out = ext.Dedup.d30ContainmentDedup(spark, sf0001)
      .select($"id1", $"id2", $"n_shared", $"n1", $"n2", $"containment_pct")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id1, id2, sh, n1, n2, pct) =>
      assert(id1 < id2)
      assert(sh <= math.min(n1, n2), "shared cannot exceed either side")
      assert(pct > 50.0 - 1e-9 && pct <= 100.0 + 1e-9, s"containment out of range: $pct")
    }
    val keys = out.map(t => (t._1, t._2)).toSet
    val base = Tables.documents(spark, sf0001).select($"doc_id").as[Long].collect()
    base.filter(_ % 10 == 0).foreach { d =>
      val hit = out.find(t => t._1 == d && t._2 == d + 1000000L)
      assert(hit.isDefined, s"exact copy of $d missing from containment pairs")
      assert(hit.get._6 == 100.0, s"exact copy of $d not at 100% containment")
    }
    base.filter(_ % 10 == 5).foreach { d =>
      assert(keys.contains((d, d + 2000000L)), s"near copy of $d missing")
    }
  }

  // --- p12: token-budget epoch allocation -------------------------------

  test("p12: budget math invariants — caps, shares, and allocation bounds") {
    val rows = ext.Curation.p12TokenBudget(spark, sf0001)
      .select($"lang", $"n_tokens", $"q_share", $"target_tokens",
        $"epochs_raw", $"epochs", $"alloc_tokens", $"data_constrained")
      .as[(String, Long, Double, Double, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_._2).sum
    val budget = totalTokens.toDouble * ext.Curation.BudgetMultiple
    // target shares are a distribution; targets sum to the whole budget
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._4).sum - budget) < budget * 1e-12)
    rows.foreach { case (lang, nt, _, target, raw, ep, alloc, constrained) =>
      assert(ep <= ext.Curation.MaxEpochs + 1e-12, s"$lang over the epoch cap")
      assert(constrained == (raw > ext.Curation.MaxEpochs), s"$lang flag wrong")
      if (!constrained) assert(ep == raw && math.abs(alloc - target) < 1e-6,
        s"$lang: uncapped domain must receive its full target")
      else assert(alloc == ext.Curation.MaxEpochs * nt,
        s"$lang: capped domain must allocate exactly MaxEpochs × corpus")
    }
    // the capped domains leave budget unfilled — the report's point
    assert(rows.map(_._7).sum <= budget + 1e-6)
  }

  // --- SensorSource hardening (ADVICE r8) -------------------------------

  test("sensor source: Long.MaxValue boundary filters don't overflow the clamp") {
    import org.apache.spark.sql.sources._
    // <= MaxValue absorbs everything (not an empty wrap-around)
    assert(sources.SensorSource.clamp(100L,
      Seq(LessThanOrEqual("id", Long.MaxValue))).contains((0L, 100L)))
    // = MaxValue matches nothing in [0, n) but must not wrap
    assert(sources.SensorSource.clamp(100L,
      Seq(EqualTo("id", Long.MaxValue))).isEmpty)
    // > MaxValue can never match
    assert(sources.SensorSource.clamp(100L,
      Seq(GreaterThan("id", Long.MaxValue))).isEmpty)
    // and the end-to-end read with the boundary filter returns all rows
    val n = spark.read.format("graft-sensors").option("rows", 64)
      .load().filter($"id" <= Long.MaxValue).count()
    assert(n == 64L)
  }

  test("sensor source: invalid rows/slices options fail fast with a clear error") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft-sensors").option("slices", 0).load().count()
    }
    assert(e1.getMessage.contains("slices"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-sensors").option("rows", -5).load().count()
    }
    assert(e2.getMessage.contains("rows"))
  }

  // --- c20: consistent cross-table cut ----------------------------------

  test("c20: one global cut = the min per-table mark; held-back accounting closes") {
    val rows = cdc.CdcQueries.c20ConsistentCut(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val cuts = rows.map(_._3).distinct
    assert(cuts.length == 1, s"cut must be global, got ${cuts.toSeq}")
    val cut = cuts.head
    assert(rows.map(_._2).min == cut, "cut must equal the minimum applied mark")
    rows.foreach { case (t, hwm, _, nApplied, nAtCut, nHeld, nLive) =>
      assert(hwm >= cut, s"$t: mark $hwm below the cut")
      assert(nHeld == nApplied - nAtCut,
        s"$t: held-back must be exactly the applied rows past the cut")
      assert(nLive <= nAtCut, s"$t: live keys cannot exceed visible rows")
    }
    // the laggard table defines the cut and holds nothing back
    assert(rows.exists { case (_, hwm, _, _, _, nHeld, _) =>
      hwm == cut && nHeld == 0L })
  }

  // --- s18: power-iteration PCA -----------------------------------------

  test("s18: engine result is bit-identical to a locally replayed 3-step power iteration") {
    val got = ext.Similarity.s18PcaPower(spark, sf0001).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.size == 64)
    // local replay with the same operation order
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    val dim = 64
    val buckets = e.groupBy { case (id, _) => id / 256 }.toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.sortBy(_._1)) }
    def foldDims(contrib: (Long, Array[Float]) => Array[Double]): Array[Double] = {
      val out = Array.fill(dim)(0.0)
      for (p <- 0 until dim) {
        var acc = 0.0
        buckets.foreach { case (_, xs) =>
          var s1 = 0.0
          xs.foreach { case (id, emb) => s1 += contrib(id, emb)(p) }
          acc += s1
        }
        out(p) = acc
      }
      out
    }
    val n = e.length.toLong
    val s = foldDims((_, emb) => emb.map(_.toDouble))
    val ss = foldDims((_, emb) => emb.map(x => x.toDouble * x.toDouble))
    val mu = s.map(_ / n)
    val vars = (0 until dim).map(p => ss(p) / n - (s(p) / n) * (s(p) / n))
    var trace = 0.0; vars.foreach(trace += _)
    def centered(emb: Array[Float]): Array[Double] =
      (0 until dim).map(p => emb(p).toDouble - mu(p)).toArray
    def project(emb: Array[Float], v: Array[Double]): Double = {
      val c = centered(emb); var acc = 0.0
      (0 until dim).foreach(p => acc += c(p) * v(p)); acc
    }
    var v = Array.fill(dim)(0.125)
    (1 to 3).foreach { _ =>
      val vv = v
      val w = foldDims((_, emb) => {
        val c = centered(emb); val sc = project(emb, vv); c.map(_ * sc)
      })
      var nrm2 = 0.0; w.foreach(x => nrm2 += x * x)
      val nrm = math.sqrt(nrm2)
      v = w.map(_ / nrm)
    }
    // Rayleigh quotient via the same bucketed fold
    var ssum = 0.0
    buckets.foreach { case (_, xs) =>
      var t1 = 0.0
      xs.foreach { case (_, emb) => val p = project(emb, v); t1 += p * p }
      ssum += t1
    }
    val lambda = ssum / n
    val share = lambda / trace
    assert(share > 0.0 && share <= 1.0, s"explained share $share out of range")
    (0 until dim).foreach { p =>
      val (gm, gv, gl, gs) = got(p)
      assert(gm == mu(p), s"pos $p mean: $gm != ${mu(p)}")
      assert(gv == v(p), s"pos $p pc1: $gv != ${v(p)}")
      assert(gl == lambda, s"pos $p lambda: $gl != $lambda")
      assert(gs == share, s"pos $p share: $gs != $share")
    }
  }

  // --- p14: decontamination quarantine ----------------------------------

  test("p14: train is never quarantined, totals close, and the kept corpus has zero leakage left") {
    val report = ext.Curation.p14DecontamQuarantine(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet == Set("train", "val", "test"))
    assert(report("train")._2 == 0L, "train docs must never be quarantined")
    report.foreach { case (s, (n, q, k)) =>
      assert(n == q + k, s"$s: docs must be exactly quarantined + kept")
    }
    // independent soundness re-check: rebuild the quarantine set locally
    // and verify no cross-split pair (near or exact) survives among kept
    val docs = ext.Dedup.corpusWithCopies(Tables.documents(spark, sf0001))
      .select($"doc_id", md5($"text").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pairs = ext.Dedup.d18MinHashMapSide(spark, sf0001)
      .select($"id1", $"id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val trainH = docs.collect { case (d, h) if splitName(d) == "train" => h }.toSet
    val quarantined = (
      pairs.flatMap { case (a, b) =>
        (splitName(a) == "train", splitName(b) == "train") match {
          case (true, false) => Some(b)
          case (false, true) => Some(a)
          case _             => None
        }
      } ++
      docs.collect { case (d, h) if splitName(d) != "train" && trainH(h) => d }
    ).toSet
    assert(quarantined.nonEmpty, "fixture must plant some leakage")
    val kept = docs.map(_._1).toSet -- quarantined
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b) &&
          ((splitName(a) == "train") != (splitName(b) == "train"))),
        s"surviving near cross-split pair ($a, $b)")
    }
    val keptByHash = docs.filter(d => kept(d._1)).groupBy(_._2)
    keptByHash.foreach { case (h, ds) =>
      val sp = ds.map(d => splitName(d._1) == "train").distinct
      assert(sp.length == 1 || !sp.contains(true),
        s"surviving exact cross-split hash $h")
    }
    // the local rebuild agrees with the report
    assert(quarantined.size.toLong == report.values.map(_._2).sum)
  }

  // --- s20: IVF nprobe sweep --------------------------------------------

  test("s20: recall and candidate cost are monotone in nprobe; nprobe=4 matches s04") {
    val rows = ext.Similarity.s20IvfTuning(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 15, "3 configs x 5 queries")
    val byQ = rows.groupBy(_._2)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._1)
      val cands = sorted.map(_._3)
      val hits = sorted.map(_._4)
      assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
        s"q$qid: candidate cost must grow with nprobe: ${cands.toSeq}")
      assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
        s"q$qid: probing more lists can only add candidates: ${hits.toSeq}")
      sorted.foreach { case (_, _, _, h, rec) => assert(rec == h / 5.0) }
    }
    // the nprobe=4 column IS s04's configuration: its hit counts must
    // equal |s04's top-5 ∩ exact top-5| per query
    val s04 = ext.Similarity.s04AnnIvf(spark, sf0001)
      .filter($"rank" <= 5).select($"qid", $"nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = ext.Similarity.s01KnnBruteForce(spark, sf0001)
      .filter($"rank" <= 5).select($"qid", $"nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    rows.filter(_._1 == 4).foreach { case (_, qid, _, nHit, _) =>
      val want = s04.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toLong
      assert(nHit == want, s"q$qid: nprobe=4 hits $nHit != s04-vs-exact $want")
    }
  }

  // --- p15: chi-square drift monitor ------------------------------------

  test("p15: expected counts sum to the new release total and chi2 closes over contributions") {
    val rows = ext.Curation.p15DistDrift(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val totNew = rows.map(_._3).sum
    assert(math.abs(rows.map(_._4).sum - totNew) < 1e-9,
      "expected counts must redistribute exactly the new release total")
    val chi2 = rows.head._6
    assert(rows.forall(_._6 == chi2), "chi2 must be a single corpus-level value")
    assert(rows.forall(r => r._5 >= 0.0), "contributions are non-negative")
    assert(math.abs(rows.map(_._5).sum - chi2) < 1e-9,
      "chi2 must close over the per-language contributions")
    assert(rows.forall(_._7 == rows.length.toLong - 1), "dof = k - 1")
  }

  // --- s19: simplified silhouette ---------------------------------------

  test("s19: silhouette bounds hold and every vector is accounted for") {
    val rows = ext.Similarity.s19Silhouette(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_._2).sum == total, "every vector must appear in exactly one cluster")
    rows.foreach { case (cid, n, mean, mn, mx) =>
      assert(n >= 1, s"cluster $cid empty")
      // (b - a) / max(a, b) is bounded by [-1, 1] by construction
      assert(mn >= -1.0 && mx <= 1.0, s"cluster $cid: [$mn, $mx] out of bounds")
      assert(mn <= mean && mean <= mx, s"cluster $cid: mean $mean outside [$mn, $mx]")
    }
  }

  // --- m10: offset-invariant constellation matching ---------------------

  test("m10: shifted copies align at delta -1 and exact copies at delta 0, both at full share") {
    val rows = ext.Multimodal.m10AudioOffsetMatch(spark, sf0001)
      .select($"id1", $"id2", $"best_delta", $"align_frac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the one-frame-shifted plants: every found (d, d+2000000) pair must
    // have voted delta -1 (orig frame f aligns with copy frame f+1) and
    // aligned ALL of the shorter side's frames
    val shifted = rows.filter { case (a, b, _, _) => b == a + 2000000L }
    assert(shifted.nonEmpty, "no shifted plant pairs found")
    shifted.foreach { case (a, _, d, frac) =>
      assert(d == -1L, s"shifted pair base=$a voted delta $d, expected -1")
      assert(frac == 1.0, s"shifted pair base=$a share $frac, expected 1.0")
    }
    // the exact plants: delta 0, full share
    val exact = rows.filter { case (a, b, _, _) => b == a + 1000000L }
    assert(exact.nonEmpty, "no exact plant pairs found")
    exact.foreach { case (a, _, d, frac) =>
      assert(d == 0L, s"exact pair base=$a voted delta $d, expected 0")
      assert(frac == 1.0, s"exact pair base=$a share $frac, expected 1.0")
    }
  }

  // --- p13: near-dup train→eval decontamination -------------------------

  /** The p07 split arithmetic, restated independently. */
  private def splitName(id: Long): String = {
    val b = (id * 2654435761L) % 1000L
    if (b < 800) "train" else if (b < 900) "val" else "test"
  }

  test("p13: every flagged doc is eval-side, every offender is train-side, jaccard >= 50") {
    val rows = ext.Curation.p13SplitDecontam(spark, sf0001).collect()
    assert(rows.nonEmpty, "expected organic cross-split near-dup leakage in the fixture")
    rows.foreach { r =>
      val (evalId, evalSplit) = (r.getLong(0), r.getString(1))
      val (n, maxJ, minTrain) = (r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(evalSplit == splitName(evalId),
        s"doc $evalId tagged $evalSplit but hashes to ${splitName(evalId)}")
      assert(evalSplit == "val" || evalSplit == "test",
        s"doc $evalId: flagged split must be eval-side, got $evalSplit")
      assert(splitName(minTrain) == "train",
        s"offender $minTrain is ${splitName(minTrain)}, not train")
      assert(n >= 1L && maxJ >= 50.0, s"doc $evalId: n=$n maxJ=$maxJ")
    }
    // completeness against the verified pair set: every cross-split pair
    // from the (independently spec-pinned) d18 pipeline must surface its
    // eval side here
    val expect = ext.Dedup.d18MinHashMapSide(spark, sf0001)
      .select($"id1", $"id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        (splitName(a) == "train", splitName(b) == "train") match {
          case (true, false) => Some(b)
          case (false, true) => Some(a)
          case _             => None
        }
      }.toSet
    assert(rows.map(_.getLong(0)).toSet == expect,
      "flagged eval docs differ from the cross-split pairs of the verified LSH pair set")
  }
}
