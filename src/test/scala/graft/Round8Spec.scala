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

  // --- d27: repeated-substring spans --------------------------------------

  test("d27: planted copies fully covered, near-copy suffix detected, coverage bounded") {
    val K = ext.Dedup.RepSpanK
    val rows = ext.Dedup.d27RepeatedSpans(spark, sf0001)
      .select($"doc_id", $"n_spans", $"rep_tokens", $"n_tokens", $"rep_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    rows.values.foreach { case (id, ns, rep, n, frac) =>
      assert(ns >= 1 && rep >= K && rep <= n, s"doc $id coverage out of bounds")
      assert(math.abs(frac - rep.toDouble / n) < 1e-12)
    }
    val base = Tables.documents(spark, sf0001).select($"doc_id").as[Long].collect()
    // exact-copy pairs: every window repeats corpus-wide → both sides 100%
    base.filter(_ % 10 == 0).foreach { d =>
      Seq(d, d + 1000000L).foreach { id =>
        val (_, _, rep, n, _) = rows(id)
        assert(rep == n, s"exact-copy doc $id not fully covered")
      }
    }
    // near copies drop the first token: the whole suffix is a repeat, and
    // stride-1 windows see it from position 0 on the copy / 1 on the source
    base.filter(_ % 10 == 5).foreach { d =>
      val (_, _, repC, nC, _) = rows(d + 2000000L)
      assert(repC == nC, s"near-copy ${d + 2000000L} suffix not fully covered")
      val (_, _, repS, nS, _) = rows(d)
      assert(repS >= nS - 1, s"source $d of near copy under-covered")
    }
  }

  // --- p09: per-domain frequency cap --------------------------------------

  test("p09: cap bites at sf0.01, partition arithmetic consistent, floor below max") {
    val sf001 = "/root/testdata/sf0.01"
    val rows = ext.Curation.p09DomainCap(spark, sf001)
      .select($"source", $"n_docs", $"n_kept", $"n_dropped", $"min_kept_quality", $"cap_hit")
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
    assert(rows.length == 20)
    rows.foreach { case (src, n, kept, dropped, _, hit) =>
      assert(kept <= ext.Curation.DomainCap, s"$src kept over cap")
      assert(n == kept + dropped, s"$src arithmetic")
      assert(hit == (dropped > 0), s"$src cap_hit flag")
    }
    // 500 docs over 20 sources → every source exceeds the cap of 15
    assert(rows.forall(_._6), "expected every source capped at sf0.01")
    // the cap keeps the TOP of the quality ranking: the kept floor must be
    // at least the source's (n_kept)-th best quality — cross-check one
    // source against a direct computation
    val toks = ext.TextAnalysis.tokens($"text")
    val stopArr = array(ext.TextAnalysis.stopwords.map(lit): _*)
    val qualities = Tables.documents(spark, sf001).filter($"source" === "src0")
      .select(((size(array_distinct(toks)) * 1000
        + size(filter(toks, t => array_contains(stopArr, t))) * 100
        - length(regexp_replace($"text", "[a-z\\s]", "")) * 10).cast("double")
        / size(toks)).as("q"))
      .as[Double].collect().sorted(Ordering[Double].reverse)
    val (_, _, kept0, _, floor0, _) = rows.find(_._1 == "src0").get
    assert(floor0 == qualities(kept0.toInt - 1), "src0 kept floor != k-th best quality")
  }

  // --- p10: deterministic shard shuffle -----------------------------------

  test("p10: shards partition the corpus and the manifest pins the permutation") {
    val rows = ext.Curation.p10ShardShuffle(spark, sf0001)
      .select($"shard", $"n_docs", $"order_sig", $"min_key", $"max_key")
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(_._2).sum == total, "shards must partition the corpus")
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (s, _, _, lo, hi) =>
      assert(s >= 0 && s < ext.Curation.ShardCount && lo <= hi)
      assert(lo % ext.Curation.ShardCount == s && hi % ext.Curation.ShardCount == s,
        s"key range of shard $s contains foreign keys")
    }
    // recompute the permutation signature driver-side: same key family,
    // same (key, doc_id) order ⇒ same Σ seq·doc_id per shard
    val ids = Tables.documents(spark, sf0001).select($"doc_id").as[Long].collect()
    val expected = ids.map(d => (d, ((d * 2246822519L) % 1048573L)))
      .groupBy(_._2 % ext.Curation.ShardCount)
      .map { case (s, docs) =>
        val sig = docs.sortBy(t => (t._2, t._1)).zipWithIndex
          .map { case ((d, _), i) => (i + 1L) * d }.sum
        s -> sig
      }
    rows.foreach { case (s, _, sig, _, _) =>
      assert(expected(s) == sig, s"shard $s permutation signature drifted")
    }
  }

  // --- t23: character diversity -------------------------------------------

  test("d28: bloom prefilter + exact verify is row-identical to d11, and the bloom admits no false negatives") {
    val d11 = ext.Dedup.d11Contamination(spark, sf0001)
      .select($"doc_id", $"n_shingles", $"n_shared", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val d28 = ext.Dedup.d28BloomContamination(spark, sf0001)
      .select($"doc_id", $"n_shingles", $"n_shared", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(d11.nonEmpty && d28 == d11)
    // the gate is live at this SF: planted benchmark copies flagged
    assert(d11.exists(_._4), "expected at least one contaminated doc")
  }

  test("s15: hierarchical fold matches a flat per-dimension recompute; stats sane") {
    val got = ext.Similarity.s15DimStats(spark, sf0001)
      .select($"pos", $"n", $"mean_comp", $"var_comp", $"min_comp", $"max_comp")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    assert(got.size == 64 && vecs.nonEmpty)
    (0 until 64).foreach { d =>
      val xs = vecs.map(_._2(d).toDouble)
      val (_, n, mean, varc, mn, mx) = got(d)
      assert(n == xs.length && mn == xs.min && mx == xs.max)
      // the bucketed fold must agree with a flat left-to-right fold to
      // float tolerance (not bit equality — different add order by design)
      val fmean = xs.sum / xs.length
      assert(math.abs(mean - fmean) < 1e-9, s"dim $d mean drift")
      assert(varc >= 0.0 && varc < 1.0)
    }
  }

  test("t24: vocabulary curve is monotone, ends at corpus totals, checkpoints tile the corpus") {
    val rows = ext.TextAnalysis.t24HeapsLaw(spark, sf0001)
      .select($"checkpoint_docs", $"cum_tokens", $"vocab_size", $"ttr")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 < b._2 && a._3 <= b._3, "cumulative curve must be monotone")
      case _ =>
    }
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val allToks = docs.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
    assert(rows.last._2 == allToks.length, "final cum_tokens = corpus tokens")
    assert(rows.last._3 == allToks.distinct.length, "final vocab = corpus types")
    rows.foreach(r => assert(r._4 > 0.0 && r._4 <= 1.0))
  }

  test("c19: late flags replay exactly against a sequential watermark walk") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", $"user_id", $"ts")
      .as[(Long, String, Long, java.time.LocalDateTime)].collect()
      .map { case (id, t, u, ts) =>
        val us = ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ts.getNano / 1000L
        (id, t, us, us + (u % 5) * 4L * 60L * 1000000L) // commit = ts + delay
      }
    val lateIds = ev.groupBy(_._2).values.flatMap { part =>
      var hwm = Long.MinValue
      part.sortBy(e => (e._4, e._1)).flatMap { case (id, _, us, _) =>
        val late = hwm != Long.MinValue && us < hwm - 300L * 1000000L
        hwm = math.max(hwm, us)
        if (late) Some(id) else None
      }
    }.toSet
    val agg = cdc.CdcQueries.c19LateArrival(spark, sf0001)
      .select($"event_type", $"n_events", $"n_late", $"n_applied")
      .as[(String, Long, Long, Long)].collect()
    val perType = ev.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    agg.foreach { case (t, n, nl, na) =>
      assert(n == perType(t).length && nl + na == n)
      assert(nl == perType(t).count(lateIds.contains), s"late count for $t")
    }
    assert(agg.map(_._3).sum > 0, "expected some late events at sf0.001")
  }

  test("t23: letter histogram exact vs direct count, diversity in [0,1]") {
    val rows = ext.TextAnalysis.t23CharDiversity(spark, sf0001)
      .select($"doc_id", $"n_letters", $"distinct_letters", $"simpson_num",
        $"simpson_den", $"diversity")
      .as[(Long, Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(docs.nonEmpty && rows.size == docs.length)
    docs.foreach { case (id, text) =>
      val counts = text.filter(_ != ' ').groupBy(identity).view.mapValues(_.length.toLong)
      val n = counts.values.sum
      val num = counts.values.map(c => c * (c - 1)).sum
      val (_, nl, dl, sn, sd, div) = rows(id)
      assert(nl == n && dl == counts.size && sn == num && sd == n * (n - 1),
        s"doc $id histogram mismatch")
      assert(div >= 0.0 && div <= 1.0 && math.abs(div - (1.0 - num.toDouble / (n * (n - 1)))) == 0.0)
    }
  }

  // --- d29: winnowed fingerprint anchors --------------------------------

  /** Brute-force winnowing of one token list: every W-window's
    * (h20, rightmost)-argmin position, deduplicated — the spec the packed
    * window-min must equal. */
  private def winnowBrute(toks: Array[String]): Set[Long] = {
    val K = ext.Dedup.WinnowK; val W = ext.Dedup.WinnowW
    val md = java.security.MessageDigest.getInstance("MD5")
    def h20(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(5), 16)
    }
    val hs = (0 to toks.length - K)
      .map(p => h20(toks.slice(p, p + K).mkString(" "))).toArray
    (0 to hs.length - W).flatMap { i =>
      // rightmost minimal hash in the window
      val win = (i until i + W).map(p => (hs(p), -p))
      val best = win.min
      Some((-best._2).toLong)
    }.toSet
  }

  test("d29: packed window-min equals brute-force winnowing per document") {
    val K = ext.Dedup.WinnowK; val W = ext.Dedup.WinnowW
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .filter(_._1 % 37 == 0) // a deterministic sample is plenty
    assert(docs.nonEmpty)
    // recompute the engine's anchor POSITIONS via the same packed device
    // the query uses, then compare with the brute-force spec
    docs.foreach { case (_, text) =>
      val toks = text.trim.split("\\s+")
      if (toks.length >= K + W - 1) {
        val md = java.security.MessageDigest.getInstance("MD5")
        def h20(s: String): Long = {
          val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.take(5), 16)
        }
        val hs = (0 to toks.length - K)
          .map(p => h20(toks.slice(p, p + K).mkString(" "))).toArray
        val packed = (0 to hs.length - W).map { i =>
          (i until i + W).map(p => hs(p) * 8796093022208L + (8796093022207L - p)).min
        }.map(k => 8796093022207L - k % 8796093022208L).toSet
        assert(packed == winnowBrute(toks), "packed device != argmin spec")
      }
    }
  }

  test("d29: guarantee holds — planted copies share anchors; density near 2/(W+1)") {
    val out = ext.Dedup.d29WinnowFingerprint(spark, sf0001)
      .select($"doc_id", $"n_grams", $"n_anchors", $"density", $"n_shared")
      .as[(Long, Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // every planted exact copy (+1e6) and its source share ALL anchors —
    // n_shared = n_anchors on both sides of each planted pair
    val planted = out.keys.filter(_ >= 1000000L).filter(_ < 2000000L)
    assert(planted.nonEmpty)
    planted.foreach { cid =>
      val (_, _, na, _, ns) = out(cid)
      assert(ns == na, s"copy $cid: all anchors must be shared, $ns != $na")
      val (_, _, na0, _, ns0) = out(cid - 1000000L)
      assert(ns0 == na0, s"source ${cid - 1000000L}: all anchors shared")
    }
    // near copies (first token dropped) still share ≥1 anchor: every run
    // of ≥ W+K-1 common tokens guarantees one
    out.keys.filter(_ >= 2000000L).foreach { cid =>
      assert(out(cid)._5 > 0, s"near copy $cid must share an anchor")
    }
    // expected density 2/(W+1) = 0.4; allow generous slack either side
    val densities = out.values.map(_._4)
    val mean = densities.sum / densities.size
    assert(mean > 0.25 && mean < 0.55, s"mean density $mean far from 2/(W+1)")
  }

  // --- t25: rank-sum AUC ------------------------------------------------

  test("t25: rank-sum AUC equals the O(N^2) pairwise definition exactly") {
    val out = ext.TextAnalysis.t25QualityAuc(spark, sf0001)
      .select($"lang", $"n_pos", $"n_neg", $"rank2_sum", $"auc")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.nonEmpty)
    // recompute the quality scores independently and brute-force the
    // concordant/tied pair counts per language
    val scored = ext.TextAnalysis.t03QualityScore(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select($"doc_id", $"lang"), "doc_id")
      .select($"lang", $"quality").as[(String, Double)].collect()
    out.keys.foreach { lang =>
      val pos = scored.filter(_._1 == lang).map(_._2)
      val neg = scored.filter(_._1 != lang).map(_._2)
      val (_, np, nn, r2, auc) = out(lang)
      assert(np == pos.length && nn == neg.length)
      // 2U = 2*#(p>n) + #(p==n); AUC = 2U / (2*np*nn)
      var gt = 0L; var eq = 0L
      pos.foreach(p => neg.foreach { n =>
        if (p > n) gt += 1 else if (p == n) eq += 1
      })
      val twoU = 2 * gt + eq
      assert(r2 - np * (np + 1) == twoU,
        s"$lang: rank-sum 2U ${r2 - np * (np + 1)} != pairwise $twoU")
      assert(auc == twoU.toDouble / (2.0 * np * nn), s"$lang auc")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  // --- p11: temperature mixture -----------------------------------------

  test("p11: sqrt reweight matches a bit-exact recompute and flattens the mixture") {
    val out = ext.Curation.p11TemperatureMix(spark, sf0001)
      .select($"lang", $"n_docs", $"p_share", $"w", $"q_share", $"eff_factor")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val counts = Tables.documents(spark, sf0001)
      .groupBy($"lang").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(out.map(_._1).toSet == counts.keySet)
    val nTotal = counts.values.sum
    // the ordered fold, replayed: lang-sorted, 0.0-seeded, left to right
    val s = counts.toSeq.sortBy(_._1).map(c => math.sqrt(c._2.toDouble))
      .foldLeft(0.0)(_ + _)
    out.foreach { case (lang, n, p, w, q, f) =>
      assert(n == counts(lang))
      assert(p == n.toDouble / nTotal && w == math.sqrt(n.toDouble))
      assert(q == math.sqrt(n.toDouble) / s, s"$lang q_share not bit-exact")
      assert(f == math.sqrt(n.toDouble) / s * nTotal / n, s"$lang eff_factor")
    }
    // temperature < 1 flattens: the q-ratio between the biggest and
    // smallest domain must be strictly smaller than the p-ratio, and the
    // smallest domain must be upsampled (eff_factor > 1)
    val byN = out.sortBy(_._2)
    assert(byN.last._5 / byN.head._5 < byN.last._3 / byN.head._3)
    assert(byN.head._6 > 1.0 && byN.last._6 < 1.0)
    // shares still normalize (within fold rounding)
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-12)
  }

  // --- s16: iterated k-means --------------------------------------------

  test("s16: memberships tile the corpus, movement is real, means are finite") {
    val rows = ext.Similarity.s16KmeansLloyd(spark, sf0001)
      .select($"cid", $"pos", $"n_members", $"comp1", $"comp2", $"shift")
      .as[(Long, Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 0) && rows.forall(_._2 < 64))
    // every surviving cluster reports all 64 components with one count
    val perCid = rows.groupBy(_._1)
    perCid.foreach { case (cid, rs) =>
      assert(rs.map(_._2).toSet.size == 64, s"cluster $cid missing components")
      assert(rs.map(_._3).toSet.size == 1, s"cluster $cid inconsistent counts")
    }
    // round-2 memberships partition the embedding corpus
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(perCid.values.map(_.head._3).sum == nVecs)
    rows.foreach { case (_, _, _, c1, c2, s) =>
      assert(!c1.isNaN && !c2.isNaN && s == math.abs(c2 - c1))
    }
    // the second round moved at least one centroid (otherwise the test
    // fixture degenerated and the "iteration" is vacuous)
    assert(rows.exists(_._6 > 0.0))
  }
}
