package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 wave, first slice: the r14-advice hardening of the rewrite
  * change feed and the eq-delete conversion.
  *
  *  - '''Caught-up poller''': `changeFeedWithRewrites(dir, newest+1)` is
  *    a valid no-change question (a poller passing lastSeen+1), answered
  *    with an EMPTY frame in the CDF schema — exactly what the plain
  *    `readChangeFeed` path plans for the same range — not an
  *    `empty.reduceLeft` crash.
  *  - '''Retention names the real culprit''': the first commit of a feed
  *    range diffs against `startingVersion - 1`, so the retention rule
  *    covers `[from-1, to]`; when from-1 is the version that expired,
  *    the error says so instead of failing inside the manifest parser.
  *  - '''convertEqDeletes returns what it changed''': the returned file
  *    list is the files that actually RECEIVED vector positions (the
  *    manifest's delete-entry keys), not every file the key scan merely
  *    covered — callers feed it to targeted maintenance (compaction of
  *    exactly the vectored files), so over-reporting would rewrite
  *    untouched data.
  */
class Round15Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_r15_spec/$tag"
    Tables.deleteRecursively(d)
    d
  }

  private def manifest(path: String) =
    sources.CommitSink.parseManifest(Paths.get(path)).get

  test("changeFeedWithRewrites: caught-up poller (from = newest+1) gets an empty CDF frame") {
    val dir = freshDir("feed_caught_up")
    spark.range(40L).select($"id", lit("a").as("s"))
      .write.format("graft-commit").option("path", dir).mode("overwrite").save()
    spark.range(40L, 50L).select($"id", lit("b").as("s"))
      .write.format("graft-commit").option("path", dir).mode("append").save()
    // newest commit is 1; a poller that has seen it asks from 2
    val feed = sources.CommitSink.changeFeedWithRewrites(spark, dir, 2L)
    assert(feed.count() == 0L)
    // the empty answer still carries the full CDF shape — downstream
    // unions/sinks bind to it without special-casing the empty round
    assert(feed.columns.toSeq ==
      Seq("id", "s", "_change_type", "_commit_version"))
    // far-future from is the same no-change answer, not an error
    assert(sources.CommitSink.changeFeedWithRewrites(spark, dir, 99L).count() == 0L)
    // the plain CDF read agrees (the contract the guard mirrors)
    val plain = spark.read.format("graft-commit").option("path", dir)
      .option("readChangeFeed", true).option("startingVersion", 2).load()
    assert(plain.count() == 0L && plain.columns.sameElements(feed.columns))
  }

  test("changeFeedWithRewrites: an expired startingVersion-1 names the retention rule") {
    val dir = freshDir("feed_retention_fromm1")
    spark.range(20L).select($"id", lit("v0").as("s"))
      .write.format("graft-commit").option("path", dir).mode("overwrite").save()
    spark.range(20L, 30L).select($"id", lit("v1").as("s"))
      .write.format("graft-commit").option("path", dir).mode("append").save()
    spark.range(30L, 40L).select($"id", lit("v2").as("s"))
      .write.format("graft-commit").option("path", dir).mode("append").save()
    // expire version 0; the feed from startingVersion=1 diffs commit 1
    // against version 0 — the retention error must name [0, 2], not die
    // in parseManifestVersion with a generic missing-manifest message
    val (dropped, _) = sources.CommitSink.expireVersions(dir, keepLast = 2)
    assert(dropped == Seq(0L))
    val e = intercept[IllegalArgumentException] {
      sources.CommitSink.changeFeedWithRewrites(spark, dir, 1L).collect()
    }
    assert(e.getMessage.contains("[0, 2]"), e.getMessage)
    assert(e.getMessage.contains("startingVersion-1"), e.getMessage)
    assert(e.getMessage.contains("retention"), e.getMessage)
    // a range whose from-1 is retained still works
    val feed = sources.CommitSink.changeFeedWithRewrites(spark, dir, 2L)
      .select($"id", $"_change_type").as[(Long, String)].collect()
    assert(feed.map(_._1).sorted.toSeq == (30L until 40L) &&
      feed.forall(_._2 == "insert"))
  }

  test("concurrent eq-delete upserts with overlapping keys: loser's retry re-sequences") {
    // two upsertKeys appends race; the CAS loser retries on the winner's
    // manifest, so its key file's add-sequence must re-derive ABOVE the
    // winner's files — each delete then scopes to strictly-older files
    // and the final snapshot equals the SERIAL replay in commit order
    // (Round12Spec's concurrency model extended to o32)
    val dir = freshDir("eq_upsert_race")
    spark.range(100L).select($"id", lit("base").as("s"))
      .write.format("graft-commit").option("path", dir).mode("overwrite").save()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = Seq(("A", 40L, 60L), ("B", 50L, 70L)).map { case (tag, lo, hi) =>
      new Thread(() => {
        try spark.range(lo, hi).select($"id", lit(tag).as("s"))
          .write.format("graft-commit").option("path", dir)
          .option("upsertKeys", "id").mode("append").save()
        catch { case t: Throwable => errs.add(t) }
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    assert(errs.isEmpty,
      s"both upserts must land: ${errs.toArray.map { case t: Throwable => t.getMessage }.toSeq}")
    val m = manifest(dir)
    assert(m.commit == 2L, "base + two upsert commits")
    assert(m.eqDeletes.map(_.seq).distinct.size == 2,
      "both upserts' key files live, at their own sequences")
    // every key file scopes to strictly-older files only: no listed file
    // with seq >= the entry's seq may lose rows to it — in particular the
    // SECOND upsert's data file must survive the first's keys
    val got = sources.CommitSink.readCommitted(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == 100, "replace-by-key never changes the row count")
    def serial(first: String, second: String): Map[Long, String] = {
      val ranges = Map("A" -> (40L until 60L), "B" -> (50L until 70L))
      val base = (0L until 100L).map(_ -> "base").toMap
      (base ++ ranges(first).map(_ -> first) ++ ranges(second).map(_ -> second))
    }
    // commit order decides the overlap: the writer holding commit 2 wins
    assert(got == serial("A", "B") || got == serial("B", "A"),
      "final snapshot must equal one serial order")
    // and the keyed SPJ read path agrees with the plain path
    val dsv2 = spark.read.format("graft-commit").option("path", dir).load()
      .as[(Long, String)].collect().toMap
    assert(dsv2 == got)
    // conversion afterwards preserves the raced result exactly
    sources.CommitSink.convertEqDeletes(spark, dir)
    val after = sources.CommitSink.readCommitted(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(after == got, "equality->positional conversion must not change the answer")
    assert(manifest(dir).eqDeletes.isEmpty)
  }

  test("convertEqDeletes returns exactly the files that received positions") {
    val dir = freshDir("eq_convert_targets")
    // four range-clustered files: ids [0,50) [50,100) [100,150) [150,200)
    spark.range(200L).select($"id", ($"id" % 10).as("g"))
      .repartitionByRange(4, $"id")
      .write.format("graft-commit").option("path", dir).mode("overwrite").save()
    // keys 60..79 live in ONE of the four older files; the key file
    // covers (scopes to) all four, but only one receives positions
    spark.range(60L, 80L).select($"id", lit(-1L).as("g"))
      .write.format("graft-commit").option("path", dir)
      .option("upsertKeys", "id").mode("append").save()
    val affected = sources.CommitSink.convertEqDeletes(spark, dir)
    val m = manifest(dir)
    assert(m.eqDeletes.isEmpty)
    assert(affected.toSet == m.deletes.keySet,
      "returned files == files holding a vector after conversion")
    assert(affected.size == 1,
      s"keys in one range file must target one file, got $affected")
    assert(m.deletes(affected.head).ndel == 20L)
    assert(sources.CommitSink.readCommitted(spark, dir).count() == 200L)
  }
}
