package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 wave: merge-on-read on PARTITIONED tables, lakehouse schema
  * evolution (ALTER TABLE ADD COLUMN through CommitCatalog), equality
  * deletes, and change-data-feed coverage for rewrites.
  *
  *  - '''Partitioned MOR (o28 lift)''': the delta row-level operation no
  *    longer requires an unpartitioned table — vectors are per-file and
  *    layout-blind, and inserted/reinserted rows cluster on the
  *    partition column through the same per-key rolling writer a
  *    partitioned append uses, so every new file still holds exactly one
  *    key (pk recorded, storage-partitioned joins keep working).
  *  - '''Schema evolution (o31)''': `ALTER TABLE ADD COLUMNS` through
  *    CommitCatalog is a metadata-only commit (files/stats/vectors/
  *    epochs carried verbatim); old files read the new column as NULL
  *    on every path, appends must carry the widened schema, time travel
  *    keeps each version's own shape, COW rewrites and MOR vectors
  *    survive the ALTER, and non-ADD changes refuse loudly.
  */
class Round14Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_r14_spec/$tag"
    Tables.deleteRecursively(d)
    d
  }

  private def manifest(path: String) =
    sources.CommitSink.parseManifest(Paths.get(path)).get

  private def withCatalog(tag: String): (String, String) = {
    val root = freshDir(s"catalog_$tag")
    val cat = s"graft_r14_$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.CommitCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def withConf[A](key: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, v)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  // --- merge-on-read on partitioned tables ----------------------------------

  test("partitioned mor merge: layout preserved, vectors per key group, inserts roll per key") {
    val (cat, root) = withCatalog("mor_part_merge")
    val path = s"$root/default/t"
    spark.range(400L).select($"id", ($"id" % 4).as("k"), ($"id" * 1.0).as("v"))
      .write.format("graft-commit").option("path", path)
      .option("partitionBy", "k").mode("overwrite").save()
    val before = manifest(path)
    // 20 updates spread over all 4 keys + 2 inserts into a brand-new key
    spark.range(20L).select($"id", ($"id" % 4).as("k"), lit(-1.0).as("v"))
      .unionByName(Seq((1000L, 7L, 5.0), (1001L, 7L, 6.0)).toDF("id", "k", "v"))
      .createOrReplaceTempView("r14_mor_src")
    withConf("spark.graft.commit.rowLevelMode", "merge-on-read") {
      spark.sql(s"""MERGE INTO $cat.`default`.t t USING r14_mor_src s
                   ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET v = s.v
                   WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (s.id, s.k, s.v)""")
    }
    val after = manifest(path)
    // delta, not copy-on-write: every pre-existing file carried verbatim
    assert(before.files.toSet.subsetOf(after.files.toSet),
      "a partitioned MOR MERGE must not rewrite existing files")
    assert(after.partCol.contains("k"), "the partition layout survives DML")
    // the 20 updated rows' old versions are exactly the vector positions
    assert(after.files.flatMap(after.deletes.get).map(_.ndel).sum == 20L)
    // every NEW file is single-key with its pk recorded — the layout
    // contract that keeps storage-partitioned joins zero-exchange
    val newFiles = after.files.filterNot(before.files.toSet)
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(f =>
      sources.CommitSink.FileStat.decode(after.stats(f)).pk.isDefined),
      "every delta-inserted file must record its partition key")
    val back = sources.CommitSink.readCommitted(spark, path)
    assert(back.count() == 402L)
    assert(back.filter($"id" < 20).agg(sum($"v")).head.getDouble(0) == -20.0)
    assert(back.filter($"k" === 7).count() == 2L)
    // keyed file-group reads (the SPJ path) agree
    val dsv2 = spark.read.format("graft-commit").option("path", path).load()
    assert(dsv2.groupBy($"k").count().collect().map(_.getLong(1)).sum == 402L)
  }

  // --- lakehouse schema evolution (o31) -------------------------------------

  test("alter add column: metadata-only commit, null-fill reads, old version keeps old schema") {
    val (cat, root) = withCatalog("evolve_basic")
    val path = s"$root/default/t"
    spark.range(100L).select($"id", ($"id" * 2.0).as("v"))
      .write.format("graft-commit").option("path", path).mode("overwrite").save()
    val before = manifest(path)
    spark.sql(s"ALTER TABLE $cat.`default`.t ADD COLUMNS (tag STRING, score BIGINT)")
    val after = manifest(path)
    // metadata-only: same files, same stats, vectors/epochs carried
    assert(after.files == before.files && after.stats == before.stats)
    assert(after.commit == before.commit + 1)
    assert(after.tableId == before.tableId, "an ALTER is not a new generation")
    // old rows read NULL for both new columns, via BOTH read paths
    val back = sources.CommitSink.readCommitted(spark, path)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "tag", "score"))
    assert(back.filter($"tag".isNull && $"score".isNull).count() == 100L)
    val dsv2 = spark.read.format("graft-commit").option("path", path).load()
    assert(dsv2.filter($"tag".isNull).count() == 100L)
    // widened appends accepted; narrow (pre-ALTER) appends refused
    spark.range(100L, 110L).select($"id", ($"id" * 2.0).as("v"),
        lit("new").as("tag"), ($"id" * 10).as("score"))
      .write.format("graft-commit").option("path", path).mode("append").save()
    val e = intercept[Exception] {
      spark.range(200L, 210L).select($"id", ($"id" * 2.0).as("v"))
        .write.format("graft-commit").option("path", path).mode("append").save()
    }
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    val all = sources.CommitSink.readCommitted(spark, path)
    assert(all.count() == 110L && all.filter($"tag" === "new").count() == 10L)
    // time travel: the pre-ALTER version is still the narrow table
    val v0 = sources.CommitSink.readCommittedVersion(spark, path, 0L)
    assert(v0.schema.fieldNames.toSeq == Seq("id", "v") && v0.count() == 100L)
    // metadata-only MIN/MAX on the ADDED column: old files have no
    // recorded range there and hold only NULLs — sound to answer from
    // the post-ALTER files' ranges alone
    val agg = spark.read.format("graft-commit").option("path", path).load()
      .agg(min($"score"), max($"score")).head()
    assert(agg.getLong(0) == 1000L && agg.getLong(1) == 1090L)
  }

  test("alter add column: COW rewrite and MOR vectors survive the ALTER") {
    val (cat, root) = withCatalog("evolve_dml")
    val path = s"$root/default/t"
    spark.range(400L).select($"id", ($"id" * 1.0).as("v"))
      .repartitionByRange(4, $"id")
      .write.format("graft-commit").option("path", path).mode("overwrite").save()
    // MOR vectors BEFORE the ALTER
    withConf("spark.graft.commit.deleteMode", "merge-on-read") {
      spark.sql(s"DELETE FROM $cat.`default`.t WHERE id >= 10 AND id < 20")
    }
    assert(manifest(path).deletes.nonEmpty)
    spark.sql(s"ALTER TABLE $cat.`default`.t ADD COLUMNS (tag STRING)")
    // the vectors carried through the ALTER commit and still apply
    assert(manifest(path).deletes.nonEmpty)
    assert(sources.CommitSink.readCommitted(spark, path).count() == 390L)
    // a COW UPDATE on the widened table backfills the new column for
    // matched rows (group-granular: only the matched zone rewrites)
    val preFiles = manifest(path).files.toSet
    spark.sql(s"UPDATE $cat.`default`.t SET tag = 'low' WHERE id < 100")
    val m2 = manifest(path)
    assert(m2.files.exists(preFiles), "unmatched zone files are carried")
    val back = sources.CommitSink.readCommitted(spark, path)
    assert(back.filter($"tag" === "low").count() == 90L) // 100 - 10 deleted
    assert(back.filter($"tag".isNull).count() == 300L)
    // and MOR DML keeps working on the evolved table
    withConf("spark.graft.commit.rowLevelMode", "merge-on-read") {
      spark.sql(s"DELETE FROM $cat.`default`.t WHERE id % 100 = 50")
    }
    assert(sources.CommitSink.readCommitted(spark, path).count() == 386L)
  }

  test("alter add column: refusals (nullability, duplicates, position, non-add changes)") {
    val (cat, root) = withCatalog("evolve_refuse")
    val path = s"$root/default/t"
    spark.range(10L).select($"id")
      .write.format("graft-commit").option("path", path).mode("overwrite").save()
    def refused(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag), s"$sql -> ${e.getMessage}")
    }
    refused(s"ALTER TABLE $cat.`default`.t ADD COLUMNS (c STRING NOT NULL)",
      "must be nullable")
    refused(s"ALTER TABLE $cat.`default`.t ADD COLUMNS (id BIGINT)",
      "already exists")
    refused(s"ALTER TABLE $cat.`default`.t ADD COLUMNS (c STRING FIRST)",
      "FIRST/AFTER is unsupported")
    refused(s"ALTER TABLE $cat.`default`.t RENAME COLUMN id TO id2",
      "only ADD COLUMN")
    refused(s"ALTER TABLE $cat.`default`.t ADD COLUMNS (m MAP<STRING,STRING>)",
      "unsupported ALTER column type")
    // nothing landed: the table is still at commit 0 with one column
    val m = manifest(path)
    assert(m.commit == 0L && StructType.fromDDL(m.ddl).length == 1)
  }

  test("partitioned mor delete through the row-level op (untranslatable predicate)") {
    val (cat, root) = withCatalog("mor_part_delete")
    val path = s"$root/default/t"
    spark.range(700L).select($"id", ($"id" % 7).as("k"), ($"id" * 0.5).as("v"))
      .write.format("graft-commit").option("path", path)
      .option("partitionBy", "k").mode("overwrite").save()
    val before = manifest(path)
    withConf("spark.graft.commit.rowLevelMode", "merge-on-read") {
      // modulo predicate: untranslatable as V1 filters, routes through
      // the DELTA row-level operation — a pure DELETE's delta plan
      // projects no data columns, so clustering stays on _file alone
      spark.sql(s"DELETE FROM $cat.`default`.t WHERE id % 10 = 3")
    }
    val after = manifest(path)
    assert(after.files == before.files, "a MOR DELETE changes no data files")
    assert(after.partCol.contains("k"))
    assert(after.files.flatMap(after.deletes.get).map(_.ndel).sum == 70L)
    val back = sources.CommitSink.readCommitted(spark, path)
    assert(back.count() == 630L)
    assert(back.filter($"id" % 10 === 3).count() == 0L)
  }
}
