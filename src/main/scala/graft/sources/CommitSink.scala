package graft.sources

import java.nio.file.{Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WRITE half of the DataSource V2 contract — the connector surface
  * the read-side family (o05 scan, o06 aggregate pushdown, o07
  * limit/TopN, o08 runtime filtering, o10 micro-batch read) doesn't
  * touch: a sink with a real two-phase distributed commit protocol, the
  * shape every transactional lakehouse sink (Iceberg/Delta-style)
  * implements — in BOTH the batch form ([[CommitBatchWrite]], o09) and
  * the epoch-committing streaming form ([[CommitStreamingWrite]], o11,
  * whose manifest-recorded epochs make re-delivered micro-batch commits
  * idempotent: the exactly-once sink contract).
  *
  * Why this is the scale-correct write shape (vs the reference's
  * row-at-a-time `insert_dicts` sink, consumer_to_file.py:224, which has
  * no commit boundary at all — a crashed consumer leaves half-applied
  * work visible):
  *
  *   - '''Task isolation.''' Each [[CommitDataWriter]] streams its
  *     partition to a PRIVATE staging file; nothing a running (or
  *     failed, or speculative) task writes is visible to any reader.
  *   - '''Two-phase commit.''' A task that finishes hands back a
  *     [[StagedFile]] commit message (phase 1); only the DRIVER's
  *     `BatchWrite.commit` — which runs once, after every task
  *     succeeded — publishes them (phase 2). Spark's output-commit
  *     coordinator guarantees at most one attempt per partition commits,
  *     so speculative duplicates can never double-publish.
  *   - '''Manifest as the atomicity point.''' Readers
  *     ([[CommitSink.readCommitted]]) see ONLY files listed in the
  *     `_MANIFEST.json`, which is swapped into place with one atomic
  *     rename. A crash before the swap leaves the previous table version
  *     fully intact; stray staged/renamed files are invisible garbage,
  *     never phantom rows. This is exactly the design that stays correct
  *     on object stores where directory listing is not transactional —
  *     the manifest, not the filesystem, defines the table.
  *   - '''Abort cleanup.''' Task abort deletes the task's own staging
  *     file; job abort sweeps the staging directory. A failed write
  *     leaves no state change at all (Round10Spec plants a failing
  *     partition and proves it).
  *
  * Staged files carry one of two PAYLOAD formats, recorded per manifest
  * and homogeneous per content lineage:
  *
  *   - '''parquet''' (default — [[ParquetPayload]]): columnar chunks,
  *     snappy, chunk-level projection, and the full declared-type
  *     surface (timestamp / timestamp_ntz / date / decimal / float /
  *     smallint / tinyint on top of the scalar set) — the at-scale
  *     encoder, and the one that can hold the CDC path's TYPE_MAPPING
  *     schemas (the reference's ClickHouse DDL stores real
  *     Date/DateTime/Decimal columns, consumer_to_file.py:145-150).
  *     Driver-side re-reads go through Spark's native vectorized
  *     parquet scan.
  *   - '''json''' (`option("payload", "json")`): the original
  *     engine-portable JSON-lines format, kept so the o09 registry
  *     query can prove write → commit → read-back losslessness against
  *     a DuckDB oracle byte-for-byte. Doubles round-trip bit-exactly
  *     (shortest-round-trip `Double.toString`); field types are the
  *     portable scalar set (long/int/double/string/boolean).
  *
  * Both are declared-schema payloads, validated at write resolution
  * with a clear error, like TypeMapping's declared ingest path.
  */
object CommitSink {
  val NAME = "graft-commit"
  private[sources] val MANIFEST = "_MANIFEST.json"
  private val STAGING = "_staging"

  /** The storage binding (r14 IO seam): every staged-file, vector,
    * key-file and manifest byte goes through this — see [[CommitIO]].
    * Two bindings exist: local NIO (default) and the Hadoop
    * `FileSystem` path ([[HadoopCommitIO]], r15 — the S3A code
    * surface). Selected per JVM by `-Dgraft.commit.io=hadoop` (the
    * whole test battery runs under either binding), or per scope via
    * [[withIo]] (the o34 registry entry). Volatile: executor threads
    * in this single-JVM deployment read it at task execution time. */
  @volatile private[graft] var io: CommitIO =
    if (sys.props.get("graft.commit.io").contains("hadoop")) new HadoopCommitIO
    else NioCommitIO

  private val ioSwapLock = new Object
  /** Run `body` with `binding` as the storage seam, restoring the
    * previous binding after. The SWAP is serialized, and every Spark
    * action `body` triggers must complete inside it (materialize before
    * returning — a lazy DataFrame would execute under the restored
    * binding). Single-JVM device: on a real cluster the binding is the
    * JVM-wide `-Dgraft.commit.io` choice, not a scope. */
  private[graft] def withIo[A](binding: CommitIO)(body: => A): A =
    ioSwapLock.synchronized {
      val prev = io
      io = binding
      try body finally io = prev
    }

  /** Thrown by the manifest CAS when another writer's commit landed
    * between this writer's planning read and its swap. Subclasses
    * IllegalArgumentException so pre-existing callers that treated the
    * CAS refusal as an argument violation keep working; new callers (the
    * append retry loop) catch THIS type to retry safely. */
  private[graft] class ConcurrentCommitException(msg: String)
      extends IllegalArgumentException(msg)

  /** Per-path commit mutex: makes the CAS check + manifest swap one
    * atomic step for writers in THIS JVM (local mode — the whole
    * deployment). On a real object store this is the conditional-put /
    * atomic-rename primitive the store provides; the lock models it so
    * two local threads can never both pass the check. */
  private val commitLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: Path): Object =
    commitLocks.computeIfAbsent(dir.toAbsolutePath.normalize.toString,
      _ => new Object)

  /** A planned GROUP-GRANULAR rewrite: the manifest the rewrite's read
    * side was planned against, plus the files that read actually scanned
    * (everything else is carried forward verbatim). Threading this from
    * planning into [[CommitBatchWrite]] is what makes (a) a one-row
    * UPDATE rewrite one file instead of the whole table, and (b) the
    * commit CAS compare against the PLANNING-time commit id — a commit
    * landing while the rewrite job runs now hard-fails instead of being
    * silently overwritten by the truncate. */
  private[graft] case class DmlRewrite(planning: Manifest,
                                       scanned: () => Set[String])

  /** Driver-side handoff of a [[DmlRewrite]] into a DataFrame-API write
    * (compact / deleteWhere go through `df.write.format(...)`, which can
    * only carry string options): register → pass the token as an option →
    * the write builder takes (removes) it. Same-JVM only, like the sink. */
  private val pendingRewrites =
    new java.util.concurrent.ConcurrentHashMap[String, DmlRewrite]()
  private[graft] def registerRewrite(r: DmlRewrite): String = {
    val t = java.util.UUID.randomUUID().toString
    pendingRewrites.put(t, r)
    t
  }
  private[graft] def takeRewrite(token: String): DmlRewrite =
    Option(pendingRewrites.remove(token)).getOrElse(
      sys.error(s"graft-commit: unknown or already-consumed rewrite token $token"))

  /** Failure-path cleanup for a registered token: a write that dies at
    * analysis/validation BEFORE the builder's lazy takeRewrite runs
    * would otherwise leak the entry (holding the full planning manifest)
    * in a long-lived driver. Idempotent — a token the write already
    * consumed is simply gone. */
  private[graft] def dropRewrite(token: String): Unit =
    pendingRewrites.remove(token)

  /** True when `e` (or anything in its cause chain — Spark wraps writer
    * commit failures) is the manifest CAS refusing a concurrent commit. */
  private def isConcurrentCommit(e: Throwable): Boolean =
    e != null &&
      (e.isInstanceOf[ConcurrentCommitException] || isConcurrentCommit(e.getCause))

  /** MAINTENANCE retry loop (r16): a compaction/clustering rewrite that
    * loses its manifest CAS to a concurrent append/upsert RE-PLANS
    * against the NEW manifest and runs again — the loser must never
    * drop the concurrent commit's files from the rewrite (it cannot:
    * the CAS hard-fails the stale swap; this loop just turns that
    * failure into the retry a maintenance daemon would do by hand).
    * Appends already retry inside commitAppend; DML rewrites
    * deliberately do NOT retry (a racing commit may have changed the
    * rows the WHERE clause matches — re-running user DML is the
    * caller's decision, not the sink's; Iceberg's position there too).
    * Bounded: maintenance under a hot write stream should back off, not
    * spin. */
  private def retryMaintenance[A](what: String, attempts: Int = 5)(body: => A): A = {
    var i = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if isConcurrentCommit(e) && i < attempts - 1 =>
          i += 1 // re-plan from the new manifest on the next pass
      }
    }
    sys.error(s"graft-commit: $what retry loop exited impossibly")
  }

  /** Attempt-unique fragment for PROMOTED data-file names. Promotion
    * happens before the manifest CAS, and two racing writers compute the
    * same next commit id — with deterministic names the loser's
    * ATOMIC_MOVE could replace the winner's already-committed file. A
    * per-write nonce makes that structurally impossible: no two write
    * attempts ever promote onto the same final name. */
  private[sources] def writeNonce(): String =
    java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong() >>> 16)

  /** Immutable per-version manifest copy (`_MANIFEST-v<commit>.json`),
    * written by every successful commit next to the mutable current
    * pointer — the time-travel device (o17): `VERSION AS OF n` reads the
    * version file, which no later commit ever rewrites. The Iceberg
    * analog is the snapshot list; expiry (GC of old versions and the
    * data files only they reference) is the operational knob a 100 TB
    * deployment adds on top. */
  private[sources] def versionFile(commit: Long): String = s"_MANIFEST-v$commit.json"

  /** Per-column numeric range recorded at write time. `kind` is 'l'
    * (long/int) or 'd' (double); min/max are the type's `toString`
    * (shortest-round-trip for doubles, so decode is bit-exact). */
  private[graft] case class ColRange(kind: Char, min: String, max: String)

  /** Per-file statistics carried in the manifest — the zone-map /
    * file-skipping index (o14) and the size/row statistics (o15), both
    * collected DURING the write (no extra pass): the same footer-stats
    * design parquet uses per row-group and Iceberg per data file. `pk`
    * is the file's single partition-key value when the table is written
    * `partitionBy` a column (o16) — identity-partitioned files carry
    * exactly one key by construction. */
  private[graft] case class FileStat(rows: Long, bytes: Long,
                                       pk: Option[Long],
                                       cols: Map[String, ColRange]) {
    def encode: String = {
      val head = s"$rows:$bytes" + pk.map(v => s":pk=$v").getOrElse("")
      (head +: cols.toSeq.sortBy(_._1).map { case (c, r) =>
        s"$c:${r.kind}:${r.min}:${r.max}" }).mkString(";")
    }
  }

  private[graft] object FileStat {
    def decode(s: String): FileStat = {
      val segs = s.split(";")
      val head = segs(0).split(":")
      val pk = head.lift(2).filter(_.startsWith("pk=")).map(_.drop(3).toLong)
      val cols = segs.iterator.drop(1).map { e =>
        val p = e.split(":")
        p(0) -> ColRange(p(1).charAt(0), p(2), p(3))
      }.toMap
      FileStat(head(0).toLong, head(1).toLong, pk, cols)
    }
  }

  /** The table's partition SPEC — the manifest's `partcol` string,
    * parsed. Two transforms (the Iceberg pair this format supports):
    *
    *  - `col` — IDENTITY (o16): one file per key value; `pk` records
    *    the key itself.
    *  - `bucket(N,col)` — BUCKET (o40, [[BucketFunction]]): one file
    *    per bucket id per task; `pk` records the BUCKET id (0..N-1).
    *    The scale-correct layout for high-cardinality keys — the file
    *    count is bounded by N, and two `bucket(N, k)` tables still
    *    join exchange-free through the storage-partitioned join.
    *
    * Everything downstream branches through this one parse: the
    * writer's declared distribution/ordering, the per-row recorded key,
    * the scan's KeyGroupedPartitioning report, evolution validation,
    * and the maintenance rewrites' pre-shaping. */
  private[graft] sealed trait PartSpec {
    /** The real schema column the transform reads. */
    def sourceCol: String
    /** The manifest encoding (also the `partitionBy` option grammar). */
    def encode: String
    /** The recorded per-row partition key, from the column's RAW
      * physical long (int/long value; micros for timestamps; days for
      * dates — `dt` disambiguates the time encodings). */
    def keyOf(raw: Long, dt: DataType): Long
    /** Legal source column types (validated at create/evolve/write). */
    def sourceOk(dt: DataType): Boolean =
      dt == LongType || dt == IntegerType
    def sourceRule: String = "BIGINT or INT"
  }
  private[graft] final case class IdentitySpec(sourceCol: String) extends PartSpec {
    def encode: String = sourceCol
    def keyOf(raw: Long, dt: DataType): Long = raw
  }
  private[graft] final case class BucketSpec(n: Int, sourceCol: String) extends PartSpec {
    def encode: String = s"bucket($n,$sourceCol)"
    def keyOf(raw: Long, dt: DataType): Long = BucketFunction.bucketId(n, raw).toLong
  }
  /** Iceberg's width truncation: key = floor(v / w) · w — files hold
    * CONTIGUOUS value bands, so zone maps keep doing the range/point
    * pruning (unlike bucket, the transform preserves order). */
  private[graft] final case class TruncateSpec(w: Long, sourceCol: String) extends PartSpec {
    def encode: String = s"truncate($w,$sourceCol)"
    def keyOf(raw: Long, dt: DataType): Long = Math.floorDiv(raw, w) * w
  }
  /** Iceberg's days transform: key = epoch day of a DATE/TIMESTAMP
    * column — the time-series layout (one key per day, files contiguous
    * in time, a date-range scan plans day groups). */
  private[graft] final case class DaysSpec(sourceCol: String) extends PartSpec {
    def encode: String = s"days($sourceCol)"
    def keyOf(raw: Long, dt: DataType): Long = dt match {
      case DateType => raw // already epoch days
      case _ => Math.floorDiv(raw, 86400000000L) // micros → epoch days
    }
    override def sourceOk(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    override def sourceRule: String = "DATE or TIMESTAMP"
  }
  /** Iceberg's months transform (o45): key = months since 1970-01
    * (`(year-1970)*12 + month-1` — the spec's ordinal, so hash parity
    * with Iceberg's partition values holds). Monotone, like days. */
  private[graft] final case class MonthsSpec(sourceCol: String) extends PartSpec {
    def encode: String = s"months($sourceCol)"
    def keyOf(raw: Long, dt: DataType): Long = {
      val epochDay = dt match {
        case DateType => raw
        case _ => Math.floorDiv(raw, 86400000000L)
      }
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
    }
    override def sourceOk(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    override def sourceRule: String = "DATE or TIMESTAMP"
  }
  /** Iceberg's years transform (o45): key = years since 1970. */
  private[graft] final case class YearsSpec(sourceCol: String) extends PartSpec {
    def encode: String = s"years($sourceCol)"
    def keyOf(raw: Long, dt: DataType): Long = {
      val epochDay = dt match {
        case DateType => raw
        case _ => Math.floorDiv(raw, 86400000000L)
      }
      (java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970).toLong
    }
    override def sourceOk(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    override def sourceRule: String = "DATE or TIMESTAMP"
  }
  private[graft] object PartSpec {
    private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
    private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
    private val DaysRe = """days\(\s*([A-Za-z0-9_]+)\s*\)""".r
    private val MonthsRe = """months\(\s*([A-Za-z0-9_]+)\s*\)""".r
    private val YearsRe = """years\(\s*([A-Za-z0-9_]+)\s*\)""".r
    def parse(s: String): PartSpec = s.trim match {
      case BucketRe(n, c) =>
        require(n.toLong >= 1 && n.toLong <= 1000000,
          s"graft-commit: bucket(n, col) needs 1 <= n <= 1e6, got $n")
        BucketSpec(n.toInt, c)
      case TruncRe(w, c) =>
        require(w.toLong >= 1,
          s"graft-commit: truncate(w, col) needs w >= 1, got $w")
        TruncateSpec(w.toLong, c)
      case DaysRe(c) => DaysSpec(c)
      case MonthsRe(c) => MonthsSpec(c)
      case YearsRe(c) => YearsSpec(c)
      case c =>
        require(c.matches("[A-Za-z0-9_]+"),
          s"graft-commit: partition spec '$c' is neither a plain column " +
            "name nor bucket(n, col) / truncate(w, col) / days(col) / " +
            "months(col) / years(col)")
        IdentitySpec(c)
    }
  }

  /** Synthetic column name carrying a GROUP manifest's partition-key
    * range in its summary stat (o45): `min(pk)..max(pk)` over the
    * group's files, recorded only when every file has a key. What lets
    * a temporal/range predicate prune whole group manifests by KEY
    * PROJECTION alone — no zone-map column needed in the summary. */
  private[graft] val GROUP_PK = "_graft_pk"

  /** o45: PREDICATE PROJECTION onto the partition spec — translate a
    * pushed filter on the transform's SOURCE column into a conservative
    * closed key interval `[lo, hi]` (Iceberg's Projections.inclusive).
    * Monotone transforms (identity / truncate / days / months / years)
    * project point AND range shapes: `keyOf` is non-decreasing, so
    * `v > x ⇒ key(v) >= key(x)` and `v < x ⇒ key(v) <= key(x)`. Bucket
    * projects equality/IN only — as the id interval here (conservative;
    * [[CommitScan]] keeps its exact per-value test), never ranges (the
    * hash destroys order). None = no projection: the filter never
    * prunes on the key, the residual evaluation still applies it. */
  private[graft] def keyIntervalOf(spec: PartSpec,
      flt: org.apache.spark.sql.sources.Filter): Option[(Long, Long)] = {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    def raw(v: Any): Option[(Long, DataType)] = v match {
      case l: Long => Some((l, LongType))
      case i: Int => Some((i.toLong, IntegerType))
      case s: Short => Some((s.toLong, IntegerType))
      case b: Byte => Some((b.toLong, IntegerType))
      case d: java.sql.Date => Some((d.toLocalDate.toEpochDay, DateType))
      case d: java.time.LocalDate => Some((d.toEpochDay, DateType))
      case t: java.sql.Timestamp =>
        Some((DateTimeUtils.fromJavaTimestamp(t), TimestampType))
      case i: java.time.Instant =>
        Some((DateTimeUtils.instantToMicros(i), TimestampType))
      case l: java.time.LocalDateTime =>
        Some((DateTimeUtils.localDateTimeToMicros(l), TimestampNTZType))
      case _ => None
    }
    def key(v: Any): Option[Long] = raw(v).map { case (r, dt) => spec.keyOf(r, dt) }
    val monotone = spec match {
      case _: BucketSpec => false
      case _ => true
    }
    flt match {
      case EqualTo(c, v) if c == spec.sourceCol => key(v).map(k => (k, k))
      case In(c, vs) if c == spec.sourceCol && vs.nonEmpty =>
        val ks = vs.toSeq.map(key)
        if (ks.exists(_.isEmpty)) None
        else Some((ks.flatten.min, ks.flatten.max))
      case GreaterThan(c, v) if monotone && c == spec.sourceCol =>
        key(v).map(k => (k, Long.MaxValue))
      case GreaterThanOrEqual(c, v) if monotone && c == spec.sourceCol =>
        key(v).map(k => (k, Long.MaxValue))
      case LessThan(c, v) if monotone && c == spec.sourceCol =>
        key(v).map(k => (Long.MinValue, k))
      case LessThanOrEqual(c, v) if monotone && c == spec.sourceCol =>
        key(v).map(k => (Long.MinValue, k))
      case And(a, b) =>
        (keyIntervalOf(spec, a), keyIntervalOf(spec, b)) match {
          case (Some((l1, h1)), Some((l2, h2))) =>
            Some((math.max(l1, l2), math.min(h1, h2)))
          case (x, None) => x
          case (None, y) => y
        }
      case _ => None
    }
  }

  private[sources] val supportedTypes: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  /** Name of the `_file` metadata column (o21). */
  private[graft] val FILE_COL = "_file"

  /** Name of the `_pos` metadata column (o27): a row's PHYSICAL position
    * within its committed data file (0-based, in the file's storage
    * order — parquet row order / JSON line order), stable across reads
    * because both payload readers emit rows sequentially. The position
    * is what merge-on-read DELETE records: (file, pos) identifies a row
    * without touching its data (Iceberg's position-delete / Delta's
    * deletion-vector row id). Stamped BEFORE deletion vectors are
    * applied — a surviving row keeps its physical position, so a later
    * delete's positions compose with the earlier vector by union. */
  private[graft] val POS_COL = "_pos"

  /** One deletion vector: the DV file (manifest-relative, `part-dv-*` so
    * the GC listers see it) holding the sorted deleted positions of one
    * data file, plus the position count (for stats arithmetic without
    * opening the vector). */
  private[graft] case class DvEntry(dv: String, ndel: Long)

  /** One EQUALITY-DELETE file (o32) — Iceberg v2's second delete form:
    * a parquet-payload file of `nkeys` DISTINCT key tuples over columns
    * `cols` (';'-joined data-column names; their types come from the
    * table DDL). It deletes every row of any data file whose recorded
    * sequence is strictly BELOW `seq` whose key tuple appears in the
    * file — which is what lets a streaming upsert commit "replace these
    * keys" with ZERO reads: the new rows land at seq == the delete's
    * seq, so they are exempt by the strict inequality, while every
    * older file is covered. Position deletes (DvEntry) name rows the
    * writer had to FIND; equality deletes name rows by VALUE and defer
    * the finding to readers (or to [[convertEqDeletes]], the
    * maintenance op that turns them into vectors). */
  private[graft] case class EqDelete(file: String, seq: Long,
                                     nkeys: Long, cols: String) {
    def colNames: Seq[String] = cols.split(";").toSeq
  }

  // --- CHANGE DATA FEED (o29) ------------------------------------------
  // `option("readChangeFeed", true)`: rows + Delta's CDF columns. What
  // makes it possible here is the deletion-vector representation — a
  // vector commit's delta IS expressible as rows (the newly-deleted
  // positions of an unchanged file), so the changelog's "rows removed"
  // refusal becomes real CDC output: inserts from added files, deletes
  // from vector diffs, per commit. Merge-on-read updates surface as
  // delete+insert pairs (their physical representation — the Iceberg
  // CDC position). Rewrites (compaction/COW DML/truncate) stay
  // inexpressible and refuse, exactly like the plain changelog.
  private[graft] val CHANGE_TYPE_COL = "_change_type"
  private[graft] val COMMIT_VERSION_COL = "_commit_version"

  private[graft] def cdfSchema(base: StructType): StructType =
    StructType(base.fields ++ Array(
      StructField(CHANGE_TYPE_COL, StringType, nullable = false),
      StructField(COMMIT_VERSION_COL, LongType, nullable = false)))

  /** Per-commit change partitions for the range (fromExclusive, to] —
    * shared by the batch CDF scan and the streaming CDF source. Every
    * commit in the range must still have its version manifest (per-
    * commit attribution needs per-commit diffs; an expired intermediate
    * version is the documented retention error). A pair that REMOVED a
    * file refuses: manifests alone cannot distinguish a rewrite (whose
    * net change is inexpressible) from a full-vector file drop. */
  private[graft] def changePartitions(dir: Path, path: String,
                                      fromExclusive: Long, to: Long,
                                      ddl: String): Array[InputPartition] = {
    if (to <= fromExclusive) return Array.empty
    val first = if (fromExclusive < 0) 0L else fromExclusive
    val have = listVersions(dir).toSet
    // a `to` beyond the newest commit is a caller error (an endingVersion
    // typo), not a retention problem — name it before the missing-manifest
    // check would mislabel every absent version as 'expired'
    require(have.nonEmpty && to <= have.max,
      s"graft-commit: change feed endingVersion $to of $path does not " +
        s"exist yet (newest commit: ${if (have.isEmpty) -1L else have.max})")
    val missing = (first to to).filterNot(have)
    require(missing.isEmpty,
      s"graft-commit: change feed needs every version in " +
        s"[$first, $to] of $path, but ${missing.mkString(",")} " +
        "expired — per-commit change attribution requires retaining at " +
        "least as many versions as the feed lags (the changelog retention rule)")
    def at(v: Long): Manifest =
      if (v < 0) Manifest(-1L, ddl, Seq.empty, Seq.empty)
      else parseManifestVersion(dir, v)
    var prev = at(fromExclusive)
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    ((fromExclusive + 1) max 0L to to).foreach { v =>
      val cur = at(v)
      require(cur.payload == "parquet" || cur.files.isEmpty,
        s"graft-commit: the change feed requires the parquet payload " +
          s"($path is '${cur.payload}')")
      val removed = prev.files.toSet -- cur.files.toSet
      // a removed file WITH a tombstone vector entry is a fully-covering
      // MOR delete (o33) — expressible: the data file still exists (the
      // previous version references it; the feed's retention rule keeps
      // that version), and the tombstone names every newly-dead position
      val trulyRemoved = removed.filterNot(cur.deletes.contains)
      require(trulyRemoved.isEmpty,
        s"graft-commit: commit $v of $path removed ${trulyRemoved.size} " +
          "file(s) (truncate/copy-on-write DML/compaction) — a change " +
          "feed can only express appends and deletion-vector commits; " +
          "restart from a fresh checkpoint past the rewrite")
      require(prev.eqDeletes == cur.eqDeletes,
        s"graft-commit: commit $v of $path changed its equality deletes " +
          "(an upsert-by-key write) — the rows such a delete matches are " +
          "unknown without a scan, so the change feed cannot express it; " +
          "convertEqDeletes turns them into expressible vectors")
      def abs(f: String) = Paths.get(path, f).toString
      cur.files.filterNot(prev.files.contains).foreach { f =>
        parts += CommitChangesPartition(abs(f),
          cur.deletes.get(f).map(e => abs(e.dv)).getOrElse(""), "",
          insert = true, commitVersion = v)
      }
      prev.files.filter(f => prev.deletes.get(f) != cur.deletes.get(f))
        .foreach { f =>
          parts += CommitChangesPartition(abs(f),
            cur.deletes.get(f).map(e => abs(e.dv)).getOrElse(""),
            prev.deletes.get(f).map(e => abs(e.dv)).getOrElse(""),
            insert = false, commitVersion = v)
        }
      prev = cur
    }
    parts.toArray
  }

  /** CHANGE FEED WITH REWRITE FALLBACK (o33) — closes the feed's last
    * gap: per commit, an expressible pair replays through the ordinary
    * CDF scan (cheap: vectors/appends read only their own diff), while a
    * commit the scan must refuse — a COW DML / compaction / full
    * truncate (files removed) or an upsert (equality delete added) —
    * falls back to a GROUP-GRANULAR SNAPSHOT DIFF: the pre-image of the
    * files the commit touched EXCEPT ALL their post-image is the
    * commit's 'delete' rows, the reverse its 'insert' rows (how Delta
    * replays a non-CDF rewrite). "Touched" is removed ∪ added ∪
    * vector-changed ∪ newly-equality-covered — at 100 TB a one-group COW
    * UPDATE diffs ONE group, never the table. Retention rule unchanged:
    * every version in [startingVersion-1, endingVersion] must still
    * exist. Both views read through [[readManifestFiles]], so vectors
    * and equality deletes are applied exactly as each version saw them. */
  def changeFeedWithRewrites(spark: SparkSession, dir: String,
                             startingVersion: Long,
                             endingVersion: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val d = Paths.get(dir)
    val curM = parseManifest(d).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    val to = endingVersion.getOrElse(curM.commit)
    val from = math.max(startingVersion, 0L)
    // an empty range (a caught-up poller passing lastSeen+1) is a valid
    // no-change answer, not an error — mirror the plain CDF scan, which
    // plans zero partitions for it
    if (from > to)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        cdfSchema(StructType.fromDDL(curM.ddl)))
    val have = listVersions(d).toSet
    require(have.nonEmpty && to <= have.max,
      s"graft-commit: change feed endingVersion $to of $dir does not exist " +
        s"yet (newest commit: ${if (have.isEmpty) -1L else have.max})")
    // the first commit's expressibility/diff reads at(from-1), so the
    // retention rule really covers [from-1, to] — name that version when
    // it is the one that expired instead of failing inside parseManifest
    val needed = (math.max(from - 1, 0L) to to)
    val missing = needed.filterNot(have)
    require(missing.isEmpty,
      s"graft-commit: change feed needs every version in " +
        s"[${needed.head}, $to] of $dir (startingVersion-1 included: the " +
        s"first commit diffs against it), but ${missing.mkString(",")} " +
        "expired (the retention rule)")
    def at(v: Long): Manifest =
      if (v < 0) Manifest(-1L, curM.ddl, Seq.empty, Seq.empty)
      else parseManifestVersion(d, v)
    def isExpressible(v: Long): Boolean = {
      val (prev, cur) = (at(v - 1), at(v))
      val removed = prev.files.toSet -- cur.files.toSet
      removed.forall(cur.deletes.contains) && prev.eqDeletes == cur.eqDeletes
    }
    /** One inexpressible commit's delta as a group-granular snapshot
      * diff: pre-image of exactly the touched files EXCEPT ALL their
      * post-image = 'delete' rows, the reverse = 'insert' rows. */
    def diffOf(v: Long): org.apache.spark.sql.DataFrame = {
      val (prev, cur) = (at(v - 1), at(v))
      require(sameColumns(prev.ddl, cur.ddl) && prev.payload == cur.payload,
        s"graft-commit: commit $v of $dir rewrote the table under a new " +
          "schema or payload — no diff is expressible; restart past it")
      val removed = prev.files.toSet -- cur.files.toSet
      val added = cur.files.filterNot(prev.files.toSet)
      val dvChanged = prev.files.filter(f =>
        cur.files.contains(f) && prev.deletes.get(f) != cur.deletes.get(f))
      val eqCovered = cur.eqDeletes.filterNot(prev.eqDeletes.contains)
        .flatMap(e => prev.files.filter(f => cur.seqOf(f) < e.seq))
      val oldSide = (removed.toSeq ++ dvChanged ++ eqCovered).distinct
      val newSide = (added ++ dvChanged ++ eqCovered).distinct
      val oldView = readManifestFiles(spark, dir,
        prev.copy(files = prev.files.filter(oldSide.contains)))
      val newView = readManifestFiles(spark, dir,
        cur.copy(files = cur.files.filter(newSide.contains)))
      oldView.exceptAll(newView)
        .withColumn(CHANGE_TYPE_COL, lit("delete"))
        .withColumn(COMMIT_VERSION_COL, lit(v))
        .unionByName(newView.exceptAll(oldView)
          .withColumn(CHANGE_TYPE_COL, lit("insert"))
          .withColumn(COMMIT_VERSION_COL, lit(v)))
    }
    // group CONSECUTIVE expressible commits into one ranged CDF scan —
    // the per-commit partitions come out identical (the scan's planner
    // is per-commit anyway), but a 1000-commit history plans a handful
    // of scans instead of a thousand
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    (from to to).foreach { v =>
      val ok = isExpressible(v)
      runs.lastOption match {
        case Some((s, e, true)) if ok && e == v - 1 =>
          runs(runs.length - 1) = (s, v, true)
        case _ => runs += ((v, v, ok))
      }
    }
    val frames = runs.toSeq.flatMap { case (s, e, ok) =>
      if (ok)
        Seq(spark.read.format(NAME).option("path", dir)
          .option("readChangeFeed", true)
          .option("startingVersion", s).option("endingVersion", e).load())
      else (s to e).map(diffOf)
    }
    // allowMissingColumns: an ALTER inside the range widens later
    // commits' rows; earlier ones read the added column as NULL
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  // --- deletion-vector file format -------------------------------------
  // DENSITY-ADAPTIVE, chosen per vector at write time (the roaring-
  // bitmap idea — Delta's DV / Iceberg v3 Puffin — reduced to its two
  // extreme containers, which is all a position set over one file's
  // row space needs):
  //   GDV1: magic, count, `count` sorted int64 positions — 8 B/delete,
  //         optimal for the SELECTIVE deletes merge-on-read exists for,
  //         and byte-inspectable.
  //   GDV2: magic, count, word count, then a bitset over [0, maxPos] —
  //         1 BIT/row, taking over exactly when a vector grows dense
  //         (> 1/64 of its file's positions), so a wide DELETE's
  //         vector is bounded by rows/8 bytes instead of deletes*8.
  // The choice is strictly by encoded size; both decode through
  // [[readDv]] to the same sorted position array, so every consumer
  // (readers, merges, diffs, GC) is format-blind.
  private val DV_MAGIC = 0x47445631 // "GDV1"
  private val DV_MAGIC_BITMAP = 0x47445632 // "GDV2"

  private[graft] def writeDv(file: Path, positions: Array[Long]): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      CommitSink.io.newOutputStream(file)))
    try {
      // word count as a Long: a position at or above 2^37 would wrap the
      // Int form ((p >>> 6).toInt + 1) into a negative/garbage count and
      // corrupt the bitmap container — unreachable at realistic per-file
      // row counts, but the positional container handles any Long
      // position, so oversized vectors simply fall through to it
      val nWords: Long =
        if (positions.isEmpty) 0L else (positions.last >>> 6) + 1L
      if (positions.nonEmpty && nWords <= Int.MaxValue.toLong &&
          nWords * 8 < positions.length.toLong * 8) {
        out.writeInt(DV_MAGIC_BITMAP)
        out.writeInt(positions.length)
        out.writeInt(nWords.toInt)
        val words = new Array[Long](nWords.toInt)
        positions.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63))
        words.foreach(out.writeLong)
      } else {
        out.writeInt(DV_MAGIC)
        out.writeInt(positions.length)
        positions.foreach(out.writeLong)
      }
    } finally out.close()
  }

  private[graft] def readDv(file: Path): Array[Long] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      CommitSink.io.newInputStream(file)))
    try in.readInt() match {
      case DV_MAGIC =>
        val n = in.readInt()
        val out = new Array[Long](n)
        var i = 0
        while (i < n) { out(i) = in.readLong(); i += 1 }
        out
      case DV_MAGIC_BITMAP =>
        val n = in.readInt()
        val nWords = in.readInt()
        val out = new Array[Long](n)
        var k = 0
        var w = 0
        while (w < nWords) {
          var bits = in.readLong()
          while (bits != 0L) {
            out(k) = w.toLong * 64 + java.lang.Long.numberOfTrailingZeros(bits)
            k += 1
            bits &= bits - 1
          }
          w += 1
        }
        require(k == n,
          s"graft-commit: corrupt bitmap deletion vector $file ($k of $n positions)")
        out
      case other => sys.error(
        s"graft-commit: $file is not a deletion-vector file (magic $other)")
    } finally in.close()
  }

  /** Read the committed snapshot: ONLY the manifest's file list, with the
    * manifest's schema. A target that has never seen any write (no
    * manifest at all) fails with a clear error; a committed-but-empty
    * target (zero files — e.g. a stream whose every epoch was empty)
    * reads as an empty frame of the manifest's schema. Streaming writes
    * create an empty manifest at factory creation precisely so that a
    * zero-epoch stream's target is readable. */
  def readCommitted(spark: SparkSession, dir: String): DataFrame =
    readManifestFiles(spark, dir, parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir")))

  /** Spark-native read of a manifest's committed files — json or
    * parquet per the manifest's recorded payload (the parquet branch
    * gets Spark's vectorized columnar scan). Shared by every
    * driver-side re-read: readCommitted, time travel, compaction, and
    * the metadata-DELETE rewrite. */
  private[graft] def readManifestFiles(spark: SparkSession, dir: String,
                                       m: Manifest): DataFrame = {
    val schema = StructType.fromDDL(m.ddl)
    if (m.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      import spark.implicits._
      import org.apache.spark.sql.functions.{broadcast, col}
      val paths = m.files.map(f => Paths.get(dir, f).toString)
      val r = spark.read.schema(schema)
      val base = if (m.payload == "parquet") r.parquet(paths: _*) else r.json(paths: _*)
      val dvs = m.files.flatMap(f => m.deletes.get(f).map(f -> _))
      if (dvs.isEmpty && m.eqDeletes.isEmpty) base
      else {
        // helper names must not collide with data columns: withColumn
        // would silently REPLACE (and then drop) a data column named
        // `_graft_src_file`/`_graft_src_pos` — uniquify instead, the same
        // rule the scan applies by withdrawing _file/_pos on collision.
        // Both filters need the native scan's `_metadata` device, which
        // only resolves on the BASE relation — stamp once, before any join.
        def fresh(b: String): String =
          Iterator.from(0).map(i => if (i == 0) b else s"$b$i")
            .find(n => !schema.fieldNames.contains(n)).get
        val srcFile = fresh("_graft_src_file")
        val srcPos = fresh("_graft_src_pos")
        var out = base
          .withColumn(srcFile, col("_metadata.file_name"))
          .withColumn(srcPos, col("_metadata.row_index"))
        // merge-on-read vectors (o27): anti-join away the deleted
        // (file, position) pairs. The vectors are read on EXECUTORS (the
        // pair list shipped is file-count-sized, the positions dataset is
        // deleted-row-sized and distributed); Spark's file-name +
        // row-index metadata matches the sink readers' position contract.
        if (dvs.nonEmpty) {
          val pairs = dvs.map { case (f, e) => (f, Paths.get(dir, e.dv).toString) }
          val deleted = spark.createDataset(pairs)
            .flatMap { case (f, dv) => readDv(Paths.get(dv)).map(p => (f, p)) }
            .toDF("_graft_del_file", "_graft_del_pos")
          out = out.join(deleted,
            out(srcFile) === deleted("_graft_del_file") &&
              out(srcPos) === deleted("_graft_del_pos"),
            "left_anti")
        }
        // equality deletes (o32): anti-join each key file's tuples
        // against rows of STRICTLY-OLDER data files — key equality is
        // SQL equality (a NULL key matches nothing), and the sequence
        // comparison scopes every delete to the files it was committed
        // above. Key sets are batch-sized: broadcast.
        if (m.eqDeletes.nonEmpty) {
          val srcSeq = fresh("_graft_src_seq")
          val seqDf = broadcast(
            m.files.map(f => (f, m.seqOf(f))).toDF(srcFile, srcSeq))
          out = out.join(seqDf, srcFile)
          m.eqDeletes.groupBy(_.cols).foreach { case (_, group) =>
            val keyCols = group.head.colNames
            val keySchema = StructType(keyCols.map(c => schema(schema.fieldIndex(c))))
            val delFile = fresh("_graft_eqdel_file")
            val delSeq = fresh("_graft_eqdel_seq")
            // rename key columns BY NAME (the USING join reorders
            // columns, so a positional rename would mislabel them)
            val del = keyCols.foldLeft(
              spark.read.schema(keySchema)
                .parquet(group.map(e => Paths.get(dir, e.file).toString): _*)
                .withColumn(delFile, col("_metadata.file_name"))
                .join(broadcast(group.map(e => (e.file, e.seq)).toDF(delFile, delSeq)),
                  delFile)) {
              (d, c) => d.withColumnRenamed(c, "_graft_k_" + c)
            }
            val cond = keyCols.map(c => out(c) === del("_graft_k_" + c))
              .reduce(_ && _) && del(delSeq) > out(srcSeq)
            out = out.join(broadcast(del), cond, "left_anti")
          }
          out = out.drop(srcSeq)
        }
        out.drop(srcFile, srcPos)
      }
    }
  }

  /** File compaction — the OPTIMIZE command (o19): rewrite the current
    * version's many small files as `numFiles` larger ones, landed as ONE
    * new version under the ordinary truncate write (task-isolated
    * staging, CAS'd manifest swap — readers see the pre- or post-compact
    * table, never both). Values are untouched; the previous version
    * stays time-travel readable until [[expireVersions]]. A partitioned
    * table keeps its layout (the partitionBy write re-clusters, one key
    * per file — numFiles then means "at most one file per key per
    * task"). Small-file compaction is THE steady-state maintenance of a
    * streaming-ingested table: epoch commits land one file per task per
    * trigger, and a day of 1-minute triggers is 1440× too many files. */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Unit =
      retryMaintenance(s"compact($dir)") {
    // pin ONE manifest: the rows read below and the commit CAS both bind
    // to it, so a commit landing while the compaction job runs hard-fails
    // the swap instead of having its rows silently truncated away —
    // and retryMaintenance re-plans from the NEW manifest (the
    // concurrent writer's files join the next compaction pass)
    val m = parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    val df = readManifestFiles(spark, dir, m)
    // an identity-partitioned table is NOT pre-repartitioned: the
    // partitionBy write already declares (and plans) its own
    // clustered+sorted shuffle, and one file per key per task is the
    // compacted form of that layout. A BUCKET layout pre-shapes here
    // instead (repartition on the bucket id + contiguous sort, the o39
    // preShaped device): path-based maintenance writes have no
    // FunctionCatalog to resolve the bucket transform through, and the
    // pre-shape is the same shuffle the catalog write would plan.
    val spec = m.partCol.map(PartSpec.parse)
    val shaped = spec match {
      case None => df.repartition(numFiles)
      case Some(BucketSpec(n, c)) =>
        val b = BucketFunction.bucketCol(n, org.apache.spark.sql.functions.col(c))
        df.repartition(numFiles, b).sortWithinPartitions(b)
      // identity/truncate/days: the partitionBy write plans its own
      // identity clustering (monotone transforms keep keys contiguous)
      case Some(_) => df
    }
    // compaction "scans" every pinned file — the rewrite replaces all of
    // them, carrying none, exactly the old truncate shape but CAS'd
    // against the PLANNING commit rather than a commit-time re-read
    val token = registerRewrite(DmlRewrite(m, () => m.files.toSet))
    try {
      val w0 = shaped.write.format(NAME).option("path", dir)
        .option("rewriteToken", token)
      val w = if (spec.exists(_.isInstanceOf[BucketSpec]))
        w0.option("preShaped", "true") else w0
      m.partCol.fold(w)(c => w.option("partitionBy", c)).mode("overwrite").save()
    } finally dropRewrite(token) // no-op on success; reclaims on early failure
  }

  /** Targeted DELETE maintenance — Iceberg's
    * rewrite_position_delete_files / binpack-with-delete-threshold
    * analog, the operational knob between "pay a position skip on
    * every read" and "compact the whole table": rewrite ONLY the files
    * whose deletion vector covers at least `minDeleteRatio` of their
    * physical rows (materializing those deletes — the rewrite's scan
    * applies the vectors, commitRewrite drops them with the replaced
    * files), carrying every other file — vectors included — untouched.
    * Runs under the ordinary group-granular rewrite contract: CAS'd
    * against the planning manifest, old version time-travel readable
    * until expiry. Returns the rewritten file names. At 100 TB this is
    * the steady-state MOR maintenance loop: vectors accumulate from
    * the CDC-upsert stream, and only the files where dead rows
    * actually dominate pay a rewrite. */
  def compactDeletes(spark: SparkSession, dir: String,
                     minDeleteRatio: Double): Seq[String] =
      retryMaintenance(s"compactDeletes($dir)") {
    require(minDeleteRatio > 0 && minDeleteRatio <= 1,
      s"minDeleteRatio must be in (0, 1], got $minDeleteRatio")
    val m = parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    val rowsOf = m.stats.map { case (f, e) => f -> FileStat.decode(e).rows }
    val picked = m.files.filter { f =>
      m.deletes.get(f).exists(e => rowsOf.get(f)
        .exists(r => r > 0 && e.ndel.toDouble / r >= minDeleteRatio))
    }
    if (picked.isEmpty) return Seq.empty // no vector dense enough: no-op
    val token = registerRewrite(DmlRewrite(m, () => picked.toSet))
    try {
      // the read applies the picked files' vectors, so the rewritten
      // files hold exactly the live rows
      val live = readManifestFiles(spark, dir, m.copy(files = picked))
      // bucket layouts pre-shape (see compact): no FunctionCatalog on a
      // path-based maintenance write
      val (shaped, pre) = m.partCol.map(PartSpec.parse) match {
        case Some(BucketSpec(n, c)) =>
          val b = BucketFunction.bucketCol(n, org.apache.spark.sql.functions.col(c))
          (live.repartition(math.max(1, picked.size), b).sortWithinPartitions(b), true)
        case _ => (live, false)
      }
      val w0 = shaped.write.format(NAME).option("path", dir)
        .option("rewriteToken", token)
      val w = if (pre) w0.option("preShaped", "true") else w0
      m.partCol.fold(w)(c => w.option("partitionBy", c)).mode("overwrite").save()
    } finally dropRewrite(token)
    picked
  }

  /** CLUSTERING rewrite — Iceberg's `rewriteDataFiles` with a sort
    * order / `ALTER TABLE ... WRITE ORDERED BY` (o35), and with
    * `zOrder = true` the multi-dimensional variant (o36, Delta's
    * `OPTIMIZE ... ZORDER BY`): rewrite the selected files so each new
    * file covers a NARROW, pairwise-disjoint slice of the clustering
    * key space, turning the manifest's zone maps from decorative
    * (hash-scattered layout: every file's range spans everything, no
    * range predicate ever prunes) into the second 100× after partition
    * pruning — a selective range scan plans files proportional to
    * selectivity (the o14 contract), and the disjoint layout is also
    * exactly what arms the DML matching-groups subquery (see
    * hasPrunableLayout).
    *
    *  - Lexicographic (`zOrder = false`): range-repartition on `cols`
    *    and sort within files — one clustering shuffle, the sorted-
    *    write shape q68 derives keys for.
    *  - Z-order (`zOrder = true`, 2-4 numeric dims): each dim is
    *    normalized to a 16-bit coordinate by its (min, max) — one agg
    *    pass — and the coordinates' bits INTERLEAVE into a single
    *    LONG z-value the range-repartition clusters on. Every file
    *    then covers a bounded box in EVERY dimension (a 2ᵏ-file
    *    layout halves each dim's per-file span per bit), so
    *    multi-dimensional box predicates prune without favoring the
    *    leading column the way a lexicographic sort does. The z-value
    *    is a static expression tree of shift/and/or — whole-stage
    *    codegen, no UDF — and is DROPPED before the write (a helper
    *    column must not land in the table).
    *
    * `only` targets a subset (Iceberg's file-filter): selected files
    * rewrite, every other file — vectors included — is CARRIED
    * verbatim under the group-granular rewrite contract, CAS'd on the
    * planning manifest. The scan applies the selected files' deletion
    * vectors and equality deletes, so clustering doubles as MOR
    * materialization for exactly the touched files (the compact
    * precedent).
    *
    * On an identity-PARTITIONED table (o39, r15 — Iceberg's
    * `ALTER ... WRITE ORDERED BY` within the partition spec): `cols`
    * are the SECONDARY sort columns, and the rewrite range-partitions
    * on (key, cols) with the write told the shuffle already happened
    * (the `preShaped` internal option) — a large key splits into
    * several files, each one key (SPJ grouping intact) with a TIGHT
    * zone slice of the sort columns, so range scans prune WITHIN a
    * partition. Z-order stays unpartitioned-only. Values are
    * untouched — the old version stays time-travel readable until
    * [[expireVersions]]. Returns the rewritten file names. */
  def compactAndCluster(spark: SparkSession, dir: String, numFiles: Int,
                        cols: Seq[String], zOrder: Boolean = false,
                        only: Option[Set[String]] = None): Seq[String] =
      retryMaintenance(s"compactAndCluster($dir)") {
    import org.apache.spark.sql.functions.{col, floor, greatest, least, lit,
      max, min, shiftleft, shiftright}
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(cols.nonEmpty, "compactAndCluster needs at least one column")
    val m = parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    require(m.partCol.isEmpty || !zOrder,
      s"graft-commit: z-order within a partitioned layout is " +
        s"not supported; cluster ${m.partCol.get}-partitioned $dir with " +
        "sort columns instead")
    // identity: the key is constant within a file, so sorting on it is a
    // spec error. Bucket/truncate/days: the SOURCE column is a
    // legitimate sort key — a bucket holds many key values in hash
    // order, a band/day holds its whole raw-value range, and ordering
    // by the key within each group is exactly what makes key ranges
    // prunable (pre-r17 this match was Identity/Bucket-only and a
    // truncate/days layout hit a MatchError instead of compacting).
    m.partCol.map(PartSpec.parse).foreach {
      case IdentitySpec(pc) => require(!cols.contains(pc),
        s"graft-commit: '$pc' is the partition column — every file already " +
          "holds one key; name the SECONDARY sort column(s)")
      case _ => ()
    }
    only.foreach(s => require(s.subsetOf(m.files.toSet),
      s"graft-commit: unknown files selected: ${(s -- m.files).mkString(",")}"))
    val picked = only.fold(m.files)(s => m.files.filter(s)) match {
      case Seq() => return Seq.empty // nothing selected: no-op, no version
      case fs => fs
    }
    val df = readManifestFiles(spark, dir, m.copy(files = picked))
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"graft-commit: clustering column(s) ${missing.mkString(",")} not in " +
        s"table schema [${df.columns.mkString(",")}]")
    val shaped =
      if (m.partCol.isDefined) {
        // per-partition SORT-ORDER rewrite (o39 — Iceberg's
        // `ALTER ... WRITE ORDERED BY` within the partition spec): range
        // on (key, sortCols) splits a big key into several files, each
        // covering a TIGHT slice of the sort columns, while every key
        // stays contiguous within its task — the rolling writer still
        // lands one key per file, so the SPJ grouping survives and the
        // secondary zone ranges become prunable within each partition.
        // The write is told the shuffle already happened (preShaped).
        // For a bucket layout the leading range/sort key is the BUCKET
        // ID expression (the manifest's partcol is a transform, not a
        // column) — same contiguity guarantee, per bucket id.
        val pcExpr = PartSpec.parse(m.partCol.get) match {
          case IdentitySpec(c) => col(c)
          case BucketSpec(n, c) => BucketFunction.bucketCol(n, col(c))
          // monotone transforms: range/sort on the SOURCE column keeps
          // every transformed key contiguous (and sub-sorted)
          case TruncateSpec(_, c) => col(c)
          case DaysSpec(c) => col(c)
          case MonthsSpec(c) => col(c)
          case YearsSpec(c) => col(c)
        }
        df.repartitionByRange(numFiles, pcExpr +: cols.map(col): _*)
          .sortWithinPartitions(pcExpr +: cols.map(col): _*)
      } else if (!zOrder)
        df.repartitionByRange(numFiles, cols.map(col): _*)
          .sortWithinPartitions(cols.map(col): _*)
      else {
        require(cols.size >= 2 && cols.size <= 4,
          s"z-order interleaves 2-4 dimensions, got ${cols.size}")
        // refuse non-numeric dimensions up front (mirroring
        // buildBloomIndex's type check): a string/boolean dimension
        // would otherwise surface as an opaque cast/NPE failure at the
        // bounds aggregation below
        cols.foreach { c =>
          val dt = df.schema(df.schema.fieldIndex(c)).dataType
          require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
            s"graft-commit: z-order dimension '$c' has non-numeric type " +
              s"${dt.simpleString} — z-values interleave normalized " +
              "numeric coordinates (use the lexicographic mode for " +
              "string/boolean clustering)")
        }
        val k = cols.size
        // bits per dim capped so k*bits stays under the sign bit — a
        // negative z-value would invert the range ordering at k = 4
        val bits = math.min(16, 62 / k)
        val buckets = (1L << bits) - 1
        // one pass for the normalization bounds
        val aggCols = cols.flatMap(c =>
          Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        val bounds = df.agg(aggCols.head, aggCols.tail: _*).head()
        // an all-NULL dimension has no bounds to normalize — refuse
        // clearly instead of NPE-ing on getDouble
        cols.indices.foreach(i => require(!bounds.isNullAt(2 * i),
          s"graft-commit: z-order dimension '${cols(i)}' is all-NULL — " +
            "no bounds to normalize"))
        // bounds layout: (min, max) pairs in column order
        def coord(i: Int): org.apache.spark.sql.Column = {
          val (mn, mx) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
          val span = mx - mn
          if (span <= 0) lit(0L) // constant column: one bucket
          else least(greatest(
            floor((col(cols(i)).cast("double") - lit(mn)) / lit(span)
              * (buckets + 1).toDouble).cast("long"), lit(0L)), lit(buckets))
        }
        val zv = (0 until bits).flatMap(b => (0 until k).map(d =>
            shiftleft(shiftright(coord(d), b).bitwiseAND(lit(1L)), b * k + d)))
          .reduce(_.bitwiseOR(_))
        // EXACT z-cells, not z-range quantiles: range-partitioning the
        // z-value (or even a snapped bin id) samples its boundaries,
        // and a boundary that slips even one sliver past a z-CELL edge
        // widens the file's zone to the FULL span of the dimension
        // that bit split — min/max zone maps are poisoned by ANY
        // straddle, and bins adjacent in z are NOT adjacent in space
        // (a {(y0,x1),(y1,x0)} merge spans both dims). So the bin id
        // slices z-space linearly into numFiles equal cells — a
        // deterministic expression — and each bin routes to ITS OWN
        // task through hash partitioning on a per-bin PREIMAGE value
        // solved on the driver (pmod(murmur3(v_b), n) == b), giving
        // exactly one z-cell per file with no sampling anywhere. The
        // trade is Delta/Iceberg's: cells are equal Z-VOLUME, not
        // equal rows (skewed data skews file sizes; the lexicographic
        // mode is the equal-rows clustering).
        val cell = math.max(1L, (1L << (bits * k)) / numFiles)
        val preimage: Map[Long, Long] = (0 until numFiles).map { b =>
          var v = 0L
          while ((((org.apache.spark.unsafe.hash.Murmur3_x86_32
              .hashLong(v, 42) % numFiles) + numFiles) % numFiles) != b)
            v += 1
          b.toLong -> v
        }.toMap
        val route = org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.map(preimage.toSeq.sortBy(_._1)
            .flatMap { case (b, v) => Seq(lit(b), lit(v)) }: _*),
          // bins past the last cell (rounding) fold into the top file;
          // `div`, not `/`: Column./ is double division and a k=4
          // z-value exceeds the double mantissa
          least(org.apache.spark.sql.functions.expr(
            s"_graft_zvalue div $cell"), lit(numFiles - 1L)))
        val zc = "_graft_zvalue"
        df.withColumn(zc, zv)
          .repartition(numFiles, route)
          .sortWithinPartitions(col(zc))
          .drop(zc) // projection only: the partitioning stays
      }
    val token = registerRewrite(DmlRewrite(m, () => picked.toSet))
    try {
      val w = shaped.write.format(NAME).option("path", dir)
        .option("rewriteToken", token)
      m.partCol.fold(w)(pc =>
          w.option("partitionBy", pc).option("preShaped", "true"))
        .mode("overwrite").save()
    } finally dropRewrite(token)
    picked
  }

  /** PARTITION EVOLUTION (o37) — Iceberg's partition-spec evolution,
    * the metadata half the clustering rewrite composes with: change the
    * table's partition spec — an identity column or, since o40, a
    * `bucket(n,col)` transform ([[PartSpec]]) — or add one to an
    * unpartitioned table, or drop it, WITHOUT touching a single data
    * file. One
    * metadata-only commit: every file, zone range, deletion vector,
    * key file, sequence and epoch carries verbatim; only `partcol`
    * changes, and every carried file's recorded PARTITION KEY is
    * STRIPPED — the old keys are values of the OLD column, and a stale
    * key under the new column would group files WRONGLY (the one
    * correctness hazard of evolution; everything else degrades, this
    * would lie). The degradation contract after the commit:
    *
    *  - reads stay correct on every path (per-file planning; zone maps
    *    never depended on the layout);
    *  - storage-partitioned-join reporting turns OFF — the scan's
    *    KeyGroupedPartitioning requires every surviving file to know
    *    its key, which is now false by construction — and turns back
    *    ON once maintenance migrates the files;
    *  - appends must use the NEW layout (the ordinary layout-mismatch
    *    refusal, now judging against the evolved column), so the table
    *    converges file by file;
    *  - [[compact]] IS the migration op: it rewrites the current
    *    version under the manifest's (new) partition column — one key
    *    per file, keys recorded — restoring SPJ and per-key pruning in
    *    one maintenance pass (exactly Iceberg's rewriteDataFiles-after-
    *    spec-change story);
    *  - time travel keeps each version's own layout (version manifests
    *    are immutable).
    *
    * At 100 TB this is the operational answer to "we partitioned on
    * the wrong key": queries keep running during the (possibly long)
    * migration window instead of a stop-the-world re-land. */
  def evolvePartitioning(spark: SparkSession, dir: String,
                         newCol: Option[String]): Unit = {
    val m = parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    require(newCol != m.partCol,
      s"graft-commit: table $dir is already partitioned as " +
        s"${m.partCol.fold("(unpartitioned)")(c => s"'$c'")} — evolution " +
        "must change the layout")
    newCol.map(PartSpec.parse).foreach { spec =>
      val c = spec.sourceCol
      val schema = StructType.fromDDL(m.ddl)
      val f = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"graft-commit: partition column '$c' is not in the " +
          s"table schema [${schema.fieldNames.mkString(",")}]"))
      require(spec.sourceOk(f.dataType),
        s"graft-commit: partition column '$c' must be ${spec.sourceRule}, " +
          s"got ${f.dataType.simpleString} (the partition key rule)")
    }
    // strip stale partition keys; rows/bytes/ranges carry verbatim
    val stats = m.stats.map { case (f, e) =>
      f -> FileStat.decode(e).copy(pk = None).encode
    }
    writeManifest(Paths.get(dir), m.ddl, m.files, m.commit + 1,
      m.epochs, expectedPrev = m.commit,
      partCol = newCol.map(s => PartSpec.parse(s).encode),
      stats = stats, tableId = carriedOrFreshTableId(Some(m)),
      payload = m.payload, deletes = m.deletes,
      fileSeq = m.fileSeq, eqDeletes = m.eqDeletes, blooms = m.blooms)
  }

  /** BLOOM FILE INDEX (o38) — Delta's bloom-filter-index / Iceberg-
    * parquet-footer-bloom shape as a maintenance op: one distributed
    * pass over the committed files builds a per-(file, column) bloom
    * sidecar, recorded in a METADATA-ONLY commit. The index answers the
    * predicate zone maps structurally cannot: EQUALITY/IN on a
    * hash-scattered, high-cardinality column (every file's [min, max]
    * spans everything, so a point lookup otherwise opens all of them).
    * At 100 TB this is the "find one document id without clustering on
    * it" path: ~KBs of sidecar per file per column, loaded at PLANNING
    * only for files that already survived zone pruning and only when a
    * pushed filter names an indexed column.
    *
    * Contracts: over-approximation only (a false positive costs one
    * file's IO; pruning is advisory because every filter stays
    * residual); blooms are built over PHYSICAL rows (deleted rows
    * included — never a wrong skip); new files appended after the build
    * are un-indexed and never prune (re-run the build to cover them —
    * entries merge per (file, column)); a rewritten file's blooms die
    * with it (writeManifest filters to listed files); sidecars are
    * GC-protected exactly like deletion vectors (manifestRefs). Parquet
    * payload only — the one scan is Spark's native vectorized read.
    * `expectedItemsPerFile` sizes the sidecars (~ -n·ln(fpp)/ln²2 bits);
    * the fpp degrades gracefully past it, it never breaks. Returns the
    * indexed file names. */
  def buildBloomIndex(spark: SparkSession, dir: String, cols: Seq[String],
                      fpp: Double = 0.01,
                      expectedItemsPerFile: Long = 1000000L): Seq[String] = {
    import org.apache.spark.util.sketch.BloomFilter
    require(cols.nonEmpty, "buildBloomIndex needs at least one column")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    require(expectedItemsPerFile >= 1, "expectedItemsPerFile must be >= 1")
    val m = parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    require(m.payload == "parquet",
      "graft-commit: the bloom index scans staged parquet natively; " +
        s"table $dir has the '${m.payload}' payload")
    val schema = StructType.fromDDL(m.ddl)
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"graft-commit: bloom column '$c' is not in the table " +
          s"schema [${schema.fieldNames.mkString(",")}]"))
      val ok = f.dataType match {
        case LongType | IntegerType | ShortType | ByteType | StringType => true
        case _ => false // float/double/decimal point-equality: footguns
      }
      require(ok, s"graft-commit: bloom column '$c' has non-indexable " +
        s"type ${f.dataType.simpleString} (integral and string only)")
      // the manifest encodes bloom entries as "file|column|sidecar" —
      // restrict names to the same separator-safe alphabet the zone-map
      // stats recording enforces, so a backticked name containing '|'
      // or '"' can never mis-split on parse
      require(c.matches("[A-Za-z0-9_]+"),
        s"graft-commit: bloom column name '$c' must match [A-Za-z0-9_]+")
    }
    if (m.files.isEmpty) return Seq.empty
    val read = StructType(cols.map(c => schema(schema.fieldIndex(c))))
    val nFields = cols.size
    val (xfpp, xexp) = (fpp, expectedItemsPerFile)
    // one distributed pass, all columns at once: per-file blooms merge
    // associatively, so the shape is a plain aggregateByKey — no
    // collect of row data, only (files × cols) sketches come back
    val built: Map[String, Array[Array[Byte]]] = spark.read.schema(read)
      .parquet(m.files.map(f => Paths.get(dir, f).toString): _*)
      .select(org.apache.spark.sql.functions.col("_metadata.file_name") +:
        cols.map(org.apache.spark.sql.functions.col): _*)
      .rdd.map(r => r.getString(0) -> r)
      .aggregateByKey(null: Array[BloomFilter])(
        (acc0, r) => {
          val acc = if (acc0 != null) acc0
            else Array.fill(nFields)(BloomFilter.create(xexp, xfpp))
          var i = 0
          while (i < nFields) {
            r.get(i + 1) match {
              case null      => ()
              case l: Long   => acc(i).putLong(l)
              case x: Int    => acc(i).putLong(x.toLong)
              case x: Short  => acc(i).putLong(x.toLong)
              case x: Byte   => acc(i).putLong(x.toLong)
              case s: String => acc(i).putString(s)
              case other => sys.error(s"unexpected bloom value type: $other")
            }
            i += 1
          }
          acc
        },
        (a, b) =>
          if (a == null) b else if (b == null) a
          else { a.indices.foreach(i => a(i).mergeInPlace(b(i))); a })
      .mapValues(_.map { bf =>
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        out.toByteArray
      }).collect().toMap
    val commitId = m.commit + 1
    val nonce = java.util.UUID.randomUUID().toString.takeRight(12)
    val promoted = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    try {
      var i = 0
      built.toSeq.sortBy(_._1).foreach { case (f, perCol) =>
        cols.zip(perCol).foreach { case (c, bytes) =>
          val fin = f"part-bloom-c$commitId%05d-$nonce-$i%05d.bin"
          i += 1
          val out = io.newOutputStream(Paths.get(dir, fin))
          try out.write(bytes) finally out.close()
          promoted += ((f, c, fin))
        }
      }
      // merge per (file, column): a rebuild replaces that pair's entry
      val merged = (m.blooms.toSeq.flatMap { case (f, cm) =>
        cm.toSeq.map { case (c, b) => (f, c, b) }
      } ++ promoted).groupBy(_._1).map { case (f, es) =>
        f -> es.map(e => e._2 -> e._3).toMap
      }
      writeManifest(Paths.get(dir), m.ddl, m.files, commitId,
        m.epochs, expectedPrev = m.commit, partCol = m.partCol,
        stats = m.stats, tableId = carriedOrFreshTableId(Some(m)),
        payload = m.payload, deletes = m.deletes,
        fileSeq = m.fileSeq, eqDeletes = m.eqDeletes, blooms = merged)
    } catch { case e: Throwable =>
      // refused CAS / failed write: leave no trace (the rewrite rule)
      promoted.foreach(p => io.deleteIfExists(Paths.get(dir, p._3)))
      throw e
    }
    built.keys.toSeq.sorted
  }

  /** Merge-on-read DELETE (o27) — the Iceberg v2 position-delete /
    * Delta deletion-vector write mode, the flip side of the
    * group-granular copy-on-write rewrite: instead of rewriting every
    * file that holds a matching row (one row matched in a 1 GB file =
    * 1 GB rewritten), record the matched rows' (file, position) pairs
    * as per-file DELETION VECTORS and commit a new version whose data
    * files are UNCHANGED. A one-row DELETE on a 100 TB table writes
    * ~20 bytes. The trade is Iceberg's own: reads pay a per-file
    * position skip until compaction (or any rewrite of the file)
    * materializes the deletes — which is exactly what [[compact]]
    * does, since its scan applies the vectors and its rewrite drops
    * them.
    *
    * Mechanics, all existing machinery: the matched positions come
    * from an ordinary DSv2 scan with the `_file`/`_pos` metadata
    * columns (so the pushed condition zone-prunes candidate files, and
    * already-deleted rows are never re-matched); each file's vector is
    * written EXECUTOR-side into the write's private staging dir (the
    * driver sees only file-count-sized names); promotion + a CAS'd
    * manifest swap against the PLANNING commit land the new version
    * atomically (a commit interleaving hard-fails the swap — statement
    * retry, the rewrite position). A vector that comes to cover EVERY
    * row of its file drops the file from the manifest outright.
    * Vectors compose: a second delete unions with the first file's
    * vector (disjoint by construction — the scan applied the old one).
    *
    * Parquet payload only: MOR needs stable physical row positions,
    * which the columnar payload defines; selecting the mode on a json
    * table falls back to copy-on-write (same result, different cost).
    */
  private[graft] def deleteToVectors(spark: SparkSession, path: String,
                                       planning: Manifest,
                                       cond: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, collect_list, lit, sort_array}
    import spark.implicits._
    require(planning.payload == "parquet",
      s"graft-commit: merge-on-read DELETE requires the parquet payload, $path is '${planning.payload}'")
    val dir = Paths.get(path)
    val nonce = writeNonce()
    val staging = stagingDir(dir, nonce)
    CommitSink.io.createDirectories(staging)
    try {
      // the DSv2 scan: applies existing vectors, stamps PHYSICAL
      // positions, zone-prunes the pushed condition. PINNED to the
      // planning manifest via its immutable version file — the scan and
      // the commit CAS below provably bind to one snapshot (an unpinned
      // read here could scan a concurrently-swapped manifest, and the
      // CAS failure would then be the only thing standing between a
      // stale caller and mismatched positions)
      val matched = spark.read.format(NAME).option("path", path)
        .option("versionAsOf", planning.commit).load()
        .filter(coalesce(cond, lit(false))) // DELETE: NULL keeps the row
        .select(col(FILE_COL).as("f"), col(POS_COL).as("p"))
      commitPositionsAsVectors(spark, path, planning, matched,
        nonce, staging, dropEq = false)
    } finally sweepStaging(dir, nonce)
  }

  /** Stage per-file merged deletion vectors for `matched` (f, p) rows and
    * land them as ONE CAS'd commit — shared by [[deleteToVectors]] (cond
    * scan: positions disjoint from existing vectors by construction) and
    * [[convertEqDeletes]] (native scan: positions may duplicate existing
    * vector entries, hence the distinct merge). `dropEq = true` retires
    * every equality delete in the new manifest — the positions now carry
    * them. Returns the files that received (new or merged) vectors. */
  private def commitPositionsAsVectors(spark: SparkSession, path: String,
                                       planning: Manifest,
                                       matched: org.apache.spark.sql.DataFrame,
                                       nonce: String, staging: Path,
                                       dropEq: Boolean): Seq[String] = {
    import org.apache.spark.sql.functions.{collect_list, sort_array}
    import spark.implicits._
    val dir = Paths.get(path)
    val oldDvs: Map[String, String] =
      planning.deletes.map { case (f, e) => f -> Paths.get(path, e.dv).toString }
    val stagingStr = staging.toString
    val staged: Map[String, (String, Long)] = matched
      .groupBy($"f").agg(sort_array(collect_list($"p")).as("ps"))
      .as[(String, Seq[Long])]
      .mapPartitions { it =>
        it.map { case (f, ps) =>
          val old = oldDvs.get(f).map(p => readDv(Paths.get(p)))
            .getOrElse(Array.empty[Long])
          val merged = (old ++ ps).distinct.sorted
          val name = s"dv-$f"
          writeDv(Paths.get(stagingStr, name), merged)
          (f, name, merged.length.toLong)
        }
      }.collect().map { case (f, n, c) => f -> (n, c) }.toMap
    if (staged.isEmpty && !dropEq) return Seq.empty // nothing matched: no new version
    val commitId = planning.commit + 1
    val rowsOf = planning.stats.map { case (f, e) => f -> FileStat.decode(e).rows }
    // a file whose vector covers every physical row is DROPPED from the
    // manifest (the classic point: MOR must not keep reading a file
    // that contributes nothing); its bytes stay for older versions
    val dead = staged.collect {
      case (f, (_, n)) if rowsOf.get(f).contains(n) => f
    }.toSet
    val files = planning.files.filterNot(dead)
    val promoted = scala.collection.mutable.ArrayBuffer.empty[(String, DvEntry)]
    try {
      // dead (fully-covered) files' vectors promote too: they become the
      // commit's TOMBSTONES (o33) — the change feed reads them against
      // the previous version's data file
      staged.toSeq.sortBy(_._1).zipWithIndex
        .foreach { case ((f, (name, n)), i) =>
          val fin = f"part-dv-c$commitId%05d-$nonce-$i%05d.bin"
          CommitSink.io.promote(staging.resolve(name), dir.resolve(fin))
          promoted += (f -> DvEntry(fin, n))
        }
      // a dead (fully-covered) file's vector lands as a TOMBSTONE: the
      // file leaves the list, the vector entry stays so the change feed
      // can emit the drop as delete rows (o33) — it dies at the next
      // commit, which never carries it
      val dvMap = (planning.deletes ++ promoted).toMap
      writeManifest(dir, planning.ddl, files, commitId,
        planning.epochs, // content lineage continues: the ledger carries
        expectedPrev = planning.commit,
        partCol = planning.partCol,
        stats = planning.stats.view.filterKeys(files.toSet).toMap,
        tableId = carriedOrFreshTableId(Some(planning)),
        payload = planning.payload,
        deletes = dvMap.view.filterKeys(files.toSet).toMap,
        fileSeq = planning.fileSeq,
        eqDeletes = if (dropEq) Seq.empty else planning.eqDeletes,
        tombstones = dvMap.view.filterKeys(dead).toMap,
        blooms = planning.blooms) // writeManifest drops dead files' entries
      staged.keys.toSeq.sorted
    } catch { case e: Throwable =>
      // refused CAS / failed promote: leave no trace (the rewrite rule)
      promoted.foreach(p => CommitSink.io.deleteIfExists(dir.resolve(p._2.dv)))
      throw e
    }
  }

  /** EQUALITY→POSITION conversion — the o32 maintenance op (Iceberg's
    * convert-equality-deletes rewrite): scan ONLY the files some key
    * file still covers, locate the matching rows ONCE, record them as
    * ordinary deletion vectors, and retire every key file — restoring
    * everything equality deletes suspend (metadata-only COUNT, the
    * change feed, per-read key probes). The scan is Spark's native
    * vectorized parquet read with `_metadata` row indexes (NOT the DSv2
    * scan, which would apply the very deletes being converted), reading
    * ONLY the key columns. Returns the files that actually received
    * positions (a covered file where no key matched is scanned but not
    * returned). */
  def convertEqDeletes(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    val m = parseManifest(Paths.get(dir)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $dir"))
    if (m.eqDeletes.isEmpty) return Seq.empty
    val schema = StructType.fromDDL(m.ddl)
    val affected = m.files.filter(f => m.eqDeletes.exists(_.seq > m.seqOf(f)))
    val seqDf = broadcast(affected.map(f => (f, m.seqOf(f)))
      .toDF("_graft_src_file", "_graft_src_seq"))
    val matched = m.eqDeletes.groupBy(_.cols).map { case (_, group) =>
      val keyCols = group.head.colNames
      val keySchema = StructType(keyCols.map(c => schema(schema.fieldIndex(c))))
      // rename key columns BY NAME — the USING join reorders columns
      val del = keyCols.foldLeft(
        spark.read.schema(keySchema)
          .parquet(group.map(e => Paths.get(dir, e.file).toString): _*)
          .withColumn("_graft_del_file", col("_metadata.file_name"))
          .join(broadcast(group.map(e => (e.file, e.seq))
            .toDF("_graft_del_file", "_graft_del_seq")), "_graft_del_file")) {
        (d, c) => d.withColumnRenamed(c, "_graft_k_" + c)
      }
      // helper names are reserved (_graft_ prefix, key names are plain
      // [A-Za-z0-9_]+ data columns — but "f"/"p" ARE legal key names, so
      // the stamps use _graft_ names and alias to (f, p) only at the end)
      val data = spark.read.schema(keySchema)
        .parquet(affected.map(f => Paths.get(dir, f).toString): _*)
        .withColumn("_graft_src_file", col("_metadata.file_name"))
        .withColumn("_graft_src_pos", col("_metadata.row_index"))
        .join(seqDf, "_graft_src_file")
      data.join(broadcast(del),
          keyCols.map(c => data(c) === del("_graft_k_" + c)).reduce(_ && _) &&
            del("_graft_del_seq") > data("_graft_src_seq"),
          "left_semi")
        .select($"_graft_src_file".as("f"), $"_graft_src_pos".as("p"))
    }.reduce(_ unionByName _).distinct()
    val nonce = writeNonce()
    val staging = stagingDir(Paths.get(dir), nonce)
    CommitSink.io.createDirectories(staging)
    try commitPositionsAsVectors(spark, dir, m, matched, nonce, staging,
      dropEq = true)
    finally sweepStaging(Paths.get(dir), nonce)
  }

  /** Snapshot expiry — the VACUUM command (o19), the GC half of time
    * travel: drop every version manifest except the newest `keepLast`,
    * then delete the data files ONLY those dropped versions referenced
    * (and no retained version still does). Files referenced by NO
    * manifest at all are deliberately NOT touched: since appends became
    * concurrent, such a file may be another writer's
    * promoted-but-not-yet-committed output — deleting it would corrupt
    * that writer's CAS-retry. Never-referenced leftovers (crashed
    * writers) are [[removeOrphanFiles]]' job, behind a
    * modification-time grace window — exactly Iceberg's
    * expireSnapshots / removeOrphanFiles split. Returns (expired
    * versions, deleted data files). */
  def expireVersions(dir: String, keepLast: Int): (Seq[Long], Seq[String]) = {
    require(keepLast >= 1, "expiry must keep at least the current version")
    val d = Paths.get(dir)
    val versions = listVersions(d)
    if (versions.isEmpty) return (Seq.empty, Seq.empty) // nothing to expire
    val current = currentCommit(d)
    // never expire the current version, whatever keepLast says (guarded
    // on existence: a pre-versioning current manifest has no version
    // file, but its files are still protected via the union below) —
    // nor any TAGGED version (o41: tags are retention roots, Iceberg's
    // ref-aware expiry), nor a BRANCH HEAD (o44: a branch is a live
    // writable lineage — its head must stay readable until the branch
    // is published or dropped), nor an OPEN STAGE (o41: the audit copy)
    val refRoots = listTags(d).values.toSet ++
      listBranches(d).values.map(_._1) ++ listStaged(d)
    // keepLast counts MAIN history: branch versions (the high range) are
    // protected only while a ref points at them — a pile of abandoned
    // branch versions must not shield main's tail from expiry
    val mainVersions = versions.filter(_ < BRANCH_BASE)
    val keep = (mainVersions.takeRight(keepLast) ++ versions.filter(_ == current)
      ++ versions.filter(refRoots.contains)).distinct
    val drop = versions.filterNot(keep.contains)
    val live: Set[String] =
      keep.flatMap(v => manifestRefs(parseManifestVersion(d, v))).toSet ++
        parseManifest(d).toSeq.flatMap(manifestRefs)
    // enumerate the dropped versions' files BEFORE deleting their
    // manifests — the manifest is the only record of what they held
    val droppedReferenced =
      drop.flatMap(v => manifestRefs(parseManifestVersion(d, v))).toSet
    drop.foreach(v => CommitSink.io.deleteIfExists(d.resolve(versionFile(v))))
    val removed = droppedReferenced.filterNot(live.contains).toSeq.sorted
    removed.foreach(n => CommitSink.io.deleteIfExists(d.resolve(n)))
    (drop, removed)
  }

  // --- refs + write-audit-publish (o41) --------------------------------

  private val REFS = "_REFS.json"

  /** Named TAGS over the version ledger (Iceberg refs): `name → commit`.
    * A tag is an immutable, human-named pin on a version — and a
    * RETENTION ROOT: [[expireVersions]] never drops a tagged version,
    * however old (Iceberg's ref-aware snapshot expiry). Stored in one
    * `_REFS.json` swapped atomically under the table's commit lock. */
  private[graft] def listTags(dir: Path): Map[String, Long] = {
    val rf = dir.resolve(REFS)
    if (!io.exists(rf)) Map.empty
    else "\"tags\":\\[([^\\]]*)\\]".r.findFirstMatchIn(io.readString(rf))
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val bar = e.lastIndexOf('|')
        e.substring(0, bar) -> e.substring(bar + 1).toLong
      }.toMap
  }

  /** Versions currently STAGED (written, never published): what makes an
    * open stage visible to ordinary writers — an append planning the
    * same commit id must refuse instead of clobbering the audit copy. */
  private[graft] def listStaged(dir: Path): Set[Long] = {
    val rf = dir.resolve(REFS)
    if (!io.exists(rf)) Set.empty
    else "\"staged\":\\[([^\\]]*)\\]".r.findFirstMatchIn(io.readString(rf))
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** Named BRANCHES over the version ledger (o44, Iceberg's writable
    * refs): `name → (head version, base version)`. A branch is a
    * WRITABLE pointer — commits with `option("branch", name)` advance
    * the head (main's `_MANIFEST.json` untouched) — plus a RETENTION
    * ROOT like a tag. `base` is main's commit at creation (or at the
    * last fast-forward publish): the divergence witness — publish
    * fast-forwards main to the head iff main still sits at base. */
  private[graft] def listBranches(dir: Path): Map[String, (Long, Long)] = {
    val rf = dir.resolve(REFS)
    if (!io.exists(rf)) Map.empty
    else "\"branches\":\\[([^\\]]*)\\]".r.findFirstMatchIn(io.readString(rf))
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val p = e.split("\\|")
        p(0) -> (p(1).toLong, p(2).toLong)
      }.toMap
  }

  private def writeRefs(dir: Path, tags: Map[String, Long],
                        staged: Set[Long],
                        branches: Map[String, (Long, Long)]): Unit = {
    val body = s"""{"tags":[${tags.toSeq.sortBy(_._1)
      .map { case (n, v) => s""""$n|$v"""" }.mkString(",")}],""" +
      s""""staged":[${staged.toSeq.sorted.mkString(",")}],""" +
      s""""branches":[${branches.toSeq.sortBy(_._1)
        .map { case (n, (h, b)) => s""""$n|$h|$b"""" }.mkString(",")}]}"""
    val tmp = dir.resolve(REFS + ".tmp")
    io.writeString(tmp, body)
    io.atomicReplace(tmp, dir.resolve(REFS))
  }

  private def writeTags(dir: Path, tags: Map[String, Long]): Unit =
    writeRefs(dir, tags, listStaged(dir), listBranches(dir))

  /** Register/unregister a staged version — callers hold the commit lock. */
  private def setStaged(dir: Path, v: Long, on: Boolean): Unit = {
    val cur = listStaged(dir)
    writeRefs(dir, listTags(dir), if (on) cur + v else cur - v,
      listBranches(dir))
  }

  /** Create branch `name` forking from `fromVersion` (which must exist;
    * main's current commit is the usual fork point). The branch head
    * starts at the fork, and `base` records it as the divergence
    * witness for [[publishBranch]]. Names share the tag grammar and
    * must not collide with tags (one `FOR VERSION AS OF`-style
    * namespace, like Iceberg refs). */
  def createBranch(dir: String, name: String, fromVersion: Long): Unit = {
    val d = Paths.get(dir)
    require(name.matches("[A-Za-z0-9_.-]+"),
      s"graft-commit: branch name '$name' must match [A-Za-z0-9_.-]+")
    require(io.exists(d.resolve(versionFile(fromVersion))),
      s"graft-commit: cannot branch from version $fromVersion at $dir — no " +
        s"such version (have: ${listVersions(d).mkString(", ")})")
    lockFor(d).synchronized {
      val branches = listBranches(d)
      require(!branches.contains(name) && !listTags(d).contains(name),
        s"graft-commit: ref '$name' already exists at $dir — branch and " +
          "tag names share one namespace and never silently move")
      writeRefs(d, listTags(d), listStaged(d),
        branches + (name -> (fromVersion, fromVersion)))
    }
  }

  /** The branch's current head version; loud on an unknown name. */
  private[graft] def branchHead(dir: Path, name: String): Long =
    listBranches(dir).getOrElse(name, sys.error(
      s"graft-commit: no branch '$name' at $dir (have: " +
        s"${listBranches(dir).keys.toSeq.sorted.mkString(", ")})"))._1

  /** Advance branch `name` head `from → to` — the branch commit's CAS,
    * called by [[writeManifest]] under the commit lock after the new
    * version file landed. */
  private def advanceBranch(dir: Path, name: String, from: Long, to: Long): Unit = {
    val branches = listBranches(dir)
    val (head, base) = branches.getOrElse(name, sys.error(
      s"graft-commit: no branch '$name' at $dir"))
    if (head != from) throw new ConcurrentCommitException(
      s"graft-commit: concurrent writer on branch '$name' at $dir — head is " +
        s"$head but this writer planned on top of $from")
    writeRefs(dir, listTags(dir), listStaged(dir),
      branches + (name -> (to, base)))
  }

  /** Drop branch `name`: its head stops being a retention root (versions
    * only it pinned become expirable — the data files stay until
    * [[expireVersions]] reclaims them). */
  def dropBranch(dir: String, name: String): Boolean = {
    val d = Paths.get(dir)
    lockFor(d).synchronized {
      val branches = listBranches(d)
      if (!branches.contains(name)) false
      else {
        writeRefs(d, listTags(d), listStaged(d), branches - name)
        true
      }
    }
  }

  /** PUBLISH a branch: re-land the branch head's CONTENT as main's next
    * contiguous commit. Fast-forward ONLY: refuses when main moved past
    * the branch's base — a commit landed on main after the fork, so the
    * branch's content was planned against a stale snapshot and a forced
    * publish would silently drop the concurrent commit's files (the
    * truncate bug in ref clothing). Recovery is re-branching from the
    * new main and replaying, never a force.
    *
    * The publish is a real [[writeManifest]] commit (not a raw swap):
    * main's ledger stays contiguous from 0 — the change feed's
    * per-commit walk and the changelog's `v <= current` admission never
    * meet a high-range branch id — and the branch-landed files' add
    * sequences are rewritten to the PUBLISH commit (they join main's
    * eq-delete ordering here; their branch-range seqs would otherwise
    * sit above every future upsert and never be covered). The branch
    * stays, re-based at the published main commit; its old high-range
    * versions become ordinary expirable history. */
  def publishBranch(dir: String, name: String): Unit = {
    val d = Paths.get(dir)
    lockFor(d).synchronized {
      val branches = listBranches(d)
      val (head, base) = branches.getOrElse(name, sys.error(
        s"graft-commit: no branch '$name' at $dir (have: " +
          s"${branches.keys.toSeq.sorted.mkString(", ")})"))
      val cur = currentCommit(d)
      if (cur != base) throw new ConcurrentCommitException(
        s"graft-commit: cannot fast-forward $dir to branch '$name' (head " +
          s"$head) — main is at $cur but the branch forked from $base; a " +
          "commit landed on main after the fork. Re-branch from the new " +
          "main and replay (a forced publish would drop main's commit)")
      val published =
        if (head == base) head // an unadvanced branch publishes as a no-op
        else {
          val bm = parseManifestVersion(d, head)
          writeManifest(d, bm.ddl, bm.files, cur + 1, bm.epochs,
            expectedPrev = cur, partCol = bm.partCol, stats = bm.stats,
            tableId = bm.tableId, payload = bm.payload, deletes = bm.deletes,
            fileSeq = bm.fileSeq.map { case (f, s) =>
              f -> (if (s >= BRANCH_BASE) cur + 1 else s) },
            eqDeletes = bm.eqDeletes, blooms = bm.blooms)
          cur + 1
        }
      writeRefs(d, listTags(d), listStaged(d),
        listBranches(d) + (name -> (published, published)))
    }
  }

  /** Create tag `name` → `version`. The version must exist (committed or
    * staged); duplicate names refuse — a tag never silently moves. */
  def createTag(dir: String, name: String, version: Long): Unit = {
    val d = Paths.get(dir)
    require(name.matches("[A-Za-z0-9_.-]+"),
      s"graft-commit: tag name '$name' must match [A-Za-z0-9_.-]+")
    require(io.exists(d.resolve(versionFile(version))),
      s"graft-commit: cannot tag version $version at $dir — no such version " +
        s"(have: ${listVersions(d).mkString(", ")})")
    lockFor(d).synchronized {
      val tags = listTags(d)
      require(!tags.contains(name),
        s"graft-commit: tag '$name' already exists (→ ${tags(name)}); " +
          "drop it first — tags never silently move")
      // tags and branches share one namespace (o44): VERSION AS OF
      // resolves either by name, so a collision would be ambiguous
      require(!listBranches(d).contains(name),
        s"graft-commit: '$name' is a BRANCH at $dir — tag and branch " +
          "names share one namespace")
      writeTags(d, tags + (name -> version))
    }
  }

  /** Drop tag `name` (its version becomes expirable again). */
  def dropTag(dir: String, name: String): Boolean = {
    val d = Paths.get(dir)
    lockFor(d).synchronized {
      val tags = listTags(d)
      if (!tags.contains(name)) false
      else { writeTags(d, tags - name); true }
    }
  }

  /** Resolve a tag to its version; loud on an unknown name. */
  private[graft] def tagVersion(dir: Path, name: String): Long =
    listTags(dir).getOrElse(name, sys.error(
      s"graft-commit: no tag '$name' at $dir (have: " +
        s"${listTags(dir).keys.toSeq.sorted.mkString(", ")})"))

  /** PUBLISH a staged version (o41, Iceberg's write-audit-publish
    * fast-forward): a write landed with `option("stageOnly", true)` is
    * a full immutable version manifest that main never pointed at —
    * auditors read it via `versionAsOf` (or a tag), and this swap makes
    * it current. Fast-forward ONLY: the staged commit was planned on
    * top of `version - 1`, so main must still be there — if another
    * commit landed meanwhile the publish refuses (re-stage on the new
    * main; cherry-picking a stale audit would silently drop the
    * concurrent commit's files, the exact truncate bug the CAS
    * architecture exists to prevent). */
  def publishStaged(dir: String, version: Long): Unit = {
    val d = Paths.get(dir)
    lockFor(d).synchronized {
      require(io.exists(d.resolve(versionFile(version))),
        s"graft-commit: no staged version $version at $dir (have: " +
          s"${listVersions(d).mkString(", ")})")
      val cur = currentCommit(d)
      require(cur < version,
        s"graft-commit: version $version is already published at $dir (current: $cur)")
      if (cur != version - 1) throw new ConcurrentCommitException(
        s"graft-commit: cannot fast-forward $dir to staged version $version — " +
          s"main is at $cur, not ${version - 1}; a commit landed after the " +
          "stage. Re-stage against the new main (audited content may be stale)")
      val body = io.readString(d.resolve(versionFile(version)))
      val tmp = d.resolve(MANIFEST + ".tmp")
      io.writeString(tmp, body)
      io.atomicReplace(tmp, d.resolve(MANIFEST))
      setStaged(d, version, on = false) // the stage is now ordinary history
    }
  }

  /** Abandon a staged (never-published) version: delete its manifest and
    * every file ONLY it references — the audit-failed cleanup. */
  def dropStagedVersion(dir: String, version: Long): Seq[String] = {
    val d = Paths.get(dir)
    lockFor(d).synchronized {
      require(version > currentCommit(d),
        s"graft-commit: version $version at $dir is published — use " +
          "expireVersions for committed history")
      require(io.exists(d.resolve(versionFile(version))),
        s"graft-commit: no staged version $version at $dir")
      val dead = manifestRefs(parseManifestVersion(d, version)).toSet
      io.deleteIfExists(d.resolve(versionFile(version)))
      val live = listVersions(d).flatMap(v =>
        manifestRefs(parseManifestVersion(d, v))).toSet ++
        parseManifest(d).toSeq.flatMap(manifestRefs)
      val removed = dead.filterNot(live.contains).toSeq.sorted
      removed.foreach(n => io.deleteIfExists(d.resolve(n)))
      setStaged(d, version, on = false)
      removed
    }
  }

  /** Orphan-file cleanup — the second half of the GC pair (Iceberg's
    * removeOrphanFiles): delete data files referenced by NO manifest
    * (current or any retained version) whose last modification is older
    * than `graceMs`. The grace window is the writer-safety device: a
    * concurrent append promotes its files to final names BEFORE its
    * manifest CAS, so a too-eager orphan sweep would delete an in-flight
    * writer's output — any grace comfortably above a commit's
    * promote-to-swap window (default 1h, Iceberg defaults to 3 DAYS) is
    * safe. Returns the deleted file names. */
  def removeOrphanFiles(dir: String, graceMs: Long = 3600L * 1000): Seq[String] = {
    val d = Paths.get(dir)
    val live: Set[String] =
      listVersions(d).flatMap(v => manifestRefs(parseManifestVersion(d, v))).toSet ++
        parseManifest(d).toSeq.flatMap(manifestRefs)
    val cutoff = System.currentTimeMillis() - graceMs
    val removed = listDataFiles(d)
      .filterNot(live.contains)
      .filter(n => CommitSink.io.lastModifiedMs(d.resolve(n)) < cutoff)
      .sorted
    removed.foreach(n => CommitSink.io.deleteIfExists(d.resolve(n)))
    removed
  }

  /** Every on-disk name a manifest keeps alive: its data files plus
    * their deletion vectors — GC liveness must protect both (an expired
    * DV under a live version would silently RESURRECT its deleted
    * rows). */
  private[graft] def manifestRefs(m: Manifest): Seq[String] =
    // ALL vector entries, including full-cover tombstones whose data
    // file was dropped (the change feed reads them against the PREVIOUS
    // version's data file — alive exactly as long as both versions are)
    m.files ++ m.deletes.values.map(_.dv).toSeq ++
      m.eqDeletes.map(_.file) ++ // key files are as live as the vectors (o32)
      m.blooms.values.flatMap(_.values) ++ // bloom sidecars too (o38)
      m.groups.map(_.name) // group manifests live exactly as long as their version (r16)

  /** Committed-style data files (`part-*`, deletion vectors included —
    * their names share the prefix) currently on disk — shared by the
    * truncate sweep and snapshot expiry, the two places that decide
    * deletions (one lister, two liveness rules kept explicitly local). */
  private[sources] def listDataFiles(dir: Path): Seq[String] =
    io.list(dir).filter(_.startsWith("part-"))

  /** Time-travel read (o17): the table as of commit `version`, from its
    * immutable version manifest. */
  def readCommittedVersion(spark: SparkSession, dir: String, version: Long): DataFrame =
    readManifestFiles(spark, dir, parseManifestVersion(Paths.get(dir), version))

  /** One fully-parsed manifest: the (commit, ddl, files, epochs, partcol,
    * per-file stats) view a commit or scan needs, read and regex-parsed
    * ONCE (the per-field helpers below each re-read the file; a commit
    * that called all of them did five reads whose non-atomicity also
    * widened the concurrent-writer window the CAS closes). `stats` keeps
    * the ENCODED per-file strings — commits carry them forward verbatim,
    * only the scan decodes. */
  private[graft] case class Manifest(commit: Long, ddl: String,
                                       files: Seq[String], epochs: Seq[Long],
                                       partCol: Option[String] = None,
                                       stats: Map[String, String] = Map.empty,
                                       /** Table GENERATION identity, minted at
                                         * the first commit to a fresh target
                                         * and carried by every later commit:
                                         * what lets a changelog stream detect
                                         * "dropped and re-created under my
                                         * checkpoint" instead of silently
                                         * skipping the new generation's rows
                                         * (Delta's reservoir id). */
                                       tableId: String = "",
                                       /** Staged-file payload format of every
                                         * file this manifest lists: "parquet"
                                         * (the at-scale default —
                                         * [[ParquetPayload]]) or "json" (the
                                         * original fixture-portable lines
                                         * format). Homogeneous per content
                                         * lineage: appends and rewrites carry
                                         * it, only a truncate may switch.
                                         * Absent in pre-payload manifests ⇒
                                         * json (what they were written as). */
                                       payload: String = "json",
                                       /** Merge-on-read DELETEs (o27): data
                                         * file → its deletion vector. A
                                         * listed file's rows at positions in
                                         * the vector are DELETED — every
                                         * read path applies the vector, every
                                         * rewrite of the file drops it (the
                                         * rewrite's scan already applied it).
                                         * Absent ⇒ no deletes, and always
                                         * absent for json-payload tables
                                         * (MOR requires the parquet payload's
                                         * stable row positions). */
                                       deletes: Map[String, DvEntry] = Map.empty,
                                       /** Per-file ADD sequence (o32):
                                         * the commit id at which each
                                         * listed file joined the table.
                                         * Absent ⇒ 0 (legacy files).
                                         * Only consulted by equality-
                                         * delete applicability — an
                                         * [[EqDelete]] covers file f iff
                                         * fileSeq(f) < its seq. */
                                       fileSeq: Map[String, Long] = Map.empty,
                                       /** Equality deletes (o32), newest
                                         * last. Dropped automatically
                                         * when no listed file is still
                                         * covered (see writeManifest). */
                                       eqDeletes: Seq[EqDelete] = Seq.empty,
                                       /** Bloom file index (o38): data
                                         * file → column → bloom sidecar
                                         * name. Built by
                                         * [[buildBloomIndex]]; lets an
                                         * equality/IN predicate prune
                                         * files zone ranges cannot (a
                                         * hash-scattered high-cardinality
                                         * column). Over-approximating by
                                         * construction — a missing entry
                                         * or un-indexed file never
                                         * prunes. Dies with its file on
                                         * rewrite (writeManifest filters
                                         * to listed files). */
                                       blooms: Map[String, Map[String, String]] =
                                         Map.empty,
                                       /** TWO-LEVEL manifest (r16,
                                         * Iceberg's manifest-list): when
                                         * a version lists more files
                                         * than the group size, per-file
                                         * entries live in per-GROUP
                                         * manifest files and the root
                                         * carries only these refs, each
                                         * with a zone-range SUMMARY —
                                         * planning prunes whole groups
                                         * before parsing one per-file
                                         * entry. Non-empty `groups`
                                         * with EMPTY `files` = an
                                         * unresolved root (resolve via
                                         * [[resolveGroups]]); resolved
                                         * manifests keep the refs for
                                         * GC liveness. */
                                       groups: Seq[GroupRef] = Seq.empty) {
    /** The recorded add-sequence of a listed file (0 = legacy/unknown). */
    def seqOf(f: String): Long = fileSeq.getOrElse(f, 0L)
    /** Equality deletes covering file `f`: strictly newer than its add. */
    def eqFor(f: String): Seq[EqDelete] = eqDeletes.filter(_.seq > seqOf(f))
    /** True for a two-level root whose per-file entries are not loaded. */
    def unresolvedRoot: Boolean = groups.nonEmpty && files.isEmpty
  }

  /** One group-manifest reference in a two-level root: the group file's
    * name, its file count, and a [[FileStat]]-encoded SUMMARY (summed
    * rows/bytes; per-column UNION ranges recorded only when EVERY file
    * in the group records the column — the same "no range ⇒ never
    * prune" conservatism as file-level skipping, lifted a level). */
  private[graft] case class GroupRef(name: String, nFiles: Int, stat: String)

  private[sources] def parseManifestText(txt: String, where: String): Manifest = {
    val commit = "\"commit\":(-?[0-9]+)".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(-1L)
    val ddl = "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(txt)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse(sys.error(s"graft-commit: manifest missing schema: $where"))
    val files = "\"files\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    val epochs = "\"epochs\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    val partCol = "\"partcol\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
    val tableId = "\"tableid\":\"([^\"]*)\"".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
    val payload = "\"payload\":\"([a-z]+)\"".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("json")
    val stats = "\"filestats\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val bar = e.indexOf('|')
        e.substring(0, bar) -> e.substring(bar + 1)
      }.toMap
    val deletes = "\"deletevectors\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val p = e.split("\\|")
        p(0) -> DvEntry(p(1), p(2).toLong)
      }.toMap
    val fileSeq = "\"fileseq\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val bar = e.lastIndexOf('|')
        e.substring(0, bar) -> e.substring(bar + 1).toLong
      }.toMap
    val eqDeletes = "\"eqdeletes\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val p = e.split("\\|")
        EqDelete(p(0), p(1).toLong, p(2).toLong, p(3))
      }.toSeq
    val blooms = "\"blooms\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val p = e.split("\\|")
        (p(0), p(1), p(2))
      }.groupBy(_._1).map { case (f, es) =>
        f -> es.map(e => e._2 -> e._3).toMap
      }
    val groups = "\"groups\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      .map { e =>
        val a = e.indexOf('|'); val b = e.indexOf('|', a + 1)
        GroupRef(e.substring(0, a), e.substring(a + 1, b).toInt, e.substring(b + 1))
      }.toSeq
    Manifest(commit, ddl, files, epochs, partCol, stats, tableId, payload,
      deletes, fileSeq, eqDeletes, blooms, groups)
  }

  /** Resolve a two-level root's per-file entries — all groups, or the
    * subset `keep` admits (the manifest-list PRUNE: a group whose
    * summary ranges provably cannot match the pushed conjunction is
    * never even PARSED — planning work scales with matching groups,
    * not total files). A resolved (or single-level) manifest passes
    * through untouched. */
  private[graft] def resolveGroups(dir: Path, root: Manifest,
      keep: GroupRef => Boolean = _ => true): Manifest = {
    if (!root.unresolvedRoot) return root
    val kept = root.groups.filter(keep)
    val files = Vector.newBuilder[String]
    val stats = Map.newBuilder[String, String]
    val deletes = Map.newBuilder[String, DvEntry]
    val fileSeq = Map.newBuilder[String, Long]
    val blooms = scala.collection.mutable.Map.empty[String, Map[String, String]]
    kept.foreach { g =>
      val txt = io.readString(dir.resolve(g.name))
      def arr(key: String): Seq[String] =
        (s""""$key":\\[([^\\]]*)\\]""").r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
      files ++= arr("files")
      stats ++= arr("filestats").map { e =>
        val bar = e.indexOf('|')
        e.substring(0, bar) -> e.substring(bar + 1)
      }
      deletes ++= arr("deletevectors").map { e =>
        val p = e.split("\\|"); p(0) -> DvEntry(p(1), p(2).toLong)
      }
      fileSeq ++= arr("fileseq").map { e =>
        val bar = e.lastIndexOf('|')
        e.substring(0, bar) -> e.substring(bar + 1).toLong
      }
      arr("blooms").map { e =>
        val p = e.split("\\|"); (p(0), p(1), p(2))
      }.groupBy(_._1).foreach { case (f, es) =>
        blooms(f) = blooms.getOrElse(f, Map.empty) ++
          es.map(e => e._2 -> e._3).toMap
      }
    }
    root.copy(files = files.result(), stats = stats.result(),
      // root-level tombstone vectors (files long dropped) stay alongside
      // the groups' per-file entries
      deletes = root.deletes ++ deletes.result(),
      fileSeq = fileSeq.result(), blooms = blooms.toMap)
  }

  /** Root-only parse: for a two-level manifest, header fields + group
    * refs without loading one per-file entry (the planner's entry
    * point); identical to [[parseManifest]] on single-level tables. */
  private[graft] def parseManifestRoot(dir: Path): Option[Manifest] = {
    val mf = dir.resolve(MANIFEST)
    if (!CommitSink.io.exists(mf)) None
    else Some(parseManifestText(CommitSink.io.readString(mf), mf.toString))
  }

  private[graft] def parseManifest(dir: Path): Option[Manifest] =
    parseManifestRoot(dir).map(resolveGroups(dir, _))

  /** The immutable manifest of a PAST version (time travel, o17). Fails
    * loudly on a version that never committed. */
  private[graft] def parseManifestVersion(dir: Path, version: Long): Manifest = {
    val mf = dir.resolve(versionFile(version))
    require(CommitSink.io.exists(mf),
      s"graft-commit: no version $version at $dir (have: " +
        listVersions(dir).mkString(", ") + ")")
    resolveGroups(dir,
      parseManifestText(CommitSink.io.readString(mf), mf.toString))
  }

  private[graft] def listVersions(dir: Path): Seq[Long] =
    if (!io.isDirectory(dir)) Seq.empty
    else io.list(dir)
      .flatMap(n => "_MANIFEST-v(-?[0-9]+)\\.json".r
        .findFirstMatchIn(n).map(_.group(1).toLong))
      .sorted

  /** Branch commits live in a DISJOINT id range (o44): main's lineage
    * stays contiguous from 0 (what the change feed's per-commit walk,
    * the changelog's admission filter `v <= current`, and
    * [[publishStaged]]'s `version - 1` fast-forward all rely on), while
    * branch versions take ids ≥ 1e9 — main's `prev + 1` can never
    * collide with a branch's version file. Publish re-lands the branch
    * head AS a main commit (see [[publishBranch]]), so the main ledger
    * never contains a high-range id. */
  private[graft] val BRANCH_BASE = 1000000000L

  /** The next unused id in the branch range. */
  private[sources] def nextBranchVersionId(dir: Path): Long =
    ((listVersions(dir).filter(_ >= BRANCH_BASE) :+ (BRANCH_BASE - 1)) ++
      listBranches(dir).values.map(_._1).filter(_ >= BRANCH_BASE)).max + 1

  /** Column-wise schema equivalence for the append guard: names + types,
    * ignoring nullability and metadata — a nullable `id BIGINT` appends
    * fine onto files written as non-null `id BIGINT NOT NULL` (the JSON
    * payload is identical), so comparing raw DDL strings would refuse
    * valid appends. */
  private[sources] def sameColumns(a: String, b: String): Boolean = {
    def cols(d: String) =
      StructType.fromDDL(d).fields.map(f => (f.name, f.dataType)).toSeq
    cols(a) == cols(b)
  }

  /** (schema DDL, relative file names) of a manifest. Hand-rolled parse
    * of our own hand-rolled format — both sides live in this file. */
  private[graft] def readManifest(mf: Path): (String, Seq[String]) = {
    val txt = CommitSink.io.readString(mf)
    val ddl = "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(txt)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse(sys.error(s"graft-commit: manifest missing schema: $mf"))
    val files = "\"files\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    (ddl, files)
  }

  /** Write-and-swap the manifest under the per-path commit lock: the
    * swap is atomic for READERS, and the `expectedPrev` CAS makes
    * concurrent WRITERS safe — a writer whose planning read is stale
    * fails with [[ConcurrentCommitException]] instead of silently
    * dropping the interleaved commit's files. Appends RETRY on that
    * failure (re-read, re-carry, re-swap — see CommitBatchWrite);
    * truncates and group rewrites propagate it, because their content
    * was computed against the invalidated snapshot and the statement
    * must re-run. `expectedPrev` is the commit id of the manifest the
    * caller based its read-modify on: the PLANNING manifest for
    * rewrites, the fresh commit-time read for appends/truncates. Pass
    * the sentinel [[SKIP_CAS]] only from fixture/test code that owns
    * the path exclusively. */
  private[graft] val SKIP_CAS: Long = Long.MinValue

  private[graft] def writeManifest(dir: Path, ddl: String, files: Seq[String],
                                     commitId: Long,
                                     epochs: Seq[Long] = Seq.empty,
                                     expectedPrev: Long = SKIP_CAS,
                                     partCol: Option[String] = None,
                                     stats: Map[String, String] = Map.empty,
                                     tableId: String = "",
                                     payload: String = "json",
                                     deletes: Map[String, DvEntry] = Map.empty,
                                     fileSeq: Map[String, Long] = Map.empty,
                                     eqDeletes: Seq[EqDelete] = Seq.empty,
                                     /** Full-cover TOMBSTONES (o33): a
                                       * vector that covers EVERY row of
                                       * its file drops the file, and the
                                       * vector entry lands here instead
                                       * — listed under deletevectors
                                       * without its file, so the change
                                       * feed can emit the drop as
                                       * delete rows instead of refusing.
                                       * Invisible to every reader (they
                                       * look vectors up BY listed file)
                                       * and dies at the next commit
                                       * (callers never carry it). */
                                     tombstones: Map[String, DvEntry] = Map.empty,
                                     /** Bloom file index (o38): carried
                                       * by content-preserving commits,
                                       * auto-filtered to listed files so
                                       * a rewritten file's blooms die
                                       * with it. */
                                     blooms: Map[String, Map[String, String]] =
                                       Map.empty,
                                     /** WRITE-AUDIT-PUBLISH staging
                                       * (o41, Iceberg's WAP): land the
                                       * immutable version manifest but
                                       * do NOT swap `_MANIFEST.json` —
                                       * main readers are unaffected
                                       * until [[publishStaged]]
                                       * fast-forwards to it. The staged
                                       * version is auditable via the
                                       * ordinary versionAsOf read. */
                                     stageOnly: Boolean = false,
                                     /** BRANCH commit (o44): CAS against
                                       * the branch head instead of main,
                                       * land the version file, advance
                                       * the branch pointer — main's
                                       * `_MANIFEST.json` is untouched. */
                                     branch: Option[String] = None): Unit =
    lockFor(dir).synchronized {
      require(branch.isEmpty || !stageOnly,
        "graft-commit: a write cannot target a branch AND stage (WAP " +
          "stages are main-lineage audit copies; branches have their own)")
      // check + swap under the per-path lock: two same-JVM writers can
      // never both pass the check (the object-store analog is a
      // conditional put on the manifest key)
      if (expectedPrev != SKIP_CAS && branch.isEmpty) {
        val cur = currentCommit(dir)
        if (cur != expectedPrev) throw new ConcurrentCommitException(
          s"graft-commit: concurrent writer detected at $dir — manifest is at " +
            s"commit $cur but this writer planned commit $commitId on top of " +
            s"$expectedPrev; aborting instead of silently dropping its files")
      }
      branch.foreach { b =>
        // branch CAS half 1: the head must still be the planning head
        // (advanceBranch re-checks before the pointer moves — half 2)
        val head = branchHead(dir, b)
        if (expectedPrev != SKIP_CAS && head != expectedPrev)
          throw new ConcurrentCommitException(
            s"graft-commit: concurrent writer on branch '$b' at $dir — head " +
              s"is $head but this writer planned commit $commitId on top of " +
              s"$expectedPrev")
        // version ids are GLOBAL across main/stages/branches: the
        // version-file existence check is the id CAS (same as stageOnly)
        if (io.exists(dir.resolve(versionFile(commitId))))
          throw new ConcurrentCommitException(
            s"graft-commit: version $commitId already exists at $dir — a " +
              s"concurrent writer landed it first (branch '$b' commit)")
      }
      // two staged writers compute the same next id and neither swaps —
      // the version-file existence check is their CAS
      if (stageOnly && io.exists(dir.resolve(versionFile(commitId))))
        throw new ConcurrentCommitException(
          s"graft-commit: staged version $commitId already exists at $dir — " +
            "a concurrent writer staged it first")
      // an OPEN STAGE holds its version id: an ordinary commit planning
      // the same id must refuse (publish or drop the stage first) —
      // silently overwriting the audit copy would be the truncate bug
      // in ref clothing. Registered staged ids only: unregistered
      // version-file debris from a crashed swap stays self-healing.
      if (!stageOnly && expectedPrev != SKIP_CAS &&
          listStaged(dir).contains(commitId))
        throw new ConcurrentCommitException(
          s"graft-commit: version $commitId at $dir is an OPEN STAGE " +
            "(write-audit-publish) — ordinary commits are held until the " +
            "audit pipeline decides. Recovery: publish it with " +
            s"CommitSink.publishStaged(\"$dir\", $commitId) or discard it " +
            s"with CommitSink.dropStagedVersion(\"$dir\", $commitId); a " +
            "crashed/forgotten audit run is the usual cause of seeing this " +
            "repeatedly")
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      // the four per-file entry arrays over one file slice: stats,
      // vectors (listed files only — a dropped/rewritten file's vector
      // must not survive it), non-zero add-sequences, bloom refs
      def entriesOf(fs: Seq[String]): (Seq[String], Seq[String], Seq[String], Seq[String]) = (
        fs.flatMap(f => stats.get(f).map(e => s""""$f|$e"""")),
        fs.flatMap(f => deletes.get(f).map(e => s""""$f|${e.dv}|${e.ndel}"""")),
        fs.flatMap(f => fileSeq.get(f).filter(_ != 0L).map(s => s""""$f|$s"""")),
        fs.flatMap(f => blooms.get(f).toSeq.flatMap(_.toSeq.sortBy(_._1)
          .map { case (c, b) => s""""$f|$c|$b"""" })))
      val sortedFiles = files.sorted
      // full-cover tombstones (o33) always live at the ROOT (their data
      // files are not listed anywhere)
      val tombBody = tombstones.toSeq.sortBy(_._1)
        .filterNot(t => files.contains(t._1))
        .map { case (f, e) => s""""$f|${e.dv}|${e.ndel}"""" }
      // an equality delete survives only while it still COVERS some
      // listed file (seq(f) < its seq) — a rewrite/compaction that
      // replaced every covered file (its scan applied the delete)
      // retires the entry here, centrally, so no caller can leak a
      // dead key file into eternity. Table-level: root, both layouts.
      val liveEq = eqDeletes.filter(e =>
        files.exists(f => fileSeq.getOrElse(f, 0L) < e.seq))
      val eqBody = liveEq.sortBy(e => (e.seq, e.file))
        .map(e => s""""${e.file}|${e.seq}|${e.nkeys}|${e.cols}"""")
      def header: String =
        s"""{"commit":$commitId,"epochs":[${epochs.sorted.mkString(",")}],""" +
          s""""payload":"$payload",""" +
          (if (tableId.nonEmpty) s""""tableid":"${esc(tableId)}",""" else "") +
          partCol.map(c => s""""partcol":"${esc(c)}",""").getOrElse("")
      val groupSize = Integer.getInteger("graft.manifest.group.size", 4096).intValue
      require(groupSize >= 1, s"graft.manifest.group.size must be >= 1, got $groupSize")
      val writtenGroups = scala.collection.mutable.ArrayBuffer.empty[String]
      // group files are written DURING body construction (the refs map),
      // so an I/O failure midway (disk full, permission flip) must sweep
      // the ones already landed here, in the same scope — they are named
      // _MANIFEST-g* (removeOrphanFiles only sweeps part-*) and no
      // version references them, so nothing else would ever reclaim them
      val body = try { if (sortedFiles.size <= groupSize) {
        // SINGLE-LEVEL: per-file entries inline (small tables — the
        // overwhelmingly common case, byte-identical to the r15 format)
        val (statsBody, dvFiles, seqBody, bloomBody) = entriesOf(sortedFiles)
        val dvBody = dvFiles ++ tombBody
        header +
          (if (dvBody.nonEmpty) s""""deletevectors":[${dvBody.mkString(",")}],""" else "") +
          (if (seqBody.nonEmpty) s""""fileseq":[${seqBody.mkString(",")}],""" else "") +
          (if (eqBody.nonEmpty) s""""eqdeletes":[${eqBody.mkString(",")}],""" else "") +
          (if (bloomBody.nonEmpty) s""""blooms":[${bloomBody.mkString(",")}],""" else "") +
          s""""schema":"${esc(ddl)}",""" +
          s""""files":[${sortedFiles.map("\"" + _ + "\"").mkString(",")}],""" +
          s""""filestats":[${statsBody.mkString(",")}]}"""
      } else {
        // TWO-LEVEL (r16, Iceberg's manifest-list): per-file entries land
        // in per-group manifest files; the root lists each group ONCE
        // with a zone-range summary, so a selective scan's planning
        // parses only the groups its predicate cannot rule out. Group
        // files are immutable and commit-scoped (name carries the commit
        // id + a write nonce) — they live and die with their version.
        val nonce = writeNonce()
        val refs = sortedFiles.grouped(groupSize).zipWithIndex.map { case (gf, i) =>
          val name = f"_MANIFEST-g$commitId%05d-$nonce-$i%05d.json"
          val (sB, dB, qB, bB) = entriesOf(gf)
          io.writeString(dir.resolve(name),
            s"""{"files":[${gf.map("\"" + _ + "\"").mkString(",")}],""" +
              s""""filestats":[${sB.mkString(",")}],""" +
              s""""deletevectors":[${dB.mkString(",")}],""" +
              s""""fileseq":[${qB.mkString(",")}],""" +
              s""""blooms":[${bB.mkString(",")}]}""")
          writtenGroups += name
          // summary stat: summed rows/bytes, per-column UNION ranges only
          // for columns EVERY file in the group records (else the column
          // is omitted and the group never prunes on it)
          val decoded = gf.map(f => stats.get(f).map(FileStat.decode))
          val gStat =
            if (decoded.exists(_.isEmpty)) FileStat(0L, 0L, None, Map.empty)
            else {
              val ds = decoded.flatten
              val common = ds.map(_.cols.keySet).reduce(_ intersect _)
              val cols = common.flatMap { c =>
                val rs = ds.map(_.cols(c))
                rs.map(_.kind).distinct match {
                  case Seq('l') => Some(c -> ColRange('l',
                    rs.map(_.min.toLong).min.toString,
                    rs.map(_.max.toLong).max.toString))
                  case Seq('d') => Some(c -> ColRange('d',
                    rs.map(_.min.toDouble).min.toString,
                    rs.map(_.max.toDouble).max.toString))
                  case _ => None
                }
              }.toMap
              // o45: the group's partition-key span (when every file has
              // one) — what key-projected predicates prune groups by
              val pks = ds.flatMap(_.pk)
              val colsPk = if (pks.size == ds.size && pks.nonEmpty)
                cols + (GROUP_PK -> ColRange('l',
                  pks.min.toString, pks.max.toString))
              else cols
              FileStat(ds.map(_.rows).sum, ds.map(_.bytes).sum, None, colsPk)
            }
          s""""$name|${gf.size}|${gStat.encode}""""
        }.toSeq
        header +
          (if (tombBody.nonEmpty) s""""deletevectors":[${tombBody.mkString(",")}],""" else "") +
          (if (eqBody.nonEmpty) s""""eqdeletes":[${eqBody.mkString(",")}],""" else "") +
          s""""groups":[${refs.mkString(",")}],""" +
          s""""schema":"${esc(ddl)}",""" +
          s""""files":[],"filestats":[]}"""
      } } catch { case e: Throwable =>
        writtenGroups.foreach(n => io.deleteIfExists(dir.resolve(n)))
        throw e
      }
      // the immutable per-version copy lands BEFORE the swap: any manifest a
      // reader can see as current always has its time-travel twin (a crash
      // between the two writes loses only the never-visible new version)
      try {
        io.writeString(dir.resolve(versionFile(commitId)), body)
        // staged (o41): the version is auditable but not current — no
        // swap; register the open stage so ordinary writers refuse its id
        if (stageOnly) setStaged(dir, commitId, on = true)
        // branch (o44): the version file IS the content; the commit is
        // the branch-pointer advance (its own CAS) — main never moves
        branch.foreach(b => advanceBranch(dir, b,
          if (expectedPrev == SKIP_CAS) branchHead(dir, b) else expectedPrev,
          commitId))
        if (!stageOnly && branch.isEmpty) {
          val tmp = dir.resolve(MANIFEST + ".tmp")
          io.writeString(tmp, body)
          // the atomic swap IS the commit: readers either see the old
          // manifest or the new one, never a torn state
          io.atomicReplace(tmp, dir.resolve(MANIFEST))
        }
      } catch { case e: Throwable =>
        // a failed swap must not leave a PHANTOM version: the commit never
        // became current, its data files will be deleted by the caller's
        // failure handler, and listVersions/time travel must not expose a
        // version whose files are gone. Safe to delete: the CAS above
        // proves no successful commit ever used this id. Group manifests
        // written for this never-visible version go with it.
        io.deleteIfExists(dir.resolve(versionFile(commitId)))
        writtenGroups.foreach(n => io.deleteIfExists(dir.resolve(n)))
        throw e
      }
    }

  private[sources] def currentCommit(dir: Path): Long = {
    val mf = dir.resolve(MANIFEST)
    if (!CommitSink.io.exists(mf))
      -1L
    else
      "\"commit\":(-?[0-9]+)".r.findFirstMatchIn(CommitSink.io.readString(mf))
        .map(_.group(1).toLong).getOrElse(-1L)
  }

  /** Streaming epochs already folded into the manifest — the idempotence
    * ledger a re-delivered micro-batch commit is checked against. */
  private[graft] def committedEpochs(dir: Path): Seq[Long] = {
    val mf = dir.resolve(MANIFEST)
    if (!CommitSink.io.exists(mf)) Seq.empty
    else "\"epochs\":\\[([^\\]]*)\\]".r.findFirstMatchIn(CommitSink.io.readString(mf))
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
  }

  /** The table's generation id: carried from the existing manifest, or
    * minted at the generation's FIRST commit. */
  private[sources] def carriedOrFreshTableId(manifest: Option[Manifest]): String =
    manifest.map(_.tableId).filter(_.nonEmpty)
      .getOrElse(java.util.UUID.randomUUID().toString)

  /** Staging is WRITE-PRIVATE: each write (batch commit attempt or
    * streaming epoch) stages under `_staging/<nonce>/`, so a concurrent
    * writer's commit-time sweep can never delete another writer's
    * in-flight task files (two appenders to one path are now supported —
    * see the append CAS-retry). */
  private[sources] def stagingDir(dir: Path, sub: String): Path =
    dir.resolve(STAGING).resolve(sub)

  private[sources] def sweepStaging(dir: Path, sub: String): Unit = {
    val st = stagingDir(dir, sub)
    if (io.exists(st)) {
      io.list(st).foreach(n => io.deleteIfExists(st.resolve(n)))
      io.deleteIfExists(st)
    }
    // drop the shared parent too once the LAST writer's sweep empties it
    // (non-empty = another write is in flight: leave it, ignore the race)
    try io.deleteIfExists(dir.resolve(STAGING))
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
  }
}

/** File-skipping predicate evaluation over the manifest's per-file column
  * ranges (o14) — the zone-map device: a file whose recorded [min, max]
  * provably cannot satisfy the scan's pushed conjunction is never opened.
  * Pruning is ADVISORY ONLY: [[CommitScanBuilder.pushFilters]] returns
  * every filter as residual, so Spark re-evaluates the full condition
  * above the scan and a missed prune can only cost IO, never a wrong row.
  * Conservatism rules: a column with no recorded range never prunes; a
  * filter value whose numeric family differs from the recorded kind never
  * prunes (comparing longs as doubles rounds above 2^53 — at corpus scale
  * that rounding could mis-prune, so it is simply not trusted); NaN never
  * prunes (NaN is excluded from recorded ranges and has its own ordering
  * in SQL). */
private[graft] object CommitSkip {
  import org.apache.spark.sql.sources._
  import CommitSink.{ColRange, FileStat}

  /** Integral and fractional filter values, each kept in its own family.
    * Date/timestamp values translate to the writer's recorded
    * representation (days / micros — the InternalRow encoding the
    * parquet payload stores), so time-range predicates prune files: the
    * first filter every time-partitioned 100 TB scan pushes. */
  private def num(v: Any): Option[Either[Long, Double]] = v match {
    case l: Long   => Some(Left(l))
    case i: Int    => Some(Left(i.toLong))
    case s: Short  => Some(Left(s.toLong))
    case b: Byte   => Some(Left(b.toLong))
    case d: Double => if (d.isNaN) None else Some(Right(d))
    case f: Float  => if (f.isNaN) None else Some(Right(f.toDouble))
    case d: java.sql.Date =>
      Some(Left(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong))
    case d: java.time.LocalDate => Some(Left(d.toEpochDay))
    case t: java.sql.Timestamp =>
      Some(Left(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)))
    case i: java.time.Instant =>
      Some(Left(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)))
    case t: java.time.LocalDateTime =>
      Some(Left(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t)))
    case _ => None
  }

  /** Can this filter shape contribute to file skipping at all? String
    * equality/IN is usable since o38 — zone maps pass it through
    * (mayMatch's range check matches numeric kinds only), but the bloom
    * index prunes on it. */
  private def pointable(v: Any): Boolean =
    num(v).isDefined || v.isInstanceOf[String]
  def usable(f: Filter): Boolean = f match {
    case EqualTo(_, v)            => pointable(v)
    case GreaterThan(_, v)        => num(v).isDefined
    case GreaterThanOrEqual(_, v) => num(v).isDefined
    case LessThan(_, v)           => num(v).isDefined
    case LessThanOrEqual(_, v)    => num(v).isDefined
    case In(_, vs)                => vs.nonEmpty && vs.forall(pointable)
    case And(l, r)                => usable(l) && usable(r)
    case Or(l, r)                 => usable(l) && usable(r)
    case _ => false
  }

  /** True unless the file's ranges PROVE no row can match — every
    * unknown (missing stats, family mismatch) says "may match". */
  def mayMatch(f: Filter, st: FileStat): Boolean = {
    def check(col: String, v: Any)(p: (Long, Long, Long) => Boolean)(
        q: (Double, Double, Double) => Boolean): Boolean =
      (st.cols.get(col), num(v)) match {
        case (Some(ColRange('l', mn, mx)), Some(Left(x)))  => p(mn.toLong, mx.toLong, x)
        case (Some(ColRange('d', mn, mx)), Some(Right(x))) => q(mn.toDouble, mx.toDouble, x)
        case _ => true
      }
    f match {
      case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r)  => mayMatch(l, st) || mayMatch(r, st)
      case EqualTo(a, v) =>
        check(a, v)((mn, mx, x) => mn <= x && x <= mx)((mn, mx, x) => mn <= x && x <= mx)
      case GreaterThan(a, v)        => check(a, v)((_, mx, x) => mx > x)((_, mx, x) => mx > x)
      case GreaterThanOrEqual(a, v) => check(a, v)((_, mx, x) => mx >= x)((_, mx, x) => mx >= x)
      case LessThan(a, v)           => check(a, v)((mn, _, x) => mn < x)((mn, _, x) => mn < x)
      case LessThanOrEqual(a, v)    => check(a, v)((mn, _, x) => mn <= x)((mn, _, x) => mn <= x)
      case In(a, vs) => vs.exists(v =>
        check(a, v)((mn, mx, x) => mn <= x && x <= mx)((mn, mx, x) => mn <= x && x <= mx))
      case _ => true
    }
  }

  /** Bloom refinement of [[mayMatch]] (o38): the same conservative
    * recursion, but EQUALITY/IN tests go to the per-file bloom via
    * `lookup` instead of a range check. Only the two point-predicate
    * shapes consult the bloom — range predicates are the zone maps'
    * job, and everything else never prunes. */
  def mayMatchBloom(f: Filter, lookup: (String, Any) => Boolean): Boolean =
    f match {
      case And(l, r)     => mayMatchBloom(l, lookup) && mayMatchBloom(r, lookup)
      case Or(l, r)      => mayMatchBloom(l, lookup) || mayMatchBloom(r, lookup)
      case EqualTo(a, v) => lookup(a, v)
      case In(a, vs)     => vs.isEmpty || vs.exists(lookup(a, _))
      case _             => true
    }

  /** Membership test matching [[CommitSink.buildBloomIndex]]'s put side
    * exactly: integral values widen to putLong/mightContainLong, strings
    * hash as UTF-8; anything else never prunes. */
  def bloomMightContain(bf: org.apache.spark.util.sketch.BloomFilter,
                        v: Any): Boolean = v match {
    case l: Long   => bf.mightContainLong(l)
    case i: Int    => bf.mightContainLong(i.toLong)
    case s: Short  => bf.mightContainLong(s.toLong)
    case b: Byte   => bf.mightContainLong(b.toLong)
    case s: String => bf.mightContainString(s)
    case u: org.apache.spark.unsafe.types.UTF8String =>
      bf.mightContainString(u.toString)
    case _ => true
  }
}

/** Commit message: one staged file a task produced (phase 1 of the 2PC).
  * `stats` is the encoded [[CommitSink.FileStat]] collected during the
  * write (empty only from pre-stats senders — decoded consumers treat
  * empty as "no stats, never prune"). */
case class StagedFile(name: String, rows: Long, stats: String = "")
    extends WriterCommitMessage

/** Commit message of a PARTITIONED task: one staged file per partition-key
  * run the (cluster + sort)-distributed task wrote. */
case class StagedFileSet(files: Seq[StagedFile]) extends WriterCommitMessage

/** Commit message of an UPSERT task (o32): the ordinary staged-data
  * message plus the task's staged equality-delete key file (`eqName`
  * empty when the task saw no non-null keys). */
case class UpsertTaskResult(data: WriterCommitMessage, eqName: String,
                            nkeys: Long) extends WriterCommitMessage

class CommitSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = CommitSink.NAME
  // getTable receives the ORIGINAL-case properties map while inferSchema
  // gets a CaseInsensitiveStringMap — a case-insensitive lookup here keeps
  // the two consistent (Spark options are conventionally case-insensitive;
  // a case-sensitive get would silently read the CURRENT version while
  // inferSchema pinned the old schema)
  private def versionOf(options: util.Map[String, String]): Option[Long] =
    options.asScala.collectFirst {
      case (k, v) if k.equalsIgnoreCase("versionAsOf") => v.trim.toLong
    }.orElse(options.asScala.collectFirst {
      // o41: a TAG resolves to its pinned version — same read-only
      // semantics as versionAsOf, by name
      case (k, v) if k.equalsIgnoreCase("tagAsOf") =>
        val p = Option(options.asScala.collectFirst {
          case (pk, pv) if pk.equalsIgnoreCase("path") => pv }.orNull)
          .getOrElse(sys.error("graft-commit: tagAsOf needs a path"))
        CommitSink.tagVersion(Paths.get(p), v.trim)
    })
  private def cdfOf(options: util.Map[String, String]): Boolean =
    options.asScala.exists {
      case (k, v) => k.equalsIgnoreCase("readChangeFeed") && v.trim.toBoolean
    }
  // o43: metadata inspection tables — option("metaTable", "files" |
  // "history" | "manifests") turns the read into the manifest-granular
  // inventory surface (composes with versionAsOf/tagAsOf above)
  private def metaOf(options: util.Map[String, String]): Option[String] =
    options.asScala.collectFirst {
      case (k, v) if k.equalsIgnoreCase("metaTable") => v.trim.toLowerCase
    }
  // o44: branch binding — reads follow the head, batch writes advance it
  private def branchOf(options: util.Map[String, String]): Option[String] =
    options.asScala.collectFirst {
      case (k, v) if k.equalsIgnoreCase("branch") => v.trim
    }.filter(_.nonEmpty)
  // reads resolve against the committed manifest's schema (also what
  // `spark.read.format("graft-commit")` binds to); a never-written
  // target is empty — the write path accepts the incoming query's
  // schema regardless (ACCEPT_ANY_SCHEMA) and records it in the manifest
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    metaOf(options) match {
      case Some(kind) => CommitMeta.schemaOf(kind)
      case None => inferDataSchema(options)
    }
  private def inferDataSchema(options: CaseInsensitiveStringMap): StructType = {
    val base = Option(options.get("path"))
      .flatMap { p =>
        versionOf(options)
          .orElse(branchOf(options).map(b =>
            CommitSink.branchHead(Paths.get(p), b)))
          .map(v => Some(CommitSink.parseManifestVersion(Paths.get(p), v)))
          .getOrElse(CommitSink.parseManifest(Paths.get(p)))
      }
      .map(m => StructType.fromDDL(m.ddl))
      .getOrElse(new StructType())
    if (cdfOf(options)) CommitSink.cdfSchema(base) else base
  }
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(sys.error("graft-commit: option 'path' is required"))
    metaOf(properties) match {
      case Some(kind) =>
        // metaTable composes with versionAsOf/tagAsOf AND branch: the
        // inventory of a past version or of a branch head
        new CommitMetaTable(path, kind, version = versionOf(properties)
          .orElse(branchOf(properties).map(b =>
            CommitSink.branchHead(Paths.get(path), b))))
      case None =>
        val branch = branchOf(properties)
        require(branch.isEmpty || versionOf(properties).isEmpty,
          "graft-commit: branch and versionAsOf/tagAsOf are mutually " +
            "exclusive — a branch read already follows the branch head")
        new CommitSinkTable(path, version = versionOf(properties),
          changeFeed = cdfOf(properties), branch = branch)
    }
  }
}

class CommitSinkTable(path: String,
                      /** The PATH-based provider keeps ACCEPT_ANY_SCHEMA
                        * (a fresh target takes the incoming query's
                        * schema, the write-side commit enforces column
                        * compatibility on append). CATALOG-loaded tables
                        * drop it: their schema is the manifest's, and
                        * Spark refuses to align UPDATE/MERGE assignments
                        * against an any-schema table
                        * (skipSchemaResolution) — the capability would
                        * silently disable row-level SQL. */
                      acceptAnySchema: Boolean = true,
                      /** Time-travel pin (o17): when set, reads resolve
                        * against the immutable `_MANIFEST-v<n>.json` of
                        * that commit and every write/DML surface is
                        * withdrawn — a past version is a read-only fact. */
                      version: Option[Long] = None,
                      /** CHANGE DATA FEED mode (o29,
                        * `option("readChangeFeed", true)`): the table
                        * reads as its change rows (+ _change_type /
                        * _commit_version), batch and streaming; every
                        * write/DML surface is withdrawn. */
                      changeFeed: Boolean = false,
                      /** BRANCH binding (o44, `option("branch", n)`):
                        * reads resolve the branch HEAD (fresh per scan
                        * build — a branch is a live lineage, unlike a
                        * version pin) and batch writes advance it; DML,
                        * streaming, and the change feed stay
                        * main-lineage. */
                      branch: Option[String] = None) extends Table
    with SupportsWrite
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.{coalesce => fnCoalesce, col, lit, not}
  import org.apache.spark.sql.{sources => sf}

  override def name(): String =
    s"graft_commit($path${version.map(v => s"@v$v").getOrElse("")})"

  /** `_file` — the committed data file a row was read from (o21), the
    * Iceberg FILE_PATH device: lineage/debugging on its own, and the
    * attribute the row-level operation's RUNTIME GROUP FILTERING keys
    * on — a MERGE's matched _file set is bounded by the FILE count, so
    * the DPP In-filter stays manifest-sized where data-column keys
    * could be corpus-sized. Withdrawn when a (nonstandard) data column
    * already claims the name — data columns win. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = {
    if (changeFeed)
      return Array.empty // the feed's columns are real output, not metadata
    val names = schema().fieldNames
    val file: Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
      if (names.contains(CommitSink.FILE_COL)) Array.empty
      else Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = CommitSink.FILE_COL
        override def dataType(): DataType = StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "committed data file (manifest-relative name) this row was read from"
      })
    // `_pos` (o27): physical row position within `_file` — the row id
    // merge-on-read deletion vectors record. Withdrawn independently
    // when a data column claims the name, like `_file`.
    val pos: Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
      if (names.contains(CommitSink.POS_COL)) Array.empty
      else Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = CommitSink.POS_COL
        override def dataType(): DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String =
          "physical row position within _file (0-based, storage order; " +
            "stamped before deletion vectors are applied)"
      })
    file ++ pos
  }

  /** The committed version's schema when one exists (the catalog /
    * row-level-operation path needs real columns to resolve against);
    * empty for a never-written target (the write-only provider path —
    * ACCEPT_ANY_SCHEMA makes the incoming query's schema bind). */
  /** The branch head resolved NOW — a branch read binds to the head as
    * of plan/scan time, never a stale pin. */
  private def branchVersion: Option[Long] =
    branch.map(b => CommitSink.branchHead(Paths.get(path), b))

  override def schema(): StructType = {
    val base = version.orElse(branchVersion) match {
      case Some(v) =>
        StructType.fromDDL(CommitSink.parseManifestVersion(Paths.get(path), v).ddl)
      case None =>
        CommitSink.parseManifest(Paths.get(path))
          .map(m => StructType.fromDDL(m.ddl)).getOrElse(new StructType())
    }
    if (changeFeed) CommitSink.cdfSchema(base) else base
  }

  /** The recorded partition spec as V2 transforms (identity or bucket —
    * [[CommitSink.PartSpec]]), so catalog consumers (DESCRIBE, SHOW
    * CREATE) see the layout. The SPJ contract itself rides on the
    * SCAN's reported KeyGroupedPartitioning, not on this. */
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    if (changeFeed) Array.empty
    else CommitSink.parseManifest(Paths.get(path)).flatMap(_.partCol).map(s =>
      CommitSink.PartSpec.parse(s) match {
        case CommitSink.IdentitySpec(c) =>
          org.apache.spark.sql.connector.expressions.Expressions.identity(c)
        case CommitSink.BucketSpec(n, c) =>
          org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
        case CommitSink.TruncateSpec(w, c) =>
          org.apache.spark.sql.connector.expressions.Expressions.apply("truncate",
            org.apache.spark.sql.connector.expressions.Expressions.literal(w),
            org.apache.spark.sql.connector.expressions.Expressions.column(c))
        case CommitSink.DaysSpec(c) =>
          org.apache.spark.sql.connector.expressions.Expressions.days(c)
        case CommitSink.MonthsSpec(c) =>
          org.apache.spark.sql.connector.expressions.Expressions.months(c)
        case CommitSink.YearsSpec(c) =>
          org.apache.spark.sql.connector.expressions.Expressions.years(c)
      }).toArray

  override def capabilities(): util.Set[TableCapability] = {
    if (changeFeed) {
      require(version.isEmpty,
        "graft-commit: readChangeFeed and versionAsOf are mutually " +
          "exclusive — bound the feed with startingVersion/endingVersion")
      return util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)
    }
    if (version.isDefined) return util.EnumSet.of(TableCapability.BATCH_READ)
    if (branch.isDefined) {
      // a branch is read-write but BATCH-only: streams and the change
      // feed follow main's lineage (CommitWriteBuilder enforces the
      // write shapes)
      val caps = util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
      if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
      return caps
    }
    val caps = util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(version.isEmpty,
      s"graft-commit: version-pinned table ${name()} is read-only")
    require(!changeFeed,
      s"graft-commit: a change-feed read of ${name()} is read-only")
    // a CATALOG table's partition spec is part of its identity: INSERT
    // INTO (which carries no options) appends under the recorded layout.
    // PATH writes keep the explicit-option contract (an un-optioned
    // append to a partitioned table is refused, LakeSpec o16).
    new CommitWriteBuilder(path, info, inheritLayout = !acceptAnySchema)
  }

  /** The READ half: one input partition per committed file — or per
    * partition-key file GROUP when the table was written `partitionBy`
    * (o16) — rows decoded by [[CommitFilesReader]], the mirror of
    * [[CommitDataWriter]]'s staging encoder. Required by SQL row-level
    * DELETE too: Spark 4 plans `DELETE FROM t WHERE c` by first building
    * the table's scan relation (the condition is normalized against it)
    * and only then handing the translated predicates to [[deleteWhere]]. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def versionOpt(key: String): Option[Long] =
      Option(options.get(key)).map { v =>
        try v.trim.toLong catch {
          case _: NumberFormatException => sys.error(
            s"graft-commit: option $key must be a version number, got '$v'")
        }
      }
    new CommitScanBuilder(path, version.orElse(branchVersion),
      maxCommitsPerTrigger =
        Option(options.get("maxCommitsPerTrigger")).map { v =>
          val n = try v.trim.toInt catch {
            case _: NumberFormatException => sys.error(
              s"graft-commit: option maxCommitsPerTrigger must be a positive " +
                s"integer, got '$v'")
          }
          require(n >= 1,
            s"graft-commit: option maxCommitsPerTrigger must be >= 1, got $n")
          n
        }.getOrElse(Int.MaxValue),
      snapshotOnRewrite = options.getBoolean("snapshotOnRewrite", false),
      changeFeed = changeFeed || options.getBoolean("readChangeFeed", false),
      startingVersion = versionOpt("startingVersion"),
      endingVersion = versionOpt("endingVersion"))
  }

  /** SQL UPDATE / MERGE INTO (o13) — and the fallback for DELETEs whose
    * condition the metadata path can't translate: the group-based
    * [[CommitRowLevelOperation]]. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(version.isEmpty,
      s"graft-commit: version-pinned table ${name()} is read-only")
    require(!changeFeed,
      s"graft-commit: a change-feed read of ${name()} is read-only")
    require(branch.isEmpty,
      s"graft-commit: row-level DML on a branch binding of ${name()} is " +
        "unsupported — it would plan against main; append/truncate the " +
        "branch, or publish it first")
    () => {
      // o28: `spark.graft.commit.rowLevelMode=merge-on-read` selects the
      // DELTA-based operation (deletion vectors + appended files) for
      // eligible tables — parquet payload (stable positions), no
      // `_file`/`_pos` data columns (the rowId needs the metadata
      // columns). Partitioned tables are eligible too (since r14): the
      // vector machinery is per-file and layout-blind, and the delta
      // write preserves the one-key-per-file layout by clustering
      // inserted rows on the partition column (the insert writer rolls
      // per key exactly like a partitioned append). Ineligible tables
      // fall back to group copy-on-write: the MODE is a cost knob, the
      // RESULT is identical (Iceberg's write.update.mode/
      // write.merge.mode position).
      val mode =
        try SparkSession.active.conf
          .get("spark.graft.commit.rowLevelMode", "copy-on-write")
        catch { case _: Throwable => "copy-on-write" }
      require(mode == "copy-on-write" || mode == "merge-on-read",
        "graft-commit: spark.graft.commit.rowLevelMode must be " +
          s"'copy-on-write' or 'merge-on-read', got '$mode'")
      val eligible = mode == "merge-on-read" &&
        CommitSink.parseManifest(Paths.get(path)).exists { m =>
          m.payload == "parquet" && {
            val names = StructType.fromDDL(m.ddl).fieldNames
            !names.contains(CommitSink.FILE_COL) &&
              !names.contains(CommitSink.POS_COL)
          } &&
            // bucket layouts fall back to group copy-on-write: the delta
            // write clusters INSERTED rows via identity(partCol), which a
            // transform spec cannot express on this path — the mode is a
            // cost knob, the result is identical (see the fallback note)
            m.partCol.map(CommitSink.PartSpec.parse)
              .forall(_.isInstanceOf[CommitSink.IdentitySpec])
        }
      if (eligible) new CommitDeltaRowLevelOperation(path, info.command())
      else new CommitRowLevelOperation(path, info.command())
    }
  }

  // --- row-level DELETE (o12): copy-on-write under the manifest swap ----
  //
  // `DELETE FROM graft_commit.ns.t WHERE <cond>` arrives here as pushed
  // V1 filters (the SupportsDelete bridge translates the V2 predicates).
  // The delete is Iceberg-style copy-on-write: read ONLY the manifest's
  // committed files, keep the rows the condition does NOT select (NULL
  // condition keeps the row — SQL DELETE semantics), and land the
  // survivors as a NEW table version through the ordinary truncate
  // write — task-isolated staging, atomic manifest swap, CAS against
  // concurrent writers. Readers see the old version or the new one,
  // never a partial delete. Like TRUNCATE, a DELETE starts a new table
  // version and resets the streaming-epoch ledger (documented there).

  private def filterToColumn(f: sf.Filter): Option[Column] = f match {
    case sf.EqualTo(a, v)            => Some(col(a) === lit(v))
    case sf.EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case sf.GreaterThan(a, v)        => Some(col(a) > lit(v))
    case sf.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sf.LessThan(a, v)           => Some(col(a) < lit(v))
    case sf.LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case sf.In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sf.IsNull(a)                => Some(col(a).isNull)
    case sf.IsNotNull(a)             => Some(col(a).isNotNull)
    case sf.StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case sf.StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case sf.StringContains(a, v)     => Some(col(a).contains(v))
    case sf.AlwaysTrue()             => Some(lit(true))
    case sf.AlwaysFalse()            => Some(lit(false))
    case sf.And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case sf.Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case sf.Not(c) => filterToColumn(c).map(not)
    case _ => None
  }

  override def canDeleteWhere(filters: Array[sf.Filter]): Boolean =
    version.isEmpty && !changeFeed && branch.isEmpty &&
      filters.forall(filterToColumn(_).isDefined)

  override def deleteWhere(filters: Array[sf.Filter]): Unit = {
    val spark = SparkSession.active
    // pin ONE manifest: the rows read, the carried set, and the commit
    // CAS all bind to it (a commit landing mid-delete hard-fails the swap)
    val m = CommitSink.parseManifest(Paths.get(path)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $path"))
    // DELETE MODE (o27): `spark.graft.commit.deleteMode=merge-on-read`
    // records deletion vectors instead of rewriting files — Iceberg's
    // write.delete.mode knob. Requires the parquet payload's stable row
    // positions and the _file/_pos metadata columns (withdrawn when data
    // columns claim the names); ineligible tables fall back to
    // copy-on-write — the MODE is a cost knob, the RESULT is identical.
    val deleteMode =
      try spark.conf.get("spark.graft.commit.deleteMode", "copy-on-write")
      catch { case _: Throwable => "copy-on-write" }
    require(deleteMode == "copy-on-write" || deleteMode == "merge-on-read",
      s"graft-commit: spark.graft.commit.deleteMode must be 'copy-on-write' " +
        s"or 'merge-on-read', got '$deleteMode'")
    val morEligible = m.payload == "parquet" && {
      val names = StructType.fromDDL(m.ddl).fieldNames
      !names.contains(CommitSink.FILE_COL) && !names.contains(CommitSink.POS_COL)
    }
    if (deleteMode == "merge-on-read" && morEligible) {
      val cond = filters.flatMap(filterToColumn).reduceOption(_ && _).getOrElse(lit(true))
      CommitSink.deleteToVectors(spark, path, m, cond)
      return
    }
    // GROUP-GRANULAR delete: a file whose recorded ranges PROVE no row
    // satisfies the delete condition is untouched by the delete — carry
    // it forward verbatim instead of rewriting it (mayMatch == false
    // means zero matching rows, so skipping the rewrite loses nothing)
    val stats = m.stats.map { case (f, e) => f -> CommitSink.FileStat.decode(e) }
    val usable = filters.filter(CommitSkip.usable)
    val scanned = m.files.filter { f =>
      stats.get(f).forall(st => usable.forall(CommitSkip.mayMatch(_, st)))
    }
    if (scanned.isEmpty) return // provably nothing to delete: no-op
    // the pushed filters are implicitly conjunctive
    val cond = filters.flatMap(filterToColumn).reduceOption(_ && _).getOrElse(lit(true))
    val token = CommitSink.registerRewrite(
      CommitSink.DmlRewrite(m, () => scanned.toSet))
    try {
      val w = CommitSink.readManifestFiles(spark, path, m.copy(files = scanned))
        // DELETE removes rows where the condition is TRUE; a NULL
        // condition keeps the row
        .filter(not(fnCoalesce(cond, lit(false))))
        .write.format(CommitSink.NAME).option("path", path)
        .option("rewriteToken", token)
      // DML preserves the table's partition layout
      m.partCol.fold(w)(c => w.option("partitionBy", c))
        .mode("overwrite").save()
    } finally CommitSink.dropRewrite(token) // reclaim on pre-build failure
  }
}

class CommitWriteBuilder(path: String, info: LogicalWriteInfo,
                         /** Group-granular rewrite contract (row-level
                           * operations pass it directly; compact /
                           * deleteWhere hand it over as a `rewriteToken`
                           * option): replace exactly the scanned files,
                           * carry the rest, CAS against the planning
                           * commit. */
                         rewrite: Option[CommitSink.DmlRewrite] = None,
                         /** Catalog-loaded tables append under the
                           * manifest's recorded partition spec when the
                           * write carries no partitionBy option (SQL
                           * INSERT INTO has no way to pass one). */
                         inheritLayout: Boolean = false)
    extends WriteBuilder with SupportsTruncate {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => CSortOrder}

  /** The DataFrame-API handoff (see [[CommitSink.registerRewrite]]);
    * lazy so the token is consumed exactly once per write. */
  private lazy val effectiveRewrite: Option[CommitSink.DmlRewrite] =
    rewrite.orElse(
      Option(info.options.get("rewriteToken")).map(CommitSink.takeRewrite))

  private var doTruncateFlag = false
  override def truncate(): WriteBuilder = { doTruncateFlag = true; this }

  /** `option("partitionBy", col)` — identity partitioning (o16): the
    * write DECLARES a clustered-by-key distribution plus an in-task sort
    * on the key through [[RequiresDistributionAndOrdering]], Spark plans
    * the shuffle + sort, and [[CommitDataWriter]] rolls to a new staged
    * file on each key change — so every committed file holds exactly ONE
    * partition-key value, which the scan reports back as
    * KeyGroupedPartitioning: the storage-partitioned-join layout (the
    * join shuffle is paid once at write time, like o02's bucketing but
    * negotiated entirely through the DSv2 contract).
    *
    * Row-level rewrites (UPDATE/MERGE/copy-on-write DELETE) inherit the
    * table's partitioning from their PLANNING manifest: DML must
    * preserve the layout, while an explicit user overwrite may change
    * it. */
  private lazy val partCol: Option[String] =
    Option(info.options.get("partitionBy")).map(_.trim).filter(_.nonEmpty)
      .orElse(effectiveRewrite.flatMap(_.planning.partCol))
      // a catalog INSERT INTO carries no options — an APPEND inherits
      // the table's recorded layout (and with it the declared
      // clustering+sort), or the first insert into a CREATE TABLE
      // PARTITIONED BY table would land unpartitioned files and wipe
      // the spec. TRUNCATES inherit too (r17): a catalog table's
      // partition spec is table METADATA, not a per-write choice —
      // Iceberg keeps the spec across INSERT OVERWRITE — so an
      // un-optioned SQL overwrite of a PARTITIONED BY table must not
      // silently commit partCol=None and wipe SPJ/point-prune
      // guarantees for every later insert; changing the layout goes
      // through an explicit DataFrame `option("partitionBy", ...)`
      // overwrite (which wins above) or a table re-create. Path writes
      // keep the old rule: the option decides (LakeSpec o16 pins the
      // un-optioned-append refusal on the path surface).
      .orElse(if (inheritLayout) planningManifest.flatMap(_.partCol)
              else None)
      // canonical encoding: layout compatibility is a string compare
      // (commitAppend's mismatch refusal), so "bucket( 8 , k )" and
      // "bucket(8,k)" must not read as different layouts
      .map(s => CommitSink.PartSpec.parse(s).encode)

  /** This write's staged-file payload format. Resolution order mirrors
    * the partition-layout rules: a REWRITE must keep its planning
    * manifest's payload (carried files and new files share one
    * decoder); an APPEND joins the table's existing payload (an
    * explicit conflicting option is refused, like a schema mismatch —
    * and the commit-time CAS retry re-checks, see commitAppend); a
    * TRUNCATE keeps the table's recorded payload unless
    * `option("payload", ...)` explicitly switches it — a table pinned
    * to json via TBLPROPERTIES must not silently flip to parquet on an
    * un-optioned INSERT OVERWRITE (the catalog table object carries no
    * options, so the manifest is the only place the choice survives);
    * a FIRST write takes the option, defaulting to parquet — the
    * at-scale encoder ([[ParquetPayload]]); "json" keeps the original
    * fixture-portable lines format. */
  private lazy val payload: String = {
    val opt = Option(info.options.get("payload")).map(_.trim.toLowerCase)
    opt.foreach(p => require(p == "json" || p == "parquet",
      s"graft-commit: option payload must be 'json' or 'parquet', got '$p'"))
    effectiveRewrite.map(_.planning.payload).getOrElse {
      planningManifest match {
        case Some(m) =>
          if (doTruncateFlag) opt.getOrElse(m.payload) // truncate MAY switch
          else {
            opt.foreach(p => require(p == m.payload,
              s"graft-commit: append payload mismatch at $path — the table is " +
                s"'${m.payload}' but this write asked for '$p'; use overwrite " +
                "(truncate) to switch the payload format"))
            m.payload
          }
        case None => opt.getOrElse("parquet")
      }
    }
  }

  /** UPSERT-BY-KEY append mode (o32): `option("upsertKeys", "k1,k2")`
    * makes this append also record the batch's distinct key tuples as an
    * EQUALITY DELETE over strictly-older files — replace-these-keys with
    * zero table reads. */
  private lazy val upsertKeys: Seq[String] =
    Option(info.options.get("upsertKeys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  /** PRE-SHAPED partitioned rewrite (o39, maintenance-internal): the
    * caller already planned the clustering shuffle (e.g. range on
    * (partCol, sortCols) for a per-partition sort-order rewrite), so
    * the write must NOT declare its own clustered-by-key distribution —
    * Spark would re-shuffle and destroy the secondary split. Safe
    * because the range layout still groups each key contiguously within
    * a task (the rolling writer's one-key-per-file invariant holds);
    * gated on a rewrite token so ordinary writers can never reach it. */
  private lazy val preShaped: Boolean =
    Option(info.options.get("preShaped")).exists(_.toBoolean)

  /** WRITE-AUDIT-PUBLISH staging (o41): `option("stageOnly", true)`
    * lands this write as an auditable version manifest WITHOUT moving
    * main — [[CommitSink.publishStaged]] fast-forwards to it after the
    * audit passes. Append and truncate shapes only. */
  private lazy val stageOnly: Boolean =
    Option(info.options.get("stageOnly")).exists(_.toBoolean)

  /** BRANCH write (o44): `option("branch", name)` plans against and
    * commits onto the named branch's head — main's manifest never
    * moves. Append and truncate shapes only (DML/upsert/streaming stay
    * main-lineage; a branch workflow replays them after publish). */
  private lazy val branch: Option[String] =
    Option(info.options.get("branch")).map(_.trim).filter(_.nonEmpty)

  /** The manifest this write plans against: the branch head when the
    * write targets a branch, else main's current manifest. */
  private def planningManifest: Option[CommitSink.Manifest] = branch match {
    case Some(b) => Some(CommitSink.parseManifestVersion(Paths.get(path),
      CommitSink.branchHead(Paths.get(path), b)))
    case None => CommitSink.parseManifest(Paths.get(path))
  }

  override def build(): Write = {
    val schema = info.schema()
    val ok: DataType => Boolean =
      if (payload == "parquet") ParquetPayload.supported
      else CommitSink.supportedTypes.contains
    val bad = schema.fields.filterNot(f => ok(f.dataType))
    require(bad.isEmpty, s"graft-commit ($payload payload) supports " +
      (if (payload == "parquet")
        "long/int/smallint/tinyint/double/float/string/boolean/date/" +
          "timestamp/timestamp_ntz/decimal(<=38) "
       else "long/int/double/string/boolean ") +
      s"columns; unsupported: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    partCol.map(CommitSink.PartSpec.parse).foreach { spec =>
      val c = spec.sourceCol
      val f = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"graft-commit: partitionBy column '$c' is not in the written schema"))
      require(spec.sourceOk(f.dataType),
        s"graft-commit: partitionBy column '$c' must be ${spec.sourceRule}, " +
          s"got ${f.dataType.simpleString}")
    }
    if (upsertKeys.nonEmpty) {
      require(!doTruncateFlag && effectiveRewrite.isEmpty,
        "graft-commit: upsertKeys is an APPEND-mode option — a truncate " +
          "or rewrite replaces content outright and records no deletes")
      require(payload == "parquet",
        "graft-commit: upsertKeys requires the parquet payload (the key " +
          "files are parquet, and equality deletes are applied by the " +
          "columnar readers)")
      upsertKeys.foreach { k =>
        val f = schema.fields.find(_.name == k).getOrElse(
          sys.error(s"graft-commit: upsertKeys column '$k' is not in the written schema"))
        require(k.matches("[A-Za-z0-9_]+") && !k.startsWith("_graft_"),
          s"graft-commit: upsertKeys column '$k' — key names must match " +
            "[A-Za-z0-9_]+ and may not use the reserved _graft_ prefix")
        val keyable = f.dataType match {
          case LongType | IntegerType | ShortType | ByteType | StringType |
               BooleanType | DateType | TimestampType | TimestampNTZType => true
          case _ => false // float/double/decimal keys: equality footguns
        }
        require(keyable,
          s"graft-commit: upsertKeys column '$k' has non-keyable type ${f.dataType.simpleString}")
      }
    }
    // a rewrite is its own commit mode: truncate() may also have been
    // called on the builder (DataFrame overwrite), but the rewrite's
    // replace-scanned/carry-rest semantics win
    val doTruncate = doTruncateFlag && effectiveRewrite.isEmpty
    val rw = effectiveRewrite
    val pay = payload
    val upsert = upsertKeys
    require(!preShaped || (effectiveRewrite.isDefined && partCol.isDefined),
      "graft-commit: preShaped is the internal device of partitioned " +
        "cluster rewrites — it requires a rewrite token and partitionBy")
    require(!stageOnly || effectiveRewrite.isEmpty,
      "graft-commit: stageOnly stages an APPEND or TRUNCATE for audit; " +
        "rewrites/DML commit against their planning snapshot directly")
    require(!stageOnly || upsertKeys.isEmpty,
      "graft-commit: stageOnly with upsertKeys is unsupported — an " +
        "equality delete's visibility must match its data files'")
    require(branch.isEmpty || effectiveRewrite.isEmpty,
      "graft-commit: branch writes take APPEND or TRUNCATE shapes; " +
        "DML rewrites commit against main's planning snapshot")
    require(branch.isEmpty || !stageOnly,
      "graft-commit: branch and stageOnly are mutually exclusive — a " +
        "branch IS the audit lineage (publish fast-forwards main)")
    require(branch.isEmpty || upsertKeys.isEmpty,
      "graft-commit: upsertKeys on a branch is unsupported — replay the " +
        "upsert after publish (equality-delete sequencing is main-lineage)")
    val shapedByCaller = preShaped
    val staged = stageOnly
    val branchTarget = branch
    // what the write clusters + sorts on, per spec:
    //  - identity: clustered + sorted on the key itself (o16);
    //  - bucket: clustered + sorted on bucket(n, col), resolved through
    //    the catalog's FunctionCatalog — bucket tables are catalog
    //    tables, exactly Iceberg's arrangement; maintenance rewrites on
    //    a PATH pre-shape instead (see compact);
    //  - truncate/days: RANGE-distributed + sorted on IDENTITY of the
    //    source column. Both transforms are MONOTONE, so value-ordered
    //    tasks keep every transformed key contiguous (the rolling
    //    writer's one-key-per-file invariant holds with no function
    //    resolution anywhere), and the ORDERED distribution keeps a
    //    key's rows in one task (± a sampled range boundary — a band
    //    may land as two files, which the grouped scan handles), where
    //    hash-clustering on the raw value would scatter one day across
    //    every task and explode the file count.
    def partDistribution(spec: CommitSink.PartSpec): Distribution = spec match {
      case CommitSink.IdentitySpec(c) =>
        Distributions.clustered(Array(Expressions.identity(c)))
      case CommitSink.BucketSpec(n, c) =>
        Distributions.clustered(Array(Expressions.bucket(n, c)))
      case CommitSink.TruncateSpec(_, c) =>
        Distributions.ordered(Array(
          Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING)))
      case CommitSink.DaysSpec(c) =>
        Distributions.ordered(Array(
          Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING)))
      case CommitSink.MonthsSpec(c) =>
        Distributions.ordered(Array(
          Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING)))
      case CommitSink.YearsSpec(c) =>
        Distributions.ordered(Array(
          Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING)))
    }
    def partOrdering(spec: CommitSink.PartSpec): Array[CSortOrder] = spec match {
      case CommitSink.IdentitySpec(c) =>
        Array(Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
      case CommitSink.BucketSpec(n, c) =>
        Array(Expressions.sort(Expressions.bucket(n, c), SortDirection.ASCENDING))
      case CommitSink.TruncateSpec(_, c) =>
        Array(Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
      case CommitSink.DaysSpec(c) =>
        Array(Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
      case CommitSink.MonthsSpec(c) =>
        Array(Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
      case CommitSink.YearsSpec(c) =>
        Array(Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
    }
    new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        partCol.filterNot(_ => shapedByCaller)
          .map(c => partDistribution(CommitSink.PartSpec.parse(c)))
          .getOrElse(Distributions.unspecified())
      override def requiredOrdering(): Array[CSortOrder] =
        partCol.filterNot(_ => shapedByCaller)
          .map(c => partOrdering(CommitSink.PartSpec.parse(c)))
          .getOrElse(Array.empty[CSortOrder])
      override def toBatch: BatchWrite =
        new CommitBatchWrite(path, schema, doTruncate, partCol, rw, pay, upsert,
          stage = staged, branch = branchTarget)
      override def toStreaming: streaming.StreamingWrite = {
        require(partCol.isEmpty,
          "graft-commit: partitionBy is a batch-write layout decision; " +
            "the streaming sink does not support it")
        require(branchTarget.isEmpty,
          "graft-commit: the streaming sink writes main — branch a batch " +
            "workflow, or publish and point the stream at main")
        new CommitStreamingWrite(path, schema, pay, upsert)
      }
    }
  }
}

/** Group-based (copy-on-write) row-level operation — what turns SQL
  * UPDATE and MERGE INTO (and DELETE with conditions the metadata path
  * cannot translate) into executable plans on this sink: Spark reads the
  * committed table through [[CommitScanBuilder]], computes the post-op
  * row set (updated + untouched + inserted rows), and lands it through
  * the two-phase write in GROUP-GRANULAR replace mode — the Iceberg
  * copy-on-write shape proper: the scan records exactly which committed
  * files it planned (after zone-map pruning of the pushed DML
  * condition), the write replaces ONLY those files and carries every
  * untouched file forward in the manifest, all under one atomic CAS'd
  * manifest swap against the PLANNING-time commit id — so a reader sees
  * the pre-op or post-op table (never a torn state) and a concurrent
  * commit landing mid-operation hard-fails the swap instead of being
  * silently truncated away. Zone-map pruning on the DML scan is safe BY
  * CONSTRUCTION under this contract: a pruned file is a carried file,
  * not a deleted one (the r11 whole-table-rewrite design had to decline
  * all pruning precisely because its truncate-write deleted whatever the
  * scan skipped). A one-row UPDATE on a 100 TB table now reads and
  * rewrites one file's worth of data, not 100 TB. DELETEs whose
  * predicates translate still take the cheaper metadata path
  * (`OptimizeMetadataOnlyDeleteFromTable` converts the rewritten plan
  * back to [[CommitSinkTable.deleteWhere]], itself group-granular).
  *
  * The scan and write BOTH bind to [[planning]], the manifest read once
  * when Spark builds the operation — the snapshot-isolation pin.
  * Streaming-epoch ledger: a group rewrite CARRIES the ledger (unlike
  * TRUNCATE, which resets it) — the table's content lineage is
  * continuous, so a re-delivered micro-batch commit must still be
  * recognized and dropped. */
class CommitRowLevelOperation(path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  /** The snapshot this operation reads AND replaces against. */
  private[sources] val planning: CommitSink.Manifest =
    CommitSink.parseManifest(Paths.get(path)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $path"))
  /** Files the operation's scan actually planned (set by
    * [[CommitScan.planInputPartitions]], which always runs before the
    * write's commit). Never set ⇒ the optimizer proved the scan empty
    * (e.g. a statically-false condition): nothing was read, so nothing
    * is replaced and every file is carried. */
  private[sources] val scanned =
    new java.util.concurrent.atomic.AtomicReference[Set[String]](null)
  override def command(): RowLevelOperation.Command = cmd

  /** PROFITABILITY GUARD for runtime group filtering (the r12 o13
    * regression): the matching-groups subquery pays one source×target
    * join per MERGE/UPDATE, which only earns its keep when the layout
    * HAS prunable group structure. The manifest's own zone maps decide:
    *
    *  - an identity-PARTITIONED table always has it (one key per file);
    *  - an unpartitioned table has it iff some recorded column's
    *    per-file ranges are pairwise DISJOINT (a range-clustered
    *    layout: matched keys land in few files). On a hash-scattered
    *    layout every file's ranges overlap and a source of k keys
    *    leaves a file unmatched with probability (1-1/N)^k ≈ 0 — the
    *    subquery would discover "all files match" at the price of a
    *    second table scan, so it is skipped and the rewrite replaces
    *    the statically-planned set (Iceberg's own
    *    stats-prove-filtering-can't-help short-circuit).
    *
    * `spark.graft.commit.runtimeGroupFilter` = always|never|auto
    * overrides the heuristic (a selective point-UPDATE on a
    * hash-scattered layout is the one case where `always` wins: the
    * matched-file set is exact regardless of layout). ≤2 files (or <2
    * non-empty stat'd files) never filter — the bounded saving cannot
    * repay the subquery. */
  private[sources] def groupFilterUseful: Boolean = {
    val mode =
      try SparkSession.active.conf.get("spark.graft.commit.runtimeGroupFilter", "auto")
      catch { case _: Throwable => "auto" }
    // a typo'd value must not silently become the heuristic — the
    // sibling deleteMode/rowLevelMode knobs hard-fail the same way
    require(mode == "always" || mode == "never" || mode == "auto",
      "graft-commit: spark.graft.commit.runtimeGroupFilter must be " +
        s"'always', 'never' or 'auto', got '$mode'")
    mode match {
      case "always" => true
      case "never"  => false
      case _ =>
        planning.partCol.isDefined || {
          planning.files.size > 2 && {
            val stats = planning.files.map(f =>
              planning.stats.get(f).map(CommitSink.FileStat.decode))
            if (stats.exists(_.isEmpty)) true // unknown layout: keep the filter
            else {
              // zero-row files carry no ranges and say nothing about layout
              val decoded = stats.flatten.filter(_.rows > 0)
              decoded.size >= 2 && {
                val cols = decoded.flatMap(_.cols.keySet).distinct
                  .filter(c => decoded.forall(_.cols.contains(c)))
                cols.exists { c =>
                  val rs = decoded.map(_.cols(c))
                  rs.map(_.kind).distinct.size == 1 && (rs.head.kind match {
                    case 'l' =>
                      val s = rs.map(r => (r.min.toLong, r.max.toLong)).sortBy(_._1)
                      s.sliding(2).forall {
                        case Seq(a, b) => a._2 < b._1
                        case _ => true
                      }
                    case _ =>
                      val s = rs.map(r => (r.min.toDouble, r.max.toDouble)).sortBy(_._1)
                      s.sliding(2).forall {
                        case Seq(a, b) => a._2 < b._1
                        case _ => true
                      }
                  })
                }
              }
            }
          }
        }
    }
  }

  /** The operation reads rows WITH their `_file` metadata column — what
    * lets Spark's runtime GROUP filtering find the matched groups: the
    * matching-rows subquery (planned over the ORIGINAL table — Spark
    * swaps RowLevelOperationTable back before building it, so it never
    * touches this operation's scanned-files holder) computes the
    * DISTINCT `_file` values the command condition matches, and this
    * operation's scan prunes to exactly those files at execution. The
    * In-set is bounded by the FILE count (the reason Iceberg keys group
    * filtering on FILE_PATH, not data columns). Withdrawn when (a) a
    * data column claims the `_file` name — the table's metadataColumns()
    * is withdrawn too, so demanding it would fail analysis (the rewrite
    * already handles the no-runtime-filter case by replacing every
    * scanned file) — or (b) the [[groupFilterUseful]] guard says the
    * subquery cannot pay for itself on this layout. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (StructType.fromDDL(planning.ddl).fieldNames.contains(CommitSink.FILE_COL) ||
        !groupFilterUseful)
      Array.empty
    else
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(CommitSink.FILE_COL))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CommitScanBuilder(path, dmlOp = Some(this))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CommitWriteBuilder(path, info,
      rewrite = Some(CommitSink.DmlRewrite(planning,
        () => Option(scanned.get).getOrElse(Set.empty))))
  override def description(): String = s"graft-commit $cmd (group copy-on-write)"
}

/** DELTA-BASED merge-on-read row-level operations (o28) — the
  * [[SupportsDelta]] half of the DML surface, Iceberg's position-delta
  * shape: instead of rewriting every file a matched row lives in
  * (group copy-on-write), Spark hands this operation the per-row
  * CHANGES — delete(rowId), insert(row), with updates represented as
  * delete+insert — and the commit lands them as deletion vectors plus
  * appended files, leaving every existing data file untouched. A MERGE
  * that updates 100 rows of a 100 TB table writes 100 vector positions
  * and one small file of new row versions, not 100 rewritten files.
  *
  * The rowId is (`_file`, `_pos`) — the same physical coordinates the
  * o27 metadata DELETE records, so the vector machinery (union,
  * fully-deleted-file drop, read-side skip, GC liveness, changelog
  * refusal) is shared verbatim. The write requests clustering on
  * `_file` and ordering by (`_file`, `_pos`) — exactly Iceberg's
  * position-delta distribution — so each file's deletes land in one
  * task as one sorted staged vector; the commit still tolerates an
  * unhonored request by unioning partials. Scan and commit both bind
  * to [[planning]]; the manifest swap CAS's on it, so a concurrent
  * commit hard-fails the statement (the rewrite position).
  *
  * Selected per table by `spark.graft.commit.rowLevelMode=
  * merge-on-read` when eligible (parquet payload, no `_file`/`_pos`
  * data columns; partitioned tables included since the r14 lift — the
  * vector machinery is per-file and layout-blind, and the delta write
  * clusters inserted rows on the partition column to preserve the
  * one-key-per-file layout) — copy-on-write stays the default and
  * the fallback, matching Iceberg's write.update.mode/write.merge.mode
  * table properties (a cost knob, never a semantics change). */
class CommitDeltaRowLevelOperation(path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  private[sources] val planning: CommitSink.Manifest =
    CommitSink.parseManifest(Paths.get(path)).getOrElse(
      sys.error(s"graft-commit: no committed manifest at $path"))

  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CommitScanBuilder(path, pinned = Some(planning))
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(CommitSink.FILE_COL),
      Expressions.column(CommitSink.POS_COL))
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def representUpdateAsDeleteAndInsert(): Boolean = true
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new CommitDeltaWriteBuilder(path, planning, cmd)
  override def description(): String =
    s"graft-commit $cmd (merge-on-read, deletion vectors)"
}

class CommitDeltaWriteBuilder(path: String, planning: CommitSink.Manifest,
                              cmd: RowLevelOperation.Command)
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new CommitDeltaWrite(path, planning, cmd)
}

class CommitDeltaWrite(path: String, planning: CommitSink.Manifest,
                       cmd: RowLevelOperation.Command)
    extends DeltaWrite with RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => CSortOrder}
  /** Cluster on `_file` so each committed file's delete positions land
    * in ONE task (one staged vector per file), ordered by position so
    * the vector streams out sorted — Iceberg's position-delta layout.
    *
    * On a PARTITIONED table, UPDATE/MERGE writes also carry INSERTED
    * rows (their `_file` rowId is null), which must land one-key-per-
    * file: the partition column joins the clustering and the sort, so
    * inserts of one key colocate and arrive contiguously at the insert
    * writer's per-key roll. A pure DELETE's delta plan projects no data
    * columns, so the partition column is only referenced when it can
    * resolve. */
  private def partRefs: Seq[String] =
    if (cmd == RowLevelOperation.Command.DELETE) Seq.empty
    else planning.partCol.toSeq
  override def requiredDistribution(): Distribution =
    Distributions.clustered(
      (CommitSink.FILE_COL +: partRefs).map(c =>
        Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression).toArray)
  override def requiredOrdering(): Array[CSortOrder] =
    ((CommitSink.FILE_COL +: partRefs) :+ CommitSink.POS_COL).map(c =>
      Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING)).toArray
  override def toBatch: DeltaBatchWrite = new CommitDeltaBatchWrite(path, planning)
  override def description(): String = "graft-commit delta write"
}

/** One task's delta output: staged inserted-row files plus
  * (data file, staged vector name, merged position count) triples. */
case class DeltaTaskResult(inserted: Seq[StagedFile],
                           dvs: Seq[(String, String, Long)])
    extends WriterCommitMessage

class CommitDeltaBatchWrite(path: String, planning: CommitSink.Manifest)
    extends DeltaBatchWrite {
  private val dir = Paths.get(path)
  private val nonce = CommitSink.writeNonce()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    CommitSink.io.createDirectories(CommitSink.stagingDir(dir, nonce))
    new CommitDeltaWriterFactory(path, planning.ddl, nonce,
      planning.deletes.map { case (f, e) => f -> Paths.get(path, e.dv).toString },
      planning.partCol)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val results = messages.collect { case r: DeltaTaskResult => r }.toSeq
    val staged = results.flatMap(_.inserted)
    // one staged vector per file under the requested clustering; if the
    // request was not honored, partials union below (each already merged
    // the OLD vector, so the union dedupes it)
    val byFile: Seq[(String, Seq[(String, Long)])] = results.flatMap(_.dvs)
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toSeq.sortBy(_._1)
    if (staged.isEmpty && byFile.isEmpty) {
      CommitSink.sweepStaging(dir, nonce)
      return // nothing matched, nothing inserted: no new version
    }
    val commitId = planning.commit + 1
    val rowsOf = planning.stats.map { case (f, e) =>
      f -> CommitSink.FileStat.decode(e).rows }
    val staging = CommitSink.stagingDir(dir, nonce)
    val promoted = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      val newStats = scala.collection.mutable.Map.empty[String, String]
      val newFiles = staged.zipWithIndex.map { case (s, i) =>
        val fin = f"part-c$commitId%05d-$nonce-$i%05d.parquet"
        CommitSink.io.promote(staging.resolve(s.name), dir.resolve(fin))
        promoted += fin
        if (s.stats.nonEmpty) newStats += (fin -> s.stats)
        fin
      }
      val newDvs: Seq[(String, CommitSink.DvEntry)] =
        byFile.zipWithIndex.map { case ((f, parts), i) =>
          val fin = f"part-dv-c$commitId%05d-$nonce-$i%05d.bin"
          val n =
            if (parts.size == 1) {
              CommitSink.io.promote(staging.resolve(parts.head._1), dir.resolve(fin))
              parts.head._2
            } else {
              val merged = parts.flatMap(p =>
                CommitSink.readDv(staging.resolve(p._1))).distinct.sorted.toArray
              CommitSink.writeDv(dir.resolve(fin), merged)
              merged.length.toLong
            }
          promoted += fin
          f -> CommitSink.DvEntry(fin, n)
        }
      // a vector covering every physical row drops its file outright —
      // the vector stays as a TOMBSTONE so the change feed can emit the
      // drop as delete rows (o33; it dies at the next commit)
      val dead = newDvs.collect {
        case (f, e) if rowsOf.get(f).contains(e.ndel) => f
      }.toSet
      val files = planning.files.filterNot(dead) ++ newFiles
      val dvMap = (planning.deletes ++ newDvs).toMap
      CommitSink.writeManifest(dir, planning.ddl, files, commitId,
        planning.epochs, // content lineage continues: the ledger carries
        expectedPrev = planning.commit,
        partCol = planning.partCol, // DML preserves the table layout
        stats = planning.stats.view.filterKeys(files.toSet).toMap ++ newStats,
        tableId = CommitSink.carriedOrFreshTableId(Some(planning)),
        payload = planning.payload,
        deletes = dvMap.view.filterKeys(files.toSet).toMap,
        fileSeq = planning.fileSeq ++ newFiles.map(_ -> commitId),
        eqDeletes = planning.eqDeletes,
        tombstones = dvMap.view.filterKeys(dead).toMap,
        blooms = planning.blooms) // existing files untouched: index carries
    } catch { case e: Throwable =>
      // refused CAS / failed promote: leave no trace (the rewrite rule)
      promoted.foreach(n => CommitSink.io.deleteIfExists(dir.resolve(n)))
      CommitSink.sweepStaging(dir, nonce)
      throw e
    }
    CommitSink.sweepStaging(dir, nonce)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CommitSink.sweepStaging(dir, nonce)
}

class CommitDeltaWriterFactory(path: String, ddl: String, nonce: String,
                               oldDvs: Map[String, String],
                               partCol: Option[String] = None)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new CommitDeltaWriter(path, ddl, partitionId, taskId, nonce, oldDvs, partCol)
}

/** Executor-side delta writer: inserted rows stream through an ordinary
  * staged-file writer (parquet payload, stats collected); deleted
  * positions buffer per file and flush as one merged staged vector at
  * task commit. Buffering (not streaming against the requested sort)
  * keeps correctness independent of whether the distribution/ordering
  * request was honored — memory is this task's deleted positions, the
  * quantity a position-delete file holds anyway. */
class CommitDeltaWriter(path: String, ddl: String, partitionId: Int,
                        taskId: Long, nonce: String,
                        oldDvs: Map[String, String],
                        partCol: Option[String] = None)
    extends DeltaWriter[InternalRow] {
  private val staging = CommitSink.stagingDir(Paths.get(path), nonce)
  // inserted rows of a partitioned table go through the same per-key
  // rolling writer a partitioned append uses — each new file holds one
  // key (with its pk recorded), preserving the storage-partitioned-join
  // layout across MOR DML
  private val inserts = new CommitDataWriter(path, ddl, partitionId, taskId,
    partCol = partCol, stagingSub = nonce, payload = "parquet")
  private val dels = scala.collection.mutable.LinkedHashMap
    .empty[String, scala.collection.mutable.ArrayBuffer[Long]]

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    // rowId layout = rowId() order: (_file string, _pos long)
    val f = id.getUTF8String(0).toString
    dels.getOrElseUpdate(f, scala.collection.mutable.ArrayBuffer.empty) +=
      id.getLong(1)
  }
  override def update(meta: InternalRow, id: InternalRow,
                      row: InternalRow): Unit =
    sys.error("unreachable: updates are represented as delete+insert")
  override def insert(row: InternalRow): Unit = inserts.write(row)
  override def reinsert(meta: InternalRow, row: InternalRow): Unit =
    inserts.write(row)

  override def commit(): WriterCommitMessage = {
    val ins = inserts.commit() match {
      case s: StagedFile => Seq(s)
      case StagedFileSet(fs) => fs
      case _ => Seq.empty
    }
    val dvs = dels.toSeq.zipWithIndex.map { case ((f, ps), i) =>
      val old = oldDvs.get(f).map(p => CommitSink.readDv(Paths.get(p)))
        .getOrElse(Array.emptyLongArray)
      // disjoint by construction: the operation's scan applied `old`,
      // so a re-deleted position cannot arrive; sort merges the two runs
      val merged = (old ++ ps).sorted
      val name = f"dv-p$partitionId%05d-t$taskId%05d-$i%05d"
      CommitSink.writeDv(staging.resolve(name), merged)
      (f, name, merged.length.toLong)
    }
    // the eagerly-opened empty insert segment adds nothing: drop it
    DeltaTaskResult(ins.filter(_.rows > 0), dvs)
  }
  override def abort(): Unit = inserts.abort()
  override def close(): Unit = ()
}

/** The STREAMING write contract — epoch-based two-phase commit, the
  * second half of the connector write surface next to [[CommitBatchWrite]]
  * (and the sink-side twin of [[SensorMicroBatchStream]]'s read path):
  * each micro-batch (epoch) stages task files exactly like a batch write,
  * and the driver's `commit(epochId, …)` promotes them under ONE manifest
  * swap that also RECORDS the epoch. That record is what buys
  * exactly-once: after a failure, Structured Streaming re-runs the last
  * un-checkpointed batch and re-delivers its commit — an epoch already in
  * the manifest is dropped (its re-staged files deleted, nothing
  * promoted), so re-delivery is a no-op instead of a duplicate. This is
  * precisely the idempotent-sink contract a foreachBatch MERGE implements
  * by hand (w08) and the reference's consumer lacks entirely
  * (consumer_to_file.py:185-186 re-inserts everything on restart). */
class CommitStreamingWrite(path: String, schema: StructType,
                           payload: String = "json",
                           /** o32: per-trigger upsert-by-key — each
                             * epoch's commit also records the batch's
                             * key file as an equality delete over
                             * strictly-older files: the TRUE zero-read
                             * CDC apply (the delta path must still scan
                             * for positions every trigger). */
                           upsertKeys: Seq[String] = Seq.empty)
    extends streaming.StreamingWrite {
  private val dir = Paths.get(path)
  /** This query's identity: names its private staging subdirectory AND
    * makes its promoted epoch-file names attempt-unique. */
  private val nonce = CommitSink.writeNonce()

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    CommitSink.io.createDirectories(CommitSink.stagingDir(dir, nonce))
    // Initialize an EMPTY manifest for a never-written target so that a
    // stream committing zero epochs (empty source) still leaves a
    // readable table — readCommitted sees commit 0 with no files and
    // returns an empty frame of this write's schema. CAS on "no manifest
    // yet" (expectedPrev = -1): if a concurrent writer commits in the
    // window after our exists-check, the swap must NOT clobber its
    // files — the CAS failure is caught and the existing manifest wins.
    if (!CommitSink.io.exists(dir.resolve("_MANIFEST.json")))
      try CommitSink.writeManifest(dir, schema.toDDL, Seq.empty, 0L,
        expectedPrev = -1L, tableId = CommitSink.carriedOrFreshTableId(None),
        payload = payload)
      catch { case _: IllegalArgumentException => () }
    new CommitStreamingWriterFactory(path, schema.toDDL, nonce, payload,
      upsertKeys)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val eqStaged: Seq[(String, Long)] = messages.collect {
      case UpsertTaskResult(_, n, k) if n.nonEmpty => (n, k)
    }.toSeq
    val staged = messages.map {
      case UpsertTaskResult(d, _, _) => d
      case m => m
    }.collect { case s: StagedFile => s }
    // ONE manifest read per commit; writeManifest's CAS does the second,
    // freshest-possible read just before the swap
    val manifest = CommitSink.parseManifest(dir)
    if (manifest.exists(_.epochs.contains(epochId))) {
      // re-delivered epoch (restart replay): drop the re-staged output —
      // promoting it would double-write rows AND re-apply the epoch's
      // equality delete the manifest already has
      (staged.map(_.name) ++ eqStaged.map(_._1)).foreach(n =>
        CommitSink.io.deleteIfExists(CommitSink.stagingDir(dir, nonce).resolve(n)))
    } else {
      val prev = manifest.map(_.commit).getOrElse(-1L)
      val carriedDdl = manifest.map(_.ddl).getOrElse(schema.toDDL)
      val carried = manifest.map(_.files).getOrElse(Seq.empty)
      // Appending under a DIFFERENT column set would carry forward files
      // that re-read as silent nulls under the new DDL — refuse instead
      // (names + types; nullability does not change the JSON payload).
      require(carried.isEmpty || CommitSink.sameColumns(carriedDdl, schema.toDDL),
        s"graft-commit: streaming append schema mismatch at $path — manifest " +
          s"has [$carriedDdl] but this query writes [${schema.toDDL}]; " +
          "truncate via a batch overwrite first or match the schema")
      // a partitioned table's one-key-per-file layout would be broken by
      // an unpartitioned streaming append — refuse like a schema mismatch
      require(carried.isEmpty || manifest.flatMap(_.partCol).isEmpty,
        s"graft-commit: $path is partitioned by " +
          s"${manifest.flatMap(_.partCol).getOrElse("?")}; the streaming sink " +
          "writes unpartitioned files — truncate via a batch overwrite first")
      // attempt-unique names (same rationale as the batch commit): two
      // racing writers can never promote onto the same committed file.
      // Promotion runs INSIDE the cleanup scope — a partial promotion
      // (ATOMIC_MOVE failure mid-loop) deletes the promoted-so-far
      // names, same contract as a refused manifest swap.
      // epochs append to the table's recorded payload (the factory's
      // writers staged under it; a fresh target staged this write's own)
      val epochPayload = manifest.map(_.payload).getOrElse(payload)
      require(carried.isEmpty || epochPayload == payload,
        s"graft-commit: payload mismatch at $path — the table is " +
          s"'$epochPayload' but this stream stages '$payload' files; " +
          "truncate via a batch overwrite first")
      val promoted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val promotedEq = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      try {
        staged.zipWithIndex.foreach { case (s, i) =>
          val fin = f"part-e$epochId%05d-$nonce-$i%05d.$payload%s"
          CommitSink.io.promote(CommitSink.stagingDir(dir, nonce).resolve(s.name), dir.resolve(fin))
          promoted += (fin -> s.stats)
        }
        eqStaged.zipWithIndex.foreach { case ((n, k), i) =>
          val fin = f"part-eq-e$epochId%05d-$nonce-$i%05d.parquet"
          CommitSink.io.promote(CommitSink.stagingDir(dir, nonce).resolve(n), dir.resolve(fin))
          promotedEq += (fin -> k)
        }
        val stats = manifest.map(_.stats).getOrElse(Map.empty) ++
          promoted.filter(_._2.nonEmpty).toMap
        CommitSink.writeManifest(dir, schema.toDDL,
          carried ++ promoted.map(_._1),
          prev + 1, manifest.map(_.epochs).getOrElse(Seq.empty) :+ epochId,
          expectedPrev = prev, stats = stats,
          tableId = CommitSink.carriedOrFreshTableId(manifest),
          payload = payload,
          // an epoch append never touches existing rows: vectors carry
          deletes = manifest.map(_.deletes).getOrElse(Map.empty),
          // this epoch's files join at the new sequence; its key file
          // (upsert mode) covers everything strictly older (o32)
          fileSeq = manifest.map(_.fileSeq).getOrElse(Map.empty) ++
            promoted.map(_._1 -> (prev + 1)),
          eqDeletes = manifest.map(_.eqDeletes).getOrElse(Seq.empty) ++
            promotedEq.map { case (n, k) =>
              CommitSink.EqDelete(n, prev + 1, k, upsertKeys.mkString(";")) },
          blooms = manifest.map(_.blooms).getOrElse(Map.empty))
      } catch { case e: Throwable =>
        // a refused epoch commit (e.g. a batch DML raced this trigger)
        // must leave no trace — same contract as the batch commit
        promoted.foreach(p => CommitSink.io.deleteIfExists(dir.resolve(p._1)))
        promotedEq.foreach(p => CommitSink.io.deleteIfExists(dir.resolve(p._1)))
        CommitSink.sweepStaging(dir, nonce)
        throw e
      }
    }
    CommitSink.sweepStaging(dir, nonce)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CommitSink.sweepStaging(dir, nonce)
}

class CommitStreamingWriterFactory(path: String, ddl: String, nonce: String,
                                   payload: String = "json",
                                   upsertKeys: Seq[String] = Seq.empty)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    if (upsertKeys.isEmpty)
      new CommitDataWriter(path, ddl, partitionId, taskId, epochId,
        stagingSub = nonce, payload = payload)
    else new UpsertDataWriter(path, ddl, upsertKeys, partitionId, taskId,
      epochId, nonce, None)
}

class CommitBatchWrite(path: String, schema: StructType, truncate: Boolean,
                       partCol: Option[String] = None,
                       rewrite: Option[CommitSink.DmlRewrite] = None,
                       payload: String = "json",
                       upsertKeys: Seq[String] = Seq.empty,
                       /** WAP staging (o41): land the version manifest,
                         * skip the swap — see CommitSink.publishStaged. */
                       stage: Boolean = false,
                       /** Branch commit (o44): plan against and advance
                         * the named branch head — main never moves. */
                       branch: Option[String] = None)
    extends BatchWrite {
  private val dir = Paths.get(path)

  /** The manifest this commit composes with: the branch head for branch
    * commits, else main's current manifest. */
  private def planningManifest: Option[CommitSink.Manifest] = branch match {
    case Some(b) => Some(CommitSink.parseManifestVersion(dir,
      CommitSink.branchHead(dir, b)))
    case None => CommitSink.parseManifest(dir)
  }
  /** This write's identity: names its private staging subdirectory AND
    * makes its promoted file names attempt-unique. */
  private val nonce = CommitSink.writeNonce()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    CommitSink.io.createDirectories(CommitSink.stagingDir(dir, nonce))
    // ship the schema as DDL text — StructType itself is serializable,
    // but the DDL is also exactly what the manifest records
    new CommitWriterFactory(path, schema.toDDL, partCol, nonce, payload,
      upsertKeys)
  }

  /** How many times an APPEND re-reads + re-swaps after losing the CAS
    * race. Appends compose (carried ∪ promoted is order-independent), so
    * retrying is always safe; truncates and rewrites are NOT retried —
    * their content was computed against a snapshot the race invalidated,
    * so the whole statement must re-run. */
  private val APPEND_CAS_RETRIES = 5

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // unwrap upsert messages: data files commit like any append, the
    // staged key files become this commit's equality delete (o32)
    val eqStaged: Seq[(String, Long)] = messages.collect {
      case UpsertTaskResult(_, n, k) if n.nonEmpty => (n, k)
    }.toSeq
    val staged = messages.map {
      case UpsertTaskResult(d, _, _) => d
      case m => m
    }.flatMap {
      case s: StagedFile => Seq(s)
      case StagedFileSet(fs) => fs
      case _ => Seq.empty
    }.toSeq
    // phase 2: promote each task-committed staging file to its final
    // name. Only files named by a commit message are promoted — output of
    // failed/speculative attempts stays in staging and is swept at the
    // end. Names carry a per-write nonce, so a racing writer that loses
    // the CAS below can never have renamed onto a committed file — and a
    // lost race leaves only unreferenced garbage, which the failure
    // handler below (and any later sweep) removes.
    val plannedId = rewrite.map(_.planning.commit + 1)
      .getOrElse(CommitSink.currentCommit(dir) + 1)
    // promotion runs INSIDE the cleanup scope: an ATOMIC_MOVE failing
    // partway must delete the already-promoted names and sweep staging,
    // exactly like a refused manifest swap — otherwise the partial
    // promotion leaves unreferenced garbage only abort()/orphan GC
    // would ever reclaim
    val promoted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val promotedEq = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      staged.zipWithIndex.foreach { case (s, i) =>
        val fin = f"part-c$plannedId%05d-$nonce-$i%05d.$payload%s"
        CommitSink.io.promote(CommitSink.stagingDir(dir, nonce).resolve(s.name), dir.resolve(fin))
        promoted += (fin -> s.stats)
      }
      val newStats = promoted.filter(_._2.nonEmpty).toMap
      // promote the upsert key files alongside (same failure contract:
      // a refused swap deletes them via promotedEq below)
      val newEq = eqStaged.zipWithIndex.map { case ((n, k), i) =>
        val fin = f"part-eq-c$plannedId%05d-$nonce-$i%05d.parquet"
        CommitSink.io.promote(CommitSink.stagingDir(dir, nonce).resolve(n), dir.resolve(fin))
        promotedEq += fin
        (fin, k)
      }
      rewrite match {
        case Some(rw) => commitRewrite(rw, promoted.map(_._1).toSeq, newStats)
        case None if truncate => commitTruncate(promoted.map(_._1).toSeq, newStats)
        case None => commitAppend(promoted.map(_._1).toSeq, newStats, newEq)
      }
    } catch { case e: Throwable =>
      // a refused/failed commit must leave no trace: the manifest was
      // never swapped, so the promoted files are invisible garbage —
      // remove them so the target is byte-identical to before the write
      promoted.foreach(p => CommitSink.io.deleteIfExists(dir.resolve(p._1)))
      promotedEq.foreach(n => CommitSink.io.deleteIfExists(dir.resolve(n)))
      CommitSink.sweepStaging(dir, nonce)
      throw e
    }
    CommitSink.sweepStaging(dir, nonce)
  }

  /** Group-granular replace (row-level DML / compaction / metadata
    * delete): replace exactly the files the operation's scan planned,
    * carry every other file of the PLANNING manifest forward verbatim,
    * and CAS against the planning commit — a commit that landed while
    * the rewrite job ran fails the swap loudly. */
  private def commitRewrite(rw: CommitSink.DmlRewrite, newFiles: Seq[String],
                            newStats: Map[String, String]): Unit = {
    val planning = rw.planning
    val scanned = rw.scanned()
    val carried = planning.files.filterNot(scanned)
    require(carried.isEmpty || CommitSink.sameColumns(planning.ddl, schema.toDDL),
      s"graft-commit: rewrite schema mismatch at $path — carried files have " +
        s"[${planning.ddl}] but this rewrite writes [${schema.toDDL}]")
    // carried files keep their recorded stats verbatim; a group rewrite
    // CARRIES the epoch ledger (content lineage is continuous — see the
    // row-level operation scaladoc)
    val stats = planning.stats.view.filterKeys(carried.toSet).toMap ++ newStats
    CommitSink.writeManifest(dir, schema.toDDL, carried ++ newFiles,
      planning.commit + 1, planning.epochs, expectedPrev = planning.commit,
      partCol = partCol, stats = stats,
      tableId = CommitSink.carriedOrFreshTableId(Some(planning)),
      payload = planning.payload,
      // carried files keep their deletion vectors; a REPLACED file's
      // vector dies with it — the rewrite's scan already applied it,
      // so the new files hold only surviving rows (compaction's
      // materialize-the-deletes path falls out of this line)
      deletes = planning.deletes.view.filterKeys(carried.toSet).toMap,
      // rewritten files land ABOVE every existing equality delete's
      // sequence (the scan applied those deletes too); entries no
      // carried file is still covered by retire centrally (o32)
      fileSeq = planning.fileSeq ++ newFiles.map(_ -> (planning.commit + 1)),
      eqDeletes = planning.eqDeletes,
      // carried files keep their blooms; a replaced file's index dies
      // with it (the new files are un-indexed until the next build)
      blooms = planning.blooms)
    // replaced files are NOT swept: the planning version's immutable
    // manifest references every one of them (time travel); snapshot
    // expiry GC's them when their last referencing version is dropped
  }

  /** Whole-table overwrite: new version is exactly the promoted set; the
    * streaming-epoch ledger resets (a truncate is a new content lineage).
    *
    * No commit-time file sweep: every previous-version file is
    * referenced by its immutable version manifest (time travel), and a
    * data file referenced by NO manifest is either a crash leftover
    * (this writer's failure handler already deletes a refused commit's
    * promoted files) or — since appends became concurrent — another
    * writer's promoted-but-not-yet-committed output, which a sweep here
    * would DELETE out from under its CAS-retry. Unreferenced leftovers
    * are [[CommitSink.expireVersions]]'s job, the maintenance operation
    * whose coordination contract is documented. */
  private def commitTruncate(newFiles: Seq[String],
                             newStats: Map[String, String]): Unit = {
    val manifest = planningManifest
    val prev = manifest.map(_.commit).getOrElse(-1L)
    // branch commits allocate in the disjoint high range — main's
    // prev+1 can never collide with a branch version file
    val next = branch.fold(prev + 1)(_ => CommitSink.nextBranchVersionId(dir))
    // a truncate is a fresh content lineage: sequences restart and any
    // equality deletes die with the content they scoped (o32 default)
    CommitSink.writeManifest(dir, schema.toDDL, newFiles, next,
      Seq.empty, expectedPrev = prev, partCol = partCol, stats = newStats,
      tableId = CommitSink.carriedOrFreshTableId(manifest), payload = payload,
      fileSeq = newFiles.map(_ -> next).toMap, stageOnly = stage,
      branch = branch)
  }

  /** Append: carried ∪ promoted under a CAS on the read manifest — and
    * because appends compose, a LOST race is retried: re-read the
    * manifest, re-run the compatibility checks against the new current
    * version, and re-swap carrying the interleaved writer's files. The
    * promoted files are already at their final (nonce-unique) names, so
    * a retry only rebuilds the manifest — no file is touched twice. */
  private def commitAppend(newFiles: Seq[String],
                           newStats: Map[String, String],
                           newEq: Seq[(String, Long)] = Seq.empty): Unit = {
    val upsertCols = upsertKeys.mkString(";")
    var attempt = 0
    while (true) {
      val manifest = planningManifest
      val prev = manifest.map(_.commit).getOrElse(-1L)
      // branch commits allocate in the disjoint high range (the CAS
      // stays against the branch head); main keeps contiguous prev+1
      val next = branch.fold(prev + 1)(_ => CommitSink.nextBranchVersionId(dir))
      val carriedDdl = manifest.map(_.ddl).getOrElse(schema.toDDL)
      val carried = manifest.map(_.files).getOrElse(Seq.empty)
      // Appending under a DIFFERENT column set would re-read carried files
      // as silent nulls under the new DDL — refuse BEFORE swapping
      // anything (names + types; nullability does not change the payload).
      require(carried.isEmpty || CommitSink.sameColumns(carriedDdl, schema.toDDL),
        s"graft-commit: append schema mismatch at $path — manifest has " +
          s"[$carriedDdl] but this write has [${schema.toDDL}]; use " +
          "overwrite (truncate) to replace the table under a new schema")
      // A partitioned table's layout guarantee (one key per file) holds only
      // if every version's files were written under the SAME partition
      // column — an append under a different (or no) partitioning would mix
      // layouts, so refuse it like a schema mismatch.
      val carriedPartCol = manifest.flatMap(_.partCol)
      require(carried.isEmpty || carriedPartCol == partCol,
        s"graft-commit: partition-layout mismatch at $path — manifest has " +
          s"partitionBy=$carriedPartCol but this write has partitionBy=$partCol; " +
          "use overwrite (truncate) to change the table layout")
      // carried files must share this write's decoder — re-checked per
      // retry in case a truncate switched the payload mid-race
      require(carried.isEmpty || manifest.forall(_.payload == payload),
        s"graft-commit: payload mismatch at $path — the table is " +
          s"'${manifest.map(_.payload).getOrElse("?")}' but this append " +
          s"staged '$payload' files; use overwrite (truncate) to switch")
      val stats = manifest.map(_.stats).getOrElse(Map.empty) ++ newStats
      try {
        CommitSink.writeManifest(dir, schema.toDDL, carried ++ newFiles,
          next, manifest.map(_.epochs).getOrElse(Seq.empty),
          expectedPrev = prev, partCol = partCol, stats = stats,
          tableId = CommitSink.carriedOrFreshTableId(manifest),
          payload = payload,
          // an append never touches existing rows: vectors carry verbatim
          deletes = manifest.map(_.deletes).getOrElse(Map.empty),
          // new files join at THIS commit's sequence — what scopes any
          // same-commit (or future) equality delete off them (o32)
          fileSeq = manifest.map(_.fileSeq).getOrElse(Map.empty) ++
            newFiles.map(_ -> next),
          eqDeletes = manifest.map(_.eqDeletes).getOrElse(Seq.empty) ++
            newEq.map { case (n, k) => CommitSink.EqDelete(n, next, k, upsertCols) },
          blooms = manifest.map(_.blooms).getOrElse(Map.empty),
          stageOnly = stage, branch = branch)
        return
      } catch { case e: CommitSink.ConcurrentCommitException =>
        attempt += 1
        if (attempt > APPEND_CAS_RETRIES) throw e
        // another writer won the race: loop — re-read THEIR manifest and
        // append on top of it
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // a failed job publishes NOTHING: the manifest was never touched, so
    // the previous version is still the table; just remove the debris
    CommitSink.sweepStaging(dir, nonce)
}

class CommitWriterFactory(path: String, ddl: String,
                          partCol: Option[String] = None,
                          nonce: String = "",
                          payload: String = "json",
                          upsertKeys: Seq[String] = Seq.empty) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    if (upsertKeys.isEmpty)
      new CommitDataWriter(path, ddl, partitionId, taskId, partCol = partCol,
        stagingSub = nonce, payload = payload)
    else new UpsertDataWriter(path, ddl, upsertKeys, partitionId, taskId,
      -1L, nonce, partCol)
}

/** o32 UPSERT task writer: delegates data rows to the ordinary staged
  * writer AND collects the batch's DISTINCT key tuples, staging them as
  * one parquet key file per task at commit — the write that makes
  * "replace these keys" a ZERO-READ operation (the commit records the
  * key file as an equality delete scoped to strictly-older files; the
  * task never opens a committed byte). The caller's batch is expected
  * key-unique: two same-key rows in ONE batch both land (they share the
  * commit's sequence, so neither covers the other) — dedup the batch
  * first, exactly like a foreachBatch MERGE source. A NULL key never
  * equality-matches anything: the row lands, no key is recorded. */
class UpsertDataWriter(path: String, ddl: String, keys: Seq[String],
                       partitionId: Int, taskId: Long, epochId: Long,
                       nonce: String, partCol: Option[String])
    extends DataWriter[InternalRow] {
  private val delegate = new CommitDataWriter(path, ddl, partitionId, taskId,
    epochId, partCol, nonce, "parquet")
  private val schema = StructType.fromDDL(ddl)
  private val keyIdx = keys.map(schema.fieldIndex).toArray
  private val keySchema = StructType(keys.map(k => schema(schema.fieldIndex(k))))
  private val seen = scala.collection.mutable.HashSet.empty[Seq[Any]]
  private var fieldOffset = -1

  override def write(row: InternalRow): Unit = {
    if (fieldOffset < 0) fieldOffset = row.numFields - schema.length
    delegate.write(row)
    var k = 0
    var hasNull = false
    val vals = new Array[Any](keyIdx.length)
    while (k < keyIdx.length && !hasNull) {
      val j = keyIdx(k) + fieldOffset
      if (row.isNullAt(j)) hasNull = true
      else vals(k) = schema(keyIdx(k)).dataType match {
        // copy strings: the incoming row's buffer is reused per row
        case StringType => row.getUTF8String(j).copy()
        case LongType | TimestampType | TimestampNTZType => row.getLong(j)
        case IntegerType | DateType => row.getInt(j)
        case ShortType   => row.getShort(j)
        case ByteType    => row.getByte(j)
        case BooleanType => row.getBoolean(j)
        case t => sys.error(s"unreachable: $t validated at build()")
      }
      k += 1
    }
    if (!hasNull) seen += vals.toSeq
  }

  override def commit(): WriterCommitMessage = {
    val dataMsg = delegate.commit()
    if (seen.isEmpty) return UpsertTaskResult(dataMsg, "", 0L)
    val name = s"attempt-eq-e$epochId-p$partitionId-t$taskId.parquet"
    val file = CommitSink.stagingDir(Paths.get(path), nonce).resolve(name)
    val msg = ParquetPayload.message(keySchema)
    val factory =
      new org.apache.parquet.example.data.simple.SimpleGroupFactory(msg)
    val w = ParquetPayload.writer(file, msg)
    try seen.foreach { vals =>
      w.write(ParquetPayload.toGroup(factory, keySchema,
        new GenericInternalRow(vals.toArray), 0))
    } finally w.close()
    UpsertTaskResult(dataMsg, name, seen.size.toLong)
  }
  // this attempt's staged key file is swept with the staging dir; the
  // delegate removes its own data segments
  override def abort(): Unit = delegate.abort()
  override def close(): Unit = ()
}

/** Executor-side writer: streams rows to a task-private staging file as
  * JSON lines. The (epoch, partitionId, taskId) triple makes the name
  * unique per ATTEMPT, so a speculative retry (or a replayed epoch) can
  * never clobber another attempt's staging output.
  *
  * While writing, the writer also collects the per-file statistics the
  * manifest records (o14/o15): row count, byte size, and min/max per
  * numeric column — the zone-map index, built during the write's one
  * pass exactly like a parquet footer. Under `partCol` (o16) the task's
  * input arrives clustered AND sorted by the partition key (the write
  * declared RequiresDistributionAndOrdering), so the writer simply rolls
  * to a fresh staged file on each key change — every committed file
  * holds one key, recorded as `pk` in its stats. */
class CommitDataWriter(path: String, ddl: String, partitionId: Int, taskId: Long,
                       epochId: Long = -1L, partCol: Option[String] = None,
                       stagingSub: String = "", payload: String = "json")
    extends DataWriter[InternalRow] {
  private val schema = StructType.fromDDL(ddl)
  private val staging = CommitSink.stagingDir(Paths.get(path), stagingSub)
  private val parquet = payload == "parquet"
  private val msgType = if (parquet) ParquetPayload.message(schema) else null
  private val groupFactory =
    if (parquet) new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
    else null

  // --- statistics collection (reset per staged segment) -------------------
  // stats are recorded only for clean [A-Za-z0-9_] column names — the
  // encoding's separator chars must never appear in a recorded name.
  // The 'l' family covers every integral-representation type (ints of
  // all widths, DATE days, TIMESTAMP/NTZ micros), 'd' the fractional
  // ones (double, float widened exactly) — so zone maps prune
  // date/timestamp range scans on parquet-payload tables too.
  private val statKind: Array[Char] = schema.fields.map { f =>
    if (!f.name.matches("[A-Za-z0-9_]+")) ' '
    else f.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DateType |
           TimestampType | TimestampNTZType => 'l'
      case DoubleType | FloatType => 'd'
      case _ => ' '
    }
  }
  private val seen = new Array[Boolean](schema.length)
  /** Columns whose segment saw a NaN: no range recorded (see noteD). */
  private val nanPoisoned = new Array[Boolean](schema.length)
  private val minL = new Array[Long](schema.length)
  private val maxL = new Array[Long](schema.length)
  private val minD = new Array[Double](schema.length)
  private val maxD = new Array[Double](schema.length)
  private def resetStats(): Unit = {
    java.util.Arrays.fill(seen, false)
    java.util.Arrays.fill(nanPoisoned, false)
  }
  private def noteL(i: Int, v: Long): Unit =
    if (!seen(i)) { seen(i) = true; minL(i) = v; maxL(i) = v }
    else { if (v < minL(i)) minL(i) = v; if (v > maxL(i)) maxL(i) = v }
  private def noteD(i: Int, v: Double): Unit =
    // A NaN POISONS the column's range for this segment: Spark SQL's
    // total order puts NaN ABOVE every value (`value > 95.0` is TRUE
    // for a NaN row), so a NaN-free recorded range would let
    // `GreaterThan` prune a file whose NaN rows actually match — a
    // silently-missing row on reads and, worse, an un-deleted row on
    // the metadata DELETE path. A poisoned column records NO range
    // (absent stats = never prune), which is sound at the cost of
    // pruning only on NaN-containing files.
    if (v.isNaN) nanPoisoned(i) = true
    else if (!nanPoisoned(i)) {
      if (!seen(i)) { seen(i) = true; minD(i) = v; maxD(i) = v }
      else { if (v < minD(i)) minD(i) = v; if (v > maxD(i)) maxD(i) = v }
    }
  /** Range notes for the parquet branch (the JSON encoder notes inline
    * while formatting) — one pass over the row's stat-eligible fields. */
  private def noteRow(row: InternalRow): Unit = {
    var i = 0
    while (i < schema.length) {
      val j = i + fieldOffset
      if (statKind(i) != ' ' && !row.isNullAt(j)) schema(i).dataType match {
        case LongType | TimestampType | TimestampNTZType => noteL(i, row.getLong(j))
        case IntegerType | DateType => noteL(i, row.getInt(j).toLong)
        case ShortType  => noteL(i, row.getShort(j).toLong)
        case ByteType   => noteL(i, row.getByte(j).toLong)
        case DoubleType => noteD(i, row.getDouble(j))
        case FloatType  => noteD(i, row.getFloat(j).toDouble) // exact widening
        case _ => ()
      }
      i += 1
    }
  }

  private def encodeStats(bytes: Long, pk: Option[Long]): String =
    CommitSink.FileStat(rows, bytes, pk,
      schema.fields.iterator.zipWithIndex.collect {
        case (f, i) if seen(i) && statKind(i) == 'l' =>
          f.name -> CommitSink.ColRange('l', minL(i).toString, maxL(i).toString)
        case (f, i) if seen(i) && !nanPoisoned(i) && statKind(i) == 'd' =>
          f.name -> CommitSink.ColRange('d', minD(i).toString, maxD(i).toString)
      }.toMap).encode

  // --- staged segments -----------------------------------------------------
  private val partSpec: Option[CommitSink.PartSpec] =
    partCol.map(CommitSink.PartSpec.parse)
  private val partIdx: Int =
    partSpec.map(s => schema.fieldIndex(s.sourceCol)).getOrElse(-1)
  private var segOrdinal = 0
  private var name: String = _
  private var file: Path = _
  private var out: java.io.BufferedWriter = _
  private var pw: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private var rows = 0L
  private var curKey = 0L
  private var done = List.empty[StagedFile]

  private def segActive: Boolean = if (parquet) pw != null else out != null

  private def openSegment(): Unit = {
    name = if (partIdx < 0) s"attempt-e$epochId-p$partitionId-t$taskId.$payload"
           else f"attempt-e$epochId-p$partitionId-t$taskId-s$segOrdinal%04d.$payload%s"
    segOrdinal += 1
    file = staging.resolve(name)
    if (parquet) pw = ParquetPayload.writer(file, msgType)
    else out = CommitSink.io.newBufferedWriter(file)
    rows = 0L
    resetStats()
  }

  private def closeSegment(): Unit = {
    if (parquet) { pw.close(); pw = null } else { out.close(); out = null }
    done ::= StagedFile(name, rows,
      encodeStats(CommitSink.io.size(file), if (partIdx < 0) None else Some(curKey)))
  }

  // unpartitioned tasks stage ONE file, opened eagerly so an empty task
  // still commits a (zero-row) file — the pre-partitioning behavior
  if (partIdx < 0) openSegment()

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Leading fields to skip, resolved from the first row. Normal writes
    * have rows matching the declared schema (offset 0). The GROUP-BASED
    * row-level path (ReplaceData) prepends an internal `__row_operation`
    * INT column to the write query but — when the operation declares no
    * metadata attributes — executes with the projection-less
    * DataWritingSparkTask, so the marker column reaches the writer
    * (ReplaceDataExec.writingTask only projects when a metadata
    * projection exists). The declared schema stays authoritative; rows
    * are read at `i + fieldOffset`. */
  private var fieldOffset = -1

  override def write(row: InternalRow): Unit = {
    if (fieldOffset < 0) {
      fieldOffset = row.numFields - schema.length
      require(fieldOffset == 0 || fieldOffset == 1,
        s"graft-commit: row has ${row.numFields} fields for ${schema.length}-column schema")
      if (fieldOffset == 1) {
        // an offset assumes the extra field is the PREPENDED operation
        // marker; verify field 0 actually reads as a plausible op code
        // (RowDeltaUtils: 1..6) so a future plan shape that APPENDS the
        // extra column fails loudly instead of committing shifted data
        val op = row.getInt(0)
        require(op >= 1 && op <= 6,
          s"graft-commit: leading field $op is not a row-operation marker; " +
            "refusing to skip it (unknown row layout)")
      }
    }
    if (partIdx >= 0) {
      val pi = partIdx + fieldOffset
      require(!row.isNullAt(pi),
        s"graft-commit: NULL partition key in column " +
          s"'${partSpec.get.sourceCol}' — partitioning requires non-null keys")
      val raw = schema(partIdx).dataType match {
        // timestamps are physically micros longs; dates are day ints
        case LongType | TimestampType | TimestampNTZType => row.getLong(pi)
        case _ => row.getInt(pi).toLong
      }
      // identity records the key itself; transforms record the
      // TRANSFORMED key (bucket id / truncated band / epoch day) —
      // what the write's declared clustering + sort grouped the input by
      val k = partSpec.get.keyOf(raw, schema(partIdx).dataType)
      // input is clustered AND sorted by the key — a key change is a
      // segment boundary, and a key can never reappear later
      if (!segActive || k != curKey) {
        if (segActive) closeSegment()
        curKey = k
        openSegment()
      }
    }
    if (parquet) {
      pw.write(ParquetPayload.toGroup(groupFactory, schema, row, fieldOffset))
      noteRow(row)
      rows += 1
      return
    }
    val b = new StringBuilder("{")
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i0) =>
      val i = i0 + fieldOffset
      if (!row.isNullAt(i)) {
        if (!first) b.append(',')
        first = false
        b.append('"').append(f.name).append("\":")
        f.dataType match {
          case LongType    => val v = row.getLong(i); noteL(i0, v); b.append(v)
          case IntegerType => val v = row.getInt(i); noteL(i0, v.toLong); b.append(v)
          // Double.toString is shortest-round-trip: the reader gets the
          // identical bits back (NaN/Infinity rely on Spark's default
          // allowNonNumericNumbers JSON option)
          case DoubleType  => val v = row.getDouble(i); noteD(i0, v); b.append(v)
          case BooleanType => b.append(row.getBoolean(i))
          case StringType  => b.append('"').append(esc(row.getUTF8String(i).toString)).append('"')
          case t => sys.error(s"unreachable: $t validated at build()")
        }
      }
    }
    out.write(b.append('}').toString)
    out.newLine()
    rows += 1
  }

  /** Phase 1: make the staging file(s) durable and hand their names to
    * the driver. NOT visible to readers until the driver's manifest swap.
    * Unpartitioned tasks return their single [[StagedFile]] (the original
    * contract); partitioned tasks return the per-key [[StagedFileSet]]. */
  override def commit(): WriterCommitMessage =
    if (partIdx < 0) { closeSegment(); done.head }
    else { if (segActive) closeSegment(); StagedFileSet(done.reverse) }

  /** Task abort: this attempt's output must leave no trace — the open
    * segment AND every segment it already closed. */
  override def abort(): Unit = {
    if (segActive) {
      if (parquet) pw.close() else out.close()
      CommitSink.io.deleteIfExists(file)
    }
    done.foreach(s => CommitSink.io.deleteIfExists(staging.resolve(s.name)))
  }
  override def close(): Unit = ()
}

// --- the DSv2 batch READ over the committed snapshot ----------------------

/** Filter pushdown here exists for SKIPPING, not evaluation: pushFilters
  * returns EVERY filter as residual (Spark re-evaluates the full
  * condition above the scan), and the skippable subset is used solely to
  * prune whole files by their manifest-recorded ranges — the parquet
  * row-group / Iceberg data-file skipping contract, where stats are an
  * optimization and never a correctness dependency.
  *
  * Column pruning (SupportsPushDownRequiredColumns) reaches the reader:
  * the JSON-line decoder materializes ONLY requested fields, so a 2-column
  * projection of a 50-column table parses 2 values per row. Aggregate
  * pushdown (SupportsPushDownAggregates) goes further — an unfiltered,
  * ungrouped COUNT(*)/MIN/MAX is answered ENTIRELY from the manifest's
  * per-file statistics (one row, zero data files opened): the Iceberg
  * metadata-only query. Spark only attempts aggregate pushdown when no
  * Filter remains between the aggregate and the scan, and this builder
  * keeps every filter residual — so the metadata path is structurally
  * unreachable under a WHERE clause, never merely "hoped correct". */
class CommitScanBuilder(path: String, version: Option[Long] = None,
                        /** Set for row-level-operation (UPDATE/MERGE/
                          * DELETE-rewrite) scans: the scan binds to the
                          * operation's PLANNING manifest and reports the
                          * file set it planned back to the operation —
                          * the group-granular replace contract. Zone-map
                          * pruning of the pushed DML condition is safe
                          * here: a pruned file is carried forward by the
                          * rewrite commit, never deleted. */
                        dmlOp: Option[CommitRowLevelOperation] = None,
                        /** Streaming-read admission knob (o20): how many
                          * COMMITS one micro-batch may consume. */
                        maxCommitsPerTrigger: Int = Int.MaxValue,
                        /** Pin the scan to THIS manifest (the delta
                          * row-level operation's planning snapshot —
                          * like dmlOp's pin, but with no scanned-files
                          * reporting: a delta commit replaces no
                          * files). */
                        pinned: Option[CommitSink.Manifest] = None,
                        /** Opt-in changelog SELF-SERVICE RECOVERY: when a
                          * rewrite or generation change fires the
                          * append-only check, re-bootstrap from the
                          * current snapshot instead of refusing (see
                          * [[CommitTableMicroBatchStream]]). */
                        snapshotOnRewrite: Boolean = false,
                        /** CHANGE DATA FEED mode (o29): build a
                          * [[CommitChangesScan]] instead of a row scan.
                          * Pushdown declines wholesale — the feed's
                          * output is the change rows themselves. */
                        changeFeed: Boolean = false,
                        startingVersion: Option[Long] = None,
                        endingVersion: Option[Long] = None)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources.Filter
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}

  /** ROOT view (r16): header + group refs, no per-file entries loaded —
    * what every pre-build decision (schema, pushdown eligibility) needs.
    * On a single-level table this IS the full manifest; DML/pinned scans
    * arrive already resolved. The read happens once, here: the builder's
    * decisions and the scan must bind to ONE snapshot. */
  private val root =
    dmlOp.map(_.planning).orElse(pinned).orElse(version match {
      case Some(v) =>
        val mf = Paths.get(path).resolve(CommitSink.versionFile(v))
        require(CommitSink.io.exists(mf),
          s"graft-commit: no version $v at $path (have: " +
            CommitSink.listVersions(Paths.get(path)).mkString(", ") + ")")
        Some(CommitSink.parseManifestText(CommitSink.io.readString(mf), mf.toString))
      case None => CommitSink.parseManifestRoot(Paths.get(path))
    })
  /** The fully-resolved manifest — forced only by paths that genuinely
    * need every per-file entry (metadata aggregation, unfiltered scans,
    * the change feed). */
  private lazy val manifest =
    root.map(CommitSink.resolveGroups(Paths.get(path), _))
  private def fullSchema: StructType =
    root.map(m => StructType.fromDDL(m.ddl)).getOrElse(new StructType())

  private var skip: Array[Filter] = Array.empty
  private var required: Option[StructType] = None
  private var aggs: Array[AggregateFunc] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Zone-map file skipping applies to DML scans too: Spark pushes the
    // UPDATE/DELETE condition here, a file whose ranges prove no row can
    // match is never scanned — and under the GROUP-GRANULAR rewrite an
    // unscanned file is CARRIED in the manifest, never deleted, so the
    // prune is safe by construction (the r11 whole-table-truncate design
    // had to decline pruning; LakeSpec's 4-file range-partitioned UPDATE
    // now pins both no-data-loss AND the 1-rewritten/3-carried split).
    if (!changeFeed) skip = filters.filter(CommitSkip.usable)
    filters
  }
  override def pushedFilters(): Array[Filter] = skip

  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (changeFeed) return // the feed's schema is fixed: rows + CDF columns
    // keep the manifest's field order; empty projection (COUNT(*)) is legal
    val data = fullSchema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name))
    // the _file/_pos METADATA columns (o21/o27) — appended after the
    // data columns when the plan asked for them (and no data column
    // claims the name, in which case the table never exposed the
    // metadata column); fixed order `_file` then `_pos`, mirrored by
    // the readers' stamping
    def meta(name: String, dt: DataType) =
      if (requiredSchema.fieldNames.contains(name) &&
          !fullSchema.fieldNames.contains(name))
        Array(StructField(name, dt, nullable = false))
      else Array.empty[StructField]
    required = Some(StructType(data ++
      meta(CommitSink.FILE_COL, StringType) ++
      meta(CommitSink.POS_COL, LongType)))
  }

  /** A column whose manifest stats can answer MIN/MAX soundly: integral
    * only. A double column may hold NaN values, which the recorded
    * ranges deliberately exclude (NaN sorts ABOVE everything in Spark),
    * so a stats-served MAX(double) could be wrong — declined. A file
    * with rows but no recorded range for an integral column holds only
    * NULLs there, which MIN/MAX ignore — sound. */
  private def statableLong(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        val name = r.fieldNames()(0)
        // the name gate must MATCH the writer's statKind rule: a column
        // the writer never records ranges for (separator chars in the
        // name) would read "absent stats = all NULL" and answer NULL
        name.matches("[A-Za-z0-9_]+") &&
          fullSchema.fields.find(_.name == name)
            .exists(f => f.dataType == LongType || f.dataType == IntegerType)
      case _ => false
    }

  /** COMPLETE pushdown: the manifest's totals are exact, so the scan
    * emits the final one-row answer and Spark plans no aggregate at all. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    pushAggregation(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (changeFeed) return false
    if (aggregation.groupByExpressions.nonEmpty) return false
    if (skip.nonEmpty) return false // unreachable (see scaladoc); belt+braces
    // every surviving file must carry stats, or the totals are unknown
    val m = manifest.getOrElse(return false)
    if (!m.files.forall(m.stats.contains)) return false
    val funcs = aggregation.aggregateExpressions
    // equality deletes (o32) decline wholesale: how many rows a key file
    // matches is unknowable without scanning — there is no live-rows
    // arithmetic for them (convertEqDeletes restores the metadata path)
    if (m.eqDeletes.nonEmpty) return false
    // deletion vectors (o27): COUNT stays metadata-only — live rows =
    // physical rows minus recorded vector counts (Iceberg's live-rows
    // arithmetic). MIN/MAX decline: a deleted row may hold the extremum,
    // and the recorded ranges are physical.
    val hasDvs = m.files.exists(m.deletes.contains)
    val ok = funcs.nonEmpty && funcs.forall {
      case _: CountStar => true
      case f: Min => !hasDvs && statableLong(f.column)
      case f: Max => !hasDvs && statableLong(f.column)
      case _ => false
    }
    if (ok) aggs = funcs
    ok
  }

  override def build(): Scan =
    if (changeFeed)
      new CommitChangesScan(path,
        manifest.getOrElse(
          sys.error(s"graft-commit: no committed manifest at $path")),
        startingVersion, endingVersion, maxCommitsPerTrigger, snapshotOnRewrite)
    else if (aggs.nonEmpty) new CommitMetaAggScan(path, manifest.get, aggs)
    else {
      // MANIFEST-LIST prune (r16): a filtered plain read of a two-level
      // table resolves ONLY the groups whose summary ranges may match —
      // planning work scales with matching groups, not total files. DML
      // scans resolve fully (the group-granular rewrite must CARRY every
      // unscanned file, so its planning manifest has to list them all);
      // so do unfiltered scans (they plan everything anyway).
      val m = root match {
        case Some(r) if dmlOp.isEmpty && r.unresolvedRoot && skip.nonEmpty =>
          // groups prune by zone summary AND (o45) by key projection:
          // a temporal/range predicate on the partition source column
          // maps to a key interval tested against the group's recorded
          // pk span — no per-column zone entry needed in the summary
          val spec = r.partCol.map(CommitSink.PartSpec.parse)
          CommitSink.resolveGroups(Paths.get(path), r, { g =>
            val st = CommitSink.FileStat.decode(g.stat)
            skip.forall(CommitSkip.mayMatch(_, st)) &&
              spec.forall(sp => st.cols.get(CommitSink.GROUP_PK).forall { pr =>
                skip.forall(f => CommitSink.keyIntervalOf(sp, f).forall {
                  case (lo, hi) => pr.max.toLong >= lo && pr.min.toLong <= hi
                })
              })
          })
        case _ => manifest.getOrElse(
          sys.error(s"graft-commit: no committed manifest at $path"))
      }
      // hand the scan the manifest THIS builder's pushdown decisions were
      // made against — a second disk read here could bind the scan to a
      // concurrently-swapped snapshot with a different schema
      new CommitScan(path, m,
        version, skip, required, dmlOp, maxCommitsPerTrigger, snapshotOnRewrite)
    }
}

/** The CHANGE DATA FEED scan (o29) — `option("readChangeFeed", true)`:
  * rows plus `_change_type` ('insert' | 'delete') and
  * `_commit_version`, per commit, for the version range
  * [`startingVersion` (default 0), `endingVersion` (default current)].
  * Inserts come from files a commit added; deletes from deletion-
  * vector diffs on unchanged files — which is why the feed exists at
  * all: the vector representation makes a DELETE's delta expressible
  * as rows (merge-on-read updates surface as delete+insert, their
  * physical form). Rewrites refuse, like the plain changelog. The
  * same per-commit planner backs [[toMicroBatchStream]], so the batch
  * and streaming feeds are one code path. */
class CommitChangesScan(path: String, manifest: CommitSink.Manifest,
                        startingVersion: Option[Long],
                        endingVersion: Option[Long],
                        maxCommitsPerTrigger: Int,
                        snapshotOnRewrite: Boolean)
    extends Scan with Batch {
  private val dir = Paths.get(path)
  require(manifest.payload == "parquet" || manifest.files.isEmpty,
    s"graft-commit: the change feed requires the parquet payload " +
      s"($path is '${manifest.payload}')")
  require(!StructType.fromDDL(manifest.ddl).fieldNames
      .exists(n => n == CommitSink.CHANGE_TYPE_COL ||
        n == CommitSink.COMMIT_VERSION_COL),
    s"graft-commit: $path has a data column named " +
      s"${CommitSink.CHANGE_TYPE_COL}/${CommitSink.COMMIT_VERSION_COL} — " +
      "the change feed cannot disambiguate it from its own columns")
  override def readSchema(): StructType =
    CommitSink.cdfSchema(StructType.fromDDL(manifest.ddl))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    CommitSink.changePartitions(dir, path,
      startingVersion.map(_ - 1).getOrElse(-1L),
      endingVersion.getOrElse(manifest.commit), manifest.ddl)
  override def createReaderFactory(): PartitionReaderFactory =
    new CommitChangesReaderFactory(readSchema().toDDL)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new CommitTableMicroBatchStream(path, manifest.ddl, maxCommitsPerTrigger,
      payload = manifest.payload, snapshotOnRewrite = snapshotOnRewrite,
      changeFeed = true,
      // startingVersion is INCLUSIVE: the first batch begins there
      startAfter = startingVersion.map(_ - 1).getOrElse(-1L))
  override def description(): String =
    s"graft-commit change feed of $path " +
      s"[${startingVersion.getOrElse(0L)}..${endingVersion.getOrElse(manifest.commit)}]"
}

/** The metadata-only aggregate scan (the Iceberg `SELECT COUNT(*)` device):
  * one input partition, one row, computed purely from the manifest's
  * per-file statistics — no committed data file is ever opened (LakeSpec
  * proves it by DELETING the data files and aggregating anyway). At
  * 100 TB this turns corpus-level row counts and key ranges — the
  * queries every pipeline health check runs first — into O(manifest)
  * driver work. */
class CommitMetaAggScan(path: String, manifest: CommitSink.Manifest,
    aggs: Array[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc])
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}

  private val schemaFull = StructType.fromDDL(manifest.ddl)
  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames()(0)
  private def colType(name: String): DataType =
    schemaFull.fields.find(_.name == name).get.dataType

  override def readSchema(): StructType = StructType(aggs.map {
    case _: CountStar => StructField("count(*)", LongType, nullable = false)
    case f: Min => StructField(s"min(${colOf(f.column)})", colType(colOf(f.column)), nullable = true)
    case f: Max => StructField(s"max(${colOf(f.column)})", colType(colOf(f.column)), nullable = true)
    case other => sys.error(s"unreachable: $other declined at pushAggregation")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-commit META-ONLY agg of $path " +
      s"PushedAggregates=[${aggs.mkString(", ")}] (0 data files read)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(CommitMetaAggPartition(answer()))

  /** The final row, straight from the decoded stats. */
  private def answer(): Seq[Any] = {
    val stats = manifest.files.map(f => CommitSink.FileStat.decode(manifest.stats(f)))
    aggs.toSeq.map {
      case _: CountStar =>
        // live rows: physical minus deletion-vector counts (o27)
        stats.map(_.rows).sum -
          manifest.files.flatMap(manifest.deletes.get).map(_.ndel).sum
      case f: Min =>
        val c = colOf(f.column)
        val mins = stats.flatMap(_.cols.get(c)).map(_.min.toLong)
        if (mins.isEmpty) null
        else if (colType(c) == IntegerType) mins.min.toInt else mins.min
      case f: Max =>
        val c = colOf(f.column)
        val maxs = stats.flatMap(_.cols.get(c)).map(_.max.toLong)
        if (maxs.isEmpty) null
        else if (colType(c) == IntegerType) maxs.max.toInt else maxs.max
      case other => sys.error(s"unreachable: $other")
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(
        p.asInstanceOf[CommitMetaAggPartition].row)
      override def close(): Unit = ()
    }
}

case class CommitMetaAggPartition(row: Seq[Any]) extends InputPartition

/** Scan = the manifest's committed view, resolved ONCE at planning: the
  * file list and schema are pinned here, so a concurrent commit swapping
  * the manifest mid-query cannot tear the read — snapshot isolation for
  * free from the manifest design. On top of the pinned view the scan
  * implements the three scale contracts:
  *
  *  - '''o14 file skipping''': files whose recorded column ranges cannot
  *    satisfy the pushed conjunction are never planned (and never
  *    opened) — [[CommitSkip]].
  *  - '''o15 statistics''': exact row/byte totals of the SURVIVING files
  *    from the manifest ([[SupportsReportStatistics]]) — what lets the
  *    optimizer auto-broadcast a small committed table instead of
  *    assuming the V2 default "infinitely large".
  *  - '''o16 partitioning''': a `partitionBy`-written table reports
  *    KeyGroupedPartitioning with one input partition per key
  *    ([[SupportsReportPartitioning]] + [[HasPartitionKey]]), so an
  *    equi-join of two co-partitioned committed tables runs with NO
  *    exchange on either side (storage-partitioned join).
  */
class CommitScan(path: String, manifest: CommitSink.Manifest,
                 version: Option[Long] = None,
                 skip: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                 required: Option[StructType] = None,
                 dmlOp: Option[CommitRowLevelOperation] = None,
                 maxCommitsPerTrigger: Int = Int.MaxValue,
                 snapshotOnRewrite: Boolean = false)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  private val fileStats: Map[String, CommitSink.FileStat] =
    manifest.stats.map { case (f, e) => f -> CommitSink.FileStat.decode(e) }

  /** Files the pushed filters cannot rule out (all of them when no
    * filter was pushed or no stats were recorded). */
  // --- BLOOM file skipping (o38): after zone maps, equality/IN
  // predicates also test the per-(file, column) bloom sidecars the
  // maintenance op recorded. Lazy + cached per scan: sidecars load from
  // storage ONLY for files that survived zone pruning AND only when a
  // pushed filter names an indexed column — a scan with no equality
  // predicate (or a table with no index) never opens one. Pruning stays
  // advisory: every filter is residual, a false positive only costs IO.
  private val bloomCache =
    scala.collection.mutable.HashMap.empty[String, org.apache.spark.util.sketch.BloomFilter]
  private def bloomLookup(f: String)(c: String, v: Any): Boolean =
    manifest.blooms.get(f).flatMap(_.get(c)) match {
      case None => true // un-indexed (file, column): never prune
      case Some(sidecar) =>
        val bf = bloomCache.getOrElseUpdate(sidecar, {
          val in = CommitSink.io.newInputStream(Paths.get(path, sidecar))
          try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
          finally in.close()
        })
        CommitSkip.bloomMightContain(bf, v)
    }

  // --- PARTITION-TRANSFORM pruning (o40): Iceberg's predicate
  // projection onto the partition spec. Zone maps cannot prune a point
  // lookup on a BUCKET layout (each file's key range spans everything —
  // the hash scatters on purpose), but an equality/IN predicate on the
  // bucket SOURCE column projects exactly onto the file's recorded
  // bucket id: keep only files whose pk == bucket(n, v). Range
  // predicates never project (the hash destroys order) and unknown
  // shapes keep the file — over-approximation only, like every other
  // skip here (the filter stays residual).
  private val partSpecOpt: Option[CommitSink.PartSpec] =
    manifest.partCol.map(CommitSink.PartSpec.parse)
  private def partMayMatch(f: String, flt: org.apache.spark.sql.sources.Filter): Boolean =
    (partSpecOpt, fileStats.get(f).flatMap(_.pk)) match {
      case (Some(spec: CommitSink.BucketSpec), Some(pk)) =>
        def asLong(v: Any): Option[Long] = v match {
          case l: Long => Some(l)
          case i: Int => Some(i.toLong)
          case s: Short => Some(s.toLong)
          case b: Byte => Some(b.toLong)
          case _ => None
        }
        flt match {
          case org.apache.spark.sql.sources.EqualTo(c, v) if c == spec.sourceCol =>
            asLong(v).forall(l => spec.keyOf(l, LongType) == pk)
          case org.apache.spark.sql.sources.In(c, vs) if c == spec.sourceCol =>
            vs.isEmpty || vs.exists(v =>
              asLong(v).forall(l => spec.keyOf(l, LongType) == pk))
          case _ => true
        }
      case (Some(spec), Some(pk)) =>
        // o45: monotone transforms (identity/truncate/days/months/years)
        // project point AND range predicates onto the recorded key —
        // prunes without a zone-map entry for the source column
        CommitSink.keyIntervalOf(spec, flt)
          .forall { case (lo, hi) => pk >= lo && pk <= hi }
      case _ => true
    }

  private[sources] val surviving: Seq[String] = manifest.files.filter { f =>
    fileStats.get(f).forall(st => skip.forall(CommitSkip.mayMatch(_, st))) &&
      skip.forall(partMayMatch(f, _)) &&
      (manifest.blooms.isEmpty ||
        skip.forall(CommitSkip.mayMatchBloom(_, bloomLookup(f))))
  }

  // --- RUNTIME file skipping (the DPP contract, o08's device on the
  // sink side): on the probe side of a broadcast join, Spark builds the
  // dimension's key set first and hands it here BEFORE partitions are
  // planned — the In-filter prunes committed files by the same manifest
  // ranges as the static path, so a selective dimension shrinks the
  // FILES OPENED at execution time. Offered only for unpartitioned
  // tables: a KeyGroupedPartitioning's group count is already reported
  // to the planner, and pruning groups afterwards would desync the
  // partitioning contract (Iceberg sequences this through its own
  // split planning; out of scope here).
  private var runtimeSkip: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def filterAttributes(): Array[NamedReference] =
    // DML scans key runtime filtering on the _file METADATA column
    // (o21) — Iceberg's FILE_PATH device: the matching-groups subquery
    // is planned over the ORIGINAL table (Spark swaps
    // RowLevelOperationTable back before building it — verified against
    // Spark 4.1's RowLevelOperationRuntimeGroupFiltering — so it never
    // races this operation's scanned-files holder), computes the
    // DISTINCT matched _file values (bounded by the FILE count, where a
    // data-column key set could be corpus-sized), and this scan prunes
    // to exactly those files. Safe under the group-granular rewrite: a
    // pruned file is a CARRIED file. Partitioned tables stay excluded —
    // pruning KeyGrouped groups after the partitioning is reported
    // would desync the contract.
    if (dmlOp.isDefined)
      if (manifest.partCol.isEmpty &&
          readSchema().fieldNames.contains(CommitSink.FILE_COL))
        Array(Expressions.column(CommitSink.FILE_COL))
      else Array.empty
    else if (manifest.partCol.isDefined) Array.empty
    // only columns of the (possibly pruned) OUTPUT schema: Spark resolves
    // these refs against the scan's output and fails analysis on a column
    // the projection dropped. The stamped metadata columns are excluded —
    // no zone map exists for them, so a runtime filter could never prune.
    else readSchema().fields.collect {
      case f if (f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == DoubleType) && f.name.matches("[A-Za-z0-9_]+") &&
        !(f.name == CommitSink.POS_COL &&
          !StructType.fromDDL(manifest.ddl).fieldNames.contains(CommitSink.POS_COL)) =>
        Expressions.column(f.name)
    }

  /** Runtime In/Eq filters on `_file` (the row-level group-filtering
    * path) prune files DIRECTLY by name — conjunction = intersection.
    * None = no file filter arrived (prune by stats only). */
  private var runtimeFiles: Option[Set[String]] = None

  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    runtimeSkip = filters.filter(CommitSkip.usable)
    val fileSets = filters.collect {
      case org.apache.spark.sql.sources.In(c, vs) if c == CommitSink.FILE_COL =>
        vs.collect { case s: String => s }.toSet
      case org.apache.spark.sql.sources.EqualTo(c, v: String)
          if c == CommitSink.FILE_COL => Set(v)
    }
    runtimeFiles = fileSets.reduceOption(_ intersect _)
  }

  /** The runtime-pruned file set: static survivors minus files the
    * runtime key set rules out. Evaluated inside planInputPartitions —
    * Spark calls [[filter]] first. */
  private def runtimeSurviving: Seq[String] = surviving.filter { f =>
    runtimeFiles.forall(_.contains(f)) &&
      fileStats.get(f).forall(st => runtimeSkip.forall(CommitSkip.mayMatch(_, st)))
  }

  /** One (key → files) group per partition value when the table is
    * identity-partitioned AND every surviving file knows its key;
    * None falls back to per-file planning. */
  private val partGroups: Option[Seq[(Long, Seq[String])]] =
    manifest.partCol.flatMap { _ =>
      val pks = surviving.map(f => fileStats.get(f).flatMap(_.pk))
      if (surviving.nonEmpty && pks.forall(_.isDefined))
        Some(surviving.zip(pks.map(_.get))
          .groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (k, fs) => (k, fs.map(_._1)) })
      else None
    }

  private def abs(f: String): String = Paths.get(path, f).toString

  /** Per-file deletion-vector path ("" = none) — shipped alongside the
    * file list so the reader skips the recorded positions (o27). */
  private def dvOf(f: String): String =
    manifest.deletes.get(f).map(e => abs(e.dv)).getOrElse("")

  /** Per-file APPLICABLE equality deletes (o32): only entries strictly
    * newer than the file's add-sequence, with the key columns' types
    * resolved from the table DDL (independent of the scan projection —
    * the reader widens its decode to cover them). */
  // one parse for the whole plan — eqOf runs per (file × entry), and a
  // per-call StructType.fromDDL is O(files × entries) SQL-parser work on
  // the driver for a constant value
  private lazy val fullSchema = StructType.fromDDL(manifest.ddl)
  private def eqOf(f: String): Seq[EqRef] = manifest.eqFor(f).map { e =>
    EqRef(abs(e.file),
      StructType(e.colNames.map(c =>
        fullSchema(fullSchema.fieldIndex(c)))).toDDL)
  }

  /** Pruned projection when Spark asked for one: the reader materializes
    * exactly these fields (its per-line decoder skips keys it was not
    * asked for, so unrequested columns cost a scan over their chars,
    * never a parse or an allocation). */
  override def readSchema(): StructType =
    required.getOrElse(StructType.fromDDL(manifest.ddl))
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = partGroups match {
      case Some(groups) =>
        val spec = CommitSink.PartSpec.parse(manifest.partCol.get)
        val dt = StructType.fromDDL(manifest.ddl).apply(spec.sourceCol).dataType
        groups.map { case (k, fs) =>
          // the HasPartitionKey value must be typed as the REPORTED
          // partitioning expression: the column's own type for identity,
          // the bucket transform's INT result for bucket
          val keyVal: Any = spec match {
            case _: CommitSink.BucketSpec => k.toInt
            case _ => if (dt == IntegerType) k.toInt else k
          }
          CommitKeyedFilesPartition(fs.map(abs), keyVal,
            fs.map(dvOf), fs.map(eqOf)): InputPartition
        }.toArray[InputPartition]
      case None =>
        runtimeSurviving.map(f =>
          CommitFilesPartition(Seq(abs(f)),
            Seq(dvOf(f)), Seq(eqOf(f))): InputPartition).toArray[InputPartition]
    }
    // report the files this DML scan actually planned: exactly the set
    // the group-granular rewrite replaces (everything else is carried)
    dmlOp.foreach(_.scanned.set(partGroups match {
      case Some(groups) => groups.flatMap(_._2).toSet
      case None => runtimeSurviving.toSet
    }))
    parts
  }

  override def outputPartitioning(): Partitioning = partGroups match {
    // the transform references the source column by name — report the
    // grouping only while the column survives projection
    case Some(groups) if readSchema().fieldNames.contains(
        CommitSink.PartSpec.parse(manifest.partCol.get).sourceCol) =>
      CommitSink.PartSpec.parse(manifest.partCol.get) match {
        case CommitSink.IdentitySpec(c) =>
          new KeyGroupedPartitioning(Array(Expressions.identity(c)), groups.size)
        case CommitSink.BucketSpec(n, c) =>
          new KeyGroupedPartitioning(Array(Expressions.bucket(n, c)), groups.size)
        // truncate/days: grouped PLANNING (one partition per key group,
        // zone-prunable — the transforms preserve order so the source
        // column's ranges already prune), but no SPJ report: aligning
        // joins on a width/day derivation is not a join shape worth the
        // function-resolution surface (Iceberg's SPJ is bucket-first too)
        case _ => new UnknownPartitioning(groups.size)
      }
    case Some(groups) => new UnknownPartitioning(groups.size)
    case None => new UnknownPartitioning(surviving.size)
  }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val sts = surviving.map(fileStats.get)
      private val known = sts.forall(_.isDefined)
      /** Deletion-vector counts of the surviving files — live rows, not
        * physical rows, feed the planner (o27). */
      private val ndel =
        surviving.flatMap(manifest.deletes.get).map(_.ndel).sum
      override def sizeInBytes(): java.util.OptionalLong =
        if (known) java.util.OptionalLong.of(sts.flatten.map(_.bytes).sum)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (known) java.util.OptionalLong.of(sts.flatten.map(_.rows).sum - ndel)
        else java.util.OptionalLong.empty()
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new CommitReaderFactory(readSchema().toDDL,
      // stamp `_file`/`_pos` per row only when they are the METADATA
      // columns (a data column of either name decodes from the payload)
      stampFile = readSchema().fieldNames.contains(CommitSink.FILE_COL) &&
        !StructType.fromDDL(manifest.ddl).fieldNames.contains(CommitSink.FILE_COL),
      payload = manifest.payload,
      stampPos = readSchema().fieldNames.contains(CommitSink.POS_COL) &&
        !StructType.fromDDL(manifest.ddl).fieldNames.contains(CommitSink.POS_COL))

  /** The table AS A STREAM (o20) — each commit is a micro-batch. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(version.isEmpty,
      "graft-commit: a version-pinned table is a static fact, not a stream")
    // hand the stream the (possibly pruned) projection, not the full
    // manifest DDL: if a future Spark prunes columns on streaming scans,
    // the readers must emit rows of the PLAN's schema, not full width
    new CommitTableMicroBatchStream(path, readSchema().toDDL, maxCommitsPerTrigger,
      payload = manifest.payload, snapshotOnRewrite = snapshotOnRewrite)
  }

  override def description(): String =
    s"graft-commit scan of $path" +
      version.map(v => s" @v$v").getOrElse("") +
      s" [files: ${surviving.size}/${manifest.files.size}, " +
      s"columns: ${readSchema().size}/${StructType.fromDDL(manifest.ddl).size}]"
}

/** The CHANGELOG micro-batch stream over a committed table (o20) — the
  * Delta/Iceberg "table as a stream" device, the missing edge of the
  * connector matrix (we could stream INTO the table since o11; this
  * streams OUT OF it): the stream's offset IS the commit id, so each
  * micro-batch reads exactly the files a commit range ADDED — computed
  * as a set difference of the two immutable version manifests, which is
  * also why offsets are restart-safe with no driver-side state at all
  * (the r10 sensor-stream counter bug class cannot exist here: the
  * ledger lives on disk).
  *
  * Contract: APPEND-ONLY ranges. A commit that removed files (truncate,
  * DML rewrite, compaction) is not expressible as an incremental batch —
  * the stream fails with a clear error instead of silently replaying or
  * missing rows (Delta's position exactly; its `ignoreChanges` escape
  * hatch is deliberately not replicated — silent row re-delivery is the
  * wrong default). Snapshot expiry interplay: a consumer's next offset
  * must still have its version manifest — retain at least as many
  * versions as the slowest consumer lags, the same operational rule
  * Delta documents for its checkpoint retention. */
class CommitTableMicroBatchStream(path: String, ddl: String,
                                  maxCommitsPerTrigger: Int,
                                  payload: String = "json",
                                  /** Opt-in SELF-SERVICE RECOVERY
                                    * (`option("snapshotOnRewrite", true)`) —
                                    * the Iceberg
                                    * streaming-skip-overwrite-snapshots
                                    * ergonomics: when the append-only or
                                    * generation check would refuse (a
                                    * compaction/DML/truncate landed under
                                    * the checkpoint, or the table was
                                    * dropped and re-created), the stream
                                    * re-bootstraps by emitting the CURRENT
                                    * snapshot as one batch and then resumes
                                    * incremental tailing — instead of
                                    * failing for a fresh checkpoint. This
                                    * re-delivers rows by design, so it is
                                    * only correct above an IDEMPOTENT
                                    * consumer (the d32/d33 anti-join
                                    * decision write); the loud refusal
                                    * stays the default precisely because
                                    * silent re-delivery into a
                                    * non-idempotent sink duplicates rows. */
                                  snapshotOnRewrite: Boolean = false,
                                  /** CHANGE DATA FEED mode (o29): each
                                    * micro-batch emits the range's
                                    * change rows (per-commit planner
                                    * [[CommitSink.changePartitions]])
                                    * instead of its appended files —
                                    * vector commits become 'delete'
                                    * rows rather than refusals. */
                                  changeFeed: Boolean = false,
                                  /** Last commit id BEFORE the stream's
                                    * first batch (-1 = genesis). A CDF
                                    * stream's `startingVersion` option
                                    * lands here as startingVersion - 1,
                                    * so a FRESH checkpoint begins at the
                                    * requested version instead of
                                    * re-delivering the whole history;
                                    * a restored checkpoint's offset
                                    * wins, as always. */
                                  startAfter: Long = -1L)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  private val dir = Paths.get(path)

  /** This stream's table GENERATION. An offset restored from a
    * checkpoint that names a different generation means the table was
    * dropped and re-created underneath the consumer — silently diffing
    * the NEW generation's manifests against the old offset would skip
    * (lose) every new-generation commit up to it, so the mismatch is a
    * hard error (Delta's reservoir-id check). */
  private val generation: String =
    CommitSink.parseManifest(dir).map(_.tableId).getOrElse("")

  /** Commit id already consumed (-1 = genesis) + the generation that
    * assigned it. */
  private case class CommitPos(commit: Long, gen: String) extends Offset {
    override def json(): String = s"$commit@$gen"
  }

  private def checkGeneration(p: CommitPos): Unit = {
    // a table with NO generation id (pre-generation manifest) has nothing
    // to check against; but once the table HAS one, an offset without a
    // generation is NOT waived — a pre-generation checkpoint on a
    // dropped-and-re-created table would silently diff the new
    // generation's manifests against the old commit id and skip the new
    // table's first commits, the exact bug class tableId detects
    if (generation.isEmpty) return
    require(p.gen.nonEmpty,
      s"graft-commit: the checkpointed offset of $path carries no table " +
        s"generation but the current table is generation $generation — " +
        "cannot prove the checkpoint belongs to this table (it may predate " +
        "a drop-and-recreate); restart the stream from a fresh checkpoint")
    require(p.gen == generation,
      s"graft-commit: the checkpointed offset of $path belongs to table " +
        s"generation ${p.gen} but the current table is generation " +
        s"$generation — the table was dropped and re-created; restart the " +
        "stream from a fresh checkpoint to read the new table")
  }

  override def initialOffset(): Offset = CommitPos(startAfter, generation)

  /** Versions that still have a manifest: admission steps only through
    * EXISTING versions (snapshot expiry may have GC'd intermediate ones
    * — the set-difference only ever needs the two ENDPOINT manifests,
    * so skipping expired ids is sound). */
  private def existingAfter(from: Long, current: Long): Seq[Long] =
    CommitSink.listVersions(dir).filter(v => v > from && v <= current)

  private def manifestAt(commit: Long): CommitSink.Manifest =
    if (commit < 0) CommitSink.Manifest(-1L, ddl, Seq.empty, Seq.empty)
    else CommitSink.parseManifestVersion(dir, commit)

  private def filesAt(commit: Long): Seq[String] = manifestAt(commit).files

  /** Append-only between two manifests: no file removed AND no deletion
    * vector added/changed on a file the start already had — a DV commit
    * (merge-on-read DELETE, o27) removes ROWS without removing files,
    * which an incremental batch cannot express any more than a rewrite
    * can. A vector on a file ADDED within the range is fine: the
    * endpoint diff emits that file with its end-version vector, the net
    * content. An EQUALITY DELETE added in the range (o32, the upsert
    * write) removes rows from older files by value — same refusal (its
    * own new files are exempt by sequence, so they emit fine once the
    * consumer restarts past the upsert). */
  private def pairAppendOnly(a: CommitSink.Manifest,
                             b: CommitSink.Manifest): Boolean =
    a.files.toSet.subsetOf(b.files.toSet) &&
      a.files.forall(f => a.deletes.get(f) == b.deletes.get(f)) &&
      !eqRetracts(a, b)

  /** Does `b` add an equality delete that COVERS a file `a` already
    * listed? Those rows were (or could have been) emitted and are now
    * retracted by value — inexpressible. A new delete covering only
    * mid-range files is fine: their partitions carry the refs, so the
    * dead rows are never emitted at all. */
  private def eqRetracts(a: CommitSink.Manifest,
                         b: CommitSink.Manifest): Boolean =
    b.eqDeletes.exists(e => !a.eqDeletes.contains(e) &&
      a.files.exists(f => b.seqOf(f) < e.seq))

  /** Is per-commit replay through these versions append-only? */
  private def chainAppendOnly(versions: Seq[Long]): Boolean =
    (Seq(-1L) ++ versions).sliding(2).forall {
      case Seq(a, b) => pairAppendOnly(manifestAt(a), manifestAt(b))
      case _ => true
    }

  /** CHANGE-FEED expressibility of the same chain: vector changes are
    * fine (they ARE the feed's 'delete' rows), and so is a file drop
    * with a full-cover TOMBSTONE (o33 — the drop reads as delete rows);
    * true removal (a rewrite) is inexpressible, and so is a new
    * EQUALITY delete (its matched rows are unknown without a scan). */
  private def chainExpressible(versions: Seq[Long]): Boolean =
    (Seq(-1L) ++ versions).sliding(2).forall {
      case Seq(a, b) =>
        val (ma, mb) = (manifestAt(a), manifestAt(b))
        (ma.files.toSet -- mb.files.toSet).forall(mb.deletes.contains) &&
          ma.eqDeletes == mb.eqDeletes
      case _ => true
    }

  /** Does this offset provably belong to the current generation? */
  private def genMatches(p: CommitPos): Boolean =
    generation.isEmpty || (p.gen.nonEmpty && p.gen == generation)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CommitPos]
    if (snapshotOnRewrite && !genMatches(s))
      // dropped-and-re-created table: re-bootstrap from the current
      // snapshot in ONE batch under the new generation (stepping through
      // the new generation's history would re-deliver it commit by commit)
      return CommitPos(CommitSink.currentCommit(dir), generation)
    checkGeneration(s)
    val from = s.commit
    val current = CommitSink.currentCommit(dir)
    if (current <= from) return CommitPos(from, generation)
    val existing = existingAfter(from, current)
    if (existing.isEmpty) return CommitPos(from, generation)
    // A GENESIS consumer whose admissible history contains a rewrite (or
    // whose early manifests imply one) cannot replay per-commit — but it
    // CAN always bootstrap from the current snapshot in one batch (the
    // endpoint diff from -1 removes nothing). Without this, a
    // maxCommitsPerTrigger'd fresh stream on any rewritten-history table
    // would crash-loop on a range no fresh checkpoint can ever clear.
    if (from < 0 &&
        !(if (changeFeed) chainExpressible(existing) else chainAppendOnly(existing)))
      return CommitPos(current, generation)
    CommitPos(existing.take(math.max(maxCommitsPerTrigger, 1)).last, generation)
  }

  /** Unreachable under SupportsAdmissionControl; documented fallback. */
  override def latestOffset(): Offset =
    CommitPos(CommitSink.currentCommit(dir), generation)

  override def deserializeOffset(json: String): Offset = {
    val at = json.indexOf('@')
    if (at < 0) CommitPos(json.toLong, "")
    else CommitPos(json.substring(0, at).toLong, json.substring(at + 1))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val sp = start.asInstanceOf[CommitPos]
    if (changeFeed) {
      val endCommit = end.asInstanceOf[CommitPos].commit
      // a re-bootstrap emits the current snapshot as ONE 'insert' batch
      // (vectors applied as skips — the live rows), version-stamped at
      // the snapshot's commit
      def bootstrap: Array[InputPartition] = {
        val m =
          try manifestAt(endCommit)
          catch { case _: IllegalArgumentException =>
            CommitSink.parseManifest(dir).getOrElse(manifestAt(-1L)) }
        // a truncate may have switched the payload under the stream —
        // the CDF reader decodes parquet only, so refuse instead of
        // parsing the wrong format as data
        require(m.payload == "parquet" || m.files.isEmpty,
          s"graft-commit: the change feed's snapshot re-bootstrap found a " +
            s"'${m.payload}'-payload table at $path — restart the stream " +
            "from a fresh checkpoint")
        // the snapshot's live rows = files minus vectors minus equality
        // deletes — ship the applicable key files per partition so the
        // re-bootstrap never re-inserts a replaced row
        lazy val full = StructType.fromDDL(m.ddl)
        m.files.map { f =>
          CommitChangesPartition(Paths.get(path, f).toString,
            m.deletes.get(f).map(e => Paths.get(path, e.dv).toString)
              .getOrElse(""),
            "", insert = true, commitVersion = m.commit,
            eqs = m.eqFor(f).map(e =>
              EqRef(Paths.get(path, e.file).toString,
                StructType(e.colNames.map(c => full(full.fieldIndex(c))))
                  .toDDL))): InputPartition
        }.toArray
      }
      if (snapshotOnRewrite && !genMatches(sp)) return bootstrap
      checkGeneration(sp)
      try return CommitSink.changePartitions(dir, path, sp.commit, endCommit, ddl)
      catch { case e: IllegalArgumentException =>
        // a rewrite or expired version inside the range: refuse
        // (default) or re-bootstrap under the flag, like the changelog
        if (snapshotOnRewrite) return bootstrap else throw e
      }
    }
    // emitted files carry the END version's deletion vectors (o27) and
    // applicable equality deletes (o32): the net content of the range —
    // and of the snapshot on a re-bootstrap. Incremental batches only
    // ever emit files ADDED in an eq-unchanged range, which no existing
    // equality delete covers (their sequence is newer); the re-bootstrap
    // emits the whole snapshot, where older files may be covered.
    def part(m: CommitSink.Manifest, fs: Seq[String]) = {
      lazy val full = StructType.fromDDL(m.ddl)
      def eqOf(f: String): Seq[EqRef] = m.eqFor(f).map { e =>
        EqRef(Paths.get(path, e.file).toString,
          StructType(e.colNames.map(c => full(full.fieldIndex(c)))).toDDL)
      }
      fs.map(f => CommitFilesPartition(Seq(Paths.get(path, f).toString),
          Seq(m.deletes.get(f).map(e => Paths.get(path, e.dv).toString)
            .getOrElse("")),
          Seq(eqOf(f))): InputPartition)
        .toArray
    }
    // end-offset resolution: a checkpointed end of a DROPPED generation
    // (or an expired version) has no manifest — under snapshotOnRewrite
    // the current snapshot stands in (at-least-once above an idempotent
    // consumer); without the flag the missing-version error propagates.
    // LAZY: the generation check below must fire BEFORE a missing end
    // version can — its error names the actual problem (stale
    // generation-less checkpoint), not the symptom (missing version).
    lazy val endM: CommitSink.Manifest =
      if (snapshotOnRewrite)
        try manifestAt(end.asInstanceOf[CommitPos].commit)
        catch { case _: IllegalArgumentException =>
          CommitSink.parseManifest(dir).getOrElse(manifestAt(-1L)) }
      else manifestAt(end.asInstanceOf[CommitPos].commit)
    // a re-bootstrap (or any emitted batch) must decode with THIS
    // stream's reader: a truncate that switched the payload under the
    // stream is refused loudly instead of parsed as the wrong format
    def checkPayload(m: CommitSink.Manifest): CommitSink.Manifest = {
      require(m.payload == payload || m.files.isEmpty,
        s"graft-commit: the table at $path switched payload " +
          s"('$payload' -> '${m.payload}') under this stream — restart " +
          "from a fresh checkpoint")
      m
    }
    if (snapshotOnRewrite && !genMatches(sp))
      return part(checkPayload(endM), endM.files) // generation change: re-bootstrap
    checkGeneration(sp)
    val from = sp.commit
    val to = end.asInstanceOf[CommitPos].commit
    // an EXPIRED from-version (the consumer lagged past retention) is a
    // recovery case too under the flag — without it, the error names the
    // missing version (the documented retention rule)
    val beforeOpt =
      if (snapshotOnRewrite)
        try Some(manifestAt(from))
        catch { case _: IllegalArgumentException => None }
      else Some(manifestAt(from))
    if (beforeOpt.isEmpty) return part(checkPayload(endM), endM.files)
    val beforeM = beforeOpt.get
    val before = beforeM.files.toSet
    val removed = before -- endM.files.toSet
    // a merge-on-read DELETE changed a vector on a file the start
    // already had: rows were removed without removing files — as
    // inexpressible incrementally as a rewrite (see pairAppendOnly).
    // An upsert's EQUALITY delete (o32) removes rows by value: same.
    val dvChanged = beforeM.files.filter(f =>
      beforeM.deletes.get(f) != endM.deletes.get(f))
    val eqChanged = eqRetracts(beforeM, endM)
    if (removed.nonEmpty || dvChanged.nonEmpty || eqChanged) {
      // a rewrite landed inside the range: refuse (default) or, under
      // snapshotOnRewrite, re-bootstrap — emit the END snapshot whole;
      // later ranges resume incremental tailing from `to`
      if (snapshotOnRewrite) return part(checkPayload(endM), endM.files)
      sys.error(s"graft-commit: commits ${from + 1}..$to of $path removed " +
        s"${removed.size} file(s) / changed ${dvChanged.size} deletion " +
        s"vector(s)${if (eqChanged) " / changed equality deletes" else ""} " +
        "(truncate/DML/compaction/merge-on-read delete/upsert) — a " +
        "changelog stream requires append-only commits; restart the " +
        "stream from a fresh checkpoint to re-read the rewritten table " +
        "(or opt in to snapshotOnRewrite above an idempotent consumer)")
    }
    part(endM, endM.files.filterNot(before))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (changeFeed)
      new CommitChangesReaderFactory(
        CommitSink.cdfSchema(StructType.fromDDL(ddl)).toDDL)
    else new CommitReaderFactory(ddl, payload = payload)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One applicable equality-delete file for a data file (o32): absolute
  * key-file path plus the key columns' DDL (names AND types — the reader
  * decodes the key file and the data rows' key values with no other
  * context). */
case class EqRef(path: String, colsDdl: String)

/** Executor-side equality-delete evaluation (o32), shared by the row
  * reader and the change-feed reader: load each applicable key file's
  * distinct tuples once per data file, then answer "is this decoded
  * row's key deleted" per row. A NULL key (including a key column the
  * file predates) never matches — SQL equality. */
private[sources] object EqMatch {
  /** (decode-field indices into the reader's wanted schema, key types,
    * key-tuple set) — one per distinct key signature. */
  type Matcher = (Array[Int], Array[DataType], scala.collection.Set[Seq[Any]])

  def load(refs: Seq[EqRef], wanted: StructType): Seq[Matcher] =
    refs.groupBy(_.colsDdl).toSeq.map { case (ddl, grp) =>
      val ks = StructType.fromDDL(ddl)
      val idxs = ks.fields.map(kf => wanted.fieldIndex(kf.name))
      val set = scala.collection.mutable.HashSet.empty[Seq[Any]]
      grp.foreach(loadKeys(_, ks, set))
      (idxs, ks.fields.map(_.dataType), set: scala.collection.Set[Seq[Any]])
    }

  private def loadKeys(ref: EqRef, ks: StructType,
                       into: scala.collection.mutable.HashSet[Seq[Any]]): Unit = {
    val fg = new ParquetPayload.FileGroups(Paths.get(ref.path), ks)
    try if (fg.hasColumns) {
      var g = fg.next()
      while (g != null) {
        val vals = new Array[Any](ks.length)
        var i = 0
        var hasNull = false
        while (i < ks.length && !hasNull) {
          val fi = fg.fieldIndex(i)
          if (fi >= 0 && g.getFieldRepetitionCount(fi) > 0)
            vals(i) = ParquetPayload.value(g, fi, ks(i).dataType)
          else hasNull = true
          i += 1
        }
        if (!hasNull)
          into += scala.collection.immutable.ArraySeq.unsafeWrapArray(vals)
        g = fg.next()
      }
    } finally fg.close()
  }

  /** Does `g`'s key tuple (decoded through `fg`'s requested-field map)
    * appear in any matcher's set? */
  def deleted(matchers: Seq[Matcher], fg: ParquetPayload.FileGroups,
              g: org.apache.parquet.example.data.Group): Boolean =
    matchers.nonEmpty && matchers.exists { case (idxs, types, set) =>
      val vals = new Array[Any](idxs.length)
      var i = 0
      var hasNull = false
      while (i < idxs.length && !hasNull) {
        val fi = fg.fieldIndex(idxs(i))
        if (fi >= 0 && g.getFieldRepetitionCount(fi) > 0)
          vals(i) = ParquetPayload.value(g, fi, types(i))
        else hasNull = true
        i += 1
      }
      !hasNull && set.contains(scala.collection.immutable.ArraySeq
        .unsafeWrapArray(vals))
    }
}

/** `dvs` (o27): per-file deletion-vector ABSOLUTE path, parallel to
  * `files` ("" = no vector) — the reader skips the vector's positions.
  * `eqs` (o32): per-file APPLICABLE equality deletes, parallel to
  * `files` — the reader drops rows whose key tuple appears in any. */
case class CommitFilesPartition(files: Seq[String], dvs: Seq[String] = Seq.empty,
                                eqs: Seq[Seq[EqRef]] = Seq.empty)
    extends InputPartition

/** One change-feed unit (o29): ONE data file's contribution to ONE
  * commit. `insert = true` → the file was added at [[commitVersion]]:
  * emit its live rows ('insert'), skipping `dv` and the `eqs` key sets
  * (both non-empty only on a snapshot re-bootstrap). `insert = false` →
  * the file's vector changed at [[commitVersion]]: emit exactly the
  * positions of `dv` minus `prevDv` ('delete') — the rows that commit
  * deleted. Paths absolute; "" = none. */
case class CommitChangesPartition(file: String, dv: String, prevDv: String,
                                  insert: Boolean, commitVersion: Long,
                                  eqs: Seq[EqRef] = Seq.empty)
    extends InputPartition

class CommitChangesReaderFactory(ddl: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case c: CommitChangesPartition =>
        new CommitChangesReader(c, StructType.fromDDL(ddl))
      case other => sys.error(s"graft-commit: unexpected CDF partition $other")
    }
}

/** Change-feed reader: the data columns of one parquet-payload file,
  * position-filtered per the partition's mode, with the two CDF
  * columns stamped. Parquet payload only — [[CommitSink.changePartitions]]
  * enforces it. */
class CommitChangesReader(p: CommitChangesPartition, schema: StructType)
    extends PartitionReader[InternalRow] {
  // schema = data fields ++ _change_type ++ _commit_version
  private val dataSchema = StructType(schema.fields.dropRight(2))
  private val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
  private val groups =
    new ParquetPayload.FileGroups(Paths.get(p.file), dataSchema)
  private val changeType =
    UTF8String.fromString(if (p.insert) "insert" else "delete")
  /** Applicable equality deletes (re-bootstrap only): key columns are
    * data columns, so the full-width CDF decode already covers them. */
  private val eqMatchers: Seq[EqMatch.Matcher] =
    EqMatch.load(p.eqs, dataSchema)
  /** keep=false: emit rows NOT in `positions` (insert mode, vector as a
    * skip list). keep=true: emit ONLY `positions` (delete mode, the
    * vector diff). */
  private val (keep, positions): (Boolean, Array[Long]) =
    if (p.insert)
      (false, if (p.dv.isEmpty) Array.emptyLongArray
              else CommitSink.readDv(Paths.get(p.dv)))
    else {
      val cur = CommitSink.readDv(Paths.get(p.dv))
      val old =
        if (p.prevDv.isEmpty) Array.emptyLongArray
        else CommitSink.readDv(Paths.get(p.prevDv))
      // sorted-merge diff: cur \ old (sized defensively at cur.length —
      // vectors only ever grow, but never trust that with an index)
      val out = new Array[Long](cur.length)
      var i = 0; var j = 0; var k = 0
      while (i < cur.length) {
        while (j < old.length && old(j) < cur(i)) j += 1
        if (j < old.length && old(j) == cur(i)) i += 1
        else { out(k) = cur(i); k += 1; i += 1 }
      }
      (true, java.util.Arrays.copyOf(out, k))
    }
  private var ptr = 0
  private var pos = 0L
  private var row: InternalRow = _
  private var closed = false
  private def closeOnce(): Unit =
    if (!closed) { closed = true; groups.close() }

  @scala.annotation.tailrec
  private def advance(): Boolean = {
    // delete mode emits ONLY the diff positions: once the cursor is
    // exhausted, stop — never decode the rest of a 10M-row file to
    // skip it (the read side of "a delete costs bytes-per-position")
    if (keep && ptr >= positions.length) { closeOnce(); return false }
    val g = groups.next()
    if (g == null) { closeOnce(); false }
    else {
      val at = pos; pos += 1
      while (ptr < positions.length && positions(ptr) < at) ptr += 1
      val hit = ptr < positions.length && positions(ptr) == at
      if (hit != keep ||
          (p.insert && EqMatch.deleted(eqMatchers, groups, g))) advance()
      else {
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < dataSchema.length) {
          val fi = groups.fieldIndex(i)
          if (fi >= 0 && g.getFieldRepetitionCount(fi) > 0)
            vals(i) = ParquetPayload.value(g, fi, dataSchema(i).dataType)
          i += 1
        }
        vals(schema.length - 2) = changeType
        vals(schema.length - 1) = p.commitVersion
        row = toUnsafe(new GenericInternalRow(vals)).copy()
        true
      }
    }
  }
  override def next(): Boolean = advance()
  override def get(): InternalRow = row
  override def close(): Unit = closeOnce()
}

/** Identity-partitioned file group: all committed files of ONE partition
  * key, exposing the key through [[HasPartitionKey]] so Spark can align
  * co-partitioned scans for a storage-partitioned join. */
case class CommitKeyedFilesPartition(files: Seq[String], key: Any,
                                     dvs: Seq[String] = Seq.empty,
                                     eqs: Seq[Seq[EqRef]] = Seq.empty)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](key))
}

class CommitReaderFactory(ddl: String, stampFile: Boolean = false,
                          payload: String = "json",
                          stampPos: Boolean = false)
    extends PartitionReaderFactory {
  // a fully-pruned projection (COUNT(*) above a declined aggregate push)
  // ships an EMPTY schema, which fromDDL refuses to parse
  private def schema: StructType =
    if (ddl.trim.isEmpty) new StructType() else StructType.fromDDL(ddl)
  private def reader(fs: Seq[String], dvs: Seq[String],
                     eqs: Seq[Seq[EqRef]]): PartitionReader[InternalRow] =
    if (payload == "parquet")
      new ParquetFilesReader(fs, schema, stampFile, stampPos, dvs, eqs)
    else {
      // equality deletes require the parquet payload (the upsert write
      // refuses json tables) — a json partition carrying refs is a bug
      require(eqs.forall(_.isEmpty),
        "graft-commit: equality deletes on a json-payload partition")
      new CommitFilesReader(fs, schema, stampFile, stampPos, dvs)
    }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case CommitFilesPartition(fs, dvs, eqs)         => reader(fs, dvs, eqs)
      case CommitKeyedFilesPartition(fs, _, dvs, eqs) => reader(fs, dvs, eqs)
      case other => sys.error(s"graft-commit: unexpected partition $other")
    }
}

/** Executor-side reader of the PARQUET payload — the columnar mirror of
  * [[CommitDataWriter]]'s Group encoder, one file group per input
  * partition. Column projection reaches the chunk level: only
  * requested columns' pages are read ([[ParquetPayload.FileGroups]]),
  * and a fully-pruned projection (COUNT-shaped plans) reads NO pages at
  * all — row counts come straight from the footer. `_file` stamping
  * works exactly like the JSON reader's. */
class ParquetFilesReader(files: Seq[String], schema: StructType,
                         stampFile: Boolean = false,
                         stampPos: Boolean = false,
                         /** Per-file deletion-vector paths, parallel to
                           * `files` ("" = none): the vector's positions
                           * are skipped during the sequential read
                           * (o27). Empty seq = no vectors at all. */
                         dvs: Seq[String] = Seq.empty,
                         /** Per-file APPLICABLE equality deletes (o32),
                           * parallel to `files`: each ref's key set is
                           * loaded once per file, the decode widens to
                           * cover key columns the projection dropped,
                           * and matching rows are skipped. */
                         eqs: Seq[Seq[EqRef]] = Seq.empty)
    extends PartitionReader[InternalRow] {
  private val queue = files.zipWithIndex.iterator
  private val fileIdx: Int =
    if (stampFile) schema.fieldNames.indexOf(CommitSink.FILE_COL) else -1
  private val posIdx: Int =
    if (stampPos) schema.fieldNames.indexOf(CommitSink.POS_COL) else -1
  /** The decoded projection: every output field except the stamped
    * metadata columns. */
  private val dataSchema: StructType =
    StructType(schema.fields.zipWithIndex.collect {
      case (f, i) if i != fileIdx && i != posIdx => f
    })
  // COPIED UnsafeRows, like every reader here: downstream buffering
  // consumers assume the binary row format
  private val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
  private var cur: ParquetPayload.FileGroups = _
  private var curFile: UTF8String = _
  private var countOnly = 0L
  /** Physical position of the NEXT row within the current file. */
  private var pos = 0L
  /** Sorted deleted positions of the current file + cursor — rows are
    * emitted in position order, so one forward pointer applies the
    * whole vector in O(rows + deletes). */
  private var dv: Array[Long] = Array.emptyLongArray
  private var dvPtr = 0
  /** Equality-delete matchers of the current file (see [[EqMatch]]). */
  private var eqMatchers: Seq[EqMatch.Matcher] = Nil
  private var row: InternalRow = _

  private def deleted(p: Long): Boolean = {
    while (dvPtr < dv.length && dv(dvPtr) < p) dvPtr += 1
    dvPtr < dv.length && dv(dvPtr) == p
  }

  @scala.annotation.tailrec
  private def advance(): Boolean = {
    if (cur == null) {
      if (!queue.hasNext) return false
      val (name, idx) = queue.next()
      val f = Paths.get(name)
      curFile = UTF8String.fromString(f.getFileName.toString)
      // widen the decode to cover key columns the projection dropped:
      // fields appended AFTER dataSchema, so output-field decode indices
      // are unchanged. A key column absent from the FILE (added by a
      // later ALTER) decodes null → never matches.
      val refs = eqs.lift(idx).getOrElse(Seq.empty)
      val extra = refs.flatMap(r => StructType.fromDDL(r.colsDdl).fields)
        .filterNot(kf => dataSchema.fieldNames.contains(kf.name))
        .groupBy(_.name).map(_._2.head).toSeq
      val wanted = StructType(dataSchema.fields ++ extra)
      cur = new ParquetPayload.FileGroups(f, wanted)
      if (!cur.hasColumns) countOnly = cur.rowCount
      eqMatchers = EqMatch.load(refs, wanted)
      pos = 0L
      dvPtr = 0
      dv = dvs.lift(idx).filter(_.nonEmpty)
        .map(p => CommitSink.readDv(Paths.get(p)))
        .getOrElse(Array.emptyLongArray)
    }
    if (!cur.hasColumns) {
      // zero decoded columns (pure COUNT / metadata-only projection):
      // emit footer-counted rows without touching any page — skipping
      // the deletion vector's positions by count alone. Reachable with
      // eq matchers only when every key column predates the file (all
      // keys null → nothing matches), so counting stays sound.
      if (countOnly > 0) {
        countOnly -= 1
        val p = pos; pos += 1
        if (deleted(p)) advance()
        else { row = emit(null, p); true }
      }
      else { cur.close(); cur = null; advance() }
    } else {
      val g = cur.next()
      if (g == null) { cur.close(); cur = null; advance() }
      else {
        val p = pos; pos += 1
        if (deleted(p) || EqMatch.deleted(eqMatchers, cur, g)) advance()
        else { row = emit(g, p); true }
      }
    }
  }

  private def emit(g: org.apache.parquet.example.data.Group,
                   p: Long): InternalRow = {
    val vals = new Array[Any](schema.length)
    if (g != null) {
      var i = 0
      var di = 0
      while (i < schema.length) {
        if (i != fileIdx && i != posIdx) {
          val fi = cur.fieldIndex(di)
          if (fi >= 0 && g.getFieldRepetitionCount(fi) > 0)
            vals(i) = ParquetPayload.value(g, fi, schema(i).dataType)
          di += 1
        }
        i += 1
      }
    }
    if (fileIdx >= 0) vals(fileIdx) = curFile
    if (posIdx >= 0) vals(posIdx) = p
    toUnsafe(new GenericInternalRow(vals)).copy()
  }

  override def next(): Boolean = advance()
  override def get(): InternalRow = row
  override def close(): Unit = if (cur != null) { cur.close(); cur = null }
}

/** Single-file form of [[CommitFilesReader]] — kept as the unit-test
  * surface for the encoder/decoder round-trip properties. */
class CommitFileReader(file: String, schema: StructType)
    extends CommitFilesReader(Seq(file), schema)

/** Executor-side reader: the exact mirror of [[CommitDataWriter]]'s
  * line encoder — keys are unescaped field names, values are the
  * portable scalar set with JSON string escapes (plus bare
  * NaN/Infinity/-Infinity for doubles, which `Double.parseDouble`
  * reads back bit-exactly). A field the writer omitted (null) stays
  * null. Schema-driven, no generic JSON machinery needed. Reads a file
  * GROUP sequentially — one partition per key group under identity
  * partitioning, one per file otherwise. */
class CommitFilesReader(files: Seq[String], schema: StructType,
                        /** Fill the `_file` METADATA column (o21) with
                          * the manifest-relative name of the file each
                          * row came from. False when `_file` is a DATA
                          * column (decoded from the payload). */
                        stampFile: Boolean = false,
                        /** Fill the `_pos` METADATA column (o27) with
                          * the row's line index within its file. */
                        stampPos: Boolean = false,
                        /** Per-file deletion-vector paths (parallel to
                          * `files`, "" = none). Always empty in practice
                          * — merge-on-read requires the parquet payload
                          * — but the skip is generic. */
                        dvs: Seq[String] = Seq.empty)
    extends PartitionReader[InternalRow] {
  private val queue = files.zipWithIndex.iterator
  private var lines: java.io.BufferedReader = _
  private val fieldIndex = schema.fieldNames.zipWithIndex.toMap
  private val fileIdx: Int =
    if (stampFile) schema.fieldNames.indexOf(CommitSink.FILE_COL) else -1
  private val posIdx: Int =
    if (stampPos) schema.fieldNames.indexOf(CommitSink.POS_COL) else -1
  private var curFile: UTF8String = _
  /** Physical position (line index) of the NEXT row in the current file. */
  private var pos = 0L
  private var dv: Array[Long] = Array.emptyLongArray
  private var dvPtr = 0
  // Emit UnsafeRow, not GenericInternalRow: consumers that buffer or
  // shuffle scan output directly (the row-level ReplaceData write does)
  // assume the binary row format — a generic row on that path is read
  // as garbage memory. Same device every built-in row reader uses.
  private val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
  private var row: InternalRow = _

  private def deleted(p: Long): Boolean = {
    while (dvPtr < dv.length && dv(dvPtr) < p) dvPtr += 1
    dvPtr < dv.length && dv(dvPtr) == p
  }

  @scala.annotation.tailrec
  private def nextLine(): String = {
    if (lines == null) {
      if (!queue.hasNext) return null
      val (name, idx) = queue.next()
      val f = Paths.get(name)
      curFile = UTF8String.fromString(f.getFileName.toString)
      lines = CommitSink.io.newBufferedReader(f)
      pos = 0L
      dvPtr = 0
      dv = dvs.lift(idx).filter(_.nonEmpty)
        .map(p => CommitSink.readDv(Paths.get(p)))
        .getOrElse(Array.emptyLongArray)
    }
    val l = lines.readLine()
    if (l != null) l
    else { lines.close(); lines = null; nextLine() }
  }

  @scala.annotation.tailrec
  final override def next(): Boolean = {
    val l = nextLine()
    // copy(): the projection reuses ONE buffer; defensive against any
    // consumer that buffers row references across advances (fixture-
    // scale files — the per-row allocation is not a hot path)
    if (l == null) false
    else {
      val p = pos; pos += 1
      if (deleted(p)) next()
      else { row = toUnsafe(parse(l, p)).copy(); true }
    }
  }
  override def get(): InternalRow = row
  override def close(): Unit = if (lines != null) lines.close()

  private def parse(line: String, p: Long): InternalRow = {
    val vals = new Array[Any](schema.length)
    var i = 1 // past '{'
    while (i < line.length && line.charAt(i) != '}') {
      i += 1 // opening key quote (keys are raw field names, never escaped)
      val ks = i
      while (line.charAt(i) != '"') i += 1
      val key = line.substring(ks, i)
      i += 2 // closing quote + ':'
      if (line.charAt(i) == '"') {
        i += 1
        val sb = new java.lang.StringBuilder
        while (line.charAt(i) != '"') {
          if (line.charAt(i) == '\\') {
            line.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'u' =>
                sb.append(Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c => sb.append(c); i += 2 // \" and \\
            }
          } else { sb.append(line.charAt(i)); i += 1 }
        }
        i += 1
        fieldIndex.get(key).foreach(j =>
          vals(j) = UTF8String.fromString(sb.toString))
      } else {
        val vs = i
        while (i < line.length && line.charAt(i) != ',' && line.charAt(i) != '}') i += 1
        val raw = line.substring(vs, i)
        fieldIndex.get(key).foreach { j =>
          vals(j) = schema(j).dataType match {
            case LongType    => raw.toLong
            case IntegerType => raw.toInt
            case DoubleType  => java.lang.Double.parseDouble(raw)
            case BooleanType => raw.toBoolean
            case t => sys.error(s"unreachable: $t validated at write build()")
          }
        }
      }
      if (i < line.length && line.charAt(i) == ',') i += 1
    }
    if (fileIdx >= 0) vals(fileIdx) = curFile
    if (posIdx >= 0) vals(posIdx) = p
    new GenericInternalRow(vals)
  }
}
