package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  * Rows are staged as JSON lines (schema recorded in the manifest), so
  * the payload is engine-portable and the o09 registry query can prove
  * write → commit → read-back losslessness against a DuckDB oracle over
  * the ORIGINAL table. Doubles round-trip bit-exactly: Java's
  * `Double.toString` emits the shortest representation that re-parses to
  * the same bits. Supported field types are the portable scalar set
  * (long/int/double/string/boolean) — a declared-schema sink, validated
  * at write resolution with a clear error, like TypeMapping's declared
  * ingest path.
  */
object CommitSink {
  val NAME = "graft-commit"
  private val MANIFEST = "_MANIFEST.json"
  private val STAGING = "_staging"

  private[sources] val supportedTypes: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, StringType, BooleanType)

  /** Read the committed snapshot: ONLY the manifest's file list, with the
    * manifest's schema. A target that has never seen any write (no
    * manifest at all) fails with a clear error; a committed-but-empty
    * target (zero files — e.g. a stream whose every epoch was empty)
    * reads as an empty frame of the manifest's schema. Streaming writes
    * create an empty manifest at factory creation precisely so that a
    * zero-epoch stream's target is readable. */
  def readCommitted(spark: SparkSession, dir: String): DataFrame = {
    val mf = Paths.get(dir, MANIFEST)
    require(Files.exists(mf), s"graft-commit: no committed manifest at $dir")
    val (ddl, files) = readManifest(mf)
    val schema = StructType.fromDDL(ddl)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(files.map(f => Paths.get(dir, f).toString): _*)
  }

  /** One fully-parsed manifest: the (commit, ddl, files, epochs) view a
    * commit needs, read and regex-parsed ONCE (the per-field helpers
    * below each re-read the file; a commit that called all of them did
    * five reads whose non-atomicity also widened the concurrent-writer
    * window the CAS closes). */
  private[sources] case class Manifest(commit: Long, ddl: String,
                                       files: Seq[String], epochs: Seq[Long])

  private[sources] def parseManifest(dir: Path): Option[Manifest] = {
    val mf = dir.resolve(MANIFEST)
    if (!Files.exists(mf)) None
    else {
      val txt = Files.readString(mf)
      val commit = "\"commit\":(-?[0-9]+)".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(-1L)
      val ddl = "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(txt)
        .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(sys.error(s"graft-commit: manifest missing schema: $mf"))
      val files = "\"files\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
      val epochs = "\"epochs\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("")
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
      Some(Manifest(commit, ddl, files, epochs))
    }
  }

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
    val txt = Files.readString(mf)
    val ddl = "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(txt)
      .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse(sys.error(s"graft-commit: manifest missing schema: $mf"))
    val files = "\"files\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    (ddl, files)
  }

  /** Write-and-swap the manifest. SINGLE-WRITER assumption: the manifest
    * swap is atomic for READERS, but two concurrent writers to the same
    * path would each read-modify-swap and one's files would silently
    * vanish from the manifest. `expectedPrev` (the commit id the caller
    * based its read-modify on) turns that silent loss into a hard error:
    * if another writer slipped a commit in between, the check fails and
    * nothing is swapped. Pass the sentinel [[SKIP_CAS]] only from
    * fixture/test code that owns the path exclusively. */
  private[graft] val SKIP_CAS: Long = Long.MinValue

  private[graft] def writeManifest(dir: Path, ddl: String, files: Seq[String],
                                     commitId: Long,
                                     epochs: Seq[Long] = Seq.empty,
                                     expectedPrev: Long = SKIP_CAS): Unit = {
    if (expectedPrev != SKIP_CAS) {
      val cur = currentCommit(dir)
      require(cur == expectedPrev,
        s"graft-commit: concurrent writer detected at $dir — manifest is at " +
          s"commit $cur but this writer planned commit $commitId on top of " +
          s"$expectedPrev; aborting instead of silently dropping its files")
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val body = s"""{"commit":$commitId,"epochs":[${epochs.sorted.mkString(",")}],""" +
      s""""schema":"${esc(ddl)}",""" +
      s""""files":[${files.sorted.map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = dir.resolve(MANIFEST + ".tmp")
    Files.writeString(tmp, body)
    // the atomic swap IS the commit: readers either see the old manifest
    // or the new one, never a torn state
    Files.move(tmp, dir.resolve(MANIFEST), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private[sources] def currentCommit(dir: Path): Long = {
    val mf = dir.resolve(MANIFEST)
    if (!Files.exists(mf))
      -1L
    else
      "\"commit\":(-?[0-9]+)".r.findFirstMatchIn(Files.readString(mf))
        .map(_.group(1).toLong).getOrElse(-1L)
  }

  /** Streaming epochs already folded into the manifest — the idempotence
    * ledger a re-delivered micro-batch commit is checked against. */
  private[graft] def committedEpochs(dir: Path): Seq[Long] = {
    val mf = dir.resolve(MANIFEST)
    if (!Files.exists(mf)) Seq.empty
    else "\"epochs\":\\[([^\\]]*)\\]".r.findFirstMatchIn(Files.readString(mf))
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
  }

  private[sources] def stagingDir(dir: Path): Path = dir.resolve(STAGING)

  private[sources] def sweepStaging(dir: Path): Unit = {
    val st = stagingDir(dir)
    if (Files.exists(st)) {
      // Files.list holds a directory fd until the stream is closed — a
      // long-lived driver (the bench runs every sink query twice per
      // session) would leak one per sweep without the explicit close
      val s = Files.list(st)
      try s.iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
      Files.deleteIfExists(st)
    }
  }
}

/** Commit message: one staged file a task produced (phase 1 of the 2PC). */
case class StagedFile(name: String, rows: Long) extends WriterCommitMessage

class CommitSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = CommitSink.NAME
  // reads resolve against the committed manifest's schema (also what
  // `spark.read.format("graft-commit")` binds to); a never-written
  // target is empty — the write path accepts the incoming query's
  // schema regardless (ACCEPT_ANY_SCHEMA) and records it in the manifest
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path"))
      .flatMap(p => CommitSink.parseManifest(Paths.get(p)))
      .map(m => StructType.fromDDL(m.ddl))
      .getOrElse(new StructType())
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CommitSinkTable(Option(properties.get("path"))
      .getOrElse(sys.error("graft-commit: option 'path' is required")))
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
                      acceptAnySchema: Boolean = true) extends Table
    with SupportsWrite
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.{coalesce => fnCoalesce, col, lit, not}
  import org.apache.spark.sql.{sources => sf}

  override def name(): String = s"graft_commit($path)"

  /** The committed version's schema when one exists (the catalog /
    * row-level-operation path needs real columns to resolve against);
    * empty for a never-written target (the write-only provider path —
    * ACCEPT_ANY_SCHEMA makes the incoming query's schema bind). */
  override def schema(): StructType =
    CommitSink.parseManifest(Paths.get(path))
      .map(m => StructType.fromDDL(m.ddl)).getOrElse(new StructType())

  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CommitWriteBuilder(path, info)

  /** The READ half: one input partition per committed file (the write's
    * task parallelism is the read's), rows decoded by [[CommitFileReader]]
    * — the mirror of [[CommitDataWriter]]'s staging encoder. Required by
    * SQL row-level DELETE too: Spark 4 plans `DELETE FROM t WHERE c` by
    * first building the table's scan relation (the condition is
    * normalized against it) and only then handing the translated
    * predicates to [[deleteWhere]]. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CommitScanBuilder(path)

  /** SQL UPDATE / MERGE INTO (o13) — and the fallback for DELETEs whose
    * condition the metadata path can't translate: the group-based
    * [[CommitRowLevelOperation]]. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new CommitRowLevelOperation(path, info.command())

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
    filters.forall(filterToColumn(_).isDefined)

  override def deleteWhere(filters: Array[sf.Filter]): Unit = {
    val spark = SparkSession.active
    // the pushed filters are implicitly conjunctive
    val cond = filters.flatMap(filterToColumn).reduceOption(_ && _).getOrElse(lit(true))
    CommitSink.readCommitted(spark, path)
      // DELETE removes rows where the condition is TRUE; a NULL
      // condition keeps the row
      .filter(not(fnCoalesce(cond, lit(false))))
      .write.format(CommitSink.NAME).option("path", path)
      .mode("overwrite").save()
  }
}

class CommitWriteBuilder(path: String, info: LogicalWriteInfo,
                         /** Row-level (group-based) rewrites always
                           * REPLACE: the scan read the whole committed
                           * table, so the write lands the whole post-op
                           * table as the next version. */
                         forceTruncate: Boolean = false)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncateFlag = false
  override def truncate(): WriteBuilder = { doTruncateFlag = true; this }
  override def build(): Write = {
    val schema = info.schema()
    val bad = schema.fields.filterNot(f => CommitSink.supportedTypes.contains(f.dataType))
    require(bad.isEmpty, "graft-commit supports long/int/double/string/boolean " +
      s"columns; unsupported: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    val doTruncate = doTruncateFlag || forceTruncate
    new Write {
      override def toBatch: BatchWrite = new CommitBatchWrite(path, schema, doTruncate)
      override def toStreaming: streaming.StreamingWrite =
        new CommitStreamingWrite(path, schema)
    }
  }
}

/** Group-based (copy-on-write) row-level operation — what turns SQL
  * UPDATE and MERGE INTO (and DELETE with conditions the metadata path
  * cannot translate) into executable plans on this sink: Spark reads the
  * committed table through [[CommitScanBuilder]], computes the post-op
  * row set (updated + untouched + inserted rows), and lands it through
  * the ordinary two-phase write with truncate FORCED — the whole new
  * version replaces the old under one atomic CAS'd manifest swap, so a
  * reader sees the pre-op or post-op table, never a torn state. This is
  * the Iceberg copy-on-write shape; DELETEs whose predicates DO
  * translate still take the cheaper metadata path
  * (`OptimizeMetadataOnlyDeleteFromTable` converts the rewritten plan
  * back to [[CommitSinkTable.deleteWhere]]).
  *
  * Like TRUNCATE (documented at the batch commit), a row-level rewrite
  * starts a NEW table version and resets the streaming-epoch ledger: a
  * micro-batch whose sink commit landed but whose checkpoint didn't,
  * re-delivered AFTER a DML statement ran, would re-append. Mixing a
  * standing exactly-once stream with concurrent DML on one table is a
  * coordination problem above this sink (Iceberg/Delta sequence both
  * through one transaction log); within one writer at a time — the
  * sink's declared concurrency contract — the semantics are exact. */
class CommitRowLevelOperation(path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CommitScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CommitWriteBuilder(path, info, forceTruncate = true)
  override def description(): String = s"graft-commit $cmd (copy-on-write)"
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
class CommitStreamingWrite(path: String, schema: StructType)
    extends streaming.StreamingWrite {
  private val dir = Paths.get(path)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory = {
    Files.createDirectories(CommitSink.stagingDir(dir))
    // Initialize an EMPTY manifest for a never-written target so that a
    // stream committing zero epochs (empty source) still leaves a
    // readable table — readCommitted sees commit 0 with no files and
    // returns an empty frame of this write's schema. CAS on "no manifest
    // yet" (expectedPrev = -1): if a concurrent writer commits in the
    // window after our exists-check, the swap must NOT clobber its
    // files — the CAS failure is caught and the existing manifest wins.
    if (!Files.exists(dir.resolve("_MANIFEST.json")))
      try CommitSink.writeManifest(dir, schema.toDDL, Seq.empty, 0L,
        expectedPrev = -1L)
      catch { case _: IllegalArgumentException => () }
    new CommitStreamingWriterFactory(path, schema.toDDL)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case s: StagedFile => s }
    // ONE manifest read per commit; writeManifest's CAS does the second,
    // freshest-possible read just before the swap
    val manifest = CommitSink.parseManifest(dir)
    if (manifest.exists(_.epochs.contains(epochId))) {
      // re-delivered epoch (restart replay): drop the re-staged output —
      // promoting it would double-write rows the manifest already has
      staged.foreach(s =>
        Files.deleteIfExists(CommitSink.stagingDir(dir).resolve(s.name)))
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
      val promoted = staged.zipWithIndex.map { case (s, i) =>
        val fin = f"part-e$epochId%05d-$i%05d.json"
        Files.move(CommitSink.stagingDir(dir).resolve(s.name), dir.resolve(fin),
          StandardCopyOption.ATOMIC_MOVE)
        fin
      }.toSeq
      CommitSink.writeManifest(dir, schema.toDDL, carried ++ promoted, prev + 1,
        manifest.map(_.epochs).getOrElse(Seq.empty) :+ epochId, expectedPrev = prev)
    }
    CommitSink.sweepStaging(dir)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CommitSink.sweepStaging(dir)
}

class CommitStreamingWriterFactory(path: String, ddl: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CommitDataWriter(path, ddl, partitionId, taskId, epochId)
}

class CommitBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  private val dir = Paths.get(path)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(CommitSink.stagingDir(dir))
    // ship the schema as DDL text — StructType itself is serializable,
    // but the DDL is also exactly what the manifest records
    new CommitWriterFactory(path, schema.toDDL)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // ONE manifest read per commit; writeManifest's CAS re-reads just
    // before the swap
    val manifest = CommitSink.parseManifest(dir)
    val prev = manifest.map(_.commit).getOrElse(-1L)
    val commitId = prev + 1
    val staged = messages.collect { case s: StagedFile => s }
    val (carriedDdl, carried) =
      if (truncate) (schema.toDDL, Seq.empty[String])
      else (manifest.map(_.ddl).getOrElse(schema.toDDL),
        manifest.map(_.files).getOrElse(Seq.empty))
    // Appending under a DIFFERENT column set would re-read carried files
    // as silent nulls under the new DDL — refuse BEFORE promoting
    // anything (names + types; nullability does not change the payload).
    require(carried.isEmpty || CommitSink.sameColumns(carriedDdl, schema.toDDL),
      s"graft-commit: append schema mismatch at $path — manifest has " +
        s"[$carriedDdl] but this write has [${schema.toDDL}]; use " +
        "overwrite (truncate) to replace the table under a new schema")
    // phase 2: promote each task-committed staging file to its final
    // name, then swap the manifest. Only files named by a commit message
    // are promoted — output of failed/speculative attempts stays in
    // staging and is swept below.
    val promoted = staged.zipWithIndex.map { case (s, i) =>
      val fin = f"part-c$commitId%05d-$i%05d.json"
      Files.move(CommitSink.stagingDir(dir).resolve(s.name), dir.resolve(fin),
        StandardCopyOption.ATOMIC_MOVE)
      fin
    }.toSeq
    // truncate also resets the streaming-epoch ledger; append carries it
    val epochs =
      if (truncate) Seq.empty[Long]
      else manifest.map(_.epochs).getOrElse(Seq.empty)
    CommitSink.writeManifest(dir, schema.toDDL, carried ++ promoted, commitId, epochs,
      expectedPrev = prev)
    // after the swap: previous-version files (on truncate) and stray
    // staging output are garbage no reader can see — sweep them
    if (truncate) {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          !promoted.contains(p.getFileName.toString))
        .foreach(Files.deleteIfExists(_))
      finally s.close()
    }
    CommitSink.sweepStaging(dir)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // a failed job publishes NOTHING: the manifest was never touched, so
    // the previous version is still the table; just remove the debris
    CommitSink.sweepStaging(dir)
}

class CommitWriterFactory(path: String, ddl: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CommitDataWriter(path, ddl, partitionId, taskId)
}

/** Executor-side writer: streams rows to a task-private staging file as
  * JSON lines. The (epoch, partitionId, taskId) triple makes the name
  * unique per ATTEMPT, so a speculative retry (or a replayed epoch) can
  * never clobber another attempt's staging output. */
class CommitDataWriter(path: String, ddl: String, partitionId: Int, taskId: Long,
                       epochId: Long = -1L)
    extends DataWriter[InternalRow] {
  private val schema = StructType.fromDDL(ddl)
  private val name = s"attempt-e$epochId-p$partitionId-t$taskId.json"
  private val file = CommitSink.stagingDir(Paths.get(path)).resolve(name)
  private val out = Files.newBufferedWriter(file)
  private var rows = 0L

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
    val b = new StringBuilder("{")
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i0) =>
      val i = i0 + fieldOffset
      if (!row.isNullAt(i)) {
        if (!first) b.append(',')
        first = false
        b.append('"').append(f.name).append("\":")
        f.dataType match {
          case LongType    => b.append(row.getLong(i))
          case IntegerType => b.append(row.getInt(i))
          // Double.toString is shortest-round-trip: the reader gets the
          // identical bits back (NaN/Infinity rely on Spark's default
          // allowNonNumericNumbers JSON option)
          case DoubleType  => b.append(row.getDouble(i))
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

  /** Phase 1: make the staging file durable and hand its name to the
    * driver. NOT visible to readers until the driver's manifest swap. */
  override def commit(): WriterCommitMessage = { out.close(); StagedFile(name, rows) }

  /** Task abort: this attempt's output must leave no trace. */
  override def abort(): Unit = { out.close(); Files.deleteIfExists(file) }
  override def close(): Unit = ()
}

// --- the DSv2 batch READ over the committed snapshot ----------------------

class CommitScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new CommitScan(path)
}

/** Scan = the manifest's committed view, resolved ONCE at planning: the
  * file list and schema are pinned here, so a concurrent commit swapping
  * the manifest mid-query cannot tear the read — snapshot isolation for
  * free from the manifest design. */
class CommitScan(path: String) extends Scan with Batch {
  private val manifest = CommitSink.parseManifest(Paths.get(path))
    .getOrElse(sys.error(s"graft-commit: no committed manifest at $path"))
  override def readSchema(): StructType = StructType.fromDDL(manifest.ddl)
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    manifest.files.map(f =>
      CommitFilePartition(Paths.get(path, f).toString): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new CommitReaderFactory(manifest.ddl)
  override def description(): String = s"graft-commit scan of $path"
}

case class CommitFilePartition(file: String) extends InputPartition

class CommitReaderFactory(ddl: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CommitFileReader(p.asInstanceOf[CommitFilePartition].file,
      StructType.fromDDL(ddl))
}

/** Executor-side reader: the exact mirror of [[CommitDataWriter]]'s
  * line encoder — keys are unescaped field names, values are the
  * portable scalar set with JSON string escapes (plus bare
  * NaN/Infinity/-Infinity for doubles, which `Double.parseDouble`
  * reads back bit-exactly). A field the writer omitted (null) stays
  * null. Schema-driven, no generic JSON machinery needed. */
class CommitFileReader(file: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val lines = Files.newBufferedReader(Paths.get(file))
  private val fieldIndex = schema.fieldNames.zipWithIndex.toMap
  // Emit UnsafeRow, not GenericInternalRow: consumers that buffer or
  // shuffle scan output directly (the row-level ReplaceData write does)
  // assume the binary row format — a generic row on that path is read
  // as garbage memory. Same device every built-in row reader uses.
  private val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
  private var row: InternalRow = _

  override def next(): Boolean = {
    val l = lines.readLine()
    // copy(): the projection reuses ONE buffer; defensive against any
    // consumer that buffers row references across advances (fixture-
    // scale files — the per-row allocation is not a hot path)
    if (l == null) false else { row = toUnsafe(parse(l)).copy(); true }
  }
  override def get(): InternalRow = row
  override def close(): Unit = lines.close()

  private def parse(line: String): InternalRow = {
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
    new GenericInternalRow(vals)
  }
}
