package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** The commit sink's STORAGE SEAM (r14): every byte the lakehouse reads
  * or writes — staged data files, deletion vectors, equality-delete key
  * files, manifests — goes through this trait, so binding the sink to an
  * object store or Hadoop `FileSystem` is ONE new implementation instead
  * of a rewrite of CommitSink/ParquetPayload. The operations are chosen
  * to map 1:1 onto object-store primitives:
  *
  *  - `readString`/`writeString`/streams → GET/PUT
  *  - `atomicReplace` → the conditional-put/rename the manifest swap
  *    needs (paired with the commit-id CAS in [[CommitSink.writeManifest]])
  *  - `promote` → copy-then-delete or single-object rename (staged names
  *    are nonce-unique, so non-atomic promotion is still safe — nothing
  *    references a final name until the manifest swap)
  *  - `list` → prefix listing (names only — callers never need handles)
  *
  * Executor-side consumers (vector writers, payload decoders) reach the
  * binding through [[CommitSink.io]]; the trait is Serializable so a
  * future non-object binding can be shipped in task closures.
  *
  * Local NIO ([[NioCommitIO]]) is the only binding today — the
  * single-host deployment every test and bench runs — but the seam is
  * what keeps "manifest-defines-the-table on non-transactional object
  * stores" an implementation away rather than a redesign. */
private[graft] trait CommitIO extends Serializable {
  // parquet-java file handles (payload encode/decode)
  def inputFile(p: Path): org.apache.parquet.io.InputFile
  def outputFile(p: Path): org.apache.parquet.io.OutputFile
  // byte/char streams (vectors, json payload)
  def newInputStream(p: Path): java.io.InputStream
  def newOutputStream(p: Path): java.io.OutputStream
  def newBufferedReader(p: Path): java.io.BufferedReader
  def newBufferedWriter(p: Path): java.io.BufferedWriter
  // whole-object text (manifests)
  def readString(p: Path): String
  def writeString(p: Path, s: String): Unit
  /** Atomic replace of `target` with `tmp`: readers see the old or the
    * new object, never a torn one — the manifest-swap primitive. */
  def atomicReplace(tmp: Path, target: Path): Unit
  /** Staged → final-name promotion. Final names are nonce-unique and
    * unreferenced until the manifest swap, so atomicity is not load-
    * bearing here — but the local binding gets it for free. */
  def promote(src: Path, dst: Path): Unit
  def exists(p: Path): Boolean
  def isDirectory(p: Path): Boolean
  def deleteIfExists(p: Path): Boolean
  def createDirectories(p: Path): Unit
  /** Child NAMES of a directory/prefix (not paths, not handles). */
  def list(p: Path): Seq[String]
  def size(p: Path): Long
  def lastModifiedMs(p: Path): Long
}

/** The local-filesystem binding — plain `java.nio` + parquet-java's
  * Local{Input,Output}File. */
private[graft] object NioCommitIO extends CommitIO {
  override def inputFile(p: Path): org.apache.parquet.io.InputFile =
    new org.apache.parquet.io.LocalInputFile(p)
  override def outputFile(p: Path): org.apache.parquet.io.OutputFile =
    new org.apache.parquet.io.LocalOutputFile(p)
  override def newInputStream(p: Path): java.io.InputStream =
    Files.newInputStream(p)
  override def newOutputStream(p: Path): java.io.OutputStream =
    Files.newOutputStream(p)
  override def newBufferedReader(p: Path): java.io.BufferedReader =
    Files.newBufferedReader(p)
  override def newBufferedWriter(p: Path): java.io.BufferedWriter =
    Files.newBufferedWriter(p)
  override def readString(p: Path): String = Files.readString(p)
  override def writeString(p: Path, s: String): Unit = {
    Files.writeString(p, s); ()
  }
  override def atomicReplace(tmp: Path, target: Path): Unit = {
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }
  override def promote(src: Path, dst: Path): Unit = {
    Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE); ()
  }
  override def exists(p: Path): Boolean = Files.exists(p)
  override def isDirectory(p: Path): Boolean = Files.isDirectory(p)
  override def deleteIfExists(p: Path): Boolean = Files.deleteIfExists(p)
  override def createDirectories(p: Path): Unit = {
    Files.createDirectories(p); ()
  }
  override def list(p: Path): Seq[String] = {
    // the stream holds a directory fd until closed — a long-lived driver
    // lists on every plan/sweep, so the explicit close is load-bearing
    val s = Files.list(p)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }
  override def size(p: Path): Long = Files.size(p)
  override def lastModifiedMs(p: Path): Long =
    Files.getLastModifiedTime(p).toMillis
}
