package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pointer-swap table commits for mutable corpus directories — the
  * object-store-safe protocol the rename-based flat-directory path
  * ([[Snapshots]]/[[Layout]] legacy mode) cannot provide. On HDFS a
  * directory rename is atomic; on S3-style object stores rename is
  * copy+delete and there are no directories at all, so tmp-then-swap has a
  * corruption window exactly where a 100 TB corpus actually lives. This
  * protocol never renames anything:
  *
  * {{{
  * <table>/
  *   _commits/v3.ok     # empty marker files; current = max committed N
  *   v1/  ... parquet   # immutable data versions
  *   v3/  ... parquet
  * }}}
  *
  *   - A commit writes the FULL new version directory `v{N}` first (Spark's
  *     committer drops `_SUCCESS` when the job completes), then creates the
  *     empty marker `_commits/v{N}.ok` — a single-object PUT, atomic on
  *     every store.
  *   - A reader lists `_commits/`, takes the highest N whose data carries
  *     `_SUCCESS`, and reads `v{N}` only. A crash between data write and
  *     marker leaves a garbage directory that no reader ever sees; a crash
  *     after the marker leaves a fully-committed version. There is no
  *     intermediate state — the failure-point semantics the tmp-then-swap
  *     protocol bought with renames, without the renames.
  *   - Old versions stay readable (time travel / in-flight readers) until
  *     [[vacuum]] retires them.
  *
  * [[commit]] assumes single-writer discipline (the marker create uses
  * `overwrite = false`, so two racing writers of the SAME version cannot
  * both succeed — but the loser has already paid its data write).
  * [[commitContended]] adds optimistic multi-writer coordination on top:
  * atomic version claims, losers rebase on the new current version. All
  * paths go through the Hadoop [[FileSystem]] resolved from the table
  * URI — `file:` for tests, `hdfs:`/`s3a:` in production, same code.
  */
object VersionedTable {

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) =
    Hfs.fsFor(spark, root)

  private def commitsDir(root: Path) = new Path(root, "_commits")
  private def dataDir(root: Path, v: Long) = new Path(root, s"v$v")
  private val MarkerRe = """v(\d+)\.ok""".r

  /** True iff `root` is (already) a versioned table. */
  def isVersioned(spark: SparkSession, root: String): Boolean = {
    val (fs, p) = fsFor(spark, root)
    fs.exists(commitsDir(p))
  }

  /** Committed versions, ascending — markers whose data directory carries a
    * complete write (`_SUCCESS`). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = fsFor(spark, root)
    val cd = commitsDir(p)
    if (!fs.exists(cd)) Seq.empty
    else fs.listStatus(cd).toSeq
      .map(_.getPath.getName)
      .collect { case MarkerRe(n) => n.toLong }
      .filter(v => fs.exists(new Path(dataDir(p, v), "_SUCCESS")))
      .sorted
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Read the current committed version (the only directory a reader ever
    * touches). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"versioned table $root has no committed version"))
    spark.read.parquet(dataDir(new Path(root), v).toString)
  }

  /** First commit: `df` becomes v1. */
  def init(spark: SparkSession, root: String, df: DataFrame): Long =
    writeAndMark(spark, root, df, expectedNext = 1L)

  /** Commit a new version derived from the current one: `transform` runs
    * against the CURRENT version's DataFrame; its result lands as v{N+1}.
    * The data write completes before the marker PUT, so readers switch
    * atomically from v{N} to v{N+1} and a failure anywhere leaves v{N}
    * live. Returns the committed version. */
  def commit(spark: SparkSession, root: String)
      (transform: DataFrame => DataFrame): Long = {
    // resolve the version ONCE: versions() costs a listing + one exists
    // per marker, which is metadata round trips on an object store
    val cur = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"versioned table $root has no committed version"))
    val curDf = spark.read.parquet(dataDir(new Path(root), cur).toString)
    writeAndMark(spark, root, transform(curDf), expectedNext = cur + 1)
  }

  /** Thrown (only) when a commit loses because the target version number is
    * already fully committed by another writer. [[commitContended]] catches
    * this TYPE to classify the loss as contention-and-rebase; a dedicated
    * class keeps that control flow decoupled from message wording (matching
    * on message text also matched the pre-write marker check and would break
    * silently on any future rewording). Extends IllegalStateException so
    * single-writer callers that treated the old form as fatal still do. */
  final class AlreadyCommittedException(msg: String)
    extends IllegalStateException(msg)

  /** Atomic PUT-if-absent — the primitive every claim and marker rides on.
    * Returns true iff THIS caller created the file; false iff it already
    * existed (someone else won); throws on real I/O failure. Hadoop's
    * LocalFileSystem `create(overwrite = false)` is exists-check-then-
    * create — NOT atomic (two same-JVM writers both "won" a claim in the
    * round-7 torture test, and the loser deleted the winner's in-flight
    * data directory) — so `file:` goes through NIO's O_CREAT|O_EXCL
    * instead. HDFS/ABFS/GCS creates are honest conditional PUTs; classic
    * S3A still is not (documented precondition on [[commitContended]]). */
  private def atomicCreate(fs: FileSystem, path: Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(path.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs.create(path, false).close(); true }
      catch {
        case e: java.io.IOException =>
          // contention only if the path actually exists — an infra failure
          // must surface as itself, not as a phantom loss
          if (fs.exists(path)) false else throw e
      }
    }

  private def writeAndMark(spark: SparkSession, root: String, df: DataFrame,
      expectedNext: Long): Long = {
    val (fs, p) = fsFor(spark, root)
    val data = dataDir(p, expectedNext)
    val cd = commitsDir(p)
    if (!fs.exists(cd)) fs.mkdirs(cd)
    val marker = new Path(cd, s"v$expectedNext.ok")
    // NEVER overwrite a COMMITTED version: if the marker exists and its data
    // is complete, some other writer already owns this number — deleting its
    // directory here would be the lost-update this protocol exists to
    // prevent. A marker whose data never completed (tampering / partial
    // vacuum) is dead weight readers already skip — clear it and proceed.
    if (fs.exists(marker)) {
      if (fs.exists(new Path(data, "_SUCCESS")))
        throw new AlreadyCommittedException(
          s"versioned commit: v$expectedNext at $root is already committed")
      fs.delete(marker, false)
    }
    // a dangling (unmarked) directory from a crashed writer is invisible to
    // readers and safe to clear before reuse
    if (fs.exists(data)) fs.delete(data, true)
    df.write.mode("errorifexists").parquet(data.toString)
    require(fs.exists(new Path(data, "_SUCCESS")),
      s"versioned commit: $data write left no _SUCCESS marker")
    // atomic PUT-if-absent: a concurrent writer of the same version loses
    // here, AFTER its data write, never corrupting the log
    if (!atomicCreate(fs, marker))
      throw new AlreadyCommittedException(
        s"versioned commit: v$expectedNext at $root is already committed")
    expectedNext
  }

  /** Optimistic multi-writer commit — the coordination layer single-writer
    * [[commit]] deliberately omits. Writers serialize through version-number
    * CLAIMS: `_commits/v{N}.claim` is created with `overwrite = false`, the
    * claim winner derives its data from v{N−1} and commits v{N}, losers
    * wait out the winner's marker and REBASE — `transform` re-runs against
    * the NEW current version, so the result is serializable read-modify-
    * write, equal to some sequential order of all writers (spec-pinned).
    *
    * Winning a claim is NOT sufficient by itself: a stalled writer can win
    * the claim for a version some faster contender already fully committed
    * and released (read cur → stall → contender's whole cycle → resume).
    * The winner therefore re-checks that `v{N}.ok` does not exist before
    * touching anything — claims serialize all in-flight writers, so the
    * check is race-free — and [[writeAndMark]] independently refuses to
    * overwrite a committed version directory (defense in depth).
    *
    * Atomicity precondition: claims and markers go through
    * [[atomicCreate]] — an honest conditional create on HDFS, ABFS and
    * GCS, and O_CREAT|O_EXCL via NIO on `file:` (Hadoop's LocalFileSystem
    * `create(overwrite=false)` is exists-then-create and NOT atomic; the
    * 8-writer torture test caught two same-JVM claimants both "winning").
    * Classic S3A has NO conditional create (HEAD-then-PUT — two racing
    * claimants can both "win"); there, front the claim with an external
    * lock service (the Delta-on-S3 pattern) or an S3 conditional-PUT-
    * enabled store. Even then, a dishonest winner loses at the MARKER
    * create inside [[writeAndMark]] and rebases — the log stays serial.
    *
    * The winner removes its claim after the marker PUT (and on failure), so
    * the only leftover claim is a CRASHED writer's — which blocks
    * contenders at that version until an operator fences the dead process
    * and calls [[releaseClaim]]. That is the documented stale-lock
    * semantics: blocking beats the alternative (a second writer silently
    * overwriting a maybe-still-alive winner's in-flight data). The default
    * wait budget (120 × 500 ms = 60 s) covers ordinary commit durations;
    * size `maxAttempts·waitMs` ABOVE your slowest expected commit, because
    * the timeout's advice is only safe to follow once the holder is
    * actually dead.
    *
    * Do not mix plain [[commit]] and contended commits on one table: the
    * plain path does not check claims (by design — zero extra metadata
    * round trips for the single-writer common case). */
  def commitContended(spark: SparkSession, root: String, maxAttempts: Int = 120,
      waitMs: Long = 500)(transform: DataFrame => DataFrame): Long = {
    val (fs, p) = fsFor(spark, root)
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(
          s"versioned table $root has no committed version"))
      val next = cur + 1
      val cd = commitsDir(p)
      if (!fs.exists(cd)) fs.mkdirs(cd)
      val claim = new Path(cd, s"v$next.claim")
      if (atomicCreate(fs, claim)) {
        try {
          if (!fs.exists(new Path(cd, s"v$next.ok"))) {
            val curDf = spark.read.parquet(dataDir(p, cur).toString)
            try return writeAndMark(spark, root, transform(curDf), expectedNext = next)
            catch {
              // defense in depth: if v{next} somehow committed under us
              // (a store whose create-if-absent is not honest), losing at
              // the marker is CONTENTION — release the claim and rebase,
              // never propagate a half-done state to the caller
              case _: AlreadyCommittedException => ()
            }
          }
          // v{next} was fully committed while we stalled before claiming:
          // fall through (claim released below) and rebase immediately
        } finally fs.delete(claim, false)
      } else {
        // a contender holds v{next}: wait for its marker, then rebase
        Thread.sleep(waitMs)
      }
      attempt += 1 // every non-committing pass consumes budget — no livelock
    }
    throw new IllegalStateException(
      s"commitContended: no claim won after $maxAttempts attempts at $root — " +
        "the claim holder may still be COMMITTING (raise maxAttempts/waitMs) " +
        "or may have crashed; verify the holder is dead (fence it) before " +
        "releaseClaim()")
  }

  /** Admin escape hatch for a crashed claim holder (see [[commitContended]]):
    * remove the claim AFTER fencing the dead writer — releasing a claim
    * whose owner is still writing re-opens the lost-update race the claim
    * exists to prevent. */
  def releaseClaim(spark: SparkSession, root: String, v: Long): Unit = {
    val (fs, p) = fsFor(spark, root)
    fs.delete(new Path(commitsDir(p), s"v$v.claim"), false): Unit
  }

  /** Tamper-evident lineage manifest — a Merkle-style hash CHAIN over the
    * commit history: per committed version,
    * `chain = md5("v:" + n_rows + ":" + checksum + ":" + prev_chain)`
    * seeded at `"genesis"`, where `checksum` is the order- and partition-
    * invariant content sum of the caller's `rowHash` expression
    * (DECIMAL-accumulated; pick an integer row digest — a key-folded
    * hash, never a float). Rewriting ANY historical version breaks every
    * later link, so two sites comparing one final chain hash verify the
    * whole history — the audit [[commit]]'s immutability contract makes
    * cheap and an object store's mutability makes necessary. Returns
    * (version, n_rows, checksum, chain_hash), checksum as its decimal
    * string.
    *
    * Cost shape: one count+sum aggregation PER retained version (each a
    * full scan of that version — run it as an audit, not a hot path);
    * the chain itself folds driver-side over the version list, which is
    * commit-log metadata by design. */
  def lineage(spark: SparkSession, root: String,
      rowHash: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var prev = "genesis"
    val rows = versions(spark, root).map { v =>
      val agg = readVersion(spark, root, v)
        .agg(count(lit(1)).as("n"),
          sum(rowHash.cast("decimal(38,0)")).as("cs")).head()
      val n = agg.getLong(0)
      val cs = Option(agg.getDecimal(1))
        .map(_.toBigInteger.toString).getOrElse("0")
      val chain = md5hex(s"$v:$n:$cs:$prev")
      prev = chain
      (v, n, cs, chain)
    }
    import spark.implicits._
    rows.toDF("version", "n_rows", "checksum", "chain_hash")
  }

  /** Time travel: read a specific committed (and not-yet-vacuumed)
    * version — the reproducibility primitive ("train against the exact
    * corpus of run N") and the input to version diffs. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(versions(spark, root).contains(v),
      s"versioned table $root has no committed version v$v")
    spark.read.parquet(dataDir(new Path(root), v).toString)
  }

  /** Retire all but the newest `keep` committed versions (and any dangling
    * uncommitted directories older than the current version). Data-version
    * deletes happen strictly oldest-first AFTER the marker delete, so a
    * crash mid-vacuum never removes a version readers could still pick. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 1): Unit = {
    require(keep >= 1, "vacuum must keep at least the current version")
    val (fs, p) = fsFor(spark, root)
    val vs = versions(spark, root)
    vs.dropRight(keep).foreach { v =>
      fs.delete(new Path(commitsDir(p), s"v$v.ok"), false)
      fs.delete(dataDir(p, v), true)
    }
    // sweep DANGLING data directories (a writer that died before its
    // marker PUT, or a marker whose data never completed) strictly BELOW
    // the current version — never at/above it, where a live writer may be
    // mid-commit. Readers can't see them; this is the storage-leak GC.
    vs.lastOption.foreach { cur =>
      val DataRe = """v(\d+)""".r
      val kept = vs.takeRight(keep).toSet
      fs.listStatus(p).toSeq.map(_.getPath.getName).foreach {
        case DataRe(n) if n.toLong < cur && !kept(n.toLong) =>
          fs.delete(dataDir(p, n.toLong), true)
          fs.delete(new Path(commitsDir(p), s"v$n.ok"), false): Unit
        case _ =>
      }
    }
  }
}
