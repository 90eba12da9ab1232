package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level ingest ledger — the reference's `LoadedFiles` table +
  * mtime diff + FK-cascade purge (`server/app/usage_loader.rb:83-163`,
  * T2/T3/T4) re-expressed for an append-only lake:
  *
  *  - every fact row carries its source `fileName` (the reference's
  *    `fileNameId` FK, `usage_database.rb:112-118`);
  *  - a reconcile pass diffs the current listing (path, mtime) against
  *    the ledger: new files load, changed-mtime files reload (their old
  *    rows dropped — the cascade delete), vanished files purge;
  *  - the rewrite is one anti-join + union, atomic via parquet
  *    overwrite (T4: a failed pass leaves the previous fact intact).
  *
  * Structured Streaming's checkpoint covers the new-file case natively
  * (see [[graft.streaming.StreamingUsage]]); this ledger exists for the
  * mutate-in-place cases streaming file sources don't handle.
  */
object FileLedger {

  /** `size` joins mtime in the change test: filesystems with coarse
    * mtime granularity (FAT: 2 s; some NFS: 1 s) can miss a rewrite
    * that lands within the same tick — a different length still
    * catches it (the rsync-style mtime+size check). Same-length
    * same-tick rewrites remain undetectable by ANY metadata diff;
    * default -1 keeps metadata-less fixtures on mtime-only behavior. */
  final case class FileState(path: String, mtime: Long, size: Long = -1L)
  final case class Diff(
      added: Seq[String], changed: Seq[String], removed: Seq[String]) {
    /** Files whose existing rows must be dropped. */
    def toDrop: Seq[String] = changed ++ removed
    /** Files that must be (re)loaded. */
    def toLoad: Seq[String] = added ++ changed
  }

  /** Pure diff of current listing vs ledger (`usage_loader.rb:83-115`). */
  def diff(current: Seq[FileState], ledger: Seq[FileState]): Diff = {
    val cur = current.map(f => f.path -> f).toMap
    val old = ledger.map(f => f.path -> f).toMap
    Diff(
      added = current.collect { case f if !old.contains(f.path) => f.path },
      changed = current.collect {
        case f if old.get(f.path).exists(o =>
          o.mtime != f.mtime || o.size != f.size) => f.path },
      removed = ledger.collect { case f if !cur.contains(f.path) => f.path })
  }

  /** Apply a diff to a fact DataFrame keyed by `fileName`:
    * drop rows of changed/removed files, append freshly loaded rows.
    * `load` maps a path to its fact rows (must include `fileName`). */
  def reconcile(fact: DataFrame, d: Diff, load: String => DataFrame): DataFrame = {
    val kept =
      if (d.toDrop.isEmpty) fact
      else fact.filter(!col("fileName").isin(d.toDrop: _*))
    d.toLoad.map(load).foldLeft(kept)(_ unionByName _)
  }

  /** List a directory as (path, mtime) FileStates. */
  def listFiles(spark: SparkSession, dir: String, glob: String = "*"): Seq[FileState] = {
    val p = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile)
      .map(st => FileState(st.getPath.toString, st.getModificationTime,
        st.getLen))
  }

  /** Stable partition token for a source path — used as the fact's
    * `file_id=` partition value, so "reload file X" is an overwrite of
    * exactly one partition directory. Human-readable basename plus a
    * full-path hash (two files may share a basename across dirs);
    * sanitized to the filesystem-safe charset. Computed driver-side in
    * BOTH the delete and the load path, so the two always agree. */
  def fileId(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(path))
    s"${base}_$h"
  }

  /** Persistent ledger-driven sync of a file-partitioned fact table —
    * the reference's full reconcile loop (`usage_loader.rb:83-163`:
    * mtime diff, cascade delete of a changed file's rows, reload),
    * independent of any forced reprocess window: a file modified
    * MONTHS after ingest is caught by the mtime diff and reloaded,
    * exactly like the reference.
    *
    * The fact at `factDir` is partitioned by `file_id` ([[fileId]] of
    * the source path), so the reconcile is overwrite-BY-FILE, never a
    * table rewrite:
    *  - changed/removed files → their single partition dir is dropped
    *    (the FK-cascade delete);
    *  - added/changed files → `load(path)` rows land via dynamic
    *    partition overwrite into exactly their partition.
    * At 100 TB the pass costs O(changed files), not O(table).
    *
    * The ledger (path, mtime, size) is persisted at `ledgerDir` AFTER
    * the fact update: a crash in between re-ingests the affected files
    * on the next pass — idempotent, because partition overwrite
    * replaces rather than appends (T4's at-least-once-then-dedup
    * discipline). Returns the applied diff.
    *
    * Scale seams (deliberate, documented): the listing and diff are
    * driver-side — file METADATA, ~100 B/file, fine to tens of
    * millions of files (the reference's loader was equally
    * driver-side); and each changed file contributes one branch to the
    * reload union, so a pass touching 10k+ files pays plan-analysis
    * cost linear in that count — batch such backfills, or load whole
    * directories through one `load` call. Steady-state increments
    * touch a handful of files and hit neither seam. */
  def sync(spark: SparkSession, inputDir: String, glob: String,
      factDir: String, ledgerDir: String,
      load: String => DataFrame): Diff = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = ledgerPath.getFileSystem(conf)
    val current = listFiles(spark, inputDir, glob)
    val ledger =
      if (!fs.exists(ledgerPath)) Seq.empty[FileState]
      else {
        import spark.implicits._
        spark.read.parquet(ledgerDir).as[FileState].collect().toSeq
      }
    val d = diff(current, ledger)
    // cascade delete: one partition dir per dropped file
    d.toDrop.foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(factDir, s"file_id=${fileId(p)}"),
        true)
    }
    if (d.toLoad.nonEmpty) {
      d.toLoad.map(p => load(p).withColumn("file_id", lit(fileId(p))))
        .reduce(_ unionByName _)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("file_id")
        .parquet(factDir)
    }
    { // ledger last (see above); tiny table, single file
      import spark.implicits._
      current.toDF().coalesce(1).write.mode("overwrite").parquet(ledgerDir)
    }
    d
  }
}
