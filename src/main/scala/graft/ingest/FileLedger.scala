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

  final case class FileState(path: String, mtime: Long)
  final case class Diff(
      added: Seq[String], changed: Seq[String], removed: Seq[String]) {
    /** Files whose existing rows must be dropped. */
    def toDrop: Seq[String] = changed ++ removed
    /** Files that must be (re)loaded. */
    def toLoad: Seq[String] = added ++ changed
  }

  /** Pure diff of current listing vs ledger (`usage_loader.rb:83-115`). */
  def diff(current: Seq[FileState], ledger: Seq[FileState]): Diff = {
    val cur = current.map(f => f.path -> f.mtime).toMap
    val old = ledger.map(f => f.path -> f.mtime).toMap
    Diff(
      added = current.collect { case f if !old.contains(f.path) => f.path },
      changed = current.collect {
        case f if old.get(f.path).exists(_ != f.mtime) => f.path },
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
      .map(st => FileState(st.getPath.toString, st.getModificationTime))
  }
}
