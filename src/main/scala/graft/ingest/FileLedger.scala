package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** List a directory as (path, mtime) FileStates. Driver-side; fine
    * for fixtures and small dirs — the sync path uses [[listFilesDs]]. */
  def listFiles(spark: SparkSession, dir: String, glob: String = "*"): Seq[FileState] = {
    val p = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile)
      .map(st => FileState(st.getPath.toString, st.getModificationTime,
        st.getLen))
  }

  /** Distributed listing of `Path(dir, glob)`: the driver expands only
    * the DIRECTORY component of the pattern (O(directories) — for a
    * date-partitioned lake, thousands, not the 10⁷ files inside), then
    * executors list each matched directory and apply the glob's
    * filename component. The per-file (path, mtime, size) set lives in
    * the cluster as a Dataset; the driver never materializes it. */
  def listFilesDs(spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[FileState] = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val full = new org.apache.hadoop.fs.Path(dir, glob)
    val parent = full.getParent
    val namePattern = full.getName
    val fs = parent.getFileSystem(conf.value)
    val dirs = Option(fs.globStatus(parent)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isDirectory).map(_.getPath.toString)
    val slices = math.max(1, math.min(dirs.size,
      spark.sparkContext.defaultParallelism * 4))
    spark.createDataset(
      spark.sparkContext.parallelize(dirs, slices).flatMap { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val f = p.getFileSystem(conf.value)
        val filt = new org.apache.hadoop.fs.GlobFilter(namePattern)
        f.listStatus(p).iterator
          .filter(st => st.isFile && filt.accept(st.getPath))
          .map(st => FileState(st.getPath.toString, st.getModificationTime,
            st.getLen))
      })
  }

  /** Join-based diff of two FileState datasets — the cluster-side twin
    * of [[diff]]: O(files) stays distributed; only rows whose status
    * changed (added/changed/removed) survive, so a steady-state sync
    * collects O(changed files), never O(lake). */
  def diffDs(current: Dataset[FileState],
      ledger: Dataset[FileState]): DataFrame = {
    val c = current.toDF().select(col("path"),
      struct(col("mtime"), col("size")).as("c"))
    val l = ledger.toDF().select(col("path"),
      struct(col("mtime"), col("size")).as("l"))
    c.join(l, Seq("path"), "full_outer")
      .select(col("path"),
        when(col("l").isNull, lit("added"))
          .when(col("c").isNull, lit("removed"))
          .when(col("c") =!= col("l"), lit("changed")).as("status"))
      .filter(col("status").isNotNull)
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
    * Scale posture: listing is distributed ([[listFilesDs]] — driver
    * cost O(directories)), the ledger is read as a table, and the diff
    * is a full-outer JOIN ([[diffDs]]); the driver materializes only
    * the diff — O(changed files) in steady state, never O(lake). (The
    * reference's loader held the whole set driver-side,
    * `usage_loader.rb:100-113`; a 10⁷-file lake forbids that.) The
    * reload itself is batched: ONE `loadAll` scan over every to-load
    * path plus ONE literal-map lookup attaches `file_id`, so a
    * 10k-file backfill plans in O(1) branches. An initial backfill's
    * diff IS the whole lake — unavoidable, since the concrete paths
    * must reach `loadAll`; steady-state increments are the design
    * point.
    *
    * `loadAll` maps the batch of paths to their rows in one DataFrame;
    * each row must be attributable to its source file via
    * `input_file_name()` (true of any `spark.read.*(paths: _*)`). */
  def syncAll(spark: SparkSession, inputDir: String, glob: String,
      factDir: String, ledgerDir: String,
      loadAll: Seq[String] => DataFrame): Diff = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val ledgerFs = ledgerPath.getFileSystem(conf)
    // fact may live on a different filesystem than the ledger (s3a fact,
    // local ledger): resolve each from its own path
    val factFs = new org.apache.hadoop.fs.Path(factDir).getFileSystem(conf)
    // one listing snapshot reused by the diff AND the ledger rewrite
    val current = listFilesDs(spark, inputDir, glob).cache()
    try {
      val ledger =
        if (!ledgerFs.exists(ledgerPath)) spark.emptyDataset[FileState]
        else spark.read.parquet(ledgerDir).as[FileState]
      // only the diff reaches the driver — O(changed), not O(files)
      val diffRows = diffDs(current, ledger).collect()
      def of(status: String): Seq[String] =
        diffRows.collect { case r if r.getString(1) == status => r.getString(0) }
          .toSeq.sorted
      val d = Diff(of("added"), of("changed"), of("removed"))
      // cascade delete: one partition dir per dropped file
      d.toDrop.foreach { p =>
        factFs.delete(
          new org.apache.hadoop.fs.Path(factDir, s"file_id=${fileId(p)}"), true)
      }
      if (d.toLoad.nonEmpty) {
        attachFileId(loadAll(d.toLoad), d.toLoad)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("file_id")
          .parquet(factDir)
      }
      // ledger last (see above); written straight from the distributed
      // listing — metadata-sized partitions, no driver materialization
      current.toDF().write.mode("overwrite").parquet(ledgerDir)
      d
    } finally current.unpersist()
  }

  /** Per-file-loader form of [[syncAll]], for heterogeneous sources
    * where each path needs its own read (different formats/schemas).
    * Plans one union branch per to-load file — fine for steady-state
    * increments (a handful of files); large backfills should use
    * [[syncAll]] with a single multi-path read. */
  def sync(spark: SparkSession, inputDir: String, glob: String,
      factDir: String, ledgerDir: String,
      load: String => DataFrame): Diff =
    syncAll(spark, inputDir, glob, factDir, ledgerDir,
      paths => paths.map(p => load(p).withColumn(SrcPathCol, lit(p)))
        .reduce(_ unionByName _))

  /** Column the batch loader may pre-attach to claim each row's source
    * path; when absent, `input_file_name()` supplies it. */
  val SrcPathCol = "_graft_src_path"

  /** Attach the partition column `file_id` to a batch-loaded DataFrame:
    * rows are attributed to their source via [[SrcPathCol]] (if the
    * loader set it) or `input_file_name()`, then mapped through ONE
    * literal map {normalized path → fileId} — no per-file plan
    * branches, no UDF. Normalization strips the `scheme://authority`
    * URI prefix so the listing's `file:/x` form and
    * `input_file_name()`'s `file:///x` form agree. Because
    * `input_file_name()` yields the URI-ENCODED path (spaces → `%20`),
    * the map carries BOTH the raw and the encoded form of every path —
    * encoding driver-side with the same `Path.toUri` rule Spark uses,
    * rather than url-decoding column-side (whose `+`→space rule would
    * corrupt legitimate `+` in paths). Any row whose path matches
    * neither form fails the job loudly — a silent null `file_id` would
    * drop the row from the ledger's cascade-delete and quietly corrupt
    * incremental state. */
  def attachFileId(loaded: DataFrame, paths: Seq[String]): DataFrame = {
    val idMap = paths.flatMap { p =>
      val id = fileId(p)
      Seq(normalizePath(p) -> id, encodedPath(p) -> id)
    }.toMap
    val src =
      if (loaded.columns.contains(SrcPathCol)) col(SrcPathCol)
      else input_file_name()
    val normalized = regexp_replace(src, UriPrefixRe, "")
    val mapped = element_at(typedLit(idMap), normalized)
    loaded
      .withColumn("file_id",
        when(mapped.isNotNull, mapped).otherwise(raise_error(concat(
          lit("FileLedger.attachFileId: row from unattributed source "),
          normalized))))
      .drop(SrcPathCol)
  }

  private val UriPrefixRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?"

  /** Driver-side twin of the column normalization in [[attachFileId]]. */
  def normalizePath(p: String): String =
    p.replaceFirst(UriPrefixRe, "")

  /** The URI-encoded, scheme-stripped form `input_file_name()` reports
    * for path `p` — computed with the same `Path.toUri` encoding Spark
    * itself applies. */
  def encodedPath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getRawPath

}
