package graft.operators

import org.apache.spark.sql.SparkSession

/** Blue/green rebuild discipline for nightly serving artifacts, shared
  * by every bucketed index this engine persists (media frame postings,
  * the slim frame index, the embedding home-cell rel — reference
  * analog: the usage loader's load-then-commit ledger rule,
  * `server/app/usage_loader.rb:83-163`, generalized to catalog
  * tables). A direct `mode("overwrite")` drops and rewrites
  * the files UNDER the live name — exactly the half-written-table
  * window a running stream's next micro-batch would read. Instead the
  * rebuild writes a fresh version-suffixed table `<table>_v<N>` and
  * only then swaps the serving name (`CREATE OR REPLACE VIEW`) onto
  * it — one catalog operation, so a reader resolving `<table>`
  * mid-rebuild sees either the old complete version or the new
  * complete version, never a torn one. The view is a bare `SELECT *`:
  * the bucketed scan's partitioning AND any column metadata (build
  * stride, baked cut, quantizer fingerprint) flow through to consumers
  * unchanged (spec-pinned). The PREVIOUS version is kept — a stream
  * that resolved it before the swap keeps reading complete data — and
  * everything older is dropped (catalog and, for external tables,
  * files), so nightly re-runs hold at most two versions. */
object VersionedTable {

  /** Write a new version of `table` via `write(vTable, vPath)`, swap
    * the serving view, prune older versions. Returns the versioned
    * table name written.
    *
    * Version discovery matches against the LOWERCASED base name: the
    * catalog lowercases table identifiers, so a mixed-case `table`
    * argument that were matched verbatim would find no versions every
    * night and overwrite the live `_v1` the serving view points at —
    * the exact torn-read window this helper exists to close. As a
    * second belt, a computed version name that somehow already exists
    * (catalog drift, a listing this scan could not see) is never
    * overwritten — the version number bumps past it. */
  def rebuild(spark: SparkSession, table: String, path: Option[String])(
      write: (String, Option[String]) => Unit): String = {
    val base = table.toLowerCase(java.util.Locale.ROOT)
    val pat = (java.util.regex.Pattern.quote(base) + "_v(\\d+)").r
    val versions = spark.sqlContext.tableNames().toSeq.collect {
      case pat(n) => n.toInt
    }.sorted
    var next = versions.lastOption.getOrElse(0) + 1
    while (spark.catalog.tableExists(s"${base}_v$next")) next += 1
    val vTable = s"${base}_v$next"
    write(vTable, path.map(p => s"$p/v$next"))
    // one-time migration: a legacy plain TABLE holding the serving
    // name blocks CREATE VIEW; its files are replaced by this rebuild
    if (spark.catalog.tableExists(base) &&
        spark.catalog.getTable(base).tableType != "VIEW")
      spark.sql(s"DROP TABLE `$base`")
    spark.sql(s"CREATE OR REPLACE VIEW `$base` AS SELECT * FROM `$vTable`")
    versions.dropRight(1).foreach { v =>
      spark.sql(s"DROP TABLE IF EXISTS `${base}_v$v`")
      // path-based tables are EXTERNAL — drop leaves the files; delete
      // them so nightly rebuilds hold at most two versions of bytes too
      path.foreach { p =>
        val dir = new org.apache.hadoop.fs.Path(s"$p/v$v")
        dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(dir, true)
      }
    }
    Parallelism.logDispatch("VersionedTable",
      s"$base -> $vTable (kept ${versions.lastOption.map(v => s"${base}_v$v")
        .getOrElse("none")} for in-flight readers; dropped " +
        s"${versions.dropRight(1).size} older)")
    vTable
  }
}
