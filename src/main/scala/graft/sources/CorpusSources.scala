package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion sources — the at-rest formats training-data
  * pipelines actually receive, with the production concerns handled:
  * malformed-record quarantine for JSONL, record-structure parsing for
  * WARC.
  */
object CorpusSources {

  /** The documents-table schema JSONL must land in. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Read a JSONL corpus (one JSON document per line — the lingua
    * franca of text-corpus distribution). Bad input is NOT dropped
    * silently and NOT allowed to fail the job: PERMISSIVE mode routes
    * unparseable lines to `_corrupt_record`, and rows that parsed but
    * miss a required field (doc_id/text) are quarantined too — as
    * their re-serialized JSON — so EVERY excluded line is observable
    * and re-processable (a schema-valid-but-incomplete row vanishing
    * into neither split would be exactly the silent loss this reader
    * exists to prevent). The two frames re-scan the source rather than
    * share a cache: JSON scans are splittable and cheap, while a
    * session-lifetime cache of every corpus read is a leak. */
  def readJsonlDocs(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(DocSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    val complete = col("_corrupt_record").isNull &&
      col("doc_id").isNotNull && col("text").isNotNull
    val clean = raw.filter(complete).drop("_corrupt_record")
    val quarantine = raw.filter(!complete)
      .select(coalesce(col("_corrupt_record"),
        to_json(struct(DocSchema.fieldNames.map(col).toIndexedSeq: _*)))
        .as("raw_line"))
    (clean, quarantine)
  }

  /** One parsed WARC record. */
  final case class WarcRecord(
      path: String,
      warcType: String,
      targetUri: String,
      contentType: String,
      nBytes: Long,
      payload: Array[Byte])

  /** Read WARC container files (ISO 28500 — the Common Crawl format):
    * each record is a `WARC/1.0` header block (Name: value lines, CRLF,
    * blank line) followed by exactly Content-Length payload bytes and a
    * trailing CRLFCRLF.
    *
    * Files are read whole (`binaryFile`) and split into records in a
    * narrow mapPartitions — plain WARC is not block-splittable (record
    * boundaries are only discoverable by walking headers), which is why
    * Common Crawl ships thousands of ~1 GB files: file-level
    * parallelism is the scale unit, and
    * `spark.sql.files.maxPartitionBytes` keeps one file per task.
    * Malformed records end the walk for that file; records parsed up to
    * that point are kept. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) => parseWarc(p, bytes) })
      .toDF()
  }

  /** Walk the records of one WARC file LAZILY — records stream out as
    * the consumer pulls, so a task never holds the whole file's
    * payloads a second time alongside the input array (the file IS the
    * task's memory unit at Common Crawl sizes). Never throws on
    * malformed input — parsing stops at the first unparseable record,
    * keeping what came before. */
  def parseWarc(path: String, b: Array[Byte]): Iterator[WarcRecord] =
    Iterator.unfold(0) { i =>
      if (i >= b.length) None
      else headerBlock(b, i) match {
        case Some((headers, bodyStart)) if headers.contains("content-length") =>
          val len = headers("content-length").toLongOption.getOrElse(-1L)
          if (len < 0 || bodyStart + len > b.length) None
          else {
            val payload = java.util.Arrays.copyOfRange(
              b, bodyStart, (bodyStart + len).toInt)
            var next = (bodyStart + len).toInt
            // skip the record-terminating CRLFCRLF (tolerate fewer)
            var skipped = 0
            while (next < b.length && skipped < 4 &&
                (b(next) == '\r' || b(next) == '\n')) { next += 1; skipped += 1 }
            Some((WarcRecord(
              path,
              headers.getOrElse("warc-type", ""),
              headers.getOrElse("warc-target-uri", ""),
              headers.getOrElse("content-type", ""),
              len,
              payload), next))
          }
        case _ => None
      }
    }

  /** Parse one `WARC/1.0` header block at `start`: returns lowercased
    * header map and the payload start offset, or None if the bytes at
    * `start` are not a WARC header. Lines are decoded as UTF-8 (the
    * WARC spec's header encoding — per-char Byte.toChar would
    * sign-extend bytes ≥ 0x80 into garbage), and RFC-2822-style folded
    * continuation lines (leading space/tab) extend the previous
    * header's value instead of aborting the file. */
  private def headerBlock(b: Array[Byte],
      start: Int): Option[(Map[String, String], Int)] = {
    val magic = "WARC/"
    if (start + magic.length > b.length ||
        !(0 until magic.length).forall(k => b(start + k) == magic(k).toByte))
      return None
    var i = start
    var lineStart = start
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var firstLine = true
    while (i < b.length) {
      if (b(i) == '\n') {
        val lineEnd = if (i > lineStart && b(i - 1) == '\r') i - 1 else i
        val s = new String(b, lineStart, lineEnd - lineStart,
          java.nio.charset.StandardCharsets.UTF_8)
        if (s.isEmpty) return Some((headers.toMap, i + 1))
        if (!firstLine) {
          if (s.charAt(0) == ' ' || s.charAt(0) == '\t') {
            // folded continuation of the previous header
            if (lastKey == null) return None
            headers(lastKey) = headers(lastKey) + " " + s.trim
          } else {
            val sep = s.indexOf(':')
            if (sep < 0) return None
            lastKey = s.substring(0, sep).trim.toLowerCase
            headers(lastKey) = s.substring(sep + 1).trim
          }
        }
        firstLine = false
        lineStart = i + 1
      }
      i += 1
    }
    None // ran out of bytes before the blank line
  }
}
