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
    * franca of text-corpus distribution). Malformed lines are NOT
    * dropped silently and NOT allowed to fail the job: PERMISSIVE mode
    * routes them to `_corrupt_record`, and the result is split into
    * (clean docs, quarantined raw lines) so the loss is observable and
    * re-processable. Scale: the JSON source is splittable per line;
    * compression (.gz per-file) parallelizes per file. */
  def readJsonlDocs(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(DocSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // one scan serves both splits; caller unpersists via clean
    val clean = raw.filter(col("_corrupt_record").isNull &&
      col("doc_id").isNotNull && col("text").isNotNull)
      .drop("_corrupt_record")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
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

  /** Walk the records of one WARC file. Never throws on malformed
    * input — parsing stops at the first unparseable record. */
  def parseWarc(path: String, b: Array[Byte]): Iterator[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    var ok = true
    while (ok && i < b.length) {
      headerBlock(b, i) match {
        case Some((headers, bodyStart)) if headers.contains("content-length") =>
          val len = headers("content-length").toLongOption.getOrElse(-1L)
          if (len < 0 || bodyStart + len > b.length) ok = false
          else {
            val payload = java.util.Arrays.copyOfRange(
              b, bodyStart, (bodyStart + len).toInt)
            out += WarcRecord(
              path,
              headers.getOrElse("warc-type", ""),
              headers.getOrElse("warc-target-uri", ""),
              headers.getOrElse("content-type", ""),
              len,
              payload)
            i = (bodyStart + len).toInt
            // skip the record-terminating CRLFCRLF (tolerate fewer)
            var skipped = 0
            while (i < b.length && skipped < 4 &&
                (b(i) == '\r' || b(i) == '\n')) { i += 1; skipped += 1 }
          }
        case _ => ok = false
      }
    }
    out.result().iterator
  }

  /** Parse one `WARC/1.0` header block at `start`: returns lowercased
    * header map and the payload start offset, or None if the bytes at
    * `start` are not a WARC header. */
  private def headerBlock(b: Array[Byte],
      start: Int): Option[(Map[String, String], Int)] = {
    val magic = "WARC/"
    if (start + magic.length > b.length ||
        !(0 until magic.length).forall(k => b(start + k) == magic(k).toByte))
      return None
    var i = start
    val headers = Map.newBuilder[String, String]
    var line = new StringBuilder
    var firstLine = true
    while (i < b.length) {
      val c = b(i)
      if (c == '\n') {
        val s = line.toString.stripSuffix("\r")
        if (s.isEmpty) return Some((headers.result(), i + 1))
        if (!firstLine) {
          val sep = s.indexOf(':')
          if (sep < 0) return None
          headers += (s.substring(0, sep).trim.toLowerCase ->
            s.substring(sep + 1).trim)
        }
        firstLine = false
        line = new StringBuilder
      } else line.append(c.toChar)
      i += 1
    }
    None // ran out of bytes before the blank line
  }
}
