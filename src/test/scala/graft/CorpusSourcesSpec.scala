package graft

import graft.sources.CorpusSources
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CorpusSourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("JSONL: clean docs parsed, malformed lines quarantined not dropped") {
    val dir = Files.createTempDirectory("jsonl")
    Files.write(dir.resolve("part0.jsonl"), String.join("\n",
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}""",
      """this is not json at all""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}""",
      """{"doc_id": 3, "lang": "de", "source": "s2"}""" // missing text
    ).getBytes)
    val (clean, quarantine) = CorpusSources.readJsonlDocs(spark, dir.toString)
    val docs = clean.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs == Map(1L -> "hello world", 2L -> "bonjour"))
    // BOTH failure classes are quarantined: the unparseable line as-is,
    // and the valid-JSON-but-missing-text row as re-serialized JSON —
    // nothing vanishes into neither split
    val bad = quarantine.collect().map(_.getString(0)).sorted
    assert(bad.length == 2)
    assert(bad.exists(_.startsWith("this is not json")))
    assert(bad.exists(l => l.contains("\"doc_id\":3") && l.contains("\"lang\":\"de\"")))
  }

  private def warcRecord(uri: String, body: String): Array[Byte] = {
    val payload = body.getBytes("US-ASCII")
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Type: text/plain\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      s"\r\n").getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes
  }

  test("WARC: record walk parses headers and exact-length payloads") {
    val dir = Files.createTempDirectory("warc")
    val bytes = warcRecord("http://a.example/x", "first body") ++
      warcRecord("http://b.example/y", "second, longer body text")
    Files.write(dir.resolve("f0.warc"), bytes)
    val got = CorpusSources.readWarc(spark, dir.toString)
      .collect()
      .map(r => r.getAs[String]("targetUri") ->
        new String(r.getAs[Array[Byte]]("payload"), "US-ASCII")).toMap
    assert(got == Map(
      "http://a.example/x" -> "first body",
      "http://b.example/y" -> "second, longer body text"))
  }

  test("WARC: UTF-8 header values and folded continuation lines") {
    val payload = "x".getBytes("US-ASCII")
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://ex.ample/café\r\n" + // é = 2 UTF-8 bytes
      "Content-Type: text/plain;\r\n" +
      " charset=utf-8\r\n" + // folded continuation (RFC 2822 LWSP)
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes
    val second = ("WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 0\r\n\r\n")
      .getBytes ++ "\r\n\r\n".getBytes
    val recs = CorpusSources.parseWarc("p", rec ++ second).toList
    assert(recs.length == 2) // a folded header must not abort the walk
    assert(recs.head.targetUri == "http://ex.ample/café")
    assert(recs.head.contentType == "text/plain; charset=utf-8")
    assert(recs(1).warcType == "request")
  }

  test("WARC: malformed tail keeps the records parsed before it; garbage → empty") {
    val good = warcRecord("http://a.example/x", "body")
    val truncated = good ++ "WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort".getBytes
    val recs = CorpusSources.parseWarc("p", truncated).toList
    assert(recs.map(_.targetUri) == List("http://a.example/x"))
    assert(CorpusSources.parseWarc("p", "not a warc".getBytes).isEmpty)
    // fuzz: never throws
    val rnd = new scala.util.Random(5)
    (1 to 200).foreach { _ =>
      CorpusSources.parseWarc("p",
        Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)).toList
    }
  }
}
