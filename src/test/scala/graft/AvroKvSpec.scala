package graft

import graft.model.{Attempt, Job, Task}
import graft.sources.AvroKv
import java.nio.file.Files
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** S4–S6 byte-compatibility: the engine reads and writes the
  * reference's Avro KV container layout (`AvroKeyValueOutputFormat`
  * with `AttemptStatsKey`/`AttemptStatsValue` and string→`LogData`
  * pairs) through the real Apache Avro codec. The "reference-layout"
  * fixtures here are written by VANILLA avro (DataFileWriter + the
  * AvroKeyValue wrapper schema) — exactly what the MR output format
  * produces — so reading them proves interop with files our code never
  * touched.
  */
class AvroKvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"avrokv_$tag").toString

  /** Reference-layout usage fixture written by plain Avro, not our
    * writer: deflate container, KeyValuePair wrapper, enum symbols. */
  private def writeReferenceUsageFixture(path: String): Unit = {
    val pair = new Schema.Parser().parse(AvroKv.usagePairSchemaJson)
    val key = new Schema.Parser().parse(AvroKv.StatsKeySchemaJson)
    val value = new Schema.Parser().parse(AvroKv.StatsValueSchemaJson)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](pair))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(pair, new java.io.File(path))
    def enumOf(s: Schema, v: String) = new GenericData.EnumSymbol(s, v)
    val rows = Seq(
      ("alice", 3600000L, "prod", false, "MAP", "SUCCESS", 2, 2, 30.5,
        Some(12.25), Some(100L), None),
      ("bob", 7200000L, "prod", true, "REDUCE", "FAILED", 1, 0, 61.0,
        None, None, Some(4096L)))
    rows.foreach { case (u, t, c, ex, tt, st, s0, f0, el, cpu, sp, rsb) =>
      val k = new GenericData.Record(key)
      k.put("user", u); k.put("time", t)
      k.put("unit", enumOf(key.getField("unit").schema(), "HOURS"))
      k.put("cluster", c); k.put("excess", ex)
      k.put("type", enumOf(key.getField("type").schema(), tt))
      k.put("status", enumOf(key.getField("status").schema(), st))
      val v = new GenericData.Record(value)
      v.put("started", s0); v.put("finished", f0)
      v.put("elapsedMinutes", el)
      v.put("cpuMinutes", cpu.map(java.lang.Double.valueOf).orNull)
      v.put("spilledRecords", sp.map(java.lang.Long.valueOf).orNull)
      v.put("reduceShuffleBytes", rsb.map(java.lang.Long.valueOf).orNull)
      val rec = new GenericData.Record(pair)
      rec.put("key", k); rec.put("value", v)
      w.append(rec)
    }
    w.close()
  }

  test("readUsageFact parses a reference-layout container it never wrote") {
    val dir = tmpDir("ref_usage")
    writeReferenceUsageFixture(s"$dir/part-r-00000.avro")
    val got = AvroKv.readUsageFact(spark, dir)
      .orderBy("user").collect()
    assert(got.length == 2)
    val a = got(0)
    assert(a.getString(0) == "alice" && a.getLong(1) == 3600000L &&
      a.getString(2) == "prod" && !a.getBoolean(3) &&
      a.getString(4) == "MAP" && a.getString(5) == "SUCCESS" &&
      a.getInt(6) == 2 && a.getInt(7) == 2 && a.getDouble(8) == 30.5 &&
      a.getDouble(9) == 12.25 && a.getDouble(10) == 100.0 && a.isNullAt(11))
    val b = got(1)
    assert(b.getString(0) == "bob" && b.getBoolean(3) &&
      b.getString(4) == "REDUCE" && b.isNullAt(9) && b.isNullAt(10) &&
      b.getLong(11) == 4096L)
  }

  test("usage fact round-trip: write → vanilla-avro read → byte-faithful values") {
    val dir = tmpDir("rt_usage")
    val fact = Seq(
      ("u1", 3600000L, "c1", false, "MAP", "SUCCESS", 3, 2, 12.5,
        Some(1.25), Some(7.0), None: Option[Long]),
      ("u2", 7200000L, "c1", true, "REDUCE", "KILLED", 1, 0, 0.75,
        None: Option[Double], None: Option[Double], Some(123L)))
      .toDF("user", "time", "cluster", "excess", "taskType", "status",
        "started", "finished", "elapsedMinutes", "cpuMinutes",
        "spilledRecords", "reduceShuffleBytes")
    AvroKv.writeUsageFact(fact, dir)
    // read the container back with PLAIN avro — proves the bytes are a
    // well-formed reference-layout file, not something only our reader
    // understands
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    assert(files.nonEmpty)
    val recs = files.flatMap { f =>
      val r = new DataFileReader[GenericRecord](
        f, new GenericDatumReader[GenericRecord]())
      val out = r.iterator.asScala.map { rec =>
        val k = rec.get("key").asInstanceOf[GenericRecord]
        val v = rec.get("value").asInstanceOf[GenericRecord]
        (k.get("user").toString, k.get("time").asInstanceOf[Long],
          k.get("unit").toString, k.get("type").toString,
          v.get("started").asInstanceOf[Int],
          v.get("elapsedMinutes").asInstanceOf[Double],
          Option(v.get("reduceShuffleBytes"))
            .map(_.asInstanceOf[Long]))
      }.toList
      r.close(); out
    }.sortBy(_._1)
    assert(recs.length == 2)
    assert(recs(0) == ("u1", 3600000L, "HOURS", "MAP", 3, 12.5, None))
    assert(recs(1) == ("u2", 7200000L, "HOURS", "REDUCE", 1, 0.75, Some(123L)))
    // and through our own reader: full fact equality
    val back = AvroKv.readUsageFact(spark, dir)
    assert(back.exceptAll(fact).isEmpty && fact.exceptAll(back).isEmpty)
  }

  private def sampleJobs: Seq[Job] = Seq(
    Job("job_1", "prod", Some("alice"), Some("wordcount"), Some("default"),
      Some("SUCCESS"), Some(1000L), Some(2000L), Some(9000L),
      Some(2), Some(1), Some(2), Some(1), Some(0), Some(0),
      tasks = Seq(
        Task("task_m_0", "MAP", Some("SUCCESS"), Some(2000L), Some(5000L),
          attempts = Seq(
            Attempt("attempt_m_0_0", "MAP", "SUCCESS", 2000L, 5000L,
              None, None, Map("CPU_MILLISECONDS" -> 1234L,
                "SPILLED_RECORDS" -> 10L),
              excess = false, minutes = 0.05, cpuMinutes = Some(0.02057)))),
        Task("task_r_0", "REDUCE", Some("SUCCESS"), Some(5000L), Some(9000L),
          attempts = Seq(
            Attempt("attempt_r_0_0", "REDUCE", "SUCCESS", 5000L, 9000L,
              Some(6000L), Some(7000L),
              Map("REDUCE_SHUFFLE_BYTES" -> 2048L),
              excess = false, minutes = 0.0666, cpuMinutes = None),
            Attempt("attempt_r_0_1", "REDUCE", "KILLED", 5500L, 8000L,
              None, None, Map.empty,
              excess = true, minutes = 0.0416, cpuMinutes = None))))),
    Job("job_2", "prod", None, None, None, Some("FAILED"),
      None, None, Some(20000L), None, None, None, None, None, None,
      tasks = Seq.empty))

  test("jobs round-trip: LogData union layout preserved through write → read") {
    val dir = tmpDir("rt_jobs")
    AvroKv.writeJobs(spark.createDataset(sampleJobs), dir)
    val back = AvroKv.readJobs(spark, dir).collect().sortBy(_.jobId)
    assert(back.toSeq == sampleJobs.sortBy(_.jobId))
    // vanilla-avro inspection: the entry union branch is the Job record
    // with the reference's schema name, key is the jobId
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val r = new DataFileReader[GenericRecord](
      f, new GenericDatumReader[GenericRecord]())
    val rec = r.iterator.next()
    assert(rec.get("key").toString.startsWith("job_"))
    val entry = rec.get("value").asInstanceOf[GenericRecord]
      .get("entry").asInstanceOf[GenericRecord]
    assert(entry.getSchema.getFullName ==
      "com.linkedin.whiteelephant.parsing.Job")
    r.close()
  }

  test("readKv maps the LogData union generically (entryType + branch structs)") {
    val dir = tmpDir("generic")
    AvroKv.writeJobs(spark.createDataset(sampleJobs), dir)
    val df = AvroKv.readKv(spark, dir)
    assert(df.columns.toSeq == Seq("key", "value"))
    val entry = df.select(col("value.entry.entryType").as("t"),
      col("value.entry.Job.jobId").as("id")).orderBy("id").collect()
    assert(entry.map(_.getString(0)).forall(_ == "Job"))
    assert(entry.map(_.getString(1)).toSeq == Seq("job_1", "job_2"))
  }

  test("exportUsageAvro lays files out like the reference's per-day job dirs") {
    implicit val s: SparkSession = spark
    val fact = graft.usage.UsageEtl.usageFact(spark.createDataset(sampleJobs))
    val root = tmpDir("layout")
    graft.app.ProcessLogs.exportUsageAvro(fact, root)
    // sampleJobs' attempts run on 1970-01-01 in cluster "prod" →
    // <root>/prod/1970/0101/part-r-*.avro (ComputeUsagePerHour's
    // outputPathForDay shape)
    val dayDir = new java.io.File(s"$root/prod/1970/0101")
    assert(dayDir.isDirectory, s"missing ${dayDir}")
    assert(dayDir.listFiles().exists(_.getName.matches("part-r-\\d{5}\\.avro")))
    val back = AvroKv.readUsageFact(spark, s"$root/prod/*/*")
    assert(back.exceptAll(fact).isEmpty && fact.exceptAll(back).isEmpty)
  }

  test("exportUsageAvro: one job, many (cluster, day) containers — group boundaries exact") {
    // writeUsageFactByDay stream-groups a sorted partition iterator
    // into one container per (cluster, day); this pins the grouping
    // against a fact that interleaves 2 clusters × 3 days with
    // adjacent groups differing in only one of the two keys
    val day = 86400000L
    val fact = Seq(
      ("u1", 3600000L, "alpha", false, "MAP", "SUCCESS", 1, 1, 10.0,
        None: Option[Double], None: Option[Double], None: Option[Long]),
      ("u2", 3600000L, "beta", false, "MAP", "SUCCESS", 1, 1, 11.0,
        None, None, None),
      ("u3", day + 3600000L, "alpha", false, "REDUCE", "FAILED", 1, 0, 12.0,
        None, None, None),
      ("u4", day + 7200000L, "alpha", true, "MAP", "KILLED", 2, 0, 13.0,
        None, None, None),
      ("u5", 2 * day + 3600000L, "beta", false, "MAP", "SUCCESS", 1, 1, 14.0,
        None, None, None))
      .toDF("user", "time", "cluster", "excess", "taskType", "status",
        "started", "finished", "elapsedMinutes", "cpuMinutes",
        "spilledRecords", "reduceShuffleBytes")
    val root = tmpDir("byday")
    graft.app.ProcessLogs.exportUsageAvro(fact, root)
    val expectDirs = Set("alpha/1970/0101", "alpha/1970/0102",
      "beta/1970/0101", "beta/1970/0103")
    val got = expectDirs.filter(d =>
      new java.io.File(s"$root/$d").isDirectory &&
        new java.io.File(s"$root/$d").listFiles()
          .exists(_.getName.matches("part-r-\\d{5}\\.avro")))
    assert(got == expectDirs, s"missing day dirs: ${expectDirs -- got}")
    // no stray day dirs, no uncommitted .tmp litter (local Hadoop FS
    // also writes .crc checksum sidecars — those are expected)
    val all = Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .filterNot(_.getFileName.toString.endsWith(".crc")).toList
    assert(all.forall(_.getFileName.toString.matches("part-r-\\d{5}\\.avro")),
      all.mkString(","))
    // each container holds exactly its own (cluster, day) rows
    val a2 = AvroKv.readUsageFact(spark, s"$root/alpha/1970/0102")
      .select("user").as[String].collect().sorted
    assert(a2.sameElements(Array("u3", "u4")))
    val back = AvroKv.readUsageFact(spark, s"$root/*/*/*")
    assert(back.exceptAll(fact).isEmpty && fact.exceptAll(back).isEmpty)
  }

  /** Reference-layout jobs fixture written by plain Avro: one Job with
    * one attempt whose startTime/finishTime (and derived.minutes) are
    * NULL — exactly what ParseJobsFromLogs.java:717-726 emits when
    * either raw time was zero. `schemaJson` lets the evolution test
    * inject a foreign writer's extra field. */
  private def writeReferenceJobsFixture(path: String,
      schemaJson: String = AvroKv.LogDataSchemaJson,
      extraField: Option[(String, String)] = None): Unit = {
    val logData = new Schema.Parser().parse(schemaJson)
    val pair = new Schema.Parser().parse(
      org.apache.avro.hadoop.io.AvroKeyValue.getSchema(
        new Schema.Parser().parse("\"string\""), logData).toString)
    val entryUnion = logData.getField("entry").schema()
    val jobS = entryUnion.getTypes.asScala.find(_.getName == "Job").get
    val taskS = jobS.getField("tasks").schema().getElementType
    val attS = taskS.getField("attempts").schema().getElementType
    val derivedS = attS.getField("derived").schema()
    def enumOf(s: Schema, v: String) = new GenericData.EnumSymbol(s, v)
    def nullable(s: Schema) =
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](pair))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(pair, new java.io.File(path))
    val ar = new GenericData.Record(attS)
    ar.put("jobId", "job_9"); ar.put("taskId", "task_9_m_0")
    ar.put("taskAttemptId", "attempt_9_m_0_0")
    ar.put("type", enumOf(attS.getField("type").schema(), "MAP"))
    ar.put("taskStatus",
      enumOf(nullable(attS.getField("taskStatus").schema()), "FAILED"))
    ar.put("startTime", null); ar.put("finishTime", null) // the ref's nulls
    ar.put("shuffleFinished", null); ar.put("sortFinished", null)
    ar.put("counters", new java.util.HashMap[String, java.lang.Long]())
    val dr = new GenericData.Record(derivedS)
    dr.put("excess", java.lang.Boolean.TRUE)
    dr.put("minutes", null) // null because times were null
    dr.put("cpuMinutes", null)
    ar.put("derived", dr)
    val tr = new GenericData.Record(taskS)
    tr.put("jobId", "job_9")
    tr.put("type", enumOf(attS.getField("type").schema(), "MAP"))
    tr.put("taskId", "task_9_m_0"); tr.put("taskStatus", null)
    tr.put("startTime", null); tr.put("finishTime", null)
    val atts = new java.util.ArrayList[GenericRecord](); atts.add(ar)
    tr.put("attempts", atts)
    val jr = new GenericData.Record(jobS)
    jr.put("jobId", "job_9"); jr.put("user", "carol")
    jr.put("jobName", null); jr.put("jobQueue", null)
    jr.put("jobStatus",
      enumOf(nullable(jobS.getField("jobStatus").schema()), "FAILED"))
    jr.put("submitTime", java.lang.Long.valueOf(100L))
    jr.put("launchTime", null); jr.put("finishTime", null)
    jr.put("totalMaps", null); jr.put("totalReduces", null)
    jr.put("finishedMaps", null); jr.put("finishedReduces", null)
    jr.put("failedMaps", null); jr.put("failedReduces", null)
    extraField.foreach { case (name, v) => jr.put(name, v) }
    val tasks = new java.util.ArrayList[GenericRecord](); tasks.add(tr)
    jr.put("tasks", tasks)
    val ld = new GenericData.Record(logData)
    ld.put("path", null); ld.put("cluster", "prod"); ld.put("entry", jr)
    val rec = new GenericData.Record(pair)
    rec.put("key", "job_9"); rec.put("value", ld)
    w.append(rec); w.close()
  }

  test("readJobs tolerates the reference's null attempt times (ParseJobsFromLogs zeros)") {
    val dir = tmpDir("null_times")
    writeReferenceJobsFixture(s"$dir/part-r-00000.avro")
    val back = AvroKv.readJobs(spark, dir).collect()
    assert(back.length == 1)
    val a = back.head.tasks.head.attempts.head
    // null → the pre-null sentinel the raw logs carried
    assert(a.startTime == 0L && a.finishTime == 0L && a.minutes == 0.0)
    assert(a.excess && a.status == "FAILED" && a.cpuMinutes.isEmpty)
    assert(back.head.user.contains("carol"))
  }

  test("readJobs skips an unknown trailing field from a foreign writer (schema evolution)") {
    val evolved = AvroKv.LogDataSchemaJson.replace(
      """{"name":"failedReduces","type":["int","null"]},""",
      """{"name":"failedReduces","type":["int","null"]},
        |{"name":"historyUri","type":"string"},""".stripMargin)
    assert(evolved != AvroKv.LogDataSchemaJson) // anchor still matches
    val dir = tmpDir("evolved")
    writeReferenceJobsFixture(s"$dir/part-r-00000.avro", evolved,
      extraField = Some("historyUri" -> "hdfs://nn/history/job_9.xml"))
    val back = AvroKv.readJobs(spark, dir).collect()
    assert(back.length == 1 && back.head.jobId == "job_9")
    assert(back.head.tasks.head.attempts.head.startTime == 0L)
    // and the generic reader surfaces the foreign field rather than dying
    val df = AvroKv.readKv(spark, dir)
    assert(df.select("value.entry.Job.historyUri").head.getString(0)
      == "hdfs://nn/history/job_9.xml")
  }

  test("codec negotiation: null and snappy containers round-trip; header names the codec") {
    for (codec <- Seq("null", "snappy", "deflate")) {
      val dir = tmpDir(s"codec_$codec")
      val fact = Seq(("u1", 3600000L, "c1", false, "MAP", "SUCCESS", 1, 1,
        2.5, None: Option[Double], None: Option[Double], None: Option[Long]))
        .toDF("user", "time", "cluster", "excess", "taskType", "status",
          "started", "finished", "elapsedMinutes", "cpuMinutes",
          "spilledRecords", "reduceShuffleBytes")
      AvroKv.writeUsageFact(fact, dir, codec = codec)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val r = new DataFileReader[GenericRecord](
        f, new GenericDatumReader[GenericRecord]())
      assert(Option(r.getMetaString("avro.codec")).getOrElse("null") == codec)
      r.close()
      val back = AvroKv.readUsageFact(spark, dir)
      assert(back.exceptAll(fact).isEmpty && fact.exceptAll(back).isEmpty,
        s"codec $codec")
    }
    intercept[IllegalArgumentException] {
      AvroKv.writeUsageFact(
        Seq(("u", 0L, "c", false, "MAP", "SUCCESS", 1, 1, 1.0,
          None: Option[Double], None: Option[Double], None: Option[Long]))
          .toDF("user", "time", "cluster", "excess", "taskType", "status",
            "started", "finished", "elapsedMinutes", "cpuMinutes",
            "spilledRecords", "reduceShuffleBytes"),
        tmpDir("codec_bad"), codec = "zstd-nope")
    }
  }

  test("early-terminated read (limit 1) completes: stream closed by task listener") {
    val dir = tmpDir("early_term")
    AvroKv.writeJobs(spark.createDataset(sampleJobs), dir)
    // limit abandons the iterator mid-container; without the
    // TaskContext completion listener this leaked the handle
    assert(AvroKv.readKv(spark, dir).limit(1).count() == 1L)
    assert(AvroKv.readJobs(spark, dir).limit(1).count() == 1L)
  }

  test("writers publish via temp+rename: no .tmp litter, complete containers") {
    val dir = tmpDir("commit")
    AvroKv.writeUsageFact(
      Seq(("u1", 3600000L, "c1", false, "MAP", "SUCCESS", 1, 1, 2.5,
        None: Option[Double], None: Option[Double], None: Option[Long]))
        .toDF("user", "time", "cluster", "excess", "taskType", "status",
          "started", "finished", "elapsedMinutes", "cpuMinutes",
          "spilledRecords", "reduceShuffleBytes"), dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.exists(_.matches("part-r-\\d{5}\\.avro")))
    assert(!names.exists(_.contains(".tmp")), names.mkString(","))
  }

  test("end-to-end: assembled jobs → usage fact → avro sink → identical fact") {
    implicit val s: SparkSession = spark
    val fact = graft.usage.UsageEtl.usageFact(spark.createDataset(sampleJobs))
    val dir = tmpDir("e2e_usage")
    AvroKv.writeUsageFact(fact, dir)
    val back = AvroKv.readUsageFact(spark, dir)
    assert(back.count() == fact.count() && back.count() > 0)
    assert(back.exceptAll(fact).isEmpty && fact.exceptAll(back).isEmpty)
  }
}
