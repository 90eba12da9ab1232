package graft.sources

import graft.model.{Attempt, Job, Task}
import java.util.{Map => JMap}
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.hadoop.io.AvroKeyValue
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Byte-compatible Avro object-container interop with the reference's
  * on-disk outputs (S4–S6, QUIRKS A closed): the reference writes its
  * parsed jobs and hourly usage as Avro KEY/VALUE container files via
  * `AvroKeyValueOutputFormat`
  * (`hadoop/src/java/com/linkedin/whiteelephant/parsing/ParseJobsFromLogs.java:155-172`,
  * `analysis/ComputeUsagePerHour.java:187-191`) — each file is a
  * standard Avro container whose records are the
  * `org.apache.avro.mapreduce.KeyValuePair` wrapper around
  * (key schema, value schema).
  *
  * This bridge uses the REAL Apache Avro library (on Spark's classpath)
  * with the SAME `AvroKeyValue.getSchema` wrapper the MR output format
  * uses, so files round-trip byte-faithfully:
  *
  *  - [[readKv]]: any KV container glob → DataFrame, schema derived
  *    from the file's embedded writer schema (generic Avro→Spark type
  *    mapping, incl. the LogData union-of-records);
  *  - [[writeUsageFact]] / [[readUsageFact]]: the hourly usage fact in
  *    the reference's exact `AttemptStatsKey`/`AttemptStatsValue`
  *    layout (`Stats.avsc:22-65`), deflate-coded like MR's
  *    `mapred.output.compress` deployments — a live white-elephant
  *    server can load our output; we can load an existing cluster's
  *    history;
  *  - [[writeJobs]] / [[readJobs]]: merged job trees in the
  *    (string jobId → LogData) layout of ParseJobsFromLogs.
  *
  * Distribution: reads parallelize over FILES (each task streams one
  * container; container blocks are not split — the reference's hourly
  * files are small-per-hour by construction); writes emit one
  * container per partition, `part-r-NNNNN.avro` like MR. Schemas
  * travel as JSON strings (Avro `Schema` is not serializable).
  */
object AvroKv {

  // ------------------------------------------------------------------ //
  // Schemas — ported from the reference's .avsc (the data format
  // contract, like the LineParsing regexes). Stats.avsc:22-65 and
  // LogData.avsc:17-142; unions preserve the reference's branch ORDER
  // (["double","null"] vs ["null","string"] matter for the binary
  // union index).

  val StatsKeySchemaJson: String =
    """{"type":"record","name":"AttemptStatsKey",
      |"namespace":"com.linkedin.whiteelephant.analysis","fields":[
      |{"name":"user","type":"string"},
      |{"name":"time","type":"long"},
      |{"name":"unit","type":{"type":"enum","name":"TimeUnit",
      |  "namespace":"com.linkedin.whiteelephant.analysis","symbols":["HOURS"]}},
      |{"name":"cluster","type":"string"},
      |{"name":"excess","type":"boolean"},
      |{"name":"type","type":{"type":"enum","name":"TaskType",
      |  "namespace":"com.linkedin.whiteelephant.analysis","symbols":["MAP","REDUCE"]}},
      |{"name":"status","type":{"type":"enum","name":"TaskStatus",
      |  "namespace":"com.linkedin.whiteelephant.analysis","symbols":["SUCCESS","FAILED","KILLED"]}}
      |]}""".stripMargin

  val StatsValueSchemaJson: String =
    """{"type":"record","name":"AttemptStatsValue",
      |"namespace":"com.linkedin.whiteelephant.analysis","fields":[
      |{"name":"started","type":"int"},
      |{"name":"finished","type":"int"},
      |{"name":"elapsedMinutes","type":"double"},
      |{"name":"cpuMinutes","type":["double","null"]},
      |{"name":"spilledRecords","type":["long","null"]},
      |{"name":"reduceShuffleBytes","type":["long","null"]}
      |]}""".stripMargin

  val LogDataSchemaJson: String =
    """{"type":"record","name":"LogData",
      |"namespace":"com.linkedin.whiteelephant.parsing","fields":[
      |{"name":"path","type":["null","string"]},
      |{"name":"cluster","type":["null","string"]},
      |{"name":"entry","type":[
      | {"type":"record","name":"Attempt","namespace":"com.linkedin.whiteelephant.parsing","fields":[
      |  {"name":"jobId","type":"string"},
      |  {"name":"type","type":{"type":"enum","name":"TaskType",
      |    "namespace":"com.linkedin.whiteelephant.parsing","symbols":["MAP","REDUCE"]}},
      |  {"name":"taskId","type":"string"},
      |  {"name":"taskAttemptId","type":"string"},
      |  {"name":"taskStatus","type":["null",{"type":"enum","name":"TaskStatus",
      |    "namespace":"com.linkedin.whiteelephant.parsing","symbols":["SUCCESS","FAILED","KILLED"]}]},
      |  {"name":"startTime","type":["long","null"]},
      |  {"name":"finishTime","type":["long","null"]},
      |  {"name":"shuffleFinished","type":["long","null"]},
      |  {"name":"sortFinished","type":["long","null"]},
      |  {"name":"counters","type":{"type":"map","values":"long"}},
      |  {"name":"derived","type":{"type":"record","name":"DerivedAttemptData",
      |    "namespace":"com.linkedin.whiteelephant.parsing","fields":[
      |    {"name":"excess","type":["boolean","null"]},
      |    {"name":"minutes","type":["double","null"]},
      |    {"name":"cpuMinutes","type":["double","null"]}]}}
      | ]},
      | {"type":"record","name":"Task","namespace":"com.linkedin.whiteelephant.parsing","fields":[
      |  {"name":"jobId","type":"string"},
      |  {"name":"type","type":"com.linkedin.whiteelephant.parsing.TaskType"},
      |  {"name":"taskId","type":"string"},
      |  {"name":"taskStatus","type":["null","com.linkedin.whiteelephant.parsing.TaskStatus"]},
      |  {"name":"startTime","type":["long","null"]},
      |  {"name":"finishTime","type":["long","null"]},
      |  {"name":"attempts","type":{"type":"array","items":"com.linkedin.whiteelephant.parsing.Attempt"}}
      | ]},
      | {"type":"record","name":"Job","namespace":"com.linkedin.whiteelephant.parsing","fields":[
      |  {"name":"jobId","type":"string"},
      |  {"name":"user","type":["string","null"]},
      |  {"name":"jobName","type":["string","null"]},
      |  {"name":"jobQueue","type":["string","null"]},
      |  {"name":"jobStatus","type":["null",{"type":"enum","name":"JobStatus",
      |    "namespace":"com.linkedin.whiteelephant.parsing","symbols":["SUCCESS","FAILED","KILLED"]}]},
      |  {"name":"submitTime","type":["long","null"]},
      |  {"name":"launchTime","type":["long","null"]},
      |  {"name":"finishTime","type":["long","null"]},
      |  {"name":"totalMaps","type":["int","null"]},
      |  {"name":"totalReduces","type":["int","null"]},
      |  {"name":"finishedMaps","type":["int","null"]},
      |  {"name":"finishedReduces","type":["int","null"]},
      |  {"name":"failedMaps","type":["int","null"]},
      |  {"name":"failedReduces","type":["int","null"]},
      |  {"name":"tasks","type":{"type":"array","items":"com.linkedin.whiteelephant.parsing.Task"}}
      | ]}
      |]}]}""".stripMargin

  private def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** Container codec negotiation. Reads are codec-transparent (the
    * container header names its codec and avro resolves it — deflate
    * and snappy-java are both on Spark's classpath); writes accept the
    * three codecs reference-era MR deployments produced. */
  private def codecFor(codec: String): Option[CodecFactory] = codec match {
    case "deflate"       => Some(CodecFactory.deflateCodec(6))
    case "snappy"        => Some(CodecFactory.snappyCodec())
    case "null" | "none" => None
    case other =>
      throw new IllegalArgumentException(s"unsupported avro codec: $other")
  }

  /** Iterator over a container stream that closes it BOTH when drained
    * and at task completion — `limit`/`take`/downstream exceptions
    * abandon iterators mid-stream, which would otherwise leak the file
    * handle for the executor's lifetime. */
  private def closing[T](stream: DataFileStream[GenericRecord],
      in: java.io.Closeable)(iter: Iterator[T]): Iterator[T] = {
    var closed = false
    def close(): Unit = if (!closed) {
      closed = true
      try stream.close() finally in.close()
    }
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
    new Iterator[T] {
      def hasNext: Boolean = { val h = iter.hasNext; if (!h) close(); h }
      def next(): T = iter.next()
    }
  }

  /** Open a part file for writing via temp + rename: each attempt
    * writes its own temp (attempt id in the name) and publishes with a
    * rename, so a speculative/retried task never interleaves bytes
    * into the same container and a failed attempt leaves no torn
    * part-r file — only a temp, deleted here on failure. */
  private def writeCommitted(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, pid: Int)(
      body: java.io.OutputStream => Unit): Unit = {
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(0L)
    val finalPath = new Path(dir, f"part-r-$pid%05d.avro")
    val tmpPath = new Path(dir, f".part-r-$pid%05d-$attempt.avro.tmp")
    try {
      val out = fs.create(tmpPath, true)
      body(out) // body closes `out` via DataFileWriter.close
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmpPath, finalPath))
        throw new java.io.IOException(s"commit rename failed: $tmpPath -> $finalPath")
    } catch {
      case e: Throwable =>
        try fs.delete(tmpPath, false) catch { case _: Throwable => () }
        throw e
    }
  }

  /** The exact KeyValuePair wrapper `AvroKeyValueOutputFormat` embeds. */
  def pairSchema(keyJson: String, valueJson: String): Schema =
    AvroKeyValue.getSchema(parse(keyJson), parse(valueJson))

  def usagePairSchemaJson: String =
    pairSchema(StatsKeySchemaJson, StatsValueSchemaJson).toString
  def logsPairSchemaJson: String =
    pairSchema("\"string\"", LogDataSchemaJson).toString

  // ------------------------------------------------------------------ //
  // Generic Avro → Spark mapping (the subset the reference uses, plus
  // bytes/fixed for completeness).

  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.NULL => NullType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, sparkType(f.schema))))
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (branches.size == 1) sparkType(branches.head)
      else
        // union of records (LogData.entry): one nullable struct column
        // per branch + a discriminator — SURVEY §1.2's stated mapping
        StructType(
          StructField("entryType", StringType) +:
            branches.toSeq.map(b => StructField(b.getName, sparkType(b))))
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  private def convert(v: Any, s: Schema): Any = s.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM =>
      if (v == null) null else v.toString
    case Schema.Type.BYTES =>
      if (v == null) null
      else {
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      }
    case Schema.Type.FIXED =>
      if (v == null) null
      else v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
    case Schema.Type.ARRAY =>
      if (v == null) null
      else v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
        .map(convert(_, s.getElementType))
    case Schema.Type.MAP =>
      if (v == null) null
      else v.asInstanceOf[JMap[Any, Any]].asScala.map { case (k, x) =>
        k.toString -> convert(x, s.getValueType)
      }.toMap
    case Schema.Type.RECORD =>
      if (v == null) null
      else {
        val r = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          convert(r.get(f.pos()), f.schema())))
      }
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (branches.size == 1) {
        if (v == null) null else convert(v, branches.head)
      } else {
        if (v == null) null
        else {
          val name = v match {
            case r: GenericRecord => r.getSchema.getName
            case _ => throw new IllegalArgumentException(
              s"non-record multi-branch union value: $v")
          }
          Row.fromSeq(name +: branches.toSeq.map(b =>
            if (b.getName == name) convert(v, b) else null))
        }
      }
    case _ => v // primitives pass through
  }

  /** Read Avro KV container files (a path, dir, or glob) into a
    * DataFrame shaped (key, value) per the embedded writer schema. */
  def readKv(spark: SparkSession, pattern: String): DataFrame = {
    val paths = listAvro(spark, pattern)
    require(paths.nonEmpty, s"no avro files match $pattern")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // writer schema from the first container's header
    val schemaJson = {
      val fs = new Path(paths.head).getFileSystem(conf.value)
      val in = fs.open(new Path(paths.head))
      try {
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        val s = stream.getSchema.toString
        stream.close(); s
      } finally in.close()
    }
    val sparkSchema = sparkType(parse(schemaJson)).asInstanceOf[StructType]
    val rdd = spark.sparkContext
      .parallelize(paths, math.min(paths.size,
        spark.sparkContext.defaultParallelism))
      .flatMap { p =>
        val schema = new Schema.Parser().parse(schemaJson)
        val fs = new Path(p).getFileSystem(conf.value)
        val in = fs.open(new Path(p))
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord](schema))
        closing(stream, in)(stream.iterator.asScala.map(rec =>
          convert(rec, schema).asInstanceOf[Row]))
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  private def listAvro(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(_.isFile)
          .map(_.getPath.toString).filter(_.endsWith(".avro"))
      else Seq(st.getPath.toString)
    }.sorted
  }

  // ------------------------------------------------------------------ //
  // Usage fact: byte-compatible sink + source.

  /** Write the hourly usage fact (the [[graft.usage.UsageEtl.aggregate]]
    * shape) as reference-layout AttemptStatsKey/Value KV containers —
    * one `part-r-NNNNN.avro` per partition, deflate like the MR jobs'
    * compressed deployments (`CodecFactory.deflateCodec`). */
  def writeUsageFact(fact: DataFrame, dir: String,
      codec: String = "deflate"): Unit = {
    codecFor(codec) // validate driver-side, before any job launches
    val spark = fact.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pairJson = usagePairSchemaJson
    val keyJson = StatsKeySchemaJson
    val valueJson = StatsValueSchemaJson
    val cols = Seq("user", "time", "cluster", "excess", "taskType", "status",
      "started", "finished", "elapsedMinutes", "cpuMinutes",
      "spilledRecords", "reduceShuffleBytes")
    val prepared = fact.selectExpr(cols: _*)
    val fs0 = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.mkdirs(new Path(dir))
    prepared.rdd.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val pair = new Schema.Parser().parse(pairJson)
        val key = new Schema.Parser().parse(keyJson)
        val value = new Schema.Parser().parse(valueJson)
        val fs = new Path(dir).getFileSystem(conf.value)
        writeCommitted(fs, dir, pid) { out =>
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](pair))
          codecFor(codec).foreach(w.setCodec)
          w.create(pair, out)
          it.foreach(r => w.append(usageRecord(pair, key, value, r, 0)))
          w.close()
        }
      }
    }
  }

  /** Encode one usage-fact row (the 12 [[writeUsageFact]] columns
    * starting at `off`) as the reference's AttemptStatsKey/Value pair
    * record. */
  private def usageRecord(pair: Schema, key: Schema, value: Schema,
      r: Row, off: Int): GenericRecord = {
    val k = new GenericData.Record(key)
    k.put("user", r.getString(off))
    k.put("time", r.getLong(off + 1))
    k.put("unit", new GenericData.EnumSymbol(
      key.getField("unit").schema(), "HOURS"))
    k.put("cluster", r.getString(off + 2))
    k.put("excess", r.getBoolean(off + 3))
    k.put("type", new GenericData.EnumSymbol(
      key.getField("type").schema(), r.getString(off + 4)))
    k.put("status", new GenericData.EnumSymbol(
      key.getField("status").schema(), r.getString(off + 5)))
    val v = new GenericData.Record(value)
    v.put("started", r.getInt(off + 6))
    v.put("finished", r.getInt(off + 7))
    v.put("elapsedMinutes", r.getDouble(off + 8))
    v.put("cpuMinutes", if (r.isNullAt(off + 9)) null
      else java.lang.Double.valueOf(r.getDouble(off + 9)))
    // our fact carries spilledRecords as double (SUM over longs);
    // the reference field is long — exact for counter sums
    v.put("spilledRecords", if (r.isNullAt(off + 10)) null
      else java.lang.Long.valueOf(r.getDouble(off + 10).toLong))
    v.put("reduceShuffleBytes", if (r.isNullAt(off + 11)) null
      else java.lang.Long.valueOf(r.getLong(off + 11)))
    val rec = new GenericData.Record(pair)
    rec.put("key", k)
    rec.put("value", v)
    rec
  }

  /** Per-day reference-layout export in ONE Spark job: the fact (which
    * must carry a DateType `date` column) is hash-repartitioned on
    * (cluster, date) — every (cluster, day) lands WHOLLY in one task —
    * and sorted within partitions, so each task stream-groups its rows
    * and commits one `part-r-NNNNN.avro` container per (cluster, day)
    * group into `<avroRoot>/<cluster>/<yyyy>/<MMdd>/` (the
    * `ComputeUsagePerHour.java:120-174` layout).
    *
    * Why not a driver loop of [[writeUsageFact]] per day: that is one
    * Spark job PER (cluster, day), each re-scanning the whole fact for
    * its filter — O(days × fact) work and O(days) job fixed costs. The
    * 100-day ETL rehearsal measured it as ~60 s of its 80 s wall
    * (STRESS.md round 10); this form is one shuffle of the fact. Same
    * speculation-safe tmp+rename commit per container. */
  def writeUsageFactByDay(fact: DataFrame, avroRoot: String,
      codec: String = "deflate"): Unit = {
    import org.apache.spark.sql.functions.col
    codecFor(codec) // validate driver-side, before any job launches
    val spark = fact.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pairJson = usagePairSchemaJson
    val keyJson = StatsKeySchemaJson
    val valueJson = StatsValueSchemaJson
    val cols = Seq("date", "user", "time", "cluster", "excess", "taskType",
      "status", "started", "finished", "elapsedMinutes", "cpuMinutes",
      "spilledRecords", "reduceShuffleBytes")
    val prepared = fact.selectExpr(cols: _*)
      .repartition(col("cluster"), col("date"))
      .sortWithinPartitions("cluster", "date")
    val root = avroRoot
    prepared.rdd.foreachPartition { (it0: Iterator[Row]) =>
      if (it0.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val pair = new Schema.Parser().parse(pairJson)
        val key = new Schema.Parser().parse(keyJson)
        val value = new Schema.Parser().parse(valueJson)
        val fs = new Path(root).getFileSystem(conf.value)
        val it = it0.buffered
        while (it.hasNext) {
          val cluster = it.head.getString(3)
          val date = it.head.getDate(0)
          val d = date.toLocalDate
          val dir = f"$root/$cluster/${d.getYear}%04d/${d.getMonthValue}%02d${d.getDayOfMonth}%02d"
          fs.mkdirs(new Path(dir))
          writeCommitted(fs, dir, pid) { out =>
            val w = new DataFileWriter[GenericRecord](
              new GenericDatumWriter[GenericRecord](pair))
            codecFor(codec).foreach(w.setCodec)
            w.create(pair, out)
            while (it.hasNext && it.head.getString(3) == cluster &&
                it.head.getDate(0) == date)
              w.append(usageRecord(pair, key, value, it.next(), 1))
            w.close()
          }
        }
      }
    }
  }

  /** Read reference-layout usage KV containers back into the flat fact
    * shape ([[graft.usage.UsageEtl.aggregate]] columns). */
  def readUsageFact(spark: SparkSession, pattern: String): DataFrame = {
    import org.apache.spark.sql.functions._
    readKv(spark, pattern).select(
      col("key.user").as("user"),
      col("key.time").as("time"),
      col("key.cluster").as("cluster"),
      col("key.excess").as("excess"),
      col("key.type").as("taskType"),
      col("key.status").as("status"),
      col("value.started").as("started"),
      col("value.finished").as("finished"),
      col("value.elapsedMinutes").as("elapsedMinutes"),
      col("value.cpuMinutes").as("cpuMinutes"),
      col("value.spilledRecords").cast("double").as("spilledRecords"),
      col("value.reduceShuffleBytes").as("reduceShuffleBytes"))
  }

  // ------------------------------------------------------------------ //
  // Parsed jobs: (string jobId → LogData{entry=Job}) like the
  // ParseJobsFromLogs reducer output.

  def writeJobs(jobs: Dataset[Job], dir: String,
      codec: String = "deflate"): Unit = {
    codecFor(codec) // validate driver-side, before any job launches
    val spark = jobs.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val pairJson = logsPairSchemaJson
    val logJson = LogDataSchemaJson
    val fs0 = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.mkdirs(new Path(dir))
    jobs.rdd.foreachPartition { (it: Iterator[Job]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val pair = new Schema.Parser().parse(pairJson)
        val logData = new Schema.Parser().parse(logJson)
        val entryUnion = logData.getField("entry").schema()
        val jobS = entryUnion.getTypes.asScala.find(_.getName == "Job").get
        val taskS = jobS.getField("tasks").schema().getElementType
        val attS = taskS.getField("attempts").schema().getElementType
        val derivedS = attS.getField("derived").schema()
        def enum(s: Schema, v: String) = new GenericData.EnumSymbol(s, v)
        def nullable(s: Schema): Schema = // enum/record inside [null, X]
          s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        val taskTypeS = attS.getField("type").schema()
        val taskStatusS = nullable(attS.getField("taskStatus").schema())
        val jobStatusS = nullable(jobS.getField("jobStatus").schema())
        val fs = new Path(dir).getFileSystem(conf.value)
        writeCommitted(fs, dir, pid) { out =>
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](pair))
        codecFor(codec).foreach(w.setCodec)
        w.create(pair, out)
        def attemptRec(jobId: String, taskId: String, a: Attempt): GenericRecord = {
          val r = new GenericData.Record(attS)
          r.put("jobId", jobId)
          r.put("type", enum(taskTypeS, a.taskType))
          r.put("taskId", taskId)
          r.put("taskAttemptId", a.taskAttemptId)
          r.put("taskStatus", enum(taskStatusS, a.status))
          r.put("startTime", java.lang.Long.valueOf(a.startTime))
          r.put("finishTime", java.lang.Long.valueOf(a.finishTime))
          r.put("shuffleFinished",
            a.shuffleFinished.map(java.lang.Long.valueOf).orNull)
          r.put("sortFinished",
            a.sortFinished.map(java.lang.Long.valueOf).orNull)
          val cm = new java.util.HashMap[String, java.lang.Long]()
          a.counters.foreach { case (ck, cv) => cm.put(ck, cv) }
          r.put("counters", cm)
          val dr = new GenericData.Record(derivedS)
          dr.put("excess", java.lang.Boolean.valueOf(a.excess))
          dr.put("minutes", java.lang.Double.valueOf(a.minutes))
          dr.put("cpuMinutes",
            a.cpuMinutes.map(java.lang.Double.valueOf).orNull)
          r.put("derived", dr)
          r
        }
        it.foreach { job =>
          val jr = new GenericData.Record(jobS)
          jr.put("jobId", job.jobId)
          jr.put("user", job.user.orNull)
          jr.put("jobName", job.jobName.orNull)
          jr.put("jobQueue", job.jobQueue.orNull)
          jr.put("jobStatus", job.status.map(enum(jobStatusS, _)).orNull)
          jr.put("submitTime", job.submitTime.map(java.lang.Long.valueOf).orNull)
          jr.put("launchTime", job.launchTime.map(java.lang.Long.valueOf).orNull)
          jr.put("finishTime", job.finishTime.map(java.lang.Long.valueOf).orNull)
          jr.put("totalMaps", job.totalMaps.map(Integer.valueOf).orNull)
          jr.put("totalReduces", job.totalReduces.map(Integer.valueOf).orNull)
          jr.put("finishedMaps", job.finishedMaps.map(Integer.valueOf).orNull)
          jr.put("finishedReduces",
            job.finishedReduces.map(Integer.valueOf).orNull)
          jr.put("failedMaps", job.failedMaps.map(Integer.valueOf).orNull)
          jr.put("failedReduces", job.failedReduces.map(Integer.valueOf).orNull)
          val tasks = new java.util.ArrayList[GenericRecord](job.tasks.size)
          job.tasks.foreach { t =>
            val tr = new GenericData.Record(taskS)
            tr.put("jobId", job.jobId)
            tr.put("type", enum(taskTypeS, t.taskType))
            tr.put("taskId", t.taskId)
            tr.put("taskStatus", t.status.map(enum(taskStatusS, _)).orNull)
            tr.put("startTime", t.startTime.map(java.lang.Long.valueOf).orNull)
            tr.put("finishTime", t.finishTime.map(java.lang.Long.valueOf).orNull)
            val atts = new java.util.ArrayList[GenericRecord](t.attempts.size)
            t.attempts.foreach(a => atts.add(attemptRec(job.jobId, t.taskId, a)))
            tr.put("attempts", atts)
            tasks.add(tr)
          }
          jr.put("tasks", tasks)
          val ld = new GenericData.Record(logData)
          ld.put("path", null)
          ld.put("cluster", job.cluster)
          ld.put("entry", jr)
          val rec = new GenericData.Record(pair)
          rec.put("key", job.jobId)
          rec.put("value", ld)
          w.append(rec)
        }
        w.close()
        }
      }
    }
  }

  /** Read (jobId → LogData) containers back into merged [[Job]] trees.
    * Entries whose union branch is not Job (mapper-intermediate Attempt
    * and Task fragments never land in final reducer output) are
    * skipped. */
  def readJobs(spark: SparkSession, pattern: String): Dataset[Job] = {
    val paths = listAvro(spark, pattern)
    require(paths.nonEmpty, s"no avro files match $pattern")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val rdd = spark.sparkContext
      .parallelize(paths, math.min(paths.size,
        spark.sparkContext.defaultParallelism))
      .flatMap { p =>
        val fs = new Path(p).getFileSystem(conf.value)
        val in = fs.open(new Path(p))
        val stream = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        def str(v: Any): String = if (v == null) null else v.toString
        def optStr(v: Any): Option[String] = Option(v).map(_.toString)
        def optLong(v: Any): Option[Long] =
          Option(v).map(_.asInstanceOf[java.lang.Long].longValue())
        def optInt(v: Any): Option[Int] =
          Option(v).map(_.asInstanceOf[java.lang.Integer].intValue())
        def optDouble(v: Any): Option[Double] =
          Option(v).map(_.asInstanceOf[java.lang.Double].doubleValue())
        val iter = stream.iterator.asScala.flatMap { rec =>
          val ld = rec.get("value").asInstanceOf[GenericRecord]
          val entry = ld.get("entry").asInstanceOf[GenericRecord]
          if (entry.getSchema.getName != "Job") None
          else {
            val tasks = entry.get("tasks")
              .asInstanceOf[java.util.Collection[GenericRecord]]
              .asScala.toSeq.map { tr =>
                val attempts = tr.get("attempts")
                  .asInstanceOf[java.util.Collection[GenericRecord]]
                  .asScala.toSeq.map { ar =>
                    val derived = ar.get("derived").asInstanceOf[GenericRecord]
                    // Reference files legitimately carry null attempt
                    // times: ParseJobsFromLogs.java:717-726 nulls
                    // startTime/finishTime (leaving derived.minutes
                    // null) whenever either was zero. Decode null back
                    // to the pre-null sentinel 0 / 0.0 minutes — our
                    // model's "unset" representation.
                    Attempt(
                      taskAttemptId = str(ar.get("taskAttemptId")),
                      taskType = str(ar.get("type")),
                      status = str(ar.get("taskStatus")),
                      startTime = optLong(ar.get("startTime")).getOrElse(0L),
                      finishTime = optLong(ar.get("finishTime")).getOrElse(0L),
                      shuffleFinished = optLong(ar.get("shuffleFinished")),
                      sortFinished = optLong(ar.get("sortFinished")),
                      counters = ar.get("counters")
                        .asInstanceOf[JMap[Any, Any]].asScala.map {
                          case (k, v) =>
                            k.toString -> v.asInstanceOf[java.lang.Long]
                              .longValue()
                        }.toMap,
                      excess = Option(derived.get("excess"))
                        .exists(_.asInstanceOf[java.lang.Boolean].booleanValue()),
                      minutes = optDouble(derived.get("minutes")).getOrElse(0.0),
                      cpuMinutes = optDouble(derived.get("cpuMinutes")))
                  }
                Task(
                  taskId = str(tr.get("taskId")),
                  taskType = str(tr.get("type")),
                  status = optStr(tr.get("taskStatus")),
                  startTime = optLong(tr.get("startTime")),
                  finishTime = optLong(tr.get("finishTime")),
                  attempts = attempts)
              }
            Some(Job(
              jobId = str(entry.get("jobId")),
              cluster = str(ld.get("cluster")),
              user = optStr(entry.get("user")),
              jobName = optStr(entry.get("jobName")),
              jobQueue = optStr(entry.get("jobQueue")),
              status = optStr(entry.get("jobStatus")),
              submitTime = optLong(entry.get("submitTime")),
              launchTime = optLong(entry.get("launchTime")),
              finishTime = optLong(entry.get("finishTime")),
              totalMaps = optInt(entry.get("totalMaps")),
              totalReduces = optInt(entry.get("totalReduces")),
              finishedMaps = optInt(entry.get("finishedMaps")),
              finishedReduces = optInt(entry.get("finishedReduces")),
              failedMaps = optInt(entry.get("failedMaps")),
              failedReduces = optInt(entry.get("failedReduces")),
              tasks = tasks))
          }
        }
        closing(stream, in)(iter)
      }
    spark.createDataset(rdd)
  }
}
