package graft

import graft.serve.{QueryType, TimeBuckets, UsageApi, UsageRequest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-latency gate — the measured counterpart of the reference's
  * interactive-dashboard contract (`server/app.rb`: a Sinatra process
  * answering `/api/usage` + `/api/table` out of an in-memory HSQLDB
  * fact, `usage_database.rb:23-26`): request latency percentiles over
  * a randomized ServeFuzz-style request mix against a 10⁷-row CACHED
  * fact, cold (memo miss — real Spark jobs over the cached DataFrame)
  * and memoized (the TrieMap hit path, T7).
  *
  * Per request, the cold path costs exactly: one metadata agg
  * (timeBounds) + one per-user series job (+ one collapsed-set job
  * when usersToAggregate is non-empty) — all over the cached fact,
  * zero scans of the source. The fact is StressBench-synthesized
  * (spark.range, no disk), 1 000 users × 2 clusters × ~5 000 hour
  * ticks at the default 10⁷ rows — the reference's comfort zone is
  * 10⁶–10⁷ fact rows (BASELINE.md).
  *
  * Usage: `sbt "runMain graft.ServeLatency [nRows] [nReq] [seed] [mode]"`
  * — prints one JSON line per phase plus a per-form breakdown of the
  * slowest cold shapes; numbers land in STRESS.md. Not part of the
  * driver gate. `mode`:
  *  - `api` (default): measure [[UsageApi]] in-process, session built
  *    here (codegen on unless `SPARK_GRAFT_SERVE_CODEGEN=0`) — the
  *    harness the round-10 campaign used.
  *  - `http`: the REAL serving stack — [[graft.serve.UsageServer
  *    .servingSession]] (the measured serving profile as the server
  *    main wires it: wholeStage off, shuffle = cores) + the actual
  *    [[graft.serve.UsageServer]] HTTP socket, every request a POST
  *    over localhost with JSON (de)serialization included in the
  *    latency. Closes VERDICT r10 item 4's measurement bar: same P95
  *    through the server main's stack, not just the API object.
  */
object ServeLatency {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toLong else 10000000L
    val nReq = if (args.length > 1) args(1).toInt else 60
    val seed = if (args.length > 2) args(2).toLong else 10L
    val mode = if (args.length > 3) args(3) else "api"
    require(mode == "api" || mode == "http", s"mode api|http, got $mode")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    implicit val spark: SparkSession =
      if (mode == "http") graft.serve.UsageServer.servingSession("serve-latency-http")
      else SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // SPARK_GRAFT_SERVE_CODEGEN=0: serving-mode experiment — every
        // request embeds fresh literals, so whole-stage codegen compiles
        // a new class per request; interpreted execution trades that
        // fixed compile latency for slower per-row work, which can win
        // at interactive row counts (see STRESS.md round 10)
        .config("spark.sql.codegen.wholeStage",
          (!sys.env.get("SPARK_GRAFT_SERVE_CODEGEN").contains("0")).toString)
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- the 10⁷-row fact: 1000 users × 2 clusters per hour tick --- //
    val usersPerTick = 2000L
    val nTicks = math.max(1L, nRows / usersPerTick)
    val baseMs = 1704067200000L // 2024-01-01T00:00:00Z
    val hi = baseMs + nTicks * 3600000L
    val fact = spark.range(nRows).select(
      concat(lit("u"), pmod(col("id"), lit(1000))).as("user"),
      (lit(baseMs) + (col("id") / usersPerTick).cast("long") * 3600000L).as("time"),
      when(pmod(col("id"), lit(2)) === 0, "east").otherwise("west").as("cluster"),
      (pmod(col("id"), lit(5)) === 0).as("excess"),
      when(pmod(col("id"), lit(3)) === 0, "REDUCE").otherwise("MAP").as("taskType"),
      when(pmod(col("id"), lit(7)) === 0, "FAILED")
        .when(pmod(col("id"), lit(11)) === 0, "KILLED")
        .otherwise("SUCCESS").as("status"),
      (pmod(col("id") * 31, lit(5)) + 1).cast("int").as("started"),
      pmod(col("id") * 17, lit(5)).cast("int").as("finished"),
      (pmod(col("id") * 13, lit(90)) + lit(1)).cast("double").as("elapsedMinutes"),
      pmod(col("id") * 7, lit(60)).cast("double").as("cpuMinutes"),
      pmod(col("id") * 23, lit(1000000L)).as("reduceShuffleBytes"))
    val api = new UsageApi(fact)
    val t0c = System.nanoTime()
    val factRows = fact.count() // materialize the cache (HSQLDB preload analog)
    println(f"""{"stage":"fact_cache","rows":$factRows,"sec":${(System.nanoTime() - t0c) / 1e9}%.2f}""")

    // ---- ServeFuzz-style request mix ------------------------------- //
    val rng = new scala.util.Random(seed)
    val qtNames = QueryType.All.keys.toSeq.sorted
    val zones = Seq("UTC", "America/New_York", "Asia/Kathmandu")
    def mkReq(): UsageRequest = {
      val users = (0 until 2 + rng.nextInt(4))
        .map(_ => s"u${rng.nextInt(1000)}").distinct
      val aggSet =
        if (rng.nextBoolean())
          (0 until 5 + rng.nextInt(10)).map(_ => s"u${rng.nextInt(1000)}").distinct
        else Nil
      // random sub-window (half the requests span the full range)
      val (s, e) =
        if (rng.nextBoolean()) (baseMs, hi)
        else {
          val a = baseMs + (rng.nextDouble() * (hi - baseMs) * 0.6).toLong
          (a, a + ((hi - a) * (0.2 + rng.nextDouble() * 0.8)).toLong)
        }
      UsageRequest(
        cluster = if (rng.nextBoolean()) "east" else "west",
        users = users, usersToAggregate = aggSet,
        queryType = qtNames(rng.nextInt(qtNames.size)),
        unit = TimeBuckets.Units(rng.nextInt(TimeBuckets.Units.size)),
        zone = zones(rng.nextInt(zones.size)),
        startMs = s, endMs = e)
    }
    val reqs = Vector.fill(nReq)(mkReq())
    // ~25% exercise the CSV route (/api/table) on top of /api/usage —
    // exportCsv calls usage() internally, so its cold latency is the
    // usage cost + the driver-side pivot/format
    val csvMask = reqs.map(_ => rng.nextInt(4) == 0)

    // http mode: the real server socket; requests go over localhost
    // with JSON round-trips included in the measured latency
    var stopServer: () => Unit = () => ()
    val (execUsage, execCsv): (UsageRequest => Unit, UsageRequest => Unit) =
      if (mode == "api")
        (r => {
          val resp = api.usage(r)
          require(resp.users.size == r.users.size, s"missing series for $r")
        },
         r => require(api.exportCsv(r).nonEmpty, s"empty csv for $r"))
      else {
        val server = new graft.serve.UsageServer(api)
        val port = server.start()
        stopServer = () => server.stop() // HttpServer threads are non-daemon
        println(s"""{"stage":"server_bound","port":$port}""")
        implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
        val client = java.net.http.HttpClient.newHttpClient()
        def post(route: String, r: UsageRequest): String = {
          val req = java.net.http.HttpRequest.newBuilder()
            .uri(java.net.URI.create(s"http://127.0.0.1:$port$route"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              org.json4s.jackson.Serialization.write(r)))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200,
            s"$route -> ${resp.statusCode()}: ${resp.body().take(200)}")
          resp.body()
        }
        (r => require(post("/api/usage", r).contains("\"users\""), s"bad usage resp for $r"),
         r => require(post("/api/table", r).nonEmpty, s"empty csv for $r"))
      }

    // Everything from warm-up on runs under try/finally: a failed
    // require mid-benchmark must still stop the non-daemon HttpServer
    // threads (http mode) and the session, or the JVM hangs after the
    // exception instead of exiting with it.
    try {
    // JIT/codegen warm-up on requests OUTSIDE the measured mix
    (0 until 3).foreach(_ => execUsage(mkReq()))

    def runPhase(): Seq[(UsageRequest, Double)] =
      reqs.zip(csvMask).map { case (r, csv) =>
        val t0 = System.nanoTime()
        if (csv) execCsv(r) else execUsage(r)
        (r, (System.nanoTime() - t0) / 1e6)
      }

    val cold = runPhase()   // every request is a memo miss
    val memo = runPhase()   // identical requests: TrieMap hits

    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.size - 1, (p * s.size).toInt))
    }

    // http mode: decompose the memoized latency — in-process rendered-
    // bytes memo hit (the server-side cost alone) vs the full socket
    // round trip, plus the response SIZE that the transport moves.
    // The byte memo (r12) removed per-hit serialization; whatever
    // remains on the wire path is transfer + client decode. Runs AFTER
    // both measured phases: the in-process api calls touch the byte
    // memos, which must not perturb the measured mix.
    if (mode == "http") {
      val sizes = reqs.zip(csvMask).map { case (r, csv) =>
        if (csv) api.tableCsv(r).length else api.usageJson(r).length }
      val inproc = reqs.zip(csvMask).map { case (r, csv) =>
        val t0 = System.nanoTime()
        if (csv) api.tableCsv(r) else api.usageJson(r)
        (System.nanoTime() - t0) / 1e6 }
      println(f"""{"stage":"serve_memo_inproc","p50_ms":${pct(inproc, 0.5)}%.2f,"p95_ms":${pct(inproc, 0.95)}%.2f,"median_resp_kb":${sizes.sorted.apply(sizes.size / 2) / 1024},"max_resp_kb":${sizes.max / 1024}}""")
    }

    def emit(phase: String, lat: Seq[Double]): Unit =
      println(f"""{"stage":"serve_$phase","requests":${lat.size},"p50_ms":${pct(lat, 0.50)}%.1f,"p95_ms":${pct(lat, 0.95)}%.1f,"max_ms":${lat.max}%.1f}""")
    emit("cold", cold.map(_._2))
    emit("memo", memo.map(_._2))

    // slowest cold forms (queryType × unit) — the VERDICT gate: any
    // form above ~1 s cold needs a plan fix or a documented reason
    println("slowest cold forms:")
    cold.groupBy { case (r, _) => (r.queryType, r.unit) }
      .view.mapValues(v => v.map(_._2).max).toSeq
      .sortBy(-_._2).take(8)
      .foreach { case ((qt, u), ms) => println(f"  $qt%-22s $u%-9s ${ms}%8.1f ms") }

    val over1s = cold.filter(_._2 > 1000.0)
    println(s"cold requests over 1s: ${over1s.size} of ${cold.size}")
    require(memo.map(_._2).max < 50.0,
      s"memoized path should be sub-50ms, saw ${memo.map(_._2).max}")
    } finally {
      stopServer()
      spark.stop()
    }
  }
}
