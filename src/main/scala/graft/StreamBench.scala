package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Stateful

/** Streaming throughput + state-bound bench — the streaming analog of
  * graft.Bench, and the benchmark-parity answer to the reference's only
  * published bench (stream_test.go:29-41, an in-memory source→sink
  * throughput loop). One representative twin per state family is driven
  * through a MemoryStream at `SPARK_GRAFT_SF_DIR` volume with the
  * shuffled-within-horizon feed (the OrderedReplaySpec contract), and
  * the run records:
  *
  *  - ingest throughput (rows/s over the feed wall-clock),
  *  - per-micro-batch latency (p50/max of durationMs.triggerExecution),
  *  - measured state bounds (peak/final stateOperators.numRowsTotal,
  *    peak memoryUsedBytes) against each family's DOCUMENTED bound,
  *    computed from the batch side (stats-at-ingest, never hard-coded),
  *  - a THROUGHPUT CURVE per state family: the same feed replayed at
  *    production batch sizes (4 chunks of 25k rows, 1 chunk of 100k at
  *    sf0.1) so "per-epoch overhead amortizes with batch size" is a
  *    measured rows/s-vs-chunk-size curve, not an argument.
  *
  * A measured state peak above its documented bound FAILS the run
  * immediately after the offending twin (fail-fast), and the artifacts
  * are written with everything measured so far BEFORE the failure is
  * raised, so a violating run still leaves `stream_bench.json` +
  * `docs/STATE.md` behind for diagnosis.
  *
  * Output: one JSON line on stdout (headline = total rows/s at the
  * default chunking), a durable `stream_bench.json`, and the generated
  * `docs/STATE.md` table beside SCALING.md. All runs use the RocksDB
  * state store — the production backend. */
object StreamBench {

  final case class TwinResult(name: String, family: String,
      stateShape: String, boundDesc: String, bound: Long, rows: Long,
      wallSec: Double, batches: Int, p50Ms: Long, maxMs: Long,
      peakStateRows: Long, finalStateRows: Long, peakStateBytes: Long,
      outputRows: Long, chunks: Int)

  final case class ConcResult(n: Int, rowsPublished: Long,
      rowsDelivered: Long, wallSec: Double, p50Ms: Long, maxMs: Long,
      batches: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "20").toInt
    // production-batch-size chunkings for the throughput curve; at
    // sf0.1 (100k events) this is 4×25k and 1×100k rows per epoch
    val curveChunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CURVE", "4,1")
      .split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq
    val spark = Bench.session()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // delivered-rows accounting reads each query's progress history;
    // Bench.session() raises the retention cap (default 100 drops epochs
    // silently on larger feeds / smaller triggers) and the concurrency
    // loop below ASSERTS each query's epoch count stays under it
    val progressCap = Bench.ProgressCap
    import spark.implicits._

    // the shuffled-within-horizon feed: every row displaced < 30 min
    // against the 2 h slack, so nothing ever arrives sub-watermark
    val events = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value")
      .as[Stateful.Ev].collect()
    val shuffled = events.sortBy { e =>
      val jitter = Math.floorMod(e._3 * 2654435761L, 1800000L)
      (e._2.getTime + jitter, e._3)
    }
    val sentinelTs = new java.sql.Timestamp(
      events.map(_._2.getTime).max + 30L * 86400 * 1000)

    // documented bounds, computed from catalog-style stats
    val endDay = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(max("day")).head.getLong(0)
    val gridCells = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().count()
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()

    // everything measured so far — artifacts render from this buffer,
    // and are written BEFORE any bound-violation failure is raised
    val mainResults =
      scala.collection.mutable.ArrayBuffer.empty[TwinResult]
    val curveResults =
      scala.collection.mutable.ArrayBuffer.empty[TwinResult]
    val concResults =
      scala.collection.mutable.ArrayBuffer.empty[ConcResult]

    def run(name: String, family: String, stateShape: String,
        boundDesc: String, bound: Long, nChunks: Int)(
        op: DataFrame => Dataset[_]): TwinResult = {
      implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      val input = MemoryStream[Stateful.Ev]
      val q = op(input.toDS()
          .toDF("user_id", "ts", "event_id", "event_type", "value"))
        .writeStream.format("noop")
        .trigger(Trigger.ProcessingTime(10)).start()
      val per = math.max(1, shuffled.length / nChunks)
      val t0 = System.nanoTime()
      shuffled.grouped(per).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      input.addData((-1L, sentinelTs, -1L, "zz_sentinel", 0.0))
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress.toSeq
      q.stop()
      val ops = progress.flatMap(_.stateOperators.toSeq)
      val durs = progress
        .flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.longValue()).sorted
      val finalRows = progress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      TwinResult(name, family, stateShape, boundDesc, bound,
        shuffled.length.toLong, wall, progress.size,
        if (durs.isEmpty) 0L else durs(durs.length / 2),
        if (durs.isEmpty) 0L else durs.last,
        if (ops.isEmpty) 0L else ops.map(_.numRowsTotal).max,
        finalRows,
        if (ops.isEmpty) 0L else ops.map(_.memoryUsedBytes).max,
        progress.map(p => Option(p.sink).map(_.numOutputRows)
          .getOrElse(0L)).filter(_ > 0).sum,
        nChunks)
    }

    def writeArtifacts(): Unit = {
      val results = mainResults.toSeq
      val totalRows = results.map(_.rows).sum
      val totalWall = math.max(results.map(_.wallSec).sum, 1e-9)
      val rps = totalRows / totalWall

      def js(r: TwinResult): String =
        f"""    "${r.name}": {"family": "${r.family}", "rows": ${r.rows},
           |      "wall_sec": ${r.wallSec}%.3f, "rows_per_sec": ${
            r.rows / r.wallSec}%.0f,
           |      "batches": ${r.batches}, "batch_ms_p50": ${r.p50Ms},
           |      "batch_ms_max": ${r.maxMs},
           |      "state_rows_peak": ${r.peakStateRows},
           |      "state_rows_final": ${r.finalStateRows},
           |      "state_bytes_peak": ${r.peakStateBytes},
           |      "state_bound": ${r.bound},
           |      "state_bound_desc": "${r.boundDesc}",
           |      "state_shape": "${r.stateShape}",
           |      "output_rows": ${r.outputRows}}""".stripMargin
      // curve: twin → chunking → rows/s (the default chunking's point
      // comes from the main run; extra points from the curve sweep)
      val byTwin = (results ++ curveResults.toSeq).groupBy(_.name)
        .filter(_._1 != "warmup")
      def curveJs(name: String, rs: Seq[TwinResult]): String = {
        val pts = rs.sortBy(_.chunks).reverse.map { r =>
          val perChunk = r.rows / r.chunks
          f""""${r.chunks}": {"rows_per_chunk": $perChunk, "rows_per_sec": ${
              r.rows / r.wallSec}%.0f, "batch_ms_p50": ${r.p50Ms}, "batch_ms_max": ${r.maxMs}}"""
        }
        s"""    "$name": {${pts.mkString(", ")}}"""
      }
      // the FlushParallelism analog as a measured curve: aggregate
      // delivered rows/s across N concurrent subscriber queries of one
      // topic (each subscriber drains the full feed — fan-out — so
      // aggregate scaling ≈ N× means per-query drain is flat under
      // concurrency)
      def concJs(c: ConcResult): String =
        f""""${c.n}": {"rows_published": ${c.rowsPublished}, "rows_delivered": ${
          c.rowsDelivered}, "wall_sec": ${c.wallSec}%.3f, "agg_rows_per_sec": ${
          c.rowsDelivered / c.wallSec}%.0f, "per_query_rows_per_sec": ${
          c.rowsDelivered / c.n / c.wallSec}%.0f, "batch_ms_p50": ${
          c.p50Ms}, "batch_ms_max": ${c.maxMs}, "batches": ${c.batches}}"""
      val full =
        f"""{
           |  "metric": "stream_rows_per_sec", "value": $rps%.0f,
           |  "unit": "rows/s", "sf": "$sfDir",
           |  "cpus": "${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}",
           |  "chunks": $chunks,
           |  "note": "headline rows/s is epoch-overhead-bound by design: $chunks watermark-advancing micro-batches of ~${shuffled.length / chunks} rows each pay a fixed ~0.5s planning+RocksDB-commit cost. throughput_curve replays the same feed per family at production batch sizes (${curveChunks.mkString("/")} chunks) — the measured amortization curve. concurrency_curve drains one bus topic with N concurrent subscriber queries (the FlushParallelism>1 analog, MqttLikeSourceSpec isolation semantics) — the measured fan-out scaling curve.",
           |  "state_store": "rocksdb",
           |  "generated_at": "${java.time.Instant.now()}",
           |  "twins": {
           |${results.filter(_.name != "warmup").map(js).mkString(",\n")}
           |  },
           |  "throughput_curve": {
           |${byTwin.toSeq.sortBy(_._1)
              .map { case (n, rs) => curveJs(n, rs.toSeq) }
              .mkString(",\n")}
           |  },
           |  "concurrency_curve": {
           |    ${concResults.toSeq.sortBy(_.n).map(concJs).mkString(",\n    ")}
           |  }
           |}
           |""".stripMargin
      java.nio.file.Files.write(
        java.nio.file.Paths.get("stream_bench.json"),
        full.getBytes("UTF-8"))

      val md = new StringBuilder
      md ++= "# Measured streaming state bounds (generated)\n\n"
      md ++= s"Generated by `graft.StreamBench` at `$sfDir` "
      md ++= s"(${shuffled.length} events per twin, $chunks-chunk "
      md ++= "shuffled-within-horizon feed, RocksDB state store). "
      md ++= "Regenerate with\n`SPARK_GRAFT_SF_DIR=... sbt 'runMain "
      md ++= "graft.StreamBench'`. The documented bound column is\n"
      md ++= "computed from catalog-style batch stats at run time — the "
      md ++= "stats-at-ingest posture —\nand `StreamBench` FAILS "
      md ++= "(immediately after the offending twin, with this artifact "
      md ++= "already\nwritten) if any measured peak exceeds its bound. "
      md ++= "OrderedReplaySpec\n"
      md ++= "(`measured state bounds` test) pins the same invariants "
      md ++= "in CI at sf0.001.\n\n"
      md ++= "| twin | state family | state shape | rows | rows/s | "
      md ++= "batches | batch ms p50/max | state rows peak/final | "
      md ++= "peak bytes | documented bound |\n"
      md ++= "|---|---|---|---|---|---|---|---|---|---|\n"
      results.filter(_.name != "warmup").foreach { r =>
        md ++= f"| ${r.name} | ${r.family} | ${r.stateShape} | ${r.rows} "
        md ++= f"| ${r.rows / r.wallSec}%.0f | ${r.batches} "
        md ++= f"| ${r.p50Ms}/${r.maxMs} "
        md ++= f"| ${r.peakStateRows}/${r.finalStateRows} "
        md ++= f"| ${r.peakStateBytes} "
        md ++= f"| ${r.bound} (${r.boundDesc}) |\n"
      }
      md ++= "\nReading the table: state rows track the DOCUMENTED "
      md ++= "domain (grid cells, entity keys,\nsketch key set), never "
      md ++= "event volume — the only shapes that survive a 100 TB "
      md ++= "stream.\nkllQuantileStream's final=0 row is the "
      md ++= "reclaim-on-close proof (round 9): closed-key\nsketch state "
      md ++= "is removed, not tombstoned.\n"
      if (curveResults.nonEmpty) {
        md ++= "\n## Throughput vs batch size (measured curve)\n\n"
        md ++= "The same shuffled-within-horizon feed replayed per "
        md ++= "family at production batch\nsizes. Each epoch pays a "
        md ++= "fixed planning + RocksDB-commit cost, so rows/s rises\n"
        md ++= "as rows-per-epoch grows — this table IS the "
        md ++= "amortization claim, measured:\n\n"
        md ++= "| twin | chunks | rows/epoch | rows/s | "
        md ++= "batch ms p50/max |\n|---|---|---|---|---|\n"
        (results ++ curveResults.toSeq)
          .filter(_.name != "warmup")
          .sortBy(r => (r.name, -r.chunks)).foreach { r =>
            md ++= f"| ${r.name} | ${r.chunks} | ${r.rows / r.chunks} "
            md ++= f"| ${r.rows / r.wallSec}%.0f "
            md ++= f"| ${r.p50Ms}/${r.maxMs} |\n"
          }
        md ++= "\nPer-row pipe cost with the state machinery out of "
        md ++= "the loop is what\nThroughputBench measures (1.19M "
        md ++= "rows/s typed / 1.74M columnar through the DSv2\nbus "
        md ++= "source); the curve above keeps watermarks, timers and "
        md ++= "RocksDB commits in\nthe measured path.\n"
      }
      if (concResults.nonEmpty) {
        md ++= "\n## Concurrent-subscriber scaling (FlushParallelism "
        md ++= "analog, measured)\n\n"
        md ++= "One bus topic, the full feed published once, drained by "
        md ++= "N concurrent\nStreamingQueries (own checkpoints = "
        md ++= "subscriber groups; MqttLikeSourceSpec pins\nthe isolation "
        md ++= "semantics). Every subscriber receives every row "
        md ++= "(fan-out), so\naggregate rows/s growing ~linearly in N — "
        md ++= "per-query rate staying flat — IS\nthe \"N queries = N x "
        md ++= "drain\" claim, measured:\n\n"
        md ++= "| subscribers | delivered rows | wall s | aggregate "
        md ++= "rows/s | per-query rows/s | batch ms p50/max |\n"
        md ++= "|---|---|---|---|---|---|\n"
        concResults.toSeq.sortBy(_.n).foreach { c =>
          md ++= f"| ${c.n} | ${c.rowsDelivered} | ${c.wallSec}%.1f "
          md ++= f"| ${c.rowsDelivered / c.wallSec}%.0f "
          md ++= f"| ${c.rowsDelivered / c.n / c.wallSec}%.0f "
          md ++= f"| ${c.p50Ms}/${c.maxMs} |\n"
        }
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get("docs/STATE.md"),
        md.toString.getBytes("UTF-8"))
    }

    // fail-fast bound check: runs right after each twin completes, so a
    // violation in twin 1 does not burn the remaining twins' wall-clock
    // — and the artifacts are persisted first, so the diagnosing run
    // still gets stream_bench.json / STATE.md with the measurements
    def checked(r: TwinResult): TwinResult = {
      mainResults += r
      if (r.peakStateRows > r.bound) {
        writeArtifacts()
        throw new IllegalStateException(
          s"${r.name}: measured state ${r.peakStateRows} exceeds " +
            s"documented bound ${r.bound} (artifacts written)")
      }
      r
    }

    // warm the streaming machinery so twin 1 doesn't pay session init
    run("warmup", "-", "-", "-", Long.MaxValue, chunks)(df =>
      Stateful.dailyRevenueStream(df.select(col("event_type"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("cents")), endDay))

    final case class TwinDef(name: String, family: String,
        stateShape: String, boundDesc: String, bound: Long,
        op: DataFrame => Dataset[_])
    val twins = Seq(
      TwinDef("dailyRevenueStream", "commutative-grid",
        "one exact-cents counter per (type, day) cell",
        "calendar grid cells + sentinel cell", gridCells + 1L,
        df => Stateful.dailyRevenueStream(df.select(col("event_type"),
          col("ts"),
          expr("cast(round(value * 100) as bigint)").as("cents")),
          endDay)),
      TwinDef("scd2StreamOoo", "reorder-buffer",
        "slack-bounded replay buffer per user key",
        "distinct users + sentinel user", users + 1L,
        df => Stateful.scd2StreamOoo(df, "2 hours")),
      TwinDef("kllQuantileStream", "sketch-bytes",
        "serialized KLL(200) doubles sketch per type, reclaimed on close",
        "event-type key domain", 5L,
        df => Stateful.kllQuantileStream(df, endDay + 1L)),
      TwinDef("dailyMeansTws", "mapstate-timers (state v2)",
        "MapState[day -> (n, sum)] + per-day event-time timers",
        "calendar grid cells + sentinel cell", gridCells + 1L,
        df => Stateful.dailyMeansTws(df)))

    twins.foreach { t =>
      checked(run(t.name, t.family, t.stateShape, t.boundDesc, t.bound,
        chunks)(t.op))
    }

    // throughput curve: same feed, production batch sizes, per family;
    // bounds still enforced (state peaks are chunking-independent —
    // they track the key domain, not the epoch size)
    for (t <- twins; c <- curveChunks) {
      val r = run(t.name, t.family, t.stateShape, t.boundDesc, t.bound,
        c)(t.op)
      curveResults += r
      if (r.peakStateRows > r.bound) {
        writeArtifacts()
        throw new IllegalStateException(
          s"${t.name}@chunks=$c: measured state ${r.peakStateRows} " +
            s"exceeds documented bound ${r.bound} (artifacts written)")
      }
    }

    // ---- concurrency curve: the FlushParallelism>1 analog, measured.
    // The reference fans one destination's flushes across N workers
    // (batcher.go:139); the Spark rendition is N concurrent
    // StreamingQueries over one broker topic, each with its own
    // checkpoint (MqttLikeSourceSpec pins the isolation semantics).
    // This measures the claim "N subscribers = N× aggregate drain":
    // publish the sf feed once, drain it with 1/2/4 concurrent
    // subscriber queries, record aggregate rows/s + per-query epoch
    // latency. Deliveries scale with N (fan-out), so flat per-query
    // rows/s across N IS the scaling result.
    val concNs = sys.env.getOrElse("SPARK_GRAFT_STREAM_CONC", "1,2,4")
      .split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq
    concNs.foreach { n =>
      import graft.connectors.MessageBus
      val topic = s"bench_conc_$n"
      MessageBus.reset(topic)
      val payload = ("x" * 64).getBytes("UTF-8")
      var i = 0
      while (i < shuffled.length) {
        MessageBus.publish(topic, s"k$i", payload); i += 1
      }
      val ckBase = java.nio.file.Files
        .createTempDirectory(s"conc_${n}_ck").toString
      // wall clock starts BEFORE the first query starts: subscribers
      // begin draining as soon as they start, so a post-start t0 would
      // omit that work and overstate agg_rows_per_sec
      val t0 = System.nanoTime()
      val qs = (0 until n).map { qi =>
        spark.readStream.format("graft.connectors.MqttLikeSource")
          .option("topic", topic)
          .option("maxRowsPerTrigger", "10000").load()
          .writeStream.format("noop")
          .option("checkpointLocation", s"$ckBase/q$qi")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(10))
          .start()
      }
      qs.foreach(_.processAllAvailable())
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = qs.flatMap(_.recentProgress.toSeq)
      qs.foreach { q =>
        require(q.recentProgress.length < progressCap,
          s"conc_$n: progress history hit the $progressCap retention cap " +
            "— delivered-row counts would be silently undercounted")
      }
      qs.foreach(_.stop())
      MessageBus.reset(topic)
      val durs = progress
        .flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.longValue()).sorted
      val delivered = progress
        .map(p => Option(p.sink).map(_.numOutputRows).getOrElse(0L))
        .filter(_ > 0).sum
      concResults += ConcResult(n, shuffled.length.toLong, delivered,
        wall, if (durs.isEmpty) 0L else durs(durs.length / 2),
        if (durs.isEmpty) 0L else durs.last, progress.size)
    }

    writeArtifacts()

    val totalRows = mainResults.filter(_.name != "warmup").map(_.rows).sum
    val totalWall =
      mainResults.filter(_.name != "warmup").map(_.wallSec).sum
    val rps = totalRows / totalWall
    println(f"""{"metric":"stream_rows_per_sec","value":$rps%.0f,"unit":"rows/s","sf":"$sfDir","twins":${twins.size},"curve_chunkings":${curveChunks.size}}""")
    spark.stop()
  }
}
