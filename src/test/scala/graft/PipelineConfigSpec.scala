package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col
import graft.streaming.PipelineConfig
import graft.streaming.PipelineConfig.{PipelineConf, SinkConf, SourceConf}

/** Config-driven pipeline assembly (reference daemon surface,
  * README.md:149-311): declarative source/sink configs wired into running
  * queries, including the scanner→memory and eventlog-filter paths. */
class PipelineConfigSpec extends SparkSpec {

  test("scanner source → memory sink round trip via config") {
    val dir = tmpDir("cfg_scanner")
    Files.write(Paths.get(dir, "a.txt"), "m1\nm2\nm3".getBytes("UTF-8"))
    val conf = PipelineConf(
      SourceConf("scanner", Map("path" -> dir, "topic" -> "t1")),
      SinkConf("memory", Map("name" -> "cfg_out")),
      checkpoint = tmpDir("cfg_ck"), triggerMs = 100)
    val q = PipelineConfig.run(spark, conf,
      transformSql = Some("SELECT CAST(value AS STRING) AS v, topic FROM src"))
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT v FROM cfg_out").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("m1", "m2", "m3"))
  }

  test("eventlog source applies the XPath-analog filter predicate") {
    val s = spark
    val dir = tmpDir("cfg_evt")
    val rows = Seq(
      """{"system":{"provider":{"name":"Security","guid":"g1"},"eventId":"4625","channel":"Security","computer":"host1","timeCreated":{"systemTime":"2024-01-01T10:00:00.000Z"}},"eventDataMap":{"user":"alice"},"eventData":["a"],"userData":{}}""",
      """{"system":{"provider":{"name":"App","guid":"g2"},"eventId":"1000","channel":"Application","computer":"host1","timeCreated":{"systemTime":"2024-01-01T11:00:00.000Z"}},"eventDataMap":{"user":"bob"},"eventData":[],"userData":{}}""")
    Files.write(Paths.get(dir, "events.json"), rows.mkString("\n").getBytes("UTF-8"))
    val conf = PipelineConf(
      // filter = the reference's XPath query (event_logs.go:58) as SQL
      SourceConf("eventlog", Map("path" -> dir, "query" -> "system.eventId = '4625'")),
      SinkConf("memory", Map("name" -> "evt_out")),
      checkpoint = tmpDir("evt_ck"), triggerMs = 100)
    val q = PipelineConfig.run(spark, conf)
    q.processAllAvailable(); q.stop()
    val got = s.sql("SELECT system.eventId, eventDataMap['user'] FROM evt_out").collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "4625" && got.head.getString(1) == "alice")
  }

  test("jsonl and csv file-stream kinds read with explicit or inferred schema") {
    // jsonl with explicit DDL schema (no inference scan)
    val jdir = tmpDir("cfg_jsonl")
    Files.write(Paths.get(jdir, "a.jsonl"),
      "{\"k\":\"a\",\"v\":1}\n{\"k\":\"b\",\"v\":2}".getBytes("UTF-8"))
    val jconf = PipelineConf(
      SourceConf("jsonl", Map("path" -> jdir, "schema" -> "k STRING, v INT")),
      SinkConf("memory", Map("name" -> "jsonl_out")),
      checkpoint = tmpDir("jsonl_ck"), triggerMs = 100)
    val jq = PipelineConfig.run(spark, jconf)
    jq.processAllAvailable(); jq.stop()
    assert(spark.sql("SELECT k, v FROM jsonl_out ORDER BY k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq == Seq("a" -> 1, "b" -> 2))

    // csv with header + inferred schema (one batch inference at build)
    val cdir = tmpDir("cfg_csv")
    Files.write(Paths.get(cdir, "a.csv"), "k,v\nx,10\ny,20".getBytes("UTF-8"))
    val cconf = PipelineConf(
      SourceConf("csv", Map("path" -> cdir)),
      SinkConf("memory", Map("name" -> "csv_out")),
      checkpoint = tmpDir("csv_ck"), triggerMs = 100)
    val cq = PipelineConfig.run(spark, cconf)
    cq.processAllAvailable(); cq.stop()
    assert(spark.sql("SELECT k, v FROM csv_out ORDER BY k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq == Seq("x" -> 10, "y" -> 20))
  }

  test("orc source and sink round-trip through the config layer") {
    import spark.implicits._
    // seed an orc dir (batch write), stream it through an orc sink,
    // batch-read the sink back — both directions of the new kind
    val inDir = tmpDir("cfg_orc_in")
    Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .write.mode("overwrite").orc(inDir)
    val outDir = tmpDir("cfg_orc_out")
    val conf = PipelineConf(
      SourceConf("orc", Map("path" -> inDir)),
      SinkConf("orc", Map("path" -> outDir)),
      checkpoint = tmpDir("orc_ck"), triggerMs = 100)
    val q = PipelineConfig.run(spark, conf)
    q.processAllAvailable(); q.stop()
    assert(spark.read.orc(outDir).orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq == Seq("a" -> 1, "b" -> 2))
  }

  test("unknown kinds fail fast with a clear error") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.source(spark, SourceConf("nats"))
    }
    assert(e.getMessage.contains("nats"))
  }

  test("syslog/journald kinds accept verbatim reference-daemon-shaped configs") {
    val dir = tmpDir("cfg_syslog")
    Files.write(Paths.get(dir, "s.log"), "sys1\nsys2".getBytes("UTF-8"))
    // README.md:166-185 shapes: syslog carries addr/contentType, journald
    // carries nothing — both accepted, inert options ignored
    val conf = PipelineConf(
      SourceConf("syslog", Map("path" -> dir, "addr" -> "0.0.0.0:5514",
        "contentType" -> "application/syslog")),
      SinkConf("memory", Map("name" -> "syslog_out")),
      checkpoint = tmpDir("syslog_ck"), availableNow = true)
    PipelineConfig.run(spark, conf,
      transformSql = Some("SELECT CAST(value AS STRING) AS v, topic FROM src"))
      .awaitTermination(60000)
    val got = spark.sql("SELECT v, topic FROM syslog_out").collect()
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("sys1", "sys2"))
    assert(got.forall(_.getString(1) == "syslog"), "topic defaults to the kind")
    // journald builds on the same path
    val j = PipelineConfig.source(spark, SourceConf("journald", Map("path" -> dir)))
    assert(j.isStreaming && j.schema.fieldNames.contains("value"))
  }

  test("syslog contentType rfc3164/rfc5424 structures records; bad lines flagged") {
    import graft.functions.SyslogFunctions
    val s = spark
    import s.implicits._
    // RFC 3164: auth-facility warning from sshd with a pid
    val l3164 = "<34>Oct 11 22:14:15 mymachine sshd[245]: Failed password for root"
    // RFC 5424: local4 notice with structured data and a message
    val l5424 = "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog 1024 ID47 [exampleSDID@32473 iut=\"3\"] An application event"
    // 5424 nil-valued fields and no message
    val l5424nil = "<165>1 2003-10-11T22:14:16Z host app - - -"
    val bad = "not a syslog line at all"

    val p3 = Seq(l3164, bad).toDF("value")
      .select(SyslogFunctions.parseRfc3164(col("value")).as("s"))
      .select("s.*").collect()
    val ok3 = p3.find(_.getAs[Boolean]("valid")).get
    assert(ok3.getAs[Int]("pri") == 34)
    assert(ok3.getAs[Int]("facility") == 4 && ok3.getAs[Int]("severity") == 2)
    assert(ok3.getAs[String]("host") == "mymachine")
    assert(ok3.getAs[String]("tag") == "sshd" && ok3.getAs[Int]("pid") == 245)
    assert(ok3.getAs[String]("msg") == "Failed password for root")
    val bad3 = p3.find(!_.getAs[Boolean]("valid")).get
    assert(bad3.isNullAt(bad3.fieldIndex("host")), "bad line yields nulls")

    val p5 = Seq(l5424, l5424nil, bad).toDF("value")
      .select(SyslogFunctions.parseRfc5424(col("value")).as("s"))
      .select("s.*").collect()
    val full = p5.find(r => r.getAs[Boolean]("valid") &&
      !r.isNullAt(r.fieldIndex("msgid"))).get
    assert(full.getAs[Int]("pri") == 165 && full.getAs[Int]("facility") == 20)
    assert(full.getAs[String]("app") == "evntslog")
    assert(full.getAs[String]("sd").startsWith("[exampleSDID@32473"))
    assert(full.getAs[String]("msg") == "An application event")
    assert(!full.isNullAt(full.fieldIndex("ts")), "ISO timestamp parses")
    val nil = p5.find(r => r.getAs[Boolean]("valid") &&
      r.isNullAt(r.fieldIndex("msgid"))).get
    assert(nil.isNullAt(nil.fieldIndex("procid")) &&
      nil.isNullAt(nil.fieldIndex("sd")) && nil.isNullAt(nil.fieldIndex("msg")),
      "nil-valued 5424 fields become nulls")
    assert(p5.count(!_.getAs[Boolean]("valid")) == 1)

    // CEF: header splits + extension k=v map
    val cef = "CEF:0|Security|threatmanager|1.0|100|worm stopped|10|src=10.0.0.1 dst=2.1.2.2 spt=1232"
    val pc = Seq(cef, bad).toDF("value")
      .select(SyslogFunctions.parseCef(col("value")).as("s"))
      .select("s.*").collect()
    val okC = pc.find(_.getAs[Boolean]("valid")).get
    assert(okC.getAs[Int]("version") == 0 &&
      okC.getAs[String]("vendor") == "Security")
    assert(okC.getAs[String]("name") == "worm stopped" &&
      okC.getAs[Int]("severity") == 10)
    val ext = okC.getAs[Map[String, String]]("ext")
    assert(ext("src") == "10.0.0.1" && ext("spt") == "1232")
    assert(pc.count(!_.getAs[Boolean]("valid")) == 1)

    // through the config layer: contentType structures the stream
    val dir = tmpDir("cfg_syslog_ct")
    Files.write(Paths.get(dir, "s.log"), s"$l3164\n$bad".getBytes("UTF-8"))
    val conf = PipelineConf(
      SourceConf("syslog", Map("path" -> dir, "contentType" -> "rfc3164")),
      SinkConf("memory", Map("name" -> "syslog_parsed")),
      checkpoint = tmpDir("syslog_ct_ck"), availableNow = true)
    PipelineConfig.run(spark, conf,
      transformSql = Some(
        "SELECT syslog.host AS host, syslog.valid AS valid FROM src"))
      .awaitTermination(60000)
    val got = spark.sql("SELECT host, valid FROM syslog_parsed").collect()
    assert(got.length == 2)
    assert(got.count(_.getBoolean(1)) == 1)
    assert(got.find(_.getBoolean(1)).get.getString(0) == "mymachine")
  }

  test("kafka kind is recognized and fails only on the missing connector jar") {
    // wishlist kind (README.md:301-311): registered as a passthrough to
    // Spark's connector; without spark-sql-kafka on the classpath the
    // provider lookup fails with Spark's own error, not "unknown kind"
    val e = intercept[Exception] {
      PipelineConfig.source(spark, SourceConf("kafka",
        Map("kafka.bootstrap.servers" -> "localhost:9092", "subscribe" -> "t")))
    }
    assert(!e.getMessage.contains("unknown source kind"))
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
  test("end-to-end daemon: scanner dir -> SQL transform -> gzip object sink") {
    val s = spark
    val inDir = tmpDir("daemon_in")
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "log.txt"),
      "evt1\nevt2\nevt3".getBytes("UTF-8"))
    val outPrefix = tmpDir("daemon_out")
    val conf = PipelineConf(
      SourceConf("scanner", Map("path" -> inDir, "topic" -> "syslog")),
      SinkConf("s3", Map("prefix" -> outPrefix)),
      checkpoint = tmpDir("daemon_ck"), triggerMs = 100)
    val q = PipelineConfig.run(spark, conf,
      transformSql = Some(
        "SELECT upper(CAST(value AS STRING)) AS value FROM src WHERE CAST(value AS STRING) != 'evt2'"))
    q.processAllAvailable(); q.stop()
    val back = s.read.text(outPrefix + "/*/*/*/*/*")
      .collect().map(_.getString(0)).sorted
    assert(back.toSeq == Seq("EVT1", "EVT3"), s"gzip objects content: ${back.toSeq}")
  }

  test("daemon soak: rfc5424 -> handler -> gzip sink end-to-end with harvested metrics (graft.Soak)") {
    // the same code path graft.Soak's main drives at sf0.1 — the
    // README daemon shape with both observability channels live, INCL.
    // the mid-feed hard kill + checkpoint resume (crash recovery is
    // part of the soak, not a separate scenario)
    val work = tmpDir("soak_work")
    val r = graft.Soak.run(spark, "/root/testdata/sf0.001",
      work, tranches = 4, killAtTranche = Some(2))
    assert(r.rowsIn == 1000, s"rendered ${r.rowsIn} wire lines")
    assert(r.malformedIn == 5, s"planted ${r.malformedIn} corrupt frames")
    // the kill happened, and recovery delivered every row exactly once:
    // no loss, no duplication through the two-phase gzip flush
    assert(r.restarts == 1, s"expected 1 restart, got ${r.restarts}")
    assert(r.lost == 0 && r.duplicated == 0,
      s"crash recovery broke delivery: lost=${r.lost} dup=${r.duplicated}")
    // the pipeline delivers every valid frame exactly once, and the
    // malformed tail is COUNTED through the observe channel (null ts
    // and null user on unparsed frames), never a row failure
    assert(r.rowsOut == r.rowsIn - r.malformedIn,
      s"out=${r.rowsOut} valid-in=${r.rowsIn - r.malformedIn}")
    assert(r.nullTs == r.malformedIn,
      s"n_null_ts=${r.nullTs} != planted ${r.malformedIn}")
    assert(r.badUser == r.malformedIn,
      s"n_bad_user=${r.badUser} != planted ${r.malformedIn}")
    assert(r.epochs >= 4, s"expected >=1 epoch per tranche, got ${r.epochs}")
    assert(r.objects > 0 && r.bytesOut > 0, "no gzip objects written")
    // delivered payload is real NDJSON carrying the parsed fields, and
    // the parse round-trips: per-type counts through the whole wire →
    // parser → handler → gzip path equal the batch table's
    val back = spark.read.option("recursiveFileLookup", "true")
      .json(s"$work/out")
    assert(back.columns.toSet ==
      Set("ts", "event_type", "user_id", "value", "host"))
    val gotByType = back.groupBy("event_type").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val wantByType = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // 5 corrupt frames were planted on top of these counts; the gap
    // between want and got must be exactly those 5 rows
    assert(wantByType.values.sum - gotByType.values.sum == 5,
      s"per-type totals: want=${wantByType.values.sum} got=${gotByType.values.sum}")
  }

  test("concurrent daemon soak: 2 subscribers over one bus topic survive a mid-feed kill (graft.Soak.runConcurrent)") {
    // the FlushParallelism shape end to end: one wire published to the
    // bus, two pipelines draining with independent checkpoints/prefixes,
    // BOTH hard-killed with data pending and resumed — delivery must
    // hold per query (lost = duplicated = 0 for each subscriber)
    val work = tmpDir("soak_conc_work")
    val c = graft.Soak.runConcurrent(spark, "/root/testdata/sf0.001",
      work, tranches = 4, n = 2, killAtTranche = Some(2))
    assert(c.rowsIn == 1000 && c.malformedIn == 5,
      s"wire: rows=${c.rowsIn} malformed=${c.malformedIn}")
    assert(c.restarts == 1, s"expected 1 restart, got ${c.restarts}")
    assert(c.rowsOutPerQuery == Seq(995L, 995L),
      s"each subscriber must deliver every valid frame: ${c.rowsOutPerQuery}")
    assert(c.lostPerQuery.forall(_ == 0) &&
      c.duplicatedPerQuery.forall(_ == 0),
      s"per-query delivery broke across the kill: lost=${c.lostPerQuery} " +
        s"dup=${c.duplicatedPerQuery}")
  }
}
