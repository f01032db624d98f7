package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.SyslogFunctions

/** Generative round-trip proof of the syslog/CEF wire parsers
  * (graft.functions.SyslogFunctions): format a randomly generated
  * structured record per the RFC grammar with plain-Scala string
  * interpolation (no Spark machinery shared with the parser), parse
  * the line with the column functions, and assert every field
  * round-trips exactly — plus corrupted lines land valid=false
  * instead of mis-parsing.
  *
  * PipelineConfigSpec pins fixed reference-shaped lines; this spec
  * samples the grammar: PRI across the full facility×severity domain,
  * space-padded vs two-digit 3164 days, optional pid, empty messages,
  * 5424 nil (`-`) values in any subset of HOST/APP/PROCID/MSGID,
  * timestamps with and without millis across zone forms, bracketed
  * and nil structured-data, CEF extension maps of arbitrary k=v
  * pairs. Messages avoid `]` (the documented greedy-SD quirk: a `]`
  * in MSG after bracketed SD extends the SD capture) and bare `-`
  * (parsed as the RFC nil) — both documented parser policy, not
  * round-trip targets. */
class WireFormatPropertySpec extends SparkSpec {

  private val alnum: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val msgGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf(':', '.', '=', '/', '(', ')')))
  } yield {
    val s = cs.mkString
    if (s.trim == "-") s + "x" else s  // bare "-" is the RFC nil
  }

  private val priGen: Gen[(Int, Int)] =
    Gen.zip(Gen.choose(0, 23), Gen.choose(0, 7)) // (facility, severity)

  private def parse1(line: String, parser: org.apache.spark.sql.Column
      => org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    val s = spark
    import s.implicits._
    Seq(line).toDF("line").select(parser(col("line")).as("p"))
      .select("p.*").collect()(0)
  }

  test("property: RFC 3164 lines round-trip through parseRfc3164") {
    val months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    val recGen = for {
      (fac, sev) <- priGen
      mon <- Gen.oneOf(months)
      day <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59)
      sec <- Gen.choose(0, 59)
      host <- alnum
      tag <- alnum // tag alphabet: no colon/bracket/space by grammar
      pid <- Gen.option(Gen.choose(1, 99999))
      msg <- msgGen
    } yield (fac, sev, mon, day, h, mi, sec, host, tag, pid, msg)
    val prop = Prop.forAllNoShrink(recGen) {
      case (fac, sev, mon, day, h, mi, sec, host, tag, pid, msg) =>
        val ts = f"$mon $day%2d $h%02d:$mi%02d:$sec%02d"
        val line = s"<${fac * 8 + sev}>$ts $host $tag" +
          pid.map(p => s"[$p]").getOrElse("") + s": $msg"
        val r = parse1(line, SyslogFunctions.parseRfc3164)
        r.getBoolean(8) &&                                    // valid
          r.getInt(0) == fac * 8 + sev && r.getInt(1) == fac &&
          r.getInt(2) == sev && r.getString(3) == ts &&
          r.getString(4) == host && r.getString(5) == tag &&
          (if (pid.isEmpty) r.isNullAt(6) else r.getInt(6) == pid.get) &&
          r.getString(7) == msg
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: RFC 5424 lines round-trip through parseRfc5424") {
    val nilOr: Gen[Option[String]] = Gen.option(alnum)
    val recGen = for {
      (fac, sev) <- priGen
      mo <- Gen.choose(1, 12); day <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59)
      sec <- Gen.choose(0, 59)
      millis <- Gen.option(Gen.choose(0, 999))
      zone <- Gen.oneOf("Z", "+01:00", "-05:30", "+00:00")
      host <- nilOr; app <- nilOr; procid <- nilOr; msgid <- nilOr
      sd <- Gen.option(Gen.zip(alnum, alnum, alnum)
        .map { case (id, k, v) => s"[$id $k=" + "\"" + v + "\"]" })
      msg <- Gen.option(msgGen.map(_.replace("]", "x")))
    } yield (fac, sev, f"2026-$mo%02d-$day%02dT$h%02d:$mi%02d:$sec%02d" +
      millis.map(m => f".$m%03d").getOrElse("") + zone,
      host, app, procid, msgid, sd, msg)
    val prop = Prop.forAllNoShrink(recGen) {
      case (fac, sev, ts, host, app, procid, msgid, sd, msg) =>
        val line = s"<${fac * 8 + sev}>1 $ts ${host.getOrElse("-")} " +
          s"${app.getOrElse("-")} ${procid.getOrElse("-")} " +
          s"${msgid.getOrElse("-")} ${sd.getOrElse("-")}" +
          msg.map(m => s" $m").getOrElse("")
        val r = parse1(line, SyslogFunctions.parseRfc5424)
        val wantTs = java.time.OffsetDateTime.parse(ts).toInstant
          .toEpochMilli
        def optEq(i: Int, v: Option[String]): Boolean =
          // a present-but-EMPTY msg formats identically to an absent
          // one; both are null by documented policy
          v.filter(_.nonEmpty) match {
            case None => r.isNullAt(i)
            case Some(x) => !r.isNullAt(i) && r.getString(i) == x
          }
        r.getBoolean(10) &&
          r.getInt(0) == fac * 8 + sev && r.getInt(1) == fac &&
          r.getInt(2) == sev &&
          r.getTimestamp(3).getTime == wantTs &&
          optEq(4, host) && optEq(5, app) && optEq(6, procid) &&
          optEq(7, msgid) && optEq(8, sd) && optEq(9, msg)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: CEF lines round-trip through parseCef") {
    val hdrGen: Gen[String] = for { // no pipe, no backslash by grammar
      n <- Gen.choose(0, 10)
      cs <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', '.', '-')))
    } yield cs.mkString
    val kvGen: Gen[(String, String)] = Gen.zip(alnum, alnum)
    val recGen = for {
      vendor <- hdrGen; product <- hdrGen; dver <- hdrGen
      sig <- alnum; name <- hdrGen
      sev <- Gen.choose(0, 10)
      nExt <- Gen.choose(1, 5)
      ext <- Gen.listOfN(nExt, kvGen).map(_.toMap) // map: unique keys
    } yield (vendor, product, dver, sig, name, sev, ext)
    val prop = Prop.forAllNoShrink(recGen) {
      case (vendor, product, dver, sig, name, sev, ext) =>
        val tail = ext.map { case (k, v) => s"$k=$v" }.mkString(" ")
        val line = s"CEF:0|$vendor|$product|$dver|$sig|$name|$sev|$tail"
        val r = parse1(line, SyslogFunctions.parseCef)
        r.getBoolean(8) && r.getInt(0) == 0 &&
          r.getString(1) == vendor && r.getString(2) == product &&
          r.getString(3) == dver && r.getString(4) == sig &&
          r.getString(5) == name && r.getInt(6) == sev &&
          r.getMap[String, String](7).toMap == ext
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: corrupted lines land valid=false, never a mis-parse") {
    val corrupt: Gen[String] = Gen.oneOf(
      msgGen,                                   // arbitrary junk
      msgGen.map(m => s"<999x>$m"),             // malformed PRI
      alnum.map(h => s"Jan  5 01:02:03 $h tag: no pri"),
      alnum.map(v => s"CEF|0|$v|missing colon"))
    val prop = Prop.forAllNoShrink(corrupt) { line =>
      !parse1(line, SyslogFunctions.parseRfc3164).getBoolean(8) &&
        !parse1(line, SyslogFunctions.parseRfc5424).getBoolean(10) &&
        !parse1(line, SyslogFunctions.parseCef).getBoolean(8)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
