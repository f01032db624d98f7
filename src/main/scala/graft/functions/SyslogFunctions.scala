package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Syslog wire-format parsers as pure column expressions — the
  * reference's own domain (its syslog source, README.md:166-174, hands
  * raw lines downstream; a query layer over security telemetry needs
  * them structured). Both parsers are compositions of built-in
  * regexp/conditional functions, so they stay inside whole-stage
  * codegen — no UDF on the hot ingest path — and a malformed line
  * yields a struct of nulls with `valid = false` rather than a row
  * failure (the PERMISSIVE-deser posture).
  *
  * PRI decomposes as facility·8 + severity (RFC 5424 §6.2.1).
  */
object SyslogFunctions {

  private val R3164 =
    "^<(\\d{1,3})>([A-Z][a-z]{2} [ 0-9]\\d \\d\\d:\\d\\d:\\d\\d) " +
      "(\\S+) ([^:\\[\\s]+)(?:\\[(\\d+)\\])?: (.*)$"

  private val R5424 =
    "^<(\\d{1,3})>1 (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) " +
      "(-|\\[.*\\])(?: (.*))?$"

  private def priParts(pri: Column): Seq[Column] = Seq(
    pri.as("pri"),
    (pri / 8).cast("int").as("facility"),
    pmod(pri, lit(8)).cast("int").as("severity"))

  /** RFC 3164 (BSD syslog): `<PRI>MMM dd HH:mm:ss host tag[pid]: msg`.
    * Returns struct(pri, facility, severity, ts_text, host, tag, pid,
    * msg, valid). The legacy timestamp has no year/zone, so it stays
    * text — resolving it against an ingest clock is the caller's
    * policy decision, not the parser's. */
  def parseRfc3164(line: Column): Column = {
    val pri = regexp_extract(line, R3164, 1)
    val valid = pri =!= ""
    def f(i: Int): Column =
      when(valid, regexp_extract(line, R3164, i))
    struct(
      (priParts(when(valid, pri.cast("int")).as("pri")) ++ Seq(
        f(2).as("ts_text"), f(3).as("host"), f(4).as("tag"),
        when(valid && regexp_extract(line, R3164, 5) =!= "",
          regexp_extract(line, R3164, 5).cast("int")).as("pid"),
        f(6).as("msg"), valid.as("valid"))): _*)
  }

  /** CEF (ArcSight Common Event Format):
    * `CEF:0|Vendor|Product|Version|SignatureID|Name|Severity|ext...`
    * with the extension tail parsed into a `k=v` map via str_to_map.
    * Returns struct(version, vendor, product, device_version, sig_id,
    * name, severity, ext, valid). The header fields are plain
    * pipe-splits (CEF escapes pipes as `\|` — rows using that escape
    * land valid=false rather than mis-split, the honest cheap
    * parser; a full unescaper is a custom Expression if ever needed). */
  def parseCef(line: Column): Column = {
    val R = "^CEF:(\\d+)\\|([^|\\\\]*)\\|([^|\\\\]*)\\|([^|\\\\]*)" +
      "\\|([^|\\\\]*)\\|([^|\\\\]*)\\|([^|\\\\]*)\\|(.*)$"
    val ver = regexp_extract(line, R, 1)
    val valid = ver =!= ""
    def f(i: Int): Column = when(valid, regexp_extract(line, R, i))
    struct(
      when(valid, ver.cast("int")).as("version"),
      f(2).as("vendor"), f(3).as("product"), f(4).as("device_version"),
      f(5).as("sig_id"), f(6).as("name"),
      when(valid, regexp_extract(line, R, 7).cast("int")).as("severity"),
      when(valid, str_to_map(regexp_extract(line, R, 8), lit(" "),
        lit("="))).as("ext"),
      valid.as("valid"))
  }

  /** RFC 5424: `<PRI>1 TIMESTAMP HOST APP PROCID MSGID SD [MSG]`.
    * Returns struct(pri, facility, severity, ts, host, app, procid,
    * msgid, sd, msg, valid); the ISO timestamp parses to a real
    * timestamp column, `-` nil-values become nulls. */
  def parseRfc5424(line: Column): Column = {
    val pri = regexp_extract(line, R5424, 1)
    val valid = pri =!= ""
    def f(i: Int): Column = {
      val v = regexp_extract(line, R5424, i)
      // "-" is the RFC nil value; "" is a non-participating optional
      // group (a present-but-empty MSG is indistinguishable and also null)
      when(valid && v =!= "-" && v =!= "", v)
    }
    struct(
      (priParts(when(valid, pri.cast("int")).as("pri")) ++ Seq(
        when(valid,
          to_timestamp(regexp_extract(line, R5424, 2),
            "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX")).as("ts"),
        f(3).as("host"), f(4).as("app"), f(5).as("procid"),
        f(6).as("msgid"), f(7).as("sd"), f(8).as("msg"),
        valid.as("valid"))): _*)
  }
}
