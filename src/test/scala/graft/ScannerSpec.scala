package graft

import java.nio.file.{Files, Paths}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.streaming.Sources

/** Scanner source semantics (scanner.go:14-105): delimiter splitting with
  * final-unterminated-token emission. Property (FIXTURES.md §A):
  * split(join(xs, d), d) == xs, including the no-trailing-delimiter case,
  * with the exotic multi-byte delimiter from stream_test.go:43-55.
  */
class ScannerSpec extends SparkSpec {

  private def roundTrip(xs: Seq[String], delim: String): Seq[String] = {
    val dir = tmpDir("scanner")
    Files.write(Paths.get(dir, "in.txt"), xs.mkString(delim).getBytes("UTF-8"))
    Sources.scanner(spark, dir, delim)
      .collect().map(r => new String(r.getAs[Array[Byte]]("value"), "UTF-8")).toSeq
  }

  test("newline-delimited round trip with unterminated final token") {
    assert(roundTrip(Seq("alpha", "beta", "gamma"), "\n").sorted ==
      Seq("alpha", "beta", "gamma").sorted)
  }

  test("exotic 8-byte delimiter (stream_test.go:43-55)") {
    val delim = "0x0x0x0x0"
    assert(roundTrip(Seq("msg one", "msg two", "msg three"), delim).sorted ==
      Seq("msg one", "msg two", "msg three").sorted)
  }

  test("property: split(join(xs, d), d) == xs (scalacheck)") {
    // letters only: a token containing the delimiter (e.g. "a0x0b" vs
    // delim "0x0") would legitimately split — not a scanner defect
    val tok = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val prop = Prop.forAll(Gen.nonEmptyListOf(tok), Gen.oneOf("\n", "|", "##", "0x0")) {
      (xs: List[String], d: String) =>
        xs.isEmpty || roundTrip(xs, d).sorted == xs.sorted
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("envelope columns: topic set, value binary, key null") {
    val dir = tmpDir("scanner_env")
    Files.write(Paths.get(dir, "in.txt"), "one\ntwo".getBytes("UTF-8"))
    val rows = Sources.scanner(spark, dir, "\n", topic = "mytopic").collect()
    assert(rows.forall(_.getAs[String]("topic") == "mytopic"))
    assert(rows.forall(_.isNullAt(0)))
  }
}
