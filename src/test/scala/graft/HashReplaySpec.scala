package graft

/** Pins the two deterministic-randomness contracts the round-10 oracle
  * replays depend on (docs/ORACLES.md): if a Spark upgrade ever changes
  * `hash()` or `scala.util.Random`'s backing LCG, the failure surfaces
  * HERE with a named cause instead of as a cryptic DuckDB hash mismatch
  * on s19/s20 (Murmur3 seed slice) or s02/d08/s09 (LCG plane matrices).
  */
class HashReplaySpec extends SparkSpec {

  test("spark hash(long) is Murmur3 x86_32 seed 42 — the SQL-replay ground truth") {
    val s = spark
    val got = s.range(0, 20)
      .selectExpr("id", "hash(id) AS h", "pmod(hash(id), 37) AS m")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // independently computed Murmur3 (two 32-bit words of the long,
    // c1=0xcc9e2d51, c2=0x1b873593, fmix over length 8) — the same
    // arithmetic the s19/s20 DuckDB oracles unroll in SQL
    def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    def mixK1(k0: Int): Int = rotl(k0 * 0xcc9e2d51, 15) * 0x1b873593
    def mixH1(h: Int, k: Int): Int = rotl(h ^ k, 13) * 5 + 0xe6546b64
    def fmix(h0: Int): Int = {
      var h = h0 ^ 8
      h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
      h *= 0xc2b2ae35; h ^ (h >>> 16)
    }
    def ref(v: Long): Int =
      fmix(mixH1(mixH1(42, mixK1(v.toInt)), mixK1((v >>> 32).toInt)))
    got.foreach { case (id, h, m) =>
      assert(h == ref(id), s"hash($id): spark=$h replay=${ref(id)}")
      assert(m == ((h % 37) + 37) % 37)
    }
    // the exact boundary values the DuckDB CTE was verified against
    assert(got(0)._2 == -1670924195 && got(7)._2 == 1293116811)
  }

  test("scala.util.Random(seed).nextBoolean is the Java 48-bit LCG bit 47") {
    // the plane-matrix contract: s02 (seed 7), d08/s09/s19/s20 (seed 42)
    val mask = (1L << 48) - 1
    def lcgBools(seed: Long, n: Int): Seq[Boolean] = {
      var s = (seed ^ 0x5DEECE66DL) & mask
      (1 to n).map { _ =>
        s = (s * 0x5DEECE66DL + 0xBL) & mask
        ((s >>> 47) & 1L) == 1L
      }
    }
    Seq(7L, 42L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val want = Seq.fill(640)(rnd.nextBoolean())
      assert(lcgBools(seed, 640) == want,
        s"LCG replay diverged for seed $seed")
    }
  }
}
