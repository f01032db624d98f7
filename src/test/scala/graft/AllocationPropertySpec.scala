package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Curation

/** Property gate for x24's largest-remainder allocator: for ANY strata
  * table and budget — not just the documents fixture — Hamilton's
  * method must (1) sum exactly to the budget, (2) give every stratum
  * the floor or ceil of its exact proportional quota B·nᵢ/N, and
  * (3) be deterministic under the (remainder DESC, source) tie order.
  * These are the contracts downstream shard/epoch/sampling plans
  * consume; a drifting allocator breaks "exactly B sequences ship"
  * silently, which is why the gate is a property, not a fixture. */
class AllocationPropertySpec extends SparkSpec {

  test("property: largest remainder sums to budget with floor/ceil quotas") {
    val s = spark
    import s.implicits._
    val strata = Gen.chooseNum(1, 12).flatMap { k =>
      Gen.listOfN(k, Gen.chooseNum(1L, 100000L)).map(_.zipWithIndex
        .map { case (n, i) => (f"src_$i%02d", n) })
    }
    val prop = Prop.forAll(strata, Gen.chooseNum(1L, 50000L)) {
      (st: List[(String, Long)], budget: Long) =>
        val rows = Curation.largestRemainder(
            st.toDF("source", "n_docs"), budget)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(5)))
        val nn = st.map(_._2).sum
        val sums = rows.map(_._4).sum == budget
        val quotas = rows.forall { case (_, n, base, alloc) =>
          base == budget * n / nn && (alloc - base == 0L || alloc - base == 1L)
        }
        sums && quotas
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
