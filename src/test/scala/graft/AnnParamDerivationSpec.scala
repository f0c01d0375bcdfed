package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pure-function pins for the corpus-derived ANN serving knobs
  * (round-20): the derivations are mirrored in the oracle as SQL
  * scalar subqueries, so their Scala side must hold exactly the
  * documented algebra at every scale — these are the properties the
  * 1-row q_ann_params oracle checks end-to-end at the harness SFs,
  * pinned here across the whole range a deployment could see. */
class AnnParamDerivationSpec extends AnyFunSuite {

  private val sizes = Seq(1L, 10L, 125L, 500L, 2000L, 22000L, 1000000L,
    100000000L, 10000000000L)

  test("numQueriesFor: floored at MinQueries, linear in corpus mass") {
    assert(Similarity.numQueriesFor(500) == 5)
    assert(Similarity.numQueriesFor(2000) == 5)
    assert(Similarity.numQueriesFor(22000) == 22)
    for (n <- sizes)
      assert(Similarity.numQueriesFor(n) ==
        math.max(Similarity.MinQueries, n / Similarity.QueryDiv))
  }

  test("cellsFor: floor(sqrt(n)) clamped — sublinear, bounded, exact at squares") {
    assert(Similarity.cellsFor(500) == 22)
    assert(Similarity.cellsFor(2000) == 44)
    assert(Similarity.cellsFor(22000) == 148)
    assert(Similarity.cellsFor(0) == Similarity.MinCells)
    assert(Similarity.cellsFor(1L << 40) == Similarity.MaxCells)
    // exact at perfect squares (IEEE sqrt is correctly rounded — the
    // cross-engine determinism claim)
    for (m <- Seq(100L, 1000L, 12345L)) assert(Similarity.cellsFor(m * m) == m)
    // 10x data -> ~3.2x cells, never linear
    for (n <- sizes if n >= 256 && 10 * n < (1L << 33))
      assert(Similarity.cellsFor(10 * n) <= 4 * Similarity.cellsFor(n))
  }

  test("nprobeFor and shortlistFor: half the trained cells; 2n/5 over the 50 floor") {
    assert(Similarity.nprobeFor(22) == 11)
    assert(Similarity.nprobeFor(3) == 2) // floor
    assert(Similarity.shortlistFor(100) == 50) // floor holds below 125
    assert(Similarity.shortlistFor(125) == 50)
    assert(Similarity.shortlistFor(2000) == 800)
    assert(Similarity.shortlistFor(22000) == 8800)
  }

  test("auditStrideFor: >= 1, coprime to the 10x replica striping, ~target sample") {
    for (nq <- Seq(1L, 5L, 20L, 22L, 24L, 48L, 100L, 220L, 1000L, 1000000L)) {
      val s = Similarity.auditStrideFor(nq)
      assert(s >= 1)
      assert(s % 2 != 0 && s % 5 != 0,
        s"stride $s shares a factor with 10 — replica aliasing (nq=$nq)")
      // sampled count stays within a small band of the target once
      // nq exceeds it (the +1/+2 coprimality bump only shrinks the
      // sample, never below ~target/2)
      if (nq > Similarity.AuditTargetQueries) {
        val sampled = nq / s
        assert(sampled <= Similarity.AuditTargetQueries + 1,
          s"nq=$nq stride=$s samples $sampled > target")
        assert(sampled >= Similarity.AuditTargetQueries / 2,
          s"nq=$nq stride=$s samples only $sampled")
      }
    }
    // the 10x bench corpus specifically: 22 queries, stride 1, all
    // replica residues represented (the ADVICE r19 #1 regression pin)
    assert(Similarity.auditStrideFor(22) == 1)
  }
}
