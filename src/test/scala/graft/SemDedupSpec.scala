package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** SemDeDup (cluster-blocked semantic dedup) must equal an
  * independently-constructed ground truth: exact ALL-pairs cosine at
  * the threshold (no blocking join), restricted to same-cell after
  * the fact, closed with a driver-side union-find. The production
  * path's blocked self-join + distributed components must reproduce
  * that verdict set exactly on a corpus with planted near-dup
  * structure — and the planted copies are the non-vacuity proof: a
  * copy landing in its source's cell MUST be dropped. */
class SemDedupSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("semdedup equals same-cell exact ground truth on a planted corpus") {
    val raw = Dedup.augmentedEmbeddings(spark, d)
    val e = Similarity.withNorm(raw).localCheckpoint(true)
    val cents = Similarity.trainCentroids(e)
    val got = Dedup.semDedupOn(e, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    val cells = Similarity.assignCells(e, Similarity.centroidArray(cents))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.exactNearDupPairs(raw, Dedup.SemDedupThreshold)
      .select(col("va"), col("vb")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cells(a) == cells(b) }
    // union-by-min: each union points the larger root at the smaller,
    // so every component's root IS its minimum id — the rep contract
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exact.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = got.map { case (v, c, _, _) => (v, c, find(v), find(v) == v) }
    assert(got.toSeq == want.toSeq,
      s"semdedup diverged from exact same-cell ground truth: " +
        s"${got.toSeq.diff(want.toSeq).take(5)} vs ${want.toSeq.diff(got.toSeq).take(5)}")
    assert(got.exists(!_._4), "vacuous: no drop verdicts on the planted corpus")

    // every planted copy sharing its source's cell is a true >= 0.7
    // near-dup pair the blocking CAN see — it must be dropped, with
    // the rep chain ending at (or below) the source id
    val sameCellPlants = got.filter { case (v, c, _, _) =>
      v >= Dedup.PlantIdOffset && cells.get(v - Dedup.PlantIdOffset).contains(c)
    }
    assert(sameCellPlants.nonEmpty,
      "no planted copy landed in its source's cell — drop assertion is vacuous")
    assert(sameCellPlants.forall { case (v, _, rep, keep) =>
      !keep && rep <= v - Dedup.PlantIdOffset
    }, s"planted same-cell copy not dropped: ${sameCellPlants.filter(_._4).take(5)}")
  }

  test("qSemDedup verdict invariants on the base corpus") {
    val rows = Dedup.qSemDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = Tables.embeddings(spark, d).count()
    assert(rows.length == n, s"expected one verdict per vector: ${rows.length} vs $n")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate vec_id verdicts")
    val byId = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (v, _, rep, keep) =>
      assert(keep == (rep == v), s"keep flag inconsistent for $v")
      assert(rep <= v, s"rep $rep above its member $v (min-id contract)")
      assert(byId(rep)._4, s"representative $rep of $v is itself dropped")
    }
  }
}
