package graft

import graft.operators.TextOps

/** q137's recall claim, executed: a true shingle subset is ALWAYS
  * found (every bottom-k probe of the contained doc hits the
  * container — the asymmetric pigeonhole), even when the pair's
  * Jaccard is far below anything MinHash-LSH banding would surface. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("a low-Jaccard true subset is recalled with containment 1.0") {
    // doc 1: 10 shingles, ALL inside doc 2's 100 → Jaccard 0.1 (q22's
    // banding would almost surely miss it), containment exactly 1.
    // doc 3: 10 shingles disjoint from both.
    val sh = ((1 to 10).map(i => (1L, f"s$i%03d")) ++
      (1 to 100).map(i => (2L, f"s$i%03d")) ++
      (1 to 10).map(i => (3L, f"x$i%03d"))).toDF("doc_id", "s")
    val out = TextOps.containmentOver(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // the subset direction is found, exact
    val r12 = out((1L, 2L))
    assert(r12.getAs[Long]("inter") == 10 && r12.getAs[Double]("containment") == 1.0)
    assert(r12.getAs[Boolean]("is_full_subset"))
    assert(r12.getAs[Double]("jaccard") == 0.1)
    // the reverse direction (100-shingle doc into the 10-shingle one)
    // is below tau=0.5 and correctly absent; so is the disjoint doc
    assert(!out.contains((2L, 1L)) && !out.keySet.exists(_._1 == 3L)
      && !out.keySet.exists(_._2 == 3L))
  }

  test("partial containment reports the exact ratio both directions") {
    // A: 8 shingles, 6 shared with B (10 shingles): cont(A→B)=0.75,
    // cont(B→A)=0.6 — both ≥ tau, both reported, asymmetric
    val sh = ((1 to 8).map(i => (10L, f"s$i%03d")) ++
      ((3 to 8) ++ (101 to 104)).map(i => (20L, f"s$i%03d"))).toDF("doc_id", "s")
    val rows = TextOps.containmentOver(sh).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("containment")).toMap
    assert(rows((10L, 20L)) == 0.75)
    assert(rows((20L, 10L)) == 0.6)
  }
}
