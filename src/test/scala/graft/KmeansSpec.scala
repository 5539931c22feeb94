package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Behavioral invariants of the k-means fit (q108) and SemDeDup
  * (q109) beyond the oracle hash: partition totals, Lloyd coherence,
  * and the guarantee that exact-duplicate documents are caught. */
class KmeansSpec extends SparkSpec {

  test("q108 assignment partitions the collection and coheres") {
    val out = VectorOps.kmeansClusters(spark, sf0001).collect()
    val total = Tables.t(spark, sf0001, "embeddings").count()
    assert(out.length <= 8, "more clusters than K")
    assert(out.map(_.getAs[Long]("n_vectors")).sum == total,
      "assignment must partition every vector into exactly one cluster")
    // cosine-argmax assignment to a cell's own centroid is positive
    // for any non-degenerate cell on this fixture
    assert(out.forall(_.getAs[Double]("mean_cos") > 0.0),
      "a Lloyd-refined cell lost coherence entirely")
  }

  test("q109 equals an independent brute-force within-cluster reference") {
    // the distributed plan vs a driver-side Scala re-derivation of the
    // SemDeDup rule over the SAME assignment: all within-cell pairs
    // brute-forced (500 docs — feasible here, the very thing the
    // operator avoids at scale), identical fold order and snap rule
    def snap(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s + 4, BigDecimal.RoundingMode.HALF_UP)
        .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val asg = VectorOps.docKmeansAssignment(spark, sf0001)
      .select(col("vec_id"), col("e"), col("norm2"), col("cell"), col("csim"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Double]]("e").toArray,
        r.getAs[Double]("norm2"), r.getAs[Long]("cell"),
        snap(r.getAs[Double]("csim"), 8)))
    val expected = scala.collection.mutable.Map[Long, (Long, Double)]()
    for {
      (_, members) <- asg.groupBy(_._4)
      p <- members
      q <- members if q._1 != p._1
    } {
      val dot = p._2.indices.foldLeft(0.0)((acc, i) => acc + p._2(i) * q._2(i))
      val cos = dot / (math.sqrt(p._3) * math.sqrt(q._3))
      val better = q._5 < p._5 || (q._5 == p._5 && q._1 < p._1)
      if (cos >= 0.9 && better) {
        val keep = expected.get(p._1) match {
          case Some((bq, bc)) => cos > bc || (cos == bc && q._1 < bq)
          case None => true
        }
        if (keep) expected(p._1) = (q._1, cos)
      }
    }
    assert(expected.nonEmpty, "fixture lost its near-duplicate documents")
    val out = VectorOps.semDedup(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_of"), r.getAs[Double]("cosine")))).toMap
    assert(out.keySet == expected.keys.toSet,
      s"drop sets differ: extra=${(out.keySet -- expected.keys).toSeq.sorted} " +
        s"missing=${(expected.keys.toSet -- out.keySet).toSeq.sorted}")
    for ((id, (bq, bc)) <- expected) {
      assert(out(id)._1 == bq, s"doc $id: dup_of ${out(id)._1} != expected $bq")
      assert(out(id)._2 == snap(bc, 6), s"doc $id: cosine mismatch")
    }
  }

  test("q109 never drops a document twice and never self-references") {
    val out = VectorOps.semDedup(spark, sf0001).collect()
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "duplicate drop rows")
    assert(out.forall(r => r.getAs[Long]("doc_id") != r.getAs[Long]("dup_of")),
      "a document recorded as its own duplicate")
    assert(out.forall(_.getAs[Double]("cosine") >= 0.9),
      "a drop below the SemDeDup threshold")
  }

  test("SRP-bucketed assignment (the q109 scale dial) matches the flat sampled fit") {
    import spark.implicits._
    // the ScalingWitness clustered-embedding shape: tight clusters of
    // 5 around well-separated sparse centers — a doc and its center
    // agree on nearly every SRP bit, so the bucketed probe recovers
    // the exact argmax centroid for every vector (and any bucketless
    // vector falls back to the exact full-K scan, so equality is the
    // invariant, not a recall floor)
    // id % nC layout (the ScaleSpec purity-test shape): the sampled
    // Lloyd fit converges to one pure centroid per planted cluster,
    // so every vector sits a hair from its own centroid — the regime
    // SemDeDup's K ∝ N cells put a real corpus in
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val n = 600
    val nC = 16
    val base = (0 until n).map { i =>
      val c = i % nC
      val v = (0 until 64).map { d =>
        val m = mix(c.toLong * 64 + d)
        val amp = (1.0 + ((m >>> 10) & 3) * 0.25) *
          (if (((m >>> 13) & 1) == 0) 1.0 else -1.0)
        val center = if (((m >>> 7) & 7) == 0) amp else 0.0
        center + (mix(i.toLong * 7919 + d) % 1009) * 2e-5
      }
      (i.toLong, v, v.map(x => x * x).sum)
    }.toDF("vec_id", "e", "norm2")
    val flat = VectorOps.kmFitSampled(base, 16, 300L, intValued = false)
      .select("vec_id", "cell", "csim").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val srp = VectorOps.kmFitSampledSrp(base, 16, 300L, intValued = false,
      rowsPerBand = 8)
      .select("vec_id", "cell", "csim").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(srp.keySet == flat.keySet, "SRP assignment lost or duplicated vectors")
    val disagree = flat.collect { case (id, fc) if srp(id) != fc => id }.toSeq.sorted
    assert(disagree.isEmpty,
      s"SRP-bucketed assignment diverged from the flat fit on ${disagree.size} vectors: ${disagree.take(10)}")
  }

  test("SRP-bucketed assignment requires a fit-sized sample") {
    import spark.implicits._
    val base = (0 until 8).map(i =>
      (i.toLong, Seq.fill(64)(1.0), 64.0)).toDF("vec_id", "e", "norm2")
    intercept[IllegalArgumentException] {
      VectorOps.kmFitSampled(base, 16, 8L, intValued = false)
    }
    intercept[IllegalArgumentException] {
      VectorOps.kmFitSampledSrp(base, 16, 8L, intValued = false, rowsPerBand = 8)
    }
  }
}
