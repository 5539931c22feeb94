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
}
