package graft

import graft.operators.VectorOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The q114 monitoring → action loop, closed and measured: a drifted
  * delta must trigger VectorOps.retrainIfStale to refit and atomically
  * publish new centroids (snapshot pointer swap), and measured IVF
  * recall@1 must RECOVER to the q80 ≥ 0.9 floor — while a no-drift
  * delta is a provable no-op (same published version, nothing
  * written).
  *
  * Fixture geometry (deterministic): four old clusters along axes
  * e0..e3 of R⁴. The drift is adversarial for a stale quantizer: new
  * vectors arrive in PAIRS straddling the c0/c1 decision boundary at
  * direction (e0+e1)/√2 — each pair's two members are mutual nearest
  * neighbors (within-pair angle « cross-pair angle) but assign to
  * DIFFERENT stale cells, so a probe=1 search from one member scans
  * the wrong cell and misses its true NN: stale recall@1 collapses on
  * exactly the vectors the drift brought. After the refit (k=5; the
  * new cluster is seeded through the lowest-id init rule) the pair
  * members co-assign and recall recovers.
  */
class RetrainSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4

  private def vec(parts: (Int, Double)*): Seq[Double] = {
    val a = Array.fill(dims)(0.0)
    parts.foreach { case (i, x) => a(i) += x }
    val n = math.sqrt(a.map(x => x * x).sum)
    a.map(_ / n).toSeq
  }

  // deterministic tiny per-id wiggle in a given axis
  private def wig(id: Long, axis: Int, amp: Double): (Int, Double) =
    (axis, amp * (((id * 2654435761L) % 7).toDouble - 3.0) / 3.0)

  /** Old corpus: ids 0..3 seed clusters on e0..e3; ids 10..39 are 10
    * members each of clusters 0..2 (cluster 3 keeps just its seed). */
  private def storedRows: Seq[(Long, Seq[Double])] =
    (0 until 4).map(c => c.toLong -> vec(c -> 1.0)) ++
      (for (c <- 0 until 3; j <- 0 until 10) yield {
        val id = 10L + c * 10 + j
        id -> vec((c, 1.0), wig(id, (c + 1) % dims, 0.02))
      })

  /** Drifted delta: 12 boundary-straddling pairs at (e0+e1)/√2. Pair
    * p's members share a pair-specific offset in the e2/e3 plane
    * (evenly spaced angles, cross-pair separation >= 0.18) and differ only by ±δ along e0−e1
    * (within-pair separation ~0.11) — mutual NNs, different stale
    * cells. Id 4 is part of the delta so the k=5 refit's lowest-id
    * init seeds the new cluster. */
  private def driftRows: Seq[(Long, Seq[Double])] = {
    val delta = 0.04
    (0 until 12).flatMap { p =>
      val th = 2 * math.Pi * p / 12
      val off = Seq((2, 0.35 * math.cos(th)), (3, 0.35 * math.sin(th)))
      val a = vec(Seq((0, 1.0), (1, 1.0), (0, delta), (1, -delta)) ++ off: _*)
      val b = vec(Seq((0, 1.0), (1, 1.0), (0, -delta), (1, delta)) ++ off: _*)
      val idA = if (p == 0) 4L else 100L + 2 * p
      Seq(idA -> a, (101L + 2 * p) -> b)
    }
  }

  /** No-drift delta: more members of the same three old clusters, in
    * the same proportions. */
  private def calmRows: Seq[(Long, Seq[Double])] =
    for (c <- 0 until 3; j <- 0 until 4) yield {
      val id = 200L + c * 4 + j
      (id, vec((c, 1.0), wig(id, (c + 2) % dims, 0.02)))
    }

  private def frame(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "e")
      .withColumn("norm2", aggregate(zip_with(col("e"), col("e"), _ * _),
        lit(0.0), _ + _))

  /** Exact IVF probe=1 recall@1 of `queries` (corpus members; NN
    * excludes self) over `corpus` under `cents`. */
  private def recallAt1(corpus: DataFrame, queries: DataFrame, cents: DataFrame): Double = {
    def cos(ae: String, be: String, an: String, bn: String) =
      aggregate(zip_with(col(ae), col(be), _ * _), lit(0.0), _ + _) /
        (sqrt(col(an)) * sqrt(col(bn)))
    val asgC = VectorOps.kmAssign(corpus, cents)
      .select(col("vec_id").as("cid"), col("e").as("ce"),
        col("norm2").as("cn"), col("cell"))
    val asgQ = VectorOps.kmAssign(queries, cents)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("norm2").as("qn"), col("cell"))
    def top1(pairs: DataFrame): Map[Long, Long] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("c").desc, col("cid"))
      pairs.withColumn("c", cos("qe", "ce", "qn", "cn"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid")).toMap
    }
    val ivf = top1(asgQ.join(asgC, asgQ("cell") === asgC("cell") &&
      col("qid") =!= col("cid")))
    val brute = top1(asgQ.drop("cell").crossJoin(asgC.drop("cell"))
      .filter(col("qid") =!= col("cid")))
    brute.count { case (q, nn) => ivf.get(q).contains(nn) }.toDouble / brute.size
  }

  test("drifted corpus: flags fire, retrain publishes atomically, recall@1 recovers") {
    val dir = java.nio.file.Files.createTempDirectory("retrain").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    val stored = frame(storedRows)
    val delta = frame(driftRows)
    // initial index: k=4 fit on the stored corpus, published as v1
    val (asg0, cents0) = VectorOps.kmFitFull(stored, 4, intValued = false)
    asg0.unpersist()
    val v1 = store.writeSnapshot("silver", "centroids", cents0)
    assert(v1 == 1L)
    // the planted drift really is adversarial for the stale index:
    // probe=1 recall on the straddling pairs collapses under v1
    val all = frame(storedRows ++ driftRows)
    val staleRecall = recallAt1(all, delta, store.readSnapshot("silver", "centroids"))
    assert(staleRecall < 0.5, f"fixture not adversarial: stale recall $staleRecall%.2f")
    val out = VectorOps.retrainIfStale(store, "silver", "centroids",
      stored, delta, k = 5, intValued = false)
    assert(out.retrained && out.shiftedCells > 0, s"drift did not trigger: $out")
    assert(out.version == 2L, "retrain must publish a NEW snapshot version")
    assert(store.snapshotVersion("silver", "centroids").contains(2L))
    val freshRecall = recallAt1(all, delta, store.readSnapshot("silver", "centroids"))
    assert(freshRecall >= 0.9,
      f"recall@1 after retrain $freshRecall%.2f below the q80 0.9 floor (stale was $staleRecall%.2f)")
    // the old version stays pinned-readable (snapshot isolation)
    assert(store.readSnapshot("silver", "centroids", Some(1L)).count() == cents0.count())
  }

  test("no-drift corpus: retrainIfStale is a no-op, version unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("retrain-calm").toString
    val store = new graft.sources.LayerStore(spark, s"$dir/store")
    val stored = frame(storedRows)
    val (asg0, cents0) = VectorOps.kmFitFull(stored, 4, intValued = false)
    asg0.unpersist()
    store.writeSnapshot("silver", "centroids", cents0)
    val out = VectorOps.retrainIfStale(store, "silver", "centroids",
      stored, frame(calmRows), k = 4, intValued = false)
    assert(!out.retrained && out.shiftedCells == 0L, s"calm delta retrained: $out")
    assert(out.version == 1L &&
      store.snapshotVersion("silver", "centroids").contains(1L))
  }
}
