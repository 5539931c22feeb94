package graft

import graft.operators.VectorOps

/** q136's reason to exist, as an executable proof: a planted
  * CROSS-CELL paraphrase — eval doc near a cell boundary, its
  * paraphrase assigned just across it — is invisible to the probe=1
  * decontamination pass (q116's documented gap) and caught once the
  * eval doc probes its 2 nearest cells. */
class MultiProbeDeconSpec extends SparkSpec {
  import spark.implicits._

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
  }

  // geometry: centroids at 0° and 45°. The EVAL doc sits at 20° —
  // assigned to cell 0 (cos 20° > cos 25°) but close to the boundary.
  // The planted paraphrase sits at 30° — cosine to the eval doc is
  // cos 10° ≈ 0.985 (far above tau = 0.8) yet it assigns to cell 1.
  private lazy val cents =
    Seq((0L, unit(0), 1.0), (1L, unit(45), 1.0)).toDF("cell", "cv", "cnorm2")
  private lazy val tagged = Seq(
    (100L, unit(20), 1.0, 0L, "src0"), // eval doc (src0 = EvalSource), cell 0
    (200L, unit(30), 1.0, 1L, "srcT"), // cross-cell paraphrase, cell 1
    (201L, unit(90), 1.0, 1L, "srcT")) // unrelated train doc, cos 70° ≈ 0.34
    .toDF("vec_id", "e", "norm2", "cell", "source")

  test("cross-cell paraphrase is missed at probe=1") {
    assert(VectorOps.deconProbeCore(tagged, cents, probe = 1).collect().isEmpty)
  }

  test("cross-cell paraphrase is caught at probe=2, unrelated doc stays clean") {
    val rows = VectorOps.deconProbeCore(tagged, cents, probe = 2).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(200L))
    val r = rows.head
    assert(r.getLong(1) == 1L, "cluster_id is the train doc's own cell")
    assert(r.getLong(2) == 100L, "the eval doc is the witness")
    assert(math.abs(r.getDouble(3) - math.cos(math.toRadians(10))) < 1e-5)
    assert(r.getLong(4) == 1L)
  }
}
