package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the round-13 additions beyond their oracle
  * hashes: q163's perceptual image near-dup through the REAL PNG
  * encode→decode round trip (pairs stay within their planted variant
  * groups, banded recall bound honored), and q164's t-closeness EMD
  * pinned to hand-computed exact values on a planted skewed group. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("q163: image near-dup pairs stay within planted variant groups via the real codec") {
    // 8 docs = 2 groups of 4 (group = doc_id DIV 4): the fixture
    // perturbs one pixel per non-zero group member, so near-dup pairs
    // exist within groups; distinct groups' md5-random images sit ~32
    // bits apart and must never pair at Hamming ≤ 7
    val dir = java.nio.file.Files.createTempDirectory("r13_img").toString
    (0L until 8L).map(i => (i, s"doc$i", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Multimodal.imageNearDupPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "planted single-pixel variants produced no near-dup pairs")
    assert(pairs.forall(p => p._1 / 4 == p._2 / 4),
      s"a cross-group pair slipped under Hamming 7: ${pairs.filter(p => p._1 / 4 != p._2 / 4).toSeq}")
    assert(pairs.forall(_._3 <= 7), "a pair above the banded-recall bound")
    // a one-pixel perturbation moves few aHash bits: the base-variant
    // pairs (doc 0 vs its group) sit at small Hamming
    assert(pairs.exists(p => p._1 % 4 == 0 && p._3 <= 3),
      s"single-pixel variants unexpectedly far from their base: ${pairs.toSeq}")
  }

  test("q164: planted skewed group takes its exact hand-computed EMD") {
    // corpus: group (1, X) uniform over the four balance bands (10
    // each), group (2, Y) all in the top band (12 users). N = 52,
    // corpus cums (10, 20, 30). Exact integer numerators:
    //   A: |10·52−10·40| + |20·52−20·40| + |30·52−30·40| = 120+240+360
    //      → 720 / (40·52·3) = 0.11538461…
    //   B: |0−10·12| + |0−20·12| + |0−30·12| = 720 / (12·52·3)
    //      → 0.38461538…
    val bals = Seq(-5.0, 100.0, 5000.0, 9000.0)
    val rows =
      (0 until 40).map(i => (1, "X", bals(i % 4))) ++
      (0 until 12).map(_ => (2, "Y", 9000.0))
    val dir = java.nio.file.Files.createTempDirectory("r13_tclose").toString
    rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = graft.operators.Eda.tCloseness(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out((1, "X")) == ((40L, 0.115385, true, false)),
      s"uniform-ish group: ${out((1, "X"))}")
    assert(out((2, "Y")) == ((12L, 0.384615, false, true)),
      s"skewed group must be at_risk (k-released, t-far): ${out((2, "Y"))}")
  }
}
