package graft

import graft.operators.TextOps

/** q144 — leakage-safe split assignment: the property that justifies
  * the operator is that NO verified near-dup pair straddles a split
  * (the exact failure q119 audits for), and that the coin is the
  * documented deterministic function of the CLUSTER id, not the doc
  * id. */
class SplitAssignSpec extends SparkSpec {
  import spark.implicits._

  /** The keyed coin, recomputed independently of the library (the
    * TextFunctions.permilleBucket contract for small non-negative
    * ids). */
  private def bucket(id: Long): Long =
    ((id >> 31) * 1103515245L % 1000 + (id & 0x7fffffffL) * 2654435761L % 1000) % 1000

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("split_spec").toString
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      // docs 1 and 2: identical -> Jaccard 1.0, one cluster
      (1L, dup, "en", "srcA", 60L),
      (2L, dup, "en", "srcB", 60L),
      // docs 3..6: mutually unrelated singleton clusters
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "srcA", 50L),
      (4L, "one two three four five six seven eight nine ten", "en", "srcB", 50L),
      (5L, "red orange yellow green blue indigo violet pink black white", "en", "srcA", 50L),
      (6L, "north south east west up down left right front back", "en", "srcB", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("near-dup pairs never straddle splits; the coin is cluster-keyed") {
    val rows = TextOps.splitAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "every doc gets exactly one row")
    // the planted near-dup pair shares a cluster AND a split
    assert(rows(1L).getLong(2) == 1L && rows(2L).getLong(2) == 1L)
    assert(rows(1L).getString(4) == rows(2L).getString(4),
      "near-duplicates must land in the same split")
    assert(rows(1L).getLong(3) == 2L, "cluster size carries through")
    // every split is the deterministic function of the CLUSTER id
    for ((id, r) <- rows) {
      val b = bucket(r.getLong(2))
      val expect = if (b < 900) "train" else if (b < 950) "val" else "test"
      assert(r.getString(4) == expect, s"doc $id: split must be the cluster coin")
      assert(Set("train", "val", "test").contains(r.getString(4)))
    }
    // singletons keep their own cluster
    for (id <- Seq(3L, 4L, 5L, 6L))
      assert(rows(id).getLong(2) == id && rows(id).getLong(3) == 1L)
  }
}
