package graft

import org.apache.spark.sql.functions._

/** q159's contract vs q95 (round-12 ask #5): the sketch-cutpoint
  * quartiles may disagree with the exact global ntile only at bucket
  * BOUNDARIES — by at most one quartile, and only for a bounded
  * fraction of customers. Two disagreement sources, both bounded:
  * sampling error of the K=1024 nearest-rank cutpoints (DKW: rank
  * error ≲ 4% at 95% confidence), and tie-runs at a cutpoint value
  * (ntile splits a run of equal values across buckets by the custkey
  * tiebreak; the value-threshold variant keeps the whole run in one
  * bucket — the correct behavior for a value-based segmenter, and
  * the dominant term for the small-integer frequency metric). */
class RfmSketchSpec extends SparkSpec {

  test("q159 sketch quartiles track q95 exact ntile within boundary error") {
    val exact = operators.Eda.rfmSegments(spark, sf0001)
      .select(col("custkey"), col("r_quartile").as("re"),
        col("f_quartile").as("fe"), col("m_quartile").as("me"))
    val sketch = operators.Eda.rfmSketchSegments(spark, sf0001)
      .select(col("custkey"), col("r_quartile").as("rs"),
        col("f_quartile").as("fs"), col("m_quartile").as("ms"))
    val j = exact.join(sketch, "custkey").cache()
    val n = j.count().toDouble
    assert(n > 0)
    // never off by more than one quartile, on any dimension
    val off2 = j.filter(
      abs(col("re") - col("rs")) > 1 || abs(col("fe") - col("fs")) > 1 ||
        abs(col("me") - col("ms")) > 1).count()
    assert(off2 == 0, s"$off2 customers drifted >1 quartile — cutpoints are wrong, not boundary noise")
    // agreement floors: distinct-valued metrics (recency/monetary) are
    // sampling-error-only; frequency carries the tie-run term
    def agree(e: String, s: String): Double =
      j.filter(col(e) === col(s)).count() / n
    assert(agree("re", "rs") >= 0.90, s"recency agreement ${agree("re", "rs")}")
    assert(agree("me", "ms") >= 0.90, s"monetary agreement ${agree("me", "ms")}")
    assert(agree("fe", "fs") >= 0.70, s"frequency agreement ${agree("fe", "fs")}")
    j.unpersist()
  }
}
