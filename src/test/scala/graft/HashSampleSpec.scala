package graft

import graft.functions.HashSample
import org.apache.spark.sql.functions._

/** The bottom-k hash-sample quantile sketch (q88 + functions.HashSample):
  * determinism under repartitioning, split-merge associativity (the 100 TB
  * fold path), the DKW rank-error bound realized on real data, and parity
  * between the production API and the q88 query's inlined arithmetic. */
class HashSampleSpec extends SparkSpec {

  private def lineitem = Tables.t(spark, sf0001, "lineitem")
  private def key = concat(col("l_orderkey").cast("string"), lit("|"),
    col("l_linenumber").cast("string"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame, k: Int = HashSample.DefaultK) =
    HashSample.sketch(df, key, col("l_extendedprice"), k)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getDouble(1)))

  test("sketch is a pure function of the data — partitioning-independent") {
    val a = pairsOf(lineitem)
    val b = pairsOf(lineitem.repartition(13, col("l_partkey")))
    assert(a == b)
  }

  test("merging disjoint split sketches == one-pass sketch (associative fold)") {
    val k = 256
    val whole = pairsOf(lineitem, k)
    // three disjoint splits by orderkey residue — sketch each, fold pairwise
    val parts = (0 to 2).map(r =>
      HashSample.sketch(lineitem.filter(col("l_orderkey") % 3 === r),
        key, col("l_extendedprice"), k).withColumnRenamed("pairs", s"p$r"))
    val folded = parts.reduce(_ crossJoin _)
      .select(HashSample.merge(HashSample.merge(col("p0"), col("p1"), k), col("p2"), k).as("pairs"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getDouble(1)))
    // and in the other association order — same result (associativity)
    val folded2 = parts.reduce(_ crossJoin _)
      .select(HashSample.merge(col("p0"), HashSample.merge(col("p1"), col("p2"), k), k).as("pairs"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(folded == whole)
    assert(folded2 == whole)
  }

  test("q88 realized rank error stays inside the DKW envelope") {
    // K = 1024 -> ~3% expected rank error; assert a 3x slack bound so
    // the test pins the MECHANISM (estimates land near their target
    // rank) without flaking on one unlucky column
    val rows = graft.operators.Eda.sampleQuantiles(spark, sf0001).collect()
    assert(rows.length == 10) // 2 columns x 5 probabilities
    rows.foreach { r =>
      val err = r.getAs[Double]("rank_error")
      assert(err <= 0.10, s"${r.getAs[String]("column_name")} p=${r.getAs[Double]("quantile_p")} rank_error=$err")
    }
    // duplicate-heavy column (l_quantity has ~50 distinct values):
    // realized rank may legitimately OVERSHOOT p (nearest-rank on ties
    // includes the whole tie run) but must never undershoot the
    // sample-rank guarantee by more than the envelope
    val n = rows.map(_.getAs[Long]("sample_n")).distinct.toSeq
    assert(n == Seq(math.min(1024, lineitem.count())))
  }

  test("quantileBuckets approx=sample dial: same schema, near-exact buckets") {
    val l = lineitem
    val exact = graft.operators.Eda.quantileBucketsOver(l)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val approx = graft.operators.Eda.quantileBucketsOver(l, approxSample = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.keySet == exact.keySet)
    val total = exact.values.sum
    // thresholds land within ~1/sqrt(K) in rank space (DKW), so each
    // bucket's row share moves by at most that envelope (3x slack;
    // l_quantity's heavy ties can snap a threshold one value over)
    for ((b, n) <- exact) {
      val d = math.abs(approx(b) - n).toDouble / total
      assert(d <= 0.10, s"bucket $b: exact=$n approx=${approx(b)} drift=$d")
    }
  }

  test("HashSample.quantiles API matches q88's inlined estimates") {
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val api = HashSample.quantiles(lineitem, key, col("l_extendedprice"), ps)
      .select(explode(col("quantiles")).as("q"))
      .select(col("q.p"), col("q.estimate"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    val q88 = graft.operators.Eda.sampleQuantiles(spark, sf0001)
      .filter(col("column_name") === "l_extendedprice")
      .select(col("quantile_p"), col("estimate"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(api == q88)
  }
}
