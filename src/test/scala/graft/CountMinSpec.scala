package graft

import graft.functions.CountMin
import org.apache.spark.sql.functions._

/** The count-min sketch's contract: never undercounts, merge of
  * per-split sketches equals the one-pass sketch (the 100 TB
  * profile-per-split path), and the overcount stays within the
  * published εN bound on real data. */
class CountMinSpec extends SparkSpec {

  private lazy val toks = Tables.t(spark, sf0001, "documents")
    .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  test("estimate never undercounts, and overcount respects the eps*N bound") {
    val depth = 4; val width = 512 // narrow width to force collisions
    val sk = CountMin.sketch(toks, col("term"), depth, width).persist()
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_cnt"))
    val n = toks.count()
    val est = CountMin.estimate(sk, exact, col("term"), depth, width)
    val j = exact.join(est, exact("term") === est("key"))
      .select(col("exact_cnt"), col("cm_estimate")).collect()
    assert(j.nonEmpty)
    // every key the stream contains gets an estimate
    assert(j.length == exact.count())
    val overs = j.map(r => r.getLong(1) - r.getLong(0))
    assert(overs.forall(_ >= 0), "count-min must never undercount")
    // ε = e/width; P[over > εN] ≤ e^-depth per key, so allow a small
    // tail: 99% of keys within εN, every key within 5εN
    val epsN = math.E / width * n
    val within = overs.count(_ <= epsN)
    assert(within >= overs.length * 0.99,
      s"only $within/${overs.length} keys within epsN=$epsN")
    assert(overs.max <= 5 * epsN, s"max overcount ${overs.max} > 5*epsN=${5 * epsN}")
    sk.unpersist(); ()
  }

  test("absent keys estimate through their EMPTY buckets, not only collisions") {
    import spark.implicits._
    val depth = 4; val width = 512
    val sk = CountMin.sketch(toks, col("term"), depth, width).persist()
    // probe keys the stream cannot contain (tokens are split on space)
    val absent = (0 until 200).map(i => s"__absent token ${i}__").toDF("term")
    val est = CountMin.estimate(sk, absent, col("term"), depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every probed key gets a row (the old inner join dropped keys
    // whose every bucket was empty, and INFLATED keys with partial
    // collisions by ignoring their empty buckets)
    assert(est.size == 200)
    // with 512x4 mostly-sparse counters, virtually every absent key
    // has at least one empty bucket -> estimate 0; allow the rare
    // all-four-collide key its legitimate epsN overcount
    val zeros = est.values.count(_ == 0L)
    assert(zeros >= 190, s"only $zeros/200 absent keys estimated 0 — " +
      "empty buckets are not reaching the min")
    sk.unpersist(); ()
  }

  test("merged per-split sketches equal the one-pass sketch") {
    val depth = 3; val width = 256
    val a = toks.filter(col("doc_id") % 2 === 0)
    val b = toks.filter(col("doc_id") % 2 === 1)
    val merged = CountMin.merge(
      CountMin.sketch(a, col("term"), depth, width),
      CountMin.sketch(b, col("term"), depth, width))
    val onePass = CountMin.sketch(toks, col("term"), depth, width)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("j"), col("b"), col("cnt").cast("long"))
        .orderBy(col("j"), col("b")).collect().toSeq
    assert(rows(merged) == rows(onePass))
  }

  test("streaming sketch == batch sketch (complete-mode aggregation)") {
    // sketch() is a plain aggregation plan, so it runs unchanged as a
    // Structured Streaming complete-mode query — counter state is
    // bounded at depth×width rows no matter how long the stream runs
    val depth = 3; val width = 256
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    toks.select(col("term")).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = CountMin.sketch(stream, col("term"), depth, width)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("j"), col("b"), col("cnt").cast("long"))
        .orderBy(col("j"), col("b")).collect().toSeq
    assert(rows(spark.table("cms_out")) ==
      rows(CountMin.sketch(toks, col("term"), depth, width)))
  }

  test("merge is associative across three splits") {
    val depth = 2; val width = 128
    val parts = (0 until 3).map(i =>
      CountMin.sketch(toks.filter(col("doc_id") % 3 === i), col("term"), depth, width))
    val leftFold = CountMin.merge(CountMin.merge(parts(0), parts(1)), parts(2))
    val rightFold = CountMin.merge(parts(0), CountMin.merge(parts(1), parts(2)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("j"), col("b"), col("cnt").cast("long"))
        .orderBy(col("j"), col("b")).collect().toSeq
    assert(rows(leftFold) == rows(rightFold))
  }
}
