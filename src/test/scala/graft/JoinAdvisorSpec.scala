package graft

import graft.util.JoinAdvisor
import org.apache.spark.sql.functions._

/** The KMV join advisor is load-bearing: its estimates are accurate
  * enough to plan with, the broadcast/shuffle decision flips exactly
  * at the budget threshold, and the decided strategy is the one that
  * actually appears in the executed plan. */
class JoinAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (0L until 20000L).map(i => (i, i % 4000)).toDF("id", "key")
  private lazy val smallKeys = (0L until 50L).toDF("key")
  private lazy val bigKeys = (0L until 4000L).toDF("key")

  test("distinct estimates: exact below K, ~6% RSE above") {
    val a = JoinAdvisor.advise(fact, Seq(fact("key")), smallKeys, Seq(smallKeys("key")))
    assert(a.rightKeys == 50.0, "sub-K sets are exact")
    assert(math.abs(a.leftKeys - 4000) / 4000 < 0.2,
      s"fact-side estimate ${a.leftKeys} off by >20% of 4000")
  }

  test("intersection estimate from shared minima (the q131 algebra)") {
    val x = (0L until 1000L).toDF("key")
    val y = (500L until 1500L).toDF("key")
    val a = JoinAdvisor.advise(x, Seq(x("key")), y, Seq(y("key")))
    // |A∪B| = 1500, |A∩B| = 500, J = 1/3 — K=256 sketch, ~6.3% RSE,
    // plus binomial noise on rho: generous 25% tolerance
    assert(math.abs(a.unionKeys - 1500) / 1500 < 0.2, s"union ${a.unionKeys}")
    assert(math.abs(a.jaccard - 1.0 / 3) < 0.1, s"jaccard ${a.jaccard}")
    assert(math.abs(a.intersectionKeys - 500) / 500 < 0.25,
      s"intersection ${a.intersectionKeys}")
  }

  test("the decision flips exactly at the broadcast budget") {
    val below = JoinAdvisor.advise(fact, Seq(fact("key")),
      smallKeys, Seq(smallKeys("key")), broadcastMaxKeys = 51)
    val above = JoinAdvisor.advise(fact, Seq(fact("key")),
      smallKeys, Seq(smallKeys("key")), broadcastMaxKeys = 49)
    assert(below.buildSide == "right" && below.broadcastBuild)
    assert(above.buildSide == "right" && !above.broadcastBuild)
  }

  test("advised semi-join: the decided strategy appears in the executed plan") {
    // small key frame -> broadcast path
    val b = JoinAdvisor.advisedSemiJoin(fact, Seq("key"), smallKeys)
    val bPlan = b.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"), s"expected broadcast:\n$bPlan")
    assert(!bPlan.contains("SortMergeJoin"))
    // over-budget key frame -> pinned merge join, even though Catalyst's
    // own size estimate for this tiny frame would have broadcast it
    val m = JoinAdvisor.advisedSemiJoin(fact, Seq("key"), bigKeys,
      broadcastMaxKeys = 1000)
    val mPlan = m.queryExecution.executedPlan.toString
    assert(mPlan.contains("SortMergeJoin"), s"expected merge join:\n$mPlan")
    assert(!mPlan.contains("BroadcastHashJoin"))
    // both shapes compute the same relation, in df's column order
    assert(b.columns.toSeq == fact.columns.toSeq)
    assert(b.count() == 50 * 5)          // 5 fact rows per key
    assert(m.count() == fact.count())    // every key matches
    val viaPlain = fact.join(bigKeys, Seq("key"), "left_semi")
      .select(fact.columns.map(col): _*).collect().map(_.toSeq).toSet
    assert(m.collect().map(_.toSeq).toSet == viaPlain)
  }

  test("persisted key sketches: zero-scan advice, table reads unaffected, dies with rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("advisor-store").toString
    val store = new graft.sources.LayerStore(spark, dir)
    store.write("silver", "facts", fact)
    store.writeKeySketch("silver", "facts", Seq("key"))
    // the sidecar does not disturb parquet reads
    assert(store.table("silver", "facts").count() == 20000)
    // stored-sketch advice == scanning advice (same minima, same k)
    val Some((k, stored)) = store.keySketch("silver", "facts", Seq("key"))
    val scanned = graft.util.JoinAdvisor.minima(fact, Seq(fact("key")))
    assert(stored == scanned)
    val viaStore = graft.util.JoinAdvisor.adviseFromMinima(
      stored, graft.util.JoinAdvisor.minima(smallKeys, Seq(smallKeys("key"))), k = k)
    val viaScan = graft.util.JoinAdvisor.advise(
      fact, Seq(fact("key")), smallKeys, Seq(smallKeys("key")))
    assert(viaStore == viaScan)
    // a rewrite drops the sidecar — a sketch cannot outlive its data
    store.write("silver", "facts", fact.limit(10))
    assert(store.keySketch("silver", "facts", Seq("key")).isEmpty)
  }

  test("sidecar-advised semi-join plans with ZERO scan jobs, same decisions") {
    // job accounting: a listener counts every job submitted while the
    // advisor plans (not executes) the semi-join. The scanning form
    // must pay its minima collect; the sidecar form must pay nothing.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // pre-compute the sidecar minima OUTSIDE the counted window (the
    // write-time sketch a deployment pays once at ingest)
    val smallMinima = JoinAdvisor.minima(smallKeys, Seq(smallKeys("key")))
    val bigMinima = JoinAdvisor.minima(bigKeys, Seq(bigKeys("key")))
    spark.sparkContext.addSparkListener(listener)
    try {
      val viaSidecarB = JoinAdvisor.advisedSemiJoinFromMinima(
        fact, Seq("key"), smallKeys, smallMinima)
      val viaSidecarM = JoinAdvisor.advisedSemiJoinFromMinima(
        fact, Seq("key"), bigKeys, bigMinima, broadcastMaxKeys = 1000)
      // force plan resolution (still no execution, no job)
      val pB = viaSidecarB.queryExecution.executedPlan.toString
      val pM = viaSidecarM.queryExecution.executedPlan.toString
      Thread.sleep(500) // let any stray async job event land
      assert(jobs.get() == 0,
        s"sidecar-advised planning launched ${jobs.get()} Spark job(s); must be zero")
      // decisions unchanged vs the scanning form
      assert(pB.contains("BroadcastHashJoin") && !pB.contains("SortMergeJoin"))
      assert(pM.contains("SortMergeJoin") && !pM.contains("BroadcastHashJoin"))
      // ...and the scanning form DOES launch its sketch job
      JoinAdvisor.advisedSemiJoin(fact, Seq("key"), smallKeys)
      val deadline = System.currentTimeMillis() + 5000
      while (jobs.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(jobs.get() >= 1, "scanning advise should have launched its minima job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("multi-column keys sketch and scope correctly") {
    val df = Seq((1L, "a", 10.0), (1L, "b", 20.0), (2L, "a", 30.0))
      .toDF("k1", "k2", "v")
    val keyFrame = Seq((1L, "a"), (2L, "a")).toDF("k1", "k2")
    val out = JoinAdvisor.advisedSemiJoin(df, Seq("k1", "k2"), keyFrame)
    assert(out.columns.toSeq == Seq("k1", "k2", "v"))
    assert(out.collect().map(_.getDouble(2)).sorted.toSeq == Seq(10.0, 30.0))
  }
}
