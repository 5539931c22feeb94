package graft

import graft.operators.EventOps
import graft.plans.{AsOf, AsOfJoinExec}
import org.apache.spark.sql.functions._

/** The native as-of operator (custom LogicalPlan + Strategy +
  * SparkPlan): equivalence with the composed union+window form on
  * real data, plan shape, and the semantic edge cases — unmatched
  * rows, inclusive time ties, tiebreak determinism, key boundaries
  * across the merge cursor. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of equals the composed q46 on the events table") {
    val composed = EventOps.asofJoin(spark, sf0001).collect().toSeq
    val native = EventOps.asofJoinNative(spark, sf0001).collect().toSeq
    assert(native == composed)
  }

  test("the plan merges with an exchange and a (keys, time) sort per side") {
    val df = EventOps.asofJoinNative(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(400))
    // EnsureRequirements must have materialized the operator's
    // required distribution and ordering: a hash exchange and a sort
    // per child (a regression to UnspecifiedDistribution would merge
    // unsorted, un-co-partitioned children and still name-match)
    def n(p: String) = p.r.findAllIn(plan).size
    assert(n("Exchange hashpartitioning") >= 2, plan.take(800))
    assert(n("\\+- Sort ") >= 2, plan.take(800))
  }

  test("mismatched key arity is rejected, not silently truncated") {
    val l = Seq((1L, 2L, java.sql.Timestamp.valueOf("2020-01-01 10:00:00")))
      .toDF("k1", "k2", "t")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 09:00:00"), 5.0))
      .toDF("rk1", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(l, r, Seq("k1", "k2"), Seq("rk1"), "t", "rt")
    }
    assert(e.getMessage.contains("arity"))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("unmatched lefts are NULL, ties are inclusive, latest tiebreak wins") {
    val probes = Seq(
      (1L, 10L, ts("2020-01-01 10:00:00")), // before any ref -> NULL
      (2L, 10L, ts("2020-01-01 12:00:00")), // ties ref at 12:00 -> inclusive
      (3L, 10L, ts("2020-01-01 13:00:00")), // after both -> latest
      (4L, 99L, ts("2020-01-01 12:00:00"))) // key with no refs -> NULL
      .toDF("pid", "user_id", "pts")
    val refs = Seq(
      (100L, 10L, ts("2020-01-01 12:00:00")),
      (101L, 10L, ts("2020-01-01 12:00:00")), // same ts: higher id wins
      (102L, 10L, ts("2020-01-01 12:30:00")),
      (103L, 11L, ts("2020-01-01 09:00:00"))) // other key, must not leak
      .toDF("vid", "v_user_id", "vts")
    val out = AsOf.join(probes, refs, Seq("user_id"), Seq("v_user_id"),
        "pts", "vts", rightTiebreak = Seq("vid"))
      .select(col("pid"), col("vid")).orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((1L, -1L), (2L, 101L), (3L, 102L), (4L, -1L)))
  }

  test("merge cursor resets across key groups in one partition") {
    // keys hash anywhere; with 1 ref row per key the candidate from a
    // previous key group must never satisfy the next group
    val probes = (1L to 40L).map(k => (k, k, ts("2020-01-02 00:00:00")))
      .toDF("pid", "user_id", "pts")
    val refs = (1L to 40L).filter(_ % 2 == 0)
      .map(k => (k * 1000, k, ts("2020-01-01 00:00:00")))
      .toDF("vid", "v_user_id", "vts")
    val out = AsOf.join(probes, refs, Seq("user_id"), Seq("v_user_id"),
        "pts", "vts")
      .select(col("pid"), col("vid")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    (1L to 40L).foreach { k =>
      assert(out(k) == (if (k % 2 == 0) k * 1000 else -1L), s"key $k")
    }
  }

  test("shared lineage (self-join) is re-aliased, not silently mirrored") {
    // both sides from the SAME frame: without dedup the output
    // projection binds right attrs to left ordinals by exprId and the
    // "matched" columns would mirror the left row
    val events = Seq(
      (1L, 5L, ts("2020-01-01 10:00:00")),
      (2L, 5L, ts("2020-01-01 12:00:00")))
      .toDF("id", "user_id", "t")
    val out = AsOf.join(
      events.select(col("id").as("pid"), col("user_id"), col("t").as("pts")),
      events.select(col("id").as("vid"), col("user_id").as("vuid"), col("t").as("vts")),
      Seq("user_id"), Seq("vuid"), "pts", "vts", rightTiebreak = Seq("vid"))
      .select(col("pid"), col("vid")).orderBy(col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // pid 2 must match vid 2 at-or-before; pid 1 matches itself (<=)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L)))
    // self-join verbatim: right columns must come from the matched
    // right row, not mirror the left
    val self = AsOf.join(events, events, Seq("user_id"), Seq("user_id"),
        "t", "t", rightTiebreak = Seq("id"))
    assert(self.count() == 2)
  }

  test("key/time type mismatches are rejected, not compared raw") {
    val l = Seq((1L, 5L, ts("2020-01-01 10:00:00"))).toDF("pid", "user_id", "pts")
    val r = Seq((2L, 5L, java.sql.Date.valueOf("2020-01-01"))).toDF("vid", "vuid", "vd")
    intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("user_id"), Seq("vuid"), "pts", "vd")
    }
    val r2 = Seq((2L, 5, ts("2020-01-01 09:00:00"))).toDF("vid", "vuid", "vts")
    intercept[IllegalArgumentException] {
      AsOf.join(l, r2, Seq("user_id"), Seq("vuid"), "pts", "vts")
    }
  }

  test("empty right side leaves every left row unmatched") {
    val probes = Seq((1L, 5L, ts("2020-01-01 00:00:00"))).toDF("pid", "user_id", "pts")
    val refs = Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("vid", "v_user_id", "vts")
    val out = AsOf.join(probes, refs, Seq("user_id"), Seq("v_user_id"), "pts", "vts")
    assert(out.count() == 1 && out.head().isNullAt(3))
  }
}
