package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-min frequency sketch as a production API — the frequency
  * twin of the KMV distinct sketch ([[Kmv]]): per-key occurrence
  * estimates for corpus-scale profiling where an exact per-key count
  * is a distinct-cardinality shuffle the profiler can't afford
  * (Cormode & Muthukrishnan 2005, "An improved data stream summary:
  * the count-min sketch and its applications").
  *
  * Why count-min and not sampled counting or Misra-Gries-style
  * summaries: those are input-ORDER dependent (which partition saw a
  * key first changes the state), so two runs of the same job can emit
  * different estimates. The count-min sketch is pure hashing and
  * addition — deterministic in the multiset alone, rerun-stable under
  * any partitioning, and the same numbers in any engine that can md5
  * (the q84 DuckDB oracle recomputes the sketch bit-identically).
  *
  * Mergeability (the 100 TB property): a sketch is a depth×width
  * counter matrix and the sketch of a union is the element-wise SUM of
  * the parts' matrices — sketch each split independently, merge in any
  * order (associative + commutative), estimate once at the end. The
  * one-pass [[sketch]] plan already runs this shape physically: the
  * hash aggregation partial-aggregates per partition (at most
  * depth×width counter rows leave any partition, regardless of input
  * size) and the final merge is the same element-wise sum.
  *
  * Guarantees: estimate ≥ true count always (counters only ever
  * overcount), and estimate ≤ true + εN with probability ≥ 1−(1/2)^d
  * where ε = e/width and N = total stream length — width buys
  * precision, depth buys confidence.
  */
object CountMin {

  /** Default depth (hash rows): 4 ⇒ overcount bound holds w.p. ~0.94. */
  val DefaultDepth = 4

  /** Default width (counters per row): ε = e/2048 ≈ 0.13% of N. */
  val DefaultWidth = 2048

  /** The row-j bucket of a value: the 15-hex-digit prefix of
    * md5("j:" || value) as a BIGINT, mod width. 15 digits (not 16)
    * keeps the parsed integer positive in every engine; the "j:"
    * prefix derives depth independent hash rows from one md5.
    * DuckDB twin: ('0x' || substr(md5(j || ':' || CAST(v AS
    * VARCHAR)), 1, 15))::BIGINT % width. */
  def bucket(c: Column, j: Int, width: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$j:"), c.cast(StringType)).cast(BinaryType)), 1, 15), 16, 10)
        .cast(LongType),
      lit(width.toLong))

  /** One-pass sketch of a column's value stream: (j, b, cnt) counter
    * rows, at most depth×width of them. NULLs contribute nothing.
    * Plan: a narrow posexplode (depth rows per input row, no shuffle)
    * into one hash aggregation whose map-side combine caps per-
    * partition output at depth×width counters. Works on a streaming
    * DataFrame too (complete-mode aggregation, state bounded at
    * depth×width rows) — CountMinSpec proves stream == batch. */
  def sketch(df: DataFrame, c: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): DataFrame =
    df.filter(c.isNotNull)
      .select(posexplode(array((0 until depth).map(j => bucket(c, j, width)): _*)).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("cnt"))

  /** Merge per-split sketches built with the same (depth, width):
    * element-wise counter sum. Associative and commutative. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("j"), col("b")).agg(sum(col("cnt")).as("cnt"))

  /** Per-key estimates: min over the depth rows of the key's bucket
    * counters — INCLUDING empty buckets, which the sketch stores
    * implicitly as absent rows (a LEFT join reads them back as 0).
    * This matters for keys the stream never saw: their true count-min
    * estimate is 0 whenever ANY of their depth buckets is empty; an
    * inner join would take the min over only the colliding non-empty
    * buckets and report a false positive count. `keys` is a frame
    * with the key in column `c` (e.g. candidate heavy hitters); the
    * sketch side is ≤ depth×width rows, so Spark broadcasts it and
    * the keys frame never shuffles. */
  def estimate(sketchDf: DataFrame, keys: DataFrame, c: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame = {
    val kb = keys.select(c.cast(StringType).as("key"))
      .select(col("key"),
        posexplode(array((0 until depth).map(j => bucket(col("key"), j, width)): _*)).as(Seq("j", "b")))
    kb.join(broadcast(sketchDf), Seq("j", "b"), "left")
      .groupBy(col("key")).agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
  }
}
