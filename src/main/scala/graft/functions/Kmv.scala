package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a production API —
  * the reusable form of the q78 query (operators.Eda.kmvDistinct),
  * for corpus-scale profiling where an exact distinct is a full-width
  * shuffle the profiler can't afford.
  *
  * Why KMV and not approx_count_distinct: Spark's HLL++ register
  * layout is engine- and version-specific, so its estimates are not
  * reproducible across engines (ScaleSpec documents the tolerance
  * path it forces). md5 + lexicographic minima are BIT-IDENTICAL
  * everywhere — the same sketch computed by Spark, DuckDB, or a
  * sorted file is the same bytes, so estimates are deterministic,
  * rerun-stable, and hash-verifiable.
  *
  * Mergeability (the 100 TB property): the K smallest hashes of a
  * union are computable from the K smallest of each part —
  * `mergeMinima(sketchA, sketchB)`. Sketch each split/partition
  * independently, merge pairwise in any order (associative —
  * ScaleSpec proves merged == one-pass on disjoint splits), estimate
  * once at the end. The one-pass `sketch` plan already runs this
  * shape physically: TakeOrdered computes per-partition minima and
  * merges them at the driver.
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in
  * a data stream"): with u_K = the K-th smallest hash mapped to
  * [0,1), n̂ = (K−1)/u_K; unbiased, relative standard error
  * ≈ 1/sqrt(K−2). Sets smaller than K are reported EXACTLY (the
  * sketch holds every distinct hash).
  */
object Kmv {

  /** Default sketch size: 256 minima ≈ 6.3% relative standard error. */
  val DefaultK = 256

  /** 16^15 = 2^60 — maps a 15-hex-digit md5 prefix onto [0, 1).
    * 15 digits (not 16) keeps the parsed BIGINT positive in every
    * engine. Shared with the q78 oracle. */
  val Denom = 1.152921504606846976e18

  /** The hash a value contributes to the sketch — md5 of the value's
    * canonical string form (identical in DuckDB: md5(CAST(c AS
    * VARCHAR))). */
  def hash(c: Column): Column = md5(c.cast(StringType).cast(BinaryType))

  /** One-pass sketch of a column's value set: a 1-row frame with
    * `minima` = the at-most-K smallest distinct-value hashes,
    * ascending. NULLs contribute nothing (like count(DISTINCT c)).
    * Plan: one distinct-hash shuffle, then TakeOrdered — O(K) state
    * per partition, K-row merge at the driver. */
  def sketch(df: DataFrame, c: Column, k: Int = DefaultK): DataFrame =
    df.filter(c.isNotNull)
      .select(hash(c).as("h")).distinct()
      .orderBy(col("h")).limit(k)
      .agg(sort_array(collect_list(col("h"))).as("minima"))

  /** Merge two minima arrays: the K smallest of the union. Associative
    * and commutative — fold any number of per-split sketches in any
    * order. */
  def mergeMinima(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Cardinality estimate from a minima array: exact below K, else
    * (K−1)/u_K. */
  def estimate(minima: Column, k: Int = DefaultK): Column =
    when(size(minima) < k, size(minima).cast(DoubleType))
      .otherwise(lit((k - 1).toDouble) /
        (conv(substring(element_at(minima, lit(k)), 1, 15), 16, 10)
          .cast(DoubleType) / lit(Denom)))

  /** Convenience: 1-row (approx_distinct DOUBLE) frame for a column. */
  def distinctEstimate(df: DataFrame, c: Column, k: Int = DefaultK): DataFrame =
    sketch(df, c, k).select(estimate(col("minima"), k).as("approx_distinct"))
}
