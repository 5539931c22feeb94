package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bottom-k hash sampling — the quantile member of the deterministic
  * sketch family ([[Kmv]] = distinct counts, operators.CorpusOps CMS =
  * frequencies, this = quantiles / uniform row samples).
  *
  * Keep the K rows whose md5(row key) is lexicographically smallest.
  * Because md5 is uniform over keys, those K rows are a uniform random
  * sample of the table — but unlike `TABLESAMPLE` / `rand()` the
  * sample is a PURE FUNCTION of the data: rerun-stable, partitioning-
  * independent, and computable identically by any engine that has md5
  * (so estimates are hash-verifiable against an oracle, which Spark's
  * `approx_percentile` sketch is not).
  *
  * Mergeability (the 100 TB property): the K hash-smallest rows of a
  * union are computable from the K hash-smallest of each part —
  * `merge(a, b)`. Sketch each split independently, fold the (hash,
  * value) arrays pairwise in any order, estimate once at the end.
  * The one-pass `sketch` plan already runs this shape physically:
  * TakeOrdered keeps O(K) state per partition and merges at the
  * driver — the table is never sorted and never shuffled.
  *
  * Quantile error: a uniform sample of size K estimates any quantile
  * to within ~1/sqrt(K) in RANK space with high probability (DKW
  * inequality: P[sup|F̂−F| > ε] ≤ 2·exp(−2Kε²)). K = 1024 gives
  * ε ≈ 0.03 at 2e⁻² confidence — and the bound is on the realized
  * rank, so it holds for any value distribution, duplicates included.
  */
object HashSample {

  /** Default sample size: 1024 rows ≈ ±3% rank error (DKW, 95%). */
  val DefaultK = 1024

  /** The hash a row contributes — md5 of the canonical string form of
    * its unique key (identical in DuckDB: md5(CAST(k AS VARCHAR))).
    * For compound keys pass a pre-concatenated column with an
    * unambiguous separator. */
  def hash(key: Column): Column = md5(key.cast(StringType).cast(BinaryType))

  /** One-pass sketch: a 1-row frame with `pairs` = the at-most-K
    * (h, v) structs with smallest row-key hash, ascending by h.
    * Plan: TakeOrdered — O(K) per partition, K-row driver merge,
    * no shuffle of the table. */
  def sketch(df: DataFrame, key: Column, value: Column, k: Int = DefaultK): DataFrame =
    df.select(hash(key).as("h"), value.cast(DoubleType).as("v"))
      .orderBy(col("h")).limit(k)
      .agg(sort_array(collect_list(struct(col("h"), col("v")))).as("pairs"))

  /** Merge two sketches: the K hash-smallest pairs of the union.
    * Associative and commutative (row keys are unique, so equal-h
    * duplicates across sketches are the SAME row and array_distinct
    * collapses them) — fold per-split sketches in any order. */
  def merge(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** The sampled values, ascending — the empirical distribution the
    * quantile estimates read from. */
  def values(pairs: Column): Column =
    array_sort(transform(pairs, x => x.getField("v")))

  /** Nearest-rank quantile estimate from a sketch: the value at rank
    * ceil(p·n) of the sorted sample (1-based, clamped to ≥ 1); NULL
    * for an empty sketch (rank 1 of an empty array is an ANSI
    * INVALID_ARRAY_INDEX error, not a null, under Spark 4 defaults).
    * The same arithmetic runs verbatim in any SQL engine — no
    * interpolation-mode ambiguity. */
  def quantile(pairs: Column, p: Column): Column = {
    val sv = values(pairs)
    when(size(sv) > 0,
      element_at(sv, greatest(lit(1L), ceil(p * size(sv))).cast(IntegerType)))
  }

  /** Convenience: 1-row frame of nearest-rank estimates for the given
    * probabilities, as (p, estimate) structs ascending by p. */
  def quantiles(df: DataFrame, key: Column, value: Column,
      ps: Seq[Double], k: Int = DefaultK): DataFrame =
    sketch(df, key, value, k).select(
      array(ps.sorted.map(p =>
        struct(lit(p).as("p"), quantile(col("pairs"), lit(p)).as("estimate"))): _*)
        .as("quantiles"))
}
