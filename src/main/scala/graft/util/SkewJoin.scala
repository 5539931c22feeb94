package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salt the skewed (fact) side so one
  * hot key spreads over `salts` shuffle partitions, and explode the
  * dim side across every salt. Result is identical to the plain join;
  * the shuffle key becomes (key, salt).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; this
  * utility is for the cases AQE can't re-plan (aggregations keyed on
  * the hot key upstream, or deterministic-layout requirements).
  *
  * The salt is derived from a hash of the fact row's other columns —
  * deterministic (rerun-stable, unlike rand()) while still spreading
  * rows of the hot key.
  */
object SkewJoin {

  /** Two-stage aggregation for hot grouping keys: partial-aggregate on
    * (key, salt) first so one hot key's rows spread over `salts`
    * reducers, then combine the partials. Valid for decomposable
    * aggregates (sum/count/min/max — pass the combine column map).
    * Catalyst's own partial aggregation covers most cases; this is for
    * explicit control when a single reducer key would still bottleneck
    * (e.g. high-cardinality payloads per hot key). */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial_sum"), count(lit(1)).as("__partial_n"))
    partial.groupBy(col(key))
      .agg(sum(col("__partial_sum")).as(s"sum_$valueCol"),
        sum(col("__partial_n")).as("count"))
  }

  /** Skew-resilient top-k per hot key — the window-skew case neither
    * Catalyst's partial aggregation nor AQE can re-plan: a bare
    * `Window.partitionBy(key)` serializes EVERY row of a hot key
    * through one task (ranking is not decomposable the way sums are,
    * and AQE's skew handling splits joins, not windows). Two phases:
    * rank within (key, salt) — the hot key's rows spread over `salts`
    * tasks — keep k per salt, then rank the ≤ salts×k survivors per
    * key (a bounded frame, not fact-proportional). Identical to the
    * naive window for any TOTAL order: a key's global top k is
    * contained in the union of its per-salt top k, and the final
    * ranking applies the same total order to that superset. The salt
    * is a deterministic hash of the non-key columns (rerun-stable,
    * unlike rand()). Output: the input columns plus `rank` 1..k.
    *
    * ASSUMPTION (required for the spread to work): a hot key's rows
    * must differ in at least one non-key column — byte-identical
    * payloads hash to ONE salt and the skew returns. That holds for
    * every fact table here ((user, ts) unique in all testdata SFs);
    * for degenerate data, add a monotonically_increasing_id column
    * before calling (it joins the hash input like any other column).
    * Not mixed in by default because mIId varies with partition
    * layout, and rerun-stable output is this utility's contract.
    * The input must not already carry `rank` or `__salt` columns —
    * withColumn would silently replace them (asserted below). */
  def saltedTopK(df: DataFrame, key: String, order: Seq[Column],
    k: Int, salts: Int): DataFrame = {
    require(k > 0 && salts > 0)
    require(!df.columns.contains("rank") && !df.columns.contains("__salt"),
      "saltedTopK: input must not have 'rank'/'__salt' columns (they would be replaced)")
    val spreadCols = df.columns.filterNot(_ == key).map(col)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key), col("__salt")).orderBy(order: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("__salt", pmod(hash(spreadCols: _*), lit(salts)))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .drop("__r1")
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .drop("__salt")
  }

  /** Join types that preserve semantics under salting. The dim side is
    * replicated across every salt, so any type that can EMIT unmatched
    * dim rows ("right", "full_outer") would emit them once per salt —
    * `salts`-fold duplication. Fact-side-preserving types are safe:
    * each fact row carries exactly one salt and meets each dim row at
    * most once. */
  private val factSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  /** Limitation (documented): the salt hashes the fact row's non-key
    * columns, so hot-key rows with byte-identical payloads still land
    * on one salt. For such data add a monotonically_increasing_id
    * column before salting. At runtime AQE's skew-split of sort-merge
    * joins remains the default production path; this utility is for
    * plans AQE can't re-split (see object scaladoc). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
    dimKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(factSafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin: join type '$joinType' is not semantics-preserving under " +
        "salting (unmatched dim rows would duplicate once per salt); " +
        s"allowed: ${factSafeJoinTypes.toSeq.sorted.mkString(", ")}")
    val spreadCols = fact.columns.filterNot(_ == factKey).map(col)
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(spreadCols: _*), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
      saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"),
      joinType)
      .drop("__salt")
  }
}
