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

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
    dimKey: String, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
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
