package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the oracle SQL. Floating-point reductions are order-dependent, so any
  * `sum(double)` can differ in the last ulp between engines. The recipe
  * used by every query in this repo:
  *
  *   - per-row arithmetic stays in double (IEEE ops on identical
  *     operands are bit-identical in both engines),
  *   - reductions go through DecimalType (exact, associative,
  *     order-independent — safe under Spark's parallel partial
  *     aggregation at any scale),
  *   - the output edge is cast back to double (exact for |x| < 2^53)
  *     or long, so the written parquet schema is plain DOUBLE/BIGINT
  *     in both engines.
  *
  * This is not just a test trick: at 100 TB the same property makes
  * results independent of partitioning/AQE decisions, i.e. reruns are
  * byte-stable.
  */
object Parity {
  /** Exact fixed-point sum without BigDecimal in the hot loop: scale
    * the k-dp value to an integer (round = HALF_UP, the same rounding
    * the old DecimalType cast applied), accumulate as codegen'd LONG
    * adds, descale ONCE per group in decimal so the final double is
    * the correctly-rounded value of the exact rational — bit-identical
    * to the oracle's CAST(sum(DECIMAL) AS DOUBLE) (a long/10^k double
    * division would double-round). ~10× cheaper per row than
    * Decimal(38,·) accumulation. Bounds (ANSI mode errors loudly, no
    * silent wrap): per-row |x|·10^k < 9.2e18 and group totals likewise
    * — at 4 dp that is ~9e14 in money units per group, far above any
    * real aggregate; callers beyond it should sum decimal directly. */
  private def scaledSum(c: Column, pow: Int): Column = {
    val v = round(c.cast(DoubleType) * math.pow(10, pow).longValue).cast(LongType)
    (sum(v).cast(DecimalType(28, 0)) *
      lit(new java.math.BigDecimal(java.math.BigInteger.ONE, pow))).cast(DoubleType)
  }

  /** Exact sum of a money-like column (2 decimal digits in testdata). */
  def moneySum(c: Column): Column = scaledSum(c, 2)

  /** Exact sum of a derived per-row double, fixed at 4 decimals (the
    * per-row double must BE a 4-dp value below 2^53/1e4 ≈ 9e11, e.g.
    * price×(1−discount) — products of 2-dp values — so the scaled
    * integer is exact). */
  def derivedSum(c: Column): Column = scaledSum(c, 4)

  /** Deterministic mean: exact scaled sum, one double division. */
  def moneyAvg(c: Column): Column = scaledSum(c, 2) / count(c)

  /** Round a product of 2-dp money values exactly. Such products have
    * exactly 4 decimal digits, so ~1/1000 of them sit ON the .xx50
    * rounding boundary — where double-rounding differs between engines.
    * Routing through DecimalType(18,4) makes the tie exact, and both
    * Spark (HALF_UP) and DuckDB round decimal ties away from zero. */
  def moneyRound(c: Column, scale: Int = 2): Column =
    round(c.cast(DecimalType(18, 4)), scale).cast(DoubleType)

  /** Long scale-k integer of a k-dp double — exact (the double is
    * within half an ulp of the true k-dp rational, so round() recovers
    * it) for |x|·10^k < 2^53. */
  def asScaled(c: Column, pow: Int): Column =
    round(c.cast(DoubleType) * math.pow(10, pow).longValue).cast(LongType)

  /** The fixed-point twin of moneyRound for products that are exactly
    * scale-4 rationals (2-dp × 2-dp money values): takes the product as
    * a LONG in ten-thousandths and rounds HALF_UP (ties away from zero,
    * matching both engines' decimal rounding) to a 2-dp double. No
    * BigDecimal per row — measured ~8× cheaper than the decimal route
    * on a 600k-row wide projection. Exact for |v4| < 2^53. */
  def scale4ToMoney(v4: Column): Column = {
    // |v4|+50 stays < 2^53 -> the double division is exact enough for
    // floor (quotients have <= 2 fractional digits, never near 1.0-ulp)
    val mag = floor((abs(v4) + lit(50L)).cast(DoubleType) / lit(100.0))
    when(v4 < 0, -mag).otherwise(mag) / lit(100.0)
  }

  /** Round an arbitrary double (ratios, percentages) via a decimal
    * "snap" 4 digits below the target scale. Quotients often land a
    * hair's width from a .xx5 tie; snapping makes the tie exact, where
    * both engines round away from zero. SQL mirror:
    * CAST(round(CAST(x AS DECIMAL(30,scale+4)), scale) AS DOUBLE). */
  def snapRound(c: Column, scale: Int = 2): Column =
    round(c.cast(DecimalType(30, scale + 4)), scale).cast(DoubleType)

  /** SQL-side twin of snapRound for oracle strings. */
  def snapRoundSql(x: String, scale: Int = 2): String =
    s"CAST(round(CAST($x AS DECIMAL(30,${scale + 4})), $scale) AS DOUBLE)"

  /** Exact sum of squared LONG-scaled values whose squares overflow
    * the safe long-sum bound: split each v² into base-1e9 limbs, sum
    * both limbs as codegen'd LONG adds, recombine ONCE per group in
    * decimal. Shared by the stats-profile and correlation aggregates —
    * the recombination must stay identical at both call sites or the
    * exact-sum guarantee silently diverges between them. Bounds: v²
    * ≤ 1e14 per row keeps hi ≤ 1e5, lo < 1e9; both limb sums stay
    * far under 2^63 at any realistic group size. */
  val squareLimb = 1000000000L

  /** The two limb aggregate columns for Σv², named hi2_/lo2_<tag>. */
  def limbSquareAggs(v2: Column, tag: String): Seq[Column] = Seq(
    sum(((v2 - v2 % squareLimb) / squareLimb).cast(LongType)).as(s"hi2_$tag"),
    sum(v2 % squareLimb).as(s"lo2_$tag"))

  /** Recombine the limb sums into the exact decimal Σv² (still in the
    * scaled-integer domain — descale at the caller if needed). */
  def limbSquareSum(tag: String): Column =
    col(s"hi2_$tag").cast(DecimalType(38, 0)) * lit(squareLimb) +
      col(s"lo2_$tag").cast(DecimalType(38, 0))

  /** NULLIF(x, 0)-guarded division, rounded — matches the reference's
    * `ROUND(a / NULLIF(b, 0), 2)` idiom (gold/gold_builder.py:118-119). */
  def safeDiv(num: Column, den: Column, scale: Int = 2): Column =
    snapRound(num / nullif(den, lit(0.0)), scale)

  /** ISO day-of-week (Mon=1..Sun=7) — Postgres EXTRACT(ISODOW) semantics
    * (reference gold/gold_builder.py:341); Spark's dayofweek is Sun=1. */
  def isoDow(c: Column): Column = (dayofweek(c) + lit(5)) % lit(7) + lit(1)
}
