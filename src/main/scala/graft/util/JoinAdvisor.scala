package graft.util

import graft.functions.Kmv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CBO-style join planning from KMV sketches — the q131 set algebra
  * made LOAD-BEARING: instead of reporting estimates, sketch both join
  * inputs' key sets (two O(K)-state column scans, never the join) and
  * DECIDE the physical strategy — broadcast the build side when its
  * estimated distinct-key count fits the broadcast budget, pin a
  * shuffle join when it doesn't.
  *
  * Why this exists when Catalyst already sizes builds: Catalyst's
  * size-in-bytes estimate for a DERIVED frame (a filter's output, a
  * delta's distinct-key projection) is a propagated guess — a
  * selective filter keeps the parent's stats and a broadcast that
  * "fit" at plan time can OOM the driver at run time, while an
  * over-estimate shuffles what one executor could hold. The sketch
  * measures the ACTUAL key set (6.3% RSE at K=256) for the cost of a
  * TakeOrdered, the same trade a warehouse CBO's ANALYZE makes, and
  * the md5-minima sketch is deterministic (q78 rule) so the decision
  * is rerun-stable — no plan flapping between runs.
  *
  * At 100 TB the sketches come free: every LayerStore table can
  * persist its key sketch at write time (Kmv is mergeable across
  * partitions/splits), so advise() reads two K-row arrays instead of
  * scanning. Here the scan form keeps the utility self-contained.
  */
object JoinAdvisor {

  /** Broadcast budget in DISTINCT KEYS (not bytes): ~500k long-ish
    * keys ≈ a few tens of MB hashed relation — comfortably inside a
    * driver/executor broadcast budget, far outside what a semi-join
    * should shuffle for. */
  val DefaultBroadcastMaxKeys: Double = 500000.0

  /** The advised physical shape of `left ⋈ right` on one key each.
    * `buildSide` is the smaller estimated side; `broadcastBuild` says
    * whether it fits the budget. Estimates are exact below K. */
  case class Advice(leftKeys: Double, rightKeys: Double, unionKeys: Double,
      jaccard: Double, intersectionKeys: Double,
      buildSide: String, broadcastBuild: Boolean)

  /** Combine multi-column keys into the one canonical string the
    * sketch hashes, \u0001-separated (the separator never occurs in the data columns' string
    * forms here; a general deployment would length-prefix). */
  private def keyCol(keys: Seq[Column]): Column =
    if (keys.size == 1) keys.head else concat_ws("\u0001", keys: _*)

  /** Driver-side minima of a frame's key set — K strings. */
  private[graft] def minima(df: DataFrame, keys: Seq[Column],
      k: Int = Kmv.DefaultK): Seq[String] =
    Kmv.sketch(df, keyCol(keys), k).collect()
      .headOption.map(_.getSeq[String](0).toSeq).getOrElse(Nil)

  /** The Bar-Yossef estimator on a driver-side minima list (the
    * Column-form twin is Kmv.estimate): exact below K. */
  private[graft] def estimateFrom(m: Seq[String], k: Int = Kmv.DefaultK): Double =
    if (m.size < k) m.size.toDouble
    else (k - 1).toDouble /
      (java.lang.Long.parseLong(m(k - 1).take(15), 16).toDouble / Kmv.Denom)

  /** Sketch both inputs and advise the join shape. Two column-scan
    * jobs (O(K) state each); the q131 algebra runs driver-side over
    * 2×K strings: union minima → |A∪B|, the fraction of union minima
    * present in BOTH sketches → Jaccard → |A∩B|. */
  def advise(left: DataFrame, leftKeys: Seq[Column],
      right: DataFrame, rightKeys: Seq[Column],
      broadcastMaxKeys: Double = DefaultBroadcastMaxKeys,
      k: Int = Kmv.DefaultK): Advice =
    adviseFromMinima(minima(left, leftKeys, k), minima(right, rightKeys, k),
      broadcastMaxKeys, k)

  /** The algebra over pre-computed minima — the zero-scan entry point
    * for sketches PERSISTED at write time (LayerStore.writeKeySketch):
    * at 100 TB advise() costs two table scans, this costs two K-row
    * sidecar reads. */
  def adviseFromMinima(a: Seq[String], b: Seq[String],
      broadcastMaxKeys: Double = DefaultBroadcastMaxKeys,
      k: Int = Kmv.DefaultK): Advice = {
    val na = estimateFrom(a, k)
    val nb = estimateFrom(b, k)
    val union = (a ++ b).distinct.sorted.take(k)
    val nu = estimateFrom(union, k)
    val (sa, sb) = (a.toSet, b.toSet)
    val rho =
      if (union.isEmpty) 0.0
      else union.count(h => sa(h) && sb(h)).toDouble / union.size
    val build = if (nb <= na) "right" else "left"
    val buildKeys = math.min(na, nb)
    Advice(na, nb, nu, rho, rho * nu, build, buildKeys <= broadcastMaxKeys)
  }

  /** The advised delta-scoping semi-join (Pipeline.restrictToKeys'
    * engine): broadcast `keyFrame` when its sketched key count fits
    * the budget — the common incremental-delta case — and PIN a merge
    * join when it doesn't (the hint matters: Catalyst's propagated
    * size guess for a derived key frame can still say "broadcast" and
    * OOM on a full-refresh-sized delta). Column order of `df` is
    * preserved (USING-semi-join reorder rule). */
  def advisedSemiJoin(df: DataFrame, keys: Seq[String], keyFrame: DataFrame,
      broadcastMaxKeys: Double = DefaultBroadcastMaxKeys,
      k: Int = Kmv.DefaultK): DataFrame =
    advisedSemiJoinFromMinima(df, keys, keyFrame,
      minima(keyFrame, keys.map(keyFrame(_)), k), broadcastMaxKeys, k)

  /** The zero-scan form of [[advisedSemiJoin]]: the key frame's KMV
    * minima were PERSISTED at write time (LayerStore.writeKeySketch on
    * the staging table the key frame derives from — distinct() cannot
    * change a key set, so the table's sketch IS the key frame's), and
    * the decision is a pure driver-side estimate over K strings — NO
    * Spark job runs until the caller executes the advised join.
    * Same estimator, same threshold, same two physical shapes as the
    * scanning form: the decisions are identical by construction
    * (JoinAdvisorSpec pins both). */
  def advisedSemiJoinFromMinima(df: DataFrame, keys: Seq[String],
      keyFrame: DataFrame, keyMinima: Seq[String],
      broadcastMaxKeys: Double = DefaultBroadcastMaxKeys,
      k: Int = Kmv.DefaultK): DataFrame = {
    val est = estimateFrom(keyMinima, k)
    val scoped =
      if (est <= broadcastMaxKeys) df.join(broadcast(keyFrame), keys, "left_semi")
      else df.join(keyFrame.hint("merge"), keys, "left_semi")
    scoped.select(df.columns.map(col): _*)
  }
}
