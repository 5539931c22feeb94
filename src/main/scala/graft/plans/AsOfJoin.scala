package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join as a first-class Catalyst operator — the
  * whole-operator extension tier (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`) of the preference order, complementing the repo's
  * custom codegen Expression (graft.plans.PolyHash) and the
  * composed-from-built-ins as-of (q46, EventOps.asofJoin).
  *
  * Semantics (backward, inclusive): for every left row, the LATEST
  * right row with equal keys and right.time <= left.time; unmatched
  * left rows keep NULL right columns (LEFT OUTER). Ties at equal
  * right time resolve to the row latest in the right child's sort
  * order, so callers pin a total order with a tiebreak column.
  *
  * Physical shape: both children hash-cluster on the join keys and
  * sort by (keys, time) — the same exchange/sort a sort-merge join
  * needs — then ONE forward-only merge pass per partition: O(|L|+|R|)
  * time, O(1) state (the single candidate row). Versus the composed
  * union+window formulation this streams instead of buffering window
  * frames and never materializes the tagged union. At 100 TB the
  * exchange is the whole cost, and it is identical in both forms.
  *
  * Caveats (documented, enforced upstream): join keys and time values
  * are expected non-null — null keys compare like values (nulls
  * first) rather than join-style null-rejecting.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
  leftKeys: Seq[Expression], rightKeys: Seq[Expression],
  leftTime: Expression, rightTime: Expression,
  rightTiebreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
    newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: pluggable via `SparkSessionExtensions
  * .injectPlannerStrategy(_ => AsOfJoinStrategy)` (see
  * GraftExtensions) or `spark.experimental.extraStrategies`
  * (AsOf.join does this automatically). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
  leftTime: Expression, rightTime: Expression,
  rightTiebreak: Seq[Expression],
  left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition like a sort-merge join: EnsureRequirements aligns the
  // two ClusteredDistributions onto one hash partitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // the tiebreak columns extend the right sort so rows at equal
  // (key, time) arrive in a deterministic order — "latest wins" is
  // then a total function of the data, not of sort stability
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  // the merge preserves the left child's order and partitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
    newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, lOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rOut)
      val lTs = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTs = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // bind against NULLABLE right attributes — binding the original
      // (non-null) ones compiles a projection that never null-checks
      // the right side and reads garbage zeros for unmatched rows
      val project = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // the single not-yet-consumed right row (forward-only cursor)
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTs: InternalRow = _
        // latest right row already consumed, with its key
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKey(rHead).copy()
            rHeadTs = rTs(rHead).copy()
          } else rHead = null
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey(l).copy()
          val lt = lTs(l).copy()
          var cmp = if (rHead == null) 1 else keyOrd.compare(rHeadKey, lk)
          while (rHead != null &&
            (cmp < 0 || (cmp == 0 && tsOrd.compare(rHeadTs, lt) <= 0))) {
            if (cmp == 0) { // same key, time <= left: newest candidate
              candidate = rHead.copy()
              candidateKey = rHeadKey
            }
            advanceRight()
            cmp = if (rHead == null) 1 else keyOrd.compare(rHeadKey, lk)
          }
          val matched = candidate != null && keyOrd.compare(candidateKey, lk) == 0
          project(if (matched) joined(l, candidate) else joined(l, nullRight))
        }
      }
    }
  }
}

/** DataFrame-level entry point. Key/time columns are named per side —
  * rename the sides first so the joined output has no duplicate
  * column names (the operator concatenates both outputs verbatim). */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
    leftKeys: Seq[String], rightKeys: Seq[String],
    leftTs: String, rightTs: String,
    rightTiebreak: Seq[String] = Nil): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    import org.apache.spark.sql.graft.ColumnBridge
    // shared lineage (self-join / common un-renamed scan) would put the
    // same exprId on both sides; the output projection then binds right
    // attributes to LEFT ordinals — silently wrong columns. Re-alias
    // the right side (Alias mints fresh exprIds) when outputs overlap.
    val lPlan = leftDf.queryExecution.analyzed
    val right =
      if (lPlan.outputSet.intersect(rightDf.queryExecution.analyzed.outputSet).isEmpty) rightDf
      else rightDf.select(rightDf.columns.map(n => rightDf(n).as(n)).toSeq: _*)
    // the merge compares left-vs-right key and time values with
    // orderings built from the LEFT datatypes — a type mismatch would
    // not throw, it would compare raw representations (date days vs
    // timestamp micros) and match garbage
    // zip would silently TRUNCATE mismatched key lists, and the exec's
    // key ordering would then read past the end of the narrower key
    // row (unchecked UnsafeRow ordinals -> garbage matches, no error)
    require(leftKeys.length == rightKeys.length,
      s"as-of key arity mismatch: ${leftKeys.length} left vs ${rightKeys.length} right")
    leftKeys.zip(rightKeys).foreach { case (l, r) =>
      val (lt, rt) = (ColumnBridge.expr(leftDf(l)).dataType,
        ColumnBridge.expr(right(r)).dataType)
      require(lt == rt, s"as-of key type mismatch: $l: $lt vs $r: $rt")
    }
    require(ColumnBridge.expr(leftDf(leftTs)).dataType ==
      ColumnBridge.expr(right(rightTs)).dataType,
      s"as-of time type mismatch: $leftTs vs $rightTs")
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, right.queryExecution.analyzed,
      leftKeys.map(n => ColumnBridge.expr(leftDf(n))),
      rightKeys.map(n => ColumnBridge.expr(right(n))),
      ColumnBridge.expr(leftDf(leftTs)), ColumnBridge.expr(right(rightTs)),
      rightTiebreak.map(n => ColumnBridge.expr(right(n)))))
  }
}
