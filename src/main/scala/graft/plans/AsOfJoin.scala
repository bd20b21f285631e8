package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension #2: a native LEFT OUTER as-of join.
  *
  * "For each left row, the latest right row with the same key and
  * right.ts ≤ left.ts" is the attribution / point-in-time-feature
  * primitive (pandas merge_asof, kdb aj, Flink temporal join —
  * Spark only ships it in the pandas API, materialized through
  * Python). The SQL engine's own options both carry avoidable cost:
  * the inequality join plans a per-key cross product before ranking,
  * and the union+window rewrite (ev_asof_attribution,
  * ev_pit_lookup) needs value-carry columns per payload field and a
  * window buffer. This node runs the textbook streaming merge: both
  * sides hash-co-partitioned on the key and sorted by (key, ts) —
  * distribution/ordering REQUIREMENTS, so EnsureRequirements plans
  * the same exchanges+sorts a sort-merge join gets — then a single
  * forward pass holds exactly ONE candidate row per in-flight key.
  * O(1) state per partition, streaming emission, any number of right
  * payload columns carried wholesale.
  *
  * Matching contract: among right rows with equal (key, ts ≤ t) the
  * match is the LAST in (ts, tieBreaks) ascending order — a total
  * order the caller must provide for deterministic payloads; left
  * rows with no qualifying right row emit null-padded right columns
  * (LEFT OUTER).
  *
  * Reference scope: Impala executes this class of query as
  * analytic-fn rewrites (the window form §2.6 keeps); the native
  * node is the operator a Spark-first engine adds where the
  * declarative forms are structurally wasteful.
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lts, rts, ties, l, r) =>
      AsOfJoinExec(lk, rk, lts, rts, ties, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTies: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: rightTies.map(SortOrder(_, Ascending))))
  // left rows pass through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(out, out)
      // one copied lookahead row + one copied candidate: O(1) state
      var rCur: InternalRow = null
      def advanceRight(): Unit =
        rCur = if (rIter.hasNext) rIter.next().copy() else null
      advanceRight()
      var candidate: InternalRow = null
      var candidateKey: InternalRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        // stale candidate from an earlier key can never match again
        if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
          candidate = null
          candidateKey = null
        }
        var done = false
        while (!done && rCur != null) {
          val rKey = rKeyProj(rCur)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) {
            advanceRight() // right key already passed by every left row
          } else if (c == 0 &&
              tsOrd.compare(rTsProj(rCur), lTsProj(lRow)) <= 0) {
            // qualifying; later qualifying rows overwrite → LAST wins
            candidate = rCur
            candidateKey = rKey.copy()
            advanceRight()
          } else {
            done = true // right is ahead of this left row
          }
        }
        val rightSide =
          if (candidate != null && keyOrd.compare(candidateKey, lKey) == 0)
            candidate
          else nullRight
        outProj(joined(lRow, rightSide)): InternalRow
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the native as-of join. */
object AsOf {
  /** LEFT OUTER as-of join: every row of `left` plus the latest
    * `right` row with equal `keys` and `rightTs` ≤ `leftTs` (ties on
    * the timestamp resolved by `rightTies` ascending, LAST wins —
    * pass enough columns for a total order). Output carries ALL
    * columns of both sides; name the sides disjointly before calling.
    * The right side is re-aliased internally so a self-join (both
    * sides carved from the same scan) cannot alias attribute ids. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTs: String, rightTs: String, rightTies: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val spark = left.sparkSession
    AsOfStrategy.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfStrategy
      }
    }
    // fresh exprIds on the right: both sides often derive from the
    // same scan, and duplicate attribute ids across children would
    // mis-bind the output projection
    import org.apache.spark.sql.functions.col
    val rightFresh = right.select(right.columns.map(c => col(c).as(c)): _*)
    val la = left.queryExecution.analyzed
    val ra = rightFresh.queryExecution.analyzed
    val lRes = la.output.map(a => a.name -> a).toMap
    val rRes = ra.output.map(a => a.name -> a).toMap
    org.apache.spark.sql.GraftFunctions.ofRows(spark,
      AsOfJoinPlan(
        keys.map(k => lRes(k._1)), keys.map(k => rRes(k._2)),
        lRes(leftTs), rRes(rightTs), rightTies.map(rRes(_)),
        la, ra))
  }
}
