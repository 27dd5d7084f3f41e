package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator as-of join (SURVEY §2.11 tier-c: custom `LogicalPlan` +
  * `Strategy` + `SparkPlan`, registered via `SparkSessionExtensions`).
  *
  * Semantics: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` for the same key; left rows without a
  * match keep nulls (LEFT as-of, `>=` at equal timestamps).
  *
  * The physical operator requires both children clustered on the key and
  * sorted by (key, time) — the same contract as a sort-merge join, which
  * Spark's `EnsureRequirements` satisfies with one exchange + sort per
  * side — and then streams each co-partition pair with a two-pointer
  * merge: the right cursor only ever advances, remembering the latest
  * in-key row. Per-partition state is ONE buffered right row; no union
  * row padding, no window buffer, no per-key group materialization. This
  * is strictly less work than the union+window lowering in
  * [[graft.operators.AsofJoin]] (which stays as the no-extensions
  * fallback and as the differential-test oracle).
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression)
    extends BinaryNode {
  // the exec derives its orderings from the LEFT types, so both sides
  // must agree (same requirement a sort-merge join gets from the analyzer)
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftKey.dataType, rightKey.dataType, ignoreNullability = true),
    s"as-of join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  // left rows pass through; every right column is attached (nullable —
  // a left row may precede all right rows for its key)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, lt, rk, rt) =>
      AsofJoinExec(lk, lt, rk, rt,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(leftKey: Expression, leftTime: Expression,
                        rightKey: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftKey.dataType, rightKey.dataType, ignoreNullability = true) &&
    org.apache.spark.sql.types.DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    "as-of join requires matching key and time types on both sides")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same contract as SortMergeJoinExec: co-clustered on the key...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  // ...and sorted (key, time) within each partition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nulls = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // downstream consumers (and collect) expect UnsafeRow output
      val toUnsafe = UnsafeProjection.create(output, output)
      // the latest right row whose (key, time) <= the current left row's;
      // right rows are consumed at most once across the whole partition
      var lastRight: InternalRow = null
      var lastRightKey: Any = null

      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        if (lk == null || lt == null) {
          // null keys/times never match (SMJ semantics); the sort puts
          // these rows first, before any right row they could consume
          toUnsafe(joined(l, nulls))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKey.eval(r)
            if (rk == null) { rBuf.next() } // null right key: never matches
            else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) { rBuf.next() }  // other (earlier) key: skip
              else if (cmp == 0) {
                val rt = rTime.eval(r)
                if (rt == null) { rBuf.next() } // null right time: skip
                else if (timeOrd.compare(rt, lt) <= 0) {
                  lastRight = r.copy(); lastRightKey = rk; rBuf.next()
                } else advance = false    // beyond this left row: stop
              } else advance = false      // right key ahead of left: stop
            }
          }
          val matched = lastRight != null && keyOrd.compare(lastRightKey, lk) == 0
          toUnsafe(joined(l, if (matched) lastRight else nulls))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinPlan {

  /** Ensure the strategy is available on this session (idempotent); the
    * production path registers it through [[graft.GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.sessionState.experimentalMethods.extraStrategies
    if (!strategies.contains(AsofJoinStrategy))
      spark.sessionState.experimentalMethods.extraStrategies =
        AsofJoinStrategy +: strategies
  }

  /** Native as-of join: left rows + all right columns (null when no right
    * row at-or-before). Column-name collisions must be resolved upstream,
    * like any join. */
  def backward(spark: SparkSession, left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    register(spark)
    val lPlan = ColumnBridge.logicalPlan(left)
    val rPlan = ColumnBridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    ColumnBridge.ofRows(spark, AsofJoinNode(lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime)))
  }
}
