package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class Catalyst operator — the (c)-tier custom
  * path: a logical node, a planner strategy, and a physical exec with
  * declared distribution + ordering requirements.
  *
  * Semantics: for every left row, append the greatest right `time`
  * with the same key that is <= the left row's time (NULL if none) —
  * "join each fact to the latest earlier state". Equal timestamps
  * count as "earlier" (<=); rows with a NULL key or time never match.
  *
  * Why a custom operator instead of the window-function composition
  * (queries.Events.q_asof_join): the window form must interleave BOTH
  * sides into one partition-ordered stream, so the whole union is
  * shuffled AND sorted together and the right side's columns ride
  * through the window state. This exec declares
  * `ClusteredDistribution(key)` per child and per-child `(key, time)`
  * ordering, so Catalyst's EnsureRequirements plans ONE exchange +
  * sort per side (exactly what a sort-merge join gets), and the merge
  * itself is a single forward pass holding ONE long of state — no
  * window buffer, no unioned row-shape padding. At 100 TB the win is
  * the smaller shuffle payload (each side keeps its own narrow schema)
  * and the O(1) state per key instead of a window frame.
  *
  * Keys and times are LongType by contract (ids + epoch-µs — the data
  * model's [SURVEY §1.3] timestamp convention); the API rejects other
  * types up front. Generalizing to arbitrary orderable types only
  * changes the two comparisons in the merge loop.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    asofOut: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofOut
  // asofOut is minted BY this node, not read from a child
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, out) =>
      AsOfJoinExec(lk, lt, rk, rt, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    asofOut: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofOut
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)

  /** Both children clustered by key — EnsureRequirements inserts one
    * co-partitioned exchange per side, same as a shuffle join. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key, time) ascending per child — the merge is then a single
    * forward pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lki = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lti = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rki = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rti = right.output.indexWhere(_.exprId == rightTime.exprId)
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val proj = UnsafeProjection.create(output, output)
        val joined = new JoinedRow
        val matchRow = new GenericInternalRow(1)
        // one long of merge state: the last consumed right (key, time)
        var haveLast = false; var lastKey = 0L; var lastTime = 0L
        // right-side lookahead
        var haveR = false; var rKey = 0L; var rTime = 0L
        def pullRight(): Unit = {
          haveR = false
          while (!haveR && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rki) && !r.isNullAt(rti)) {
              rKey = r.getLong(rki); rTime = r.getLong(rti); haveR = true
            }
          }
        }
        pullRight()
        lIter.map { l =>
          if (l.isNullAt(lki) || l.isNullAt(lti)) {
            matchRow.setNullAt(0)
          } else {
            val k = l.getLong(lki); val t = l.getLong(lti)
            while (haveR && (rKey < k || (rKey == k && rTime <= t))) {
              lastKey = rKey; lastTime = rTime; haveLast = true
              pullRight()
            }
            if (haveLast && lastKey == k) matchRow.update(0, lastTime)
            else matchRow.setNullAt(0)
          }
          proj(joined(l, matchRow))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Left as-of join: `left`'s rows plus column `outCol` = the
    * greatest `rightTimeCol` of the same-keyed right row at or before
    * `leftTimeCol` (NULL if none). Key/time columns must be LongType. */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           leftKeyCol: String, leftTimeCol: String,
           rightKeyCol: String, rightTimeCol: String,
           outCol: String = "asof_time"): DataFrame = {
    val spark = leftDf.sparkSession
    Bridge.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = Bridge.analyzed(leftDf)
    val rPlan = Bridge.analyzed(rightDf)
    def attr(p: LogicalPlan, n: String, side: String): Attribute = {
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side column '$n' not found in ${p.output.map(_.name)}"))
      require(a.dataType == LongType, s"$side column '$n' must be LongType, got ${a.dataType}")
      a
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, leftKeyCol, "left"), attr(lPlan, leftTimeCol, "left"),
      attr(rPlan, rightKeyCol, "right"), attr(rPlan, rightTimeCol, "right"),
      AttributeReference(outCol, LongType, nullable = true)())
    Bridge.ofRows(spark, node)
  }
}
