package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Native as-of join — the full custom-operator tier (SURVEY §2.3 (c)):
  * logical node + planner strategy + physical `SparkPlan`, versus the
  * union+window composition in [[graft.operators.AsOf]].
  *
  * Physical algorithm: both sides hash-partitioned on the key and sorted by
  * (key, ts) — requirements declared to `EnsureRequirements`, so Catalyst
  * inserts exactly the exchanges/sorts needed and reuses existing ones —
  * then a single streamed merge per partition: for each left row, advance
  * the right cursor through rows with (key, ts) strictly below, remembering
  * only the latest payload per key. O(|L|+|R|) time, O(1) state — at
  * 100 TB this is one co-partitioned shuffle, the same cost envelope as a
  * sort-merge join, with none of the range-join blowup.
  *
  * Semantics match AsOf.asOfJoin and DuckDB `ASOF LEFT JOIN ... ON l.k=r.k
  * AND l.ts > r.ts`: strictly-prior, latest wins, null when none. Keys and
  * timestamps are assumed non-null (as in both references).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Attribute],
    // constructor arg (NOT a derived val): exprIds must survive the copy()
    // calls plan transformations make, or upstream references dangle
    payloadOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right), p.leftKey,
        p.rightKey, p.leftTs, p.rightTs, p.payload, p.payloadOut) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Attribute], payloadOut: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    // payload columns break (key, ts) ties deterministically: the streamed
    // "latest wins" then always returns the max payload tuple, matching
    // the union+window composition's tie-break
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  // the clustering this node just required (and paid a shuffle for) is
  // preserved — report it so a downstream groupBy/join on the key reuses
  // the partitioning instead of exchanging 100 TB again
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable values — projections and orderings are
    // constructed per-partition on the executor
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val payloadExprs = payload
    val rOutput = right.output
    val payloadArity = payload.length
    val resultSchema = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOutput)
      val out = UnsafeProjection.create(resultSchema, resultSchema)
      val joined = new JoinedRow
      val nullPayload = InternalRow.fromSeq(Seq.fill(payloadArity)(null))
      // right rows are held across left-row steps → copy on buffer
      val rBuf = rIt.map(r => r.copy()).buffered
      var lastKey: Any = null
      var lastPayload: InternalRow = null
      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTsB.eval(l)
        // advance rights with (key, ts) strictly below (lk, lt)
        var continue = rBuf.hasNext
        while (continue) {
          val r = rBuf.head
          val rk = rKeyB.eval(r)
          val kc = keyOrd.compare(rk.asInstanceOf[AnyRef],
            lk.asInstanceOf[AnyRef])
          val take = kc < 0 ||
            (kc == 0 && tsOrd.compare(rTsB.eval(r).asInstanceOf[AnyRef],
              lt.asInstanceOf[AnyRef]) < 0)
          if (take) {
            lastKey = rk
            lastPayload = payloadProj(r).copy()
            rBuf.next()
            continue = rBuf.hasNext
          } else continue = false
        }
        val matched = lastPayload != null && lastKey != null &&
          keyOrd.compare(lastKey.asInstanceOf[AnyRef],
            lk.asInstanceOf[AnyRef]) == 0
        out(joined(l, if (matched) lastPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** DataFrame-level API over the native operator. `payloadCols` emerge as
    * `prior_<name>`, nullable. Requires the strategy to be installed
    * (GraftExtensions, or spark.experimental.extraStrategies). */
  def asOfJoinNative(leftDf: DataFrame, rightDf: DataFrame, key: String,
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = leftDf.sparkSession
    val lPlan = GraftSqlBridge.analyzed(leftDf)
    val rPlan0 = GraftSqlBridge.analyzed(rightDf)
    // self-join safety: both sides often derive from the same base relation
    // and then SHARE attribute exprIds; the analyzer's DeduplicateRelations
    // doesn't know our node, so re-alias the right side with fresh exprIds
    val rAliases = rPlan0.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rPlan0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val payload = payloadCols.map(attr(rPlan, _))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, tsCol), attr(rPlan, tsCol),
      payload,
      payload.map(a =>
        AttributeReference(s"prior_${a.name}", a.dataType, nullable = true)())))
  }
}
