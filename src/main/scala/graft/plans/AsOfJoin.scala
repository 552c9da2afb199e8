package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanApi

/** Native AS-OF join — the whole-operator Catalyst tier (logical node +
  * planner strategy + physical exec), for the one relational operator
  * the reference's analytics need that Spark genuinely lacks (DuckDB
  * ships `ASOF JOIN`; Spark users hand-roll it).
  *
  * Semantics: for every left row, join the single right row with an
  * equal key and the greatest right time <= the left row's time
  * (ties on right time broken by `rightTiebreak` ascending — the last
  * in tiebreak order wins, i.e. the MAX tiebreak, matching DuckDB's
  * behavior on deduplicated inputs). `outer = true` keeps unmatched
  * left rows with nulls on the right.
  *
  * Scale shape: the exec declares `ClusteredDistribution` on both key
  * sets and per-partition ordering (key, time) — EnsureRequirements
  * then plans ONE hash shuffle per side and a sort-within-partitions,
  * exactly the cost of a sort-merge equi-join; the merge itself is a
  * single forward pass holding ONE buffered right row — O(1) state per
  * partition, no window buffer, no unioned relation. At 100 TB both
  * sides stream through hash-partitioned by key; AQE still owns the
  * shuffle partition counts.
  *
  * Null times: rows whose time expression is null sort first and a null
  * right time compares <= everything (natural null-first ordering) —
  * filter them out upstream if that is not intended. Null KEYS follow
  * SQL join equality: they never match (left null-key rows are
  * unmatched; kept with nulls under `outer`).
  *
  * Skew: AQE's OptimizeSkewedJoin only rewrites Spark's own join
  * execs, so a pathological hot key here needs upstream salting (see
  * `q_salted_skew_join`) — same as any custom operator.
  */
object AsOfJoin {

  /** Build the as-of join as a DataFrame. Key/time/tiebreak columns
    * must belong to `left`/`right` respectively (use `df.col(...)` so
    * the attributes arrive resolved; both sides may share names).
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      outer: Boolean = false): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "as-of join needs matching non-empty key lists")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // Spark's analyzer deduplicates exprIds for ITS Join node
    // (DeduplicateRelations); a custom node gets no such pass, and
    // shared attribute ids would silently bind right-side output
    // columns to left-side ordinals. Refuse loudly instead.
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join sides share attributes (self-join or common lineage); " +
        "alias one side's columns first, e.g. df.select(cols.map(c => col(c).as(\"r_\" + c)))")
    val lk = leftKeys.map(PlanApi.expr)
    val rk = rightKeys.map(PlanApi.expr)
    val lt = PlanApi.expr(leftTime)
    val rt = PlanApi.expr(rightTime)
    // the merge compares with orderings built from the LEFT types —
    // a type mismatch would mis-read the right side's row layout at
    // runtime, so reject it at construction
    lk.zip(rk).zipWithIndex.foreach { case ((l, r), i) =>
      require(l.dataType == r.dataType,
        s"as-of join key $i type mismatch: ${l.dataType.catalogString} vs " +
          r.dataType.catalogString)
    }
    require(lt.dataType == rt.dataType,
      s"as-of join time type mismatch: ${lt.dataType.catalogString} vs " +
        rt.dataType.catalogString)
    val plan = AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
      rightTiebreak.map(PlanApi.expr), outer)
    PlanApi.ofRows(left.sparkSession, plan)
  }
}

/** Logical AS-OF join node: pure description, no execution strategy —
  * the planner strategy below picks the physical merge implementation.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression], outer: Boolean)
  extends BinaryNode {

  // only an OUTER as-of join can null-extend the right side; the inner
  // form must not widen nullability (writers and not-null contracts
  // downstream read this schema)
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, outer) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical merge as-of join. Children arrive hash-partitioned on the
  * keys and sorted by (keys, time[, tiebreak]) — both guaranteed by the
  * declared requirements, so `doExecute` is a zip of co-partitions with
  * a single forward merge pass per partition pair.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression], outer: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val nRightCols = right.output.size
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val allOut = output
    val isOuter = outer
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against `output` itself: under `outer` that is the NULLABLE
      // view of the right side (an outer match feeds an all-null row, and
      // binding against the child's original non-nullable attributes
      // would elide the null checks — nulls silently read as 0/false);
      // inner never feeds null rows, so the tight schema is safe
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRightCols)

      new Iterator[InternalRow] {
        // one buffered right row (iterators reuse row buffers: rHead is
        // valid until the next rIter.next(); the retained match and its
        // key are copies)
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var lastMatch: InternalRow = null
        private var lastMatchKey: InternalRow = null
        private var ready: InternalRow = null

        private def computeNext(): Unit = {
          while (ready == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTimeRow = lTimeProj(l).copy() // survives rTimeProj calls below
            // consume every right row at-or-before this left row; the
            // LAST one with an equal key is the as-of match (right side
            // is (key, time, tiebreak)-sorted, so later = greater)
            var advancing = true
            while (advancing && rHead != null) {
              val rKey = rKeyProj(rHead)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                rHead = if (rIter.hasNext) rIter.next() else null
              } else if (c == 0 && timeOrd.compare(rTimeProj(rHead), lTimeRow) <= 0) {
                lastMatch = rHead.copy()
                lastMatchKey = rKey.copy()
                rHead = if (rIter.hasNext) rIter.next() else null
              } else {
                advancing = false
              }
            }
            // SQL join equality never matches NULL keys: a null-key
            // left row is unmatched even though the natural ordering
            // would compare null == null (right null-key rows sort
            // first and are consumed by the c < 0 branch unmatched —
            // except against a null-key left row, which this guards)
            val matched =
              !lKey.anyNull && lastMatch != null &&
                keyOrd.compare(lastMatchKey, lKey) == 0
            if (matched) {
              ready = resultProj(joined(l, lastMatch))
            } else if (isOuter) {
              ready = resultProj(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = { computeNext(); ready != null }
        override def next(): InternalRow = {
          computeNext()
          if (ready == null) throw new NoSuchElementException("next on empty iterator")
          val r = ready; ready = null; r
        }
      }
    }
  }
}
