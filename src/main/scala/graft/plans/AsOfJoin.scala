package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.LongType

/** Native AS-OF JOIN — the canonical "operator Spark lacks".
  *
  * For every left row, find the single right row with the same key and the
  * greatest time <= left time (backward as-of; strictlyBefore makes it <),
  * with `forward` the smallest time >= left time, or with `nearest` the
  * minimum |Δt| (ties to the earlier row). An optional `tolerance` bounds
  * how far the matched time may be from the left time.
  * Left-outer semantics: unmatched left rows keep nulls on the right.
  *
  * Spark's own pandas-API as-of (logical `AsOfJoin`) is REWRITTEN by the
  * optimizer into join + aggregation over all time-matching pairs — at N
  * right rows per key that intermediate is O(L·N) per key. This operator
  * instead plans a dedicated sort-merge physical node:
  *
  *   - both sides hash-partition by key (`ClusteredDistribution`, the same
  *     co-partitioning contract as SortMergeJoin — EnsureRequirements
  *     inserts the exchanges/sorts),
  *   - each co-partition pair is merged in ONE streaming pass holding
  *     exactly one candidate right row — O(L + R) time, O(1) state, no
  *     pair blow-up, no per-key window sort.
  *
  * At 100 TB that difference is decisive: the merge never materializes
  * more than a row per side, so skewed keys cost only their scan time.
  *
  * Registered via [[graft.GraftExtensions]] (injectPlannerStrategy) or
  * auto-registered in `spark.experimental.extraStrategies` by the
  * [[AsOfJoin.asofBackward]] API.
  *
  * Times must be integer (long) — callers pass epoch-µs (graft convention,
  * see Tables.events). Right rows with null time never match; left rows
  * with null time emit nulls.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strictlyBefore: Boolean,
    forward: Boolean = false, tolerance: Long = -1L,
    nearest: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict, fwd, tol, near) =>
      AsOfJoinExec(lk, rk, lt, rt, strict, fwd, tol, near,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, strictlyBefore: Boolean,
    forward: Boolean, tolerance: Long, nearest: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same co-partitioning contract as shuffled equi-joins
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // merge needs both sides sorted by (key, time) inside each partition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // streamed-side-preserving, like a left-outer sort-merge join
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    require(leftTime.dataType == LongType && rightTime.dataType == LongType,
      "as-of times must be long (epoch-µs)")
    val strict = strictlyBefore
    val fwd = forward
    val tol = tolerance
    val near = nearest
    require(!(near && strict), "nearest as-of does not support strict mode")
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTime = BindReferences.bindReference(leftTime, left.output)
      val rTime = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // parents (collect, shuffle) require UnsafeRow output
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // one-row lookahead on the right, plus (backward only) the current
        // best candidate
        private var rNext: InternalRow = advanceRight()
        private var rNextKey: InternalRow = if (rNext == null) null else rKeyProj(rNext).copy()
        private var held: InternalRow = _
        private var heldKey: InternalRow = _
        private var heldTime: Long = _

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            val t = rTime.eval(r)
            // SQL join semantics: null never equals null — rows with a null
            // key (or time) can't match anything, drop them here
            if (t != null && !rKeyProj(r).anyNull) return r.copy() // held across calls — must copy
          }
          null
        }
        private def stepRight(): Unit = {
          rNext = advanceRight()
          rNextKey = if (rNext == null) null else rKeyProj(rNext).copy()
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTime.eval(l)
          // null key or time on the left matches nothing (null ≠ null)
          if (lt == null || lk.anyNull) return resultProj(joined(l, nullRight))
          val ltv = lt.asInstanceOf[Long]
          if (near) nextNearest(l, lk, ltv)
          else if (fwd) nextForward(l, lk, ltv)
          else nextBackward(l, lk, ltv)
        }

        /** Nearest: both candidates at once — the held row (greatest right
          * time <= left time, maintained exactly as in backward mode) and
          * the lookahead row (smallest right time > left time, exactly as
          * in forward mode). Whichever is closer in time wins; a tie goes
          * to the backward row (the earlier event). Still one pass, still
          * O(1) state. */
        private def nextNearest(l: InternalRow, lk: InternalRow,
            ltv: Long): InternalRow = {
          var done = false
          while (!done && rNext != null) {
            val c = keyOrd.compare(rNextKey, lk)
            if (c < 0) stepRight()
            else if (c == 0) {
              val rtv = rTime.eval(rNext).asInstanceOf[Long]
              if (rtv <= ltv) {
                held = rNext; heldKey = rNextKey; heldTime = rtv
                stepRight()
              } else done = true
            } else done = true
          }
          val bOk = held != null && keyOrd.compare(heldKey, lk) == 0 &&
            (tol < 0L || ltv - heldTime <= tol)
          var fOk = false
          var fDelta = 0L
          if (rNext != null && keyOrd.compare(rNextKey, lk) == 0) {
            fDelta = rTime.eval(rNext).asInstanceOf[Long] - ltv
            fOk = tol < 0L || fDelta <= tol
          }
          if (bOk && (!fOk || ltv - heldTime <= fDelta))
            resultProj(joined(l, held))
          else if (fOk) resultProj(joined(l, rNext))
          else resultProj(joined(l, nullRight))
        }

        /** Backward: the held row is the greatest right time <= (or <) left
          * time for the current key; new valid candidates supersede it. */
        private def nextBackward(l: InternalRow, lk: InternalRow,
            ltv: Long): InternalRow = {
          var done = false
          while (!done && rNext != null) {
            val c = keyOrd.compare(rNextKey, lk)
            if (c < 0) stepRight() // right key behind every future left row's
            else if (c == 0) {
              val rtv = rTime.eval(rNext).asInstanceOf[Long]
              val ok = if (strict) rtv < ltv else rtv <= ltv
              if (ok) { // newer valid candidate supersedes the held one
                held = rNext; heldKey = rNextKey; heldTime = rtv
                stepRight()
              } else done = true // right too new for this left row — keep for later
            } else done = true // right key ahead — no candidates for lk
          }
          if (held != null && keyOrd.compare(heldKey, lk) == 0 &&
              (tol < 0L || ltv - heldTime <= tol))
            resultProj(joined(l, held))
          else resultProj(joined(l, nullRight))
        }

        /** Forward: the match is the FIRST right row at this key with time
          * >= (or >) left time — exactly the lookahead row once everything
          * older is consumed. It is NOT consumed on match: later left rows
          * (larger times, same sort) may match the same right row. No held
          * state at all — older rights can never match a later left. */
        private def nextForward(l: InternalRow, lk: InternalRow,
            ltv: Long): InternalRow = {
          var done = false
          while (!done && rNext != null) {
            val c = keyOrd.compare(rNextKey, lk)
            if (c < 0) stepRight() // right key exhausted for all future lefts
            else if (c == 0) {
              val rtv = rTime.eval(rNext).asInstanceOf[Long]
              val tooOld = if (strict) rtv <= ltv else rtv < ltv
              if (tooOld) stepRight() // can't match this or any later left
              else done = true // first candidate at/after ltv — the match
            } else done = true // right key ahead — no candidates for lk
          }
          if (rNext != null && keyOrd.compare(rNextKey, lk) == 0) {
            val rtv = rTime.eval(rNext).asInstanceOf[Long]
            if (tol < 0L || rtv - ltv <= tol)
              return resultProj(joined(l, rNext))
          }
          resultProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API. */
object AsOfJoin {

  /** Ensure the planner knows the strategy even in sessions built without
    * [[graft.GraftExtensions]]. Idempotent. */
  private[graft] def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    synchronized {
      val em = spark.experimental
      if (!em.extraStrategies.contains(AsOfJoinStrategy))
        em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
    }

  /** Backward as-of join: each left row picks the right row with equal
    * `keys` and the greatest `rightTime` <= `leftTime` (< when
    * `strictlyBefore`); unmatched left rows keep null right columns.
    * Time columns must be long epoch-µs. Right columns that clash with a
    * left column name are suffixed `_r`; all right outputs get fresh
    * attribute ids, so self-as-of-joins (df against a filtered view of
    * itself) work.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      strictlyBefore: Boolean = false): DataFrame =
    asof(left, right, keys, leftTime, rightTime, direction = "backward",
      strict = strictlyBefore)

  /** Forward as-of join: each left row picks the right row with equal
    * `keys` and the SMALLEST `rightTime` >= `leftTime` (> when `strict`). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, strict: Boolean = false,
      tolerance: Long = -1L): DataFrame =
    asof(left, right, keys, leftTime, rightTime, direction = "forward",
      strict = strict, tolerance = tolerance)

  /** Nearest as-of join: each left row picks the right row with equal
    * `keys` minimizing |rightTime - leftTime|; ties go to the earlier
    * (backward) row. Strict mode is not supported for nearest. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Long = -1L): DataFrame =
    asof(left, right, keys, leftTime, rightTime, direction = "nearest",
      tolerance = tolerance)

  /** General as-of join.
    *
    * @param direction "backward" (greatest right time <= left time),
    *   "forward" (smallest right time >= left time), or "nearest"
    *   (min |Δt|, ties backward; strict unsupported)
    * @param strict exclude time-equal rows (strictly before / after)
    * @param tolerance when >= 0, a match additionally requires
    *   |leftTime - rightTime| <= tolerance (in the time column's own unit,
    *   epoch-µs by graft convention); rows whose nearest candidate is
    *   further away emit nulls. Negative = unbounded (default).
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, direction: String = "backward",
      strict: Boolean = false, tolerance: Long = -1L): DataFrame = {
    val (forward, nearest) = direction match {
      case "backward" => (false, false)
      case "forward" => (true, false)
      case "nearest" => (false, true)
      case other => throw new IllegalArgumentException(
        s"as-of direction must be backward|forward|nearest, got '$other'")
    }
    require(!(nearest && strict), "nearest as-of does not support strict mode")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lNames = left.columns.toSet
    // Clash-suffix that is guaranteed fresh: "_r" alone can itself collide
    // (left has x, right has x and x_r → two x_r columns and attrs() binds
    // the wrong one), so extend until no renamed column lands on an
    // existing name on either side.
    val allNames = lNames ++ right.columns
    val suffix = Iterator.iterate("_r")(_ + "_r")
      .find(s => right.columns.forall(c =>
        !lNames.contains(c) || !allNames.contains(c + s))).get
    // fresh exprIds via aliases (self-join safe) + clash-free names
    val rSafe = right.select(right.columns.map { c =>
      val name = if (lNames.contains(c)) c + suffix else c
      right(c).as(name)
    }.toIndexedSeq: _*)
    val rTimeName = if (lNames.contains(rightTime)) rightTime + suffix else rightTime
    val lPlan = planOf(left)
    val rPlan = planOf(rSafe)
    def attrs(plan: LogicalPlan, names: Seq[String]): Seq[Expression] =
      names.map(n => plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found")))
    val node = AsOfJoinPlan(lPlan, rPlan,
      attrs(lPlan, keys), attrs(rPlan, keys.map(k => if (lNames.contains(k)) k + suffix else k)),
      attrs(lPlan, Seq(leftTime)).head, attrs(rPlan, Seq(rTimeName)).head,
      strict, forward, tolerance, nearest)
    shims.dataFrameOf(spark, node)
  }

  private def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
