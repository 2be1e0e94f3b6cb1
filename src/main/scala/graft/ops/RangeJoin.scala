package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (bucketed) range joins.
  *
  * Spark has no physical range-join operator: a non-equi predicate like
  * `p.v BETWEEN i.lo AND i.hi` plans as BroadcastNestedLoopJoin — or a
  * full cartesian product when neither side fits a broadcast — O(|L|·|R|)
  * comparisons that melt at 100 TB. The standard distributed fix is
  * BANDING: quantize the value axis into fixed-width bands, equi-join on
  * the band id (a plain shuffle hash join Catalyst already knows how to
  * plan, partition and spill), then re-check the exact predicate as a
  * residual filter. An interval [lo, hi] is exploded into the bands it
  * covers; a point lands in exactly one band, so each matching
  * point–interval pair meets exactly once — no distinct needed. For
  * interval×interval overlap a pair shares every band its intersection
  * covers, so the pair is kept only in the FIRST band of the
  * intersection, restoring exactly-once without a distinct.
  *
  * Pick `bandWidth` near the typical interval width: much wider wastes
  * residual comparisons (false band-mates), much narrower replicates each
  * interval across many bands. Both extremes stay correct; the sweet spot
  * minimizes shuffle volume + filter work. Values must stay within
  * ±2^53·bandWidth (band ids are computed in double space).
  *
  * Null semantics: a null value or bound never matches (inner-join
  * comparisons with null are false), matching SQL.
  *
  * A single interval spanning far more than `maxBandsPerInterval` bands
  * (a mis-chosen width, or a corrupt [0, MAX_LONG] interval in the data)
  * would silently replicate into millions of rows; the explode is guarded
  * by a per-row `raise_error` instead — fail loudly, like the hot-bucket
  * caps in the LSH operators, rather than melt the shuffle.
  *
  * The reference has no range or interval operator (its only non-equi
  * residual is the `antecedent != consequent` theta in association mining,
  * reference: src/association_rule_graph_mining.rs:70-91); this is a
  * beyond-reference operator for the training-data-pipeline layer, same
  * family as the as-of join in [[graft.plans.AsOfJoin]].
  */
object RangeJoin {

  private def bandOf(c: Column, w: Double): Column =
    floor(c.cast("double") / lit(w)).cast("long")

  /** Band ids covered by [lo, hi], guarded against runaway replication. */
  private def bandsOf(lo: String, hi: String, w: Double, maxBands: Int): Column = {
    val first = bandOf(col(lo), w)
    val last = bandOf(col(hi), w)
    explode(when(last - first < maxBands, sequence(first, last))
      .otherwise(raise_error(concat(
        lit(s"range join interval spans >= $maxBands bands of width $w: ["),
        col(lo), lit(", "), col(hi),
        lit("] — raise bandWidth or maxBandsPerInterval")))))
  }

  /** All (point, interval) pairs with `lo <= v <= hi`, as an equi-join on
    * the band id plus a residual filter. Column names of the two inputs
    * must be disjoint.
    */
  def pointInInterval(points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bandWidth: Double, maxBandsPerInterval: Int = 4096): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(maxBandsPerInterval >= 2, "maxBandsPerInterval must be >= 2")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"column name clash: $clash")
    val p = points.withColumn("__band", bandOf(col(valueCol), bandWidth))
    val iv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__band",
        bandsOf(loCol, hiCol, bandWidth, maxBandsPerInterval))
    p.join(iv, Seq("__band"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__band")
  }

  /** All (left, right) interval pairs that overlap:
    * `lLo <= rHi AND rLo <= lHi` (closed intervals). Exactly-once via the
    * first-band-of-intersection rule. Column names must be disjoint.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bandWidth: Double, maxBandsPerInterval: Int = 4096): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(maxBandsPerInterval >= 2, "maxBandsPerInterval must be >= 2")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"column name clash: $clash")
    def banded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.where(col(lo) <= col(hi))
        .withColumn("__band",
          bandsOf(lo, hi, bandWidth, maxBandsPerInterval))
    banded(left, lLo, lHi).join(banded(right, rLo, rHi), Seq("__band"))
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        // the intersection's first band is within both intervals' band
        // ranges (floor is monotone, max(lLo,rLo) <= min(lHi,rHi)), so
        // every overlapping pair meets in it exactly once
        col("__band") === bandOf(greatest(col(lLo), col(rLo)), bandWidth))
      .drop("__band")
  }
}
