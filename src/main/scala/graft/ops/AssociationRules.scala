package graft.ops

import graft.core.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Pairwise co-occurrence association mining, reference-parity.
  *
  * Semantics reproduced from
  * reference: src/association_rule_graph_mining.rs:16-288 (see SURVEY.md
  * §2.2.6), including its quirks:
  *
  *   - support_count = Σ frequency (weighted) / row count (unweighted) over
  *     ALL rows of the item (rs:37-41); valid iff
  *     support_count / countDistinct(tid) >= minSupport (rs:44-55).
  *   - transactions with more than maxItemsetSize rows are skipped for the
  *     pairing pass only; their rows still count toward support (rs:65-68).
  *   - ordered row-level pairs (antecedent row, consequent row) with
  *     different item ids, both items valid (rs:70-91); duplicates
  *     accumulate once per co-occurring row pair.
  *   - confidence: weighted = freq_a * freq_c / support_count(a) (rs:77-78);
  *     unweighted = support_count(a) / total_transactions — NOT a
  *     conditional probability, identical for every consequent (rs:79-81).
  *   - lift_score = Σ confidences of the item's kept associations
  *     (rs:104-112) — not statistical lift. Computed here as one division
  *     of an exact sum instead of a sum of divisions (deterministic across
  *     engines; differs from the reference only at ~1e-12).
  *   - pattern = 1-based id assigned by scanning items in id order and
  *     flood-filling directed reachability over kept associations
  *     (rs:114-135). The reachable item-graph is min-support-bounded, so it
  *     is collected to the driver and partitioned exactly; everything else
  *     stays distributed.
  *   - consequents/confidence_scores = top 5 by confidence descending
  *     (rs:259-266). The reference's tie order is unstable (HashMap
  *     iteration); we deterministically break ties by consequent name
  *     ascending — documented deviation.
  *
  * Output columns: item, support, lift_score, pattern, consequents,
  * confidence_scores — one row per valid item, in item-id order.
  */
object AssociationRules {

  /** @param firstAppearanceOrder item ids by first appearance (reference
    *   parity; row-order dependent, exact on single-partition input). When
    *   false, item ids are assigned lexicographically — order-insensitive,
    *   the mode every distributed query should use.
    */
  case class Params(
      minSupport: Double = 0.01,
      minConfidence: Double = 0.1,
      maxItemsetSize: Int = 50,
      weighted: Boolean = false,
      firstAppearanceOrder: Boolean = true)

  def graphAssociationRules(
      df: DataFrame,
      tidCol: String,
      itemCol: String,
      freqCol: Option[String] = None,
      params: Params = Params()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val projected = freqCol match {
      case Some(f) => df.select(
        col(tidCol).cast("long").as("tid"),
        col(itemCol).cast("string").as("item"),
        col(f).cast("double").as("freq"))
      case None => df.select(
        col(tidCol).cast("long").as("tid"),
        col(itemCol).cast("string").as("item"),
        lit(1.0).as("freq"))
    }
    val ordered =
      if (params.firstAppearanceOrder) Ingest.withRowIdx(projected, "_rid")
      else projected.withColumn("_rid", lit(0L))
    val rows = ordered
      .where($"tid".isNotNull && $"item".isNotNull && $"freq".isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = rows.agg(countDistinct($"tid").cast("double").as("total_tx"))

      val supp = rows.groupBy($"item")
        .agg(sum($"freq").as("wsupp"), count(lit(1)).as("cnt"), min($"_rid").as("first_rid"))
        .crossJoin(broadcast(totals))
        .withColumn("support_count",
          if (params.weighted) $"wsupp" else $"cnt".cast("double"))
      // validItems/kept feed multiple downstream joins AND the returned
      // lazy plan, so they stay persisted past this call (LRU-evicted);
      // only `rows` — consumed entirely within this method — is unpersisted
      val validItems = supp
        .where($"support_count" / $"total_tx" >= lit(params.minSupport))
        .persist(StorageLevel.MEMORY_AND_DISK)

      // pairing pass input: rows of valid items inside small-enough transactions
      val txOk = rows.groupBy($"tid").agg(count(lit(1)).as("tx_n"))
        .where($"tx_n" <= params.maxItemsetSize).select($"tid")
      val vrows = rows
        .join(validItems.select($"item"), Seq("item"), "left_semi")
        .join(txOk, Seq("tid"), "left_semi")

      val pairs = vrows.select($"tid", $"item".as("antecedent"), $"freq".as("freq_a"))
        .join(vrows.select($"tid", $"item".as("consequent"), $"freq".as("freq_c")), Seq("tid"))
        .where($"antecedent" =!= $"consequent")
        .join(validItems.select(
            $"item".as("antecedent"),
            $"support_count".as("supp_a"),
            $"total_tx"),
          Seq("antecedent"))
        .withColumn("confidence",
          if (params.weighted) $"freq_a" * $"freq_c" / $"supp_a"
          else $"supp_a" / $"total_tx")
      val kept = pairs.where($"confidence" >= lit(params.minConfidence))
        .persist(StorageLevel.MEMORY_AND_DISK)

      // lift: exact numerator summed first, single final division
      val lift = (
        if (params.weighted)
          kept.groupBy($"antecedent")
            .agg((sum($"freq_a" * $"freq_c") / first($"supp_a")).as("lift_score"))
        else
          kept.groupBy($"antecedent")
            .agg((count(lit(1)) * first($"supp_a") / first($"total_tx")).as("lift_score"))
      )

      // top-5 consequents per antecedent (confidence desc, consequent asc,
      // duplicate pairs keep their multiplicity — reference semantics,
      // src/association_rule_graph_mining.rs:259-266) via the 5-slot hash
      // aggregate: no window sort of the full kept-pair table, and the
      // buffer's duplicate handling matches row_number's ranking exactly
      val top5 = kept
        .groupBy($"antecedent")
        .agg(graft.functions.TopKByAgg.top_k_by_str(
          $"confidence", $"consequent", 5).as("arr"))
        .select($"antecedent",
          expr("transform(arr, x -> x.payload)").as("consequents"),
          expr("transform(arr, x -> x.score)").as("confidence_scores"))

      val pattern = patternIds(spark, validItems, kept)

      val orderCol = if (params.firstAppearanceOrder) $"first_rid" else $"item"
      validItems
        .join(lift.withColumnRenamed("antecedent", "item"), Seq("item"), "left")
        .join(top5.withColumnRenamed("antecedent", "item"), Seq("item"), "left")
        .join(broadcast(pattern), Seq("item"), "left")
        .select(
          $"item",
          $"support_count".as("support"),
          coalesce($"lift_score", lit(0.0)).as("lift_score"),
          coalesce($"pattern", lit(0)).as("pattern"),
          coalesce($"consequents", array().cast("array<string>")).as("consequents"),
          coalesce($"confidence_scores", array().cast("array<double>")).as("confidence_scores"),
          orderCol.as("_ord"))
        .orderBy($"_ord")
        .drop("_ord")
    } finally rows.unpersist()
  }

  /** Exact replica of the reference's pattern DFS (rs:114-135): scan items
    * in id order; each unvisited valid item starts pattern n and floods its
    * directed reachability set. The item graph is min-support-bounded —
    * collected to the driver (the one deliberately non-distributed step).
    */
  private def patternIds(
      spark: SparkSession, validItems: DataFrame, kept: DataFrame): DataFrame = {
    import spark.implicits._
    val items: Array[String] = validItems
      .select($"item", $"first_rid").orderBy($"first_rid", $"item")
      .select($"item").as[String].collect()
    val edges: Array[(String, String)] = kept
      .select($"antecedent", $"consequent").distinct()
      .as[(String, String)].collect()
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val patternOf = mutable.LinkedHashMap.empty[String, Int]
    var next = 1
    for (start <- items) {
      if (!patternOf.contains(start)) {
        val stack = mutable.Stack(start)
        while (stack.nonEmpty) {
          val it = stack.pop()
          if (!patternOf.contains(it)) {
            patternOf(it) = next
            adj.getOrElse(it, Array.empty).foreach { n =>
              if (!patternOf.contains(n)) stack.push(n)
            }
          }
        }
        next += 1
      }
    }
    patternOf.toSeq.toDF("item", "pattern")
  }
}
