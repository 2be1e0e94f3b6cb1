package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end training-data curation: the composite pipeline the
  * individual operators exist for. One declarative plan — Catalyst fuses
  * the stat computation, filters and dedup join; nothing materializes on
  * the driver.
  *
  *   1. exact dedup (content hash, keep smallest id)
  *   2. near-dedup (word-n-gram Jaccard; drop the larger id of each pair)
  *   3. quality gate (token stats + [[TextStats.qualityScore]])
  *   4. language id column for downstream partitioning
  */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, jaccardThreshold: Double = 0.8,
      shingleSize: Int = 3): DataFrame = {
    // 1. exact: keep the smallest id per content hash
    val keep = Dedup.exactDuplicates(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    // feeds the near-dup pair generation AND the survivor anti-join AND the
    // stat pass — persist or the scan+hash+semi-join subtree runs 3×
    // (left to LRU eviction; the returned plan reads it lazily)
    val exactDeduped = docs.join(keep, Seq(idCol), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 2. near-dup pairs: drop the larger id of every surviving pair
    val nearDupLosers = Dedup.ngramJaccardPairs(
        exactDeduped, idCol, textCol, shingleSize, jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exactDeduped.join(nearDupLosers, Seq(idCol), "left_anti")

    // 3+4. quality gate + language id
    TextStats.withTokenStats(nearDeduped, textCol)
      .withColumn("quality", TextStats.qualityScore)
      .where(col("quality") >= lit(minQuality))
      .withColumn("lang_pred", TextStats.langId(textCol))
      .drop("n_tokens", "n_chars", "n_distinct", "n_stop")
  }
}
