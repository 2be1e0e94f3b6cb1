package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter-style record linkage — probabilistic entity
  * resolution between two tables: candidate pairs from an equality
  * BLOCKING key, a per-field agreement vector, and a total match score
  * as the sum of per-field log-odds weights (supplied as INTEGER
  * deci-ban literals — the classical m/u-probability ratios are
  * trained offline; this operator is the scoring pass). Pairs are
  * classified link / possible / non-link by two thresholds, and
  * everything below `minScore` is dropped so the output is
  * candidate-sized, not block-cross-product-sized.
  *
  * Comparators are (columnA, columnB, wAgree, wDisagree) — agreement is
  * plain equality of the (caller-normalized) column expressions, NULLs
  * never agree and score the disagreement weight.
  *
  * Scale shape: the cross product exists only WITHIN blocks — pick
  * blocking keys so max block size stays bounded (at corpus scale:
  * composite keys, or feed the pair stream from an LSH/sorted-
  * neighborhood candidate generator instead); scoring itself is one
  * codegen projection over the joined pairs, no shuffle beyond the
  * block join.
  *
  * Output: (idA, idB, score_db, klass) with klass in
  * {'link', 'possible'} (non-links are the dropped rows).
  */
object RecordLinkage {

  final case class Comparator(colA: Column, colB: Column,
      wAgree: Long, wDisagree: Long)

  def scorePairs(dfA: DataFrame, idA: String, dfB: DataFrame, idB: String,
      blockA: Column, blockB: Column, comparators: Seq[Comparator],
      linkThreshold: Long, possibleThreshold: Long): DataFrame = {
    require(comparators.nonEmpty, "need at least one comparator")
    require(possibleThreshold <= linkThreshold,
      s"possibleThreshold ($possibleThreshold) must be <= linkThreshold ($linkThreshold)")
    val a = dfA.select((col(idA).as("id_a") +: blockA.as("__blk") +:
      comparators.zipWithIndex.map { case (c, i) => c.colA.as(s"__a$i") }): _*)
    val b = dfB.select((col(idB).as("id_b") +: blockB.as("__blk") +:
      comparators.zipWithIndex.map { case (c, i) => c.colB.as(s"__b$i") }): _*)
    val score = comparators.zipWithIndex.map { case (c, i) =>
      // NULL-safe: <=> is false on NULL vs value and TRUE on NULL vs
      // NULL — treat NULL<=>NULL as non-agreement too (no evidence)
      when(col(s"__a$i").isNotNull && col(s"__b$i").isNotNull &&
        col(s"__a$i") === col(s"__b$i"), lit(c.wAgree))
        .otherwise(lit(c.wDisagree))
    }.reduce(_ + _)
    a.join(b, Seq("__blk"))
      .select(col("id_a"), col("id_b"), score.as("score_db"))
      .where(col("score_db") >= possibleThreshold)
      .withColumn("klass",
        when(col("score_db") >= linkThreshold, lit("link"))
          .otherwise(lit("possible")))
  }
}
