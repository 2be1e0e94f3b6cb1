package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequential pattern mining (PrefixSpan's core question, bounded):
  * which ordered behaviors — a, a→b, a→b→c — occur, as a SUBSEQUENCE
  * with arbitrary gaps, in how many users' event streams? This is the
  * "do users who search then click then buy" primitive contiguous
  * n-grams ([[Transitions]], event n-grams) cannot answer.
  *
  * Containment is decided by GREEDY-EARLIEST matching — anchor at the
  * first a, then the first b after it, then the first c after that —
  * which is complete for subsequence existence (if any witness exists,
  * the earliest one does) and, being a pure min-chain, replays
  * hash-exactly in the SQL oracle.
  *
  * Scale contract: per-user state is alphabet-bounded, NOT stream-
  * bounded — the pair stage carries ≤ |A|² rows per user regardless of
  * event count, and the loud `maxAlphabet` gate keeps the pattern
  * space (≤ |A|³) a dimension, not data. Every stage is a user-keyed
  * join + partial-aggregated min; no windows, no driver state.
  *
  * Output: (pattern, len, support) for patterns with support ≥
  * `minSupport`, support = number of distinct users containing the
  * pattern.
  */
object SeqMining {

  def frequentSequences(df: DataFrame, userCol: String, itemCol: String,
      tsCol: String, minSupport: Long = 1L,
      maxAlphabet: Int = 64): DataFrame = {
    require(maxAlphabet >= 1 && maxAlphabet <= 1024,
      s"maxAlphabet must be in [1, 1024], got $maxAlphabet")
    val ev = df.select(col(userCol).cast("string").as("u"),
        col(itemCol).cast("string").as("it"), col(tsCol).cast("long").as("t"))
      .where(col("u").isNotNull && col("it").isNotNull && col("t").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nItems = ev.select("it").distinct().limit(maxAlphabet + 1).count()
    require(nItems <= maxAlphabet,
      s"frequentSequences: alphabet exceeds $maxAlphabet items — the " +
        "pattern space is cubic in the alphabet; bucket items first")
    val first = ev.groupBy("u", "it").agg(min(col("t")).as("t1"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pair = first.select(col("u"), col("it").as("a"), col("t1"))
      .join(ev.select(col("u"), col("it").as("b"), col("t")), Seq("u"))
      .where(col("t") > col("t1"))
      .groupBy("u", "a", "b").agg(min(col("t")).as("t2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val triple = pair
      .join(ev.select(col("u"), col("it").as("c"), col("t")), Seq("u"))
      .where(col("t") > col("t2"))
      .groupBy("u", "a", "b", "c").agg(min(col("t")).as("t3"))
    val s1 = first.groupBy(col("it").as("pattern"))
      .agg(count(lit(1)).as("support"))
      .select(col("pattern"), lit(1L).as("len"), col("support"))
    val s2 = pair.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      .select(concat(col("a"), lit(">"), col("b")).as("pattern"),
        lit(2L).as("len"), col("support"))
    val s3 = triple.groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("support"))
      .select(concat(col("a"), lit(">"), col("b"), lit(">"), col("c"))
        .as("pattern"), lit(3L).as("len"), col("support"))
    s1.union(s2).union(s3)
      .where(col("support") >= minSupport)
      .orderBy(col("support").desc, col("pattern"))
  }
}
