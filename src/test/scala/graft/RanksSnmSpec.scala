package graft

import graft.ops.{Dedup, Ranks}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RanksSnmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalRowNumber equals the single-partition window row_number") {
    val df = (1 to 500).map(i => (i.toLong, (i * 7919 % 1000).toLong))
      .toDF("id", "v")
    val viaWindow = df.withColumn("grn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val viaRanks = Ranks.globalRowNumber(df, Seq("v", "id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaRanks == viaWindow)
  }

  test("numbering is invariant to the input partitioning") {
    val df = (1 to 300).map(i => (i.toLong, (i * 31 % 97).toLong)).toDF("id", "v")
    val a = Ranks.globalRowNumber(df.repartition(1), Seq("v", "id"))
      .as[(Long, Long, Long)].collect().toSet
    val b = Ranks.globalRowNumber(df.repartition(13), Seq("v", "id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("globalCumSums equals the single-partition window running sums") {
    val df = (1 to 400).map(i =>
        ((i * 7919 % 211).toLong, (i % 13).toLong, (i % 5).toLong))
      .toDF("k", "a", "b")
      .groupBy("k").agg(sum("a").as("a"), sum("b").as("b"))
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = df
      .select(col("k"), col("a"), col("b"),
        sum("a").over(w).as("cum_a"), sum("b").over(w).as("cum_b"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaRanks = Ranks.globalCumSums(df, Seq("k"), Seq("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viaRanks == viaWindow)
  }

  test("globalCumSums is invariant to input partitioning; empty input ok") {
    val df = (1 to 97).map(i => ((i * 31 % 89).toLong, i.toLong))
      .toDF("k", "a").groupBy("k").agg(sum("a").as("a"))
    val one = Ranks.globalCumSums(df.repartition(1), Seq("k"), Seq("a"))
      .as[(Long, Long, Long)].collect().toSet
    val many = Ranks.globalCumSums(df.repartition(17), Seq("k"), Seq("a"))
      .as[(Long, Long, Long)].collect().toSet
    assert(one == many)
    val empty = Ranks.globalCumSums(
      Seq.empty[(Long, Long)].toDF("k", "a"), Seq("k"), Seq("a"))
    assert(empty.count() == 0)
  }

  test("globalCumSums rejects non-long sum columns and name collisions") {
    val bad = Seq((1L, 2.0)).toDF("k", "a")
    assert(intercept[IllegalArgumentException] {
      Ranks.globalCumSums(bad, Seq("k"), Seq("a"))
    }.getMessage.contains("LongType"))
    val clash = Seq((1L, 2L, 3L)).toDF("k", "a", "cum_a")
    assert(intercept[IllegalArgumentException] {
      Ranks.globalCumSums(clash, Seq("k"), Seq("a"))
    }.getMessage.contains("cum_a"))
  }

  test("rank column collision is rejected loudly") {
    val df = Seq((1L, 2L)).toDF("grn", "v")
    val ex = intercept[IllegalArgumentException] {
      Ranks.globalRowNumber(df, Seq("v"))
    }
    assert(ex.getMessage.contains("grn"))
  }

  test("SNM finds prefix-adjacent near-dups and misses far-sorted ones") {
    // docs 1/2 share a long prefix (adjacent under the prefix sort) and
    // are near-identical; doc 4 is the same text as 1 but with a
    // different FIRST token, so it sorts far away -> blocked out (the
    // documented recall trade of sorted-neighborhood blocking)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta theta"),
      (3L, "totally different words here nothing shared"),
      (4L, "zz alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        window = 1, n = 3, thresholdPermille = 500)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    // widening the window past the sort distance recovers the pair 1-4:
    // ranks under the prefix sort are 1:(1,2) then 3, then 4 — distance 3
    val wide = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
        window = 3, n = 3, thresholdPermille = 500)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wide.contains((1L, 4L)))
  }
}
