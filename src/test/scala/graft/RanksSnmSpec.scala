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
