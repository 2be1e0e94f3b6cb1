package graft

import graft.ops.{Splits, Validation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ValidationSplitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rule audit counts violations per rule in one pass") {
    val df = Seq((1L, 0.5), (2L, -0.1), (3L, 1.5), (4L, 0.9))
      .toDF("id", "score")
    val got = Validation.ruleViolations(df, Seq(
        "negative" -> (col("score") < 0.0),
        "over_one" -> (col("score") > 1.0),
        "never" -> lit(false)))
      .as[(String, Long)].collect().toMap
    assert(got == Map("negative" -> 1L, "over_one" -> 1L, "never" -> 0L))
  }

  test("null predicate results count as violations") {
    val df = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "v")
    val got = Validation.ruleViolations(df,
        Seq("v_small" -> (col("v") < 1.0)))
      .as[(String, Long)].collect().toMap
    assert(got == Map("v_small" -> 1L)) // the null row
  }

  test("orphan count finds FK rows without a parent") {
    val child = Seq(1L, 2L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Validation.orphanCount("orphans", child, "fk", parent, "pk")
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("orphans", 1L)))
  }

  test("stratified split hits the exact per-stratum train count") {
    val rows = (1L to 23L).map(i => (i, if (i <= 13) "en" else "fr"))
    val df = rows.toDF("id", "lang")
    val got = Splits.stratifiedSplit(df, "id", Seq("lang"), 4, 5)
      .groupBy("lang", "split").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // en: 13 rows -> floor(10.4)=10 train; fr: 10 -> 8 train
    assert(got == Map(("en", "train") -> 10L, ("en", "test") -> 3L,
      ("fr", "train") -> 8L, ("fr", "test") -> 2L))
  }

  test("split assignment is deterministic and permutation-like") {
    val df = (1L to 50L).map(i => (i, "s")).toDF("id", "g")
    val a = Splits.stratifiedSplit(df, "id", Seq("g"), 1, 2)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Splits.stratifiedSplit(df, "id", Seq("g"), 1, 2)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.values.count(_ == "train") == 25)
    // hash order is not id order: the train set is not just a prefix
    assert(a.filter(_._2 == "train").keys.max > 25L)
  }

  test("zero train fraction sends everything to test") {
    val df = (1L to 5L).map(i => (i, "g")).toDF("id", "g")
    val got = Splits.stratifiedSplit(df, "id", Seq("g"), 0, 1)
      .select("split").as[String].collect()
    assert(got.forall(_ == "test"))
  }
}
