package graft

import graft.ops.TokenBudget
import org.scalatest.funsuite.AnyFunSuite

class TokenBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def alloc(rows: Seq[(String, Long)], budget: Long)
      : Map[String, (Long, Long)] =
    TokenBudget.allocate(rows.toDF("g", "n"), "g", "n", budget)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("exact proportions allocate with zero remainder") {
    assert(alloc(Seq(("a", 5L), ("b", 3L), ("c", 2L)), 10L) ==
      Map("a" -> ((5L, 5L)), "b" -> ((3L, 3L)), "c" -> ((2L, 2L))))
  }

  test("largest remainders get the leftover units") {
    // fl: a=3 rem 5, b=2 rem 1, c=1 rem 4; extra=1 -> a
    assert(alloc(Seq(("a", 5L), ("b", 3L), ("c", 2L)), 7L) ==
      Map("a" -> ((5L, 4L)), "b" -> ((3L, 2L)), "c" -> ((2L, 1L))))
  }

  test("remainder ties break by group key ascending") {
    // both rem 1; extra=1 -> 'a' wins deterministically
    assert(alloc(Seq(("b", 1L), ("a", 1L)), 3L) ==
      Map("a" -> ((1L, 2L)), "b" -> ((1L, 1L))))
  }

  test("quotas always sum to the budget exactly") {
    for (budget <- Seq(1L, 13L, 97L, 1000003L)) {
      val got = alloc((1 to 7).map(i => (s"g$i", i.toLong * 3 + 1)), budget)
      assert(got.values.map(_._2).sum == budget, s"budget $budget")
      assert(got.values.forall(_._2 >= 0))
    }
  }

  test("rows aggregate per group before apportioning") {
    assert(alloc(Seq(("a", 2L), ("a", 3L), ("b", 3L), ("c", 2L)), 10L) ==
      Map("a" -> ((5L, 5L)), "b" -> ((3L, 3L)), "c" -> ((2L, 2L))))
  }

  test("budget 0 allocates all zeros; zero total with budget > 0 is loud") {
    assert(alloc(Seq(("a", 4L)), 0L) == Map("a" -> ((4L, 0L))))
    val boom = intercept[Exception] {
      alloc(Seq(("a", 0L), ("b", 0L)), 5L)
    }
    assert(boom.getMessage.contains("total size is zero"))
  }

  test("null group keys are dropped, not a domain") {
    val df = Seq((Option.empty[String], 9L), (Some("a"), 1L))
      .toDF("g", "n")
    val got = TokenBudget.allocate(df, "g", "n", 4L)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 4L)))
  }
}
