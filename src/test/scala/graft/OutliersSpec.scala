package graft

import graft.ops.Outliers
import org.scalatest.funsuite.AnyFunSuite

class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MAD stats are exact lower-median order statistics") {
    // 1..9 plus a 1000 spike: med = 5th of 10 -> 5;
    // d sorted: 0,1,1,2,2,3,3,4,4,995 -> mad = 5th -> 2; 995 > 3*2
    val rows = ((1L to 9L) :+ 1000L).map(("g", _))
    val got = Outliers.madStats(rows.toDF("grp", "v"), "v", Seq("grp"))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 10L, 5L, 2L, 1L)))
  }

  test("mad = 0 flags every deviating value (constant-metric case)") {
    val rows = Seq(5L, 5L, 5L, 9L).map(("g", _))
    val got = Outliers.madStats(rows.toDF("grp", "v"), "v", Seq("grp"))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 4L, 5L, 0L, 1L)))
  }

  test("groups are independent and flagOutliers marks the right rows") {
    val rows = (((1L to 9L) :+ 1000L).map(("spiky", _)) ++
      (1L to 10L).map(("calm", _)))
    val flagged = Outliers.flagOutliers(rows.toDF("grp", "v"), "v", Seq("grp"))
      .where($"is_outlier")
      .select("grp", "v").as[(String, Long)].collect().toSet
    assert(flagged == Set(("spiky", 1000L)))
  }
}
