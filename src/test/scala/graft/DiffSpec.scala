package graft

import graft.ops.Diff
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("added / removed / changed / unchanged classification") {
    val old = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val nw = Seq((2L, 99L), (3L, 30L), (4L, 40L)).toDF("k", "v")
    val got = Diff.diffSnapshots(old, nw, Seq("k"), Seq("v"))
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._2 -> ((r._1, r._3, r._4))).toMap
    assert(got == Map(
      1L -> (("removed", Some(10L), None)),
      2L -> (("changed", Some(20L), Some(99L))),
      4L -> (("added", None, Some(40L)))))
    // key 3 unchanged -> absent
  }

  test("null values diff with null-safe equality") {
    val old = Seq((1L, Some(5L)), (2L, None)).toDF("k", "v")
    val nw = Seq((1L, Option.empty[Long]), (2L, None)).toDF("k", "v")
    val got = Diff.diffSnapshots(old, nw, Seq("k"), Seq("v"))
      .as[(String, Long, Option[Long], Option[Long])].collect().toSeq
    // key 1: 5 -> null is a change; key 2: null == null is unchanged
    assert(got == Seq(("changed", 1L, Some(5L), None)))
  }
}
