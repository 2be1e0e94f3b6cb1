package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def overlap(docs: Seq[(String, String)], n: Int = 3,
      maxDf: Int = 16) =
    graft.ops.SourceOverlap.pairOverlap(docs.toDF("source", "text"),
        "source", "text", n = n, maxDf = maxDf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("contain_permille"))).toMap

  test("a fully mirrored feed scores containment 1000") {
    val m = overlap(Seq(
      ("big", "a b c d e f"),   // shingles: abc bcd cde def
      ("big", "x y z w"),       // xyz yzw
      ("mirror", "a b c d e f")))
    val (shared, na, nb, pm) = m(("big", "mirror"))
    assert(shared == 4L && na == 6L && nb == 4L && pm == 1000L)
  }

  test("disjoint sources produce no pair row") {
    val m = overlap(Seq(("s1", "a b c"), ("s2", "x y z")))
    assert(m.isEmpty)
  }

  test("partial overlap counts shared distinct shingles once") {
    val m = overlap(Seq(
      ("s1", "a b c d"), ("s1", "a b c"),  // abc (twice -> once), bcd
      ("s2", "a b c")))                     // abc
    val (shared, na, nb, pm) = m(("s1", "s2"))
    assert(shared == 1L && na == 2L && nb == 1L && pm == 1000L)
  }

  test("boilerplate shingles above maxDf are dropped before pairing") {
    // "x y z" appears in all four sources -> df 4 > maxDf 3: dropped,
    // so the only surviving evidence is the s1/s2-specific shingle
    val m = overlap(Seq(
      ("s1", "x y z"), ("s2", "x y z"), ("s3", "x y z"), ("s4", "x y z"),
      ("s1", "p q r"), ("s2", "p q r")), maxDf = 3)
    assert(m.keySet == Set(("s1", "s2")))
    assert(m(("s1", "s2"))._1 == 1L)
  }

  test("docs shorter than n contribute nothing") {
    val m = overlap(Seq(("s1", "a b"), ("s2", "a b")), n = 3)
    assert(m.isEmpty)
  }
}
