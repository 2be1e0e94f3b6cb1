package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Isotonic

class IsotonicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long, Long)]) =
    Isotonic.fitBuckets(rows.toDF("bucket", "n", "pos"),
      "bucket", "n", "pos")
      .orderBy("bucket").collect()

  test("already-monotone rates pass through; violators pool to interval means") {
    // rates 10%, 30%, 20%, 40% over n=10 each: buckets 1,2 pool to 25%
    val out = fit(Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 2L),
      (3L, 10L, 4L)))
    assert(out.map(_.getLong(4)).toSeq ==
      Seq(100000L, 250000L, 250000L, 400000L))
    // raw rates ride along
    assert(out.map(_.getLong(3)).toSeq ==
      Seq(100000L, 300000L, 200000L, 400000L))
  }

  test("fit is non-decreasing and matches brute-force quantized minimax") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 15L).map(b =>
      (b, 5L + rnd.nextInt(20), rnd.nextInt(5).toLong))
    val out = fit(rows).map(r => r.getLong(0) -> r.getLong(4)).toMap
    val iso = rows.sortBy(_._1).map(_._1).map { i =>
      val rs = rows.sortBy(_._1)
      val fits = for (j <- rs.map(_._1) if j <= i) yield {
        (for (k <- rs.map(_._1) if k >= i) yield {
          val seg = rs.filter(r => r._1 >= j && r._1 <= k)
          Math.floorDiv(seg.map(_._3).sum * 1000000L, seg.map(_._2).sum)
        }).min
      }
      i -> fits.max
    }.toMap
    assert(out == iso)
    val sorted = rows.map(_._1).sorted.map(out)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }

  test("too many buckets rejected loudly") {
    val rows = (0L until 70L).map(b => (b, 1L, 0L))
    intercept[IllegalArgumentException] {
      fit(rows)
    }
  }
}
