package graft

import org.scalatest.funsuite.AnyFunSuite

class KsTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ks(rows: Seq[(Boolean, Long)]) = {
    val r = graft.ops.KsTest.twoSample(rows.toDF("in_a", "value"),
      "in_a", "value").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("identical samples have zero distance") {
    val vals = Seq(1L, 2L, 2L, 5L)
    val r = ks(vals.map(v => (true, v)) ++ vals.map(v => (false, v)))
    assert(r._3 == 0L && r._5 == 0L)
  }

  test("disjoint supports reach the maximum distance 1000") {
    val r = ks(Seq((true, 1L), (true, 2L), (false, 10L), (false, 11L)))
    assert(r._5 == 1000L)
    assert(r._4 == 2L) // the gap is first complete at A's top value
  }

  test("hand-computed gap and argmax tie-break to the smallest value") {
    // A: 1,3  B: 2,4 -> scaled gaps |ca*2-cb*2| at v=1:2, v=2:0, v=3:2,
    // v=4:0 -> max 2 at value 1 (earliest), ks = 1000*2 // 4 = 500
    val r = ks(Seq((true, 1L), (true, 3L), (false, 2L), (false, 4L)))
    assert(r == ((2L, 2L, 2L, 1L, 500L)))
  }

  test("matches a brute-force CDF sweep on random data") {
    val rnd = new scala.util.Random(47)
    val rows = Seq.fill(200)((rnd.nextBoolean(), rnd.nextInt(20).toLong))
    val a = rows.filter(_._1).map(_._2); val b = rows.filterNot(_._1).map(_._2)
    val values = rows.map(_._2).distinct.sorted
    val brute = values.map { v =>
      (math.abs(a.count(_ <= v).toLong * b.length -
        b.count(_ <= v).toLong * a.length), v)
    }.sortBy { case (d, v) => (-d, v) }.head
    val r = ks(rows)
    assert((r._3, r._4) == brute)
    assert(r._5 == 1000L * brute._1 / (a.length.toLong * b.length))
  }
}
