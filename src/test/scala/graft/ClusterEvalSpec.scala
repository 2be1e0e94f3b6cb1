package graft

import org.scalatest.funsuite.AnyFunSuite

class ClusterEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def confusion(a: Seq[(String, String)], b: Seq[(String, String)]) =
    graft.ops.ClusterEval.pairConfusion(a.toDF("node", "label"),
      b.toDF("node", "label")).collect()(0)

  test("identical partitions score perfect everything") {
    val p = Seq("1" -> "x", "2" -> "x", "3" -> "y", "4" -> "y")
    val r = confusion(p, p)
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L) // fp, fn
    assert(r.getLong(5) == 1000L && r.getLong(6) == 1000L &&
      r.getLong(7) == 1000L && r.getLong(8) == 1000L)
  }

  test("hand-computed confusion on a textbook 2x3 example") {
    // A: {1,2,3}{4,5,6}; B: {1,2}{3,4}{5,6}
    val a = Seq("1" -> "a1", "2" -> "a1", "3" -> "a1",
      "4" -> "a2", "5" -> "a2", "6" -> "a2")
    val b = Seq("1" -> "b1", "2" -> "b1", "3" -> "b2",
      "4" -> "b2", "5" -> "b3", "6" -> "b3")
    val r = confusion(a, b)
    // contingency: (a1,b1)=2 (a1,b2)=1 (a2,b2)=1 (a2,b3)=2
    // tp = 1+0+0+1 = 2; sa = 3+3 = 6; sb = 1+1+1 = 3; T = 15
    // fp = 4, fn = 1, tn = 15-6-3+2 = 8; rand = 1000*10//15 = 666
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((6L, 2L, 4L, 1L, 8L)))
    assert(r.getLong(5) == 666L)
    assert(r.getLong(6) == 333L) // 2/6
    assert(r.getLong(7) == 666L) // 2/3
    // purity: max per a-cluster = 2 + 2 -> 4/6
    assert(r.getLong(8) == 666L)
  }

  test("confusion cells always sum to C(n,2); nodes only in one side drop") {
    val rnd = new scala.util.Random(53)
    val nodes = (0 until 40).map(_.toString)
    val a = nodes.map(n => n -> s"a${rnd.nextInt(5)}")
    val b = nodes.map(n => n -> s"b${rnd.nextInt(4)}") ++
      Seq("ghost" -> "b0")
    val r = confusion(a, b)
    val n = r.getLong(0)
    assert(n == 40L)
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) ==
      n * (n - 1) / 2)
  }
}
