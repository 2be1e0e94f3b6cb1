package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HyperBall

class EffDiameterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ring(n: Int): Seq[(String, String)] =
    (0 until n).map(i => (s"n$i", s"n${(i + 1) % n}"))

  test("effective diameter: shape, monotonicity, final ratio = 1000") {
    val edges = ring(40).toDF("src", "dst")
    val out = HyperBall.effectiveDiameter(edges, "src", "dst", rounds = 3)
      .orderBy("r").collect()
    assert(out.length == 4)
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // one estimate row per node at every radius
    assert(out.forall(_.getLong(1) == 40L))
    // registers only grow -> NF non-decreasing, ratio ends at exactly 1000
    val nf = out.map(_.getLong(2))
    assert(nf.zip(nf.tail).forall { case (a, b) => a <= b })
    assert(out.last.getLong(3) == 1000L)
    // eff_diameter is one constant, consistent with the ratio column
    val eff = out.map(_.getInt(4)).distinct
    assert(eff.length == 1)
    val minReached = out.filter(r => 1000L * r.getLong(2)
      >= 900L * out.last.getLong(2)).map(_.getInt(0)).min
    assert(eff.head == minReached)
  }

  test("local replay and distributed sweep agree row for row") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((s"v${rnd.nextInt(60)}", s"v${rnd.nextInt(60)}"))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val local = HyperBall.effectiveDiameter(edges, "src", "dst", rounds = 2)
      .orderBy("r").collect().map(_.toSeq)
    val dist = HyperBall.effectiveDiameter(edges, "src", "dst", rounds = 2,
      maxLocalEdges = 0L).orderBy("r").collect().map(_.toSeq)
    assert(local.toSeq == dist.toSeq)
  }

  test("unsupported p is rejected loudly") {
    val edges = ring(6).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      HyperBall.effectiveDiameter(edges, "src", "dst", rounds = 1, p = 8)
    }
  }
}
