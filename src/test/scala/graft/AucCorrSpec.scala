package graft

import org.scalatest.funsuite.AnyFunSuite

class AucCorrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def auc(rows: Seq[(Long, Long)]) =
    graft.ops.Auc.aucByGroup(rows.map { case (s, l) => ("g", s, l) }
        .toDF("grp", "score", "lab"), "grp", "score", "lab")
      .collect()(0)

  test("perfect separation scores 1000, reversed scores 0") {
    val sep = auc(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)))
    assert(sep.getLong(3) == 8L && sep.getLong(4) == 1000L) // 2U = 2*P*N
    val rev = auc(Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L)))
    assert(rev.getLong(4) == 0L)
  }

  test("ties get half credit via the doubled statistic") {
    // pos at 5, neg at 5: U = 0.5 -> 2U = 1, AUC = 1/2 -> 500
    val r = auc(Seq((5L, 1L), (5L, 0L)))
    assert(r.getLong(3) == 1L && r.getLong(4) == 500L)
  }

  test("one-class groups report NULL auc") {
    val r = auc(Seq((1L, 1L), (2L, 1L)))
    assert(r.isNullAt(4))
  }

  test("auc matches the O(P*N) pair-counting definition on random data") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(80)((rnd.nextInt(12).toLong, rnd.nextInt(2).toLong))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val r = auc(rows)
    assert(r.getLong(3) == u2)
    assert(r.getLong(4) == 1000L * u2 / (2L * pos.length * neg.length))
  }

  private def corr(rows: Seq[(Long, Long)]) =
    graft.ops.Correlation.pairwiseCorr(rows.toDF("a", "b"), Seq("a", "b"))
      .collect()(0)

  test("perfect linear relation gives corr ~1, inverse ~-1") {
    // sqrt(6)*sqrt(600) rounds to 59.99999999999999, so exact 1.0 is not
    // promised — only the last-bit neighborhood (identically in DuckDB)
    assert(math.abs(corr(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
      .getDouble(8) - 1.0) < 1e-12)
    assert(math.abs(corr(Seq((1L, 30L), (2L, 20L), (3L, 10L)))
      .getDouble(8) + 1.0) < 1e-12)
  }

  test("a constant column yields NULL (zero variance)") {
    assert(corr(Seq((1L, 7L), (2L, 7L), (3L, 7L))).isNullAt(8))
  }

  test("sufficient sums are exact on random data") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(200)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val r = corr(rows)
    assert(r.getLong(2) == 200L)
    assert(r.getLong(3) == rows.map(_._1).sum)
    assert(r.getLong(5) == rows.map(t => t._1 * t._2).sum)
    val expected = {
      val n = rows.length.toDouble
      val sx = rows.map(_._1).sum.toDouble; val sy = rows.map(_._2).sum.toDouble
      val sxy = rows.map(t => t._1 * t._2).sum.toDouble
      val sx2 = rows.map(t => t._1 * t._1).sum.toDouble
      val sy2 = rows.map(t => t._2 * t._2).sum.toDouble
      (n * sxy - sx * sy) /
        (math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy))
    }
    assert(math.abs(r.getDouble(8) - expected) < 1e-12)
  }
}
