package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Conformal

class ConformalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ids = 0 mod 3 -> train, 1 mod 3 -> calibration, 2 mod 3 -> test
  private def rows: Seq[(String, Long, Long)] = {
    val train = Seq(0L, 3L, 6L, 9L).map(id => ("g", id, 100L))
    // calibration residuals 0, 5, ..., 40 (9 points)
    val cal = (0 until 9).map(i => ("g", 1L + 3L * i, 100L + 5L * i))
    // test: residuals 0, 38, 39, 41, 100 -> 3 of 5 within q_hat = 40
    val test = Seq(100L, 138L, 61L, 141L, 200L).zipWithIndex.map {
      case (y, i) => ("g", 2L + 3L * i, y)
    }
    train ++ cal ++ test
  }

  test("q_hat is the ceil((n+1)(1-alpha)) calibration residual; coverage exact") {
    val out = Conformal.splitConformalAudit(rows.toDF("g", "id", "y"),
      "g", "id", "y", alphaPermille = 100L).collect().head
    assert(out.getLong(1) == 4L)  // n_train
    assert(out.getLong(2) == 9L)  // n_cal
    assert(out.getLong(3) == 5L)  // n_test
    assert(out.getLong(4) == 100L) // pred = train mean
    // target rank = ((9+1)*900 + 999) div 1000 = 9 -> largest resid 40
    assert(out.getLong(5) == 40L)
    assert(out.getLong(6) == 600L) // 3/5 covered
  }

  test("tighter alpha lowers q_hat (rank 8 -> resid 35)") {
    val out = Conformal.splitConformalAudit(rows.toDF("g", "id", "y"),
      "g", "id", "y", alphaPermille = 200L).collect().head
    assert(out.getLong(5) == 35L)
  }

  test("alpha bounds enforced") {
    intercept[IllegalArgumentException] {
      Conformal.splitConformalAudit(rows.toDF("g", "id", "y"), "g", "id",
        "y", alphaPermille = 0L)
    }
  }
}
