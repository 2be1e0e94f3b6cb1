package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChiSquareSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chi(rows: Seq[(Seq[String], Boolean)]) =
    graft.ops.ChiSquare.tokenLabel(
        rows.toDF("toks", "label"), "toks", "label")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("a perfect predictor scores phi2 = 1.0 (1e6 ppm)") {
    // "pos" appears iff label, "neutral" appears everywhere except one
    val m = chi(Seq(
      (Seq("pos", "x"), true), (Seq("pos", "y"), true),
      (Seq("neg", "x"), false), (Seq("neg", "y"), false)))
    assert(m("pos") == (2L, 2L, 1000000L, 4000000L))
    assert(m("neg") == (2L, 0L, 1000000L, 4000000L))
  }

  test("an independent token scores phi2 = 0") {
    val m = chi(Seq(
      (Seq("even"), true), (Seq("even"), false),
      (Seq("odd"), true), (Seq("odd"), false)))
    assert(m("even")._3 == 0L)
    assert(m("odd")._3 == 0L)
  }

  test("digit-carried ppm matches the rational value") {
    // 6 docs, 3 positive; token in 2 docs, both positive:
    // a=2 b=0 c=1 d=3 -> det=6, sq=36, den=2*4*3*3=72, phi2=0.5
    val m = chi(Seq(
      (Seq("t"), true), (Seq("t"), true), (Seq("u"), true),
      (Seq("u"), false), (Seq("u"), false), (Seq("u"), false)))
    assert(m("t") == (2L, 2L, 500000L, 3000000L))
  }

  test("tokens present in every document are dropped (den = 0)") {
    val m = chi(Seq(
      (Seq("all", "a"), true), (Seq("all", "b"), false)))
    assert(!m.contains("all"))
  }

  test("duplicate tokens inside one doc count once (presence, not tf)") {
    val m = chi(Seq(
      (Seq("t", "t", "t"), true), (Seq("u"), false)))
    assert(m("t")._1 == 1L) // df counts documents
  }

  test("single-class corpora yield no rows instead of dividing by zero") {
    val m = chi(Seq((Seq("a"), true), (Seq("b"), true)))
    assert(m.isEmpty)
  }
}
