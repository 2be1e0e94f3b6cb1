package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Benford, KAnonymity, Trend}

class StatAuditsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Benford --------------------------------------------------------

  test("benford: always 9 rows, digits from decimal string, zero-fill") {
    // values hitting digits 1, 1, 2, 9 only; 0 and negatives dropped
    val df = Seq(123L, 1L, 29L, 900L, 0L, -5L).toDF("v")
    val out = Benford.firstDigitAudit(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.size == 9)
    assert(out(1).getLong(1) == 2L)
    assert(out(2).getLong(1) == 1L)
    assert(out(9).getLong(1) == 1L)
    assert((3 to 8).forall(d => out(d).getLong(1) == 0L))
    // obs_ppm floors: digit 1 -> 2/4 of 1e6
    assert(out(1).getLong(2) == 500000L)
    assert(out(1).getInt(3) == 301029) // literal expectation (int CASE)
    assert(out(1).getLong(4) == 500000L - 301029L)
  }

  test("benford: a perfect geometric sample has small deviations") {
    // first digits of 2^k follow Benford closely; k = 0..199
    val vals = Iterator.iterate(BigInt(1))(_ * 2).take(200)
      .map(_.toString.take(1).toLong).toSeq
    // feed the digits themselves (first digit of d is d)
    val out = Benford.firstDigitAudit(vals.toDF("v"), "v").collect()
    // every digit's observed share within 3% of the Benford expectation
    out.foreach { r =>
      assert(math.abs(r.getLong(4)) < 30000L,
        s"digit ${r.getInt(0)} deviates ${r.getLong(4)} ppm")
    }
  }

  // ---- Fano factor ----------------------------------------------------

  test("fano: constant daily counts -> F near 0, bursty -> F > 1e6") {
    val day = 86400000000L
    // group a: 4 days x 3 events each (zero variance)
    val a = for (d <- 0 until 4; _ <- 0 until 3)
      yield ("a", d * day + 1L)
    // group b: 12 events on one day, 3 days with 1 (high variance)
    val b = (0 until 12).map(_ => ("b", 0L * day + 1L)) ++
      (1 to 3).map(d => ("b", d * day + 1L))
    val out = Trend.fanoFactor((a ++ b).toDF("g", "ts_us"), "g", "ts_us")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(4) == 0L)
    // b: n=4, S=15, Q=147: F_ppm = 1e6*(4*147-225)/(4*15) = 6050000
    assert(out("b").getLong(4) == 6050000L)
  }

  // ---- Lorenz points ---------------------------------------------------

  test("lorenz: prorated decile shares, last point exactly 1000") {
    import graft.ops.Inequality
    // values: four 1s and one 6 -> total 10, n 5; bottom 40% (2 units)
    // hold 2/10 = 200 permille; bottom 80% (4 units) 400; 100% = 1000
    val df = Seq(1L, 1L, 1L, 1L, 6L).toDF("v")
    val out = Inequality.lorenzPoints(df, "v", nQuantiles = 5)
      .orderBy("quantile").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.map(_.getLong(3)).toSeq ==
      Seq(100L, 200L, 300L, 400L, 1000L))
    // a cut INSIDE the 6-block prorates: with 10 quantiles, m=9 of 10
    // units... (covered by the hash-exact driver oracle at scale)
  }

  // ---- t-closeness ----------------------------------------------------

  test("t-closeness: a class mirroring the global mix has TVD 0") {
    // global mix: x:y = 2:1 in every class
    val rows = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "x"), ("g2", "x"), ("g2", "y"))
    val out = KAnonymity.tCloseness(rows.toDF("q", "s"), Seq("q"), "s", 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g1").getLong(3) == 0L && out("g1").getBoolean(4))
    assert(out("g2").getLong(3) == 0L)
  }

  test("t-closeness: a homogeneous class gets the full missing-mass fold") {
    // g1 all x; g2 all y; global 50/50 -> TVD = 1/2 each -> 500 permille
    val rows = Seq(("g1", "x"), ("g1", "x"), ("g2", "y"), ("g2", "y"))
    val out = KAnonymity.tCloseness(rows.toDF("q", "s"), Seq("q"), "s", 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    // A = |2*4 - 2*2| = 4; missing mass = 2*(4-2) = 4
    // tvd = 1000*(4+4) / (2*2*4) = 500
    assert(out("g1").getLong(3) == 500L && !out("g1").getBoolean(4))
    assert(out("g2").getLong(3) == 500L)
    assert(out("g1").getLong(2) == 1L) // n_sensitive: only x observed
  }

  test("t-closeness matches a brute-force TVD over the full domain") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((s"g${rnd.nextInt(4)}", s"v${rnd.nextInt(6)}"))
    val out = KAnonymity.tCloseness(rows.toDF("q", "s"), Seq("q"), "s", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val n = rows.size.toLong
    val globalC = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val ng = rs.size.toLong
      val cg = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // .keys is a Set — map over a Seq so equal terms don't collapse
      val num = globalC.keys.toSeq.map { v =>
        (cg.getOrElse(v, 0L) * n - globalC(v) * ng).abs
      }.sum
      assert(out(g) == (1000L * num) / (2L * ng * n), s"group $g")
    }
  }
}
