package graft

import graft.ops.Mixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = ((1 to 8).map(i => (i.toLong, "A")) ++
    (9 to 10).map(i => (i.toLong, "B")) ++
    (11 to 14).map(i => (i.toLong, "C"))).toDF("id", "source")

  test("rates follow quota arithmetic; under-quota source caps at 1000") {
    // total 8: A 500 permille -> keep 4 of 8 -> rate 500;
    //          B 500 permille -> keep 4 of 2 -> rate caps at 1000;
    //          C absent from the spec -> dropped
    val got = Mixture.mixSample(rows, "id", "source",
      Seq("A" -> 500, "B" -> 500), totalTarget = 8L, salt = "t")
    val rates = got.select("source", "rate_permille").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("A") == 500L && rates("B") == 1000L)
    assert(!got.select("source").as[String].collect().contains("C"))
    // B fully kept (rate 1000)
    assert(got.where($"source" === "B").count() == 2L)
    // A kept rows are exactly those whose md5 bucket clears the rate
    val expectA = rows.where($"source" === "A")
      .where(graft.functions.functions.hex_to_long(
        substring(md5(concat(lit("t"), $"id".cast("string"))), 1, 15)) % 1000 < 500)
      .select("id").as[Long].collect().toSet
    val gotA = got.where($"source" === "A").select("id").as[Long].collect().toSet
    assert(gotA == expectA)
  }

  test("sampling is partition-independent") {
    val a = Mixture.mixSample(rows, "id", "source", Seq("A" -> 800), 5L)
      .select("id").as[Long].collect().toSet
    val b = Mixture.mixSample(rows.repartition(13), "id", "source",
      Seq("A" -> 800), 5L)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  // ---- temperatureMix (VERDICT r11 item 2: the spec the r11 snapshot
  // commit skipped) ----

  // counts: A 9, B 4, C 1 → √n weights 3e6 / 2e6 / 1e6 exactly (perfect
  // squares pin the √n arithmetic with zero rounding ambiguity)
  private val tRows = ((1 to 9).map(i => (i.toLong, "A")) ++
    (10 to 13).map(i => (i.toLong, "B")) ++
    Seq((14L, "C"))).toDF("id", "source")

  test("temperatureMix: shares are largest-remainder over floor(√n·1e6) and sum to exactly 1000") {
    val got = Mixture.temperatureMix(tRows, "id", "source", totalTarget = 10L)
    val shares = got.select("source", "share_permille").distinct()
      .as[(String, Long)].collect().toMap
    // the same quota algebra, locally: weights floor(√n·1e6) via JVM IEEE
    // sqrt (the T=2 portability claim — Spark's sqrt is the same IEEE op)
    val weights = Seq("A" -> 9L, "B" -> 4L, "C" -> 1L).map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1000000.0).toLong
    }
    assert(weights.toMap == Map("A" -> 3000000L, "B" -> 2000000L, "C" -> 1000000L))
    val expect = graft.ops.TokenBudget.allocateLocal(weights, 1000L)
      .map { case (g, _, q) => g -> q }.toMap
    assert(expect.values.sum == 1000L)
    // every SURVIVING source's share matches the local kernel (a source
    // can vanish from the output only by rate-0 or hash rejection, never
    // with a wrong share)
    shares.foreach { case (s, q) => assert(expect(s) == q, s"share($s)") }
  }

  test("temperatureMix ≡ mixSample at the derived shares (quota/rate/acceptance parity)") {
    val weights = Seq("A" -> 3000000L, "B" -> 2000000L, "C" -> 1000000L)
    val shares = graft.ops.TokenBudget.allocateLocal(weights, 1000L)
      .collect { case (g, _, q) if q > 0 => g -> q.toInt }
    val viaMix = Mixture.mixSample(tRows, "id", "source", shares,
        totalTarget = 10L, salt = "tm")
      .select("id", "source", "rate_permille")
      .as[(Long, String, Long)].collect().toSet
    val viaTemp = Mixture.temperatureMix(tRows, "id", "source",
        totalTarget = 10L, salt = "tm")
      .select("id", "source", "rate_permille")
      .as[(Long, String, Long)].collect().toSet
    assert(viaTemp == viaMix)
  }

  test("temperatureMix: null sources are excluded from counts, shares, and output") {
    val withNull = tRows.union(
      Seq((98L, null: String), (99L, null: String)).toDF("id", "source"))
    val base = Mixture.temperatureMix(tRows, "id", "source", 10L, salt = "n")
      .select("id", "source", "share_permille", "rate_permille")
      .as[(Long, String, Long, Long)].collect().toSet
    val got = Mixture.temperatureMix(withNull, "id", "source", 10L, salt = "n")
      .select("id", "source", "share_permille", "rate_permille")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == base) // null rows neither survive nor shift any share
  }

  test("temperatureMix: empty corpus yields empty output with the contract columns") {
    val empty = spark.emptyDataset[(Long, String)].toDF("id", "source")
    val got = Mixture.temperatureMix(empty, "id", "source", 10L)
    assert(got.count() == 0L)
    assert(Seq("id", "source", "share_permille", "rate_permille")
      .forall(got.columns.contains))
  }

  test("temperatureMix is partition-independent") {
    val a = Mixture.temperatureMix(tRows, "id", "source", 10L, salt = "p")
      .select("id").as[Long].collect().toSet
    val b = Mixture.temperatureMix(tRows.repartition(13), "id", "source",
        10L, salt = "p")
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureMix: under-quota source caps at rate 1000; rejects non-positive target") {
    // totalTarget huge → every source's keep ≥ its n → all rates 1000,
    // every row survives
    val got = Mixture.temperatureMix(tRows, "id", "source", 1000000L)
    assert(got.count() == tRows.count())
    assert(got.where($"rate_permille" =!= 1000L).count() == 0L)
    intercept[IllegalArgumentException] {
      Mixture.temperatureMix(tRows, "id", "source", 0L)
    }
  }
}
