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
}
