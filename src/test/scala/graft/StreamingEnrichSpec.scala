package graft

import graft.plans.AsOfJoin
import graft.streaming.StreamEnrich
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

case class Ev(k: Long, t: Long, v: Int)
case class Px(k: Long, pt: Long, price: Long)

class StreamingEnrichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val prices = Seq(
    Px(1L, 100L, 10L), Px(1L, 200L, 20L), Px(1L, 300L, 30L),
    Px(2L, 150L, 15L), Px(2L, 250L, 25L))

  private val batches = Seq(
    Seq(Ev(1L, 120L, 1), Ev(2L, 140L, 2)),        // 140 predates k=2's first px
    Seq(Ev(1L, 200L, 3), Ev(1L, 305L, 4)),        // exact-time + after-last
    Seq(Ev(2L, 260L, 5), Ev(3L, 500L, 6)),        // k=3 has no price rows
    Seq(Ev(1L, 99L, 7)))                          // before k=1's first px

  test("streaming foreachBatch as-of ≡ batch as-of over the event union (4 micro-batches)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val staticDf = prices.toDF()
    val got = mutable.ArrayBuffer.empty[Row]
    val q = StreamEnrich.start(input.toDF(), staticDf,
        keys = Seq("k"), leftTime = "t", rightTime = "pt") { (df, _) =>
      got.synchronized { got ++= df.collect() }
    }
    for (b <- batches) {
      input.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()

    val want = AsOfJoin.asofBackward(
      batches.flatten.toDF(), staticDf, Seq("k"), "t", "pt").collect()

    def key(r: Row) = r.toSeq.map(String.valueOf).mkString("|")
    assert(got.size == batches.flatten.size)
    assert(got.map(key).sorted == want.map(key).sorted.toSeq)
    // spot-check the semantics actually exercised: exact-time match,
    // no-earlier-row null, and unknown key null
    val byV = got.map(r => r.getInt(2) -> r).toMap
    def price(r: Row): Option[Long] =
      if (r.isNullAt(r.fieldIndex("price"))) None
      else Some(r.getLong(r.fieldIndex("price")))
    assert(price(byV(3)).contains(20L)) // t=200 matches pt=200 exactly
    assert(price(byV(7)).isEmpty)       // t=99 has no earlier price
    assert(price(byV(6)).isEmpty)       // k=3 never priced
  }

  test("tolerance bounds the match distance in streaming mode too") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val got = mutable.ArrayBuffer.empty[Row]
    val q = StreamEnrich.start(input.toDF(), prices.toDF(),
        keys = Seq("k"), leftTime = "t", rightTime = "pt",
        tolerance = 10L) { (df, _) =>
      got.synchronized { got ++= df.collect() }
    }
    input.addData(Ev(1L, 205L, 1)) // Δ=5 ≤ 10 → price 20
    q.processAllAvailable()
    input.addData(Ev(1L, 250L, 2)) // nearest earlier is 200, Δ=50 > 10 → null
    q.processAllAvailable()
    q.stop()
    val byV = got.map(r => r.getInt(2) -> r).toMap
    assert(!byV(1).isNullAt(byV(1).fieldIndex("price")) &&
      byV(1).getLong(byV(1).fieldIndex("price")) == 20L)
    assert(byV(2).isNullAt(byV(2).fieldIndex("price")))
  }
}
