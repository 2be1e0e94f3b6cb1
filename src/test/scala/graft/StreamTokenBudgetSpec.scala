package graft

import graft.ops.TokenBudget
import graft.streaming.StreamTokenBudget
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamTokenBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val minute = 60000000L

  test("streamed per-window quotas equal the batch operator per window") {
    implicit val sqlCtx = spark.sqlContext
    // three windows of doc masses over five sources, deliberately uneven
    val rows = for {
      w <- 0 until 3
      i <- 0 until 40
    } yield (s"src${i % 5}", (i * 13 % 37) + 1L,
      // +1 min keeps every event past the initial zero watermark (a ts-0
      // event is "late" vs watermark 0 and would drop)
      w * 10L * minute + minute + i * minute / 8)

    val input = MemoryStream[(String, Long, Long)]
    val q = StreamTokenBudget.windowedAllocate(
        input.toDS().toDF("grp", "sz", "ts_us")
          .as[StreamTokenBudget.BudEvent],
        budget = 9973L, windowUs = 10L * minute, delayThreshold = "40 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sbud_out").start()
    val shuffled = new scala.util.Random(43).shuffle(rows.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 5)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    // advance the watermark past every window close
    input.addData(("sentinel", 0L, 100L * minute)); q.processAllAvailable()
    input.addData(("sentinel", 0L, 101L * minute)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sbud_out")
      .where(col("window_start_us") < 30L * minute)
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = (0 until 3).flatMap { w =>
      val slice = rows.filter(r =>
        r._3 >= w * 10L * minute && r._3 < (w + 1) * 10L * minute)
      TokenBudget.allocate(slice.toDF("grp", "sz", "ts"), "grp", "sz", 9973L)
        .as[(String, Long, Long)].collect()
        .map { case (g, s, qq) => (w * 10L * minute, g, s, qq) }
    }.toSet
    assert(streamed == batch && batch.nonEmpty)
    // quotas sum to the budget exactly in every window
    streamed.groupBy(_._1).foreach { case (_, ws) =>
      assert(ws.toSeq.map(_._4).sum == 9973L)
    }
  }

  test("allocateLocal is the batch operator's arithmetic (property)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val rows = (0 until rnd.nextInt(12) + 1)
        .map(i => (s"g${rnd.nextInt(6)}", rnd.nextInt(1000).toLong))
      val budget = rnd.nextInt(100000).toLong
      val local = TokenBudget.allocateLocal(rows, budget).toSet
      val df = TokenBudget.allocate(rows.toDF("g", "n"), "g", "n", budget)
        .as[(String, Long, Long)].collect().toSet
      assert(local == df, s"trial $trial budget $budget rows $rows")
    }
  }

  test("group-cardinality contract raises loudly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamTokenBudget.windowedAllocate(
        input.toDS().toDF("grp", "sz", "ts_us")
          .as[StreamTokenBudget.BudEvent],
        budget = 100L, windowUs = 10L * minute, delayThreshold = "1 minute",
        maxGroups = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("sbud_boom").start()
    val boom = intercept[Exception] {
      input.addData((1 to 5).map(i => (s"g$i", 1L, 20L * minute)))
      q.processAllAvailable()
    }
    val msgs = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("distinct groups")), msgs.mkString(" | "))
    q.stop()
  }
}
