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

  test("negative per-row sizes: drop-negative-totals parity (ADVICE r10 property gap)") {
    // the original property generated only non-negative sizes, so the
    // "negative group totals are dropped" contract was asserted in both
    // docstrings but never exercised; these trials mix negative rows so
    // some group totals land negative (dropped), some positive-with-
    // negative-rows (kept), and occasionally ALL drop (both sides raise)
    val rnd = new scala.util.Random(11)
    var droppedGroupsSeen = false
    for (trial <- 1 to 12) {
      val rows = (0 until rnd.nextInt(12) + 2)
        .map(i => (s"g${rnd.nextInt(5)}", rnd.nextInt(2000).toLong - 800L))
      val budget = rnd.nextInt(100000).toLong + 1L
      val totals = rows.groupMapReduce(_._1)(_._2)(_ + _)
      if (totals.exists(_._2 < 0)) droppedGroupsSeen = true
      if (totals.values.forall(_ < 0)) {
        // every group dropped: both sides return EMPTY (the DataFrame
        // operator's raise_error lives on size rows — zero rows, zero
        // raises — and the local kernel mirrors that)
        assert(TokenBudget.allocateLocal(rows, budget).isEmpty)
        assert(TokenBudget.allocate(rows.toDF("g", "n"), "g", "n", budget)
          .collect().isEmpty)
      } else if (totals.values.filter(_ >= 0).sum == 0L) {
        // groups exist but have nothing to apportion over: both raise
        intercept[IllegalArgumentException] {
          TokenBudget.allocateLocal(rows, budget)
        }
        intercept[Exception] {
          TokenBudget.allocate(rows.toDF("g", "n"), "g", "n", budget)
            .collect()
        }
      } else {
        val local = TokenBudget.allocateLocal(rows, budget).toSet
        val df = TokenBudget.allocate(rows.toDF("g", "n"), "g", "n", budget)
          .as[(String, Long, Long)].collect().toSet
        assert(local == df, s"trial $trial budget $budget rows $rows")
        assert(local.forall(_._2 >= 0L)) // dropped groups never resurface
        assert(!local.exists(r => totals.get(r._1).exists(_ < 0)))
      }
    }
    assert(droppedGroupsSeen, "generator never produced a negative group total")
  }

  test("corpus-total overflow raises instead of wrapping (ADVICE r10)") {
    // two groups each fine against budget*size, but their SUM wraps int64
    val big = Long.MaxValue / 2 + 1
    val boom = intercept[ArithmeticException] {
      TokenBudget.allocateLocal(Seq(("a", big), ("b", big)), budget = 1L)
    }
    assert(boom.getMessage.contains("overflow"))
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
