package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Latest-state compaction must hold incrementally: the max-struct
  * aggregation state is one struct per key, so an unbounded event stream
  * compacts to a bounded upsert view — no window sort, no per-key event
  * history retained. Spark's stateful aggregation maintains exactly the
  * max-struct; this spec proves the streamed view equals the batch
  * q_latest_state plan over the same (shuffled, out-of-order) events.
  */
class StreamLatestStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def compact(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("user_id"))
    .agg(max(struct(col("ts_us"), col("event_id"), col("event_type")))
        .as("m"),
      count(lit(1)).as("n_events"))
    .select(col("user_id"), col("m.ts_us").as("last_ts_us"),
      col("m.event_id").as("last_event_id"),
      col("m.event_type").as("last_type"), col("n_events"))

  test("streamed latest-state equals batch under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = compact(input.toDF()
        .toDF("user_id", "ts_us", "event_id", "event_type"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("latest_stream").start()
    // events for 5 users, delivered SHUFFLED across 3 micro-batches —
    // late events with older timestamps must not displace newer state
    val all = for {
      u <- 0L until 5L
      t <- 0L until 9L
    } yield (u, t * 1000000L, u * 100 + t, s"e${t % 3}")
    val shuffled = new scala.util.Random(7).shuffle(all)
    val (b1, rest) = shuffled.splitAt(15)
    val (b2, b3) = rest.splitAt(15)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("latest_stream")
      .as[(Long, Long, Long, String, Long)].collect().toSet
    val batch = compact(all.toDF("user_id", "ts_us", "event_id", "event_type"))
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(streamed == batch)
    // every user's view is its true newest event
    assert(streamed.map(r => (r._1, r._2)) ==
      (0L until 5L).map(u => (u, 8000000L)).toSet)
  }
}
