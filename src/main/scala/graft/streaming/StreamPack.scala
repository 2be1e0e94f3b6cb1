package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous sequence packing (27th module) — the streaming twin of
  * [[graft.ops.Chunker.packContiguous]]: chunks arrive on a stream, and
  * each (shard, tumbling window) packs its chunks into ~capacity-token
  * contiguous bins IN EVENT ORDER (order_key), exactly as the batch
  * packer lays out the same rows keyed by (shard, window) — the feeding
  * end of a training pipeline that packs as data lands instead of
  * re-packing the corpus per epoch.
  *
  * Contiguous packing is a running sum over the window's COMPLETE
  * order_key sequence — a late row re-bins everything after it — so rows
  * cannot emit as they arrive: state is the window's buffered
  * (order_key, n_tok) rows per shard, and the pack computes ONCE when the
  * watermark closes the window (event-time timeout; the StreamFunnel
  * finalize-once discipline). Every emitted row is final under any
  * arrival order; stream ≡ batch per (shard, window) is spec-pinned on
  * shuffled arrival.
  *
  * State bound, documented loudly: one (order_key, n_tok) pair per
  * buffered row per open (shard, window) — the buffer is the window's
  * row volume for that shard, and `maxBuffered` raises rather than
  * silently growing past the contract (pick windows sized so a shard's
  * window fits; the batch operator is the path for unbounded layout).
  * Duplicate order_keys within a (shard, window) raise at emit — the
  * running sum is only deterministic under a total order (same contract
  * as the batch packer's orderCols requirement).
  *
  * Output per closed window: (window_start_us, shard, order_key, n_tok,
  * bin), bin numbering starting at 0 per (shard, window).
  */
object StreamPack {

  case class PackEvent(shard: Long, order_key: Long, n_tok: Long, ts_us: Long)
  case class PackState(rows: Vector[(Long, Long)])
  case class PackOut(window_start_us: Long, shard: Long, order_key: Long,
      n_tok: Long, bin: Long)

  def windowedPack(events: Dataset[PackEvent], capacity: Long,
      windowUs: Long, delayThreshold: String,
      maxBuffered: Int = 1 << 20): Dataset[PackOut] = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(windowUs > 0, s"window must be positive, got $windowUs")
    require(maxBuffered >= 1, s"maxBuffered must be >= 1, got $maxBuffered")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[PackEvent]
      .groupByKey(e => (e.shard, e.ts_us - math.floorMod(e.ts_us, windowUs)))
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), batch: Iterator[PackEvent],
            state: GroupState[PackState]) =>
          val (shard, winStartUs) = key
          if (state.hasTimedOut) {
            val rows = state.get.rows.sortBy(_._1)
            state.remove()
            rows.iterator.zip(rows.iterator.drop(1)).foreach { case (a, b) =>
              require(a._1 != b._1,
                s"stream pack: duplicate order_key ${a._1} in shard $shard " +
                  s"window $winStartUs — contiguous packing needs a total " +
                  "order (the batch packer's orderCols contract)")
            }
            var running = 0L
            rows.iterator.map { case (ord, n) =>
              running += n
              PackOut(winStartUs, shard, ord, n, (running - n) / capacity)
            }
          } else {
            var rows = state.getOption.map(_.rows).getOrElse(Vector.empty)
            batch.foreach { e =>
              rows = rows :+ ((e.order_key, e.n_tok))
              require(rows.size <= maxBuffered,
                s"stream pack: shard $shard window $winStartUs exceeds " +
                  s"$maxBuffered buffered rows — size windows so a shard's " +
                  "window fits, or pack in batch")
            }
            state.update(PackState(rows))
            val wantMs = (winStartUs + windowUs) / 1000L
            state.setTimeoutTimestamp(
              math.max(wantMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
