package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Unbounded-horizon streaming dedup signal in O(1) memory (21st
  * module): [[StreamDedup]] is EXACT but its state grows with the
  * distinct keys inside the watermark horizon — this module instead
  * keeps one fixed-size Bloom filter per content shard and flags each
  * arriving document as `maybe_dup` with the classic one-sided
  * guarantee:
  *
  *   - NO FALSE NEGATIVES: an exact duplicate (same content hash)
  *     arriving after its first copy is ALWAYS flagged, forever — the
  *     filter never forgets (spec-pinned);
  *   - bounded false positives: a fresh document is wrongly flagged
  *     with probability ≈ (1 − e^{−kn/m})^k; size `bitsPerShard` for
  *     the expected distinct volume per shard (spec pins < 5% at 25%
  *     occupancy).
  *
  * Sharding is BY CONTENT HASH (`pmod(h, nShards)`), so all copies of a
  * document always meet the same filter, and state per shard is a flat
  * Long array (`bitsPerShard/8` bytes — 8 KB at the default) that never
  * grows. Bit positions come from k xorshift-mixed multiplies of the
  * md5 content lane — deterministic, no RNG. The flag depends on
  * arrival order by definition (first copy unflagged), which is the
  * contract of a dedup SIGNAL, not a canonical-keeper election — run
  * [[graft.ops.Dedup]] batch jobs for those.
  */
object StreamBloomDedup {

  case class FlagOut(doc_id: Long, maybe_dup: Boolean)

  def dedupFlags(events: DataFrame, idCol: String, textCol: String,
      nShards: Int = 64, bitsPerShard: Int = 1 << 16,
      k: Int = 4): Dataset[FlagOut] = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096], got $nShards")
    require(bitsPerShard >= 64 && (bitsPerShard & (bitsPerShard - 1)) == 0,
      s"bitsPerShard must be a power of two >= 64, got $bitsPerShard")
    require(k >= 1 && k <= 16, s"k must be in [1, 16], got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val mask = bitsPerShard - 1
    val words = bitsPerShard / 64
    events
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.functions.hex_to_long(
          substring(md5(col(textCol)), 1, 15)).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Array[Long], FlagOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          val bits = state.getOption.getOrElse(new Array[Long](words))
          // materialize before updating state: the batch iterator is lazy
          val out = batch.map { case (id, h, _) =>
            var dup = true
            var i = 0
            while (i < k) {
              val x = h * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL
              val pos = ((x ^ (x >>> 33)).toInt & mask)
              val w = pos >>> 6
              val b = 1L << (pos & 63)
              if ((bits(w) & b) == 0L) { dup = false; bits(w) |= b }
              i += 1
            }
            FlagOut(id, dup)
          }.toList
          state.update(bits)
          out.iterator
      }
  }
}
