package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFilter.{bloom_filter_agg, bloom_might_contain}

/** Bloom-filter semi-join pruning — the standard 100 TB trick for joins
  * where the big side is much larger than the match set: build a
  * fixed-size Bloom filter over the small side's keys, probe it at the
  * big side's SCAN, and only then run the exact join. The probe is a
  * deterministic scalar filter, so Catalyst pushes it below the exchange:
  * rows that cannot match are dropped before they are ever shuffled,
  * turning a full-table exchange into a match-sized one. The exact join
  * afterwards removes Bloom false positives; false negatives are
  * impossible, so the composition is semantically invisible.
  *
  * (Spark's own runtime row-level filtering does this automatically in
  * narrow cases; this operator is the explicit, tunable form — the
  * pipeline controls bits/hashes and can persist the filter across many
  * probe queries, e.g. one contaminated-id filter applied to every shard
  * of a 100 TB corpus.)
  */
object BloomPrune extends org.apache.spark.internal.Logging {

  /** Wire bytes of a Bloom filter over `small`'s bigint `keyCol`. One-row
    * aggregate collect — the filter itself is fixed-size (`numBits/8` + 1
    * bytes) regardless of input rows, the same driver shape as
    * [[Profiler]]'s single result row. */
  def buildFilter(small: DataFrame, keyCol: String,
      numBits: Int = 1 << 23, numHashes: Int = 5): Array[Byte] =
    small
      .select(bloom_filter_agg(col(keyCol).cast("long"), numBits, numHashes).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

  /** `big` rows whose `bigKey` passes the Bloom probe — a superset of the
    * true semi-join at the false-positive rate, produced WITHOUT shuffling
    * `big`. */
  def probe(big: DataFrame, bigKey: String, filter: Array[Byte]): DataFrame =
    big.where(bloom_might_contain(lit(filter), col(bigKey).cast("long")))

  /** Exact left-semi join of `big` against `small`'s keys with Bloom
    * pre-pruning: probe at the scan, then the exact semi join (which now
    * shuffles only survivors) removes false positives.
    */
  def semiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val filter = buildFilter(small, smallKey, numBits, numHashes)
    probe(big, bigKey, filter)
      .join(small.select(col(smallKey).as("__bp_key")).distinct(),
        col(bigKey) === col("__bp_key"), "left_semi")
  }
}
