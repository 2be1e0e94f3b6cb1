package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *
  * Keys of ANY type are supported: they are normalized to a long with
  * `xxhash64` before touching the bigint-only filter kernel. Integral
  * keys normalize through `cast(long)` (so an int key on one side matches
  * a bigint key on the other); every other type hashes its canonical
  * string form, which is identical across sides when the two key columns
  * have the same data type — [[semiJoin]] enforces exactly that. The
  * previous implementation `cast("long")`-ed blindly, which turned string
  * keys into nulls and silently dropped every such row at the probe.
  */
object BloomPrune extends org.apache.spark.internal.Logging {

  /** The long fed to the filter kernel for a key of type `dt`. Null keys
    * hash to xxhash64's seed — harmless on the build side (one spurious
    * filter entry) and irrelevant on the probe side (a null key can never
    * equal-join anyway; the exact join drops it).
    */
  private def keyBits(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => xxhash64(c.cast("long"))
    case _ => xxhash64(c.cast("string"))
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Wire bytes of a Bloom filter over `small`'s `keyCol` (any type — see
    * the normalization contract in the object doc). One-row aggregate
    * collect — the filter itself is fixed-size (`numBits/8` + 1 bytes)
    * regardless of input rows, the same driver shape as [[Profiler]]'s
    * single result row. */
  def buildFilter(small: DataFrame, keyCol: String,
      numBits: Int = 1 << 23, numHashes: Int = 5): Array[Byte] = {
    val dt = small.schema(keyCol).dataType
    small
      .select(bloom_filter_agg(keyBits(col(keyCol), dt), numBits, numHashes).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  /** `big` rows whose `bigKey` passes the Bloom probe — a superset of the
    * true semi-join at the false-positive rate, produced WITHOUT shuffling
    * `big`. The filter must have been built over keys of the same type (or
    * the integral family — see [[keyBits]]). */
  def probe(big: DataFrame, bigKey: String, filter: Array[Byte]): DataFrame = {
    val dt = big.schema(bigKey).dataType
    big.where(bloom_might_contain(lit(filter), keyBits(col(bigKey), dt)))
  }

  /** Exact left-semi join of `big` against `small`'s keys with Bloom
    * pre-pruning: probe at the scan, then the exact semi join (which now
    * shuffles only survivors) removes false positives.
    *
    * Key types must hash identically on both sides: both integral, or
    * exactly the same type (checked loudly — a mismatch like decimal(10,0)
    * vs decimal(10,2) would produce different canonical strings and thus
    * silent false negatives).
    */
  def semiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val bigDt = big.schema(bigKey).dataType
    val smallDt = small.schema(smallKey).dataType
    require((isIntegral(bigDt) && isIntegral(smallDt)) || bigDt == smallDt,
      s"Bloom semi-join keys must hash identically: $bigKey is $bigDt but " +
        s"$smallKey is $smallDt (both integral, or exactly equal, required)")
    val filter = buildFilter(small, smallKey, numBits, numHashes)
    probe(big, bigKey, filter)
      .join(small.select(col(smallKey).as("__bp_key")).distinct(),
        col(bigKey) === col("__bp_key"), "left_semi")
  }
}
