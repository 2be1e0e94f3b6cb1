package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming incremental MinHash near-dup mining (29th module) — the
  * stream form of [[graft.ops.Dedup.incrementalMinHashPairs]]: every
  * arriving document folds into a band-bucket SIGNATURE LEDGER and the
  * query emits each near-dup pair the moment its second member arrives.
  * [[StreamBloomDedup]] covers only EXACT duplicates in O(1) state; this
  * module completes the incremental story for near-duplicates.
  *
  * Identical algebra to the batch ledger path, computed per document in
  * plain Scala (a signature is a pure function of one document's text, so
  * no streaming aggregation is needed): word n-gram shingles with the
  * whole-text short-doc convention, md5-lane (h1, h2) pairs, lane i =
  * min((h1·K_i + h2·L_i) mod 2³¹−1), Horner band buckets mod 2⁴⁰ —
  * byte-for-byte the `minHashSignaturesPortable` / `signatureBandBuckets`
  * kernel (parity spec-pinned), so a ledger snapshot taken from this
  * stream agrees with one built by the batch operator.
  *
  * Topology: each document fans out to `bands` keyed rows; state per
  * (band, bucket) group is the list of (id, signature) of every prior
  * occupant. An arriving doc scores against all occupants (matching-lane
  * permille, integer-exact — the batch estimate) and joins the ledger.
  * Pairs therefore emit EXACTLY ONCE PER COLLIDING BAND (the `band`
  * column says which); the batch operator's cross-band `distinct()` is
  * the consumer's `dropDuplicates("id_a","id_b")` — a second stateful
  * operator Structured Streaming won't compose after
  * flatMapGroupsWithState, so the multiplicity is contract, not bug.
  *
  * Bounded state, loudly: per-group state is ≤ maxBucketSize signatures
  * (8·numHashes bytes each). Where the batch path DROPS a hot bucket
  * from candidate generation (capHotBuckets — it can see the whole
  * bucket before emitting), a stream cannot retroactively unemit, so
  * the cap here RAISES with the knob's name instead of silently
  * degrading recall. Total ledger state is bands× the batch ledger —
  * the price of bucket-local state; documented, like every module's
  * state bound.
  */
object StreamMinHashDedup {

  case class PairOut(id_a: Long, id_b: Long, est_matches: Long,
      est_permille: Long, band: Int)

  /** Word n-gram shingle SET with the batch whole-text convention for
    * docs shorter than n tokens (split keeps trailing empties, matching
    * Spark's `split(col, " ")`). */
  private[graft] def localShingles(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Set(text)
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toSet
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** The portable signature of one document — the local twin of
    * [[graft.ops.Dedup.minHashSignaturesPortable]] (parity spec-pinned
    * in StreamMinHashDedupSpec). */
  private[graft] def localSignature(text: String, n: Int,
      coeffs: Array[(Long, Long)]): Array[Long] = {
    val p = graft.ops.Dedup.PortableMinHashP
    val sig = Array.fill(coeffs.length)(Long.MaxValue)
    localShingles(text, n).foreach { sh =>
      val hex = md5Hex(sh)
      val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      var i = 0
      while (i < coeffs.length) {
        val v = (h1 * coeffs(i)._1 + h2 * coeffs(i)._2) % p
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Horner band-bucket fold — the local twin of
    * [[graft.ops.Dedup.signatureBandBuckets]]. */
  private[graft] def localBucket(sig: Array[Long], band: Int,
      rowsPerBand: Int): Long = {
    val m = graft.ops.Dedup.PortableBucketM
    val mul = graft.ops.Dedup.PortableBucketMul
    var acc = sig(band * rowsPerBand)
    var j = 1
    while (j < rowsPerBand) {
      acc = (acc * mul + sig(band * rowsPerBand + j)) % m
      j += 1
    }
    acc
  }

  def nearDupPairs(events: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
      thresholdPermille: Int = 500,
      maxBucketSize: Int = 1000): Dataset[PairOut] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    val spark = events.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    val coeffs = graft.ops.Dedup.portableMinHashCoeffs(numHashes)
    events
      .select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val sig = localSignature(text, n, coeffs)
          (0 until bands).iterator
            .map(b => (b, localBucket(sig, b, rowsPerBand), id, sig))
        }
      }
      .groupByKey { case (b, bucket, _, _) => (b, bucket) }
      .flatMapGroupsWithState[List[(Long, Array[Long])], PairOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), batch, state) =>
          var ledger = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[PairOut]
          batch.foreach { case (_, _, id, sig) =>
            if (!ledger.exists(_._1 == id)) { // replayed id: already folded
              if (ledger.size >= maxBucketSize)
                throw new IllegalStateException(
                  s"StreamMinHashDedup: band $band bucket exceeds " +
                    s"maxBucketSize=$maxBucketSize signatures (boilerplate " +
                    "hot bucket); raise maxBucketSize or pre-filter the " +
                    "boilerplate — the batch path (capHotBuckets) drops " +
                    "such buckets, a stream cannot retroactively unemit")
              ledger.foreach { case (oid, osig) =>
                var m = 0L; var i = 0
                while (i < sig.length) {
                  if (sig(i) == osig(i)) m += 1L
                  i += 1
                }
                val permille = m * 1000L / numHashes
                if (permille >= thresholdPermille)
                  out += PairOut(math.min(id, oid), math.max(id, oid),
                    m, permille, band)
              }
              ledger = (id, sig) :: ledger
            }
          }
          state.update(ledger)
          out.iterator
      }
  }
}
