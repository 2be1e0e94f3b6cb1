package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming incremental IVF (30th module) — the stream form of
  * [[graft.ops.Similarity.incrementalIvfTopK]]: under a FROZEN epoch
  * codebook (trained by `trainIvfCodebookPortable`, broadcast into the
  * query), every arriving vector folds into a per-cell OCCUPANT LEDGER
  * and is scored against the probed cells' occupants the moment it
  * arrives. [[StreamMinHashDedup]] completes the incremental story for
  * near-dup text; this module completes it for embedding similarity — a
  * 100 TB ingest pipeline gets per-batch ANN without ever re-indexing.
  *
  * Identical algebra to the batch path: assignment = argmin integer
  * squared distance over the frozen centroids with (dist, cell)
  * tiebreak ([[graft.ops.Similarity.nearestCentroid]] — the SAME
  * function, not a re-implementation), probing = the nProbe nearest
  * cells by the same key, scoring = the quantized cosine while-loop
  * kernel. A ledger snapshot taken from this stream is exactly
  * [[graft.ops.Similarity.ivfAssignLedger]]'s table (parity
  * spec-pinned).
  *
  * Topology: each arriving vector fans out to nProbe + 1 keyed rows —
  * one ASSIGN row for its own cell, nProbe PROBE rows. State per cell
  * group is the list of (id, vec) occupants assigned there. Within a
  * group invocation, assign rows fold first, then probe rows score
  * against the full ledger — so vectors of the same micro-batch see
  * each other, exactly like the batch operator's ledger ∪ batch
  * candidate set. A neighbor occupies exactly ONE cell (its assigned
  * cell), so each (query, neighbor) candidate emits at most once —
  * no cross-band multiplicity caveat here, unlike MinHash banding.
  *
  * The stream emits SCORED CANDIDATES, not top-k: a per-query top-k is
  * a second stateful operator Structured Streaming won't compose after
  * flatMapGroupsWithState, and candidates arrive over time anyway
  * (prefix semantics: a query scores the corpus AS OF its arrival).
  * The consumer's batch top-k over candidates reproduces
  * `incrementalIvfTopK` exactly (spec-pinned).
  *
  * Bounded state, loudly: per-cell state is ≤ maxCellSize vectors
  * (8·dim bytes each; ~N/nCells expected at √N auto-sizing). A stream
  * cannot retroactively unemit what a batch cap would have dropped, so
  * the cap RAISES with the knob's name instead of silently degrading
  * recall — the StreamMinHashDedup posture.
  */
object StreamIvfAssign {

  case class CandOut(query_id: Long, neighbor_id: Long, cosine: Double,
      cell: Int)

  /** (cell, isAssign, id, vec) fan-out rows for one vector under the
    * frozen codebook — the stream twin of assign + probe. */
  private[graft] def fanOut(id: Long, vec: Array[Double],
      centroids: Array[Array[Double]], nProbe: Int)
      : Iterator[(Int, Boolean, Long, Array[Double])] = {
    val own = graft.ops.Similarity.nearestCentroid(vec, centroids)
    val probed = centroids.indices
      .map(c => (c, graft.ops.Similarity.sqDist(vec, centroids(c))))
      .sortBy { case (c, d) => (d, c) }
      .take(nProbe).map(_._1)
    Iterator.single((own, true, id, vec)) ++
      probed.iterator.map(c => (c, false, id, vec))
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var an = 0.0; var bn = 0.0; var d = 0.0; var i = 0
    while (i < a.length) { an += a(i) * a(i); bn += b(i) * b(i); d += a(i) * b(i); i += 1 }
    d / math.sqrt(an * bn)
  }

  def candidates(events: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], nProbe: Int = 4,
      maxCellSize: Int = 100000): Dataset[CandOut] = {
    require(centroids.nonEmpty, "frozen codebook must be non-empty")
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe must be in [1, ${centroids.length}], got $nProbe")
    val spark = events.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    events
      .select(col(idCol).cast("long").as("id"),
        graft.ops.Similarity.quantize(col(vecCol)).as("vec"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, vec) =>
        if (vec == null) Iterator.empty else fanOut(id, vec, bc.value, nProbe)
      }
      .groupByKey { case (cell, _, _, _) => cell }
      .flatMapGroupsWithState[List[(Long, Array[Double])], CandOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (cell, rows, state) =>
          var ledger = state.getOption.getOrElse(Nil)
          val rowSeq = rows.toSeq
          // assigns fold FIRST so this micro-batch's vectors see each
          // other — the batch operator's ledger ∪ batch candidate set
          rowSeq.foreach { case (_, isAssign, id, vec) =>
            if (isAssign && !ledger.exists(_._1 == id)) {
              if (ledger.size >= maxCellSize)
                throw new IllegalStateException(
                  s"StreamIvfAssign: cell $cell exceeds maxCellSize=" +
                    s"$maxCellSize occupants; raise maxCellSize or refreeze " +
                    "the epoch codebook at the current corpus width — the " +
                    "batch path can re-train, a stream cannot retroactively " +
                    "unemit")
              ledger = (id, vec) :: ledger
            }
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[CandOut]
          rowSeq.foreach { case (_, isAssign, id, vec) =>
            if (!isAssign) ledger.foreach { case (oid, ovec) =>
              if (oid != id) {
                val c = cosine(vec, ovec)
                if (!c.isNaN) out += CandOut(id, oid, c, cell)
              }
            }
          }
          state.update(ledger)
          out.iterator
      }
  }
}
