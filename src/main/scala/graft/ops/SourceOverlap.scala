package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-level corpus overlap audit — which SOURCES are feeding you
  * the same text? Document-level near-dup ([[Dedup]]) finds pairs of
  * documents; this rolls the same shingle evidence up to the
  * (source, source) level so a curation pass can drop or down-weight a
  * whole mirrored feed before per-document work starts. The overlap
  * currency is distinct word 5-grams per source: shared count and a
  * containment-style permille against the SMALLER side (a feed fully
  * contained in a bigger one scores 1000 regardless of size ratio).
  *
  * Scale posture: the pair generation is an inverted-index self-join
  * keyed by shingle, df-capped — a shingle seen by more than `maxDf`
  * sources is boilerplate and is dropped BEFORE the join (the
  * [[Dedup]] hot-bucket discipline), bounding join fan-out at
  * O(maxDf²) per shingle. Totals are computed on the SAME capped
  * shingle set so the permille is internally consistent. Shuffles are
  * keyed by shingle then by source pair; the source dimension is tiny
  * by construction, the shingle dimension is corpus-sized and never
  * collected.
  *
  * Docs with fewer than n tokens contribute nothing (no partial
  * shingles — mirrored exactly in the oracle).
  */
object SourceOverlap {

  def pairOverlap(docs: DataFrame, sourceCol: String, textCol: String,
      n: Int = 5, maxDf: Int = 16): DataFrame = {
    require(n >= 2 && n <= 12, s"n must be in [2, 12], got $n")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    // r12 OPT: gated widen (Similarity.widen) — the per-row 5-gram
    // transform is CPU-bound and a small single-file scan otherwise runs
    // it in one task (profiled 0.86 s single-task of a 4.2 s sf0.1 run);
    // no-op at real scale. Keyed on the token array, not the (tiny-
    // cardinality, size-skewed) source column, so rows spread evenly;
    // the following distinct re-shuffles by (src, shingle) anyway.
    val sh = graft.ops.Similarity.widen(docs
      .select(col(sourceCol).as("src"), split(col(textCol), " ").as("w"))
      .where(size(col("w")) >= n), "w")
      .select(col("src"), explode(expr(
        s"transform(sequence(0, size(w) - $n), i -> " +
          s"concat_ws(' ', slice(w, i + 1, $n)))")).as("shingle"))
      .distinct()
      // feeds the df count AND the semi-join back — one corpus scan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select("shingle")
    val cs = sh.join(kept, Seq("shingle"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cs.groupBy("src").agg(count(lit(1)).as("n_sh"))
    val pairs = cs.select(col("shingle"), col("src").as("src_a"))
      .join(cs.select(col("shingle"), col("src").as("src_b")), Seq("shingle"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(totals.select(col("src").as("src_a"), col("n_sh").as("n_a")),
        Seq("src_a"))
      .join(totals.select(col("src").as("src_b"), col("n_sh").as("n_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared"), col("n_a"),
        col("n_b"),
        expr("(1000 * shared) div least(n_a, n_b)").as("contain_permille"))
      .orderBy("src_a", "src_b")
  }
}
