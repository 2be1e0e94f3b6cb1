package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (Sennrich et al. 2016 — the public
  * byte-pair-encoding algorithm): repeatedly find the most frequent
  * adjacent symbol pair across the corpus and merge it into one symbol.
  *
  * Corpus representation is RELATIONAL — one row per (word, position,
  * symbol) over DISTINCT words, weighted by word multiplicity — so every
  * training step is window/join algebra that an unrolled-CTE oracle can
  * replay exactly:
  *
  *   1. pair counts: `lead(sym)` over (word, pos) + a weighted groupBy;
  *   2. best pair: global argmax, ties broken (count desc, left asc,
  *      right asc) — ONE collected row per round (a scalar action, same
  *      budget class as a convergence check, never O(data));
  *   3. merge: BPE merges leftmost-first within overlap chains (aaa with
  *      pair (a,a) → (aa)a, not a(aa)). Relationally: mark candidate
  *      positions, group CHAINED candidates (each one's right element is
  *      the next one's left) into runs, keep the odd-indexed members of
  *      each run — exactly greedy leftmost non-overlapping — then rewrite
  *      kept left symbols to the merged symbol and delete their right
  *      rows.
  *
  * Every structure is bounded: rows = Σ|distinct word|, pair-count table
  * ≤ |symbol vocab|², per-round driver traffic = one row. At 100 TB the
  * distinct-word table is the same vocabulary-sized object the tokenizer
  * and rare-token scorer already key on.
  */
object BpeTrain {

  /** @param words (w, n_w) distinct words with multiplicities
    * @return (merges, rows): merges = (round, left, right, pair_count)
    *         in training order; rows = final segmentation
    *         (w, pos, sym) — pos keeps the ORIGINAL character index of
    *         each surviving symbol's first character.
    */
  def train(words: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val spark = words.sparkSession
    import spark.implicits._
    val wn = words.select($"w", $"n_w")
    var rows = wn.select($"w", explode(expr("sequence(1, length(w))")).as("pos"))
      .withColumn("sym", expr("substring(w, pos, 1)"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    val win = Window.partitionBy($"w").orderBy($"pos")
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val withNext = rows
        .withColumn("nsym", lead($"sym", 1).over(win))
        .withColumn("npos", lead($"pos", 1).over(win))
      val counts = withNext.where($"nsym".isNotNull)
        .join(wn, "w")
        .groupBy($"sym", $"nsym")
        .agg(sum($"n_w").as("cnt"))
      val best = counts.orderBy($"cnt".desc, $"sym".asc, $"nsym".asc)
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true
      else {
        val (ba, bb, cnt) = best(0)
        merges += ((r, ba, bb, cnt))
        rows = mergeStep(rows, ba, bb).localCheckpoint(true)
      }
      r += 1
    }
    (spark.createDataset(merges.result())
      .toDF("round", "left", "right", "pair_count"), rows)
  }

  /** BPE ENCODING: apply an already-learned merge list, in order, to a
    * fresh word set — the deployment-side half of BPE (training picks the
    * merges; encoding replays them). On the training corpus itself this
    * reproduces the training segmentation exactly (spec-asserted); on new
    * words it applies the same greedy leftmost semantics per merge.
    */
  def encode(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var rows = words.select($"w").distinct()
      .select($"w", explode(expr("sequence(1, length(w))")).as("pos"))
      .withColumn("sym", expr("substring(w, pos, 1)"))
      .localCheckpoint(true)
    for ((ba, bb) <- merges)
      rows = mergeStep(rows, ba, bb).localCheckpoint(true)
    rows
  }

  /** One merge round: rewrite greedy-leftmost non-overlapping (ba, bb)
    * adjacencies to the merged symbol (see the run trick in the object
    * doc). Shared by training (argmax-chosen pair) and encoding (given
    * pair). */
  private def mergeStep(rows: DataFrame, ba: String, bb: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val win = Window.partitionBy($"w").orderBy($"pos")
    val withNext = rows
      .withColumn("nsym", lead($"sym", 1).over(win))
      .withColumn("npos", lead($"pos", 1).over(win))
    val cand = withNext
      .where($"sym" === ba && $"nsym" === bb)
      .select($"w", $"pos", $"npos")
    // chained candidates (right element == next candidate's left element)
    // form runs; keep odd positions within each run = greedy leftmost
    // non-overlapping
    val kept = cand
      .withColumn("rs",
        when(lag($"npos", 1).over(win).isNull ||
          lag($"npos", 1).over(win) =!= $"pos", 1).otherwise(0))
      .withColumn("run",
        sum($"rs").over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("k",
        row_number().over(Window.partitionBy($"w", $"run").orderBy($"pos")))
      .where($"k" % 2 === 1)
      .select($"w", $"pos", $"npos")
    rows
      .join(kept.select($"w", $"pos", lit(1).as("__m")), Seq("w", "pos"), "left")
      .join(kept.select($"w", $"npos".as("pos"), lit(1).as("__d")),
        Seq("w", "pos"), "left")
      .where($"__d".isNull)
      .select($"w", $"pos",
        when($"__m".isNotNull, lit(ba + bb)).otherwise($"sym").as("sym"))
  }

  /** Corpus words (w, n_w) in the tokenizer's word convention:
    * lowercased `[a-z0-9]+` runs, multiplicity = occurrence count. */
  def corpusWords(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n_w"))
  }
}
