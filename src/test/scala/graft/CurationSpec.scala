package graft

import graft.ops.Curation
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate: drops exact dups, near-dups, and low-quality docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running far away"),
      (2L, "the quick brown fox jumps over the lazy dog and keeps running far away"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog and keeps running very far"), // near dup of 1
      (4L, "a a a a a a a a"), // low quality (no diversity)
      (5L, "many of the different and unusual words in this sentence make a genuinely diverse document here"))
      .toDF("doc_id", "text")
    val out = Curation.curate(docs, "doc_id", "text",
        minQuality = 0.35, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 5L))
  }

  test("curate on testdata: survivors have quality >= gate and lang_pred column") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Curation.curate(docs, "doc_id", "text",
      minQuality = 0.3, jaccardThreshold = 0.5)
    val n = out.count()
    assert(n > 0 && n < 500) // something survives, something is dropped
    assert(out.where(col("quality") < 0.3).count() == 0)
    assert(out.columns.contains("lang_pred"))
  }

  test("streaming dedup keeps first occurrence per content within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val df = input.toDS().toDF("id", "text", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = StreamDedup.dedupByContent(df, "text", "ts", "1 minute")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    val base = 3600000000L
    input.addData((1L, "alpha", base), (2L, "alpha", base + 1000000L),
      (3L, "beta", base + 2000000L))
    q.processAllAvailable()
    input.addData((4L, "alpha", base + 3000000L)) // still within state → dropped
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
  }

  test("rareTokenScore flags corpus-rare gibberish, not normal prose") {
    import graft.ops.TextStats
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran to the mat"),
      (3L, "xq7zk vvprw q99ty zzxw1 kkjj9 the")) // 5 hapax tokens + 1 common
      .toDF("doc_id", "text")
    val out = TextStats.rareTokenScore(docs, "doc_id", "text", rareDf = 1L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // docs 1/2 share every token pairwise except sat/ran/on/to
    assert(out(1L)._4 < 500 && out(2L)._4 < 500)
    // doc 3: 5 of 6 tokens are hapax -> (5*1000) div 6 = 833
    assert(out(3L) == ((3L, 6L, 5L, 833L)))
  }

  test("noveltyScores: first doc owns shared shingles; later copies score low") {
    import graft.ops.TextStats
    val docs = Seq(
      (1L, "a b c d"), // shingles: "a b c", "b c d" — both first here
      (2L, "a b c d"), // exact copy -> 0 novel
      (3L, "a b c e"), // "a b c" seen, "b c e" novel -> 500
      (4L, "zz")) // short doc: whole text is the single (novel) shingle
      .toDF("doc_id", "text")
    val out = TextStats.noveltyScores(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L, 1000L)))
    assert(out(2L) == ((2L, 2L, 0L, 0L)))
    assert(out(3L) == ((3L, 2L, 1L, 500L)))
    assert(out(4L) == ((4L, 1L, 1L, 1000L)))
  }

  test("decontaminate: hand-computed n-gram overlap vs eval corpus") {
    import graft.ops.Decontaminate
    val train = Seq(
      (1L, "the quick brown fox jumps high"), // 4 trigrams, 2 in eval
      (2L, "completely novel words appear here"), // 3 trigrams, 0 in eval
      (3L, "the quick brown fox"), // 2 trigrams, both in eval
      (4L, "so short")) // whole-text shingle, not in eval
      .toDF("doc_id", "text")
    val ev = Seq((100L, "the quick brown fox strikes")).toDF("doc_id", "text")
    val out = Decontaminate.flagContaminated(train, ev, "doc_id", "text",
        n = 3, thresholdPermille = 500)
      .select("id", "n_ngrams", "n_contam", "contam_permille", "contaminated")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // eval trigrams: {the quick brown, quick brown fox, brown fox strikes}
    assert(out(1L) == ((1L, 4L, 2L, 500L, 1L)))
    assert(out(2L) == ((2L, 3L, 0L, 0L, 0L)))
    assert(out(3L) == ((3L, 2L, 2L, 1000L, 1L)))
    assert(out(4L) == ((4L, 1L, 0L, 0L, 0L)))
  }

  test("decontaminate: eval n-gram probe broadcasts, no shuffle of train side beyond its aggs") {
    import graft.ops.Decontaminate
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ev = docs.where(col("doc_id") % 10 === 0)
    val train = docs.where(col("doc_id") % 10 =!= 0)
    val plan = Decontaminate.flagContaminated(train, ev, "doc_id", "text",
        n = 3, thresholdPermille = 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan) // eval probe side
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("repetitionStats: hand-computed bigram/5-gram repetition fractions") {
    import graft.ops.TextStats
    val docs = Seq(
      (1L, "a b a b a b"),          // bigrams: [ab,ba,ab,ba,ab] -> 5 total, all dup, top "a b"=3
      (2L, "u v w x y z"),          // 5 distinct bigrams, no repetition
      (3L, "s t"))                  // one bigram, below 5-gram length
      .toDF("doc_id", "text")
    val r2 = TextStats.repetitionStats(docs, "doc_id", "text", 2)
      .select("doc_id", "total_ngrams", "dup_ngrams", "top_ngram",
        "dup_permille", "top_permille")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(r2(1L) == ((1L, 5L, 5L, 3L, 1000L, 600L)))
    assert(r2(2L) == ((2L, 5L, 0L, 1L, 0L, 200L)))
    assert(r2(3L) == ((3L, 1L, 0L, 1L, 0L, 1000L)))
    val r5 = TextStats.repetitionStats(docs, "doc_id", "text", 5)
      .select("doc_id", "total_ngrams", "dup_ngrams").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: 5-grams [ababa, babab] distinct; doc 3 too short -> absent
    assert(r5(1L) == ((1L, 2L, 0L)))
    assert(!r5.contains(3L))
  }
}
