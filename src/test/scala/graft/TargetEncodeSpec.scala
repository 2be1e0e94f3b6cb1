package graft

import graft.ops.{TargetEncode, TextStats}
import graft.streaming.StreamTargetEncode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TargetEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("smoothed encoding: hand-computed shrinkage toward the global rate") {
    // A: 3 rows 2 pos; B: 1 row 1 pos; global = 3/4 = 750000 ppm, m = 2
    val df = Seq(("A", 1L), ("A", 1L), ("A", 0L), ("B", 1L)).toDF("cat", "t")
    val got = TargetEncode.encoderTable(df, "cat", col("t") === 1L, smoothing = 2L)
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, n, p, e) => c -> ((n, p, e)) }.toMap
    // A: (1e6·2 + 2·750000) div 5 = 3500000 div 5 = 700000
    assert(got("A") == ((3L, 2L, 700000L)))
    // B: (1e6·1 + 2·750000) div 3 = 2500000 div 3 = 833333 (truncating)
    assert(got("B") == ((1L, 1L, 833333L)))
  }

  test("smoothing 0 degenerates to the raw per-category rate") {
    val df = Seq(("A", 1L), ("A", 0L), ("B", 0L)).toDF("cat", "t")
    val got = TargetEncode.encoderTable(df, "cat", col("t") === 1L, smoothing = 0L)
      .as[(String, Long, Long, Long)].collect()
      .map { case (c, _, _, e) => c -> e }.toMap
    assert(got("A") == 500000L && got("B") == 0L)
  }

  test("token concentration: hand-computed HHI/Gini, empty tokens dropped") {
    // k1: "a a b"   → counts {a:2, b:1}, n=3, sq=5,  hhi = 5e6 div 9 = 555555
    // k2: "x  x"    → double space yields an empty token, dropped: {x:2},
    //                 n=2, sq=4, hhi = 4e6 div 4 = 1000000, gini 0
    val df = Seq((1L, "k1", "a a b"), (2L, "k2", "x  x")).toDF("id", "k", "text")
    val got = TextStats.tokenConcentration(df, "k", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("k1") == (("k1", 3L, 2L, 2L, 555555L, 444445L)))
    assert(got("k2") == (("k2", 2L, 1L, 2L, 1000000L, 0L)))
  }

  test("streaming running counts ≡ batch fit after EVERY prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StreamTargetEncode.runningCategoryCounts(
      input.toDF().toDF("cat", "t"), "cat", col("t") === 1L)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("te_state").start()
    val batches = Seq(
      Seq(("A", 1L), ("B", 0L)),
      Seq(("A", 0L), ("A", 1L), ("C", 1L)),
      Seq(("B", 0L), ("C", 0L), ("A", 1L)))
    var fed = Seq.empty[(String, Long)]
    batches.foreach { b =>
      fed = fed ++ b
      input.addData(b: _*)
      q.processAllAvailable()
      // update log → latest snapshot per category: n is monotone, max-n wins
      val latest = spark.table("te_state")
        .groupBy("category")
        .agg(max(struct(col("n"), col("n_pos"))).as("m"))
        .select(col("category"), col("m.n").as("n"), col("m.n_pos").as("n_pos"))
      val got = latest.as[(String, Long, Long)].collect().toSet
      val want = TargetEncode.categoryCounts(fed.toDF("cat", "t"),
          "cat", col("t") === 1L)
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"after ${fed.length} rows")
      // shared derivation: encoder from the stream snapshot == batch fit
      val encS = TargetEncode.encoderFromCounts(latest, smoothing = 5L)
        .as[(String, Long, Long, Long)].collect().toSet
      val encB = TargetEncode.encoderTable(fed.toDF("cat", "t"), "cat",
          col("t") === 1L, smoothing = 5L)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(encS == encB, s"encoder after ${fed.length} rows")
    }
    q.stop()
  }

  test("concentration orders boilerplate above diverse text") {
    val df = Seq((1L, "spam", "buy buy buy buy now"),
      (2L, "prose", "the quick brown fox jumps over dogs")).toDF("id", "k", "text")
    val got = TextStats.tokenConcentration(df, "k", "text")
      .select("key", "hhi_ppm").as[(String, Long)].collect().toMap
    assert(got("spam") > got("prose"))
  }

  test("LOO leakage gap shrinks with category size, NULL for one-class") {
    import org.apache.spark.sql.functions._
    // tiny category (n=2, mixed), large category (n=40, mixed),
    // one-class category (all negative)
    val rows = Seq(("t", true), ("t", false)) ++
      (0 until 40).map(i => ("big", i % 2 == 0)) ++
      Seq(("neg", false), ("neg", false))
    val out = graft.ops.TargetEncode.looLeakageAudit(
        rows.toDF("cat", "y"), "cat", col("y"), smoothing = 20L)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    val tiny = out("t"); val big = out("big"); val neg = out("neg")
    // the leak gap is ~1e6/(n-1+m): tiny must dwarf big
    assert(tiny.getLong(6) > big.getLong(6))
    assert(tiny.getLong(6) == 1000000L / (2 - 1 + 20) ||
      tiny.getLong(6) == 1000000L / 21 + 1) // floor pairing wiggle
    // one-class: no positive row exists -> loo_pos and gap are NULL
    assert(neg.isNullAt(4) && neg.isNullAt(6))
    // a positive row must see a LOWER encoding than a negative row sees
    assert(tiny.getLong(4) < tiny.getLong(5))
  }
}
