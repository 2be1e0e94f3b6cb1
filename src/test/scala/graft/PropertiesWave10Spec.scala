package graft

import graft.ops.{Coreness, Features, GopherRules, KAnonymity, TargetEncode, TextStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generative invariants for the round-8 operators, on seeded random
  * inputs nobody hand-picked — the cross-cutting sanity layer the
  * fixture specs can't provide.
  */
class PropertiesWave10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("target encoding shrinks between the category and global rates") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map { _ =>
      (s"c${rnd.nextInt(12)}", if (rnd.nextInt(10) < 3) 1L else 0L)
    }
    val df = rows.toDF("cat", "t")
    val globalPpm = 1000000L * rows.count(_._2 == 1L) / rows.length
    for (m <- Seq(0L, 5L, 50L)) {
      val enc = TargetEncode.encoderTable(df, "cat", col("t") === 1L, m)
        .as[(String, Long, Long, Long)].collect()
      assert(enc.map(_._2).sum == rows.length) // class sizes partition rows
      enc.foreach { case (c, n, pos, e) =>
        val raw = 1000000L * pos / n
        val lo = math.min(raw, globalPpm) - 1 // ±1: truncating div slack
        val hi = math.max(raw, globalPpm) + 1
        assert(e >= lo && e <= hi, s"cat=$c m=$m enc=$e raw=$raw g=$globalPpm")
      }
    }
    // huge smoothing pins every category to the global rate, up to the
    // residual n·1e6/m ≈ n ppm a finite m leaves behind
    val flat = TargetEncode.encoderTable(df, "cat", col("t") === 1L, 1000000L)
      .as[(String, Long, Long, Long)].collect()
    flat.foreach { case (c, n, _, e) =>
      assert(math.abs(e - globalPpm) <= n + 2, s"cat=$c enc=$e g=$globalPpm")
    }
  }

  test("gopher flags: pass is exactly the conjunction; counts are consistent") {
    val rnd = new scala.util.Random(17)
    val words = Seq("the", "and", "word", "###", "42", "...", "alpha", "x")
    val docs = (1L to 60L).map { i =>
      (i, (1 to (5 + rnd.nextInt(80)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val got = GopherRules.ruleFlags(docs.toDF("id", "txt"), "id", "txt").collect()
    got.foreach { r =>
      val flags = Seq("words_ok", "mwl_ok", "sym_ok", "alpha_ok", "stop_ok")
        .map(r.getAs[Long])
      assert(flags.forall(f => f == 0L || f == 1L))
      assert(r.getAs[Long]("pass") == flags.product)
      assert(r.getAs[Long]("n_alpha_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_stop_hits") <= r.getAs[Long]("n_words"))
    }
  }

  test("coreness is degree-bounded; a clique settles to n-1 in one round") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 150).map(_ => (s"v${rnd.nextInt(30)}", s"v${rnd.nextInt(30)}"))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val sym = (edges ++ edges.map(_.swap)).distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
    val core = Coreness.hIndexRounds(df, "src", "dst", rounds = 6)
      .as[(String, Long)].collect().toMap
    core.foreach { case (v, c) => assert(c <= deg(v), s"$v core $c > deg") }
    val k5 = (for (a <- 1 to 5; b <- 1 to 5 if a < b) yield (s"k$a", s"k$b"))
      .toDF("src", "dst")
    val kc = Coreness.hIndexRounds(k5, "src", "dst", rounds = 1)
      .as[(String, Long)].collect()
    assert(kc.forall(_._2 == 4L))
  }

  test("token concentration bounds: top <= n, hhi in [1e6/n_distinct, 1e6]") {
    val rnd = new scala.util.Random(31)
    val docs = (1L to 40L).map { i =>
      (i, s"s${i % 5}", (1 to (3 + rnd.nextInt(40)))
        .map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    }
    val got = TextStats.tokenConcentration(docs.toDF("id", "k", "text"), "k", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (k, n, d, top, hhi, gini) =>
      assert(top <= n && d <= n, s"$k")
      assert(hhi <= 1000000L && gini == 1000000L - hhi, s"$k")
      // Cauchy-Schwarz: sum c^2 >= n^2/d, so hhi >= floor-ish 1e6/d
      assert(hhi >= 1000000L / d - 1, s"$k hhi=$hhi d=$d")
    }
  }

  test("length-bucketed batches: every id once, positions dense per batch") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 300L).map(i => (i, 5L + rnd.nextInt(200)))
    val got = Features.lengthBucketedBatches(rows.toDF("id", "len"), "id", "len",
        bucketWidth = 32, batchSize = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).distinct.length == rows.length) // ids preserved once
    got.groupBy(r => (r._3, r._4)).foreach { case ((b, bid), rs) =>
      assert(rs.length <= 8, s"bucket $b batch $bid overfull")
      assert(rs.map(_._5).sorted.toSeq == (0 until rs.length).map(_.toLong),
        s"bucket $b batch $bid positions not dense")
      rs.foreach(r => assert(r._2 / 32 == b, "row in wrong bucket"))
    }
  }

  test("k-anonymity: class sizes partition rows; summary matches classes") {
    val rnd = new scala.util.Random(43)
    val rows = (1 to 400).map(_ => (s"n${rnd.nextInt(6)}", s"s${rnd.nextInt(4)}"))
    val df = rows.toDF("nat", "seg")
    val cls = KAnonymity.classSizes(df, Seq("nat", "seg"), k = 15)
      .as[(String, String, Long, Long)].collect()
    assert(cls.map(_._3).sum == rows.length)
    val sum = KAnonymity.riskSummary(df, Seq("nat", "seg"), k = 15)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(sum._1 == cls.length)
    assert(sum._2 == cls.count(_._4 == 1L))
    assert(sum._3 == cls.filter(_._4 == 1L).map(_._3).sum)
    assert(sum._4 == cls.map(_._3).min && sum._5 == cls.map(_._3).max)
  }
}
