package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting invariants of the round-7 additions — cheap properties
  * that catch refactor regressions the per-operator example tests miss.
  */
class PropertiesWave8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("flagOutliers row count per group equals madStats n_outliers") {
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 3}"
      val v = if (i % 97 == 0) 100000L + i else (i % 50).toLong
      (g, v)
    }
    val df = rows.toDF("grp", "v")
    val stats = Outliers.madStats(df, "v", Seq("grp"))
      .select("grp", "n_outliers").as[(String, Long)].collect().toMap
    val flagged = Outliers.flagOutliers(df, "v", Seq("grp"))
      .where($"is_outlier").groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    stats.foreach { case (g, n) =>
      assert(flagged.getOrElse(g, 0L) == n, s"group $g")
    }
  }

  test("KMV pairwise Jaccard stays in [0, 1000] and is exact under full sketches") {
    val rows = (1 to 3).flatMap(s => (1L to 40L).map(h => (s"s$s", h * s)))
    val sk = SetSketch.kmvSketches(rows.toDF("k", "h"), "k", "h", k = 512)
    val got = SetSketch.pairwiseJaccard(sk, "k", 512)
      .select("jaccard_permille").as[Long].collect()
    assert(got.forall(j => j >= 0L && j <= 1000L))
  }

  test("lag-2 autocorrelation of a period-2 series is +1") {
    // counts 1,3,1,3,1,3: lag-2 pairs (1,1),(3,3),(1,1),(3,3) -> r = +1
    val events = Seq(0, 1, 2, 3, 4, 5).flatMap { d =>
      val n = if (d % 2 == 0) 1 else 3
      (0 until n).map(i => ("t", d * day + i))
    }
    val got = Trend.lagAutocorr(events.toDF("t", "ts_us"), "t", "ts_us",
        lag = 2)
      .select("r").as[Double].collect().head
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("epoch batching is partition-invariant") {
    val docs = (1L to 150L).toDF("doc_id")
    val a = Features.epochBatches(docs.repartition(1), "doc_id", 2, 32)
      .as[(Long, Int, Long, Long)].collect().toSet
    val b = Features.epochBatches(docs.repartition(11), "doc_id", 2, 32)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("join profile row sums are consistent with the join itself") {
    val l = (1 to 200).map(i => (i % 37).toLong).toDF("k")
    val r = (1 to 150).map(i => (i % 23).toLong).toDF("k2")
    val p = JoinProfile.profile(l, "k", r, "k2")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(p._1 == 200L && p._2 == 150L)
    val actualJoin = l.join(r, $"k" === $"k2").count()
    assert(p._9 == actualJoin) // exact predicted cardinality
  }

  test("vocab drift is bounded by 2000 and zero against itself") {
    val docs = Seq(("a", "p q r s"), ("b", "p q r s"), ("c", "w x y z"))
      .toDF("source", "text")
    val got = VocabDrift.drift(docs, "source", "text", 512)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got(("a", "b")) == 0L)
    assert(got.values.forall(v => v >= 0L && v <= 2000L))
  }
}
