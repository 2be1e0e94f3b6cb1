package graft

import graft.ops.{Quantiles, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histogram quantile equals exact quantile rounded down to its bucket") {
    // values 1..1000 uniformly: exact q-th per-mille rank is q; with
    // width 10 the answer is floor(q/10)*10
    val df = spark.range(1, 1001).select($"id".cast("double").as("v"))
    val out = Quantiles.histogramQuantiles(df, "v", bucketWidth = 10.0,
        qsPerMille = Seq(100, 500, 900, 1000))
      .as[(Int, Double)].collect().toMap
    assert(out == Map(100 -> 100.0, 500 -> 500.0, 900 -> 900.0, 1000 -> 1000.0))
  }

  test("keyed quantiles partition independently and ignore nulls") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(100.0))).toDF("k", "v")
    val out = Quantiles.histogramQuantiles(df, "v", 1.0, Seq(500, 1000), Seq("k"))
      .as[(String, Int, Double)].collect().toSet
    // "a": n=3 (null dropped), median threshold ceil(1.5)=2 → value 2.0
    assert(out == Set(("a", 500, 2.0), ("a", 1000, 3.0),
      ("b", 500, 100.0), ("b", 1000, 100.0)))
  }

  test("error is bounded by one bucket width on skewed data") {
    val df = spark.range(0, 10000).select(
      (pow($"id".cast("double") / 10000.0, 3.0) * 1000.0).as("v"))
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.9), 0.0)
    val got = Quantiles.histogramQuantiles(df, "v", 5.0, Seq(500, 900))
      .as[(Int, Double)].collect().toMap
    assert(math.abs(got(500) - exact(0)) <= 5.0)
    assert(math.abs(got(900) - exact(1)) <= 5.0)
  }

  test("hash split is exhaustive, proportional, growth-stable, and sample-consistent") {
    val df = spark.range(0, 20000).select($"id")
    val split = Sampling.hashSplit(df, "id",
        Seq("train" -> 800, "val" -> 900, "test" -> 1000))
      .as[(Long, String)].collect()
    val byLabel = split.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.map(_.size).sum == 20000) // exhaustive & disjoint
    assert(math.abs(byLabel("train").size - 16000) < 400)
    assert(math.abs(byLabel("val").size - 2000) < 300)
    // widening train only absorbs val rows — existing assignments stable
    val wide = Sampling.hashSplit(df, "id", Seq("train" -> 850, "test" -> 1000))
      .as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(byLabel("train").subsetOf(wide("train")))
    assert(byLabel("test").subsetOf(wide("test")))
    // the train split IS the 80% hashSample (same identity hash)
    val sample = Sampling.hashSample(df, "id", 800).as[Long].collect().toSet
    assert(byLabel("train") == sample)
  }

  test("hash sample is deterministic, rate-accurate, and id-consistent") {
    val df = spark.range(0, 20000).select($"id")
    val s1 = Sampling.hashSample(df, "id", 100)
    val s2 = Sampling.hashSample(df.repartition(13), "id", 100)
    val ids1 = s1.as[Long].collect().toSet
    assert(ids1 == s2.as[Long].collect().toSet) // partitioning-independent
    assert(math.abs(ids1.size - 2000) < 300) // ~10% ± noise
    // monotone rates: a 5% sample is a subset of the 10% sample
    val ids05 = Sampling.hashSample(df, "id", 50).as[Long].collect().toSet
    assert(ids05.subsetOf(ids1))
    // a different salt decorrelates
    val salted = Sampling.hashSample(df, "id", 100, salt = "x").as[Long].collect().toSet
    val overlap = ids1.intersect(salted).size.toDouble / ids1.size
    assert(overlap < 0.25, s"overlap $overlap")
  }

  test("weighted sample: rate ∝ weight, exact p_ppm, partition-independent") {
    // weights 0, tiny, medium, saturating
    val df = spark.range(0, 8000).select($"id",
      when($"id" % 4 === 0, 0L)
        .when($"id" % 4 === 1, 100L)
        .when($"id" % 4 === 2, 500L)
        .otherwise(2000L).as("w"))
    val got = Sampling.weightedSample(df, "id", "w", ratePerMillion = 1000,
        salt = "t")
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (_, w, p) => p == math.min(1000000L, w * 1000) })
    val byW = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!byW.contains(0L), "zero-weight rows never sampled")
    assert(byW(2000L) == 2000, "saturated rows (p=1) always kept")
    // acceptance ~ w/1000: 10% of w=100 rows, 50% of w=500 rows
    assert(math.abs(byW(100L) - 200) < 80, s"w=100 kept ${byW(100L)}")
    assert(math.abs(byW(500L) - 1000) < 150, s"w=500 kept ${byW(500L)}")
    // identity-hash contract: layout cannot change the sample
    val re = Sampling.weightedSample(df.repartition(11), "id", "w", 1000, "t")
      .as[(Long, Long, Long)].collect().toSet
    assert(re == got.toSet)
    // Horvitz-Thompson: Σ 1/p over the sample estimates the population
    val ht = got.map(1000000.0 / _._3).sum
    assert(math.abs(ht - 6000) < 600, s"HT estimate $ht for 6000 nonzero rows")
  }

  test("bottom-k sketch state is partition-invariant (merge = union-then-trim)") {
    val df = spark.range(1, 5001).select($"id".as("v"))
    def state(parts: Int) = Quantiles.sketch(df.repartition(parts), "v", k = 32)
      .select(explode($"__s").as("e"))
      .select($"e.h", $"e.v").as[(Long, Long)].collect().toSeq
    val s1 = state(1)
    assert(s1 == state(7) && s1 == state(32))
    assert(s1.size == 32 && s1 == s1.sorted)
  }

  test("sample quantiles track exact quantiles within the sampling bound") {
    // uniform 1..n: exact per-mille q rank value is ~ n*q/1000. With
    // k=256 the rank error concentrates around n/sqrt(k) = n/16; assert
    // a generous 3-sigma-ish 20% of n.
    val n = 20000
    val df = spark.range(1, n + 1).select($"id".as("v"))
    val out = Quantiles.sampleQuantiles(df, "v", k = 256,
        qsPerMille = Seq(100, 500, 900))
      .as[(Int, Long)].collect().toMap
    for ((q, got) <- out) {
      val exact = n.toLong * q / 1000
      assert(math.abs(got - exact) < n / 5, s"q=$q got=$got exact=$exact")
    }
  }

  test("sketch keeps duplicate values with multiplicity") {
    val df = Seq(7L, 7L, 7L, 9L).toDF("v")
    val vals = Quantiles.sketch(df, "v", k = 10)
      .select(expr("transform(__s, x -> x.v)")).as[Seq[Long]].head()
    assert(vals.sorted == Seq(7L, 7L, 7L, 9L))
  }

  test("capPerStratum: exact caps, partitioning-independent, uniform-ish") {
    val df = spark.range(0, 3000)
      .select($"id", (($"id" % 3).cast("string")).as("g"))
    val capped = Sampling.capPerStratum(df, Seq("g"), "id", cap = 7)
      .as[(String, Int, Long, Long)].collect()
    // exactly 7 per stratum, ranks 1..7, priorities strictly descending
    val byG = capped.groupBy(_._1)
    assert(byG.keySet == Set("0", "1", "2"))
    byG.values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 7))
      val pr = rs.sortBy(_._2).map(_._4).toSeq
      assert(pr == pr.sorted(Ordering[Long].reverse))
    }
    // stable under repartition (identity-hashed priority)
    val again = Sampling.capPerStratum(df.repartition(17), Seq("g"), "id", cap = 7)
      .as[(String, Int, Long, Long)].collect()
    assert(capped.toSet == again.toSet)
    // a cap >= stratum size keeps everything
    val all = Sampling.capPerStratum(df, Seq("g"), "id", cap = 1000)
    assert(all.count() == 3000)
  }

  test("rankPermille: hand-computed per-group percent ranks with ties") {
    val df = Seq(
      ("g1", 1L, 10.0), ("g1", 2L, 20.0), ("g1", 3L, 20.0),
      ("g1", 4L, 30.0), ("g1", 5L, 40.0),
      ("g2", 6L, 7.0)) // single-row group scales to 0
      .toDF("g", "id", "v")
    val got = graft.ops.Normalize.rankPermille(df, "v", Seq("g"))
      .select("id", "rank_permille").as[(Long, Long)].collect().toMap
    // g1 n=5: ranks 1,2,2,4,5 -> (r-1)*1000 div 4 = 0, 250, 250, 750, 1000
    assert(got == Map(1L -> 0L, 2L -> 250L, 3L -> 250L, 4L -> 750L,
      5L -> 1000L, 6L -> 0L))
  }

  test("rankPermille is row-order independent (tie determinism)") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 1.0))
      .toDF("g", "id", "v")
    val a = graft.ops.Normalize.rankPermille(df, "v", Seq("g"))
      .select("id", "rank_permille").as[(Long, Long)].collect().toSet
    val b = graft.ops.Normalize.rankPermille(df.repartition(7), "v", Seq("g"))
      .select("id", "rank_permille").as[(Long, Long)].collect().toSet
    assert(a == b && a == Set((1L, 500L), (2L, 500L), (3L, 0L)))
  }
}
