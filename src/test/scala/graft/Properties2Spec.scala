package graft

import graft.ops.{Chunker, Quantiles, RangeJoin, Sessionize}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the round-4 operator families, plus a
  * cross-validation of the gap sessionizer against Spark's own
  * `session_window` aggregation. */
class Properties2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, minSuccessful: Int): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withWorkers(1)
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("range join equals the naive non-equi join for arbitrary inputs") {
    val gen = for {
      points <- Gen.listOfN(30, Gen.choose(-500, 500))
      ivs <- Gen.listOfN(12, for {
        lo <- Gen.choose(-500, 500); len <- Gen.choose(-20, 200)
      } yield (lo, lo + len)) // includes empty (lo > hi) intervals
      w <- Gen.oneOf(3.0, 17.0, 100.0)
    } yield (points, ivs, w)
    check(Prop.forAll(gen) { case (ps, ivs, w) =>
      val pdf = ps.zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
        .toDF("pid", "v")
      val idf = ivs.zipWithIndex.map { case ((lo, hi), i) =>
        (i.toLong, lo.toDouble, hi.toDouble) }.toDF("iid", "lo", "hi")
      val banded = RangeJoin.pointInInterval(pdf, "v", idf, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val naive = pdf.join(idf, $"v" >= $"lo" && $"v" <= $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      banded == naive
    }, 12)
  }

  test("chunking reconstructs the document exactly (strides cover, overlap repeats)") {
    val gen = for {
      n <- Gen.choose(1, 120)
      chunk <- Gen.choose(2, 20)
      overlap <- Gen.choose(0, 1).map(o => math.min(o * (chunk - 1), chunk - 1))
    } yield (n, chunk, overlap)
    check(Prop.forAll(gen) { case (n, chunk, overlap) =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val chunks = Chunker.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", chunk, overlap)
        .as[(Long, Int, Int, String)].collect().sortBy(_._2)
      val stride = chunk - overlap
      // stitching chunks back (dropping each successor's overlap prefix)
      // reproduces the token sequence exactly
      val stitched: Seq[String] = chunks.head._4.split(" ").toSeq ++
        chunks.tail.toSeq.flatMap(c => c._4.split(" ").drop(overlap).toSeq)
      // every chunk starts where its index says, so stitching can also be
      // validated positionally
      stitched.take(n) == (1 to n).map(i => s"w$i") &&
        chunks.forall { case (_, idx, nt, txt) =>
          txt.split(" ").length == nt && nt <= chunk &&
            txt.split(" ").head == s"w${idx * stride + 1}" }
    }, 20)
  }

  test("histogram quantile brackets the exact quantile within one bucket") {
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.choose(0, 10000))
      w <- Gen.oneOf(7.0, 50.0, 333.0)
      q <- Gen.oneOf(1, 250, 500, 750, 999, 1000)
    } yield (vals.take(200), w, q)
    check(Prop.forAll(gen) { case (vals, w, q) =>
      val df = vals.map(_.toDouble).toDF("v")
      val got = Quantiles.histogramQuantiles(df, "v", w, Seq(q))
        .as[(Int, Double)].collect().head._2
      // exact rank value: the ceil(n*q/1000)-th smallest
      val sorted = vals.sorted
      val rank = (vals.size.toLong * q + 999) / 1000
      val exact = sorted(math.max(rank.toInt - 1, 0)).toDouble
      got <= exact && exact < got + w
    }, 20)
  }

  test("two events exactly one gap apart merge, in ours and in native") {
    val gapUs = 300000000L
    val ev = Seq((1L, 0L, 1L), (1L, gapUs, 2L))
      .toDF("user_id", "ts_us", "event_id")
    val ours = Sessionize.sessionStats(ev, "user_id", "ts_us", "event_id", gapUs)
      .select("n_sessions").as[Long].head()
    val native = ev.withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .count().count()
    assert(ours == 1L && native == 1L)
  }

  test("gap sessionizer agrees with Spark's native session_window counts") {
    // same gap, same events → identical (n_sessions, n_events) per user
    val gen = Gen.listOfN(60, for {
      u <- Gen.choose(1, 5)
      t <- Gen.choose(0, 5000) // seconds
    } yield (u.toLong, t.toLong * 1000000L))
    check(Prop.forAll(gen) { raw =>
      raw.isEmpty || {
        val ev = raw.zipWithIndex
          .map { case ((u, us), i) => (u, us, i.toLong) }
          .toDF("user_id", "ts_us", "event_id")
        // boundary semantics AGREE: Spark's session_window merges an event
        // at exactly prev + gap (touching windows merge — found by the
        // ScalaCheck shrinker on a diff == gap counterexample), which is
        // our `new session iff diff > gap` predicate verbatim
        val gapUs = 300000000L // native "5 minutes" equivalent
        val ours = Sessionize.sessionStats(ev, "user_id", "ts_us", "event_id", gapUs)
          .select("user_id", "n_sessions", "n_events")
          .as[(Long, Long, Long)].collect().toSet
        val native = ev
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
          .as[(Long, Long, Long)].collect().toSet
        ours == native
      }
    }, 10)
  }
}
