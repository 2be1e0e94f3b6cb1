package graft

import graft.ops.{ShardLayout, VocabCoverage}
import org.scalatest.funsuite.AnyFunSuite

class VocabShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cov(rows: Seq[(Long, String)], v: Int)
      : Map[Long, (Long, Long, Long)] =
    VocabCoverage.topVCoverage(rows.toDF("doc_id", "text"),
        "doc_id", "text", v)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("top-V selection is (count desc, token asc); coverage counts occurrences") {
    // counts: b=4, a=3, c=2, d=1 -> V=2 keeps {b, a}
    val got = cov(Seq(
      (1L, "a b b c"),
      (2L, "a a b b c d")), v = 2)
    assert(got(1L) == ((4L, 3L, 750000L)))
    assert(got(2L) == ((6L, 4L, 666666L)))
  }

  test("count ties break by token ascending — deterministic vocab") {
    // x and y both count 2; V=1 must keep 'x' (asc), never 'y'
    val got = cov(Seq((1L, "x y"), (2L, "y x")), v = 1)
    assert(got(1L) == ((2L, 1L, 500000L)))
    assert(got(2L) == ((2L, 1L, 500000L)))
  }

  test("V >= vocabulary means full coverage everywhere") {
    val got = cov(Seq((1L, "p q r"), (2L, "r r")), v = 100)
    assert(got(1L) == ((3L, 3L, 1000000L)))
    assert(got(2L) == ((2L, 2L, 1000000L)))
  }

  test("shard layout: mass shares sum to ~1e6 and groups are per-shard distinct") {
    val rows = (1L to 400L).map(i => (i, (i % 50) + 10L, s"s${i % 7}"))
    val got = ShardLayout.layoutAudit(rows.toDF("doc_id", "n_chars", "source"),
        "doc_id", "n_chars", "source", numShards = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    assert(got.map(_._2).sum == 400L)
    val shareSum = got.map(_._4).sum
    // floor-div shares undershoot by < numShards ppm
    assert(shareSum <= 1000000L && shareSum > 1000000L - 8L)
    assert(got.forall(r => r._5 >= 1L && r._5 <= 7L))
    // assignment is a pure function of the id — stable across runs
    val again = ShardLayout.layoutAudit(
        rows.reverse.toDF("doc_id", "n_chars", "source"),
        "doc_id", "n_chars", "source", numShards = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("null weight raises loudly (corruption, not zero mass)") {
    val df = Seq((Some(1L), Option.empty[Long], Some("s")),
        (Some(2L), Some(5L), Some("s")))
      .toDF("doc_id", "n_chars", "source")
    val boom = intercept[Exception] {
      ShardLayout.layoutAudit(df, "doc_id", "n_chars", "source",
        numShards = 4).collect()
    }
    assert(boom.getMessage.contains("null weight"))
  }

  test("empty-mass layout raises loudly") {
    val boom = intercept[Exception] {
      ShardLayout.layoutAudit(Seq((1L, 0L, "s")).toDF("doc_id", "n_chars", "source"),
        "doc_id", "n_chars", "source", numShards = 4)
        .collect()
    }
    assert(boom.getMessage.contains("non-positive total mass"))
  }
}
