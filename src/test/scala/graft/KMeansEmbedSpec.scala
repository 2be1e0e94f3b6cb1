package graft

import graft.ops.KMeansEmbed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("two obvious groups separate; labels are seed ranks") {
    // seeds = two smallest ids (one from each group); k=2, one update
    // round moves each centroid to its group's floor-mean
    val d = df(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(1.0f, 1.0f),
      2L -> Seq(0.01f, 0.0f), 3L -> Seq(0.99f, 1.0f),
      4L -> Seq(0.0f, 0.02f), 5L -> Seq(1.0f, 0.98f))
    val a = KMeansEmbed.assignments(d, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("vec_id").as[(Long, Int, Long)].collect()
    assert(a.map(_._2).toSeq == Seq(0, 1, 0, 1, 0, 1))
    assert(a.forall(_._3 < 200L * 200L * 2)) // tight around the mean
  }

  test("argmin ties break toward the smaller cluster label") {
    // point 2 is equidistant from both seeds -> cluster 0.
    // iters=0: assignment against the raw seeds, no update pass
    val d = df(0L -> Seq(0.0f), 1L -> Seq(2.0f), 2L -> Seq(1.0f))
    val a = KMeansEmbed.assignments(d, "vec_id", "embedding", k = 2, iters = 0)
      .orderBy("vec_id").as[(Long, Int, Long)].collect()
    assert(a(2)._2 == 0 && a(2)._3 == 10000L * 10000L)
  }

  test("semDedup flags the larger id of a near-identical pair, within cluster only") {
    val d = df(
      0L -> Seq(0.0f, 1.0f), 1L -> Seq(1.0f, 0.0f),
      2L -> Seq(0.001f, 1.0f), // ~cos 1 with 0 -> dup
      3L -> Seq(0.999f, 0.001f)) // ~cos 1 with 1 -> dup
    val r = KMeansEmbed.semDedup(d, "vec_id", "embedding", k = 2, iters = 1,
        threshold = 0.95)
      .orderBy("vec_id").as[(Long, Int, Boolean)].collect()
    assert(r.map(_._3).toSeq == Seq(false, false, true, true))
    // a dup shares its cluster with some smaller non-dup id
    val byCluster = r.groupBy(_._2)
    r.filter(_._3).foreach { case (id, c, _) =>
      assert(byCluster(c).exists(o => o._1 < id && !o._3))
    }
  }

  test("farthest-point seeding spreads seeds where smallest-id seeding cannot") {
    // both smallest ids sit in group A; FPS must jump to group B
    val d = df(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(0.01f, 0.0f),
      2L -> Seq(1.0f, 1.0f), 3L -> Seq(0.99f, 1.0f))
    val fps = KMeansEmbed.assignments(d, "vec_id", "embedding", k = 2,
        iters = 0, farthestPoint = true)
      .orderBy("vec_id").as[(Long, Int, Long)].collect()
    assert(fps.map(_._2).toSeq == Seq(0, 0, 1, 1)) // groups separated
    // smallest-id seeding with iters=0 puts seeds 0 and 1 inside group A
    val plain = KMeansEmbed.assignments(d, "vec_id", "embedding", k = 2,
        iters = 0)
      .orderBy("vec_id").as[(Long, Int, Long)].collect()
    assert(plain.map(_._2).distinct.length == 2)
    assert(plain(2)._2 == plain(3)._2) // group B lumped onto one A seed
  }

  test("loud gates: driver-stat cap and cluster-size cap fail fast, not silently") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // k*dim beyond the driver-collect gate
    val e1 = intercept[IllegalArgumentException] {
      KMeansEmbed.assignments(emb, "vec_id", "embedding", k = 8, iters = 1,
        scale = 10000.0) // fine
      KMeansEmbed.fit(emb, "vec_id", "embedding", k = 8, iters = 1,
        maxDriverStats = 100L)
    }
    assert(e1.getMessage.contains("driver-collected centroid stats"))
    // an oversized cluster must abort the pair scoring loudly
    val e2 = intercept[org.apache.spark.SparkException] {
      KMeansEmbed.semDedup(emb, "vec_id", "embedding", k = 1, iters = 0,
        threshold = 0.9, maxClusterSize = 10).count()
    }
    assert(e2.getMessage.contains("maxClusterSize") ||
      Option(e2.getCause).exists(_.getMessage.contains("exceeds")))
  }

  test("fit is invariant to input partitioning (integer-exact merges)") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(d: org.apache.spark.sql.DataFrame) =
      KMeansEmbed.assignments(d, "vec_id", "embedding", k = 4, iters = 2)
        .orderBy("vec_id").as[(Long, Int, Long)].collect().toSeq
    // partial sums are exact integers, so any partitioning/summation
    // order must produce the same centroids, hence the same assignment
    assert(run(emb) == run(emb.repartition(13)))
  }

  test("sf0.001 embeddings: full cover, stable labels, dup rate sane") {
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val r = KMeansEmbed.semDedup(emb, "vec_id", "embedding", k = 8, iters = 2,
      threshold = 0.35)
    assert(r.count() == n) // every vector classified exactly once
    val clusters = r.select("cluster").distinct().as[Int].collect().sorted
    assert(clusters.forall(c => c >= 0 && c < 8))
    val dups = r.where(col("is_dup")).count()
    assert(dups < n) // threshold 0.35 must not collapse the corpus
  }
}
