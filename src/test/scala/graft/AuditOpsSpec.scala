package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cms errors are never negative and cover every distinct item") {
    val rnd = new scala.util.Random(31)
    // zipf-ish: heavy head so collisions actually happen in a tiny grid
    val items = Seq.fill(3000)(s"k${math.min(rnd.nextInt(200),
      rnd.nextInt(200))}")
    val df = items.toDF("item")
    val hist = graft.ops.FrequencySketch.errorAudit(df, "item",
        depth = 2, width = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.forall(_._1 >= 0L), "CMS must never undercount")
    assert(hist.map(_._2).sum == items.distinct.size.toLong)
    // a 2x16 grid under 200 keys MUST collide somewhere
    assert(hist.exists(_._1 > 0L), "audit should surface real overcounts")
  }

  test("cms audit reports all-zero errors when the grid dwarfs the keys") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("item")
    val hist = graft.ops.FrequencySketch.errorAudit(df, "item",
        depth = 4, width = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.toSeq == Seq((0L, 3L)))
  }

  test("zorder pruning audit: slab probes prune, stats reconcile") {
    val rnd = new scala.util.Random(37)
    val rows = Seq.fill(4000)(
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = rows.toDF("a", "b")
    val out = graft.ops.ZOrderLayout.pruningAudit(df, col("a"), col("b"),
        Seq((0L, 4095L, 0L, 65535L), (0L, 65535L, 0L, 65535L)))
      .orderBy("probe_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val slab = out(0); val all = out(1)
    // slab a<4096 = top-4-bits(a)=0: only buckets whose interleaved top
    // byte has zero a-bits survive -> at least 15/16 of buckets pruned
    assert(slab._7 >= 900L, s"slab should prune >90%: $slab")
    // pruning is sound: every matching row is inside a scanned bucket
    assert(slab._5 >= slab._6)
    assert(slab._6 == rows.count(_._1 <= 4095L).toLong)
    // the match-everything probe prunes nothing and scans everything
    assert(all._3 == 0L && all._5 == all._4 && all._4 == 4000L)
  }

  test("minhash audit: identical docs estimate 1000, disjoint docs 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated corpus here"))
      .toDF("doc_id", "text")
    val rows = graft.ops.Dedup.minHashEstimateAudit(docs, "doc_id", "text")
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // (1,2): identical -> est 1000, exact 1000, err 0
    assert(rows(0) == (1L, 2L, 1000L, 1000L, 0L))
    // (1,3) and (2,3): disjoint shingles -> est 0, exact 0
    assert(rows(1)._3 == 0L && rows(1)._4 == 0L)
    assert(rows(2)._3 == 0L && rows(2)._4 == 0L)
  }

  test("minhash audit covers every pair and errors stay in [-1000, 1000]") {
    val rnd = new scala.util.Random(61)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val docs = (0 until 12).map(i =>
      (i.toLong, Seq.fill(10)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.ops.Dedup.minHashEstimateAudit(docs, "doc_id", "text")
      .collect()
    assert(rows.length == 12 * 11 / 2)
    rows.foreach { r =>
      val err = r.getLong(5)
      assert(err >= -1000L && err <= 1000L)
      assert(r.getLong(3) == r.getLong(2) * 1000L / 64L)
    }
  }

  test("kmv audit is exact below k and within 3/sqrt(k) above it") {
    import org.apache.spark.sql.functions._
    def hashed(rows: Seq[(String, String)]) = rows.toDF("key", "tok")
      .select(col("key"), graft.functions.functions.hex_to_long(
        substring(md5(col("tok")), 1, 15)).as("h"))
    // group 'small': 30 distinct < k=64 -> est == exact, err 0
    val small = (0 until 30).map(i => ("small", s"w$i"))
    // group 'big': 5000 distinct > k -> estimator kicks in
    val big = (0 until 5000).map(i => ("big", s"tok$i"))
    val out = graft.ops.SetSketch.distinctErrorAudit(
        hashed(small ++ big), "key", "h", k = 64)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bigRow = out(0); val smallRow = out(1)
    assert(smallRow == (("small", 30L, 30L, 0L)))
    assert(bigRow._2 == 5000L)
    // KMV stderr ~ n/sqrt(k-2): allow 3 sigma ~ 381 ppm*1000
    assert(math.abs(bigRow._4) < 400000L,
      s"estimate off by more than ~3 sigma: $bigRow")
  }

  test("zorder pruning audit never prunes a bucket containing matches") {
    // adversarial: clustered keys so buckets are tight rectangles
    val rows = (0 until 2000).map(i => ((i % 256).toLong * 256L,
      (i / 256).toLong * 8192L))
    val out = graft.ops.ZOrderLayout.pruningAudit(rows.toDF("a", "b"),
        col("a"), col("b"), Seq((30000L, 35000L, 0L, 20000L)))
      .collect()(0)
    val scanned = out.getLong(4); val matched = out.getLong(5)
    assert(matched == rows.count { case (a, b) =>
      a >= 30000L && a <= 35000L && b <= 20000L }.toLong)
    assert(scanned >= matched)
  }
}
