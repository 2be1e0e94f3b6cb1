package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bootstrap, Sparsify}

class BootstrapSparsifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bootstrap CI brackets the mean and is replayable") {
    val rows = (0L until 400L).map(i => ("g", i, 1000L + (i % 21)))
    val df = rows.toDF("g", "id", "v")
    val out = Bootstrap.meanCi(df, "g", "id", "v", bReps = 20,
      loPermille = 50, hiPermille = 950).collect().head
    val out2 = Bootstrap.meanCi(df, "g", "id", "v", bReps = 20,
      loPermille = 50, hiPermille = 950).collect().head
    assert(out.toSeq == out2.toSeq) // deterministic md5 membership
    assert(out.getLong(1) == 400L)
    assert(out.getLong(3) == 20L) // all replicas non-empty
    val (mean, lo, hi) = (out.getLong(2), out.getLong(4), out.getLong(5))
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket $mean")
    // uniform 1000..1020: replica means stay within the value range
    assert(lo >= 1000L && hi <= 1020L)
  }

  test("sparsify: k=1 on a weighted star keeps only each leaf's hub edge") {
    // hub h with 3 leaves (heavy) + a light leaf-leaf edge
    val edges = Seq(("h", "l1", 10L), ("h", "l2", 10L), ("h", "l3", 10L),
      ("l1", "l2", 1L)).toDF("src", "dst", "w")
    val r = Sparsify.sparsifyDrift(edges, "src", "dst", "w", kPerNode = 1)
      .collect().head
    assert(r.getLong(0) == 4L) // m_full
    assert(r.getLong(1) == 1L && r.getLong(2) == 4L) // one component of 4
    // each leaf keeps its hub edge; the hub keeps ONE of its ties; the
    // light l1-l2 edge ranks below l1/l2's hub edges -> pruned
    assert(r.getLong(3) == 3L)
    assert(r.getLong(4) == 1L && r.getLong(5) == 4L) // still connected
  }

  test("sparsify OR-symmetrization: an edge survives via either endpoint") {
    // a-b heavy for a (its only edge) but b prefers c; OR keeps a-b
    val edges = Seq(("a", "b", 1L), ("b", "c", 5L)).toDF("src", "dst", "w")
    val sp = Sparsify.topWeightEdges(edges, "src", "dst", "w", kPerNode = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sp == Set(("a", "b"), ("b", "c")))
  }
}
