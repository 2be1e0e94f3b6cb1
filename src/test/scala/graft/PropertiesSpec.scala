package graft

import graft.ops.{ConnectedComponents, PageRank, ShortestPaths}
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties promised in SURVEY.md §5: structural invariants
  * that hold for any edge list, complementing the fixed goldens.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, minSuccessful: Int): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withWorkers(1)
    val res = org.scalacheck.Test.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val edgeListGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(1, 12) // node universe size
    m <- Gen.choose(1, 20) // edge count
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (s"v$a", s"v$b"))
  } yield edges.filter { case (a, b) => a != b }

  test("components: canonical labels invariant under edge permutation & reversal") {
    check(Prop.forAll(edgeListGen) { edges =>
      edges.isEmpty || {
        val df1 = edges.toDF("src", "dst")
        val shuffled = scala.util.Random.shuffle(edges.map { case (a, b) => (b, a) })
        val df2 = shuffled.toDF("src", "dst")
        val c1 = ConnectedComponents.components(df1).as[(String, String)].collect().toSet
        val c2 = ConnectedComponents.components(df2).as[(String, String)].collect().toSet
        c1 == c2
      }
    }, 15)
  }

  test("components: aggregate variant always equals GraphX variant") {
    check(Prop.forAll(edgeListGen) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("src", "dst")
        val a = ConnectedComponents.componentsViaAggregate(df)
          .as[(String, String)].collect().toSet
        val g = ConnectedComponents.components(df)
          .as[(String, String)].collect().toSet
        a == g
      }
    }, 15)
  }

  test("pagerank: scores positive, sum <= 1 + eps") {
    check(Prop.forAll(edgeListGen) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("from", "to")
        val scores = PageRank.scores(graft.core.Ingest.edges(df, "from", "to"),
          maxIter = 30).as[(String, Double)].collect()
        scores.forall(_._2 > 0) && scores.map(_._2).sum <= 1.0 + 1e-9
      }
    }, 10)
  }

  test("undirected shortest paths: emitted from < to, distances non-negative") {
    val weightedGen = edgeListGen.flatMap { edges =>
      Gen.listOfN(edges.length, Gen.choose(1, 999))
        .map(ws => edges.zip(ws).map { case ((a, b), w) => (a, b, w / 100.0) })
    }
    check(Prop.forAll(weightedGen) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("from", "to", "weight")
        val rows = ShortestPaths.calculateShortestPath(df, "from", "to", "weight")
          .as[(String, String, Double)].collect()
        rows.forall { case (f, t, d) => f < t && d >= 0 }
      }
    }, 10)
  }
}
