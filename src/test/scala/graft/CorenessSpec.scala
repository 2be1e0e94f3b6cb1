package graft

import graft.ops.{Coreness, KCore}
import org.scalatest.funsuite.AnyFunSuite

class CorenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // K4 (coreness 3) + a triangle tail (coreness 2) + a pendant chain
  private val edges = (
    (for (a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b)
      yield (a, b)) ++
    Seq(("d", "e"), ("e", "f"), ("f", "g"), ("g", "e"), ("g", "h"), ("h", "i"))
  ).toDF("src", "dst")

  test("converged h-index values equal k-core membership for every k") {
    val core = Coreness.hIndexRounds(edges, "src", "dst", rounds = 10)
      .as[(String, Long)].collect().toMap
    for (k <- 1 to 4) {
      val byCoreness = core.filter(_._2 >= k).keySet
      val byPeeling = KCore.kCoreFixpoint(edges, "src", "dst", k)
        .as[(String, Long)].collect().map(_._1).toSet
      assert(byCoreness == byPeeling, s"k=$k")
    }
    assert(core("a") == 3L && core("e") == 2L && core("i") == 1L)
  }

  test("values only decrease across rounds (upper-bounding partial fixpoint)") {
    var prev = Coreness.hIndexRounds(edges, "src", "dst", rounds = 1)
      .as[(String, Long)].collect().toMap
    for (r <- 2 to 5) {
      val cur = Coreness.hIndexRounds(edges, "src", "dst", rounds = r)
        .as[(String, Long)].collect().toMap
      cur.foreach { case (n, v) => assert(v <= prev(n), s"r=$r node=$n") }
      prev = cur
    }
  }

  test("local replay ≡ distributed rounds (gate forced off), partial too") {
    for (r <- 1 to 3) {
      val local = Coreness.hIndexRounds(edges, "src", "dst", r)
        .as[(String, Long)].collect().toSet
      val dist = Coreness.hIndexRounds(edges, "src", "dst", r,
          maxLocalEdges = 0L)
        .as[(String, Long)].collect().toSet
      assert(local == dist, s"rounds=$r")
    }
  }
}
