package graft

import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of join: semantics fixtures, self-join safety, equivalence
  * with a window-based reference formulation, and physical-plan shape
  * (AsOfJoinExec present, exactly one exchange per side).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trades = Seq(
    (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 300L, "t3"),
    (2L, 150L, "t4"), (3L, 50L, "t5"))
    .toDF("k", "ts", "trade")

  private def quotes = Seq(
    (1L, 90L, 1.0), (1L, 200L, 2.0), (1L, 250L, 3.0),
    (2L, 151L, 4.0), (4L, 10L, 9.9))
    .toDF("k", "ts", "px")

  test("backward as-of: greatest right ts <= left ts, left outer") {
    val got = AsOfJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts")
      .select($"trade", $"ts_r", $"px")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      ("t1", Some(90L), Some(1.0)),   // 90 <= 100
      ("t2", Some(200L), Some(2.0)),  // equal ts matches (non-strict)
      ("t3", Some(250L), Some(3.0)),
      ("t4", None, None),             // 151 > 150: quote too new
      ("t5", None, None)))            // key 3 has no quotes
  }

  test("strictlyBefore excludes equal timestamps") {
    val got = AsOfJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts",
        strictlyBefore = true)
      .select($"trade", $"ts_r")
      .as[(String, Option[Long])].collect().toMap
    assert(got("t2") == Some(90L)) // 200 == 200 excluded, falls back to 90
  }

  test("self as-of join (same source both sides) resolves cleanly") {
    val ev = trades.withColumnRenamed("trade", "tag")
    val prior = ev.where($"ts" > 100)
    val got = AsOfJoin.asofBackward(ev, prior, Seq("k"), "ts", "ts",
        strictlyBefore = true)
      .select($"tag", $"tag_r").as[(String, Option[String])].collect().toMap
    assert(got("t3") == Some("t2")) // latest strictly-prior row of key 1
    assert(got("t1") == None)
  }

  test("nearest as-of: min |Δt|, ties to the earlier row") {
    val got = AsOfJoin.asofNearest(trades, quotes, Seq("k"), "ts", "ts")
      .select($"trade", $"ts_r", $"px")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      ("t1", Some(90L), Some(1.0)),   // |100-90|=10 < |200-100|=100
      ("t2", Some(200L), Some(2.0)),  // exact hit
      ("t3", Some(250L), Some(3.0)),  // |300-250|=50, no later quote
      ("t4", Some(151L), Some(4.0)),  // forward-only candidate
      ("t5", None, None)))
    // tie: left at 150 between quotes at 100 and 200 → earlier (100) wins
    val ties = AsOfJoin.asofNearest(
        Seq((1L, 150L)).toDF("k", "ts"),
        Seq((1L, 100L, "early"), (1L, 200L, "late")).toDF("k", "ts", "tag"),
        Seq("k"), "ts", "ts")
      .select($"tag").as[String].collect().toSeq
    assert(ties == Seq("early"))
  }

  test("nearest as-of respects tolerance on the chosen side") {
    val got = AsOfJoin.asofNearest(trades, quotes, Seq("k"), "ts", "ts",
        tolerance = 5L)
      .select($"trade", $"ts_r")
      .as[(String, Option[Long])].collect().toMap
    assert(got("t1") == None)        // nearest is 10 away > 5
    assert(got("t2") == Some(200L))  // exact
    assert(got("t4") == Some(151L))  // 1 away
    // tolerance kills the nearer side but the other side qualifies
    val mixed = AsOfJoin.asofNearest(
        Seq((1L, 100L)).toDF("k", "ts"),
        Seq((1L, 94L, "b"), (1L, 104L, "f")).toDF("k", "ts", "tag"),
        Seq("k"), "ts", "ts", tolerance = 4L)
      .select($"tag").as[Option[String]].collect().toSeq
    assert(mixed == Seq(Some("f"))) // backward at 6 > tol, forward at 4 ok
  }

  test("forward as-of: smallest right ts >= left ts, not consumed on match") {
    val got = AsOfJoin.asofForward(trades, quotes, Seq("k"), "ts", "ts")
      .select($"trade", $"ts_r", $"px")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      ("t1", Some(200L), Some(2.0)),  // next quote at/after 100; ALSO t2's
      ("t2", Some(200L), Some(2.0)),  // equal ts matches (non-strict)
      ("t3", None, None),             // nothing at/after 300
      ("t4", Some(151L), Some(4.0)),
      ("t5", None, None)))            // key 3 has no quotes
  }

  test("forward strict skips the time-equal row") {
    val got = AsOfJoin.asofForward(trades, quotes, Seq("k"), "ts", "ts",
        strict = true)
      .select($"trade", $"ts_r")
      .as[(String, Option[Long])].collect().toMap
    assert(got("t2") == Some(250L)) // 200 == 200 excluded, next is 250
    assert(got("t1") == Some(200L)) // 200 > 100 still fine
  }

  test("forward tolerance nulls out matches further than the bound") {
    val got = AsOfJoin.asofForward(trades, quotes, Seq("k"), "ts", "ts",
        tolerance = 50L)
      .select($"trade", $"ts_r")
      .as[(String, Option[Long])].collect().toMap
    assert(got("t1") == None)        // nearest is 200, 100 away > 50
    assert(got("t2") == Some(200L))  // 0 away
    assert(got("t4") == Some(151L))  // 1 away
  }

  test("backward tolerance nulls out matches further than the bound") {
    val got = AsOfJoin.asof(trades, quotes, Seq("k"), "ts", "ts",
        direction = "backward", tolerance = 20L)
      .select($"trade", $"ts_r")
      .as[(String, Option[Long])].collect().toMap
    assert(got("t1") == Some(90L))   // 10 away <= 20
    assert(got("t2") == Some(200L))  // 0 away
    assert(got("t3") == None)        // best is 250, 50 away > 20
  }

  test("null keys and times never match (SQL null semantics)") {
    val l = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "b"),
        (Some(1L), None, "c"))
      .toDF("k", "ts", "tag")
    val r = Seq((Some(1L), Some(50L), 1.0), (None, Some(40L), 2.0),
        (Some(1L), None, 3.0))
      .toDF("k", "ts", "px")
    val got = AsOfJoin.asofBackward(l, r, Seq("k"), "ts", "ts")
      .select($"tag", $"px").as[(String, Option[Double])].collect().toMap
    assert(got("a") == Some(1.0)) // real match unaffected
    assert(got("b") == None)      // null left key matches nothing
    assert(got("c") == None)      // null left time matches nothing
  }

  test("matches window-based reference formulation on random data") {
    val rnd = new scala.util.Random(99)
    val l = Seq.fill(400)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "ts", "lid")
    val r = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "rts").groupBy("k", "rts").agg(count(lit(1)).as("m"))
    val got = AsOfJoin.asofBackward(l, r, Seq("k"), "ts", "rts")
      .select($"lid", $"rts").as[(Long, Option[Long])].collect().toMap
    // reference: max rts <= ts via a plain join + groupBy
    val ref = l.join(r, l("k") === r("k") && $"rts" <= $"ts", "left")
      .groupBy($"lid").agg(max($"rts").as("rts"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == ref)
    assert(got.values.exists(_.isDefined))

    // forward: min rts >= ts
    val gotF = AsOfJoin.asofForward(l, r, Seq("k"), "ts", "rts")
      .select($"lid", $"rts").as[(Long, Option[Long])].collect().toMap
    val refF = l.join(r, l("k") === r("k") && $"rts" >= $"ts", "left")
      .groupBy($"lid").agg(min($"rts").as("rts"))
      .as[(Long, Option[Long])].collect().toMap
    assert(gotF == refF)

    // nearest: argmin |rts - ts|, ties to the smaller rts (backward)
    val gotN = AsOfJoin.asofNearest(l, r, Seq("k"), "ts", "rts")
      .select($"lid", $"rts").as[(Long, Option[Long])].collect().toMap
    val refN = l.join(r, Seq("k"), "left")
      .groupBy($"lid", $"ts")
      .agg(min(struct(abs($"rts" - $"ts").as("d"), $"rts")).as("best"))
      .select($"lid", $"best.rts".as("rts"))
      .as[(Long, Option[Long])].collect().toMap
    assert(gotN == refN)
  }

  test("plan shape: AsOfJoinExec node, one exchange per side, merge not blow-up") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val df = AsOfJoin.asofBackward(trades, quotes, Seq("k"), "ts", "ts")
    df.collect() // finalize AQE on THIS QueryExecution (memory: no df.count)
    // flatten through AQE wrappers: QueryStageExec children live in .plan
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[AsOfJoinExec]) == 1, nodes.mkString("\n"))
    assert(nodes.count(_.isInstanceOf[Exchange]) == 2,
      s"expected one exchange per side:\n${nodes.mkString("\n")}")
  }
}
