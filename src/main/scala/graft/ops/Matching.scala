package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed greedy maximal matching — pair up nodes so no two chosen
  * edges share an endpoint and no unchosen edge could still be added.
  * The act-on-it step after pair mining ("merge each near-duplicate pair
  * once, never chain merges"), and the classic symmetry-breaking
  * primitive (its matched endpoints are a 2-approximate vertex cover).
  *
  * Local-minimum rounds (Israeli–Itai style): every edge gets a
  * DETERMINISTIC priority — the md5 integer of `salt‖x‖'|'‖y`, the repo's
  * identity-hash contract, or a caller-supplied column — and an edge is
  * matched in a round iff it is the (priority, x, y)-minimal incident
  * edge of BOTH its endpoints. Matched endpoints and their incident
  * edges drop out; repeat. Expected O(log n) rounds to maximality;
  * `rounds` is FIXED (the k-core/LPA partial-fixpoint parity trick), so
  * both engines compute the identical truncation and the driver query is
  * hash-exact. A round is two shuffles (per-vertex local-min window over
  * the incident-edge list, then the both-endpoints count) plus two
  * anti-joins; per-round results are checkpointed.
  *
  * Output: (x, y, round) — the matched pairs and the round each fell.
  */
object Matching {

  def greedyMatching(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 6, salt: String = "",
      priorityCol: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds must be in [1, 32], got $rounds")
    val base = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
    val withP = priorityCol match {
      case Some(pc) => edges.select(
          least(col(srcCol), col(dstCol)).as("x"),
          greatest(col(srcCol), col(dstCol)).as("y"),
          col(pc).cast("long").as("p"))
        .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
        .groupBy("x", "y").agg(min(col("p")).as("p"))
      case None => base.distinct()
        .withColumn("p", graft.functions.functions.hex_to_long(
          substring(md5(concat(lit(salt), col("x"), lit("|"), col("y"))), 1, 15)))
    }
    var e = withP.localCheckpoint(true)
    var matchedParts = List.empty[DataFrame]
    var r = 1
    while (r <= rounds && !e.isEmpty) {
      val adj = e.select(col("x").as("v"), col("x"), col("y"), col("p"))
        .union(e.select(col("y").as("v"), col("x"), col("y"), col("p")))
      val byV = Window.partitionBy(col("v"))
        .orderBy(col("p"), col("x"), col("y"))
      val localMin = adj.withColumn("__rn", row_number().over(byV))
        .where(col("__rn") === 1)
      val matched = localMin.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("__c"))
        .where(col("__c") === 2)
        .select(col("x"), col("y"), lit(r.toLong).as("round"))
        .localCheckpoint(true)
      val mv = matched.select(col("x").as("v"))
        .union(matched.select(col("y").as("v"))).distinct()
      matchedParts ::= matched
      e = e.join(mv.withColumnRenamed("v", "x"), Seq("x"), "left_anti")
        .join(mv.withColumnRenamed("v", "y"), Seq("y"), "left_anti")
        .select(col("x"), col("y"), col("p"))
        .localCheckpoint(true)
      r += 1
    }
    matchedParts.reduceOption(_ unionByName _)
      .getOrElse(e.sparkSession.emptyDataFrame
        .withColumn("x", lit("")).withColumn("y", lit(""))
        .withColumn("round", lit(0L)).limit(0))
  }
}
