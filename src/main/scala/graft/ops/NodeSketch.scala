package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Neighborhood-MinHash node sketches — float-free structural node
  * embeddings (the NodeSketch idea re-based on the repo's md5 lanes):
  * lane i of node v is the MINIMUM of hash_i(u) over every u in v's
  * radius-r ball, built by r rounds of "take the min of your neighbors'
  * lanes". Two nodes' matching-lane fraction is then the classic
  * MinHash estimator of the JACCARD OVERLAP OF THEIR BALLS — positional
  * similarity ("these two users sit in interchangeable places in the
  * graph") without a single floating-point number, so the whole
  * pipeline joins the hash-exact oracle surface.
  *
  * [[sketches]]: (node, lane, h) — k·V rows, built by r (edge join +
  * min-aggregate) rounds, pure shuffle algebra. [[similarPairs]] mines
  * candidate pairs THROUGH the lanes (nodes sharing a lane minimum
  * land in the same (lane, h) bucket — LSH for free, never all-pairs),
  * counts exact matching lanes per pair, and keeps pairs with at least
  * `minMatch` of `k` lanes equal; sim_permille = 1000·match/k.
  *
  * Scale: bucket join volume is Σ|bucket|² over (lane, h) buckets —
  * hub lanes can get hot (a popular min spreads to its whole ball);
  * [[Dedup.capHotBuckets]]-style caps apply upstream if a corpus graph
  * needs them. Rounds are O(r) shuffles like every frontier op here.
  */
object NodeSketch {

  def sketches(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int, salt: String = "ns"): DataFrame = {
    require(k >= 1 && k <= 32, s"k must be in [1, 32], got $k")
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1, 8], got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val fwd = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val sym = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // probed every round
    val nodes = sym.select(col("a").as("node")).distinct()
    val lanes = (0 until k).toDF("lane")
    var state = nodes.crossJoin(broadcast(lanes))
      .withColumn("h", graft.functions.functions.hex_to_long(
        substring(md5(concat(lit(salt), col("lane").cast("string"),
          lit(":"), col("node"))), 1, 15)))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      state = state
        .join(sym, col("node") === col("b"))
        .select(col("a").as("node"), col("lane"), col("h"))
        .union(state)
        .groupBy(col("node"), col("lane")).agg(min(col("h")).as("h"))
        .localCheckpoint(true)
    }
    state.select("node", "lane", "h")
  }

  def similarPairs(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int, minMatch: Int,
      salt: String = "ns"): DataFrame = {
    require(minMatch >= 1 && minMatch <= k,
      s"minMatch must be in [1, $k], got $minMatch")
    val sig = sketches(edges, srcCol, dstCol, k, rounds, salt)
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the bucket join
    sig.as("x")
      .join(sig.as("y"),
        col("x.lane") === col("y.lane") && col("x.h") === col("y.h") &&
          col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("node_a"), col("y.node").as("node_b"))
      .agg(count(lit(1)).as("n_match"))
      .where(col("n_match") >= minMatch)
      .withColumn("sim_permille", expr(s"(1000 * n_match) div $k"))
  }
}
