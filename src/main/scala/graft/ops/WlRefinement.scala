package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** 1-WL (Weisfeiler–Leman) color refinement — the canonical structural
  * fingerprint behind WL graph kernels and GNN expressiveness bounds:
  * start every node at a hash of its degree, then repeatedly hash
  * (own color, SORTED multiset of neighbor colors). After k rounds two
  * nodes share a color only if their radius-k neighborhoods are
  * indistinguishable — the color histogram is a graph signature, the
  * per-node colors are join keys for structural dedup ("find nodes
  * playing the same role").
  *
  * Everything is string-hash algebra chosen for oracle portability:
  * colors are md5 hex strings, the multiset is `concat_ws(",",
  * sort_array(collect_list(color)))` — byte-identical to DuckDB's
  * `string_agg(color, ',' ORDER BY color)` because md5 hex is ASCII
  * and both engines sort strings by UTF8 bytes.
  *
  * Shape per round: one edge⨝color join (both directions via the
  * symmetric list), one node-keyed sort+hash aggregate — scalable
  * shuffle algebra, no windows, state one row per node, locally
  * checkpointed. Fixed `rounds` is the contract (stable colorings are
  * idempotent under further rounds only up to relabeling, so the
  * round count is part of the fingerprint, not a convergence knob).
  *
  * Output: (node, wl_color, color_size) — final color and the size of
  * the node's color class.
  */
object WlRefinement {

  def wlColors(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 10,
      s"rounds must be in [1, 10], got $rounds")
    val canonical = edges.select(
        least(col(srcCol).cast("string"), col(dstCol).cast("string")).as("x"),
        greatest(col(srcCol).cast("string"), col(dstCol).cast("string"))
          .as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
    val sym = canonical.select(col("x").as("v"), col("y").as("n"))
      .union(canonical.select(col("y").as("v"), col("x").as("n")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var colors = sym.groupBy("v")
      .agg(md5(count(lit(1)).cast("string")).as("c"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      colors = sym
        .join(colors.select(col("v").as("n"), col("c").as("nc")), Seq("n"))
        .groupBy("v")
        .agg(concat_ws(",", sort_array(collect_list(col("nc")))).as("ms"))
        .join(colors, Seq("v"))
        .select(col("v"),
          md5(concat(col("c"), lit("#"), col("ms"))).as("c"))
        .localCheckpoint(eager = false)
    }
    val sizes = colors.groupBy("c").agg(count(lit(1)).as("color_size"))
    colors.join(sizes, Seq("c"))
      .select(col("v").as("node"), col("c").as("wl_color"),
        col("color_size"))
      .orderBy("node")
  }
}
