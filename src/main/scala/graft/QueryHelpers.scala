package graft

import graft.ops.{AssociationRules, Betweenness, ConnectedComponents, Dedup, KMeansEmbed, Multimodal, PageRank, Sessionize, ShortestPaths, Similarity, TextStats, Tokenizer}
import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared oracle-SQL CTE builders and fixture constants for the split
  * query registries (was: private members of SparkEntry). */
private[graft] object QueryHelpers {

  /** Disjoint-union of registry maps: REQUIRES no duplicate keys — a
    * repeated query name across registries would silently shadow an
    * entry in a plain ++ (the r9 Map-literal pitfall, caught then only
    * by a gate-count drop). */
  def merged[A](parts: Seq[Map[String, A]], what: String): Map[String, A] = {
    val total = parts.map(_.size).sum
    val m = parts.reduce(_ ++ _)
    require(m.size == total, {
      val dups = parts.flatMap(_.keys).groupBy(identity)
        .collect { case (k, vs) if vs.size > 1 => k }
      s"duplicate $what keys across registries: " + dups.mkString(", ")
    })
    m
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val ngramJaccardOracleSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      |       FROM toks, UNNEST(range(1, greatest(len(w)-1, 2))) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b, CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(n_inter AS DOUBLE)/(sa.n_sh + sb.n_sh - n_inter) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin


  /** Shared unrolled-CTE prefix of the q_kmeans / q_semdedup oracles:
    * ×10000 floor-quantized vectors, smallest-id seeding, `iters`
    * assign+update Lloyd rounds, final assignment `a_f`. Mirrors
    * [[graft.ops.KMeansEmbed.fit]] step for step — integer squared
    * distances, (dist, cluster) argmin ties, floorDiv centroid updates
    * via the pmod identity (the numerator is exactly divisible, so
    * DuckDB's integer `//` equals Math.floorDiv). */
  val kmeansDistSql =
    "(SELECT SUM((q.v[i]-c.v[i])*(q.v[i]-c.v[i])) " +
      "FROM UNNEST(range(1, len(q.v)+1)) AS t(i))"

  def kmeansAssignCte(name: String, cPrev: String) =
    s"""$name AS (SELECT vec_id, cluster, dist FROM (
       |  SELECT q.vec_id, c.cluster, $kmeansDistSql AS dist,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY $kmeansDistSql ASC, c.cluster ASC) AS rk
       |  FROM q CROSS JOIN $cPrev c) WHERE rk = 1)""".stripMargin

  def kmeansUpdateCte(name: String, a: String) =
    s"""$name AS (SELECT cluster, list(comp ORDER BY pos) AS v FROM (
       |  SELECT $a.cluster, t.i AS pos,
       |    (SUM(q.v[t.i]) - (((SUM(q.v[t.i]) % COUNT(*)) + COUNT(*)) % COUNT(*)))
       |      // COUNT(*) AS comp
       |  FROM $a JOIN q USING (vec_id), UNNEST(range(1, len(q.v)+1)) AS t(i)
       |  GROUP BY $a.cluster, t.i) GROUP BY cluster)""".stripMargin

  val kmeansQCte =
    """q AS (SELECT vec_id, list_transform(embedding,
      |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE)) AS BIGINT)) AS v
      |  FROM embeddings)""".stripMargin

  def kmeansRoundsSql(iters: Int): String =
    ((1 to iters).map { i =>
      kmeansAssignCte(s"a$i", s"c${i - 1}") + ",\n" +
        kmeansUpdateCte(s"c$i", s"a$i")
    } :+ kmeansAssignCte("a_f", s"c$iters")).mkString(",\n")

  def kmeansCtes(iters: Int, k: Int = 8): String =
    s"""WITH $kmeansQCte,
       |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, v
       |  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT $k)),
       |${kmeansRoundsSql(iters)}""".stripMargin

  /** FPS-seeded variant: c0 built by k-1 farthest-point selection CTEs
    * (argmax of min squared distance to the chosen set, ties -> min id),
    * mirroring [[graft.ops.KMeansEmbed]]'s `farthestPoint = true`. */
  def kmeansFpsCtes(iters: Int, k: Int): String = {
    val sel = (2 to k).map { j =>
      s"""m${j - 1} AS (SELECT q.vec_id, MIN($kmeansDistSql) AS md
         |  FROM q CROSS JOIN ch${j - 1} c GROUP BY q.vec_id),
         |s$j AS (SELECT ${j - 1} AS cluster, v FROM q
         |  WHERE vec_id = (SELECT vec_id FROM m${j - 1}
         |                  ORDER BY md DESC, vec_id ASC LIMIT 1)),
         |ch$j AS (SELECT * FROM ch${j - 1} UNION ALL SELECT * FROM s$j)""".stripMargin
    }.mkString(",\n")
    s"""WITH $kmeansQCte,
       |ch1 AS (SELECT 0 AS cluster, v
       |  FROM (SELECT v FROM q ORDER BY vec_id LIMIT 1)),
       |$sel,
       |c0 AS (SELECT CAST(cluster AS INT) AS cluster, v FROM ch$k),
       |${kmeansRoundsSql(iters)}""".stripMargin
  }

  /** Per-column profiling oracle over `orders`: one UNION ALL block per
    * column mirroring Profiler.profile — null counts, string min/max, and
    * the HLL register dot-product digest (same md5-lane + trailing-zero
    * rho SQL as q_hll_distinct, p=6; empty registers contribute 0 so
    * summing only materialized registers equals the full-array sum). */
  def profileOracle(cols: Seq[String]): String = {
    val blocks = cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |       COUNT(*) AS n_rows,
         |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |       MIN(CAST($c AS VARCHAR)) AS min_str,
         |       MAX(CAST($c AS VARCHAR)) AS max_str,
         |       (WITH h AS (SELECT ('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT AS h
         |                   FROM orders WHERE $c IS NOT NULL),
         |        r AS (SELECT CAST(h % 64 AS INT) AS idx,
         |                     CASE WHEN h >> 6 = 0 THEN 55
         |                          ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
         |              FROM h),
         |        regs AS (SELECT idx, MAX(rho) AS reg FROM r GROUP BY idx)
         |        SELECT CAST(COALESCE(SUM(reg * (idx + 1)), 0) AS BIGINT) FROM regs)
         |         AS distinct_digest
         |FROM orders""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Unrolled k-core peeling oracle over the same co-order part graph as
    * q_triangles: one (degree, keep, edges) CTE triple per round mirrors
    * KCore.kCore's synchronized peel exactly — both engines compute the
    * identical `iters`-round partial fixpoint (fixed rounds, the same
    * parity trick as [[pagerankFpOracle]]). */
  def kcoreOracle(k: Int, iters: Int): String = {
    // MATERIALIZED is load-bearing: each round references the previous
    // round's edge set three times, so DuckDB's default CTE inlining would
    // re-expand round 8 into ~3^8 copies of the lineitem scan (observed as
    // fd exhaustion). Materialization changes execution only, not values.
    val head =
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""d$i AS MATERIALIZED (SELECT node, COUNT(*) AS deg
         |        FROM (SELECT x AS node FROM e${i - 1}
         |              UNION ALL SELECT y FROM e${i - 1})
         |        GROUP BY node),
         |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
         |e$i AS MATERIALIZED (SELECT e.x, e.y FROM e${i - 1} e
         |        JOIN k$i kx ON e.x = kx.node
         |        JOIN k$i ky ON e.y = ky.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM (SELECT x AS node FROM e$iters UNION ALL SELECT y FROM e$iters)
       |GROUP BY node ORDER BY node""".stripMargin
  }

  /** Unrolled synchronous label-propagation oracle over the same co-order
    * part graph as kcoreOracle: per round, neighbor-label counts then the
    * (count DESC, label ASC) winner per node — exactly
    * ops.Communities.labelPropagation's min-struct aggregate. MATERIALIZED
    * per round for the usual CTE-inlining reason.
    */
  /** The LPA CTE chain (co-order graph, `rounds` synchronous updates) as a
    * reusable body — q_communities reads the final labels, q_modularity
    * appends the partition-quality tail over the same l{rounds} table. */
  def lpaCtes(rounds: Int): String = {
    val head =
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
        |       UNION ALL SELECT y AS a, x AS b FROM e0),
        |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM se)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT s.a, l.lab, COUNT(*) AS c
         |        FROM se s JOIN l${i - 1} l ON l.node = s.b
         |        GROUP BY s.a, l.lab),
         |l$i AS MATERIALIZED (SELECT a AS node, lab FROM (
         |        SELECT a, lab,
         |               ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
         |        FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  def lpaOracle(rounds: Int): String =
    s"""${lpaCtes(rounds)}
       |SELECT node, lab AS community FROM l$rounds ORDER BY node""".stripMargin

  /** Unrolled h-index coreness oracle over the co-order graph: c0 =
    * degree, then `rounds` rounds of c(v) = h-index of neighbor values,
    * h-index in SQL as MAX(LEAST(rank-desc, value)) — tie order in the
    * ROW_NUMBER is irrelevant (the multiset fixes the h-index). Mirrors
    * ops.Coreness.hIndexRounds round for round. */
  def corenessOracle(rounds: Int): String = {
    val head =
      """WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
        |               FROM lineitem WHERE l_quantity <= 15),
        |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
        |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
        |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
        |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
        |       UNION ALL SELECT y AS a, x AS b FROM e0),
        |c0 AS MATERIALIZED (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core
        |       FROM se GROUP BY a)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""nv$i AS (SELECT s.a AS node, c.core AS nc
         |        FROM se s JOIN c${i - 1} c ON c.node = s.b),
         |rk$i AS (SELECT node, nc,
         |          ROW_NUMBER() OVER (PARTITION BY node ORDER BY nc DESC) AS rn
         |        FROM nv$i),
         |c$i AS MATERIALIZED (SELECT node, CAST(MAX(LEAST(rn, nc)) AS BIGINT) AS core
         |        FROM rk$i GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps\nSELECT node, core FROM c$rounds ORDER BY node"
  }

  /** Unrolled multi-round Louvain oracle: LPA-4 init (ml0 = l4), then
    * `moveRounds` copies of the q_louvain_move CTE block chained
    * ml0 → ml1 → … — each round's dcc/evc/cand/score tables read the
    * PREVIOUS round's labels; graph-static tables (adjv, m, degv) are
    * shared. Mirrors ops.Communities.louvain round for round. */
  def louvainCtes(moveRounds: Int): String = {
    val head =
      s"""${lpaCtes(4)},
         |adjv AS MATERIALIZED (SELECT x AS v, y AS n FROM e0
         |        UNION ALL SELECT y AS v, x AS n FROM e0),
         |mm AS (SELECT COUNT(*) AS m FROM e0),
         |degv AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM adjv GROUP BY v),
         |ml0 AS (SELECT node, lab AS community FROM l4)""".stripMargin
    val steps = (1 to moveRounds).map { i =>
      val p = s"ml${i - 1}"
      s"""dcc$i AS (SELECT community, CAST(SUM(d) AS BIGINT) AS d_c
         |        FROM degv JOIN $p ON degv.v = $p.node GROUP BY community),
         |evc$i AS (SELECT adjv.v, $p.community AS c, COUNT(*) AS e_vc
         |        FROM adjv JOIN $p ON $p.node = adjv.n GROUP BY 1, 2),
         |ownc$i AS (SELECT node AS v, community AS c, 0 AS e_vc FROM $p),
         |candc$i AS (SELECT v, c, CAST(MAX(e_vc) AS BIGINT) AS e_vc FROM (
         |            SELECT * FROM evc$i UNION ALL SELECT * FROM ownc$i)
         |          GROUP BY v, c),
         |sc$i AS (SELECT candc$i.v, candc$i.c,
         |         4 * mm.m * candc$i.e_vc
         |           - 2 * degv.d * (dcc$i.d_c -
         |               CASE WHEN candc$i.c = $p.community THEN degv.d ELSE 0 END) AS score
         |       FROM candc$i CROSS JOIN mm
         |       JOIN $p ON $p.node = candc$i.v
         |       JOIN degv ON degv.v = candc$i.v
         |       JOIN dcc$i ON dcc$i.community = candc$i.c),
         |ml$i AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |         SELECT v, c,
         |                ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |         FROM sc$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  def louvainOracle(moveRounds: Int): String =
    s"""${louvainCtes(moveRounds)}
       |SELECT node, community FROM ml$moveRounds ORDER BY node""".stripMargin

  /** Unrolled Leiden-style refinement oracle: the [[louvainCtes]] chain
    * to ml{moveRounds} (the coarse partition), then the intra-community
    * subgraph (edges whose endpoints share a coarse label), its own
    * adjacency/m/degree tables, singleton init, and `refineRounds`
    * move-round blocks of the IDENTICAL shape over the subgraph tables.
    * Mirrors ops.Communities.leidenRefine stage for stage. */
  def leidenOracle(moveRounds: Int, refineRounds: Int): String = {
    val ml = s"ml$moveRounds"
    val head =
      s"""${louvainCtes(moveRounds)},
         |intra AS MATERIALIZED (SELECT e0.x, e0.y FROM e0
         |        JOIN $ml la ON la.node = e0.x
         |        JOIN $ml lb ON lb.node = e0.y
         |        WHERE la.community = lb.community),
         |adjr AS MATERIALIZED (SELECT x AS v, y AS n FROM intra
         |        UNION ALL SELECT y AS v, x AS n FROM intra),
         |mr AS (SELECT COUNT(*) AS m FROM intra),
         |degr AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM adjr GROUP BY v),
         |rf0 AS (SELECT DISTINCT v AS node, v AS community FROM adjr)""".stripMargin
    val steps = (1 to refineRounds).map { i =>
      val p = s"rf${i - 1}"
      s"""dcr$i AS (SELECT community, CAST(SUM(d) AS BIGINT) AS d_c
         |        FROM degr JOIN $p ON degr.v = $p.node GROUP BY community),
         |evr$i AS (SELECT adjr.v, $p.community AS c, COUNT(*) AS e_vc
         |        FROM adjr JOIN $p ON $p.node = adjr.n GROUP BY 1, 2),
         |ownr$i AS (SELECT node AS v, community AS c, 0 AS e_vc FROM $p),
         |candr$i AS (SELECT v, c, CAST(MAX(e_vc) AS BIGINT) AS e_vc FROM (
         |            SELECT * FROM evr$i UNION ALL SELECT * FROM ownr$i)
         |          GROUP BY v, c),
         |scr$i AS (SELECT candr$i.v, candr$i.c,
         |         4 * mr.m * candr$i.e_vc
         |           - 2 * degr.d * (dcr$i.d_c -
         |               CASE WHEN candr$i.c = $p.community THEN degr.d ELSE 0 END) AS score
         |       FROM candr$i CROSS JOIN mr
         |       JOIN $p ON $p.node = candr$i.v
         |       JOIN degr ON degr.v = candr$i.v
         |       JOIN dcr$i ON dcr$i.community = candr$i.c),
         |rf$i AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |         SELECT v, c,
         |                ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |         FROM scr$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT $ml.node, $ml.community,
       |       COALESCE(rf$refineRounds.community, $ml.node) AS refined
       |FROM $ml LEFT JOIN rf$refineRounds ON rf$refineRounds.node = $ml.node
       |ORDER BY $ml.node""".stripMargin
  }

  /** Unrolled multi-LEVEL Louvain oracle (VERDICT r8 item 5): the
    * [[louvainOracle]] CTE chain up to ml{moveRounds}, then the
    * contraction (community-pair groupBy → weighted super-edges), ONE
    * weighted move round on the contracted graph (the q_louvain_weighted
    * CTE shape with identity init), the projection back, and the guarded
    * acceptance — both partitions' exact integer modularities
    * Q·4m² = 4m·intra − Σ d_c² on the ORIGINAL graph decide which one is
    * emitted. Mirrors ops.Communities.louvainHier stage for stage. */
  def louvainHierOracle(moveRounds: Int): String = {
    val head =
      s"""${lpaCtes(4)},
         |adjv AS MATERIALIZED (SELECT x AS v, y AS n FROM e0
         |        UNION ALL SELECT y AS v, x AS n FROM e0),
         |mm AS (SELECT COUNT(*) AS m FROM e0),
         |degv AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM adjv GROUP BY v),
         |ml0 AS (SELECT node, lab AS community FROM l4)""".stripMargin
    val steps = (1 to moveRounds).map { i =>
      val p = s"ml${i - 1}"
      s"""dcc$i AS (SELECT community, CAST(SUM(d) AS BIGINT) AS d_c
         |        FROM degv JOIN $p ON degv.v = $p.node GROUP BY community),
         |evc$i AS (SELECT adjv.v, $p.community AS c, COUNT(*) AS e_vc
         |        FROM adjv JOIN $p ON $p.node = adjv.n GROUP BY 1, 2),
         |ownc$i AS (SELECT node AS v, community AS c, 0 AS e_vc FROM $p),
         |candc$i AS (SELECT v, c, CAST(MAX(e_vc) AS BIGINT) AS e_vc FROM (
         |            SELECT * FROM evc$i UNION ALL SELECT * FROM ownc$i)
         |          GROUP BY v, c),
         |sc$i AS (SELECT candc$i.v, candc$i.c,
         |         4 * mm.m * candc$i.e_vc
         |           - 2 * degv.d * (dcc$i.d_c -
         |               CASE WHEN candc$i.c = $p.community THEN degv.d ELSE 0 END) AS score
         |       FROM candc$i CROSS JOIN mm
         |       JOIN $p ON $p.node = candc$i.v
         |       JOIN degv ON degv.v = candc$i.v
         |       JOIN dcc$i ON dcc$i.community = candc$i.c),
         |ml$i AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |         SELECT v, c,
         |                ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |         FROM sc$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val last = s"ml$moveRounds"
    val hier =
      s"""ce AS MATERIALIZED (SELECT LEAST(a.community, b.community) AS sx,
         |        GREATEST(a.community, b.community) AS sy,
         |        CAST(COUNT(*) AS BIGINT) AS w
         |      FROM e0 JOIN $last a ON a.node = e0.x
         |      JOIN $last b ON b.node = e0.y
         |      WHERE a.community <> b.community GROUP BY 1, 2),
         |sadj AS (SELECT sx AS v, sy AS n, w FROM ce
         |      UNION ALL SELECT sy AS v, sx AS n, w FROM ce),
         |sww AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM ce),
         |sstr AS (SELECT v, CAST(SUM(w) AS BIGINT) AS s FROM sadj GROUP BY v),
         |sl0 AS (SELECT DISTINCT community AS node, community FROM $last),
         |sscc AS (SELECT sl0.community, CAST(SUM(sstr.s) AS BIGINT) AS s_c
         |      FROM sstr JOIN sl0 ON sstr.v = sl0.node GROUP BY sl0.community),
         |swvc AS (SELECT sadj.v, sl0.community AS c,
         |        CAST(SUM(sadj.w) AS BIGINT) AS w_vc
         |      FROM sadj JOIN sl0 ON sl0.node = sadj.n GROUP BY 1, 2),
         |sown AS (SELECT node AS v, community AS c, 0 AS w_vc FROM sl0),
         |scand AS (SELECT v, c, CAST(MAX(w_vc) AS BIGINT) AS w_vc FROM (
         |        SELECT * FROM swvc UNION ALL SELECT * FROM sown)
         |      GROUP BY v, c),
         |sscw AS (SELECT scand.v, scand.c,
         |        4 * sww.wsum * scand.w_vc
         |          - 2 * sstr.s * (sscc.s_c -
         |              CASE WHEN scand.c = sl0.community THEN sstr.s ELSE 0 END) AS score
         |      FROM scand CROSS JOIN sww
         |      JOIN sl0 ON sl0.node = scand.v
         |      JOIN sstr ON sstr.v = scand.v
         |      JOIN sscc ON sscc.community = scand.c),
         |sml1 AS MATERIALIZED (SELECT v AS node, c AS community FROM (
         |        SELECT v, c,
         |               ROW_NUMBER() OVER (PARTITION BY v ORDER BY score DESC, c ASC) AS rn
         |        FROM sscw) WHERE rn = 1),
         |proj AS MATERIALIZED (SELECT $last.node,
         |        COALESCE(sml1.community, $last.community) AS community
         |      FROM $last LEFT JOIN sml1 ON sml1.node = $last.community),
         |qi1 AS (SELECT CAST(SUM(CASE WHEN a.community = b.community
         |                    THEN 1 ELSE 0 END) AS BIGINT) AS intra
         |      FROM e0 JOIN proj a ON a.node = e0.x
         |      JOIN proj b ON b.node = e0.y),
         |qd1 AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS sumdc2 FROM (
         |        SELECT CAST(SUM(degv.d) AS BIGINT) AS dc
         |        FROM degv JOIN proj ON proj.node = degv.v
         |        GROUP BY proj.community)),
         |qi0 AS (SELECT CAST(SUM(CASE WHEN a.community = b.community
         |                    THEN 1 ELSE 0 END) AS BIGINT) AS intra
         |      FROM e0 JOIN $last a ON a.node = e0.x
         |      JOIN $last b ON b.node = e0.y),
         |qd0 AS (SELECT CAST(SUM(dc * dc) AS BIGINT) AS sumdc2 FROM (
         |        SELECT CAST(SUM(degv.d) AS BIGINT) AS dc
         |        FROM degv JOIN $last ON $last.node = degv.v
         |        GROUP BY $last.community)),
         |sel AS (SELECT
         |        (SELECT 4 * mm.m * qi1.intra - qd1.sumdc2 FROM mm, qi1, qd1)
         |     >= (SELECT 4 * mm.m * qi0.intra - qd0.sumdc2 FROM mm, qi0, qd0)
         |        AS take1)
         |SELECT node, community FROM proj WHERE (SELECT take1 FROM sel)
         |UNION ALL
         |SELECT node, community FROM $last WHERE NOT (SELECT take1 FROM sel)
         |ORDER BY node""".stripMargin
    s"$head,\n$steps,\n$hier"
  }

  /** Unrolled seeded label-spreading oracle over the co-order graph:
    * like [[lpaCtes]] but labels start ONLY on the md5-sampled seed set
    * and seeds are clamped each round (non-seeds adopt the neighbor
    * majority, ties to the smallest label) — mirrors
    * ops.Communities.labelSpreading round for round. */
  def labelSpreadOracle(rounds: Int, ratePermille: Int,
      salt: String): String = {
    val head =
      s"""WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
         |               FROM lineitem WHERE l_quantity <= 15),
         |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
         |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
         |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
         |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |       UNION ALL SELECT y AS a, x AS b FROM e0),
         |s0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS lab FROM se
         |       WHERE ('0x' || substr(md5('$salt' || a), 1, 15))::BIGINT
         |             % 1000 < $ratePermille),
         |l0 AS MATERIALIZED (SELECT node, lab FROM s0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT s.a, l.lab, COUNT(*) AS c
         |        FROM se s JOIN l${i - 1} l ON l.node = s.b
         |        GROUP BY s.a, l.lab),
         |m$i AS MATERIALIZED (SELECT a AS node, lab FROM (
         |        SELECT a, lab,
         |               ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, lab ASC) AS rn
         |        FROM c$i) WHERE rn = 1),
         |l$i AS MATERIALIZED (SELECT node, lab FROM s0
         |        UNION ALL
         |        SELECT node, lab FROM m$i
         |        WHERE node NOT IN (SELECT node FROM s0))""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT node, lab AS label FROM l$rounds ORDER BY node""".stripMargin
  }

  /** Unrolled radius-R multi-source BFS oracle for truncated harmonic
    * centrality over the same co-order part graph: per round, the
    * frontier (rows at distance i-1) expands across the symmetric edge
    * list and distances merge by MIN — exactly
    * ops.Harmonic.harmonicCentrality's union+min aggregate. Sources are
    * the md5 per-mille sample (q_sample identity-hash pattern); the
    * harmonic sum uses lcm(1..rounds)/d integer terms. MATERIALIZED per
    * round for the usual CTE-inlining reason.
    */
  def harmonicOracle(rounds: Int, ratePermille: Int,
      salt: String): String = {
    val scale = (1 to rounds).map(BigInt(_)).foldLeft(BigInt(1)) {
      (acc, d) => acc * d / acc.gcd(d)
    }
    val head =
      s"""WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
         |               FROM lineitem WHERE l_quantity <= 15),
         |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
         |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
         |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
         |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |       UNION ALL SELECT y AS a, x AS b FROM e0),
         |src AS MATERIALIZED (SELECT DISTINCT a AS node FROM se
         |       WHERE ('0x' || substr(md5('$salt' || a), 1, 15))::BIGINT
         |             % 1000 < $ratePermille),
         |d0 AS MATERIALIZED (SELECT node AS s, node AS v, 0 AS d FROM src)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM (
         |        SELECT s, v, d FROM d${i - 1}
         |        UNION ALL
         |        SELECT p.s, se.b AS v, p.d + 1 AS d
         |        FROM d${i - 1} p JOIN se ON p.v = se.a
         |        WHERE p.d = ${i - 1}) GROUP BY s, v)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps
       |SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS n_reached,
       |       CAST(SUM($scale // d) AS BIGINT) AS harmonic_num,
       |       CAST($scale AS BIGINT) AS harmonic_den
       |FROM d$rounds WHERE d > 0 GROUP BY v ORDER BY v""".stripMargin
  }

  /** Unrolled HyperBall oracle over the co-order part graph: base
    * registers are the HLL of each node's own md5 hash (the
    * q_hll_distinct integer register math), and each round max-merges
    * neighbor registers across the symmetric edge list — exactly
    * ops.HyperBall.ballRegisters' join+max aggregate, on the same sparse
    * (node, idx, rho) rows. MATERIALIZED per round as usual.
    */
  /** Percolation-sweep oracle: one filtered edge set + min-label
    * recursive CC per fraction (0 included), summaries unioned. The
    * sym CTEs dedup EXPLICITLY — inside WITH RECURSIVE, DuckDB treats a
    * non-recursive CTE's UNION as UNION ALL (the q_bowtie quirk). */
  def percolationOracle(fractions: Seq[Int]): String = {
    def block(f: Int): String = {
      val e =
        if (f == 0) s"e_f$f AS (SELECT a, b FROM edges)"
        else
          s"""e_f$f AS (SELECT a, b FROM edges
             | WHERE ('0x' || substr(md5('perc' || a), 1, 13))::BIGINT
             |     % 1000 >= $f
             |   AND ('0x' || substr(md5('perc' || b), 1, 13))::BIGINT
             |     % 1000 >= $f)""".stripMargin
      s"""$e,
         |sym_f$f AS (SELECT DISTINCT a, b FROM (SELECT a, b FROM e_f$f
         |  UNION ALL SELECT b AS a, a AS b FROM e_f$f)),
         |nodes_f$f AS (SELECT DISTINCT a AS node FROM sym_f$f),
         |cc_f$f AS (SELECT node, node AS lab FROM nodes_f$f
         |  UNION SELECT s.b AS node, c.lab
         |  FROM cc_f$f c JOIN sym_f$f s ON c.node = s.a WHERE c.lab < s.b),
         |comp_f$f AS (SELECT node, MIN(lab) AS component FROM cc_f$f
         |  GROUP BY 1),
         |sum_f$f AS (SELECT $f AS f_permille,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes_f$f) AS n_nodes,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e_f$f) AS m_edges,
         |  (SELECT CAST(COALESCE(MAX(cnt), 0) AS BIGINT) FROM
         |     (SELECT component, COUNT(*) AS cnt FROM comp_f$f GROUP BY 1))
         |    AS lcc)""".stripMargin
    }
    s"""WITH RECURSIVE
       |edges AS (SELECT DISTINCT 'P' || CAST(l_partkey AS VARCHAR) AS a,
       |            'S' || CAST(l_suppkey AS VARCHAR) AS b
       |          FROM lineitem WHERE l_quantity <= 2),
       |${(0 +: fractions.sorted).map(block).mkString(",\n")}
       |${(0 +: fractions.sorted).map(f => s"SELECT * FROM sum_f$f")
        .mkString("\nUNION ALL\n")}
       |ORDER BY f_permille""".stripMargin
  }

  /** Shared CTE chain of the q_node_sketch / q_node_sim oracles: the
    * user-journey graph, 8 md5 lanes per node, two unrolled
    * min-propagation rounds (s1, s2) mirroring ops.NodeSketch.sketches.
    * `finalSelect` either starts with ", cte AS (" to extend the WITH
    * chain or is a plain SELECT. */
  def nodeSketchOracle(finalSelect: String): String =
    s"""WITH ev AS (SELECT user_id, ts, event_id,
       |         lead(user_id) OVER (PARTITION BY event_type
       |           ORDER BY ts, event_id) AS nxt
       |       FROM events WHERE event_type = 'click' AND value < 2.0),
       |e0 AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS a,
       |         CAST(nxt AS VARCHAR) AS b
       |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
       |sym AS MATERIALIZED (SELECT a, b FROM e0
       |       UNION SELECT b AS a, a AS b FROM e0),
       |nodes AS (SELECT DISTINCT a AS node FROM sym),
       |s0 AS (SELECT node, k AS lane,
       |        ('0x' || substr(md5('ns' || CAST(k AS VARCHAR) || ':' || node),
       |          1, 15))::BIGINT AS h
       |      FROM nodes, UNNEST(range(0, 8)) AS t(k)),
       |s1 AS MATERIALIZED (SELECT node, lane, MIN(h) AS h FROM (
       |        SELECT s.a AS node, p.lane, p.h
       |        FROM sym s JOIN s0 p ON p.node = s.b
       |        UNION ALL SELECT node, lane, h FROM s0) GROUP BY 1, 2),
       |s2 AS MATERIALIZED (SELECT node, lane, MIN(h) AS h FROM (
       |        SELECT s.a AS node, p.lane, p.h
       |        FROM sym s JOIN s1 p ON p.node = s.b
       |        UNION ALL SELECT node, lane, h FROM s1) GROUP BY 1, 2)
       |$finalSelect""".stripMargin

  def hyperballOracle(rounds: Int, p: Int, hashBits: Int): String = {
    s"""${hyperballRegisterCtes(rounds, p, hashBits)}
       |SELECT node, CAST(idx AS INT) AS idx, CAST(rho AS INT) AS rho
       |FROM b$rounds ORDER BY node, idx""".stripMargin
  }

  /** Shared register-evolution CTE chain of the q_hyperball /
    * q_eff_diameter oracles: co-order graph, md5-lane base registers,
    * one max-merge CTE per radius (b0..b`rounds`). */
  def hyperballRegisterCtes(rounds: Int, p: Int,
      hashBits: Int): String = {
    val m = 1 << p
    val wZeroRho = hashBits - p + 1
    val head =
      s"""WITH rows0 AS (SELECT l_orderkey AS tid, 'P' || CAST(l_partkey AS VARCHAR) AS item
         |               FROM lineitem WHERE l_quantity <= 15),
         |txok AS (SELECT tid FROM rows0 GROUP BY tid HAVING COUNT(*) <= 8),
         |r AS (SELECT rows0.tid, rows0.item FROM rows0 JOIN txok USING (tid)),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.item AS x, b.item AS y
         |       FROM r a JOIN r b ON a.tid = b.tid AND a.item < b.item),
         |se AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |       UNION ALL SELECT y AS a, x AS b FROM e0),
         |h0 AS (SELECT DISTINCT a AS node,
         |         ('0x' || substr(md5(a), 1, 15))::BIGINT AS h FROM se),
         |b0 AS MATERIALIZED (SELECT node, CAST(h % $m AS INT) AS idx,
         |       CAST(CASE WHEN h >> $p = 0 THEN $wZeroRho
         |            ELSE bit_count(((h >> $p) & -(h >> $p)) - 1) + 1
         |            END AS INT) AS rho
         |       FROM h0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""b$i AS MATERIALIZED (SELECT node, idx, MAX(rho) AS rho FROM (
         |        SELECT node, idx, rho FROM b${i - 1}
         |        UNION ALL
         |        SELECT se.a AS node, b.idx, b.rho
         |        FROM se JOIN b${i - 1} b ON b.node = se.b
         |      ) GROUP BY node, idx)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$steps""".stripMargin
  }

  /** Effective-diameter oracle: replays ops.HyperBall.effectiveDiameter
    * over the shared register CTEs — raw-HLL estimate floored to whole
    * nodes per (r, node) via HUGEINT division (the Spark side divides in
    * DECIMAL(38,0); both floor the same non-negative ratio), integer
    * neighborhood-function sums, threshold radius as a MIN. */
  def effDiameterOracle(rounds: Int, p: Int, hashBits: Int,
      targetPermille: Long): String = {
    val m = 1 << p
    val alphaPpm = m match {
      case 16 => 673000L; case 32 => 697000L; case 64 => 709000L
      case _ => sys.error(s"unsupported p=$p")
    }
    val kBits = hashBits - p + 1
    val pow2K = 1L << kBits
    val num = (BigInt(alphaPpm) * m * m * pow2K).toString
    val slices = (0 to rounds).map(i =>
      s"SELECT $i AS r, node, rho FROM b$i").mkString("\n  UNION ALL ")
    s"""${hyperballRegisterCtes(rounds, p, hashBits)},
       |sl AS ($slices),
       |pn AS (SELECT r, node, CAST(COUNT(*) AS BIGINT) AS nz,
       |         CAST(SUM(CAST(1 AS BIGINT) << ($kBits - rho)) AS BIGINT)
       |           AS s_pow
       |       FROM sl GROUP BY 1, 2),
       |e AS (SELECT r, node,
       |        CAST('$num'::HUGEINT
       |          // ((s_pow + ($m - nz) * $pow2K)::HUGEINT * 1000000)
       |          AS BIGINT) AS est
       |      FROM pn),
       |nf AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |         CAST(SUM(est) AS BIGINT) AS nf_est
       |       FROM e GROUP BY 1),
       |fin AS (SELECT nf_est AS nf_final FROM nf WHERE r = $rounds),
       |rt AS (SELECT r, n_nodes, nf_est,
       |         CASE WHEN nf_final > 0 THEN (1000 * nf_est) // nf_final
       |              ELSE 0 END AS ratio_permille, nf_final
       |       FROM nf, fin),
       |eff AS (SELECT MIN(r) AS eff_diameter FROM rt
       |        WHERE 1000 * nf_est >= $targetPermille * nf_final)
       |SELECT r, n_nodes, nf_est, ratio_permille, eff_diameter
       |FROM rt, eff ORDER BY r""".stripMargin
  }

  /** Unrolled fixed-point PageRank oracle: one CTE per iteration mirrors
    * PageRank.scoresFixedPoint exactly — integer division (`//` ≡ Spark
    * `div` for the all-positive values here), damping 17/20, base
    * (3·scale)//(20·n). Unrolled rather than recursive because the
    * recursive term would need to reference the working table twice
    * (contributions + zero-indegree nodes). All sums cast back to BIGINT
    * (DuckDB SUM(BIGINT) is HUGEINT → float64 in pandas → hash mismatch).
    */
  /** Unrolled integer fixed-point Katz oracle over the user-journey
    * graph — mirrors ops.Katz.centralityFixedPoint iteration for
    * iteration (one truncating division per node per round, applied to
    * the summed in-contribution). */
  def katzOracle(iters: Int, alphaNum: Long, alphaDen: Long,
      scale: Long): String = {
    val head =
      s"""WITH ev AS (SELECT user_id, ts, event_id,
         |              lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
         |            FROM events WHERE event_type = 'click' AND value < 2.0),
         |e0 AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS src, CAST(nxt AS VARCHAR) AS dst
         |       FROM ev WHERE nxt IS NOT NULL AND nxt <> user_id),
         |em AS MATERIALIZED (SELECT src, dst, COUNT(*) AS m FROM e0 GROUP BY src, dst),
         |nodes AS (SELECT src AS node FROM em UNION SELECT dst FROM em),
         |k0 AS (SELECT node, CAST($scale AS BIGINT) AS r FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT nd.node,
         |         $scale + ($alphaNum * COALESCE(inc.s, 0)) // $alphaDen AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT em.dst, CAST(SUM(em.m * p.r) AS BIGINT) AS s
         |    FROM em JOIN k${i - 1} p ON p.node = em.src
         |    GROUP BY em.dst) inc ON inc.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$iterCtes
       |SELECT node, CAST(r AS BIGINT) AS katz_fp FROM k$iters ORDER BY node""".stripMargin
  }

  def pagerankFpOracle(iters: Int, sources: Seq[String] = Nil,
      weighted: Boolean = false): String = {
    val S = "1000000000000"
    // personalized: teleport (initial mass + per-iteration base) lands on
    // the source set only, divided by |S| — mirrors PageRank.pprFixedPoint
    val (initExpr, baseExpr) =
      if (sources.isEmpty)
        (s"$S // (SELECT n FROM nn)",
          s"(3 * $S) // (20 * (SELECT n FROM nn))")
      else {
        val list = sources.map(s => s"'$s'").mkString(", ")
        val ns = sources.size
        (s"CASE WHEN node IN ($list) THEN $S // $ns ELSE 0 END",
          s"CASE WHEN nd.node IN ($list) THEN (3 * $S) // (20 * $ns) ELSE 0 END")
      }
    // weighted: edge weight = floor(l_quantity), non-positive dropped,
    // m/outdeg are weight SUMS — mirrors PageRank.weightedScoresFixedPoint
    val e0Cte =
      if (weighted)
        """e0 AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS src,
          |              'S' || CAST(l_suppkey AS VARCHAR) AS dst,
          |              CAST(FLOOR(l_quantity) AS BIGINT) AS w
          |       FROM lineitem WHERE CAST(FLOOR(l_quantity) AS BIGINT) > 0),
          |em AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS m FROM e0 GROUP BY src, dst),
          |od AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg FROM e0 GROUP BY src),""".stripMargin
      else
        """e0 AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS src,
          |              'S' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem),
          |em AS (SELECT src, dst, COUNT(*) AS m FROM e0 GROUP BY src, dst),
          |od AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),""".stripMargin
    val head =
      s"""WITH
         |$e0Cte
         |e AS (SELECT em.src, em.dst, em.m, od.outdeg FROM em JOIN od ON em.src = od.src),
         |nodes AS (SELECT DISTINCT src AS node FROM e0 UNION SELECT DISTINCT dst FROM e0),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |pr0 AS (SELECT node, $initExpr AS r FROM nodes),""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT nd.node,
         |         $baseExpr + COALESCE(inc.s, 0) AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst, CAST(SUM((17 * e.m * p.r) // (20 * e.outdeg)) AS BIGINT) AS s
         |    FROM e JOIN pr${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) inc ON inc.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"$head\n$iterCtes\nSELECT node, CAST(r AS BIGINT) AS rank_q FROM pr$iters ORDER BY node"
  }

  /** CONVERGENT fixed-point PageRank oracle (r12, VERDICT r11 item 7):
    * a RECURSIVE CTE replay of PageRank.scoresFixedPointConvergent's
    * data-dependent stopping rule — the piece two rounds of verdicts
    * called not-SQL-expressible. Three tricks make it a single-reference
    * recursion (DuckDB refuses a second reference to the working table):
    *   1. marker self-loops: `e2` holds the real edges (marker 1) PLUS a
    *      zero-weight self-loop per node (marker 0), so ONE join of the
    *      working table against e2 yields, per target node, both the
    *      in-contributions (Σ over marker-1 rows) and the node's OWN
    *      previous rank (the marker-0 row) — no second reference for
    *      zero-indegree nodes or the delta;
    *   2. each emitted row carries the step's integer L1
    *      (Σ|r − r_prev|, a window over the step's derived rows); the
    *      recursive term's WHERE reads it from the incoming rows and
    *      refuses to fire once L1 < tolQ — the recursion stops exactly
    *      when the Spark loop does, at any sf;
    *   3. inside WITH RECURSIVE a bare `a UNION b` CTE is parsed as
    *      recursive syntax (measured: it yields UNION ALL multiplicities)
    *      — `nodes` therefore wraps DISTINCT around UNION ALL.
    * All arithmetic is the ×scale integer grid of [[pagerankFpOracle]]
    * (integer //, damping 17/20), so the converged ranks are bit-equal.
    */
  def pagerankConvOracle(tolQ: Long, maxIter: Int): String = {
    val S = "1000000000000"
    s"""WITH RECURSIVE
       |e0 AS (SELECT 'P' || CAST(l_partkey AS VARCHAR) AS src,
       |              'S' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem),
       |em AS (SELECT src, dst, COUNT(*) AS m FROM e0 GROUP BY src, dst),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),
       |nodes AS (SELECT DISTINCT node FROM
       |            (SELECT src AS node FROM e0 UNION ALL SELECT dst FROM e0)),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |e2 AS (SELECT em.src, em.dst, em.m, od.outdeg, 1 AS marker
       |       FROM em JOIN od ON od.src = em.src
       |       UNION ALL SELECT node, node, 0, 1, 0 FROM nodes),
       |it AS (
       |  SELECT 0 AS i, node,
       |         CAST($S // (SELECT n FROM nn) AS BIGINT) AS r,
       |         CAST(NULL AS BIGINT) AS l1
       |  FROM nodes
       |  UNION ALL
       |  SELECT i, node, r, CAST(SUM(ABS(r - r_old)) OVER () AS BIGINT) AS l1
       |  FROM (
       |    SELECT MAX(it.i) + 1 AS i, e2.dst AS node,
       |           CAST((3 * $S) // (20 * (SELECT n FROM nn))
       |             + SUM(CASE WHEN e2.marker = 1
       |                   THEN (17 * e2.m * it.r) // (20 * e2.outdeg)
       |                   ELSE 0 END) AS BIGINT) AS r,
       |           MAX(CASE WHEN e2.marker = 0 THEN it.r END) AS r_old
       |    FROM it JOIN e2 ON e2.src = it.node
       |    WHERE (it.l1 IS NULL OR it.l1 >= $tolQ) AND it.i < $maxIter
       |    GROUP BY e2.dst
       |  )
       |)
       |SELECT node, CAST(r AS BIGINT) AS rank_q
       |FROM it WHERE i = (SELECT MAX(i) FROM it) ORDER BY node""".stripMargin
  }

  /** Per-document token-stat tail over `words`/`wt` from [[tokenizeCtes]]:
    * counts, unknown counts, and the first-8-token head string. */
  def tokenStatsTailSql: String =
    """wstat AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |                 CAST(SUM(CASE WHEN tok = '?' THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
      |          FROM wt GROUP BY w),
      |dstat AS (SELECT wo.doc_id, CAST(SUM(s.n_tok) AS BIGINT) AS n_tokens,
      |                 CAST(SUM(s.n_unk) AS BIGINT) AS n_unk
      |          FROM words wo JOIN wstat s ON wo.w = s.w GROUP BY wo.doc_id),
      |htok AS (SELECT wo.doc_id, wo.wi, t.step, t.tok,
      |                ROW_NUMBER() OVER (PARTITION BY wo.doc_id ORDER BY wo.wi, t.step) AS rn
      |         FROM words wo JOIN wt t ON wo.w = t.w WHERE wo.wi <= 8),
      |head AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY wi, step) AS head_toks
      |         FROM htok WHERE rn <= 8 GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(ds.n_tokens, 0) AS n_tokens,
      |       COALESCE(ds.n_unk, 0) AS n_unk,
      |       COALESCE(h.head_toks, '') AS head_toks
      |FROM documents d
      |LEFT JOIN dstat ds ON d.doc_id = ds.doc_id
      |LEFT JOIN head h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Unrolled BPE-training CTEs mirroring ops.BpeTrain exactly: per round,
    * LEAD-paired symbol counts weighted by word multiplicity, a
    * deterministic argmax (count desc, left asc, right asc, LIMIT 1), the
    * chained-candidate run trick for greedy leftmost non-overlapping
    * merging (odd run members), then the rewrite/delete. Ends with
    * `best1..bestR` and `rows$rounds(w, pos, sym)`.
    */
  def bpeCtes(rounds: Int): String = {
    val head =
      """docs0 AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |wn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
        |       FROM (SELECT unnest(ws) AS w FROM docs0) GROUP BY w),
        |rows0 AS MATERIALIZED (
        |  SELECT w, CAST(i AS BIGINT) AS pos, substr(w, CAST(i AS INT), 1) AS sym
        |  FROM wn, UNNEST(range(1, len(w) + 1)) t(i))""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT w, pos, sym,
         |         LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nsym,
         |         LEAD(pos) OVER (PARTITION BY w ORDER BY pos) AS npos
         |  FROM rows${r - 1}),
         |cnt$r AS MATERIALIZED (
         |  SELECT p.sym, p.nsym, CAST(SUM(wn.n_w) AS BIGINT) AS cnt
         |  FROM p$r p JOIN wn ON wn.w = p.w
         |  WHERE p.nsym IS NOT NULL GROUP BY p.sym, p.nsym),
         |best$r AS MATERIALIZED (
         |  SELECT sym AS ba, nsym AS bb, cnt FROM cnt$r
         |  ORDER BY cnt DESC, sym ASC, nsym ASC LIMIT 1),
         |cand$r AS MATERIALIZED (
         |  SELECT p.w, p.pos, p.npos,
         |         CASE WHEN LAG(p.npos) OVER (PARTITION BY p.w ORDER BY p.pos) = p.pos
         |              THEN 0 ELSE 1 END AS rs
         |  FROM p$r p JOIN best$r b ON p.sym = b.ba AND p.nsym = b.bb),
         |keptr$r AS MATERIALIZED (
         |  SELECT w, pos, npos FROM (
         |    SELECT w, pos, npos,
         |           ROW_NUMBER() OVER (PARTITION BY w, run ORDER BY pos) AS k
         |    FROM (SELECT w, pos, npos,
         |                 SUM(rs) OVER (PARTITION BY w ORDER BY pos
         |                   ROWS UNBOUNDED PRECEDING) AS run
         |          FROM cand$r))
         |  WHERE k % 2 = 1),
         |rows$r AS MATERIALIZED (
         |  SELECT r.w, r.pos,
         |         CASE WHEN m.pos IS NOT NULL THEN (SELECT ba || bb FROM best$r)
         |              ELSE r.sym END AS sym
         |  FROM rows${r - 1} r
         |  LEFT JOIN (SELECT w, pos FROM keptr$r) m ON m.w = r.w AND m.pos = r.pos
         |  LEFT JOIN (SELECT w, npos FROM keptr$r) d ON d.w = r.w AND d.npos = r.pos
         |  WHERE d.npos IS NULL)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  /** Bottom-k order-statistic sample CTEs mirroring
    * functions.QuantileSampleAgg: per order priority, the k smallest
    * (md5-lane hash, cents value) pairs with multiplicity. Ends with
    * `kept(pri, v, h, rk)`.
    */
  def quantileSampleCtes(k: Int): String =
    s"""vals AS (SELECT o_orderpriority AS pri,
       |                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v
       |         FROM orders WHERE o_totalprice IS NOT NULL),
       |hashed AS (SELECT pri, v,
       |                  ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
       |           FROM vals),
       |rk AS (SELECT pri, v, h,
       |              ROW_NUMBER() OVER (PARTITION BY pri ORDER BY h, v) AS rk
       |       FROM hashed),
       |kept AS (SELECT pri, v, h, rk FROM rk WHERE rk <= $k)""".stripMargin

  /** Greedy longest-match subword tokenization CTEs mirroring
    * ops.Tokenizer exactly: explode docs to 1-based word positions,
    * tokenize DISTINCT words. The greedy loop is sequential per word, so
    * the recursion precomputes the TOTAL step function `ch(w, pos) →
    * (token, advance)` non-recursively (longest vocab match per position,
    * `?`/1 fallback) and then just iterates each word's trajectory with an
    * inner join — aggregation/EXISTS inside the recursive term, which
    * DuckDB rejects, is never needed. Ends with `words(doc_id, wi, w)` and
    * `wt(w, step, tok)` for the caller's final SELECT.
    */
  def tokenizeCtes(
      vocabCte: String =
        s"vocab(tok) AS (VALUES ${graft.ops.Tokenizer.vocabValuesSql()})"): String =
    s"""$vocabCte,
       |docs AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
       |words AS (SELECT doc_id, CAST(generate_subscripts(ws, 1) AS INT) AS wi, unnest(ws) AS w FROM docs),
       |dw AS (SELECT DISTINCT w FROM words),
       |positions AS (SELECT w, unnest(range(1, len(w) + 1)) AS pos FROM dw),
       |cand AS (SELECT p.w, p.pos, v.tok
       |         FROM positions p JOIN vocab v ON substr(p.w, CAST(p.pos AS INT), len(v.tok)) = v.tok),
       |pick AS (SELECT w, pos, tok,
       |                ROW_NUMBER() OVER (PARTITION BY w, pos ORDER BY len(tok) DESC) AS rn
       |         FROM cand),
       |ch AS MATERIALIZED (
       |  SELECT p.w, p.pos, COALESCE(k.tok, '?') AS tok,
       |         COALESCE(len(k.tok), 1) AS adv
       |  FROM positions p LEFT JOIN (SELECT w, pos, tok FROM pick WHERE rn = 1) k
       |    ON k.w = p.w AND k.pos = p.pos),
       |st AS (
       |  SELECT w, CAST(1 AS BIGINT) AS pos, CAST(0 AS INT) AS step, CAST('' AS VARCHAR) AS tok FROM dw
       |  UNION ALL
       |  SELECT s.w, s.pos + c.adv, s.step + 1, c.tok
       |  FROM st s JOIN ch c ON c.w = s.w AND c.pos = s.pos
       |  WHERE s.pos <= len(s.w)),
       |wt AS (SELECT w, step, tok FROM st WHERE step >= 1)""".stripMargin

  /** Path-doubling all-pairs shortest-distance CTEs over the 25-node
    * nation graph: with 0-cost self-loops folded into d0, each round
    * subsumes the last, so d_k(a,c) = min cost over walks of <= 2^k
    * edges. `rounds`=5 covers 32 >= 24 edges — the longest possible
    * simple path on 25 nodes — and nonnegative costs make min-over-walks
    * = min-over-simple-paths, so d5 is the exact all-pairs distance.
    * Replaces the recursive simple-path enumeration whose fan-out
    * dominated the t2 oracle wall time (VERDICT r4 item 1). MATERIALIZED
    * is load-bearing: each round references the previous one twice.
    */
  /** Unrolled SimRank oracle over the directed nation graph: the
    * chain+skip edge CTEs, then `iters` rounds of the pair⋈edge⋈edge
    * sum with the same HUGEINT-floored ppm update and the diagonal
    * clamped to 10⁶ — mirrors ops.SimRank.simRank round for round. */
  def simRankOracle(iters: Int, cPpm: Long = 800000L): String = {
    val head =
      """nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst
        |          FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst
        |         FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |         SELECT * FROM chain UNION ALL SELECT * FROM skip)
        |         WHERE src <> dst),
        |din AS (SELECT dst AS a, CAST(COUNT(*) AS BIGINT) AS din
        |        FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT x AS node FROM (
        |         SELECT src AS x FROM edges UNION ALL SELECT dst FROM edges)),
        |s0 AS MATERIALIZED (SELECT node AS pa, node AS pb,
        |         CAST(1000000 AS BIGINT) AS s_ppm FROM nodes)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""sum$t AS (SELECT ea.dst AS na, eb.dst AS nb,
         |          CAST(SUM(s.s_ppm) AS BIGINT) AS ssum
         |        FROM s${t - 1} s
         |        JOIN edges ea ON ea.src = s.pa
         |        JOIN edges eb ON eb.src = s.pb
         |        WHERE ea.dst <> eb.dst GROUP BY 1, 2),
         |s$t AS MATERIALIZED (SELECT pa, pb, s_ppm FROM (
         |        SELECT node AS pa, node AS pb,
         |               CAST(1000000 AS BIGINT) AS s_ppm FROM nodes
         |        UNION ALL
         |        SELECT q.na, q.nb,
         |               CAST(($cPpm::HUGEINT * q.ssum)
         |                 // (1000000::HUGEINT * da.din * db.din) AS BIGINT)
         |        FROM sum$t q
         |        JOIN din da ON da.a = q.na
         |        JOIN din db ON db.a = q.nb)
         |      WHERE s_ppm > 0)""".stripMargin
    }.mkString(",\n")
    s"""WITH $head,
       |$steps
       |SELECT pa AS node_a, pb AS node_b, s_ppm FROM s$iters
       |WHERE pa < pb ORDER BY 1, 2""".stripMargin
  }

  def nationApspCtes(rounds: Int): String = {
    val head =
      """nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst,
        |            CAST(TRUNC((CAST(0.1 AS DOUBLE) + (b.n_nationkey % 7) * CAST(0.35 AS DOUBLE)) * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS cost
        |          FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst,
        |           CAST(TRUNC((CAST(1.0 AS DOUBLE) + (b.n_nationkey % 5) * CAST(0.21 AS DOUBLE)) * CAST(1000.0 AS DOUBLE)) AS BIGINT) AS cost
        |         FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |edges AS (SELECT * FROM chain UNION ALL SELECT * FROM skip),
        |sym AS (SELECT src, dst, cost FROM edges UNION ALL SELECT dst AS src, src AS dst, cost FROM edges),
        |d0 AS MATERIALIZED (
        |  SELECT src, dst, MIN(cost) AS cost FROM (
        |    SELECT src, dst, cost FROM sym
        |    UNION ALL
        |    SELECT src, src AS dst, CAST(0 AS BIGINT) AS cost FROM (SELECT DISTINCT src FROM sym))
        |  GROUP BY src, dst)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT a.src, b.dst, MIN(a.cost + b.cost) AS cost
         |  FROM d${i - 1} a JOIN d${i - 1} b ON a.dst = b.src
         |  GROUP BY a.src, b.dst)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  /** Unrolled level-synchronous BFS with shortest-path counts over the
    * unweighted nation graph: frontier f_i holds (src, node, sigma) for
    * nodes at distance exactly i, sigma summed over predecessor
    * frontiers — the standard Brandes forward pass, which is what the
    * repo's distributed Betweenness computes. `rounds` must be >= the
    * graph's eccentricity (8 for the 25-node chain+skip graph; 10 leaves
    * margin — extra rounds are empty frontiers). Replaces the recursive
    * simple-path enumeration (VERDICT r4 item 1).
    */
  def nationBfsSigmaCtes(rounds: Int): String = {
    val head =
      """nk AS (SELECT n_name, n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation),
        |chain AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 1),
        |skip AS (SELECT a.n_name AS src, b.n_name AS dst FROM nk a JOIN nk b ON b.rn = a.rn + 5),
        |edges AS (SELECT * FROM chain UNION ALL SELECT * FROM skip),
        |sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
        |nodes AS (SELECT DISTINCT src AS node FROM sym),
        |f0 AS MATERIALIZED (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma FROM nodes),
        |r0 AS MATERIALIZED (SELECT src, node FROM f0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""f$i AS MATERIALIZED (
         |  SELECT f.src, s.dst AS node, CAST(SUM(f.sigma) AS BIGINT) AS sigma
         |  FROM f${i - 1} f JOIN sym s ON f.node = s.src
         |  LEFT JOIN r${i - 1} r ON r.src = f.src AND r.node = s.dst
         |  WHERE r.node IS NULL
         |  GROUP BY f.src, s.dst),
         |r$i AS MATERIALIZED (SELECT src, node FROM r${i - 1} UNION ALL SELECT src, node FROM f$i)""".stripMargin
    }.mkString(",\n")
    val levels = (1 to rounds)
      .map(i => s"SELECT src, node, $i AS d, sigma FROM f$i")
      .mkString("\n  UNION ALL ")
    s"$head,\n$steps,\nsg AS (SELECT src AS s, node AS t, d, sigma FROM (\n  $levels))"
  }

  /** DuckDB min-label-propagation connected components over the same
    * part↔supplier edges as Tables.partSupplierEdges; `finalSelect` runs
    * over cc(node, lab) where min(lab) per node = canonical component.
    */
  /** Shared CTE prefix for the ANN-audit oracles: `lsh(query_id, rank,
    * neighbor_id, cosine)` from the portable LSH generator and
    * `bf(query_id, neighbor_id, rank)` — the exact quantized-cosine
    * top-5 for queries vec_id < 20 (the q_ann_topk pipeline).
    */
  def annAuditCtes: String =
    s"""lsh AS (SELECT * FROM (
       |${graft.ops.Similarity.lshPortableOracle(dim = 64, k = 5,
            nBits = 6, tables = 4, seed = 42L)})),
       |bf AS (SELECT * FROM (
       |  WITH q AS (SELECT vec_id, list_transform(embedding,
       |               x -> FLOOR(CAST(x AS DOUBLE) * CAST(10000.0 AS DOUBLE))) AS v
       |             FROM embeddings),
       |  n AS (SELECT vec_id, (SELECT SUM(x*x) FROM UNNEST(v) AS t(x)) AS nrm FROM q),
       |  p AS (SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
       |          (SELECT SUM(qq.v[i]*c.v[i])
       |           FROM UNNEST(range(1, len(qq.v)+1)) AS t(i)) AS dot
       |        FROM (SELECT * FROM q WHERE vec_id < 20) qq
       |        JOIN q c ON c.vec_id <> qq.vec_id),
       |  scored AS (SELECT query_id, neighbor_id,
       |               ROW_NUMBER() OVER (PARTITION BY query_id
       |                 ORDER BY dot / SQRT(na.nrm * nb.nrm) DESC,
       |                   neighbor_id ASC) AS rank
       |             FROM p JOIN n na ON na.vec_id = query_id
       |                    JOIN n nb ON nb.vec_id = neighbor_id)
       |  SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
       |  FROM scored WHERE rank <= 5))""".stripMargin

  def ccOracle(finalSelect: String): String =
    s"""WITH RECURSIVE
       |edges AS (
       |  SELECT 'P' || CAST(l_partkey AS VARCHAR) AS a,
       |         'S' || CAST(l_suppkey AS VARCHAR) AS b
       |  FROM lineitem WHERE l_quantity <= 2),
       |sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |nodes AS (SELECT DISTINCT a AS node FROM sym),
       |cc AS (
       |  SELECT node, node AS lab FROM nodes
       |  UNION
       |  SELECT s.b AS node, c.lab
       |  FROM cc c JOIN sym s ON c.node = s.a
       |  WHERE c.lab < s.b)
       |$finalSelect""".stripMargin
}
