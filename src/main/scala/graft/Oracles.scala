package graft

import graft.sources.TpchGraph

/**
 * ANSI-SQL (DuckDB-runnable) oracles for the graph queries. Iterative
 * kernels (PageRank / CC / LPA) are unrolled to a fixed superstep count as
 * chained CTEs — both the Spark query and the oracle run EXACTLY k rounds,
 * so results match independently of convergence behavior. Float outputs are
 * emitted as `CAST(ROUND(value * 1e9) AS BIGINT)` on both sides so the
 * driver's hash compare sees identical int64s (double associativity across
 * partitionings only perturbs ~1e-15 relative, far below the rounding
 * grain).
 */
object Oracles {

  private val E = TpchGraph.edgesSql
  private val S = TpchGraph.symEdgesSql

  private def verts(edges: String): String =
    s"""SELECT id FROM (SELECT src AS id FROM edges
       | UNION SELECT dst AS id FROM edges) AS vv""".stripMargin

  val graphEdges: String =
    s"SELECT src, dst FROM ($E) AS e ORDER BY src, dst"

  val graphSymmetrize: String =
    s"SELECT src, dst FROM ($S) AS e ORDER BY src, dst"

  val graphOrient: String =
    s"SELECT src, dst FROM ($S) AS e WHERE src < dst ORDER BY src, dst"

  val graphDegrees: String =
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")})
       |SELECT v.id,
       |       CAST(COALESCE(o.c, 0) AS BIGINT) AS outdeg,
       |       CAST(COALESCE(i.c, 0) AS BIGINT) AS indeg
       |FROM v
       |LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o ON v.id = o.id
       |LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY dst) i ON v.id = i.id
       |ORDER BY v.id""".stripMargin

  val graphDegreeHist: String =
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |deg AS (SELECT v.id, CAST(COALESCE(o.c, 0) AS BIGINT) AS outdeg
       |        FROM v LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o
       |        ON v.id = o.id)
       |SELECT outdeg, CAST(COUNT(*) AS BIGINT) AS n_vertices
       |FROM deg GROUP BY outdeg ORDER BY outdeg""".stripMargin

  val graphTranspose: String =
    s"SELECT dst AS src, src AS dst FROM ($E) AS e ORDER BY src, dst"

  val graphInDegreeHist: String =
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |deg AS (SELECT v.id, CAST(COALESCE(i.c, 0) AS BIGINT) AS indeg
       |        FROM v LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY dst) i
       |        ON v.id = i.id)
       |SELECT indeg, CAST(COUNT(*) AS BIGINT) AS n_vertices
       |FROM deg GROUP BY indeg ORDER BY indeg""".stripMargin

  /** blocks×blocks sparsity grid over the dense id extent. */
  def graphSparsity(blocks: Int = 8): String =
    s"""WITH edges AS MATERIALIZED ($E),
       |bs AS (SELECT (MAX(GREATEST(src, dst)) + 1 + ${blocks - 1}) // $blocks AS b FROM edges)
       |SELECT src // (SELECT b FROM bs) AS row_block,
       |       dst // (SELECT b FROM bs) AS col_block,
       |       CAST(COUNT(*) AS BIGINT) AS n_edges
       |FROM edges GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Hubs at `factor`× mean out-degree. The factor is written as the same
    * double literal the engine multiplies with, and the threshold is
    * factor * AVG (one double multiply) on both sides. */
  def graphHubs(factor: Double): String =
    s"""WITH edges AS MATERIALIZED ($E),
       |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)
       |SELECT id, outdeg FROM deg
       |WHERE outdeg >= $factor * (SELECT AVG(outdeg) FROM deg)
       |ORDER BY id""".stripMargin

  val graphRelabel: String =
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |deg AS (SELECT v.id,
       |          CAST(COALESCE(o.c, 0) + COALESCE(i.c, 0) AS BIGINT) AS d
       |        FROM v
       |        LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o ON v.id = o.id
       |        LEFT JOIN (SELECT dst AS id, COUNT(*) AS c FROM edges GROUP BY dst) i ON v.id = i.id)
       |SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY d DESC, id ASC) - 1 AS BIGINT) AS new_id
       |FROM deg ORDER BY id""".stripMargin

  /** k unrolled pull-topo PageRank iterations; ranks as round(v*1e9). */
  def pagerank(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT v.id, bs.b + 0.85 * COALESCE(c.s, 0.0) AS value
         |  FROM v CROSS JOIN bs
         |  LEFT JOIN (
         |    SELECT e.dst AS id, SUM(s.value / d.outdeg) AS s
         |    FROM edges e
         |    JOIN s${i - 1} s ON e.src = s.id
         |    JOIN deg d ON e.src = d.id
         |    GROUP BY e.dst) c ON v.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
       |nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
       |bs AS (SELECT (1.0 - 0.85) / n AS b FROM nv),
       |s0 AS MATERIALIZED (SELECT id, (SELECT 1.0 / n FROM nv) AS value FROM v),
       |$iters
       |SELECT id, CAST(ROUND(value * 1000000000) AS BIGINT) AS rank_n
       |FROM s$k ORDER BY id""".stripMargin
  }

  /** k unrolled push-sync rounds (PageRank-push.cpp:103-190): value starts
    * 0, residual starts (1.0 - 0.85) — written EXACTLY so both engines
    * compute the same double; active = residual > 0 contributes
    * (residual*0.85)/outdeg to each out-neighbor's residual. */
  def pagerankPush(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT p.id,
         |    p.value + CASE WHEN p.residual > 0 THEN p.residual ELSE 0.0 END AS value,
         |    (CASE WHEN p.residual > 0 THEN 0.0 ELSE p.residual END)
         |      + COALESCE(d.dsum, 0.0) AS residual
         |  FROM s${i - 1} p
         |  LEFT JOIN (
         |    SELECT e.dst AS id, SUM((s.residual * 0.85) / dg.outdeg) AS dsum
         |    FROM edges e
         |    JOIN s${i - 1} s ON e.src = s.id AND s.residual > 0
         |    JOIN deg dg ON e.src = dg.id
         |    GROUP BY e.dst) d ON p.id = d.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
       |s0 AS MATERIALIZED (SELECT id, 0.0 AS value, (1.0 - 0.85) AS residual FROM v),
       |$iters
       |SELECT id, CAST(ROUND(value * 1000000000) AS BIGINT) AS rank_n
       |FROM s$k ORDER BY id""".stripMargin
  }

  /** k unrolled pull-residual rounds (PageRank-pull.cpp:137-195, the
    * reference default `-algo=Residual`) at tolerance 0: value starts 0,
    * residual starts (1.0 - 0.85); an active vertex (residual > 0)
    * flushes value += residual and scatters (residual*0.85)/outdeg; a
    * POSITIVE delta sum OVERWRITES the residual, otherwise an inactive
    * vertex keeps its old one. Written so every double op matches the
    * engine bit-for-bit. */
  def pagerankResidual(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT p.id,
         |    p.value + CASE WHEN p.residual > 0 THEN p.residual ELSE 0.0 END AS value,
         |    CASE WHEN d.dsum > 0 THEN d.dsum
         |      ELSE CASE WHEN p.residual > 0 THEN 0.0 ELSE p.residual END
         |    END AS residual
         |  FROM s${i - 1} p
         |  LEFT JOIN (
         |    SELECT e.dst AS id, SUM((s.residual * 0.85) / dg.outdeg) AS dsum
         |    FROM edges e
         |    JOIN s${i - 1} s ON e.src = s.id AND s.residual > 0
         |    JOIN deg dg ON e.src = dg.id
         |    GROUP BY e.dst) d ON p.id = d.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
       |s0 AS MATERIALIZED (SELECT id, 0.0 AS value, (1.0 - 0.85) AS residual FROM v),
       |$iters
       |SELECT id, CAST(ROUND(value * 1000000000) AS BIGINT) AS rank_n
       |FROM s$k ORDER BY id""".stripMargin
  }

  /** Deterministic hash permutation (engine's gr2randgr analog): rank of
    * (h(id), id) with h the same integer polynomial as the engine. */
  val graphPermute: String =
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")})
       |SELECT id, CAST(ROW_NUMBER() OVER (
       |  ORDER BY ((id % 1000003) * 2654435761 + id) % 4294967296 ASC, id ASC)
       |  - 1 AS BIGINT) AS new_id
       |FROM v ORDER BY id""".stripMargin

  /** RemoveHighDegree: edges whose endpoints both have outdeg ≤ maxDeg. */
  def graphLowDegree(maxDeg: Long): String =
    s"""WITH edges AS MATERIALIZED ($E),
       |high AS MATERIALIZED (
       |  SELECT src AS id FROM edges GROUP BY src HAVING COUNT(*) > $maxDeg)
       |SELECT src, dst FROM edges
       |WHERE src NOT IN (SELECT id FROM high)
       |  AND dst NOT IN (SELECT id FROM high)
       |ORDER BY src, dst""".stripMargin

  /** k unrolled BFS rounds from source = min vertex id: reached vertices
    * only (no infinity sentinel), hop distances. */
  def bfs(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM s${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, s.dist + 1 AS dist
         |    FROM edges e JOIN s${i - 1} s ON e.src = s.id
         |  ) u GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |s0 AS MATERIALIZED (SELECT MIN(id) AS id, CAST(0 AS BIGINT) AS dist FROM v),
       |$iters
       |SELECT id, CAST(dist AS BIGINT) AS dist FROM s$k ORDER BY id""".stripMargin
  }

  /** BFS-order relabel: rank by (hop distance from min-id source,
    * id), unreached last. k must cover the reachable diameter (like the
    * CC oracle's fixed unroll). */
  def bfsRelabel(k: Int): String =
    s"""WITH b AS MATERIALIZED (${bfs(k)}),
       |edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")})
       |SELECT v.id, CAST(ROW_NUMBER() OVER (
       |  ORDER BY COALESCE(b.dist, 9223372036854775807) ASC, v.id ASC)
       |  - 1 AS BIGINT) AS new_id
       |FROM v LEFT JOIN b ON v.id = b.id
       |ORDER BY v.id""".stripMargin

  /** `rounds` unrolled k-core peel rounds over the symmetric graph:
    * surviving (id, deg in surviving subgraph). */
  def kcore(k: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT src AS id FROM e${i - 1} GROUP BY src HAVING COUNT(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN k$i a ON e.src = a.id
         |  JOIN k$i b ON e.dst = b.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED ($S),
       |$iters
       |SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
       |FROM e$rounds GROUP BY src ORDER BY id""".stripMargin
  }

  /** k unrolled Bellman-Ford rounds from source = min vertex id, with the
    * synthetic weight 1 + (src + dst) mod 9 (the edge table carries no
    * weights; the engine uses the identical integer expression). */
  def sssp(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM s${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, s.dist + (1 + (e.src + e.dst) % 9) AS dist
         |    FROM edges e JOIN s${i - 1} s ON e.src = s.id
         |  ) u GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |s0 AS MATERIALIZED (SELECT MIN(id) AS id, CAST(0 AS BIGINT) AS dist FROM v),
       |$iters
       |SELECT id, CAST(dist AS BIGINT) AS dist FROM s$k ORDER BY id""".stripMargin
  }

  private val W = TpchGraph.weightedEdgesSql

  /** Weighted edge table (the weighted-surface round-trip queries). */
  val graphWeightedEdges: String =
    s"SELECT src, dst, w FROM ($W) AS e ORDER BY src, dst"

  /** The svmlight bipartite mapping (svmlight2gr,
    * graph-convert.cpp:2795-2900): example ids = line numbers (= rank of
    * src in the exported file), features shifted by the example count. */
  val graphSvmlight: String =
    s"""WITH w AS MATERIALIZED ($W),
       |ex AS MATERIALIZED (
       |  SELECT src, CAST(ROW_NUMBER() OVER (ORDER BY src) - 1 AS BIGINT) AS ex_id
       |  FROM (SELECT DISTINCT src FROM w) s),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM ex)
       |SELECT ex.ex_id AS src,
       |       CAST((SELECT c FROM n) + w.dst AS BIGINT) AS dst, w.w
       |FROM w JOIN ex ON w.src = ex.src
       |ORDER BY src, dst""".stripMargin

  /** k unrolled Bellman-Ford rounds over REAL edge weights (the weighted
    * fixture's deterministic 1 + (src*7 + dst*13) % 97). */
  def ssspWeighted(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM s${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, s.dist + e.w AS dist
         |    FROM edges e JOIN s${i - 1} s ON e.src = s.id
         |  ) u GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($W),
       |v AS MATERIALIZED (${verts("edges")}),
       |s0 AS MATERIALIZED (SELECT MIN(id) AS id, CAST(0 AS BIGINT) AS dist FROM v),
       |$iters
       |SELECT id, CAST(dist AS BIGINT) AS dist FROM s$k ORDER BY id""".stripMargin
  }

  private val WU = TpchGraph.weightedUndirectedSql

  /** `rounds` unrolled Boruvka rounds over the weighted undirected
    * fixture, each with `jumps` unrolled pointer jumps (mirrors
    * graft.operators.Boruvka.fixedRounds step for step): the spanning
    * forest edges picked so far. */
  def mst(rounds: Int, jumps: Int = 12): String = {
    val perRound = (1 to rounds).map { i =>
      val jumpCtes = (1 to jumps).map { j =>
        s"""p${i}_$j AS MATERIALIZED (
           |  SELECT x.c, y.p FROM p${i}_${j - 1} x
           |  JOIN p${i}_${j - 1} y ON x.p = y.c)""".stripMargin
      }.mkString(",\n")
      s"""x$i AS MATERIALIZED (
         |  SELECT e.src, e.dst, e.w, a.comp AS cs, b.comp AS cd
         |  FROM e${i - 1} e
         |  JOIN c${i - 1} a ON e.src = a.id
         |  JOIN c${i - 1} b ON e.dst = b.id
         |  WHERE a.comp <> b.comp),
         |sel$i AS MATERIALIZED (
         |  SELECT c, w, src, dst, other FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY c
         |      ORDER BY w, src, dst) AS rn
         |    FROM (
         |      SELECT cs AS c, w, src, dst, cd AS other FROM x$i
         |      UNION ALL
         |      SELECT cd AS c, w, src, dst, cs AS other FROM x$i) u) z
         |  WHERE rn = 1),
         |m$i AS MATERIALIZED (SELECT DISTINCT src, dst, w FROM sel$i),
         |p${i}_0 AS MATERIALIZED (
         |  SELECT s.c,
         |    CASE WHEN q.other = s.c AND s.c < s.other THEN s.c
         |         ELSE s.other END AS p
         |  FROM sel$i s JOIN sel$i q ON s.other = q.c),
         |$jumpCtes,
         |c$i AS MATERIALIZED (
         |  SELECT c.id, COALESCE(p.p, c.comp) AS comp
         |  FROM c${i - 1} c LEFT JOIN p${i}_$jumps p ON c.comp = p.c),
         |e$i AS MATERIALIZED (SELECT src, dst, w FROM x$i)""".stripMargin
    }.mkString(",\n")
    val all = (1 to rounds).map(i => s"SELECT src, dst, w FROM m$i")
      .mkString("\n  UNION ALL ")
    s"""WITH e0 AS MATERIALIZED ($WU),
       |v AS MATERIALIZED (SELECT id FROM (SELECT src AS id FROM e0
       |  UNION SELECT dst AS id FROM e0) vv),
       |c0 AS MATERIALIZED (SELECT id, id AS comp FROM v),
       |$perRound
       |SELECT src, dst, w FROM (
       |  $all) f ORDER BY src, dst""".stripMargin
  }

  /** Brandes betweenness for the `nSources` smallest vertex ids, BFS
    * horizon `levels`: forward CTEs accumulate (q, id, dist, sigma) level
    * by level; backward CTEs accumulate dependencies deepest-level-first;
    * bc = Σ_q δ_q(v), v ≠ q, emitted ×1e9-rounded. */
  def betweenness(nSources: Int, levels: Int): String =
    betweennessFrom(nSources, levels, sampled = false)

  /** Sampled variant: sources are the nSources vertices with the
    * smallest engine-neutral hash (the permutation polynomial), id
    * tie-break — the deterministic stand-in for Brandes source sampling,
    * which is how full-graph BC runs at scale (per-source cost is a
    * whole BFS; the estimator sums a fixed sample). */
  def betweennessSampled(nSources: Int, levels: Int): String =
    betweennessFrom(nSources, levels, sampled = true)

  private def betweennessFrom(nSources: Int, levels: Int,
      sampled: Boolean): String = {
    val fwd = (1 to levels).map { r =>
      s"""f$r AS MATERIALIZED (
         |  SELECT q, id, dist, sigma FROM f${r - 1}
         |  UNION ALL
         |  SELECT n.q, n.id, $r AS dist, n.sigma FROM (
         |    SELECT s.q, e.dst AS id, CAST(SUM(s.sigma) AS BIGINT) AS sigma
         |    FROM edges e JOIN f${r - 1} s ON e.src = s.id AND s.dist = ${r - 1}
         |    GROUP BY s.q, e.dst) n
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM f${r - 1} p WHERE p.q = n.q AND p.id = n.id))""".stripMargin
    }.mkString(",\n")
    val bwd = ((levels - 1) to 0 by -1).map { l =>
      s"""d$l AS MATERIALIZED (
         |  SELECT vs.q, vs.id,
         |    SUM((CAST(vs.sigma AS DOUBLE) / ws.sigma)
         |        * (1.0 + COALESCE(dw.delta, 0.0))) AS delta
         |  FROM f$levels vs
         |  JOIN edges e ON e.src = vs.id
         |  JOIN f$levels ws ON ws.q = vs.q AND ws.id = e.dst
         |    AND ws.dist = ${l + 1}
         |  LEFT JOIN d${l + 1} dw ON dw.q = ws.q AND dw.id = ws.id
         |  WHERE vs.dist = $l
         |  GROUP BY vs.q, vs.id)""".stripMargin
    }.mkString(",\n")
    val allD = (0 until levels).map(l => s"SELECT * FROM d$l")
      .mkString("\n    UNION ALL ")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |srcs AS MATERIALIZED (SELECT id AS q FROM v ORDER BY ${
        if (sampled) "((id % 1000003) * 2654435761 + id) % 4294967296 ASC, id ASC"
        else "id"} LIMIT $nSources),
       |f0 AS MATERIALIZED (
       |  SELECT q, q AS id, 0 AS dist, CAST(1 AS BIGINT) AS sigma FROM srcs),
       |$fwd,
       |d$levels AS (SELECT CAST(0 AS BIGINT) AS q, CAST(0 AS BIGINT) AS id,
       |  0.0 AS delta WHERE FALSE),
       |$bwd,
       |bc AS (
       |  SELECT id, SUM(delta) AS bc FROM (
       |    $allD) u
       |  WHERE id <> q GROUP BY id)
       |SELECT v.id, CAST(ROUND(COALESCE(bc.bc, 0.0) * 1000000000) AS BIGINT) AS bc_n
       |FROM v LEFT JOIN bc ON v.id = bc.id ORDER BY v.id""".stripMargin
  }

  /** `rounds` unrolled deterministic Luby MIS rounds over the symmetric
    * graph; priority = (hash, id) with the same integer polynomial as the
    * engine. */
  def independentSet(rounds: Int): String = {
    def h(x: String) = s"((($x % 1000003) * 2654435761 + $x) % 4294967296)"
    val iters = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT v.id FROM r${i - 1} v WHERE NOT EXISTS (
         |    SELECT 1 FROM edges e JOIN r${i - 1} u
         |    ON e.src = v.id AND e.dst = u.id
         |    WHERE ${h("u.id")} < ${h("v.id")}
         |       OR (${h("u.id")} = ${h("v.id")} AND u.id < v.id))),
         |n$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS id FROM edges e JOIN w$i w ON e.src = w.id),
         |r$i AS MATERIALIZED (
         |  SELECT id FROM r${i - 1}
         |  WHERE id NOT IN (SELECT id FROM w$i)
         |    AND id NOT IN (SELECT id FROM n$i))""".stripMargin
    }.mkString(",\n")
    val all = (1 to rounds).map(i => s"SELECT id FROM w$i")
      .mkString("\n  UNION ALL ")
    s"""WITH edges AS MATERIALIZED ($S),
       |r0 AS MATERIALIZED (${verts("edges")}),
       |$iters
       |SELECT id FROM (
       |  $all) m ORDER BY id""".stripMargin
  }

  /** `rounds` unrolled deterministic greedy-matching rounds over the
    * upper-oriented graph; edge priority = (hash, src, dst) with the same
    * polynomial as the engine. */
  def matching(rounds: Int): String = {
    def h(s: String, d: String) =
      s"((($s % 1000003) * 1000033 + ($d % 1000003)) % 4294967296)"
    val iters = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM r${i - 1} e WHERE NOT EXISTS (
         |    SELECT 1 FROM r${i - 1} o
         |    WHERE (o.src = e.src OR o.src = e.dst
         |        OR o.dst = e.src OR o.dst = e.dst)
         |      AND NOT (o.src = e.src AND o.dst = e.dst)
         |      AND (${h("o.src", "o.dst")} < ${h("e.src", "e.dst")}
         |        OR (${h("o.src", "o.dst")} = ${h("e.src", "e.dst")}
         |          AND (o.src < e.src
         |            OR (o.src = e.src AND o.dst < e.dst)))))),
         |mv$i AS MATERIALIZED (
         |  SELECT src AS id FROM w$i UNION SELECT dst AS id FROM w$i),
         |r$i AS MATERIALIZED (
         |  SELECT src, dst FROM r${i - 1}
         |  WHERE src NOT IN (SELECT id FROM mv$i)
         |    AND dst NOT IN (SELECT id FROM mv$i))""".stripMargin
    }.mkString(",\n")
    val all = (1 to rounds).map(i => s"SELECT src, dst FROM w$i")
      .mkString("\n  UNION ALL ")
    s"""WITH sym AS MATERIALIZED ($S),
       |r0 AS MATERIALIZED (SELECT src, dst FROM sym WHERE src < dst),
       |$iters
       |SELECT src, dst FROM (
       |  $all) m ORDER BY src, dst""".stripMargin
  }

  /** `rounds` unrolled k-truss support peels over the upper-oriented
    * symmetric graph: surviving undirected edges. */
  def ktruss(k: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""t$i AS MATERIALIZED (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM o${i - 1} e1
         |  JOIN o${i - 1} e2 ON e1.dst = e2.src
         |  JOIN o${i - 1} e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |s$i AS MATERIALIZED (
         |  SELECT src, dst, COUNT(*) AS sup FROM (
         |    SELECT a AS src, b AS dst FROM t$i
         |    UNION ALL SELECT b AS src, c AS dst FROM t$i
         |    UNION ALL SELECT a AS src, c AS dst FROM t$i) u
         |  GROUP BY src, dst),
         |o$i AS MATERIALIZED (
         |  SELECT o.src, o.dst FROM o${i - 1} o
         |  LEFT JOIN s$i s ON o.src = s.src AND o.dst = s.dst
         |  WHERE COALESCE(s.sup, 0) >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"""WITH sym AS MATERIALIZED ($S),
       |o0 AS MATERIALIZED (SELECT src, dst FROM sym WHERE src < dst),
       |$iters
       |SELECT src, dst FROM o$rounds ORDER BY src, dst""".stripMargin
  }

  /** Sanity aggregates (PageRank-pull.cpp:354-379) over the k-round
    * pull-topo ranks (already int64-scaled, so exact). */
  def pagerankSanity(k: Int): String =
    s"""SELECT CAST(MAX(rank_n) AS BIGINT) AS max_rank_n,
       |       CAST(MIN(rank_n) AS BIGINT) AS min_rank_n,
       |       CAST(SUM(rank_n) AS BIGINT) AS sum_rank_n
       |FROM (${pagerank(k)}) AS r""".stripMargin

  val graphStats: String =
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS (${verts("edges")}),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src)
       |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_vertices,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       |       (SELECT MAX(d) FROM deg) AS max_outdeg,
       |       (SELECT MIN(src) FROM deg WHERE d = (SELECT MAX(d) FROM deg)) AS max_outdeg_vertex""".stripMargin

  def pagerankTop20(k: Int): String = {
    val inner = pagerank(k)
    // re-sort the ranked output by (rank desc, id asc) — reference printTop
    // tie-break (PageRank-constants.h:61-65, reverse-iterated map emits the
    // smaller id first on equal values) — and keep 20.
    s"""SELECT id, rank_n FROM ($inner) AS r
       |ORDER BY rank_n DESC, id ASC LIMIT 20""".stripMargin
  }

  /** k unrolled min-label rounds; `sym` picks the edge orientation. */
  private def minLabelRounds(k: Int, sym: Boolean, outCol: String): String = {
    val src = if (sym) S else E
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT p.id, LEAST(p.c, COALESCE(m.mc, p.c)) AS c
         |  FROM s${i - 1} p
         |  LEFT JOIN (
         |    SELECT e.dst AS id, MIN(s.c) AS mc
         |    FROM edges e JOIN s${i - 1} s ON e.src = s.id
         |    GROUP BY e.dst) m ON p.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($src),
       |v AS MATERIALIZED (${verts("edges")}),
       |s0 AS MATERIALIZED (SELECT id, id AS c FROM v),
       |$iters
       |SELECT id, c AS $outCol FROM s$k ORDER BY id""".stripMargin
  }

  /** CC: min-label over the symmetrized graph; 20 rounds ≫ diameter at the
    * driver's scales (fixpoint is asserted in the test suite). */
  def cc(k: Int = 20): String = minLabelRounds(k, sym = true, "comp")

  def ccSizes(k: Int = 20): String =
    s"""SELECT comp, CAST(COUNT(*) AS BIGINT) AS size
       |FROM (${cc(k)}) AS c GROUP BY comp ORDER BY comp""".stripMargin

  /** LPA min-combine over the DIRECTED graph, k rounds. */
  def lpaMin(k: Int): String = minLabelRounds(k, sym = false, "label")

  /** LPA mode-combine (ties → smaller label), k rounds, directed. */
  def lpaMode(k: Int): String = {
    val iters = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT p.id, COALESCE(w.msg, p.label) AS label
         |  FROM s${i - 1} p
         |  LEFT JOIN (
         |    SELECT id, msg FROM (
         |      SELECT e.dst AS id, s.label AS msg, COUNT(*) AS cnt,
         |             ROW_NUMBER() OVER (PARTITION BY e.dst
         |               ORDER BY COUNT(*) DESC, s.label ASC) AS rn
         |      FROM edges e JOIN s${i - 1} s ON e.src = s.id
         |      GROUP BY e.dst, s.label) t
         |    WHERE rn = 1) w ON p.id = w.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED ($E),
       |v AS MATERIALIZED (${verts("edges")}),
       |s0 AS MATERIALIZED (SELECT id, id AS label FROM v),
       |$iters
       |SELECT id, label FROM s$k ORDER BY id""".stripMargin
  }

  /** One level of unrolled weighted Louvain local-move CTEs (mirrors
    * graft.operators.Louvain.localMoveRoundsWeighted): integer score
    * 2m·e − k·(Σtot − [cand=c]·k) with e = Σw into the candidate
    * community (self-loops excluded), alternating direction rule (odd
    * rounds cand ≤ c, even rounds cand ≥ c), ties → smaller community.
    * `p` prefixes the CTE names; `e`/`deg` name the weighted edge and
    * degree CTEs; states are `${p}0 … ${p}k`. */
  private def louvainLevel(p: String, e: String, deg: String,
      k: Int): String =
    (1 to k).map { i =>
      s"""${p}sig$i AS MATERIALIZED (
         |  SELECT s.c, CAST(SUM(d.k) AS BIGINT) AS tot
         |  FROM $p${i - 1} s JOIN $deg d ON s.id = d.id GROUP BY s.c),
         |${p}cand$i AS MATERIALIZED (
         |  SELECT id, cand, CAST(SUM(e) AS BIGINT) AS e FROM (
         |    SELECT e.src AS id, s.c AS cand, CAST(SUM(e.w) AS BIGINT) AS e
         |    FROM $e e JOIN $p${i - 1} s ON e.dst = s.id
         |    WHERE e.src <> e.dst
         |    GROUP BY e.src, s.c
         |    UNION ALL
         |    SELECT id, c AS cand, 0 AS e FROM $p${i - 1}) u
         |  GROUP BY id, cand),
         |${p}sc$i AS MATERIALIZED (
         |  SELECT cd.id, cd.cand,
         |    CAST((SELECT tot FROM m2) * cd.e
         |      - d.k * (g.tot - CASE WHEN cd.cand = s.c THEN d.k ELSE 0 END)
         |      AS BIGINT) AS score
         |  FROM ${p}cand$i cd
         |  JOIN $p${i - 1} s ON cd.id = s.id
         |  JOIN $deg d ON cd.id = d.id
         |  JOIN ${p}sig$i g ON cd.cand = g.c
         |  WHERE cd.cand ${if (i % 2 == 1) "<=" else ">="} s.c),
         |$p$i AS MATERIALIZED (
         |  SELECT id, cand AS c FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY id
         |      ORDER BY score DESC, cand ASC) AS rn FROM ${p}sc$i) z
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private val louvainBase: String =
    s"""edges AS MATERIALIZED ($S),
       |e1 AS MATERIALIZED (
       |  SELECT src, dst, CAST(1 AS BIGINT) AS w FROM edges),
       |deg1 AS MATERIALIZED (
       |  SELECT src AS id, CAST(SUM(w) AS BIGINT) AS k FROM e1 GROUP BY src),
       |m2 AS (SELECT CAST(SUM(k) AS BIGINT) AS tot FROM deg1),
       |a0 AS MATERIALIZED (SELECT id, id AS c FROM deg1)""".stripMargin

  /** k unrolled local-move rounds (single level). */
  def louvain(k: Int): String =
    s"""WITH $louvainBase,
       |${louvainLevel("a", "e1", "deg1", k)}
       |SELECT id, c AS community FROM a$k ORDER BY id""".stripMargin

  /** Two Louvain levels: r1 local-move rounds, aggregation into the
    * weighted community graph (self-loops carry internal mass; 2m is
    * invariant under coarsening), r2 rounds on it, projection back. */
  def louvainTwoLevel(r1: Int, r2: Int): String =
    s"""WITH $louvainBase,
       |${louvainLevel("a", "e1", "deg1", r1)},
       |coarse AS MATERIALIZED (
       |  SELECT x.c AS src, y.c AS dst, CAST(SUM(e.w) AS BIGINT) AS w
       |  FROM e1 e
       |  JOIN a$r1 x ON e.src = x.id
       |  JOIN a$r1 y ON e.dst = y.id
       |  GROUP BY x.c, y.c),
       |deg2 AS MATERIALIZED (
       |  SELECT src AS id, CAST(SUM(w) AS BIGINT) AS k
       |  FROM coarse GROUP BY src),
       |b0 AS MATERIALIZED (SELECT id, id AS c FROM deg2),
       |${louvainLevel("b", "coarse", "deg2", r2)}
       |SELECT a.id, b.c AS community
       |FROM a$r1 a JOIN b$r2 b ON a.c = b.id ORDER BY a.id""".stripMargin

  val triangles: String =
    s"""WITH edges AS MATERIALIZED ($S),
       |o AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst)
       |SELECT CAST(COUNT(*) AS BIGINT) AS triangles
       |FROM o e1
       |JOIN o e2 ON e1.dst = e2.src
       |JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin

  /** k-clique count over the id-oriented undirected edge set. The count
    * is orientation-invariant (a clique has exactly one topological
    * order under ANY acyclic orientation), so the engine's degree
    * orientation and this oracle's id orientation agree. Join cascade
    * mirrors Mining.kcliques: one proposal join per new vertex plus the
    * membership joins for all earlier members. */
  def kclique(k: Int): String = {
    def v(i: Int) =
      if (i == 1) "p_1_2.src"
      else if (i == 2) "p_1_2.dst"
      else s"p_${i - 1}_$i.dst"
    val joins = (3 to k).flatMap { i =>
      s"JOIN o p_${i - 1}_$i ON p_${i - 1}_$i.src = ${v(i - 1)}" +:
        (1 to i - 2).map { j =>
          s"JOIN o p_${j}_$i ON p_${j}_$i.src = ${v(j)} " +
            s"AND p_${j}_$i.dst = p_${i - 1}_$i.dst"
        }
    }.mkString("\n")
    s"""WITH edges AS MATERIALIZED ($S),
       |o AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst)
       |SELECT CAST(COUNT(*) AS BIGINT) AS cliques
       |FROM o p_1_2
       |$joins""".stripMargin
  }

  /** 3-vertex connected-motif census: wedges = Σ d(d−1)//2 over
    * undirected degrees (exact: the sum is even), triangles via the
    * oriented two-join, open wedges = wedges − 3·triangles. */
  val motif3: String =
    s"""WITH edges AS MATERIALIZED ($S),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
       |        FROM edges GROUP BY src),
       |w AS (SELECT CAST(COALESCE(SUM(d * (d - 1)), 0) AS BIGINT) // 2
       |        AS wedges FROM deg),
       |o AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
       |      FROM o e1 JOIN o e2 ON e1.dst = e2.src
       |      JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst)
       |SELECT w.wedges, t.triangles,
       |       CAST(w.wedges - 3 * t.triangles AS BIGINT) AS open_wedges
       |FROM w, t""".stripMargin

  val trianglesPerVertex: String =
    s"""WITH edges AS MATERIALIZED ($S),
       |v AS MATERIALIZED (${verts("edges")}),
       |o AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst),
       |tr AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |       FROM o e1
       |       JOIN o e2 ON e1.dst = e2.src
       |       JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst),
       |cr AS (SELECT id, COUNT(*) AS cnt FROM (
       |         SELECT a AS id FROM tr
       |         UNION ALL SELECT b AS id FROM tr
       |         UNION ALL SELECT c AS id FROM tr) u GROUP BY id)
       |SELECT v.id, CAST(COALESCE(cr.cnt, 0) AS BIGINT) AS triangles
       |FROM v LEFT JOIN cr ON v.id = cr.id ORDER BY v.id""".stripMargin
}
