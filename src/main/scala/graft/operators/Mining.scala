package graft.operators

import graft.functions.SortedArrays
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph-mining kernels — the reference's libpangolin-based Lonestar
 * mining apps (lonestar/mining/cpu/k-clique-listing/kcl.cpp:1-39 and
 * lonestar/mining/cpu/motif-counting/motif.cpp:1-37; SURVEY.md §2.6).
 * The pangolin runtime grows per-thread embedding worklists; the BSP
 * re-expression is the standard oriented-join cascade over the
 * degree-ordered edge set that triangle counting already uses
 * ([[Triangles.orientByDegree]]): any acyclic orientation lists each
 * k-clique exactly once (a clique has exactly one topological order),
 * and orienting from the lower-(degree, id) endpoint bounds every
 * join's per-key group by the largest oriented out-list — the hub-skew
 * guard at web scale.
 *
 * Cost shape: extending i-cliques to (i+1)-cliques is one equi-join to
 * propose the extension vertex plus (i−2) membership equi-joins to
 * verify the remaining edges — all shuffle hash joins over the oriented
 * edge set, no driver-side state, embedding count bounded by the true
 * clique count times the proposal fan-out (itself bounded by oriented
 * out-degree).
 */
object Mining {

  /** All k-cliques of the (cleaned, symmetrized) graph, one row per
    * clique as (v1 … vk) in degree-orientation order. k ≥ 2. */
  def kcliques(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"clique order must be >= 2, got $k")
    val o = Triangles.orientByDegree(edges).localCheckpoint(true)
    var cur = o.select(col("src").as("v1"), col("dst").as("v2"))
    for (i <- 3 to k) {
      // propose v_i along an oriented edge out of v_{i-1} …
      cur = cur.join(
        o.select(col("src").as(s"v${i - 1}"), col("dst").as(s"v$i")),
        s"v${i - 1}")
      // … then verify the edge from every earlier member (the join-on-
      // both-endpoints against the duplicate-free edge set is an exact
      // membership test: it matches at most one row and adds no columns)
      for (j <- 1 to i - 2) {
        cur = cur.join(
          o.select(col("src").as(s"v$j"), col("dst").as(s"v$i")),
          Seq(s"v$j", s"v$i"))
      }
    }
    cur.select((1 to k).map(i => col(s"v$i")): _*)
  }

  /** k-clique count (the kcl.cpp headline number) — computed kClist-
    * style rather than by counting [[kcliques]] rows: the flat join
    * cascade materializes every (i-clique × proposal) row through a
    * shuffle, which on a dense graph is billions of rows by k = 5
    * (measured 20 minutes at sf0.1). Here each (i)-prefix carries its
    * pruned CANDIDATE SET C_i = N⁺(v1)∩…∩N⁺(vi) as a sorted array
    * column, so each extension is explode + one broadcast-joined
    * `array_intersect` (codegen'd) and the row count stays at the true
    * clique-prefix count — the candidate arrays shrink monotonically
    * toward the clique, never re-expanding to full out-lists. Out-lists
    * are bounded by the degree orientation (the hub-skew guard), so the
    * arrays stay small at web scale. */
  def kcliqueCount(edges: DataFrame, k: Int): Long = {
    require(k >= 2, s"clique order must be >= 2, got $k")
    val o = Triangles.orientByDegree(edges).localCheckpoint(true)
    if (k == 2) return o.count()
    val olist = o.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .localCheckpoint(true)
    // out-lists are V-sized (bounded by the orientation); broadcast
    // them while that fits so every extension stays in one codegen
    // stage with no exchange of the (huge) prefix stream
    val ol = if (olist.count() <= (1L << 22)) broadcast(olist) else olist
    // C2 = N⁺(u) ∩ N⁺(v) per oriented edge; a vertex with no out-list
    // contributes an empty intersection, so inner joins dropping it are
    // exact for counting. Intersections are the codegen'd sorted merge
    // (SortedArrays) — array_intersect's per-row hash set was measured
    // at 200+ s of allocation for the 15M-triangle extension at sf0.1.
    val withLists = o
      .join(ol.select(col("src"), col("nbrs").as("nu")), "src")
      .join(ol.select(col("src").as("dst"), col("nbrs").as("nv")), "dst")
    if (k == 3)
      return withLists.agg(coalesce(sum(
          SortedArrays.intersectCount(col("nu"), col("nv"))), lit(0L)))
        .first().getLong(0)
    var cur = withLists
      .select(SortedArrays.intersect(col("nu"), col("nv")).as("cand"))
    for (_ <- 5 to k) // middle extensions still need the candidate SET
      cur = cur.select(explode(col("cand")).as("w"), col("cand"))
        .join(ol.select(col("src").as("w"), col("nbrs").as("nw")), "w")
        .select(SortedArrays.intersect(col("cand"), col("nw")).as("cand"))
    // final extension only needs the count — zero-allocation merge
    cur.select(explode(col("cand")).as("w"), col("cand"))
      .join(ol.select(col("src").as("w"), col("nbrs").as("nw")), "w")
      .agg(coalesce(sum(
        SortedArrays.intersectCount(col("cand"), col("nw"))), lit(0L)))
      .first().getLong(0)
  }

  /** Frequent subgraph mining over a vertex-labeled graph — the
    * reference's fsm.cpp (pangolin edge_miner, BFS pattern extension
    * with MNI domain support). Labels are lab(v) = v % `numLabels`
    * (deterministic, oracle-able). Pangolin ENUMERATES embeddings and
    * builds per-position domains; at web scale the embedding set of even
    * a wedge pattern is Σd² — so this engine computes the EXACT MNI
    * domains directly with O(E) grouped aggregates and never
    * materializes an embedding (the ScaleMine/DistGraph-style
    * formulation): a vertex is in a position's domain iff its local
    * neighborhood label counts satisfy the pattern, which for 1-edge and
    * 2-edge (wedge) patterns is a per-vertex predicate.
    *
    * Single-edge patterns (l1 ≤ l2): dom(l1-side) = #{u : lab u = l1,
    * ∃ nbr with lab l2}; support = min of the two sides (= both for
    * l1 = l2). */
  def fsmEdge(edges: DataFrame, minSupport: Long,
      numLabels: Int = 4): DataFrame = {
    val el = GraphOps.symmetrize(edges)
      .select((col("src") % numLabels).as("ls"),
        (col("dst") % numLabels).as("ld"), col("src"))
    val d = el.groupBy("ls", "ld").agg(countDistinct(col("src")).as("n"))
    d.join(d.select(col("ls").as("ld"), col("ld").as("ls"),
        col("n").as("n2")), Seq("ls", "ld"))
      .filter(col("ls") <= col("ld"))
      .select(col("ls").as("l1"), col("ld").as("l2"),
        least(col("n"), col("n2")).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** Wedge (2-edge path) patterns (lc; l1 ≤ l2): center domain =
    * centers with lab lc holding ≥1 l1-neighbor and ≥1 l2-neighbor
    * (≥2 distinct l1-neighbors when l1 = l2); endpoint domain on the
    * l1 side = l1-labeled vertices adjacent to a center of lab lc that
    * can still supply the OTHER endpoint (so for l1 = l2 the center
    * needs a second same-label neighbor). Support = min of the three
    * domains. */
  def fsmWedge(edges: DataFrame, minSupport: Long,
      numLabels: Int = 4): DataFrame = {
    val sym = GraphOps.symmetrize(edges).localCheckpoint(true)
    // nc(c, l) = # distinct neighbors of c carrying label l
    val nc = sym.groupBy(col("src").as("c"),
        (col("dst") % numLabels).as("l"))
      .agg(countDistinct(col("dst")).as("cnt"))
      .localCheckpoint(true)
    // center domains per (lc, l1, l2): a self-join of nc on the center;
    // l1 = l2 needs cnt ≥ 2 on the single row
    val centers = nc.as("a")
      .join(nc.as("b"), col("a.c") === col("b.c") &&
        (col("a.l") < col("b.l") ||
          (col("a.l") === col("b.l") && col("a.cnt") >= 2)))
      .groupBy((col("a.c") % numLabels).as("lc"),
        col("a.l").as("l1"), col("b.l").as("l2"))
      .agg(countDistinct(col("a.c")).as("domc"))
    // endpoint domain, l1 side: u --(edge)-- c where c still has the l2
    // endpoint available (cnt ≥ 2 if u's label IS l2's label)
    def endpointDom(flip: Boolean): DataFrame = {
      val need = when(col("lu") === col("l"), 2L).otherwise(1L)
      sym.select(col("src").as("u"), (col("src") % numLabels).as("lu"),
          col("dst").as("c"))
        .join(nc, "c")
        .filter(col("cnt") >= need)
        .groupBy((col("c") % numLabels).as("lc"),
          (if (flip) col("l") else col("lu")).as("l1"),
          (if (flip) col("lu") else col("l")).as("l2"))
        .agg(countDistinct(col("u")).as(if (flip) "dom2" else "dom1"))
        .filter(col("l1") <= col("l2"))
    }
    centers
      .join(endpointDom(flip = false), Seq("lc", "l1", "l2"))
      .join(endpointDom(flip = true), Seq("lc", "l1", "l2"))
      .select(col("lc"), col("l1"), col("l2"),
        least(col("domc"), col("dom1"), col("dom2")).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** 3-vertex connected-motif census (motif.cpp's k=3 default): wedges
    * (paths of length 2, Σ_v C(d_v, 2) over undirected degrees),
    * triangles, and open wedges (wedges − 3·triangles — each triangle
    * closes three wedges). One row (wedges, triangles, open_wedges). */
  def motif3(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = GraphOps.symmetrize(edges)
    val wedgeRow = sym.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1)), lit(0L))).first()
    // Σ d(d−1) is even by construction; halve driver-side so both
    // engines do exact integer division
    val wedges = wedgeRow.getLong(0) / 2
    // count() symmetrizes internally — pass the directed table so the
    // orientation joins read E rows, not the 2E symmetrized copy
    val triangles = Triangles.count(edges)
    Seq((wedges, triangles, wedges - 3 * triangles))
      .toDF("wedges", "triangles", "open_wedges")
  }
}
