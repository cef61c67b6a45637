package graft.operators

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

  /** k-clique count (the kcl.cpp headline number). */
  def kcliqueCount(edges: DataFrame, k: Int): Long = kcliques(edges, k).count()

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
    val triangles = Triangles.count(sym)
    Seq((wedges, triangles, wedges - 3 * triangles))
      .toDF("wedges", "triangles", "open_wedges")
  }
}
