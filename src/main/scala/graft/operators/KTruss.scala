package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-truss — the reference's `k-truss` Lonestar app
 * (lonestar/analytics/cpu/k-truss/K-Truss.cpp:40-53, "Computes the
 * maximal k-trusses for a given undirected graph"; SURVEY.md §2.6):
 * iteratively remove edges supported by fewer than k−2 triangles in the
 * surviving subgraph. Internally the edge set rides in DEGREE orientation
 * (lower-(degree, id) endpoint first, like [[Triangles.orientByDegree]]):
 * hubs then have small out-lists, which bounds the per-key groups of the
 * triangle self-joins — the skew concern at web scale. Support is
 * orientation-independent, so results (and the id-oriented SQL oracle)
 * are unchanged: each triangle explodes into its three edges keyed
 * (least, greatest) for a grouped support count, then a semi-join keeps
 * the survivors. O(triangles) per round over a shrinking edge set.
 */
object KTruss {

  /** (src, dst, sup) with src < dst: per surviving edge, its triangle
    * support in the degree-oriented edge set `o`. */
  private def support(o: DataFrame): DataFrame = {
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("b"), col("dst").as("c"))
    val e3 = o.select(col("src").as("a"), col("dst").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    def edgeKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(least(x, y).as("src"), greatest(x, y).as("dst"))
    tri.select(explode(array(
        edgeKey(col("a"), col("b")),
        edgeKey(col("b"), col("c")),
        edgeKey(col("a"), col("c")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("sup"))
  }

  /** Keep the degree-oriented survivors whose support clears k−2. A LEFT
    * join with coalesce(sup, 0) — not a semi-join against the filtered
    * support set: [[support]] emits rows only for edges in ≥1 triangle, so
    * a semi-join would drop zero-support edges even when k ≤ 2 (where
    * sup ≥ k−2 holds at 0 and the 2-truss is the whole graph). Support
    * keys are id-ordered; `o`'s orientation is not. */
  private def keepAlive(o: DataFrame, sup: DataFrame, k: Int): DataFrame =
    o.join(sup.select(col("src").as("ksrc"), col("dst").as("kdst"),
        col("sup")),
      least(o("src"), o("dst")) === col("ksrc") &&
        greatest(o("src"), o("dst")) === col("kdst"),
      "left")
      .filter(coalesce(col("sup"), lit(0L)) >= k - 2)
      .select(o("src"), o("dst"))

  /** Exactly `rounds` support-peel rounds at truss number k (the
    * SQL-oracle kernel): surviving undirected edges as (src < dst). */
  def fixedRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var o = Triangles.orientByDegree(edges).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      o = keepAlive(o, support(o), k).localCheckpoint(true)
    }
    o.select(least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
  }

  /** Peel to fixpoint: (maximal k-truss edges as (src < dst), rounds). */
  def run(edges: DataFrame, k: Int, maxIter: Int = 1000): (DataFrame, Int) = {
    var o = Triangles.orientByDegree(edges).localCheckpoint(true)
    var alive = o.count()
    var prev = Long.MaxValue
    var rounds = 0
    while (alive != prev && alive > 0 && rounds < maxIter) {
      prev = alive
      val obs = org.apache.spark.sql.Observation(s"ktruss_$rounds")
      o = keepAlive(o, support(o), k)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      alive = obs.get.get("n") match { case Some(l: Long) => l; case _ => 0L }
      rounds += 1
    }
    (o.select(least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst")), rounds)
  }
}
