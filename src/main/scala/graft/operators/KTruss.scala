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

  /** Semi-join the degree-oriented survivors against an id-ordered keep
    * set (support keys are id-ordered; `o`'s orientation is not). */
  private def keepAlive(o: DataFrame, keep: DataFrame): DataFrame =
    o.join(keep,
      least(o("src"), o("dst")) === keep("ksrc") &&
        greatest(o("src"), o("dst")) === keep("kdst"),
      "left_semi")

  /** Exactly `rounds` support-peel rounds at truss number k (the
    * SQL-oracle kernel): surviving undirected edges as (src < dst). */
  def fixedRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var o = Triangles.orientByDegree(edges).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = support(o).filter(col("sup") >= k - 2)
        .select(col("src").as("ksrc"), col("dst").as("kdst"))
      o = keepAlive(o, keep).localCheckpoint(true)
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
      val keep = support(o).filter(col("sup") >= k - 2)
        .select(col("src").as("ksrc"), col("dst").as("kdst"))
      val obs = org.apache.spark.sql.Observation(s"ktruss_$rounds")
      o = keepAlive(o, keep)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      alive = obs.get.get("n") match { case Some(l: Long) => l; case _ => 0L }
      rounds += 1
    }
    (o.select(least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst")), rounds)
  }
}
