package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-truss — the reference's `k-truss` Lonestar app
 * (lonestar/analytics/cpu/k-truss/K-Truss.cpp:40-53, "Computes the
 * maximal k-trusses for a given undirected graph"; SURVEY.md §2.6):
 * iteratively remove edges supported by fewer than k−2 triangles in the
 * surviving subgraph. Works on the upper-oriented form (one row per
 * undirected edge); each round enumerates triangles with the same
 * degree-bounded two-join shape as [[Triangles]], explodes each triangle
 * into its three edges for a grouped support count, then semi-joins the
 * survivors. O(triangles) per round over a shrinking edge set.
 */
object KTruss {

  /** (src, dst, sup): per surviving edge, its triangle support. */
  private def support(o: DataFrame): DataFrame = {
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("b"), col("dst").as("c"))
    val e3 = o.select(col("src").as("a"), col("dst").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    tri.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("c").as("dst")),
        struct(col("a").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("sup"))
  }

  /** Exactly `rounds` support-peel rounds at truss number k (the
    * SQL-oracle kernel): surviving undirected edges as (src < dst). */
  def fixedRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var o = GraphOps.orientUpper(edges).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = support(o).filter(col("sup") >= k - 2).select("src", "dst")
      o = o.join(keep, Seq("src", "dst"), "left_semi").localCheckpoint(true)
    }
    o
  }

  /** Peel to fixpoint: (maximal k-truss edges, rounds). */
  def run(edges: DataFrame, k: Int, maxIter: Int = 1000): (DataFrame, Int) = {
    var o = GraphOps.orientUpper(edges).localCheckpoint(true)
    var alive = o.count()
    var prev = Long.MaxValue
    var rounds = 0
    while (alive != prev && alive > 0 && rounds < maxIter) {
      prev = alive
      val keep = support(o).filter(col("sup") >= k - 2).select("src", "dst")
      val obs = org.apache.spark.sql.Observation(s"ktruss_$rounds")
      o = o.join(keep, Seq("src", "dst"), "left_semi")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      alive = obs.get.get("n") match { case Some(l: Long) => l; case _ => 0L }
      rounds += 1
    }
    (o, rounds)
  }
}
