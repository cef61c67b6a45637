package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core decomposition membership — the reference's `k-core` Lonestar app
 * (lonestar/analytics/cpu/k-core/kcore.cpp:41-50, Async/Sync peel;
 * SURVEY.md §2.6): iteratively remove vertices whose degree in the
 * SURVIVING subgraph is < k, to fixpoint; what remains is the k-core.
 * Input must be a symmetric edge table (degree = out-degree there, like
 * the reference's symmetricGraph requirement).
 *
 * Each peel round is one degree aggregate + two semi-joins over the
 * surviving edges — O(E_alive), shrinking every round; the surviving
 * edge count rides the materializing pass via observe.
 */
object KCore {

  private def peel(edges: DataFrame, k: Int): DataFrame = {
    val keep = edges.groupBy("src").agg(count(lit(1)).as("d"))
      .filter(col("d") >= k).select(col("src").as("id"))
    edges
      .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst")
  }

  /** Exactly `rounds` peel rounds (the SQL-oracle kernel): surviving
    * (id, deg) in the subgraph after the last round. A round that
    * removes no edge is a fixpoint — every later round is the identity —
    * so the loop exits early (observe on the materializing pass, no
    * extra scan); the result still equals the full k-round unroll. */
  def fixedRounds(symEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = symEdges.localCheckpoint(true)
    var alive = -1L
    var done = false
    for (r <- 1 to rounds if !done) {
      val obs = org.apache.spark.sql.Observation(s"kcore_f_$r")
      edges = peel(edges, k)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      val n = obs.get.get("n") match { case Some(l: Long) => l; case _ => 0L }
      done = n == alive || n == 0L
      alive = n
    }
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Peel to fixpoint: (k-core members (id, deg), rounds). */
  def run(symEdges: DataFrame, k: Int, maxIter: Int = 10000): (DataFrame, Int) = {
    var edges = symEdges.localCheckpoint(true)
    var alive = edges.count()
    var prev = Long.MaxValue
    var rounds = 0
    while (alive != prev && alive > 0 && rounds < maxIter) {
      prev = alive
      val obs = org.apache.spark.sql.Observation(s"kcore_$rounds")
      edges = peel(edges, k)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      alive = obs.get.get("n") match { case Some(l: Long) => l; case _ => 0L }
      rounds += 1
    }
    (edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")), rounds)
  }
}
