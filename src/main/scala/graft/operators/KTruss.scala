package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * k-truss — the reference's `k-truss` Lonestar app
 * (lonestar/analytics/cpu/k-truss/K-Truss.cpp:40-53, "Computes the
 * maximal k-trusses for a given undirected graph"; SURVEY.md §2.6):
 * iteratively remove edges supported by fewer than k−2 triangles in the
 * surviving subgraph.
 *
 * Representation: each surviving undirected edge is carried CANONICALLY
 * as (lo, hi, fwd) with lo < hi by id and `fwd` recording the DEGREE
 * orientation (lower-(degree, id) endpoint first, like
 * [[Triangles.orientByDegree]] — hubs get small out-lists, which bounds
 * the per-key groups of the triangle self-joins, the skew concern at web
 * scale). The degree-oriented view used for triangle enumeration is a
 * projection of (lo, hi, fwd), so support counting and survivor
 * filtering are both plain equi-joins on (lo, hi): the survivor set and
 * the grouped support table share one hash partitioning that is STABLE
 * across rounds (r3 carried oriented (src, dst) and joined on
 * least/greatest expression keys, which re-shuffled both sides every
 * round — measured 1.8x slower at sf0.1). O(triangles) per round over a
 * shrinking edge set.
 */
object KTruss {

  /** Canonical form of a degree-oriented edge set: (lo, hi, fwd),
    * lo < hi, fwd = (oriented source == lo), hash-partitioned on
    * (lo, hi) — the partitioning every round's joins reuse. */
  private def canonical(oriented: DataFrame): DataFrame =
    oriented.select(
      least(col("src"), col("dst")).as("lo"),
      greatest(col("src"), col("dst")).as("hi"),
      (col("src") < col("dst")).as("fwd"))
      .repartition(col("lo"), col("hi"))

  /** The degree-oriented (src, dst) view of the canonical set. */
  private def orientedView(o: DataFrame): DataFrame =
    o.select(
      when(col("fwd"), col("lo")).otherwise(col("hi")).as("src"),
      when(col("fwd"), col("hi")).otherwise(col("lo")).as("dst"))

  /** (lo, hi, sup): per surviving edge, its triangle support in the
    * surviving subgraph. Triangle enumeration rides the degree-oriented
    * view; each triangle explodes into its three canonical edges for one
    * grouped count, so the output is hash-partitioned on (lo, hi). */
  private def support(o: DataFrame): DataFrame = {
    val d = orientedView(o)
    val e1 = d.select(col("src").as("a"), col("dst").as("b"))
    val e2 = d.select(col("src").as("b"), col("dst").as("c"))
    val e3 = d.select(col("src").as("a"), col("dst").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    def edgeKey(x: Column, y: Column) =
      struct(least(x, y).as("lo"), greatest(x, y).as("hi"))
    tri.select(explode(array(
        edgeKey(col("a"), col("b")),
        edgeKey(col("b"), col("c")),
        edgeKey(col("a"), col("c")))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("sup"))
  }

  /** Keep the survivors whose support clears k−2. A LEFT join with
    * coalesce(sup, 0) — not a semi-join against the filtered support set:
    * [[support]] emits rows only for edges in ≥1 triangle, so a semi-join
    * would drop zero-support edges even when k ≤ 2 (where sup ≥ k−2 holds
    * at 0 and the 2-truss is the whole graph). Both sides are (lo, hi)
    * keyed, so this is one co-partitioned equi-join. */
  private def keepAlive(o: DataFrame, sup: DataFrame, k: Int): DataFrame =
    o.join(sup, Seq("lo", "hi"), "left")
      .filter(coalesce(col("sup"), lit(0L)) >= k - 2)
      .select(col("lo"), col("hi"), col("fwd"))

  /** Exactly `rounds` support-peel rounds at truss number k (the
    * SQL-oracle kernel): surviving undirected edges as (src < dst). */
  def fixedRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var o = canonical(Triangles.orientByDegree(edges)).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      o = keepAlive(o, support(o), k).localCheckpoint(true)
    }
    o.select(col("lo").as("src"), col("hi").as("dst"))
  }

  /** Peel to fixpoint: (maximal k-truss edges as (src < dst), rounds). */
  def run(edges: DataFrame, k: Int, maxIter: Int = 1000): (DataFrame, Int) = {
    var o = canonical(Triangles.orientByDegree(edges)).localCheckpoint(true)
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
    (o.select(col("lo").as("src"), col("hi").as("dst")), rounds)
  }
}
