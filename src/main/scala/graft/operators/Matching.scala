package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Maximal matching — the reference's `matching` Lonestar app
 * (lonestar/analytics/cpu/matching/, 1222 LoC; SURVEY.md §2.6), as
 * deterministic Luby-style rounds on EDGES: a remaining edge enters the
 * matching when its (hash, src, dst) priority beats every remaining edge
 * sharing an endpoint; both endpoints of matched edges then leave. The
 * hash is a plain integer polynomial, so rounds are reproducible and the
 * unrolled SQL oracle matches exactly. Works on the upper-oriented
 * undirected edge set (one row per edge).
 *
 * "Beats every adjacent edge" is evaluated WITHOUT an edge-to-edge
 * self-join (which is Σ deg² rows — quadratic at hubs): an edge wins iff
 * its priority equals the MIN priority at BOTH endpoints, so each round
 * is one endpoint explode + one grouped struct-min + two equi-joins,
 * O(E_remaining) flat. Priorities are unique (they embed (src, dst)), so
 * the min test is exactly the strictly-beats-all-neighbors test.
 */
object Matching {

  /** Engine-neutral edge priority hash (mirrored in the SQL oracle). */
  private def h(src: Column, dst: Column): Column =
    pmod((src % lit(1000003L)) * lit(1000033L) + (dst % lit(1000003L)),
      lit(4294967296L))

  /** One round: (winning edges — materialized, next remaining — lazy). */
  private def round(remaining: DataFrame): (DataFrame, DataFrame) = {
    val withP = remaining.select(col("src"), col("dst"),
      struct(h(col("src"), col("dst")).as("p"),
        col("src").as("s"), col("dst").as("d")).as("prio"))
    val inc = withP.select(col("prio"),
      explode(array(col("src"), col("dst"))).as("v"))
    val vmin = inc.groupBy("v").agg(min(col("prio")).as("m"))
    val winners = withP
      .join(vmin.select(col("v").as("src"), col("m").as("ms")), "src")
      .join(vmin.select(col("v").as("dst"), col("m").as("md")), "dst")
      .filter(col("prio") === col("ms") && col("prio") === col("md"))
      .select("src", "dst")
      .localCheckpoint(true)
    val matchedV = winners.select(col("src").as("id"))
      .unionAll(winners.select(col("dst").as("id"))).distinct()
    val next = remaining
      .join(matchedV.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(matchedV.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .select("src", "dst")
    (winners, next)
  }

  /** Exactly `rounds` rounds (the SQL-oracle kernel): matched edges so
    * far as (src < dst). */
  def fixedRounds(edges: DataFrame, rounds: Int): DataFrame =
    fixedRoundsOriented(GraphOps.orientUpper(edges), rounds)

  /** [[fixedRounds]] over an ALREADY upper-canonical duplicate-free edge
    * set (src < dst, one row per undirected edge) — skips the
    * symmetrize+dedup exchange for callers (Bipart's coarsening, the
    * suite) whose input is canonical by construction; orientUpper is the
    * identity on such input. */
  def fixedRoundsOriented(upper: DataFrame, rounds: Int): DataFrame = {
    val spark = upper.sparkSession
    import spark.implicits._
    var remaining = upper.select("src", "dst").localCheckpoint(true)
    var matched = Seq.empty[(Long, Long)].toDF("src", "dst")
    var drained = false
    for (r <- 1 to rounds if !drained) {
      val (winners, next) = round(remaining)
      matched = matched.unionAll(winners)
      // rounds over a drained edge set are no-ops — skip them (observe
      // rides the materializing pass; result equals the full unroll).
      // After the FINAL round nothing consumes `remaining` — skip that
      // materialization outright.
      if (r < rounds) {
        val obs = org.apache.spark.sql.Observation()
        remaining = next.observe(obs, count(lit(1)).as("n"))
          .localCheckpoint(true)
        drained = (obs.get.get("n") match {
          case Some(l: Long) => l
          case _             => 0L
        }) == 0L
      }
    }
    matched
  }

  /** To a drained edge set: (the maximal matching, rounds). */
  def run(edges: DataFrame, maxIter: Int = 1000): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    var remaining = GraphOps.orientUpper(edges).localCheckpoint(true)
    var left = remaining.count()
    var rounds = 0
    var matched = Seq.empty[(Long, Long)].toDF("src", "dst")
    while (left > 0 && rounds < maxIter) {
      val (winners, next) = round(remaining)
      matched = matched.unionAll(winners)
      val obs = org.apache.spark.sql.Observation(s"matching_$rounds")
      remaining = next.observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      left = obs.get.get("n") match { case Some(l: Long) => l; case _ => 0L }
      rounds += 1
    }
    (matched, rounds)
  }
}
