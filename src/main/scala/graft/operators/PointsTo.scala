package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Andersen-style inclusion-based points-to analysis — the reference's
 * pointstoanalysis app (lonestar/analytics/cpu/pointstoanalysis/
 * PointsTo.cpp:77-430): four constraint kinds over a variable space,
 *
 *   AddressOf p = &o   → o ∈ pts(p)                 (seed facts)
 *   Copy      p = q    → pts(p) ⊇ pts(q)            (static copy edge q→p)
 *   Load      p = *q   → ∀ o ∈ pts(q): pts(p) ⊇ pts(o)   (dynamic edges)
 *   Store     *p = q   → ∀ o ∈ pts(p): pts(o) ⊇ pts(q)
 *
 * solved to a least fixpoint. The reference worklist (PointsTo.cpp
 * processLoadStore / processAddressOfCopy) is order-dependent but the
 * FIXPOINT is not, so the BSP form is semi-naive Datalog: each round
 * first GROWS the copy-edge graph from the load/store constraints joined
 * against the current pts relation, then propagates pts one step along
 * all copy edges — two hash joins + distinct per round, converging to
 * the identical least model. (The reference's online cycle detection
 * `ocd` is a worklist-throughput optimization that collapses
 * pts-equivalent cycles; it never changes the solution, so the engine
 * skips it — Spark's per-round full joins don't suffer the per-node
 * revisit cost it exists to curb.)
 *
 * Scale shape: pts and copy are both (long, long) relations carried as
 * distinct-deduped DataFrames; every round is equi-joins on the first
 * column — AQE handles the growth skew, and the distinct is the same
 * shuffle the join already needs. Fixed-round form for the SQL oracle;
 * `solve` iterates to convergence with one count action per round.
 */
object PointsTo {

  /** Eager checkpoint with CAPPED size statistics (see GraftPlanBridge:
    * per-round joins multiply Catalyst's size-only estimate; capping the
    * checkpointed leaf keeps the driver out of giant-BigInteger
    * arithmetic over many rounds). */
  private def ck(df: DataFrame): DataFrame =
    org.apache.spark.sql.GraftPlanBridge.checkpointCapped(df)


  /** One SEMI-NAIVE round: new copy edges derive only from the pts
    * DELTA (facts first seen last round), and propagation joins the
    * delta against the full relation on each side — never full × full:
    *
    *   Δcopy_r = f(Δpts_{r-1}) − copy_{r-1}
    *   prop    = copy_r ⋈ Δpts_{r-1}  ∪  Δcopy_r ⋈ pts_{r-1}
    *   Δpts_r  = prop − pts_{r-1}
    *
    * Per-round sets are IDENTICAL to the naive form (f and the
    * propagation are ∪-distributive, and every full×full term is
    * already contained in the previous round's result — the standard
    * semi-naive argument), so the fixed-round oracle is unchanged; the
    * per-round work now shrinks with the frontier instead of
    * re-deriving every prior fact.
    * Returns (pts', Δpts', copy', Δcopy'). */
  private def round(pts: DataFrame, dPts: DataFrame, copy: DataFrame,
      loads: DataFrame, stores: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // Load q→p: every NEW pointee o of q becomes a copy source into p
    val fromLoads = loads
      .join(dPts.withColumnRenamed("var", "q"), "q")
      .select(col("obj").as("src"), col("p").as("dst"))
    // Store q→p: q copies into every NEW pointee o of p
    val fromStores = stores
      .join(dPts.withColumnRenamed("var", "p"), "p")
      .select(col("q").as("src"), col("obj").as("dst"))
    val dCopy = fromLoads.unionByName(fromStores).distinct()
      .join(copy, Seq("src", "dst"), "left_anti")
    val copy2 = copy.unionByName(dCopy)
    // propagate: full copy over the pts delta + the copy delta over the
    // (previous) full pts — Δcopy ⋈ Δpts is covered by the first term
    val prop = copy2
      .join(dPts.withColumnRenamed("var", "src"), "src")
      .select(col("dst").as("var"), col("obj"))
      .unionByName(dCopy
        .join(pts.withColumnRenamed("var", "src"), "src")
        .select(col("dst").as("var"), col("obj")))
    val dPts2 = prop.distinct().join(pts, Seq("var", "obj"), "left_anti")
    (pts.unionByName(dPts2), dPts2, copy2, dCopy)
  }

  /** Exactly `rounds` BSP rounds (the oracle shape): pts as (var, obj). */
  def fixedRounds(addressOf: DataFrame, copies: DataFrame,
      loads: DataFrame, stores: DataFrame, rounds: Int): DataFrame = {
    var pts = addressOf.select(col("var"), col("obj")).distinct()
      .transform(ck)
    var dPts = pts // round 1: everything is new
    var copy = copies.select(col("src"), col("dst")).distinct()
      .transform(ck)
    // only the two DELTAS are materialized per round (concurrently —
    // one latency); the full pts/copy relations stay LAZY unions of the
    // already-checkpointed deltas, so the heavy prop ∪ distinct ∪
    // anti-join pipeline runs once per round instead of twice (the old
    // shape checkpointed pts ∪ Δ and Δ separately, re-deriving Δ's
    // whole dataflow inside both jobs). Union trees over checkpointed
    // leaves stay O(rounds) deep — no lineage blow-up.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      for (_ <- 1 to rounds) {
        val (_, d2, _, dc) = round(pts, dPts, copy, loads, stores)
        val (dF, cF) = (Future(d2.transform(ck)), Future(dc.transform(ck)))
        dPts = Await.result(dF, Duration.Inf)
        val dCopy = Await.result(cF, Duration.Inf)
        pts = pts.unionByName(dPts)
        copy = copy.unionByName(dCopy)
      }
    } finally pool.shutdown()
    pts
  }

  /** Iterate to the least fixpoint. Convergence = the pts DELTA is
    * empty: with Δpts = ∅ the next round derives no copy edges and
    * propagates nothing, and every completed copy⋈pts product is
    * already ⊆ pts (the semi-naive invariant) — so one count action on
    * the (shrinking) delta per round decides termination. */
  def solve(addressOf: DataFrame, copies: DataFrame, loads: DataFrame,
      stores: DataFrame, maxRounds: Int = 50): DataFrame = {
    var pts = addressOf.select(col("var"), col("obj")).distinct()
      .transform(ck)
    var dPts = pts
    var copy = copies.select(col("src"), col("dst")).distinct()
      .transform(ck)
    var it = 0
    var frontier = dPts.count()
    while (frontier > 0 && it < maxRounds) {
      val (_, d2, _, dc) = round(pts, dPts, copy, loads, stores)
      dPts = d2.transform(ck)
      copy = copy.unionByName(dc.transform(ck))
      pts = pts.unionByName(dPts)
      frontier = dPts.count()
      it += 1
    }
    pts
  }

  /** Per-variable pts-set sizes: (var, npts) — the summary the
    * reference prints (PointsTo.cpp printPointsToInfo). */
  def sizes(pts: DataFrame): DataFrame =
    pts.groupBy("var").agg(count(lit(1)).as("npts"))
}
