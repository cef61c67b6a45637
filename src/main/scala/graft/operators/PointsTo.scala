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


  /** One BSP round: (pts, copy) → (pts', copy'). */
  private def round(pts: DataFrame, copy: DataFrame, loads: DataFrame,
      stores: DataFrame): (DataFrame, DataFrame) = {
    // Load q→p: every pointee o of q becomes a copy source into p
    val fromLoads = loads
      .join(pts.withColumnRenamed("var", "q"), "q")
      .select(col("obj").as("src"), col("p").as("dst"))
    // Store q→p: q copies into every pointee o of p
    val fromStores = stores
      .join(pts.withColumnRenamed("var", "p"), "p")
      .select(col("q").as("src"), col("obj").as("dst"))
    val copy2 = copy.unionByName(fromLoads).unionByName(fromStores)
      .distinct()
    // propagate one step along ALL copy edges
    val prop = copy2
      .join(pts.withColumnRenamed("var", "src"), "src")
      .select(col("dst").as("var"), col("obj"))
    val pts2 = pts.unionByName(prop).distinct()
    (pts2, copy2)
  }

  /** Exactly `rounds` BSP rounds (the oracle shape): pts as (var, obj). */
  def fixedRounds(addressOf: DataFrame, copies: DataFrame,
      loads: DataFrame, stores: DataFrame, rounds: Int): DataFrame = {
    var pts = addressOf.select(col("var"), col("obj")).distinct()
      .transform(ck)
    var copy = copies.select(col("src"), col("dst")).distinct()
      .transform(ck)
    for (_ <- 1 to rounds) {
      val (p2, c2) = round(pts, copy, loads, stores)
      pts = p2.transform(ck)
      copy = c2.transform(ck)
    }
    pts
  }

  /** Iterate to the least fixpoint; convergence = neither relation grew.
    * One count action per round (both counts in one agg each — the
    * frames are already checkpointed, so the action is O(rows)). */
  def solve(addressOf: DataFrame, copies: DataFrame, loads: DataFrame,
      stores: DataFrame, maxRounds: Int = 50): DataFrame = {
    var pts = addressOf.select(col("var"), col("obj")).distinct()
      .transform(ck)
    var copy = copies.select(col("src"), col("dst")).distinct()
      .transform(ck)
    var nPts = pts.count()
    var nCopy = copy.count()
    var it = 0
    var grew = true
    while (grew && it < maxRounds) {
      val (p2raw, c2raw) = round(pts, copy, loads, stores)
      val p2 = p2raw.transform(ck)
      val c2 = c2raw.transform(ck)
      val (n2, m2) = (p2.count(), c2.count())
      grew = n2 > nPts || m2 > nCopy
      pts = p2; copy = c2; nPts = n2; nCopy = m2
      it += 1
    }
    pts
  }

  /** Per-variable pts-set sizes: (var, npts) — the summary the
    * reference prints (PointsTo.cpp printPointsToInfo). */
  def sizes(pts: DataFrame): DataFrame =
    pts.groupBy("var").agg(count(lit(1)).as("npts"))
}
