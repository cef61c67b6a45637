package graft.operators

import graft.plans.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

final case class ComponentsResult(components: DataFrame, iterations: Int,
    converged: Boolean, metrics: Seq[IterMetric])

/**
 * Connected components via iterative min-label propagation — the
 * reference's LabelPropAlgo (ConnectedComponents.cpp:183-230): init
 * comp = id; each round a vertex whose component label shrank since the
 * last round pushes its label to all neighbors, which keep the minimum;
 * fixpoint when no label changes. Requires a symmetric edge table
 * (ConnectedComponents.cpp:1214-1218) — callers pass
 * `GraphOps.symmetrize(...)`-derived adjacency.
 *
 * The union-find variants of the reference (Sync/Async/Afforest,
 * ConnectedComponents.cpp:241-1036) are execution alternatives producing
 * the same vertex partition; min-label yields the canonical
 * min-vertex-id-per-component representative deterministically, which is
 * the output contract here.
 *
 * Scale shape per round: frontier (O(changed)) joins the src-partitioned
 * blocked adjacency (exchange reused every round), messages partially
 * aggregate map-side before one shuffle on dst, and the fixpoint check is
 * a count on the next frontier. Checkpoints truncate lineage and provide
 * mid-run resume.
 */
object ConnectedComponents {

  def run(
      adj: Adjacency,
      maxIter: Int = 1000,
      checkpointEvery: Int = 20,
      store: Option[SnapshotStore] = None,
      resume: Boolean = false): ComponentsResult = {

    val metrics = ArrayBuffer.empty[IterMetric]
    val resumed = if (resume) store.flatMap(_.latest("cc")) else None
    var iter = resumed.map(_._1).getOrElse(0)
    // state: (id, comp, changed) — `changed` is the reference's
    // comp_old > comp_current test gating the push (l.213).
    var state = resumed.map(_._2).getOrElse(
      adj.vertices.select(col("id"), col("id").as("comp"),
        lit(true).as("changed")))
      .localCheckpoint(true)
    var changedCount = state.filter(col("changed")).count()

    while (changedCount > 0 && iter < maxIter) {
      val t0 = System.nanoTime()
      val frontier = state.filter(col("changed"))
      val mins = adj.blocks
        .join(frontier, adj.blocks("src") === frontier("id"))
        .select(explode(col("dsts")).as("id"), col("comp").as("msg"))
        .groupBy("id").agg(min(col("msg")).as("msg"))

      var next = state
        .join(mins, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("msg"), col("comp"))).as("comp"),
          (coalesce(col("msg"), col("comp")) < col("comp")).as("changed"))
        .localCheckpoint(true) // truncate iterative lineage (see PageRank)

      changedCount = next.filter(col("changed")).count()
      iter += 1
      val ms = (System.nanoTime() - t0) / 1000000
      metrics += IterMetric(iter, changedCount.toDouble, adj.numEdges, ms)
      store.foreach(_.appendMetrics("cc", iter, changedCount.toDouble,
        adj.numEdges, ms))

      if (store.nonEmpty && (iter % checkpointEvery == 0 || changedCount == 0)) {
        next = store.get.commitState("cc", iter, next)
      }
      state = next
    }
    ComponentsResult(state.select(col("id"), col("comp")), iter,
      changedCount == 0, metrics.toSeq)
  }

  /** Exactly `k` synchronous min-label rounds over all vertices (no frontier
    * short-cut, no convergence check) — deterministic kernel for SQL-oracle
    * queries. Semantics per round: comp' = min(comp, min over in-neighbors'
    * comp along the given edge orientation). */
  def fixedRounds(adj: Adjacency, k: Int): DataFrame = {
    var state = adj.vertices.select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    for (_ <- 1 to k) {
      val mins = adj.blocks
        .join(state, adj.blocks("src") === state("id"))
        .select(explode(col("dsts")).as("id"), col("comp").as("msg"))
        .groupBy("id").agg(min(col("msg")).as("msg"))
      val next = state
        .join(mins, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("msg"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      state = next
    }
    state
  }

  /** findLargest (ConnectedComponents.cpp:1074-1157): component histogram. */
  def componentSizes(components: DataFrame): DataFrame =
    components.groupBy("comp").agg(count(lit(1)).as("size"))

  /** Reference verify (ConnectedComponents.cpp:1046-1072): true iff every
    * edge's endpoints share a component. */
  def verify(edges: DataFrame, components: DataFrame): Boolean = {
    val cSrc = components.select(col("id").as("src"), col("comp").as("cs"))
    val cDst = components.select(col("id").as("dst"), col("comp").as("cd"))
    edges.join(cSrc, "src").join(cDst, "dst")
      .filter(col("cs") =!= col("cd")).isEmpty
  }
}
