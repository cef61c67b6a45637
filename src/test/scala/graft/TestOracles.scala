package graft

import scala.collection.mutable

/**
 * In-JVM reference implementations (FIXTURES.md §4): dense double-precision
 * PageRank transliterating the pull-topo recurrence (PageRank-pull.cpp:
 * 201-281), sequential union-find CC (ConnectedComponents.cpp:156-181),
 * synchronous min/mode label propagation, brute-force triangle count
 * (Triangles.cpp:100-119 countEqual semantics).
 */
object TestOracles {

  /** Returns (ranks by vertex id, iterations). */
  def pagerankTopo(edges: Array[(Long, Long)], vertexIds: Array[Long],
      alpha: Double = 0.85, tol: Double = 1e-6,
      maxIter: Int = 1000): (Map[Long, Double], Int) = {
    val idx = vertexIds.zipWithIndex.toMap
    val n = vertexIds.length
    val nout = new Array[Long](n)
    edges.foreach { case (s, _) => nout(idx(s)) += 1 }
    var v = Array.fill(n)(1.0 / n)
    val base = (1.0 - alpha) / n
    var iter = 0
    var l1 = Double.MaxValue
    while (l1 > tol && iter < maxIter) {
      val sums = new Array[Double](n)
      edges.foreach { case (s, d) =>
        val si = idx(s)
        sums(idx(d)) += v(si) / nout(si)
      }
      val nv = sums.map(s => base + alpha * s)
      l1 = (0 until n).map(i => math.abs(nv(i) - v(i))).sum
      v = nv
      iter += 1
    }
    (vertexIds.zipWithIndex.map { case (id, i) => id -> v(i) }.toMap, iter)
  }

  /** Union-find, canonicalized to min vertex id per component. */
  def ccUnionFind(edges: Array[(Long, Long)],
      vertexIds: Array[Long]): Map[Long, Long] = {
    val parent = mutable.Map(vertexIds.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val minOf = mutable.Map.empty[Long, Long]
    vertexIds.foreach { v =>
      val r = find(v)
      minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), v)
    }
    vertexIds.map(v => v -> minOf(find(v))).toMap
  }

  /** k synchronous min-combine rounds along edge direction. */
  def lpaMin(edges: Array[(Long, Long)], vertexIds: Array[Long],
      k: Int): Map[Long, Long] = {
    var lab = vertexIds.map(v => v -> v).toMap
    for (_ <- 1 to k) {
      val incoming = mutable.Map.empty[Long, Long]
      edges.foreach { case (s, d) =>
        val m = lab(s)
        incoming(d) = math.min(incoming.getOrElse(d, Long.MaxValue), m)
      }
      lab = lab.map { case (v, l) =>
        v -> math.min(l, incoming.getOrElse(v, Long.MaxValue))
      }
    }
    lab
  }

  /** k synchronous mode-combine rounds (ties → smaller label); vertices
    * with no in-edges keep their label. */
  def lpaMode(edges: Array[(Long, Long)], vertexIds: Array[Long],
      k: Int): Map[Long, Long] = {
    var lab = vertexIds.map(v => v -> v).toMap
    for (_ <- 1 to k) {
      val counts = mutable.Map.empty[Long, mutable.Map[Long, Long]]
      edges.foreach { case (s, d) =>
        val m = counts.getOrElseUpdate(d, mutable.Map.empty)
        m(lab(s)) = m.getOrElse(lab(s), 0L) + 1
      }
      lab = lab.map { case (v, l) =>
        counts.get(v) match {
          case None => v -> l
          case Some(m) =>
            v -> m.toSeq.sortBy { case (label, cnt) => (-cnt, label) }.head._1
        }
      }
    }
    lab
  }

  /** Sequential Andersen points-to fixpoint (PointsTo.cpp semantics):
    * addressOf (var,obj) seeds, copy (src,dst) edges meaning
    * pts(dst) ⊇ pts(src), loads (q,p) = "p = *q", stores (q,p) =
    * "*p = q". Chaotic iteration to the least model. */
  def andersen(addressOf: Seq[(Long, Long)], copies: Seq[(Long, Long)],
      loads: Seq[(Long, Long)], stores: Seq[(Long, Long)])
      : Map[Long, Set[Long]] = {
    var pts = addressOf.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[Long])
    var copy = copies.toSet
    var changed = true
    while (changed) {
      val nc = copy ++
        loads.flatMap { case (q, p) => pts(q).map(o => (o, p)) } ++
        stores.flatMap { case (q, p) => pts(p).map(o => (q, o)) }
      var np = pts
      nc.foreach { case (a, b) =>
        val add = np(a) -- np(b)
        if (add.nonEmpty) np = np.updated(b, np(b) ++ add)
      }
      changed = np != pts || nc != copy
      pts = np; copy = nc
    }
    pts.filter(_._2.nonEmpty)
  }

  /** Edmonds-Karp max flow (BFS augmenting paths) over directed
    * (u, v, cap) edges — the algorithm-independent flow value the
    * preflow-push engine must converge to. */
  def maxFlowEk(edges: Seq[(Long, Long, Long)], s: Long, t: Long): Long = {
    val cap = mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    val adj = mutable.Map.empty[Long, mutable.LinkedHashSet[Long]]
    def nb(u: Long) = adj.getOrElseUpdate(u, mutable.LinkedHashSet.empty)
    edges.foreach { case (u, v, c) =>
      cap((u, v)) += c; nb(u) += v; nb(v) += u
    }
    var flow = 0L
    var found = true
    while (found) {
      val prev = mutable.Map.empty[Long, Long]
      val q = mutable.Queue(s)
      prev(s) = s
      while (q.nonEmpty && !prev.contains(t)) {
        val u = q.dequeue()
        nb(u).foreach { v =>
          if (!prev.contains(v) && cap((u, v)) > 0) {
            prev(v) = u; q.enqueue(v)
          }
        }
      }
      found = prev.contains(t)
      if (found) {
        var b = Long.MaxValue
        var v = t
        while (v != s) { b = math.min(b, cap((prev(v), v))); v = prev(v) }
        v = t
        while (v != s) {
          cap((prev(v), v)) -= b; cap((v, prev(v))) += b; v = prev(v)
        }
        flow += b
      }
    }
    flow
  }

  /** Brute-force MNI wedge-pattern support by full embedding
    * enumeration (labels = id % numLabels): for every wedge u–c–w the
    * canonical pattern is (lab c; sorted endpoint labels) and each
    * position's domain collects the distinct vertices seen there. */
  def fsmWedgeBrute(edges: Array[(Long, Long)], numLabels: Int)
      : Map[(Long, Long, Long), Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val adj = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val doms = mutable.Map.empty[(Long, Long, Long),
      (mutable.Set[Long], mutable.Set[Long], mutable.Set[Long])]
    for (c <- adj.keys; u <- adj(c); w <- adj(c) if u != w) {
      val (lu, lw) = (u % numLabels, w % numLabels)
      val (l1, l2, p1, p2) = if (lu <= lw) (lu, lw, u, w) else (lw, lu, w, u)
      val d = doms.getOrElseUpdate((c % numLabels, l1, l2),
        (mutable.Set.empty, mutable.Set.empty, mutable.Set.empty))
      d._1 += c; d._2 += p1; d._3 += p2
    }
    doms.view.mapValues { case (dc, d1, d2) =>
      math.min(dc.size, math.min(d1.size, d2.size)).toLong
    }.toMap
  }

  /** Brute-force triangle count on the symmetrized simple graph. */
  def triangles(edges: Array[(Long, Long)]): Long = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a < b }.distinct
    val adj = und.groupBy(_._1).map { case (a, es) => a -> es.map(_._2).toSet }
    var cnt = 0L
    und.foreach { case (a, b) =>
      val na = adj.getOrElse(a, Set.empty)
      val nb = adj.getOrElse(b, Set.empty)
      cnt += na.count(c => c > b && nb.contains(c))
    }
    cnt
  }
}
