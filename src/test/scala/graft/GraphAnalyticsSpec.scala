package graft

import graft.ops.GraphAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural properties of the graph-analytics tier on the sf0.001
  * fixture graph (top-3 co-supplier similarity graph): bounded degree,
  * PageRank mass conservation, BFS lattice bounds, triangle credit
  * identity. Exact-value parity vs DuckDB is the driver gate's job; these
  * pin the algorithm-level invariants the oracle can't see.
  */
class GraphAnalyticsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("top-k sparsifier bounds symmetric degree by 2k") {
    val hist = q("graph_degree_histogram").collect()
    assert(hist.nonEmpty)
    // each node keeps <= 3 partners, symmetrization adds <= 3 more
    assert(hist.map(_.getLong(0)).max <= 6)
    assert(hist.map(_.getLong(0)).min >= 1)
  }

  test("oriented edge list is strictly ordered and duplicate-free") {
    val e = q("graph_topk_similarity").collect()
    assert(e.nonEmpty)
    assert(e.forall(r => r.getLong(0) < r.getLong(1)))
    assert(e.map(r => (r.getLong(0), r.getLong(1))).distinct.length == e.length)
  }

  test("pagerank: every rank >= teleport mass and total mass is bounded") {
    val pr = q("graph_pagerank_fixedpoint").collect()
    val n = pr.length.toLong
    assert(n > 0)
    val teleport = 150000000000L
    val scale = 1000000000000L
    assert(pr.forall(_.getLong(1) >= teleport))
    // damped mass can't exceed the initial total (floor-division only loses)
    val total = pr.map(_.getLong(1)).sum
    assert(total <= n * scale)
  }

  test("bfs: sources at distance 0, all distances within round bound") {
    val d = q("graph_bfs_frontier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d.nonEmpty)
    d.foreach { case (node, dist) =>
      if (node % 17 == 0) assert(dist == 0L, s"source $node")
      assert(dist >= 0L && dist <= 3L)
    }
    // every non-source reached node has a neighbor one hop closer
    val edges = q("graph_topk_similarity").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    d.filter(_._2 > 0).foreach { case (node, dist) =>
      assert(edges(node).exists(nbr => d.get(nbr).exists(_ == dist - 1)),
        s"node $node dist $dist has no predecessor")
    }
  }

  test("triangle credits sum to 3x the triangle count and match brute force") {
    val perNode = q("graph_triangle_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = q("graph_topk_similarity").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // brute-force: count each unordered triangle once
    val nodes = adj.keys.toSeq.sorted
    var tri = 0L
    val credit = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, b) <- e
      c <- adj(a) if c > b && adj(b).contains(c)
    } {
      tri += 1
      credit(a) += 1; credit(b) += 1; credit(c) += 1
    }
    assert(perNode.values.sum == 3 * tri)
    assert(perNode == credit.toMap)
  }

  test("k-core: 4 peel rounds reach the fixpoint and members have core degree >= k") {
    val core = q("graph_k_core").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reported degrees respect k
    assert(core.values.forall(_ >= 3L))
    // brute-force peel to convergence on the driver; must equal round-4
    val e = q("graph_topk_similarity").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var alive = e.flatMap(p => Seq(p._1, p._2)).toSet
    var stable = false
    var guard = 0
    var deg = Map.empty[Long, Int]
    while (!stable && guard < 100) {
      deg = e.filter(p => alive(p._1) && alive(p._2))
        .flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val next = deg.filter(_._2 >= 3).keySet
      stable = next == alive
      alive = next
      guard += 1
    }
    assert(guard < 100, "peel did not converge")
    assert(core.keySet == alive, "round-4 result is not the fixpoint")
    core.foreach { case (n, d) => assert(deg(n).toLong == d) }
  }

  test("common neighbors: scores match brute force and pairs are non-edges") {
    val got = q("graph_common_neighbors").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e = q("graph_topk_similarity").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = e.toSet
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val brute = (for {
      u <- nodes; w <- nodes if u < w && !edgeSet((u, w))
      cn = adj(u).intersect(adj(w)).size if cn >= 2
    } yield (u, w) -> cn.toLong).toMap
    assert(got == brute)
    got.keys.foreach { case (u, w) => assert(!edgeSet((u, w))) }
  }

  test("label propagation: matches a brute-force synchronous 3-round LPA") {
    val got = q("graph_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = q("graph_topk_similarity").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (n, ns) =>
        val freq = ns.map(lab).groupBy(identity).view.mapValues(_.size)
        // most frequent neighbor label, smallest label on ties
        n -> freq.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    assert(got == lab)
    // labels are node ids and propagation merged at least some communities
    assert(got.values.toSet.subsetOf(got.keySet))
    assert(got.values.toSet.size < got.size)
  }
}
