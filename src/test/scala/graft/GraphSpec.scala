package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components properties: agreement with a local union-find
  * reference on random graphs, O(log d) convergence on a long path, and
  * isolated-node identity.
  */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Local union-find reference. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n.toLong).map { i =>
      // path-compress to the min root: roots were always merged to the min
      var r = i; while (parent(r) != r) r = parent(r)
      i -> r
    }.toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (0L until n.toLong).toDF("doc_id")
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    Graph.connectedComponents(nodes, sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 300
    val edges = Seq.fill(250)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    assert(run(n, edges) === ufComponents(n, edges))
  }

  test("long path collapses to a single component (log-round pointer jumping)") {
    val n = 200
    val path = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val got = run(n, path)
    assert(got.values.toSet === Set(0L))
  }

  test("isolated nodes keep their own id") {
    val got = run(5, Seq((0L, 1L)))
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }
}
