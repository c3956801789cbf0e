package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.resolve.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** driver-side union-find oracle */
  private def unionFind(nodes: Seq[String], edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.Ordering[String].max(ra, rb)) = math.Ordering[String].min(ra, rb)
    }
    // compress to min member per component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  private def check(nodes: Seq[String], edges: Seq[(String, String)]): Unit = {
    val want = unionFind(nodes, edges)
    // BOTH execution paths must agree with the oracle: the adaptive
    // driver-side union-find finish (default — these graphs are small)
    // and the distributed large/small-star fixpoint (forced by a zero
    // driver-finish threshold).
    val gotDriver = ConnectedComponents.assignAll(
      spark, nodes.toDF("conv_id"), edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    assert(gotDriver === want)
    val gotDistributed = ConnectedComponents.assignAll(
      spark, nodes.toDF("conv_id"), edges.toDF("src", "dst"),
      driverFinishMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(gotDistributed === want)
  }

  test("simple chain, triangle, singletons") {
    check(
      nodes = Seq("a", "b", "c", "d", "e", "f", "g"),
      edges = Seq(("a", "b"), ("b", "c"), ("d", "e"), ("e", "d"), ("f", "f")))
  }

  test("two stars merged by a bridge") {
    val star1 = (1 to 10).map(i => ("h01", f"h$i%02d"))
    val star2 = (11 to 20).map(i => ("h11", f"h$i%02d"))
    val nodes = (1 to 20).map(i => f"h$i%02d")
    check(nodes, star1 ++ star2 ++ Seq(("h05", "h15")))
  }

  test("random graphs match union-find oracle") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(40)
      val nodes = (0 until n).map(i => f"n$i%03d")
      val edges = (0 until n).map { _ =>
        (nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n)))
      }
      check(nodes, edges)
    }
  }

  test("long path (stresses iteration count: doubling convergence)") {
    val n = 64
    val nodes = (0 until n).map(i => f"p$i%03d")
    val edges = (0 until n - 1).map(i => (nodes(i), nodes(i + 1)))
    check(nodes, edges)
  }
}
