package graft

import graft.operators.Components
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {

  /** Reference union-find, for cross-checking the distributed labels. */
  private def ufLabels(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id root: path-compress once more after all unions
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def ccLabels(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val nodes = (0L until n.toLong).toDF("id")
    val e = edges.toDF("u", "v")
    Components.connectedComponents(nodes, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("components match union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 80
    val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    assert(ccLabels(n, edges) === ufLabels(n, edges))
  }

  test("path graph collapses to its minimum despite high diameter") {
    val edges = (0L until 19L).map(i => (i, i + 1))
    val labels = ccLabels(20, edges)
    assert(labels.values.toSet === Set(0L))
  }

  test("isolated nodes label themselves; duplicate/reversed edges are fine") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (8L, 9L))
    val labels = ccLabels(12, edges)
    assert(labels(3L) === 3L && labels(5L) === 3L)
    assert(labels(8L) === 8L && labels(9L) === 8L)
    assert(Seq(0L, 1L, 2L, 4L, 6L, 7L, 10L, 11L).forall(i => labels(i) === i))
  }

  test("two cliques bridged by one edge merge into one component") {
    val cliqueA = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val cliqueB = for (i <- 20L to 24L; j <- (i + 1) to 24L) yield (i, j)
    val edges = cliqueA ++ cliqueB ++ Seq((14L, 20L))
    val labels = ccLabels(25, edges)
    assert((10L to 14L).forall(i => labels(i) === 10L))
    assert((20L to 24L).forall(i => labels(i) === 10L))
  }

  test("empty edge set converges immediately to all-singletons") {
    val labels = ccLabels(5, Seq.empty)
    assert(labels === (0L until 5L).map(i => i -> i).toMap)
  }
}
