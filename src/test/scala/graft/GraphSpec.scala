package graft

import graft.ops.Graph

/** Pins fixed-point PageRank against a sequential integer reference:
 * identical floor-division recurrence, dangling redistribution, self-loop
 * and parallel-edge hygiene, and the exactness properties (mass
 * conservation up to rounding loss, partitioning independence). */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000000000L

  /** Sequential reference: the exact recurrence from Graph.scala's doc. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter { case (a, b) => a != b }.distinct
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val n = nodes.size
    val out = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = S / n
    val baseTerm = (15L * base) / 100L
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, v) <- e) contrib(v) += r(u) / out(u)
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v => v -> (baseTerm + (85L * (contrib(v) + dang / n)) / 100L)).toMap
    }
    r
  }

  test("pageRankFixedPoint matches the sequential reference on a dangling graph") {
    // 1->2, 1->3, 2->3, 4->1; node 3 dangles; a self-loop and a dup edge
    // must not change anything
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L), (2L, 2L), (1L, 2L))
    val got = Graph.pageRankFixedPoint(
      edges.toDF("src", "dst"), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(edges, 3))
    // sink node 3 still outranks everyone; mass ≈ S up to rounding loss
    assert(got(3L) == got.values.max)
    val mass = got.values.sum
    assert(mass <= S && mass > S - 1000L, s"mass $mass")
  }

  test("a self-loop-only node stays a (dangling) node — it holds rank and counts in N") {
    // node 5's only edge is (5,5): it must appear in the output as a
    // dangling node, identical to an explicit dangling sink like node 3
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 5L))
    val got = Graph.pageRankFixedPoint(
      edges.toDF("src", "dst"), "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L))
    // 5 receives no in-links, like 1 — identical rank by symmetry of the
    // recurrence (both get baseterm + damped dangling share only)
    assert(got(5L) === got(1L))
  }

  test("iterations=0 returns the uniform base; partitioning never changes ranks") {
    val edges = (1L to 40L).map(i => (i % 7, (i * 3) % 11))
    val df = edges.toDF("src", "dst")
    val r0 = Graph.pageRankFixedPoint(df, "src", "dst", iterations = 0)
      .collect().map(r => r.getLong(1)).distinct
    assert(r0.length === 1)
    // exactness: 1-partition and 4-partition runs are bit-identical
    val a = Graph.pageRankFixedPoint(df.repartition(1), "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankFixedPoint(df.repartition(4), "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a === reference(edges, 2))
  }
}
