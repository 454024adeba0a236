package graft.pipeline

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** driver reference: power iteration with dangling redistribution,
    * parallel edges contributing per edge row */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
                  d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n)))
        .toMap
    }
    r
  }

  // 1→2, 1→3, 2→3, 3→1, 4→3 plus dangling node 5 (in-edges only)
  private val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L),
    (2L, 5L))

  test("pageRank matches the reference power iteration (dangling handled)") {
    val got = Graph.pageRank(g.toDF("src", "dst"), "src", "dst", iters = 4)
      .as[(Long, Double)].collect().toMap
    val want = ref(g, 4, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, v) }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("parallel edges weight contributions (multigraph semantics)") {
    val multi = Seq((1L, 2L), (1L, 2L), (1L, 3L)) // 2/3 of 1's rank to 2
    val got = Graph.pageRank(multi.toDF("src", "dst"), "src", "dst",
      iters = 1).as[(Long, Double)].collect().toMap
    val want = ref(multi, 1, 0.85)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, v) }
    assert(got(2L) > got(3L))
  }

  test("checkpointEvery preserves the result") {
    val a = Graph.pageRank(g.toDF("src", "dst"), "src", "dst", iters = 5)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(g.toDF("src", "dst"), "src", "dst", iters = 5,
      checkpointEvery = 2).as[(Long, Double)].collect().toMap
    assert(a === b)
  }

  test("degrees: in/out per node, zeros for one-sided nodes") {
    val got = Graph.degrees(g.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 3L),
      (4L, 1L, 0L), (5L, 0L, 1L)))
  }

  test("validates iters/damping; empty graph refused") {
    val df = g.toDF("src", "dst")
    intercept[IllegalArgumentException](
      Graph.pageRank(df, "src", "dst", iters = 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(df, "src", "dst", damping = 1.0))
    intercept[IllegalArgumentException](
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"),
        "src", "dst"))
  }
}
