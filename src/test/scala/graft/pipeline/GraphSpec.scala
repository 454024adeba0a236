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

  /** driver reference for PPR: restart distribution on seeds, dangling
    * mass returned to the seeds */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     iters: Int, d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2) ++ seeds).distinct.sorted
    val s = nodes.map(v =>
      v -> (if (seeds.contains(v)) 1.0 / seeds.size else 0.0)).toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = s
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(es =>
        es.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) * s(v) + d * (contrib.getOrElse(v, 0.0) +
          dangling * s(v)))).toMap
    }
    r
  }

  test("personalizedPageRank: restart on seeds, dangling to seeds, sum 1") {
    val seeds = Seq(1L, 4L)
    val got = Graph.personalizedPageRank(g.toDF("src", "dst"), "src", "dst",
      seeds, iters = 4).as[(Long, Double)].collect().toMap
    val want = refPpr(g, seeds, 4, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, v) }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // proximity: the seed's direct successor outranks a node only
    // reachable through it
    assert(got(1L) > got(5L))
  }

  test("personalizedPageRank: isolated seed joins the node set") {
    val got = Graph.personalizedPageRank(g.toDF("src", "dst"), "src", "dst",
      Seq(99L), iters = 2).as[(Long, Double)].collect().toMap
    val want = refPpr(g, Seq(99L), 2, 0.85)
    assert(got.keySet.contains(99L))
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, v) }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("pageRankWeighted: integer weights equal the multigraph expansion") {
    // weight w ≡ the edge repeated w times: the weighted op on weights
    // (2, 1, 3) must match plain pageRank on the expanded multigraph
    val weighted = Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (3L, 1L, 3.0))
    val expanded = weighted.flatMap { case (s, d0, w) =>
      Seq.fill(w.toInt)((s, d0)) }
    val got = Graph.pageRankWeighted(weighted.toDF("src", "dst", "w"),
      "src", "dst", "w", iters = 4).as[(Long, Double)].collect().toMap
    val want = Graph.pageRank(expanded.toDF("src", "dst"), "src", "dst",
      iters = 4).as[(Long, Double)].collect().toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, v) }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // null/non-positive weight rows drop: an all-dropped edge list is an
    // empty graph
    intercept[IllegalArgumentException](Graph.pageRankWeighted(
      Seq((1L, 2L, 0.0)).toDF("src", "dst", "w"), "src", "dst", "w"))
  }

  /** driver reference for HITS: h <- A a, normalize; a <- A^T h (updated),
    * normalize */
  private def refHits(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Double, Double)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    var a = nodes.map(_ -> 1.0 / math.sqrt(n)).toMap
    var h = nodes.map(_ -> 1.0 / math.sqrt(n)).toMap
    for (_ <- 1 to iters) {
      val hu = nodes.map(v =>
        v -> edges.filter(_._1 == v).map(ed => a(ed._2)).sum).toMap
      val hn = math.sqrt(hu.values.map(x => x * x).sum)
      h = hu.view.mapValues(_ / hn).toMap
      val au = nodes.map(v =>
        v -> edges.filter(_._2 == v).map(ed => h(ed._1)).sum).toMap
      val an = math.sqrt(au.values.map(x => x * x).sum)
      a = au.view.mapValues(_ / an).toMap
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("hits matches the reference; pure hubs/authorities score 0 on the other side") {
    for (iters <- Seq(1, 3)) {
      val got = Graph.hits(g.toDF("src", "dst"), "src", "dst", iters)
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = refHits(g, iters)
      assert(got.keySet === want.keySet)
      got.foreach { case (v, (hb, au)) =>
        assert(math.abs(hb - want(v)._1) < 1e-12, s"hub $v iters=$iters")
        assert(math.abs(au - want(v)._2) < 1e-12, s"auth $v iters=$iters")
      }
      // node 4 only points (pure hub); node 5 is only pointed at
      assert(got(4L)._2 === 0.0 && got(5L)._1 === 0.0)
    }
    intercept[IllegalArgumentException](
      Graph.hits(g.toDF("src", "dst"), "src", "dst", iters = 0))
  }

  test("coOccurrence: shared-src pairs counted; parallel edges collapse") {
    // srcs: 1→{2,3}, 2→{3,5}, 3→{1}, 4→{3}; pair (2,3) from src 1,
    // (3,5) from src 2; duplicate edge rows must not double-count
    val edges = g ++ Seq((1L, 2L)) // duplicate 1→2
    val got = Graph.coOccurrence(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 3L, 1L), (3L, 5L, 1L)))
  }

  test("coOccurrence: maxDegree skips hub sources") {
    val hub = (1L to 10L).map(d => (100L, d)) ++ Seq((200L, 1L), (200L, 2L))
    val capped = Graph.coOccurrence(hub.toDF("src", "dst"), "src", "dst",
      maxDegree = 5).as[(Long, Long, Long)].collect().toSet
    // the 10-fan hub is skipped; only the 2-fan src contributes
    assert(capped === Set((1L, 2L, 1L)))
    val full = Graph.coOccurrence(hub.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long)].collect()
    assert(full.length === 45) // C(10,2) with (1,2) counted twice -> merged
    assert(full.find(r => r._1 == 1L && r._2 == 2L).get._3 === 2L)
  }

  /** driver reference: synchronous LPA, undirected, parallel edges
    * weighted, ties to the smallest label */
  private def lpaRef(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges ++ edges.map(_.swap)
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = nbrs.keySet
    var lab = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = nodes.map { v =>
        val counts = nbrs(v).groupBy(lab).view.mapValues(_.size).toMap
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        v -> best
      }.toMap
    }
    lab
  }

  test("labelPropagation matches the synchronous reference") {
    // two triangles joined by a bridge, plus a pendant
    val g2 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (6L, 7L))
    for (iters <- Seq(1, 2, 3)) {
      val got = Graph.labelPropagation(g2.toDF("src", "dst"), "src", "dst",
        iters).as[(Long, Long)].collect().toMap
      assert(got === lpaRef(g2, iters), s"iters=$iters")
    }
  }

  test("labelPropagation: parallel edges weight the vote; ties go small") {
    // node 3 sees label 1 once and label 2 twice (parallel edge) → 2 wins;
    // node 4 sees labels {1, 2} once each → tie → 1
    val g2 = Seq((3L, 1L), (3L, 2L), (3L, 2L), (4L, 1L), (4L, 2L))
    val got = Graph.labelPropagation(g2.toDF("src", "dst"), "src", "dst",
      iters = 1).as[(Long, Long)].collect().toMap
    assert(got(3L) === 2L && got(4L) === 1L)
    assert(got === lpaRef(g2, 1))
    intercept[IllegalArgumentException](
      Graph.labelPropagation(g2.toDF("src", "dst"), "src", "dst", iters = 0))
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

  test("triangles: known graph, direction/duplicate/self-loop " +
      "normalization, clustering coefficients") {
    import spark.implicits._
    // K4 on 1-4 (4 triangles, every node in 3) + pendant 5-1 + an
    // isolated edge 6-7; edges arrive directed, duplicated, reversed,
    // with a self-loop
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 3L), (5L, 1L), (6L, 7L), (3L, 3L))
      .toDF("src", "dst")
    val got = Graph.triangles(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(2) == 3L && got(1L).getLong(1) == 4L)
    assert(got(2L).getLong(2) == 3L && got(2L).getLong(1) == 3L)
    // node 2: deg 3, tri 3 -> coeff 1 (its neighborhood is a clique)
    assert(got(2L).getDouble(3) == 1.0)
    // node 1: deg 4 (pendant 5), tri 3 -> 2*3/12
    assert(got(1L).getDouble(3) == 0.5)
    assert(got(5L).getLong(2) == 0L && got(5L).isNullAt(3)) // deg 1
    assert(got(6L).getLong(2) == 0L && got(7L).getLong(2) == 0L)
    // global triangle count: each triangle credits 3 corners
    assert(got.values.map(_.getLong(2)).sum == 4L * 3)
  }
}
