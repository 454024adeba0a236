package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph signals for corpus curation — the web-scale quality prior
  * (a Common-Crawl-style harmonic/PageRank score per domain or document)
  * that upstream filters consume alongside text quality.
  *
  * 100-TB shape: the edge list with out-degrees attached is built ONCE
  * and persisted; each iteration is then exactly one shuffle (the
  * contribution aggregate on dst) plus a broadcast of the two scalars
  * (node count, dangling mass). Ranks never grow beyond one row per
  * node. Lineage grows two joins per iteration — pass
  * `checkpointEvery` > 0 to cut it with an eager localCheckpoint for
  * long runs. */
object Graph {

  /** PageRank over an edge frame. `edges` rows are (src, dst) long-castable
    * ids; PARALLEL EDGES COUNT (a multigraph src contributes its rank
    * split over its edge multiset) — `.distinct()` the input for simple-
    * graph semantics. Returns (node, rank) for every node appearing as a
    * src or dst; Σrank = 1 up to float error. Dangling nodes (no out-
    * edges) teleport their whole rank uniformly, the standard correction.
    * One driver action up front (the node count); iterations stay lazy. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1): $damping")
    val e = edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .unionAll(e.select(col("__dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val degs = e.groupBy("__src").agg(count(lit(1)).cast("double").as("__d"))
    // per-iteration reusable: each edge with its src out-degree
    val eDeg = e.join(degs, "__src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // one action; also materializes the persist
    require(n > 0, "empty graph")
    // literals written as the same arithmetic the SQL oracle uses so the
    // constants are bit-identical ((1 - d) differs from a 0.15 literal in
    // the last ulp)
    val teleport = lit(1.0) - lit(damping)
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n.toDouble))
    var i = 0
    while (i < iters) {
      // each iteration's ranks feed TWO branches (contributions AND the
      // dangling-mass aggregate); without a persist the shared lineage is
      // evaluated once per consumer, DOUBLING per iteration — 2^iters
      // plan blowup (measured: 5.8 s -> ~2 s for 3 iterations at sf0.1).
      // The persist makes both branches scan one InMemoryRelation,
      // populated lazily inside the caller's job — no extra action.
      // Memory: one (node, rank) row per node per iteration, freed by the
      // caller's cache clear / session end.
      ranks = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val contribs = eDeg.join(ranks, col("__src") === col("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__d")).as("__c"))
      // dangling mass: rank held by nodes with no out-edges, redistributed
      // uniformly — a one-row frame, broadcast-crossed so nothing collects
      val dangling = ranks
        .join(degs, col("node") === col("__src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (teleport / lit(n.toDouble) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n.toDouble))).as("rank"))
      i += 1
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** PageRank with EDGE WEIGHTS: a src splits its rank over its out-edges
    * proportionally to `weightCol` (link counts, click volumes, quantity
    * flows) instead of uniformly. Rows with null or non-positive weight
    * are dropped (they carry no rank). Same plan as [[pageRank]]: the
    * weighted out-degree joins the edge list once; each iteration is one
    * contribution shuffle with per-iteration rank persists. */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                       weightCol: String, iters: Int = 3,
                       damping: Double = 0.85,
                       checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1): $damping")
    val e = edges.na.drop(Seq(srcCol, dstCol, weightCol))
      .filter(col(weightCol) > 0)
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"),
        col(weightCol).cast("double").as("__w"))
    val nodes = e.select(col("__src").as("node"))
      .unionAll(e.select(col("__dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val degs = e.groupBy("__src").agg(sum(col("__w")).as("__d"))
    val eDeg = e.join(degs, "__src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val teleport = lit(1.0) - lit(damping)
    var ranks = nodes.withColumn("rank", lit(1.0) / lit(n.toDouble))
    var i = 0
    while (i < iters) {
      ranks = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val contribs = eDeg.join(ranks, col("__src") === col("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") * col("__w") / col("__d")).as("__c"))
      val dangling = ranks
        .join(degs, col("node") === col("__src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (teleport / lit(n.toDouble) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n.toDouble))).as("rank"))
      i += 1
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Personalized PageRank (TrustRank-style): the teleport distribution
    * concentrates on `seeds` instead of being uniform, so rank measures
    * proximity-to-the-trusted-set — the curation prior "how reachable is
    * this domain/doc from known-good seeds" (Gyöngyi 2004). Same plan
    * shape as [[pageRank]]: one contribution shuffle per iteration,
    * per-iteration ranks persisted (two consumers), dangling mass
    * redistributed over the SEEDS (the standard restart semantics — all
    * lost mass returns to the trusted set). Seeds are added to the node
    * set even when isolated, so Σrank = 1 up to float error; seeds is a
    * driver-side literal list (a trusted set is small by nature —
    * hundreds of domains, not a DataFrame). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iters: Int = 3,
                           damping: Double = 0.85,
                           checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1): $damping")
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(seeds.distinct.size == seeds.size, "duplicate seed ids")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .unionAll(e.select(col("__dst")))
      .unionAll(seeds.toDF("node"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val degs = e.groupBy("__src").agg(count(lit(1)).cast("double").as("__d"))
    val eDeg = e.join(degs, "__src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // restart distribution s(v): 1/|S| on seeds, 0 elsewhere — written as
    // the same arithmetic the SQL oracle uses (1.0/|S| literal division)
    def sv(node: org.apache.spark.sql.Column) =
      when(node.isin(seeds: _*), lit(1.0) / lit(seeds.size.toDouble))
        .otherwise(lit(0.0))
    val teleport = lit(1.0) - lit(damping)
    var ranks = nodes.withColumn("rank", sv(col("node")))
    var i = 0
    while (i < iters) {
      ranks = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val contribs = eDeg.join(ranks, col("__src") === col("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__d")).as("__c"))
      val dangling = ranks
        .join(degs, col("node") === col("__src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (teleport * sv(col("node")) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) +
              col("__dm") * sv(col("node")))).as("rank"))
      i += 1
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the two-sided link score
    * PageRank's single rank can't express: a HUB points at good
    * authorities, an AUTHORITY is pointed at by good hubs (directory
    * pages vs content pages; crawl seed lists vs canonical sources).
    * Per iteration: h ← A·a then L2-normalize, a ← Aᵀ·h (the UPDATED h)
    * then L2-normalize; init = uniform unit vectors. PARALLEL EDGES
    * COUNT (multigraph semantics, as [[pageRank]]) — `.distinct()` the
    * input for simple graphs. Returns (node, hub, authority); nodes on
    * one side only score 0 on the other. Two contribution shuffles per
    * iteration + two one-row norm aggregates broadcast back; hub/auth
    * frames persist per iteration (two consumers each). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("__src").as("node"))
      .unionAll(e.select(col("__dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "empty graph")
    def normalized(scores: DataFrame, valCol: String): DataFrame = {
      val norm = scores.agg(sqrt(sum(col(valCol) * col(valCol))).as("__n"))
      scores.crossJoin(broadcast(norm))
        .select(col("node"), (col(valCol) / col("__n")).as(valCol))
    }
    var auth = nodes.withColumn("auth", lit(1.0) / sqrt(lit(n.toDouble)))
    var hub = nodes.withColumn("hub", lit(1.0) / sqrt(lit(n.toDouble)))
    var i = 0
    while (i < iters) {
      auth = auth.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hu = e.join(auth, col("__dst") === col("node"))
        .groupBy(col("__src").as("node")).agg(sum(col("auth")).as("__s"))
      hub = normalized(
        nodes.join(hu, Seq("node"), "left")
          .select(col("node"), coalesce(col("__s"), lit(0.0)).as("hub")),
        "hub")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val au = e.join(hub, col("__src") === col("node"))
        .groupBy(col("__dst").as("node")).agg(sum(col("hub")).as("__s"))
      auth = normalized(
        nodes.join(au, Seq("node"), "left")
          .select(col("node"), coalesce(col("__s"), lit(0.0)).as("auth")),
        "auth")
      i += 1
    }
    hub.join(auth, Seq("node"))
      .select(col("node"), col("hub"), col("auth").as("authority"))
  }

  /** Bipartite co-occurrence projection: pairs of `dst` nodes sharing at
    * least one `src` neighbor, with the shared-neighbor count — the
    * "parts bought together" / "domains citing the same page" graph that
    * collaborative filtering and related-item curation start from.
    *
    * SCALE: per-src pair generation costs Σ out-degree², so hub sources
    * (a src linking to everything) dominate. `maxDegree` SKIPS srcs with
    * out-degree > maxDegree (their pairs are dropped — hub sources carry
    * little signal per pair, the standard projection cut; counts for
    * pairs that ALSO share under-cap srcs keep only the under-cap
    * contributions). One shuffle on src, one count aggregate on the pair
    * key. Parallel edges collapse first (a src counts once per dst). */
  def coOccurrence(edges: DataFrame, srcCol: String, dstCol: String,
                   maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val spark = edges.sparkSession
    import spark.implicits._
    val skipAcc = graft.util.SkipMetrics.counter(
      "coOccurrence.skippedVertices", spark)
    edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .distinct()
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val dsts = it.map(_._2).toArray
        if (dsts.length > maxDegree) { skipAcc.add(1L); Iterator.empty }
        else {
          java.util.Arrays.sort(dsts)
          val out = Array.newBuilder[(Long, Long)]
          var i = 0
          while (i < dsts.length) {
            var j = i + 1
            while (j < dsts.length) {
              out += ((dsts(i), dsts(j)))
              j += 1
            }
            i += 1
          }
          out.result().iterator
        }
      }
      .toDF("node_a", "node_b")
      .groupBy("node_a", "node_b")
      .agg(count(lit(1)).as("shared"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) made
    * DETERMINISTIC — the community-detection pass that groups a link
    * graph into densely-connected clusters (mirror/site families for
    * curation) without a cluster-count parameter.
    *
    * Semantics: labels initialize to the node id; each iteration EVERY
    * node simultaneously adopts the most frequent label among its
    * neighbors (undirected view — each input edge counts in both
    * directions; PARALLEL EDGES COUNT as extra weight, `.distinct()` the
    * input for simple-graph semantics; a self-loop makes a node its own
    * neighbor). Ties break toward the SMALLEST label. Synchronous update
    * + deterministic tie-break make the result a pure function of the
    * graph — a SQL oracle replays it iteration-for-iteration (the
    * classic random-order asynchronous variant is irreproducible by
    * design). The known cost: synchronous LPA can oscillate on bipartite
    * structure instead of converging — pick `iters` as a fixed budget,
    * not a convergence expectation.
    *
    * Scale shape: the symmetrized edge list is persisted once; each
    * iteration is one join of labels onto it (node-keyed), one
    * (node, label) count aggregate (map-side combinable), and one argmax
    * aggregate — all keyed, no windows over the full graph. Labels
    * persist per iteration (single consumer, but the persist cuts the
    * replayed lineage the same way [[pageRank]]'s does). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__a"),
        col(dstCol).cast("long").as("__b"))
    val sym = e.unionAll(e.select(col("__b").as("__a"), col("__a").as("__b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every node appears as __a in the symmetrized list, so this is the
    // full node set and every node has >= 1 neighbor row
    val nodes = sym.select(col("__a").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    var i = 0
    while (i < iters) {
      labels = labels.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = sym.join(labels, col("__b") === col("node"))
        .groupBy(col("__a").as("node2"), col("label"))
        .agg(count(lit(1)).as("__c"))
      // argmax by (count desc, label asc): max_by over (count, -label) —
      // the ordering struct is unique per label, so the pick is total
      labels = counts
        .groupBy(col("node2").as("node"))
        .agg(max_by(col("label"),
          struct(col("__c"), (-col("label")).as("__t"))).as("label"))
      i += 1
    }
    labels
  }

  /** In/out degree per node — the quick structural profile (hub/authority
    * candidates, isolated-node counts) run before committing to an
    * iterative pass. One aggregate per direction, full-outer joined on
    * the ≤node-count frames. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
    val outD = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val inD = e.groupBy(col("__dst").as("node"))
      .agg(count(lit(1)).as("in_degree"))
    outD.join(inD, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /** Per-node triangle counts + local clustering coefficient over the
    * UNDIRECTED simple graph (direction and duplicate edges collapse;
    * self-loops drop) — the community-density signal: how clique-like
    * is each node's neighborhood?
    *
    *   coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1))   (null when deg < 2)
    *
    * Algorithm: canonicalize to a < b edges, enumerate WEDGES by
    * joining the canonical edge list with itself on the middle vertex
    * (a < b < c comes free from canonical ordering), then close each
    * wedge against the edge list — the standard two-join formulation;
    * Catalyst plans both as shuffled equi-joins, and each found
    * triangle credits its three corners via one explode + hash
    * aggregate. Wedge mass is Σ_v deg(v)²/2 — for skew-heavy graphs cut
    * hubs first ([[coOccurrence]]'s maxDegree treatment applies
    * upstream). Output: (node, degree, triangles, coeff). */
  def triangles(edges: DataFrame, srcCol: String,
                dstCol: String): DataFrame = {
    val e0 = edges.na.drop(Seq(srcCol, dstCol))
      .select(col(srcCol).cast("long").as("__u"),
        col(dstCol).cast("long").as("__v"))
      .filter(col("__u") =!= col("__v"))
    val canon = e0.select(least(col("__u"), col("__v")).as("a"),
        greatest(col("__u"), col("__v")).as("b"))
      .distinct()
    // wedges a-b-c with a < b < c: (a,b) joined to (b,c)
    val wedges = canon.select(col("a"), col("b"))
      .join(canon.select(col("a").as("b"), col("b").as("c")), "b")
    val tris = wedges.join(canon.select(col("a"), col("b").as("c")),
      Seq("a", "c"), "leftsemi")
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val deg = canon
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1))).as("coeff"))
  }
}
