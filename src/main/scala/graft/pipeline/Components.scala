package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the step between
  * near-dup PAIR generation (minhash / simhash / embedding LSH) and an
  * actual dedup decision. Pairwise keep-min is wrong under transitivity:
  * with A~B and B~C but A!~C, dropping "the larger id of each pair"
  * removes B and C even though keeping {A, C} (or {A, B}) may be wanted,
  * and chains of length k collapse inconsistently depending on pair
  * order. Components give each document a canonical cluster id (the min
  * doc id reachable through the near-dup graph) so exactly one
  * representative per cluster survives.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
  * and Beyond", SoCC 2014) — the standard O(log n)-round dataflow CC.
  * Each round is two hash-shuffles keyed on node id:
  *
  *  - large-star: every node connects its LARGER neighbors to the
  *    minimum of its neighborhood (incl. itself);
  *  - small-star: every node connects its smaller-or-equal neighbors
  *    (and itself) to its minimum neighbor.
  *
  * Both halves are plain groupBy-min + join — no per-node posting list is
  * ever materialized in executor memory (a star center's neighborhood
  * reaches component size; the DataFrame formulation keeps it as rows).
  * Convergence is detected by an (count, xor-of-hashes) edge-multiset
  * checksum; converged edges form stars (node → component root).
  *
  * Lineage is truncated every round with `localCheckpoint` — iterative
  * join/distinct plans otherwise grow exponentially and re-execute from
  * the source each round. (On a real cluster prefer
  * `sparkContext.setCheckpointDir` + `checkpoint()` for fault tolerance;
  * local checkpoints live in executor block managers.)
  */
object Components {

  /** (id, component) for every node appearing in `pairs`, where
    * `component` is the minimum node id in the node's connected
    * component. Self-loops are ignored; `pairs` need not be
    * deduplicated or ordered. Nodes not mentioned in any pair are by
    * definition their own singleton component — callers wanting full
    * coverage union those in (see [[Dedup.nearDedupByComponent]]). */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxIter: Int = 50): DataFrame = {
    val nodes = pairs.select(col(aCol).cast("long").as("id"))
      .unionAll(pairs.select(col(bCol).cast("long").as("id")))
      .distinct()

    // canonical orientation u > v (small-star's input contract)
    var edges = pairs.select(
        greatest(col(aCol), col(bCol)).cast("long").as("u"),
        least(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()

    var lastChecksum: (Long, Long) = checksum(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // ---- large-star ----------------------------------------------------
      // symmetric neighborhoods; m(u) = min(N(u) ∪ {u}); for every
      // neighbor v > u emit (v, m(u)). Output stays oriented u' > v'
      // because m(u) <= u < v.
      val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // ---- small-star ----------------------------------------------------
      // on oriented edges every neighbor of u is smaller; m = min(N(u));
      // emit (v, m) for the non-min neighbors plus the (u, m) spine.
      val mins2 = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .unionAll(mins2.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()

      val c = checksum(ss)
      converged = c == lastChecksum
      lastChecksum = c
      edges = ss
      it += 1
    }

    // converged edges are stars: (node, root). Roots have no outgoing
    // edge — they label themselves.
    nodes.join(edges.select(col("u").as("id"), col("v").as("__root")),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("__root"), col("id")).as("component"))
  }

  /** Order-insensitive edge-multiset fingerprint: (row count, xor of
    * per-row 64-bit hashes). Two jobs per round total (the eager local
    * checkpoint materializes the round; this agg reads the cached
    * blocks). */
  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count(lit(1)).as("n"),
      // xor-fold via sum of hash is collision-prone across multisets;
      // bit_xor is associative/commutative and order-independent
      expr("bit_xor(xxhash64(u, v))").as("h")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
