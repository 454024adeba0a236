package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("kmeans recovers well-separated clusters and ids are init-stable") {
    import spark.implicits._
    // two tight blobs around (0,0) and (10,10); ids 0/1 are one seed each
    val d = Seq(
      (0L, vec(0.1, 0.0)), (1L, vec(10.0, 10.1)), (2L, vec(0.0, 0.2)),
      (3L, vec(9.9, 10.0)), (4L, vec(0.2, 0.1)), (5L, vec(10.1, 9.9)))
      .toDF("vec_id", "embedding")
    val (assigned, centers) = Clustering.kmeans(d, "vec_id", "embedding",
      k = 2, iters = 5)
    val byCluster = assigned.select("vec_id", "cluster")
      .as[(Long, Int)].collect().groupBy(_._2).map { case (c, xs) =>
        c -> xs.map(_._1).toSet }
    assert(byCluster(0) == Set(0L, 2L, 4L)) // seed id 0 → cluster 0
    assert(byCluster(1) == Set(1L, 3L, 5L))
    // converged centers are the blob means
    assert(math.abs(centers(0)(0) - 0.1) < 1e-6)
    assert(math.abs(centers(1)(0) - 10.0) < 1e-6)
  }

  test("kmeansFit with zero iterations returns the seed vectors verbatim") {
    import spark.implicits._
    val d = Seq((5L, vec(1, 2)), (3L, vec(3, 4)), (9L, vec(5, 6)))
      .toDF("vec_id", "embedding")
    val c = Clustering.kmeansFit(d, "vec_id", "embedding", k = 2, iters = 0)
    // the TWO lowest ids (3, 5), ordered by id
    assert(c.length == 2)
    assert(c(0).toSeq == Seq(3.0, 4.0) && c(1).toSeq == Seq(1.0, 2.0))
  }

  test("kmeans leaves no persisted blocks behind") {
    import spark.implicits._
    val d = Seq((0L, vec(0, 0)), (1L, vec(1, 1)), (2L, vec(2, 2)))
      .toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (assigned, _) = Clustering.kmeans(d, "vec_id", "embedding", 2, 3)
    assigned.count()
    assert(spark.sparkContext.getPersistentRDDs.size == before)
  }

  test("semDedup equals within-cluster brute force and respects maxCluster") {
    import spark.implicits._
    // blob A: three near-identical vectors; blob B: two; one cross-blob
    // near-dup CANNOT be found (different clusters) — that's the contract
    val d = Seq(
      (0L, vec(1.0, 0.0)), (2L, vec(0.99, 0.01)), (4L, vec(0.98, 0.02)),
      (1L, vec(0.0, 1.0)), (3L, vec(0.01, 0.99)))
      .toDF("vec_id", "embedding")
    val pairs = Clustering.semDedup(d, "vec_id", "embedding", k = 2,
        threshold = 0.99, iters = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L)))
    // a 1-row cap skips every cluster (degenerate-mass guard), no crash
    val capped = Clustering.semDedup(d, "vec_id", "embedding", k = 2,
      threshold = 0.99, iters = 3, maxCluster = 1)
    assert(capped.count() == 0L)
  }

  test("kFor tracks corpus size: minK floor at gate scales, ceil above") {
    // gate-era corpora stay at the floor (the q_semdedup harness contract
    // and the benched row's historical numbers depend on k=8 there)
    assert(Clustering.kFor(200) == 8)
    assert(Clustering.kFor(2000) == 8)
    assert(Clustering.kFor(8000) == 8)
    // past the floor, expected cluster size stays ~targetClusterSize
    assert(Clustering.kFor(8001) == 9)
    assert(Clustering.kFor(200000) == 200)
    assert(Clustering.kFor(200000, targetClusterSize = 4000) == 50)
    intercept[IllegalArgumentException](Clustering.kFor(10, 0))
  }

  test("empty clusters keep their previous center (no NaN poisoning)") {
    import spark.implicits._
    // k = 3 over 3 points, two of them identical: one seed never wins rows
    val d = Seq((0L, vec(0, 0)), (1L, vec(0, 0)), (2L, vec(5, 5)))
      .toDF("vec_id", "embedding")
    val c = Clustering.kmeansFit(d, "vec_id", "embedding", k = 3, iters = 4)
    assert(c.forall(_.forall(x => !x.isNaN)))
  }

  test("coverageSample picks the nearest-to-centroid row per cell, ties to min id") {
    import spark.implicits._
    // blobs around (0,0) and (10,10); id 2 sits exactly on the first
    // blob's mean, id 3 on the second's
    val d = Seq(
      (0L, vec(0.2, 0.0)), (1L, vec(10.0, 10.2)), (2L, vec(0.1, 0.1)),
      (3L, vec(10.0, 10.0)), (4L, vec(0.0, 0.2)), (5L, vec(10.0, 9.8)))
      .toDF("vec_id", "embedding")
    // converged centers: blob means (0.1, 0.1) and (10.0, 10.0)
    val picked = Clustering.coverageSample(d, "vec_id", "embedding",
        k = 2, iters = 5)
      .collect().map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("dist"))).toMap
    assert(picked(0)._1 == 2L && picked(0)._2 < 1e-9)
    assert(picked(1)._1 == 3L && picked(1)._2 < 1e-9)
    // one row per non-empty cell, spanning both blobs
    assert(picked.size == 2)
    // equidistant tie resolves to the LOWEST id: two symmetric points
    val tie = Seq((7L, vec(1.0, 0.0)), (8L, vec(-1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val t = Clustering.coverageSample(tie, "vec_id", "embedding",
        k = 1, iters = 1) // one center at the mean (0,0): both dist 1
      .head()
    assert(t.getAs[Long]("vec_id") == 7L)
  }

  test("meanPool averages vectors element-wise per group") {
    import spark.implicits._
    val d = Seq(
      (1L, vec(1.0, 3.0)), (1L, vec(3.0, 5.0)), (2L, vec(10.0, 20.0)))
      .toDF("doc", "embedding")
    val got = Clustering.meanPool(d, "doc", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Double](1), r.getLong(2)))).toMap
    assert(got(1L)._1 == Seq(2.0, 4.0) && got(1L)._2 == 2L)
    assert(got(2L)._1 == Seq(10.0, 20.0) && got(2L)._2 == 1L)
    // inconsistent dims fail fast, not silently truncate
    val bad = Seq((1L, vec(1.0)), (1L, vec(1.0, 2.0))).toDF("doc", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Clustering.meanPool(bad, "doc", "embedding").collect()
    }
    assert(graft.util.Errors.rootCause(e).getMessage.contains("mixes dims"))
  }

  test("string id / group columns are rejected up front, not null-cast") {
    import spark.implicits._
    val d = Seq(("a", vec(1.0, 2.0))).toDF("doc", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Clustering.kmeansFit(d, "doc", "embedding", k = 1, iters = 1)
    }
    assert(e1.getMessage.contains("integral id"))
    val e2 = intercept[IllegalArgumentException] {
      Clustering.meanPool(d, "doc", "embedding")
    }
    assert(e2.getMessage.contains("integral id"))
  }

  test("kmeans on empty input fails fast with a clear message") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansFit(empty, "vec_id", "embedding", k = 2, iters = 1)
    }
    assert(e.getMessage.contains("empty input"))
    // ...but the composable dedup pass returns an empty pair frame
    assert(Clustering.semDedup(empty, "vec_id", "embedding", k = 2,
      threshold = 0.9).count() == 0L)
  }
}
