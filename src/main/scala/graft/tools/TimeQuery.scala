package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single named query (noop sink, best of N) — the per-query probe
  * Bench doesn't give you without a full run.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName> [runs]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names probe several queries in one JVM (bench-style
    // isolation between them); an untimed warm-up run precedes each
    // query's timed runs so run 1 isn't measuring JIT/classload
    name.split(',').filter(_.nonEmpty).foreach { q =>
      val fn = graft.Queries.queries(q)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"query":"$q","best":${times.min}%.3f,"runs":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
