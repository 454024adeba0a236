package graft.util

import org.apache.spark.sql.DataFrame

/** Bounded lifecycle for the caches the fuzzy/basket operators create
  * (FuzzyJoin strs/reps/members/repPairs, Basket bi/marg/basketAgg):
  * those frames are consumed by the RETURNED lazy plan, so there is no
  * sound in-method unpersist point — but a long-running ingestion loop
  * calling the ops per batch would otherwise accumulate storage until
  * Spark's own eviction churns.
  *
  * Every such cache registers here; the registry keeps a FIFO of the
  * most recent `spark.graft.opCacheMax` (default 16) entries and
  * unpersists the oldest beyond that (non-blocking). Eviction is always
  * SAFE — Spark recomputes an unpersisted frame — it only costs speed,
  * and only when a caller materializes an op's output more than ~4
  * invocations after building it (each fuzzy/basket call registers 3-4
  * frames). Note the FuzzyJoin optimization barrier (repPairs) is one
  * of these caches: evicting it before first materialization would let
  * the planner re-fuse the verify into the expansion stage — another
  * reason callers should materialize op outputs promptly.
  *
  * `clear()` drops everything now — the explicit between-batches hook
  * for ingestion loops (see the README pipeline example).
  */
object CacheRegistry {

  private val entries =
    scala.collection.mutable.Queue.empty[(String, DataFrame)]

  private def maxEntries(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.graft.opCacheMax", "16").toInt

  /** Cache `df` and register it under `tag`; evict (unpersist) the
    * oldest registered caches beyond the cap. Returns the cached df. */
  def cached(tag: String, df: DataFrame): DataFrame = synchronized {
    val c = df.cache()
    entries.enqueue(tag -> c)
    val cap = math.max(1, maxEntries(df))
    while (entries.size > cap) entries.dequeue()._2.unpersist(blocking = false)
    c
  }

  /** Unpersist every registered cache now (between-batches hook). */
  def clear(): Unit = synchronized {
    entries.foreach(_._2.unpersist(blocking = false))
    entries.clear()
  }

  /** Currently-registered cache count (spec / diagnostics). */
  def size: Int = synchronized(entries.size)
}
