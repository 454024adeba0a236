package graft.util

import java.nio.file.{Files, Path}

/** Per-JVM scratch directories for queries that write files (persisted
  * indexes, ingestion round-trips). Two problems with bare
  * `Files.createTempDirectory` / fixed `/tmp` paths (r12 VERDICT #4 +
  * ADVICE):
  *
  *  - accumulation: every Verify/Bench invocation leaves its index
  *    directories behind, so /tmp occupancy grows round over round and
  *    the two file-WRITING bench rows (q_geo_index, q_geo_append) end up
  *    tracking the filesystem's mood instead of the operator;
  *  - races: a fixed path (the old /tmp/graft_ingest/<dataset>) lets two
  *    drivers running concurrently on the same dataset read each other's
  *    half-overwritten output.
  *
  * Everything here lives under ONE random per-JVM root that a shutdown
  * hook deletes recursively — each run starts with a clean slate and
  * leaves none, and two JVMs can never collide. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r.toFile)))
    r
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(); ()
  }

  /** A fresh unique directory under the per-JVM root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  /** A DETERMINISTIC subpath under the per-JVM root — stable across a
    * query's warm-up and timed runs inside one JVM (so `overwrite`
    * writes reuse it), unique across JVMs (no cross-driver race). The
    * path is returned unmade; writers create it. */
  def named(sub: String): String = root.resolve(sub).toString
}
