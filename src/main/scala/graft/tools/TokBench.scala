package graft.tools

/** Microbenchmark: hand-rolled [[graft.pipeline.TextAnalysis.fastTokens]]
  * vs `trim.split("\\s+")` on a synthetic corpus — quantifies the
  * tokenizer in ISOLATION, separate from the shuffles that dominate the
  * end-to-end dedup queries. Usage: runMain graft.tools.TokBench
  */
object TokBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val words = Array.fill(5000)(
      rnd.alphanumeric.take(2 + rnd.nextInt(9)).mkString)
    val docs = Array.fill(5000)(
      (0 until (50 + rnd.nextInt(400)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach(_ => f) // warm-up
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val s = f
        ((System.nanoTime() - t0) / 1e6, s)
      }
      println(f"$label best ${runs.map(_._1).min}%.1f ms " +
        s"(checksum ${runs.head._2})")
    }
    time("regex trim.split(\\s+):") {
      docs.map(d => d.trim.split("\\s+").length.toLong).sum
    }
    time("fastTokens:            ") {
      docs.map(d => graft.pipeline.TextAnalysis.fastTokens(d).length.toLong).sum
    }
  }
}
