package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  // two sub-languages with disjoint vocabulary: raw carries both, the
  // target corpus carries only lang-A — DSIR should rank A-docs above
  // B-docs by construction
  lazy val raw = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma alpha delta"),
      (1L, "beta gamma delta alpha beta"),
      (2L, "zork quux blarg zork frobnitz"),
      (3L, "quux blarg frobnitz zork quux"),
      (4L, "alpha zork beta quux"), // mixed
      (5L, "1234 5678")             // no alphabetic tokens -> absent
    ).toDF("doc_id", "text")
  }
  lazy val target = {
    import spark.implicits._
    Seq(
      (10L, "alpha beta gamma delta alpha"),
      (11L, "beta alpha delta gamma beta")
    ).toDF("doc_id", "text")
  }

  private val B = 10000
  private val addK = 0.5

  /** JVM mirror of Dsir's featurization: md5-60-bit bucket of unigrams +
    * space-joined bigrams, same basis as the DuckDB oracle. */
  private def bucketsOf(text: String): Seq[Long] = {
    val ts = LanguageModel.tokenize(text)
    val grams = ts.toSeq ++ (1 until ts.length).map(i => ts(i - 1) + " " + ts(i))
    grams.map { g =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val hex = md.take(8).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % B
    }
  }

  private def bruteLogw(): Map[Long, (Long, Double)] = {
    import scala.jdk.CollectionConverters._
    val rawDocs = raw.select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> bucketsOf(r.getString(1)))
      .filter(_._2.nonEmpty)
    val tgtDocs = target.select("text").collectAsList().asScala
      .flatMap(r => bucketsOf(r.getString(0)))
    val qc = rawDocs.flatMap(_._2).groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val pc = tgtDocs.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val tq = qc.values.sum.toDouble
    val tp = pc.values.sum.toDouble
    def w(b: Long): Double =
      math.log((pc.getOrElse(b, 0L) + addK) / (tp + addK * B)) -
        math.log((qc(b) + addK) / (tq + addK * B))
    rawDocs.map { case (id, bs) =>
      id -> (bs.size.toLong,
        bs.groupBy(identity).map { case (b, v) => v.size * w(b) }.sum)
    }.toMap
  }

  test("dsirScores matches the brute-force importance log-ratio") {
    val got = Dsir.dsirScores(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = bruteLogw()
    assert(got.keySet == want.keySet)
    assert(!got.contains(5L)) // token-free doc absent
    want.foreach { case (id, (n, lw)) =>
      assert(got(id)._1 == n, s"n_grams for $id")
      assert(math.abs(got(id)._2 - lw) < 1e-9, s"logw for $id: ${got(id)._2} vs $lw")
    }
  }

  test("dsirScores ranks target-like docs above target-unlike docs") {
    val s = Dsir.dsirScores(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val aMin = math.min(s(0L), s(1L))
    val bMax = math.max(s(2L), s(3L))
    assert(aMin > bMax, s"target-language docs must outscore: $s")
    assert(s(4L) > bMax && s(4L) < aMin, s"mixed doc sits between: $s")
  }

  test("dsirResample is deterministic, selects top-k by gumbel key") {
    val r1 = Dsir.dsirResample(raw, target, "doc_id", "text", k = 3)
      .collect().map(_.getLong(0)).toSeq
    val r2 = Dsir.dsirResample(raw, target, "doc_id", "text", k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(r1 == r2, "resample must be reproducible")
    assert(r1.size == 3 && r1.distinct.size == 3)
    // the selected set is the top-3 of the full scored frame by the same key
    val all = Dsir.dsirResample(raw, target, "doc_id", "text", k = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(3))
    val want = all.sortBy { case (id, key) => (-key, id) }.take(3).map(_._1).toSet
    assert(r1.toSet == want)
  }
}
