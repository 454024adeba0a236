package graft.pipeline

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val people = Seq(
    (1L, "NY", "M", 100.0), (2L, "NY", "M", 200.0), (3L, "NY", "M", 50.0),
    (4L, "NY", "F", 10.0), (5L, "NY", "F", 20.0),
    (6L, "LA", "M", 30.0), // singleton group
    (7L, "SF", null, 40.0), (8L, "SF", null, 60.0)) // null quasi value

  test("violations lists exactly the groups under k (nulls grouped)") {
    val df = people.toDF("id", "city", "sex", "bal")
    val got = Privacy.kAnonymityViolations(df, Seq("city", "sex"), k = 3)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("NY", "F", 2L), ("LA", "M", 1L), ("SF", null, 2L)))
  }

  test("kAnonymize nulls quasi columns on violating rows only") {
    val df = people.toDF("id", "city", "sex", "bal")
    val out = Privacy.kAnonymize(df, Seq("city", "sex"), k = 3)
      .as[(Long, String, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // surviving group (NY, M) keeps its values
    assert(out(1L) === (("NY", "M", 100.0)))
    // violating groups suppressed, other columns intact
    assert(out(4L) === ((null, null, 10.0)))
    assert(out(6L) === ((null, null, 30.0)))
    assert(out(7L) === ((null, null, 40.0)))
    // the released table is k-anonymous on the quasi columns
    val rel = Privacy.kAnonymize(df, Seq("city", "sex"), k = 3)
    val minN = rel.groupBy("city", "sex").count()
      .agg(org.apache.spark.sql.functions.min("count")).as[Long].head()
    assert(minN >= 3L)
  }

  test("suppressRare replaces sub-threshold values, keeps nulls null") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (5L, null), (6L, "c"), (7L, "c")).toDF("id", "v")
    val got = Privacy.suppressRare(df, "v", minCount = 2L)
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "OTHER",
      5L -> null, 6L -> "c", 7L -> "c"))
  }

  test("lDiversityViolations: groups with too few distinct sensitive values") {
    // (NY, M): bals 100/200/50 -> 3 distinct; (NY, F): 10/10 -> 1 distinct;
    // (SF, null): 40/null -> 1 distinct (nulls are not a sensitive value)
    val rows = Seq(
      (1L, "NY", "M", "flu"), (2L, "NY", "M", "cold"), (3L, "NY", "M", "flu"),
      (4L, "NY", "F", "flu"), (5L, "NY", "F", "flu"),
      (6L, "LA", "M", "cold"),
      (7L, "SF", null, "flu"), (8L, "SF", null, null))
    val df = rows.toDF("id", "city", "sex", "dx")
    val got = Privacy.lDiversityViolations(df, Seq("city", "sex"), "dx", 2)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("NY", "F", 1L), ("LA", "M", 1L), ("SF", null, 1L)))
    // l=4: every group violates; (NY, M) reports its true distinct count
    val all = Privacy.lDiversityViolations(df, Seq("city", "sex"), "dx", 4)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(all(("NY", "M")) === 2L)
  }

  test("dpCounts: noise replays the md5 inverse-CDF draw exactly") {
    def noiseFor(key: String, eps: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val u = (h.toDouble + 0.5) / 1.152921504606846976e18
      -1.0 / eps * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "g")
    val got = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = 42L)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("x")._1 === 2L && got("y")._1 === 1L)
    assert(got("x")._2 === 2.0 + noiseFor("42x", 0.5))
    assert(got("y")._2 === 1.0 + noiseFor("42y", 0.5))
    // reproducible; seed changes the draw
    val again = Privacy.dpCounts(df, Seq("g"), 0.5, 42L)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(again("x") === got("x")._2)
    val other = Privacy.dpCounts(df, Seq("g"), 0.5, 43L)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(other("x") !== got("x")._2)
    intercept[IllegalArgumentException](Privacy.dpCounts(df, Seq(), 0.5, 1L))
    intercept[IllegalArgumentException](
      Privacy.dpCounts(df, Seq("g"), 0.0, 1L))
  }

  test("tCloseness: variational distance with absent values folded") {
    // global dist over sex (non-null): M 4/6, F 2/6
    // NY: M 3/5, F 2/5 → 0.5*(|3/5−4/6| + |2/5−2/6|) = 0.5*(1/15+1/15)
    // LA: M only → 0.5*(|1−4/6| + 2/6) = 1/3 (absent F contributes q)
    val df = people.toDF("id", "city", "sex", "bal")
    val got = Privacy.tCloseness(df, Seq("city"), "sex")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set("NY", "LA")) // SF rows have null sensitive
    assert(got("NY")._1 === 5L && math.abs(got("NY")._2 - 1.0 / 15) < 1e-12)
    assert(got("LA")._1 === 1L && math.abs(got("LA")._2 - 1.0 / 3) < 1e-12)
    val viol = Privacy.tClosenessViolations(df, Seq("city"), "sex", t = 0.2)
      .as[(String, Long, Double)].collect()
    assert(viol.map(_._1).toSeq === Seq("LA"))
  }

  test("tClosenessOrdered: EMD matches the hand cumulative computation") {
    // values: 1 (×2), 2 (×1), 3 (×1) globally → q = (.5, .25, .25), m=3
    // group A holds both 1s: p=(1,0,0); cum diffs: .5, .25, 0 → EMD=.375
    // group B holds one 2, one 3: p=(0,.5,.5); cums: −.5, −.25, 0 → .375
    val df = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 3.0))
      .toDF("g", "v")
    val got = Privacy.tClosenessOrdered(df, Seq("g"), "v")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(got("A") - 0.375) < 1e-12)
    assert(math.abs(got("B") - 0.375) < 1e-12)
    // null quasi values form their own group (null-safe grid join)
    val withNull = Seq((Some("A"), 1.0), (None, 1.0), (None, 3.0))
      .toDF("g", "v")
    val gn = Privacy.tClosenessOrdered(withNull, Seq("g"), "v")
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    // null group p=(.5,.5) vs q=(2/3,1/3): cums −1/6 then 0; m−1=1 → 1/6
    assert(math.abs(gn(None) - 1.0 / 6) < 1e-12)
  }

  test("tCloseness parameter validation") {
    val df = people.toDF("id", "city", "sex", "bal")
    intercept[IllegalArgumentException](
      Privacy.tCloseness(df, Seq.empty, "sex"))
    intercept[IllegalArgumentException](
      Privacy.tCloseness(df, Seq("sex"), "sex"))
    intercept[IllegalArgumentException](
      Privacy.tClosenessViolations(df, Seq("city"), "sex", t = 1.0))
    // constant sensitive column refused on the ordered path
    intercept[IllegalArgumentException](
      Privacy.tClosenessOrdered(
        Seq(("A", 1.0), ("B", 1.0)).toDF("g", "v"), Seq("g"), "v"))
    intercept[IllegalArgumentException](
      Privacy.tClosenessOrdered(df, Seq("city"), "bal", maxUniverse = 2))
  }

  test("parameter validation") {
    val df = people.toDF("id", "city", "sex", "bal")
    intercept[IllegalArgumentException](
      Privacy.kAnonymityViolations(df, Seq.empty, 3))
    intercept[IllegalArgumentException](
      Privacy.kAnonymize(df, Seq("city"), 1))
    intercept[IllegalArgumentException](
      Privacy.suppressRare(df, "city", 0L))
    intercept[IllegalArgumentException](
      Privacy.lDiversityViolations(df, Seq("city"), "city", 2))
    intercept[IllegalArgumentException](
      Privacy.lDiversityViolations(df, Seq("city"), "bal", 1))
  }
}
