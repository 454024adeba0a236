package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {

  // vectors probed against DuckDB's jaro_similarity /
  // jaro_winkler_similarity (the oracle engine)
  private val vectors = Seq(
    ("MARTHA", "MARHTA", 0.9444444444444445, 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.7666666666666666, 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964, 0.8962962962962964),
    ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
    ("DwAyNE", "DuANE", 0.8222222222222223, 0.8400000000000001),
    ("arnab", "urban", 0.6, 0.6),
    // boost threshold: jaro 0.5 <= 0.7, prefix 2 -> NO winkler boost
    ("aaxxxxxx", "aayyyyyy", 0.5, 0.5),
    // prefix cap at 4
    ("abcdx", "abcdy", 0.8666666666666667, 0.92),
    ("aaaaaaaaaab", "aaaaaaaaaac", 0.9393939393939394, 0.9636363636363636),
    // zero-window / degenerate cases
    ("ab", "ba", 0.0, 0.0),
    ("abc", "abc", 1.0, 1.0),
    ("a", "a", 1.0, 1.0),
    ("x", "y", 0.0, 0.0),
    ("", "abc", 0.0, 0.0),
    ("", "", 0.0, 0.0))

  test("jaro/jaroWinkler match the DuckDB-probed reference vectors") {
    vectors.foreach { case (a, b, j, jw) =>
      assert(math.abs(JaroWinkler.jaro(a, b) - j) < 1e-12, s"jaro($a,$b)")
      assert(math.abs(JaroWinkler.jaroWinkler(a, b) - jw) < 1e-12,
        s"jw($a,$b)")
      // symmetry
      assert(JaroWinkler.jaro(a, b) == JaroWinkler.jaro(b, a))
      assert(JaroWinkler.jaroWinkler(a, b) == JaroWinkler.jaroWinkler(b, a))
    }
  }

  test("column builders evaluate inside the plan and propagate nulls") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("abc", null)).toDF("a", "b")
    val got = df.select(JaroWinkler.winkler(col("a"), col("b")).as("jw"),
      JaroWinkler.of(col("a"), col("b")).as("j")).collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(got(0).getDouble(1) - 0.9444444444444445) < 1e-12)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("bounds and identity properties hold on random strings") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until 1 + rnd.nextInt(12))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    (1 to 500).foreach { _ =>
      val a = word(); val b = word()
      val j = JaroWinkler.jaro(a, b)
      val jw = JaroWinkler.jaroWinkler(a, b)
      assert(j >= 0.0 && j <= 1.0 && jw >= 0.0 && jw <= 1.0, s"$a/$b")
      assert(jw >= j - 1e-15, s"winkler must not decrease: $a/$b")
      assert(JaroWinkler.jaro(a, a) == 1.0)
    }
  }
}
