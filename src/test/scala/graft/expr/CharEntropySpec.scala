package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CharEntropySpec extends SparkSpec {

  private def h(s: String) = CharEntropy.entropy(UTF8String.fromString(s))

  test("entropy matches closed forms: uniform, constant, empty") {
    assert(h("") == 0.0)
    assert(h("aaaa") == 0.0)
    assert(math.abs(h("ab") - 1.0) < 1e-12)       // 2 equiprobable -> 1 bit
    assert(math.abs(h("abcd") - 2.0) < 1e-12)     // 4 -> 2 bits
    // 3:1 split: -(0.75 log2 0.75 + 0.25 log2 0.25)
    val exp = -(0.75 * math.log(0.75) / math.log(2.0) +
      0.25 * math.log(0.25) / math.log(2.0))
    assert(math.abs(h("aaab") - exp) < 1e-12)
    // permutation invariance up to fp: same multiset, same value order
    // (first-appearance iteration differs but sums agree to ulps)
    assert(math.abs(h("abab") - h("baba")) < 1e-12)
  }

  test("astral codepoints count once; natural text sits in 3.5-5 bits") {
    assert(h("😀😀") == 0.0) // two identical emoji
    assert(math.abs(h("😀a") - 1.0) < 1e-12)
    val prose = "the quick brown fox jumps over the lazy dog"
    assert(h(prose) > 3.5 && h(prose) < 5.0)
  }

  // SQL registration (graft_char_entropy) is covered in ExtensionsSpec,
  // which builds a session WITH GraftExtensions installed
  test("column form stays in codegen") {
    import spark.implicits._
    val df = Seq("abcd", "aaaa").toDF("t")
    val got = df.select(CharEntropy.of(col("t"))).as[Double]
      .collect().toSeq
    assert(got == Seq(2.0, 0.0))
    // a LocalTableScan folds the projection away — use range() so the
    // executed plan really carries the expression in codegen
    val codegen = spark.range(2)
      .select(CharEntropy.of(concat(lit("ab"), col("id"))).as("h"))
    val plan = codegen.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_char_entropy"), plan)
    assert(codegen.as[Double].collect()
      .forall(v => math.abs(v - math.log(3.0) / math.log(2.0)) < 1e-12))
  }
}
