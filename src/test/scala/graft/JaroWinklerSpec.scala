package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler: value-pinned against the oracle engine's scorer
  * (the literals below are DuckDB `jaro_winkler_similarity` outputs,
  * probed on the exact byte semantics the expression implements) and
  * whole-stage-codegen participation on a parquet-backed plan. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches the oracle scorer bit-for-bit on the probe set") {
    // textbook pairs
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("hello world", "world hello") == 0.503030303030303)
    // boost threshold: jaro <= 0.7 gets NO prefix boost
    assert(jw("abcdzzzzzz", "abcdyyyyyy") == 0.6)
    assert(jw("abhhhh", "abzzzz") == 0.5555555555555555)
    assert(jw("ab", "abcdefghij") == 0.7866666666666667)
    // window 0 edge: adjacent transposition of a 2-char string never matches
    assert(jw("ab", "ba") == 0.0)
    // odd positional-mismatch count → INTEGER halving (t = 1, not 1.5)
    assert(jw("abcxxx", "bcaxxx") == 0.9444444444444445)
    // byte (not codepoint) semantics: 2-byte ü never matches 1-byte u
    assert(jw("ü", "u") == 0.0)
    assert(jw("café", "cafe") == 0.8483333333333334)
    // empties are 0 even for equal inputs; identity otherwise 1
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("abcd", "abcd") == 1.0)
    assert(jw("ab", "a") == 0.8500000000000001)
  }

  test("symmetry and bounds on random strings") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefg "
    def rs(): String =
      (0 until 1 + rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (rs(), rs())
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      assert(s >= 0.0 && s <= 1.0, s"out of bounds on ($a, $b): $s")
      if (a == b) assert(s == 1.0)
    }
  }

  test("stays inside whole-stage codegen on a parquet-backed plan") {
    val p = Tables.part(spark, sf())
    val plan = p.select(
        JaroWinkler.jaroWinkler(lower($"p_name"), $"p_type").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"jaro_winkler fell out of codegen:\n$plan")
    assert(plan.contains("jaro_winkler"), plan)
  }
}
