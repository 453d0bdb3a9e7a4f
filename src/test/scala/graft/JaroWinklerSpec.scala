package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler

/** Jaro-Winkler against the literature's canonical values (Winkler 1990
  * examples) plus structural properties. */
class JaroWinklerSpec extends SparkTestBase {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(round(JaroWinkler.jaroWinkler(col("a"), col("b")), 4))
      .head().getDouble(0)

  test("canonical pairs match the published values") {
    assert(jw("MARTHA", "MARHTA") === 0.9611)
    assert(jw("DIXON", "DICKSONX") === 0.8133)
    assert(jw("DWAYNE", "DUANE") === 0.84)
    // exact value 0.896296…: the often-quoted 0.8962 is truncated
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8963)
  }

  test("identity, symmetry, and disjoint strings") {
    assert(jw("spark", "spark") === 1.0)
    assert(jw("", "") === 1.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "xyz") === 0.0)
    val pairs = Seq(("martha", "marhta"), ("red widget", "red gadget"))
    pairs.foreach { case (a, b) => assert(jw(a, b) === jw(b, a)) }
  }

  test("prefix boost only fires above the 0.7 jaro threshold") {
    // shared prefix but low overall similarity: score stays plain jaro
    val lowSim = jw("abcdefgh", "abzzzzzz")
    assert(lowSim < 0.75)
    // high-similarity shared-prefix pair scores above its transposed twin
    assert(jw("prefixes", "prefixed") > jw("refixesp", "refixedp") - 1e-9)
  }

  test("fuzzy part names rank same-noun variants above unrelated names") {
    val same = jw("red widget", "hot widget")
    val diff = jw("red widget", "blue bolt")
    assert(same > diff)
  }
}
