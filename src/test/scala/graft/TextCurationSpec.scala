package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Hand-computed values for the repetition and PII primitives. */
class TextCurationSpec extends SparkTestBase {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).head().getAs[T]("v")

  test("topBigramFraction finds the dominant bigram share") {
    // "a b a b a" → bigrams [a b, b a, a b, b a] → top run 2 of 4
    assert(one[Double](TextAnalysis.topBigramFraction(col("t")), "a b a b a") === 0.5)
    // all-distinct bigrams → 1/3
    val v = one[Double](TextAnalysis.topBigramFraction(col("t")), "a b c d")
    assert(math.abs(v - 1.0 / 3.0) < 1e-12)
    // fewer than 2 tokens → no bigrams → 0
    assert(one[Double](TextAnalysis.topBigramFraction(col("t")), "solo") === 0.0)
  }

  test("duplicateTokenFraction counts repeated tokens") {
    val v = one[Double](TextAnalysis.duplicateTokenFraction(col("t")), "a a b")
    assert(math.abs(v - (1.0 - 2.0 / 3.0)) < 1e-12)
    assert(one[Double](TextAnalysis.duplicateTokenFraction(col("t")), "x y z") === 0.0)
  }

  test("redactPii replaces emails and phones and is idempotent") {
    val in = "mail me at jo.doe+x@ex-amp.le.org or call 555-123-4567 now"
    val out = one[String](TextAnalysis.redactPii(col("t")), in)
    assert(out === "mail me at <EMAIL> or call <PHONE> now")
    assert(one[String](TextAnalysis.redactPii(lit(out)), "ignored") === out)
    // non-PII dashes/at-signs survive
    val clean = "well-known @mention 12-34 x"
    assert(one[String](TextAnalysis.redactPii(col("t")), clean) === clean)
  }
}
