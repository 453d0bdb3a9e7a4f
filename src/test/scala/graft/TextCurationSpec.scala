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

  test("bigramPerplexity: corpus-typical transitions score lower ppl than scrambled text; hand-check on a 2-doc corpus") {
    // fluent docs repeat the corpus's own transitions; the scrambled doc
    // pays the smoothing penalty on transitions never seen elsewhere
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat"),
      (4L, "rug dog the on mat sat")).toDF("doc_id", "text")
    val ppl = TextAnalysis.bigramPerplexity(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl.size === 4)
    assert(ppl(4L) > ppl(1L) && ppl(4L) > ppl(2L) && ppl(4L) > ppl(3L),
      s"scrambled doc must score worst: $ppl")
    // exact hand-check, tiny corpus: docs "a b" and "a b" →
    // bigram (a b) count 2, prefix (a) count 2, V = 2, k = 0.5:
    // P = (2+0.5)/(2+0.5·2) = 2.5/3 → ppl = 3/2.5 = 1.2
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val p = TextAnalysis.bigramPerplexity(tiny, "text", "doc_id")
      .collect().map(_.getDouble(2))
    p.foreach(v => assert(math.abs(v - 1.2) < 1e-12, s"expected 1.2, got $v"))
    // sub-2-token docs carry no bigram and are excluded
    val short = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramPerplexity(short, "text", "doc_id")
      .count() === 1L)
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

  test("rrfFuse matches hand-computed fusion: shared ids sum legs, missing legs contribute zero, topK cuts") {
    val kw = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val fused = TextAnalysis.rrfFuse(Seq("kw" -> kw, "vec" -> vec),
      rrfK = 60, topK = 3).collect()
    // doc 20: 1/62 + 1/61 = 0.032522; doc 10: 1/61 = 0.016393;
    // doc 40: 1/62 = 0.016129; doc 30: 1/63 = 0.015873 (cut by topK=3)
    assert(fused.map(_.getLong(0)).toSeq === Seq(20L, 10L, 40L))
    assert(fused.head.getDouble(1) === math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6)
    // rank columns surface per leg, null when the leg missed the id
    val d40 = fused.find(_.getLong(0) === 40L).get
    assert(d40.isNullAt(2) && d40.getLong(3) === 2L)
    // deterministic tiebreak: equal rrf orders by id
    val tied = TextAnalysis.rrfFuse(
      Seq("a" -> Seq((5L, 1), (3L, 1)).toDF("id", "rank")), topK = 2)
      .collect()
    assert(tied.map(_.getLong(0)).toSeq === Seq(3L, 5L))
  }

  test("hybrid RRF served from the PQ index overlaps the exact fusion (leg-for-leg swap contract)") {
    val sfd = sfDir
    val exact = graft.queries.TextVectorQueries.q105HybridRrf
      .run(spark, sfd).select("id").collect().map(_.getLong(0)).toSet
    val served = graft.queries.TextVectorQueries.q105cHybridRrfAnn
      .run(spark, sfd).select("id").collect().map(_.getLong(0)).toSet
    assert(served.size === 10 && exact.size === 10)
    // the served vector leg excludes the query doc and approximates the
    // ranking (PQ recall 0.96+ at shipped params), so demand strong but
    // not perfect agreement of the fused top-10
    val overlap = (exact intersect served).size
    assert(overlap >= 7, s"fused top-10 overlap only $overlap/10 — the " +
      "served ANN leg no longer substitutes for the exact leg")
  }
}
