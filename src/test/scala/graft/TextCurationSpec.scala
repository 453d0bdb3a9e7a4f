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

  test("gopherFlags: each rule trips on its crafted failure and stays quiet on a clean document") {
    def flags(text: String): Map[String, Boolean] = {
      val r = Seq(text).toDF("t")
        .select(TextAnalysis.gopherFlags(col("t")).as("g"))
        .select(col("g.*")).head()
      r.schema.fieldNames.filter(_.startsWith("fail_"))
        .map(f => f -> r.getAs[Boolean](f)).toMap
    }
    val clean = "the quick brown fox jumps over that lazy dog and then " +
      "keeps running with great speed through the field of autumn wheat " +
      "until evening light fades away into the quiet hills"
    assert(flags(clean).values.forall(_ == false), s"clean doc: ${flags(clean)}")
    // each crafted failure trips EXACTLY its own rule relative to clean
    def trips(text: String, rule: String): Unit = {
      val f = flags(text)
      assert(f(rule), s"$rule should fail: $f")
    }
    trips(clean.split(" ").take(10).mkString(" "), "fail_word_count")
    trips(Seq.fill(30)("a").mkString(" ") + " the be", "fail_mean_word_len")
    trips(clean + " " + Seq.fill(10)("#").mkString(" "), "fail_symbol_ratio")
    trips("- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight" +
      "\n- nine\n- ten the of words words words words words words words " +
      "words words words\n- x\n- y\n- z\n- w\n- v\n- u\n- t\n- s\n- r\n- q" +
      "\n- p\n- o\n- n\n- m\n- l\n- k\n- j\n- i", "fail_bullet_lines")
    trips(clean + "\nand so it goes...", "fail_ellipsis_lines")
    trips(clean + " " + (100 to 160).mkString(" "), "fail_alpha_words")
    trips("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon", "fail_stopwords")
    // integer threshold edges: exactly 90% bullets passes, one more fails
    val nineOfTen = ("head line" +: Seq.fill(9)("- b")).mkString("\n")
    assert(!flags(nineOfTen + " the of twenty one two three four five six " +
      "seven eight nine ten eleven twelve")("fail_bullet_lines"))
    // mean word length exactly 3.0 passes (sumLen == 3n)
    assert(!flags(Seq.fill(25)("the").mkString(" "))("fail_mean_word_len"))
  }

  test("cleanLines keeps only >=3-word terminal-punctuation lines and rejoins with newlines") {
    def clean(t: String): String =
      one[String](TextAnalysis.cleanLines(col("t")), t)
    val page = "Home | About | Contact\n" +
      "This paragraph is real prose that survives the cleaner.\n" +
      "click here\n" +
      "Another good sentence ends with a question mark?\n" +
      "- nav item\n" +
      "Trailing spaces still count as terminal.   \n" +
      "short one."
    assert(clean(page) ===
      "This paragraph is real prose that survives the cleaner.\n" +
        "Another good sentence ends with a question mark?\n" +
        "Trailing spaces still count as terminal.   ")
    assert(clean("no punctuation here at all") === "")
    assert(clean("") === "")
    // quote-terminated dialogue survives (C4 keeps end quotes)
    assert(clean("He said \"stop right there.\"") ===
      "He said \"stop right there.\"")
    // idempotent: cleaning cleaned text changes nothing
    assert(clean(clean(page)) === clean(page))
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

  test("BPE pair counting matches the hand-computed merge table on a tiny corpus") {
    // words: ab ×2, abc ×1 → pairs ab: 2+1 = 3, bc: 1; 1-char words
    // contribute nothing
    import org.apache.spark.sql.functions.{col, expr, explode, length, lit, sum, count, lower}
    val d = Seq("ab ab a", "abc").toDF("text")
    val words = d.select(explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val pairs = words.filter(length(col("w")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("occ"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pairs === Map("ab" -> 3L, "bc" -> 1L))
  }

  test("source drift: an identically-distributed source scores near zero KL, a disjoint-vocab source scores high") {
    import org.apache.spark.sql.functions.col
    // sources a and b share one distribution; source z is disjoint
    val rows = Seq.tabulate(50)(i => (i.toLong, s"tok${i % 10} tok${i % 7}", "en", "a", 10L)) ++
      Seq.tabulate(50)(i => (100L + i, s"tok${i % 10} tok${i % 7}", "en", "b", 10L)) ++
      Seq.tabulate(50)(i => (200L + i, s"zzz${i % 10} zzz${i % 7}", "en", "z", 10L))
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val kl = graft.queries.TextVectorQueries.q120SourceDrift.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl.keySet === Set("a", "b", "z"))
    kl.values.foreach(v => assert(v >= 0.0, s"KL must be non-negative: $kl"))
    assert(math.abs(kl("a") - kl("b")) < 1e-9, s"identical sources must tie: $kl")
    assert(kl("z") > kl("a") + 0.3, s"disjoint-vocab source must drift: $kl")
  }

  test("curriculum schedule anneals: head bucket always full, tail opens up epoch over epoch, rerun-deterministic") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.TextVectorQueries.q121CurriculumSchedule
      .run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getInt(4))).toMap
    // head bucket targets 100 % in every epoch
    (1 to 3).foreach(e => assert(out((e, 1))._2 === 100))
    // the tail's target rate is monotone across epochs and its kept
    // count non-decreasing
    assert(out((1, 3))._2 < out((2, 3))._2 && out((2, 3))._2 < out((3, 3))._2)
    assert(out((1, 3))._1 <= out((2, 3))._1 && out((2, 3))._1 <= out((3, 3))._1)
    // deterministic membership: a second run reproduces every count
    val again = graft.queries.TextVectorQueries.q121CurriculumSchedule
      .run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    out.foreach { case (k, (docs, _)) => assert(again(k) === docs) }
  }

  test("BPE training replays the Sennrich example: greedy merges, count-then-lexicographic tie-breaks") {
    import spark.implicits._
    // the classic fixture (no end-of-word marker): expected rounds are
    // hand-computed — r1 (e,s) 9 beats (s,t) 9 on the lexicographic
    // tie; r2 (es,t) 9 after the merge changes the pair landscape;
    // r3 (l,o) 7 beats (o,w) 7 on the tie again
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "n")
    val merges = TextAnalysis.bpeTrainMerges(words, "w", "n", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(merges === Seq((1, "es", 9L), (2, "est", 9L), (3, "lo", 7L)))
    // greedy left-to-right on repeats: "aaaa"×1 merges (a,a) to TWO
    // occurrences in round 1 (non-overlapping), then (aa,aa) in round 2
    val rep = Seq(("aaaa", 1L)).toDF("w", "n")
    val m2 = TextAnalysis.bpeTrainMerges(rep, "w", "n", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(m2 === Seq((1, "aa", 3L), (2, "aaaa", 1L)))
  }

  test("winnowing selects window minima with full coverage; gram hashes bit-match the codegen expression") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"), // 10 grams at k=3
      (2L, "a b c"),                   // exactly 1 gram
      (3L, "a b"),                     // < k tokens: no gram
      (4L, "x x x x x x x x"),         // all-equal gram hashes: tie city
      (5L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val k = 3; val w = 4
    val rows = docs.select(col("doc_id"),
        TextAnalysis.gramHashSeq(TextAnalysis.tokens(col("text")), k).as("g"),
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("sel"),
        array_sort(array_distinct(
          TextAnalysis.shingleSet(col("text"), k))).as("shSorted"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[org.apache.spark.sql.Row](2),
         r.getSeq[Long](3))).toMap
    // doc 3: below k tokens → no grams, no fingerprints
    assert(rows(3L)._1.isEmpty && rows(3L)._2.isEmpty)
    // doc 2: one gram → that gram is the single fingerprint at pos 1
    assert(rows(2L)._2.map(s => (s.getLong(0), s.getInt(1))) ===
      Seq((rows(2L)._1.head, 1)))
    // bit-parity: ordered builtin-xxhash64 grams = codegen shingle set
    Seq(1L, 2L, 4L, 5L).foreach { id =>
      assert(rows(id)._1.distinct.sorted === rows(id)._3.toList,
        s"doc $id gram-hash chains diverge")
    }
    // doc 4: identical gram hashes → each window's leftmost min is its
    // own start, so the selections are exactly the window starts
    // (8 tokens → 6 grams → 3 windows at w=4)
    assert(rows(4L)._2.map(_.getInt(1)).toList === List(1, 2, 3))
    // winnowing guarantee replayed in Scala for the long docs: every
    // window of w grams contains a selected position, every selection
    // is a leftmost window minimum
    Seq(1L, 5L).foreach { id =>
      val (g, sel, _) = rows(id)
      val pos = sel.map(_.getInt(1)).toSet
      (1 to g.size - w + 1).foreach { j =>
        assert((j until j + w).exists(pos.contains),
          s"doc $id window $j uncovered")
      }
      sel.foreach { s =>
        val (h, p) = (s.getLong(0), s.getInt(1))
        assert(g(p - 1) === h)
        val isMin = (math.max(1, p - w + 1) to math.min(p, g.size - w + 1))
          .exists { j =>
            val win = g.slice(j - 1, j - 1 + w)
            win.min === h && (j - 1 + win.indexOf(h) + 1) === p
          }
        assert(isMin, s"doc $id sel ($h,$p) is not a leftmost window min")
      }
    }
  }
}
