package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.{Dedup, TextAnalysis}
import graft.pharma.Cleaning

/** Property-based invariants (SURVEY.md §5 test plan #4): totality of the
  * bucketing expressions, idempotence of the cleaning filters and text
  * normalization, and algebraic laws of the similarity primitives —
  * checked over generated inputs rather than fixtures. Spark evaluation
  * per generated case is expensive, so each property batches its samples
  * into ONE DataFrame and asserts over the whole batch. */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  /** Seeded draw: failures replay exactly, and pureApply retries instead
    * of Gen.sample's occasional None. */
  private def draw[T](g: Gen[T]): T =
    g.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))

  private val priceGen: Gen[Int] = Gen.oneOf(
    Gen.choose(1, 2000),
    Gen.oneOf(50, 100, 101, 200, 500, 501, 1000, 1001)) // weight the edges

  test("property: every valid price lands in exactly one price_category") {
    val prices = draw(Gen.listOfN(300, priceGen))
    val cats = Cleaning.priceCategory(prices.toDF("price"))
      .groupBy("price_category").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cats.keySet.subsetOf(Set("Low", "Medium", "High")))
    assert(cats.values.sum === prices.size.toLong)
  }

  test("property: cleaning filter and imputation are idempotent") {
    val rates = draw(Gen.listOfN(200, Gen.oneOf(
      Gen.const(null: String), Gen.const(""), Gen.const("gratuit"),
      Gen.const("0 DA"), priceGen.map(p => s"$p.00 DA"))))
    val df = rates.toDF("reference_rate")
      .withColumn("refundable", lit(null).cast("boolean"))
    val once = Cleaning.refundableImpute(
      Cleaning.validPriceFilter(Cleaning.priceExtract(df)))
    val twice = Cleaning.refundableImpute(Cleaning.validPriceFilter(once))
    assert(once.count() === twice.count())
    assert(once.exceptAll(twice).count() === 0L)
  }

  test("property: normalizeText is idempotent and case/punct-insensitive") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val textGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val texts = draw(Gen.listOfN(150, textGen))
    val df = texts.toDF("t")
      .withColumn("dirty", concat(upper(col("t")), lit("!!  ")))
    val out = df.select(
      Dedup.normalizeText(Dedup.normalizeText(col("t"))).as("twice"),
      Dedup.normalizeText(col("t")).as("once"),
      Dedup.normalizeText(lower(col("dirty"))).as("via_dirty"),
      Dedup.normalizeText(lower(col("t"))).as("via_lower"))
    assert(out.filter(col("twice") =!= col("once")).count() === 0L)
    assert(out.filter(col("via_dirty") =!= col("via_lower")).count() === 0L)
  }

  test("property: jaccard is symmetric, bounded, and 1 on self") {
    val tokGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      .map(_.mkString(" "))
    val pairs = draw(Gen.listOfN(120, Gen.zip(tokGen, tokGen)))
    val df = pairs.toDF("t1", "t2").select(
      TextAnalysis.shingleSet(col("t1"), 2).as("s1"),
      TextAnalysis.shingleSet(col("t2"), 2).as("s2"))
    val checked = df.select(
      Dedup.jaccard(col("s1"), col("s2")).as("ab"),
      Dedup.jaccard(col("s2"), col("s1")).as("ba"),
      Dedup.jaccard(col("s1"), col("s1")).as("self"))
    assert(checked.filter(col("ab") =!= col("ba")).count() === 0L)
    assert(checked.filter(col("ab") < 0 || col("ab") > 1).count() === 0L)
    assert(checked.filter(abs(col("self") - 1.0) > 1e-9).count() === 0L)
  }

  test("property: quality score stays in [0,1] on arbitrary printable text") {
    val junkGen = Gen.listOfN(40,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '!', '.', '?', '9', '\t')))
      .map(_.mkString)
    val texts = draw(Gen.listOfN(200, junkGen))
    val bad = texts.toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1).count()
    assert(bad === 0L)
  }

  test("property: nearest-index kernel equals the window argmin on random vectors") {
    // the replacement claim of the narrow assignment (no corpus×k window)
    // checked over GENERATED data, including negatives and magnitudes the
    // fixture embeddings never produce
    val dims = 6
    val vecGen = Gen.listOfN(dims, Gen.choose(-100.0, 100.0))
    // ONE draw, sliced: two separate draw() calls replay the same fixed
    // seed and would make the candidates an exact copy of the first
    // corpus rows — disjoint slices keep the sets independent
    val all = draw(Gen.listOfN(127, vecGen))
    val rows = all.take(120).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val cands = all.drop(120).map(_.toArray)
    val corpus = rows.toDF("id", "v").cache()
    val candArr = array(cands.map(cv => array(cv.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    for (byCos <- Seq(true, false)) {
      val kernel = corpus.select(col("id"),
        graft.functions.SketchExpressions.nearestIndex(col("v"), candArr, byCos).as("k"))
      // reference: explicit score per candidate + row_number argbest with
      // the same (score, index) ordering
      val scored = cands.zipWithIndex.map { case (cv, ci) =>
        val c = array(cv.map(lit).toIndexedSeq: _*)
        val score =
          if (byCos) graft.ops.Similarity.cosine(col("v"), c)
          else aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x)
        struct(score.as("s"), lit(ci).as("ci"))
      }
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
        .orderBy(if (byCos) col("p.s").desc else col("p.s").asc, col("p.ci"))
      val windowed = corpus
        .select(col("id"), explode(array(scored.toIndexedSeq: _*)).as("p"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("id"), col("p.ci").as("ref"))
      val disagree = kernel.join(windowed, Seq("id"))
        .filter(col("k") =!= col("ref")).count()
      assert(disagree === 0L, s"byCosine=$byCos")
    }
    corpus.unpersist()
  }

  test("property: top-cosine-indices kernel equals the window top-p on random vectors") {
    // same replacement claim for the multi-probe kernel: the p-slot
    // insertion buffer must reproduce the full (score DESC, index ASC)
    // window ranking's prefix, over generated data with negatives and
    // magnitudes the fixture embeddings never produce
    val dims = 6
    val vecGen = Gen.listOfN(dims, Gen.choose(-100.0, 100.0))
    val all = draw(Gen.listOfN(127, vecGen))
    val rows = all.take(120).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val cands = all.drop(120).map(_.toArray)
    val corpus = rows.toDF("id", "v").cache()
    val candArr = array(cands.map(cv => array(cv.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val scored = cands.zipWithIndex.map { case (cv, ci) =>
      val c = array(cv.map(lit).toIndexedSeq: _*)
      struct(graft.ops.Similarity.cosine(col("v"), c).as("s"), lit(ci).as("ci"))
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("p.s").desc, col("p.ci"))
    for (p <- Seq(1, 3, 7)) {
      val kernel = corpus.select(col("id"),
        graft.functions.SketchExpressions.topCosineIndices(col("v"), candArr, p).as("k"))
      val windowed = corpus
        .select(col("id"), explode(array(scored.toIndexedSeq: _*)).as("p"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= p)
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("rn"), col("p.ci")))).as("rs"))
        .select(col("id"), transform(col("rs"), _.getField("ci")).as("ref"))
      val disagree = kernel.join(windowed, Seq("id"))
        .filter(col("k") =!= col("ref")).count()
      assert(disagree === 0L, s"p=$p")
    }
    corpus.unpersist()
  }

  test("property: minhash signature entries are element-wise <= any single shingle's hashes") {
    // the signature is a min over per-seed hashes: adding MORE shingles
    // can only lower (or keep) each signature element
    val tokGen = Gen.listOfN(10, Gen.identifier).map(_.mkString(" "))
    val texts = draw(Gen.listOfN(80, tokGen))
    val df = texts.toDF("t")
      .withColumn("extended", concat(col("t"), lit(" zzz extra tail")))
    // per-element monotonicity holds for the min over a shingle-set UNION
    val monotone = df.select(
      Dedup.minhashSignature(
        array_union(
          TextAnalysis.shingleSet(col("t"), 3),
          TextAnalysis.shingleSet(col("extended"), 3)), 16).as("u"),
      Dedup.minhashSignature(TextAnalysis.shingleSet(col("t"), 3), 16).as("base"))
    val violations = monotone.filter(
      exists(zip_with(col("u"), col("base"), (u, b) => u > b), x => x)).count()
    assert(violations === 0L)
    assert(monotone.count() === 80L)
  }

  test("property: z-order key is bounded and equal cells share a key") {
    val ptGen = for {
      x <- Gen.choose(-1000.0, 1000.0)
      y <- Gen.choose(0.0, 5.0)
    } yield (x, y)
    val pts = draw(Gen.listOfN(300, ptGen)) ++
      // pin the corners so min/max are stable for the duplicate check
      Seq((-1000.0, 0.0), (1000.0, 5.0))
    // duplicate every point: identical (x, y) must get identical keys
    val df = (pts ++ pts).toDF("x", "y")
    val keyed = graft.core.Zorder.withKey(df, Seq("x", "y"), bits = 8)
    val bad = keyed.filter(col("__z") < 0 || col("__z") >= (1L << 16)).count()
    assert(bad === 0L)
    val keysPerPoint = keyed.groupBy(col("x"), col("y"))
      .agg(countDistinct(col("__z")).as("nk"))
      .filter(col("nk") =!= 1L).count()
    assert(keysPerPoint === 0L)
    // the key must actually vary — a constant key would "pass" above
    assert(keyed.select(countDistinct(col("__z"))).head().getLong(0) > 50L)
  }

  test("property: winnowing guarantee holds on random token sequences (coverage, membership, minimality)") {
    // randomized mirror of the q29b contract: small alphabet forces
    // heavy hash ties and repeats — the adversarial regime for
    // window-coverage bugs
    val k = 3; val w = 4
    val tokGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, tokGen))
    val docs = draw(Gen.listOfN(200, docGen)).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
      .withColumn("g",
        TextAnalysis.gramHashSeq(TextAnalysis.tokens(col("text")), k))
      .withColumn("sel", TextAnalysis.winnowFingerprints(col("text"), k, w))
    val m = size(col("g"))
    val coverage = when(m >= w,
      exists(sequence(lit(1), m - (w - 1)),
        j => !exists(col("sel"),
          s0 => s0.getField("pos") >= j && s0.getField("pos") <= j + (w - 1))))
      .otherwise(m > 0 && size(col("sel")) === 0)
    val phantom = exists(col("sel"),
      s0 => element_at(col("g"), s0.getField("pos")) =!= s0.getField("h"))
    val bad = df.filter(coalesce(coverage, lit(false)) ||
      coalesce(phantom, lit(false))).count()
    assert(bad === 0L, "winnowing violated on a random sequence")
    // empty docs stay total
    assert(df.filter(m === 0 && size(col("sel")) =!= 0).count() === 0L)
  }

  test("property: bottom-k sketch merge equals from-scratch on random groups and splits") {
    val rowGen = for {
      g <- Gen.oneOf("s1", "s2", "s3")
      id <- Gen.choose(0L, 5000L)
      v <- Gen.choose(1L, 500L)
    } yield (g, id, v)
    val rows = draw(Gen.listOfN(600, rowGen))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (g, id)
    val df = rows.toDF("g0", "id0", "v0")
    val k = 16
    val full = graft.ops.Quantiles.bottomKSketch(df, "g0", "id0", "v0", k)
    // random 4-way split by id hash — merge must be bit-identical
    val shards = (0 until 4).map(i =>
      graft.ops.Quantiles.bottomKSketch(
        df.filter(pmod(col("id0"), lit(4)) === i), "g0", "id0", "v0", k))
    val merged = graft.ops.Quantiles.mergeSketches(shards, k)
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
    // the sketch is the TRUE bottom-k: no excluded row hashes below the
    // per-group k-th selected hash
    val kth = full.groupBy(col("g")).agg(max(col("hkey")).as("kth"),
      count(lit(1)).as("m"))
    val hashed = df.select(col("g0").as("g"), col("id0").as("id"),
      (((pmod(col("id0"), lit(2147483648L)) * (2246822519L % 4294967296L))
        % 4294967296L) % 1000000L).as("hk"))
    val excluded = hashed.join(full.select(col("g"), col("id")),
        Seq("g", "id"), "left_anti")
      .join(kth, Seq("g"))
      .filter(col("m") >= k && col("hk") < col("kth"))
    assert(excluded.count() === 0L,
      "an excluded row hashes below the k-th selected — not a true bottom-k")
  }

  test("property: portable roaring DV codec round-trips arbitrary position sets across container boundaries") {
    import graft.core.DeletionVectors
    // positions spanning array/bitmap container shapes AND multiple
    // 32-bit "magic keys": small clusters, dense runs, and sparse
    // high-bit outliers — the shapes real writers emit
    val posGen = Gen.oneOf(
      Gen.choose(0L, 300L),                        // array container
      Gen.choose(65500L, 66500L),                  // 16-bit key boundary
      Gen.choose(0L, 70000L).map(_ + (1L << 32)),  // second magic key
      Gen.choose(0L, 8000L).map(_ * 8 + (3L << 32))) // sparse high
    (1 to 25).foreach { _ =>
      val positions = draw(Gen.listOfN(draw(Gen.choose(0, 900)), posGen))
        .distinct.sorted
      val bytes = DeletionVectors.serializePortable(positions)
      val back = DeletionVectors.deserializePortable(bytes).toSeq
      assert(back === positions,
        s"round-trip mismatch at n=${positions.size}")
      // Z85 framing layer round-trips the same bytes
      assert(DeletionVectors.z85decode(DeletionVectors.z85encode(bytes))
        .take(bytes.length).toSeq === bytes.toSeq)
    }
  }
}
