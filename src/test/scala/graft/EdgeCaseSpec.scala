package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, DedupCluster, Quantize, Similarity, TextAnalysis}

/** Degenerate-input totality: every operator must return a sane empty or
  * singleton result on empty/tiny inputs instead of throwing — the
  * failure mode that otherwise appears only in production when one
  * partition, source, or day happens to be empty. */
class EdgeCaseSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val emptyEdges = Seq.empty[(Long, Long)].toDF("u", "v")
  private lazy val emptyVecs =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("connected components of an empty edge list is empty") {
    assert(DedupCluster.connectedComponents(emptyEdges).count() === 0L)
  }

  test("shared-shingle edges on empty and single-doc corpora are empty") {
    assert(DedupCluster.sharedShingleEdges(
      emptyDocs, "text", "doc_id").count() === 0L)
    val one = Seq((1L, "just one little document here")).toDF("doc_id", "text")
    assert(DedupCluster.sharedShingleEdges(one, "text", "doc_id").count() === 0L)
  }

  test("minhash and simhash near-dups on empty corpora are empty") {
    assert(Dedup.minhashNearDups(emptyDocs, "text", "doc_id").count() === 0L)
    assert(Dedup.simhashNearDups(emptyDocs, "text", "doc_id").count() === 0L)
  }

  test("quantization of an empty corpus yields an empty frame") {
    assert(Quantize.withInt8(emptyVecs, "embedding").count() === 0L)
  }

  test("k-means with k larger than the corpus returns <= corpus centroids") {
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, "embedding", "vec_id",
      k = 8, iters = 2)
    assert(cents.count() <= 2L)
  }

  test("nearest-index kernel: ties keep lowest index, empty candidates yield -1") {
    import graft.functions.SketchExpressions.nearestIndex
    val v = array(lit(1.0), lit(0.0))
    // two identical candidates: strict comparison keeps the FIRST
    val tied = spark.range(1).select(nearestIndex(v,
      array(array(lit(1.0), lit(0.0)), array(lit(1.0), lit(0.0))),
      byCosine = true).as("i")).head().getInt(0)
    assert(tied === 0)
    val tiedL2 = spark.range(1).select(nearestIndex(v,
      array(array(lit(1.0), lit(0.0)), array(lit(1.0), lit(0.0))),
      byCosine = false).as("i")).head().getInt(0)
    assert(tiedL2 === 0)
    // empty candidate list: -1 sentinel (assignToCentroids maps it to
    // a null centroid_id via the when() guard)
    val none = spark.range(1).select(nearestIndex(v,
      typedLit(Array.empty[Array[Double]]), byCosine = true).as("i"))
      .head().getInt(0)
    assert(none === -1)
  }

  test("nearest-index kernel: NaN ordering matches the window argmin; null candidates are skipped") {
    import graft.functions.SketchExpressions.nearestIndex
    val cands = array(
      array(lit(0.0), lit(1.0)),  // finite score
      array(lit(1.0), lit(0.0)))  // finite, cosine=1 vs query
    // zero-norm query → every cosine is NaN; window DESC sorts NaN first
    // with the lowest-id tie-break, i.e. index 0 — the kernel must agree
    val zeroQ = array(lit(0.0), lit(0.0))
    assert(spark.range(1).select(
      nearestIndex(zeroQ, cands, byCosine = true).as("i")).head().getInt(0) === 0)
    // under l2 ASC a NaN loses to any finite distance; with only NaN
    // scores the first candidate wins (window tie-break)
    val nanCands = array(
      array(lit(Double.NaN), lit(0.0)), array(lit(Double.NaN), lit(1.0)))
    val q = array(lit(1.0), lit(0.0))
    assert(spark.range(1).select(
      nearestIndex(q, nanCands, byCosine = false).as("i")).head().getInt(0) === 0)
    // a null candidate element is skipped, not an NPE, and never wins —
    // a deliberate deviation from the window form, whose null scores
    // would sort NULLS FIRST under l2 asc
    val withNull = array(
      lit(null).cast("array<double>"), array(lit(1.0), lit(0.0)))
    assert(spark.range(1).select(
      nearestIndex(q, withNull, byCosine = true).as("i")).head().getInt(0) === 1)
    assert(spark.range(1).select(
      nearestIndex(q, withNull, byCosine = false).as("i")).head().getInt(0) === 1)
  }

  test("nearest-index kernel: interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vec = Array.tabulate(8)(d => (d * 7 % 13 - 6).toDouble)
    val cands = Array.tabulate(5, 8)((c, d) => ((c * 17 + d * 3) % 11 - 5).toDouble)
    val vecLit = Literal.create(vec, ArrayType(DoubleType))
    val candsLit = Literal.create(cands, ArrayType(ArrayType(DoubleType)))
    for (byCos <- Seq(true, false)) {
      // interpreted: direct nullSafeEval through Expression.eval
      val interpreted = graft.functions.NearestIndexExpr(vecLit, candsLit, byCos)
        .eval(null).asInstanceOf[Int]
      // codegen: the same literals through a projected DataFrame
      val compiled = spark.range(1).select(
          graft.functions.SketchExpressions.nearestIndex(
            array(vec.map(lit): _*),
            array(cands.map(cv => array(cv.map(lit): _*)): _*),
            byCos).as("i"))
        .head().getInt(0)
      assert(interpreted === compiled, s"byCosine=$byCos")
    }
  }

  test("top-cosine-indices kernel: head = nearestIndex, ties keep low index, degenerate shapes total") {
    import graft.functions.SketchExpressions.{nearestIndex, topCosineIndices}
    val v = array(lit(1.0), lit(0.0))
    // ordering + tie-break: cands scored 1.0, 1.0, 0.0 → [0, 1, 2]
    val cands = array(
      array(lit(1.0), lit(0.0)), array(lit(2.0), lit(0.0)),
      array(lit(0.0), lit(1.0)))
    val top3 = spark.range(1)
      .select(topCosineIndices(v, cands, 3).as("t"))
      .head().getSeq[Int](0)
    assert(top3 === Seq(0, 1, 2))
    // p beyond the candidate count truncates; p below it prefixes
    assert(spark.range(1).select(topCosineIndices(v, cands, 5).as("t"))
      .head().getSeq[Int](0) === Seq(0, 1, 2))
    assert(spark.range(1).select(topCosineIndices(v, cands, 1).as("t"))
      .head().getSeq[Int](0) === Seq(0))
    // head always agrees with the single-best kernel (incl. NaN: a
    // zero-norm probe makes every score NaN → first candidate)
    for (probe <- Seq(v, array(lit(0.0), lit(0.0)))) {
      val r = spark.range(1).select(
        topCosineIndices(probe, cands, 2).as("t"),
        nearestIndex(probe, cands, byCosine = true).as("n")).head()
      assert(r.getSeq[Int](0).head === r.getInt(1))
    }
    // empty candidates → empty array; null candidate elements skipped
    assert(spark.range(1).select(topCosineIndices(v,
      typedLit(Array.empty[Array[Double]]), 2).as("t"))
      .head().getSeq[Int](0).isEmpty)
    val withNull = array(
      lit(null).cast("array<double>"), array(lit(1.0), lit(0.0)))
    assert(spark.range(1).select(topCosineIndices(v, withNull, 2).as("t"))
      .head().getSeq[Int](0) === Seq(1))
  }

  test("top-cosine-indices kernel: interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vec = Array.tabulate(8)(d => (d * 7 % 13 - 6).toDouble)
    val cands = Array.tabulate(5, 8)((c, d) => ((c * 17 + d * 3) % 11 - 5).toDouble)
    val vecLit = Literal.create(vec, ArrayType(DoubleType))
    val candsLit = Literal.create(cands, ArrayType(ArrayType(DoubleType)))
    for (p <- Seq(1, 2, 5)) {
      val interpreted = graft.functions.TopCosineIndicesExpr(vecLit, candsLit, p)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      val compiled = spark.range(1).select(
          graft.functions.SketchExpressions.topCosineIndices(
            array(vec.map(lit): _*),
            array(cands.map(cv => array(cv.map(lit): _*)): _*),
            p).as("t"))
        .head().getSeq[Int](0)
      assert(interpreted === compiled, s"p=$p")
    }
  }

  test("text metrics on blank and single-token documents are defined") {
    val odd = Seq((1L, ""), (2L, "   "), (3L, "solo")).toDF("doc_id", "text")
    val m = odd.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.duplicateTokenFraction(col("text")).as("dup"),
      TextAnalysis.topBigramFraction(col("text")).as("top"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect()
    assert(m.length === 3)
    m.foreach { r =>
      assert(!r.anyNull, r.toString)
      assert(r.getAs[Double]("dup") >= 0.0 && r.getAs[Double]("top") >= 0.0)
    }
  }

  test("tfidf weights of an empty corpus are empty") {
    assert(TextAnalysis.tfidfWeights(emptyDocs, "text", "doc_id").count() === 0L)
  }

  test("keyword/bm25 scoring with no matching query terms is empty, not an error") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val missing = Seq("zeta").toDF("tok")
    assert(TextAnalysis.keywordScores(docs, "text", "doc_id", missing).count() === 0L)
    assert(TextAnalysis.bm25Scores(docs, "text", "doc_id", missing).count() === 0L)
    // and with an empty query-term relation
    val none = Seq.empty[String].toDF("tok")
    assert(TextAnalysis.keywordScores(docs, "text", "doc_id", none).count() === 0L)
  }

  test("rrfFuse tolerates an empty leg: remaining legs still rank") {
    val full = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val empty = Seq.empty[(Long, Int)].toDF("id", "rank")
    val fused = TextAnalysis.rrfFuse(
      Seq("a" -> full, "b" -> empty), rrfK = 60, topK = 5).collect()
    assert(fused.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(fused.forall(_.isNullAt(3)), "empty leg must yield null ranks")
  }

  test("incremental semantic dedup with an empty batch is empty; empty corpus and empty batch is empty") {
    val verdicts = Dedup.semanticDedupIncremental(
      emptyVecs, emptyVecs, "embedding", "vec_id", 0.45)
    assert(verdicts.count() === 0L)
    val e = graft.core.Tables.load(spark, sfDir, "embeddings").limit(20)
    assert(Dedup.semanticDedupIncremental(
      e, emptyVecs, "embedding", "vec_id", 0.45).count() === 0L)
  }

  test("NB classifier: empty corpus scores empty; single-class corpus still scores (smoothing carries the absent class)") {
    val empty = Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "y")
    assert(graft.ops.Classifier.nbScores(empty, "doc_id", "text", "y").count() === 0L)
    val oneClass = Seq((1L, "alpha beta", true), (2L, "alpha", true))
      .toDF("doc_id", "text", "y")
    val s = graft.ops.Classifier.nbScores(oneClass, "doc_id", "text", "y")
      .select(col("score")).collect().map(_.getDouble(0))
    assert(s.length === 2 && s.forall(v => !v.isNaN && !v.isInfinite))
    assert(s.forall(_ > 0), "all-positive corpus must score positive")
  }

  test("label propagation totality: empty edges leave seeds fixed and non-seeds null; empty nodes is empty") {
    val nodes = Seq((1L, Int.box(3)), (2L, null: Integer)).toDF("node", "seed_label")
    val out = graft.ops.Graph.labelPropagation(nodes, emptyEdges.toDF("src", "dst"), 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out === Map(1L -> Some(3), 2L -> None))
    val noNodes = Seq.empty[(Long, Integer)].toDF("node", "seed_label")
    assert(graft.ops.Graph.labelPropagation(
      noNodes, emptyEdges.toDF("src", "dst"), 2).count() === 0L)
  }

  test("random projection totality: empty relation projects empty; projectedLshTopK on empty corpus returns no neighbors") {
    assert(graft.ops.Projection.projectRelation(
      emptyVecs, "vec_id", "embedding", 16).count() === 0L)
    val q = Seq((1L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    assert(graft.ops.Projection.projectedLshTopK(
      emptyVecs, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, outDim = 4, planes = 2, tables = 2, rerank = 10).count() === 0L)
  }

  test("q116 under-covered prefilter falls back to the full stratum (never under-fills)") {
    // adversarial id set: 1000 docs in one lang chosen so that only 10
    // hash under the 4x-quota threshold (thr = ceil(160e6/1000) =
    // 160000) — survivors 10 < min(k=40, 1000), so the guard must
    // disable the prefilter for this stratum and still return exactly
    // 40 rows, identical to the naive single-window sampler
    def hkey(id: Long): Long =
      ((id % 2147483648L) * (2246822519L % 4294967296L)) % 4294967296L % 1000000L
    val under = Iterator.from(1).map(_.toLong).filter(hkey(_) >= 160000L).take(990).toSeq
    val cover = Iterator.from(1).map(_.toLong).filter(hkey(_) < 160000L).take(10).toSeq
    val ids = under ++ cover
    assert(ids.size === 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft_undercover").toString
    ids.map(i => (i, "w " * 5, "xx", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.CurationQueries.q116StratifiedSample
      .run(spark, dir)
    val expected = ids.map(i => (hkey(i), i)).sorted.take(40).map(_._2).toSet
    assert(out.count() === 40L, "guard must prevent the silent under-fill")
    assert(out.collect().map(_.getLong(2)).toSet === expected,
      "fallback must select the same membership as the naive sampler")
  }

  test("round-13 operators are total on degenerate inputs") {
    // winnowed spans: empty corpus and sub-gram docs produce no spans
    assert(Dedup.duplicatedSpansWinnowed(
      emptyDocs, "text", "doc_id", n = 5, w = 4).count() === 0L)
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpansWinnowed(
      tiny, "text", "doc_id", n = 5, w = 4).count() === 0L)
    // bottom-k sketch: empty frame → empty sketch → empty estimates;
    // k larger than a group → the whole group, ranks dense
    val emptyG = Seq.empty[(String, Long, Long)].toDF("g0", "id0", "v0")
    val skE = graft.ops.Quantiles.bottomKSketch(emptyG, "g0", "id0", "v0", 8)
    assert(skE.count() === 0L)
    assert(graft.ops.Quantiles.quantileEstimates(skE, Seq(0.5)).count() === 0L)
    val small = Seq(("s", 1L, 10L), ("s", 2L, 20L)).toDF("g0", "id0", "v0")
    val skS = graft.ops.Quantiles.bottomKSketch(small, "g0", "id0", "v0", 8)
    assert(skS.count() === 2L)
    assert(skS.select(max(col("rk"))).head().getInt(0) === 2)
    // merging an empty sketch is the identity
    val merged = graft.ops.Quantiles.mergeSketches(Seq(skS, skE), 8)
    assert(merged.exceptAll(skS).count() === 0L &&
      skS.exceptAll(merged).count() === 0L)
    // BPE training on an empty vocabulary yields no merges
    val emptyWords = Seq.empty[(String, Long)].toDF("w", "n")
    assert(TextAnalysis.bpeTrainMerges(emptyWords, "w", "n", 2).count() === 0L)
    // single-char vocabulary: no pairs, no merges, encode = the chars
    val chars = Seq(("a", 5L), ("b", 3L)).toDF("w", "n")
    assert(TextAnalysis.bpeTrainMerges(chars, "w", "n", 2).count() === 0L)
    val enc = TextAnalysis.bpeEncodeSymbols(chars, "w", "n", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc === Map("a" -> 5L, "b" -> 3L))
    // semantic decontamination with an empty benchmark: nothing flagged
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val dec = Dedup.semanticDecontaminate(
      vecs, emptyVecs, "embedding", "vec_id", 0.45)
    assert(dec.count() === 2L)
    assert(dec.filter(col("contaminated")).count() === 0L)
    // and an empty corpus scores empty
    assert(Dedup.semanticDecontaminate(
      emptyVecs, vecs, "embedding", "vec_id", 0.45).count() === 0L)
  }

  test("q116 stratified sample takes the whole stratum when quota exceeds it") {
    // 3 docs in one lang with quota 40 → all 3 selected, ranks dense
    val dir = java.nio.file.Files.createTempDirectory("graft_tiny").toString
    Seq((1L, "a b", "xx", "s", 3L), (2L, "c d", "xx", "s", 3L),
      (3L, "e f", "xx", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.CurationQueries.q116StratifiedSample
      .run(spark, dir).collect()
    assert(out.length === 3)
    assert(out.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
  }

  test("oovReport edges: boundary count-tie broken by token order; V >= vocab means zero OOV; empty counts yield empty report") {
    // totals a=5, b=3, c=3: top-2 must keep 'b' over 'c' (count tie →
    // token asc) — the V-boundary determinism the oracle relies on
    val counts = Seq(("s1", "a", 5L), ("s1", "b", 3L), ("s1", "c", 3L))
      .toDF("source", "token", "n")
    val r = TextAnalysis.oovReport(counts, "source", "token", "n", v = 2)
      .head()
    assert(r.getLong(1) === 11L && r.getLong(2) === 3L && r.getLong(3) === 1L,
      s"c (not b) must fall outside the vocabulary: $r")
    // V at/above the whole vocabulary: nothing is OOV
    val all = TextAnalysis.oovReport(counts, "source", "token", "n", v = 3)
      .head()
    assert(all.getLong(2) === 0L && all.getDouble(4) === 0.0)
    // empty counts: empty report, no throw
    val empty = Seq.empty[(String, String, Long)].toDF("source", "token", "n")
    assert(TextAnalysis.oovReport(empty, "source", "token", "n", v = 4)
      .count() === 0L)
  }

  test("WAV chunk walk skips odd-length chunks with their pad byte (RIFF word alignment)") {
    import graft.ops.Multimodal
    // hand-assemble: RIFF [LIST len=3 + pad] [fmt] [data] — a reader
    // that forgets the pad byte desyncs and misses fmt/data
    val pcm = Array.tabulate(8)(i => (i * 1000).toShort)
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 3 + 1) + 24 + 8 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 + 24 + 24)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte]('I', 'N', 'F', 0)) // 3 payload bytes + 1 pad
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(16)
    pcm.foreach(bb.putShort)
    val w = Multimodal.WavCodec.decodeHeader(bb.array())
    assert(w.isDefined, "odd LIST chunk must be skipped with its pad byte")
    assert(w.get.channels === 1 && w.get.sampleRate === 8000 &&
      w.get.nFrames === 8)
    // compressed (non-PCM) audioFormat is None, not a throw
    val c = bb.array().clone()
    c(12 + 12 + 8) = 2 // LIST(12) after RIFF hdr(12), fmt payload byte 0
    assert(Multimodal.WavCodec.decodeHeader(c).isEmpty)
  }

  test("gram_strings edges: k above length is empty, k equal to length is one gram, empty array totals zero") {
    import graft.functions.SketchExpressions
    val d = Seq(
      (1L, Array("a", "b", "c")),
      (2L, Array("x")),
      (3L, Array.empty[String]))
      .toDF("id", "ts")
    val g3 = d.select(col("id"),
      SketchExpressions.gramStrings(col("ts"), 3).as("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g3(1L) === Seq("a b c") && g3(2L).isEmpty && g3(3L).isEmpty)
    val g4 = d.select(SketchExpressions.gramStrings(col("ts"), 4).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(g4.forall(_.isEmpty))
  }

  test("linear interpolation: hand-math fractions, no extrapolation, per-key isolation") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      // key 1: observations at t=0 (v=0) and t=100 (v=100); gaps at 25/75
      (1L, ts(0), 1L, Some(0.0)), (1L, ts(25), 2L, None),
      (1L, ts(75), 3L, None), (1L, ts(100), 4L, Some(100.0)),
      // key 2: leading and trailing gaps never extrapolate
      (2L, ts(0), 5L, None), (2L, ts(10), 6L, Some(5.0)), (2L, ts(20), 7L, None),
      // key 3: a lone observation bleeds into no other key
      (3L, ts(50), 8L, Some(42.0)))
      .toDF("user_id", "ts", "event_id", "v")
    val got = graft.ops.TimeSeries.interpolateLinear(
        df, "user_id", "ts", "v", Seq("event_id"))
      .orderBy(col("event_id"))
      .collect()
      .map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      .toSeq
    assert(got === Seq(Some(0.0), Some(25.0), Some(75.0), Some(100.0),
      None, Some(5.0), None, Some(42.0)))
  }

  test("interval overlap join: bucket-boundary pairs counted once, touching counts, disjoint never") {
    import spark.implicits._
    val W = 100L // bucket width (micros) for the test
    // a1 [0,250] spans 3 buckets; b1 [150,400] overlaps it in 2 shared
    // buckets — must surface EXACTLY once (the no-distinct credit rule)
    // b2 [250,260] touches a1 at a point → overlap 0, still a pair
    // b3 [300,350] is disjoint from a1
    val a = Seq((1L, 0L, 250L)).toDF("iid", "s", "e")
    val b = Seq((10L, 150L, 400L), (11L, 250L, 260L), (12L, 300L, 350L))
      .toDF("iid", "s", "e")
    val got = graft.ops.Intervals.overlapJoin(a, b, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._2)
    assert(got === Seq((1L, 10L, 100L), (1L, 11L, 0L)))
    // symmetric self-join: caller's iid filter leaves each pair once
    val all2 = Seq((1L, 0L, 250L), (2L, 100L, 300L), (3L, 500L, 600L))
      .toDF("iid", "s", "e")
    val self = graft.ops.Intervals.overlapJoin(all2, all2, W)
      .filter(col("a_iid") < col("b_iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(self === Seq((1L, 2L, 150L)))
  }

  test("interval overlap join: auto-derived bucket width gives the same rows as any explicit width") {
    import spark.implicits._
    // skewed lengths on purpose: one interval spanning the whole range
    // among many short ones — the distribution where a mis-set width
    // hurts most; the RESULT must not depend on it at all
    val a = (Seq((100L, 0L, 100000L)) ++
      (1L to 40L).map(i => (i, i * 1000L, i * 1000L + 500L))).toDF("iid", "s", "e")
    val b = (1L to 40L).map(i => (200L + i, i * 1700L, i * 1700L + 900L))
      .toDF("iid", "s", "e")
    val w = graft.ops.Intervals.deriveBucketMicros(a, b)
    // the median of 80 short lengths (500/900) plus one huge one
    assert(w >= 500L && w <= 900L, s"derived width $w")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val auto = rows(graft.ops.Intervals.overlapJoinAuto(a, b))
    assert(auto === rows(graft.ops.Intervals.overlapJoin(a, b, 100L)))
    assert(auto === rows(graft.ops.Intervals.overlapJoin(a, b, 50000L)))
    // degenerate input (all zero-length) clamps to a positive width
    val z = Seq((1L, 5L, 5L), (2L, 5L, 5L)).toDF("iid", "s", "e")
    assert(graft.ops.Intervals.deriveBucketMicros(z, z) === 1L)
    assert(graft.ops.Intervals.overlapJoinAuto(z, z)
      .filter(col("a_iid") < col("b_iid")).count() === 1L)
  }

  test("token-budget mixture: exact integer shares, repetition factor, capped rate, empty-source null") {
    import spark.implicits._
    val avail = Seq(("a", 100L), ("b", 10000L), ("c", 0L))
      .toDF("source", "available_tokens")
    val weights = Seq(("a", 3L), ("b", 1L), ("c", 1L), ("ghost", 9L))
      .toDF("source", "weight")
    val plan = graft.ops.Mixture.tokenBudgetPlan(avail, weights, 1000L)
      .orderBy("source").collect()
    // the weight-only 'ghost' source never joins in; shares are floor
    // divisions of 1000 over wsum 5
    assert(plan.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    val a = plan(0); val b = plan(1); val c = plan(2)
    assert(a.getAs[Long]("target_tokens") === 600L)
    // a must repeat 6x: 600 target over 100 available
    assert(a.getAs[Long]("epochs_micro") === 6000000L)
    assert(a.getAs[Long]("rate_micro") === 1000000L)
    // b keeps 2% of one epoch
    assert(b.getAs[Long]("target_tokens") === 200L)
    assert(b.getAs[Long]("epochs_micro") === 20000L)
    assert(b.getAs[Long]("rate_micro") === 20000L)
    // an empty source has no defined epoch factor — NULL, not a crash;
    // and no keep RATE either (least() skips NULLs in both engines, so
    // an ungated rate would read 100% for a source with NOTHING)
    assert(c.isNullAt(c.fieldIndex("epochs_micro")))
    assert(c.isNullAt(c.fieldIndex("rate_micro")))
  }

  test("preference pairs: total-order tie-breaks, near-tie filter, singleton groups yield nothing") {
    import spark.implicits._
    val df = Seq(
      // group g1: clear winner/loser, margin 2_000_000
      ("g1", 1L, 3.0), ("g1", 2L, 1.0), ("g1", 3L, 2.0),
      // group g2: all tied — chosen picks lowest id, rejected picks
      // lowest id too → same row → filtered (no self-pair)
      ("g2", 10L, 5.0), ("g2", 11L, 5.0),
      // group g3: margin below the floor
      ("g3", 20L, 1.0000005), ("g3", 21L, 1.0),
      // group g4: singleton
      ("g4", 30L, 9.0))
      .toDF("g", "id", "score")
    val pairs = graft.ops.Preference.minePairs(
        df, "g", "id", col("score"), minMarginMicro = 10L)
      .orderBy("grp").collect()
    assert(pairs.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(5))).toSeq === Seq(("g1", 1L, 2L, 2000000L)))
    // margin floor 0 admits g3's half-micro... which rounds to 1 micro
    val loose = graft.ops.Preference.minePairs(
        df, "g", "id", col("score"), minMarginMicro = 0L)
      .orderBy("grp").collect()
    assert(loose.map(_.getString(0)).toSeq === Seq("g1", "g3"))
  }

  test("temperature mixture: sqrt smoothing up-weights small sources; empty sources carry NULL epochs") {
    import spark.implicits._
    val avail = Seq(
      ("big", 1000000L), ("small", 10000L), ("void", 0L))
      .toDF("source", "available_tokens")
    val plan = graft.ops.Mixture
      .temperatureMixturePlan(avail, budgetTokens = 1000000L)
      .orderBy("source").collect()
    val big = plan(0); val small = plan(1); val void = plan(2)
    // raw shares are 99:1; sqrt smooths to 10:1 — the small source's
    // SHARE is ~10x its raw proportion while the big one damps
    assert(small.getAs[Long]("share_micro") > 85000L &&
      small.getAs[Long]("share_micro") < 95000L,
      small.toString)
    assert(big.getAs[Long]("share_micro") > 900000L)
    // the small source over-samples (epochs > 1e6 micros = repetition)
    // while the big one keeps a sub-1 rate
    assert(small.getAs[Long]("epochs_micro") > 1000000L)
    assert(small.getAs[Long]("rate_micro") === 1000000L)
    assert(big.getAs[Long]("rate_micro") < 1000000L)
    // a zero-token source has NO epoch factor or rate — NULL, not 0/0
    assert(void.isNullAt(void.fieldIndex("epochs_micro")))
    assert(void.isNullAt(void.fieldIndex("rate_micro")))
    assert(void.getAs[Long]("share_micro") === 0L)
    intercept[IllegalArgumentException](
      graft.ops.Mixture.temperatureMixturePlan(avail, budgetTokens = 0L))
    // frontier-scale source: a MICRO-quantized sqrt would overflow the
    // share numerator at ~8.5e13 tokens and wrap negative; the milli
    // quantization stays exact
    val huge = Seq(("giant", 100000000000000L), ("tiny", 1000000L))
      .toDF("source", "available_tokens")
    val hp = graft.ops.Mixture
      .temperatureMixturePlan(huge, budgetTokens = 1000000L)
      .orderBy("source").collect()
    assert(hp.forall(_.getAs[Long]("share_micro") >= 0L), hp.mkString)
    assert(hp.map(_.getAs[Long]("share_micro")).sum > 990000L,
      "shares must still sum to ~1e6 at frontier corpus sizes")
  }

  test("preference pairs: Long.MinValue id cannot overflow the descending tie-break") {
    import spark.implicits._
    // two tied rows; chosen must tie-break to the LOWEST id — with a
    // negate(id) key, -Long.MinValue overflows back to Long.MinValue
    // (ANSI off) and silently inverts the order; the -1-id (bitwise
    // NOT) key reverses the full long range exactly
    val df = Seq(
      ("g", Long.MinValue, 5.0), ("g", 7L, 5.0), ("g", 1L, 1.0))
      .toDF("g", "id", "score")
    val r = graft.ops.Preference.minePairs(df, "g", "id", col("score"))
      .collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("chosen_id") === Long.MinValue)
    assert(r.head.getAs[Long]("rejected_id") === 1L)
  }
}
