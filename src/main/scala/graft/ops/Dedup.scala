package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * normalized-exact, MinHash+LSH near-dup, SimHash near-dup, and exact
  * n-gram Jaccard verification (north-star surface, SURVEY.md §7.1).
  *
  * Scale design: every candidate-generation step is a hash-shuffle on a
  * bucket key (band hash / simhash band), never a cross join. The only
  * pairwise work happens inside buckets, whose expected size is O(dups) —
  * at 100 TB the shuffles are linear in corpus size and the verify step is
  * linear in candidate count.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct key set — one hash shuffle. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Normalization used before "exact-ish" text dedup: lowercase, strip
    * punctuation, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[\\p{Punct}]", " "), "\\s+", " "))

  /** Exact dedup after normalization, keyed on a 64-bit content hash so the
    * shuffle carries 8 bytes per row instead of the document text. Keeps
    * the lowest idCol per group (deterministic canonical row). */
  def normalizedExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df.withColumn("__h", xxhash64(normalizeText(col(textCol))))
    val canonical = hashed.groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
    hashed.join(canonical, Seq("__h", idCol)).drop("__h")
  }

  /** MinHash signature: `numHashes` independent permutations approximated
    * by seeded xxhash64 over the shingle set; element i is the min hash
    * under seed i. Backed by a custom codegen Expression — the equivalent
    * higher-order-function formulation
    * (array(array_min(transform(shingles, xxhash64(_, seed))) ...)) runs
    * its lambdas interpreted and allocates one array per seed per row,
    * which dominated the q30 profile; the expression is bit-identical and
    * one tight generated loop (graft.functions.MinHashSignatureExpr). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.SketchExpressions.minhashSignature(shingles, numHashes)

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`,
    * hash each band to one 64-bit key. Docs sharing any band key become
    * candidates. */
  def bandHashes(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), concat_ws(",",
        slice(signature, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** MinHash+LSH near-duplicate pairs.
    *
    * Pipeline: shingle → signature → explode band hashes → self-join on
    * (band hash) → distinct candidate pairs → exact Jaccard verify on the
    * shingle sets → threshold filter.
    *
    * The band join is an equi-join on a high-cardinality hash key: at
    * 100 TB it shuffle-partitions evenly (band hashes are uniform), and
    * AQE's skew handling covers pathological bucket skew (e.g. boilerplate
    * documents). Returns (idA, idB, jaccard) with idA < idB.
    */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val shingled = df
      .select(col(idCol).as("id"),
        TextAnalysis.shingleSet(col(textCol), shingleK).as("shingles"))
      .filter(size(col("shingles")) > 0)
    // Candidate generation carries ONLY (band, id) — 16 bytes/row through
    // the self-join and the pair-dedup. Shingle arrays would multiply the
    // exchange by the document size × bands; they re-join once below,
    // keyed by id, for the exact-Jaccard verify. Column pruning keeps the
    // signature computation out of the shingle branches.
    val banded = shingled.select(col("id"),
      explode(bandHashes(minhashSignature(col("shingles"), numHashes),
        bands, rowsPerBand)).as("band"))
    val candidates = banded.select(col("band"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("id").as("id_b")), Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates(Seq("id_a", "id_b"))
    candidates
      .join(shingled.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard similarity for an explicit pair relation —
    * the verification primitive (also usable standalone with any blocking
    * key). Inputs carry `sh_a`/`sh_b` shingle-set columns. */
  def jaccard(shA: Column, shB: Column): Column =
    size(array_intersect(shA, shB)).cast("double") /
      greatest(size(array_union(shA, shB)), lit(1))

  /** EXACT-threshold Jaccard similarity JOIN over whitespace-token sets
    * with AllPairs/PPJoin prefix filtering (Bayardo et al., "Scaling Up
    * All Pairs Similarity Search", WWW'07; Xiao et al., "Efficient
    * Similarity Joins for Near Duplicate Detection", WWW'08): every
    * unordered pair (u < v) whose token-set Jaccard is >= `threshold`,
    * with the exact score. Unlike the banded MinHash/SimHash/LSH paths
    * (recall < 1 by design, verified through contracts), the result set
    * here is EXACT, so the operator carries a full DuckDB hash oracle
    * (q146) — the brute-force all-pairs expansion runs only on the
    * oracle side, at verify SF.
    *
    * Why the prefix join is not an all-pairs join: fix ONE global token
    * order — document frequency ascending, token ascending (rarest
    * first) — and index each document only by its PREFIX of
    * p = n - ceil(t·n) + 1 tokens under that order. If J(x,y) >= t then
    * |x∩y| >= t·|x∪y| >= t·max(|x|,|y|), and the globally SMALLEST
    * common token w has all other |x∩y|-1 common tokens after it in x,
    * so its position in x is <= |x| - |x∩y| + 1 <= |x| - ceil(t·|x|) + 1
    * = p(x) — w is inside x's prefix, and by the symmetric argument
    * inside y's. The SAME token therefore keys both documents in the
    * prefix-postings self-join, so no qualifying pair is missed, while
    * rare-first ordering keeps the postings short: hot (stop-word)
    * tokens sort to the un-indexed suffix and generate no candidates
    * unless a document is so short its prefix covers them anyway.
    *
    * Scale shape: one token-frequency aggregation (vocabulary-keyed),
    * one per-document canonical sort (inside a groupBy collect, bounded
    * by document length), one prefix-postings self-join shuffled on the
    * token key — posting mass is Σ p(doc) ≈ (1-t)·Σ n(doc), not the
    * corpus token mass — a distinct on candidate pairs (probed on the
    * controlled-duplicate synthesis: candidates ≡ qualifying pairs,
    * zero over-generation, ~1.3e-4 of all-pairs; runtime grew 2.2×
    * while duplicate mass grew 13.7× — BASELINE.md round 15, Wave7), a
    * length pre-filter
    * (min(|x|,|y|) >= t·max(|x|,|y|), necessary for J >= t), and an
    * exact array_intersect verify per CANDIDATE. No cross join, no
    * all-pairs expansion anywhere on the engine side. */
  def jaccardJoinPrefix(df: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val ordered = jaccardOrderedTokens(df, textCol, idCol)
    jaccardPrefixCandidatesOf(ordered, threshold)
      .join(ordered.select(col("id").as("u"), col("toks").as("toks_u"),
        col("n").as("nu")), Seq("u"))
      .join(ordered.select(col("id").as("v"), col("toks").as("toks_v"),
        col("n").as("nv")), Seq("v"))
      .withColumn("inter",
        size(array_intersect(col("toks_u"), col("toks_v"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("nu") + col("nv") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("u"), col("v"), col("jaccard"))
  }

  /** Per-document token sets in the canonical rare-first order
    * (document frequency ascending, token ascending): (id, toks, n).
    * sort_array over (df, token) structs is a total order because
    * tokens are distinct within a document. */
  private def jaccardOrderedTokens(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val posting = df
      .select(col(idCol).as("id"),
        array_distinct(TextAnalysis.tokens(col(textCol))).as("raw"))
      .filter(size(col("raw")) > 0)
      .select(col("id"), explode(col("raw")).as("token"))
    val dfreq = posting.groupBy(col("token")).agg(count(lit(1)).as("dfq"))
    posting.join(dfreq, "token")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("dfq"), col("token"))))
        .as("ord"))
      .select(col("id"),
        transform(col("ord"), s => s.getField("token")).as("toks"),
        size(col("ord")).as("n"))
  }

  /** Candidate pairs from the prefix-postings self-join over a
    * canonically-ordered corpus, with the length pre-filter applied —
    * the relation [[jaccardJoinPrefix]] verifies. Exposed (via
    * [[jaccardPrefixCandidates]]) for the pruning probe and the
    * superset spec: every qualifying pair must appear here, and its
    * size against the all-pairs count measures what prefix filtering
    * buys. */
  private def jaccardPrefixCandidatesOf(ordered: DataFrame,
      threshold: Double): DataFrame = {
    val pref = ordered
      .withColumn("p",
        (col("n") - ceil(col("n") * lit(threshold)) + 1).cast("int"))
      .select(col("id"), col("n"),
        explode(slice(col("toks"), lit(1), col("p"))).as("token"))
    pref.select(col("token"), col("id").as("u"), col("n").as("nu"))
      .join(pref.select(col("token"), col("id").as("v"), col("n").as("nv")),
        Seq("token"))
      .filter(col("u") < col("v"))
      .filter(least(col("nu"), col("nv")).cast("double") >=
        lit(threshold) * greatest(col("nu"), col("nv")))
      .select(col("u"), col("v"))
      .distinct()
  }

  private[graft] def jaccardPrefixCandidates(df: DataFrame, textCol: String,
      idCol: String, threshold: Double): DataFrame =
    jaccardPrefixCandidatesOf(
      jaccardOrderedTokens(df, textCol, idCol), threshold)

  /** 64-bit SimHash over tokens: per-bit majority vote of ±1 across token
    * hashes, bit set when the vote is positive (Charikar). The vote loops
    * run in a custom codegen Expression (graft.functions.SimHash64Expr) —
    * the 64-aggregate HOF formulation evaluates 64 interpreted passes
    * over every token array; the expression is bit-identical in one. */
  def simhash64(text: Column): Column =
    graft.functions.SketchExpressions.simhash64(
      transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 16-bit bands of the simhash (docs
    * within hamming distance ≤ 3 of a 64-bit hash share at least one of 4
    * bands by pigeonhole), then verify hamming distance. Same
    * shuffle-on-band-key scale shape as MinHash LSH. */
  def simhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val banded = withSim.withColumn("band",
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("i"),
          shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("v"))
      }: _*)))
    val a = banded.select(col("band"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b"))
      .dropDuplicates(Seq("id_a", "id_b"))
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Bloom-filter dedup PRE-SCREEN: build a bloom over the seen corpus's
    * normalized 64-bit content keys (one distributed aggregate — the
    * filter is MODEL-sized: numBits/8 bytes regardless of corpus size)
    * and stamp every arriving row with `maybe_seen`. Rows where the
    * bloom says "definitely new" skip the exact anti-join entirely; only
    * the maybe-seen remainder (true dups + ~fpp false positives) pays
    * the join against the seen keys. At 100 TB this is what keeps
    * incremental ingestion from re-shuffling the seen-corpus keys for
    * every batch — the screen is a broadcast-constant probe, zero
    * shuffles over the batch. Bloom construction guarantees NO false
    * negatives (a seen key always probes true), so the screen never
    * loses a duplicate; construction is deterministic (fixed hash
    * seeds), so q91's contract row is stable.
    *
    * Built on Catalyst's own BloomFilterAggregate/BloomFilterMightContain
    * (the runtime join-pruning machinery, reused as a first-class
    * operator); might_contain requires a CONSTANT filter, so the 1-row
    * binary is collected and inlined as a literal — sketch-sized driver
    * state, same class as freqItems/count-min. */
  def bloomScreen(
      seen: DataFrame, batch: DataFrame, textCol: String,
      expectedItems: Long = 1000000L, bitsPerItem: Long = 8L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    def key(c: Column) = xxhash64(normalizeText(c))
    val bloomBytes = seen
      .agg(GraftColumnBridge.column(new BloomFilterAggregate(
          GraftColumnBridge.expression(key(col(textCol))),
          Literal(expectedItems), Literal(expectedItems * bitsPerItem))
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    // BloomFilterAggregate over ZERO rows yields a null binary; inlining
    // that null would make might_contain return NULL and poison every
    // downstream boolean filter. An empty seen set means nothing was
    // seen — every batch row is definitely new.
    if (bloomBytes == null) batch.withColumn("maybe_seen", lit(false))
    else batch.withColumn("maybe_seen",
      GraftColumnBridge.column(BloomFilterMightContain(
        Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
        GraftColumnBridge.expression(key(col(textCol))))))
  }

  /** Test-set decontamination screen (the GPT-3 appendix-C pattern): ids
    * of `corpus` documents sharing at least one n-token n-gram with any
    * `bench` (held-out eval) document. Tokenization is the library-wide
    * whitespace split (TextAnalysis.tokens); documents shorter than n
    * tokens can never collide and are filtered before the explode.
    *
    * Scale shape: the bench side (eval suites, ≪ corpus) distills to a
    * distinct n-gram set and BROADCASTS into a left-semi join, so the
    * corpus-side explode is pipelined — corpus n-grams never hit a
    * shuffle; the only exchanges are the (small) bench-gram distinct
    * and the distinct contaminated ids.
    *
    * When the bench side is too big to broadcast (`broadcastBench =
    * false`), the SAME logical screen runs as a shuffle semi-join on
    * `xxhash64(gram)` — both sides reduce to 8-byte keys before the
    * exchange, so the corpus shuffle carries (id, hash) instead of
    * (id, gram-string). Hashing preserves the no-false-negative
    * guarantee (equal grams hash equal); the cost is a ~m·n/2⁶⁴
    * hash-collision false-positive chance — the same class of risk the
    * bloom pre-screen already accepts, and harmless for a screen whose
    * positives are re-checkable. The default literal-string broadcast
    * path keeps the DuckDB oracle (q93) exact. */
  def ngramScreen(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, broadcastBench: Boolean = true): DataFrame = {
    def grams(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.withColumn("__t", TextAnalysis.tokens(col(textCol)))
        .filter(size(col("__t")) >= n)
        .select(keep :+ explode(
          transform(sequence(lit(1), size(col("__t")) - (n - 1)),
            i => concat_ws(" ", slice(col("__t"), i, lit(n))))).as("__g"): _*)
    val benchGrams = grams(bench, Nil).distinct()
    val corpusGrams = grams(corpus, Seq(col(idCol)))
    val screened =
      if (broadcastBench)
        corpusGrams.join(broadcast(benchGrams), Seq("__g"), "left_semi")
      else
        corpusGrams.select(col(idCol), xxhash64(col("__g")).as("__h"))
          .join(benchGrams.select(xxhash64(col("__g")).as("__h")),
            Seq("__h"), "left_semi")
    screened.select(idCol).distinct()
  }

  /** Embedding near-dup pairs: cosine ≥ threshold via multi-table sign-LSH
    * blocking, verified with exact cosine on PRE-NORMALIZED vectors.
    *
    * Scale design: vectors are unit-normalized once per row (norms are
    * O(n), not O(n²) as in a naive pairwise cosine); each of `tables`
    * independent hyperplane sets contributes one `planes`-bit signature,
    * and only same-(table, signature) pairs are scored — recall
    * 1-(1-p^planes)^tables where p = 1-θ/π. For cosine ≥ 0.98 dup pairs
    * at the 8×8 default the miss probability is < 1e-9, while the
    * candidate set stays ~n²/2^planes per table instead of all pairs.
    * Candidates travel id-only; normalized vectors re-join once for the
    * verify dot product. */
  /** (id, vn) with `vn` unit-normalized ONCE per row: norms are O(n), not
    * O(pairs) as in a naive pairwise cosine. ‖v‖² = v·v through the fused
    * codegen kernel (the aggregate-HOF fold runs interpreted), same
    * element-ordered accumulation. Shared by the LSH path and the exact
    * all-pairs reference so their verify cosines are bit-identical. */
  private def unitNormalized(
      df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vd"))
      .withColumn("norm",
        sqrt(graft.functions.SketchExpressions.dotProduct(col("vd"), col("vd"))))
      .filter(col("norm") > 0)
      .withColumn("vn", transform(col("vd"), x => x / col("norm")))
      .select(col("id"), col("vn"))

  def embeddingNearDups(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      planes: Int = 8,
      tables: Int = 8): DataFrame = {
    val base = unitNormalized(df, vecCol, idCol)
    val sigs = base
      .select(col("id"), posexplode(
        graft.functions.SketchExpressions.allSignBits(col("vn"), planes, tables)))
      .select(col("pos").as("t"), col("col").as("sig"), col("id"))
    val candidates = sigs.select(col("t"), col("sig"), col("id").as("id_a"))
      .join(sigs.select(col("t"), col("sig"), col("id").as("id_b")), Seq("t", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates(Seq("id_a", "id_b"))
    candidates
      .join(base.select(col("id").as("id_a"), col("vn").as("vn_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("vn").as("vn_b")), Seq("id_b"))
      // vectors are unit-normalized, so the verify cosine is one shared
      // dot-product fold (same code path as every other caller)
      .withColumn("cosine",
        round(Similarity.dotProduct(col("vn_a"), col("vn_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact all-pairs twin of [[embeddingNearDups]]: the same
    * normalize-once base and round(dot, 6) threshold (bit-identical
    * verify values), but candidate generation is the full crossJoin —
    * O(n²), deliberately an ORACLE/recall baseline only, never a scale
    * path. Bench runs it per round at sf0.1 to emit pair recall for the
    * LSH paths (q36b/q36c) beside their wall-times, the same
    * silent-quality-regression telemetry the ANN family carries
    * (VERDICT r8 item 2). */
  def exactEmbeddingPairs(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val base = unitNormalized(df, vecCol, idCol)
    base.select(col("id").as("id_a"), col("vn").as("vn_a"))
      .crossJoin(base.select(col("id").as("id_b"), col("vn").as("vn_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(Similarity.dotProduct(col("vn_a"), col("vn_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  // ---- substring-level duplicated spans -----------------------------

  /** Duplicated n-gram SPANS — substring-level exact dedup in the style
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499), which removes repeated
    * SUBSTRINGS a document-level dedup cannot see (boilerplate headers,
    * license blocks, templated passages). For every token position
    * whose word n-gram occurs MORE THAN ONCE in the corpus (counting
    * within-document repeats), overlapping and adjacent occurrences are
    * merged into maximal per-document spans: one output row per span,
    * (doc_id, span_start, span_end, span_tokens), token positions
    * 1-based inclusive.
    *
    * Scale shape: the only wide operations are a count keyed on the
    * 8-byte gram HASH (xxhash64 — grams themselves never shuffle; a
    * hash collision marking a unique gram duplicated is ~n²/2⁶⁴,
    * negligible beside the method's own n-gram granularity) and one
    * per-document window for the gaps-and-islands merge, partitioned
    * by doc_id — both linear in corpus token count, no pairwise work
    * at any point. The suffix-array construction of the paper is a
    * single-machine algorithm; the hash-count formulation is the
    * shuffle-native equivalent at fixed n. */
  def duplicatedSpans(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, "n-gram size must be >= 1")
    val toks = df.select(col(idCol).as("doc_id"),
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("toks"))
    // positional n-grams as (doc, 1-based start, gram hash): the
    // sequence enumerates starts, the transform hashes each window —
    // narrow, codegen'd, no explode until the 16-byte (doc, start, hash)
    // shape
    val grams = toks
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("toks")) - n + 1),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(n)))))))
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("col").as("gh"))
    val dupHashes = grams.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gh"))
    val dupPos = grams.join(dupHashes, Seq("gh"))
      .select(col("doc_id"), col("start"))
    // gaps-and-islands: consecutive duplicated starts whose gap is ≤ n
    // cover contiguous tokens (gap = n means the windows touch end to
    // start), so they merge into one span
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    dupPos
      .withColumn("__new", when(
        col("start") - lag(col("start"), 1).over(w) > n, 1).otherwise(0))
      .withColumn("__island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + n - 1).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Winnowed duplicated-spans — the SCALE path of [[duplicatedSpans]]:
    * instead of shuffling EVERY positional n-gram hash, shuffle only
    * the winnowing fingerprints (TextAnalysis.winnowFingerprints, the
    * MOSS selection: leftmost-min per w-gram window), an expected
    * ≈ 2/(w+1) of gram positions. Detection keeps the winnowing
    * guarantee's one-sided contract: any repeat of ≥ n+w−1 tokens
    * contains at least one complete w-gram window in BOTH copies, and
    * identical windows select the identical minimum gram — so the
    * shared fingerprint's corpus count reaches 2 and the repeat is
    * found. Shorter repeats (between n and n+w−2 tokens) may be missed
    * — that is the density/recall dial w buys; q104 at w=1 degenerates
    * to the exact variant.
    *
    * Span extents are fingerprint-sparse: islands merge selected
    * positions with gap ≤ n+w−1 (two fingerprints of one contiguous
    * repeat are at most w−1 gram starts apart, plus the n-token window
    * itself), and each island extends to max(start)+n−1. Every
    * selected duplicated POSITION is a genuinely duplicated n-gram
    * position (modulo the same ~n²/2⁶⁴ hash-collision caveat as the
    * exact variant) — the containment contract q104c pins against an
    * empty-violations oracle.
    *
    * Scale shape: one narrow winnowing projection, one count keyed on
    * the 8-byte fingerprint hash over ~2/(w+1) of the gram stream, and
    * the same per-document islands window — strictly less shuffled
    * data than the exact variant at identical stage structure. */
  def duplicatedSpansWinnowed(
      df: DataFrame, textCol: String, idCol: String, n: Int,
      w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1 && w >= 1, "n-gram size and window must be >= 1")
    val sel = df
      .select(col(idCol).as("doc_id"),
        explode(graft.ops.TextAnalysis.winnowFingerprints(
          col(textCol), n, w)).as("fp"))
      .select(col("doc_id"), col("fp.pos").as("start"), col("fp.h").as("gh"))
    val dupHashes = sel.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gh"))
    val dupPos = sel.join(dupHashes, Seq("gh"))
      .select(col("doc_id"), col("start"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    dupPos
      .withColumn("__new", when(
        col("start") - lag(col("start"), 1).over(win) > n + w - 1, 1)
        .otherwise(0))
      .withColumn("__island", sum(col("__new"))
        .over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__island"))
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + n - 1).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  // ---- semantic dedup (SemDeDup) ------------------------------------
  //
  // Semantic deduplication in the SemDeDup style (Abbas et al. 2023,
  // arXiv:2303.09540): embed, cluster, and prune within-cluster
  // near-duplicates — the curation step that removes PARAPHRASE
  // duplicates exact/MinHash dedup cannot see. The published method's
  // keep-one-representative rule is made deterministic here: a document
  // is PRUNED iff some LOWER-id document in its comparison block has
  // cosine ≥ threshold with it, so the minimum id of every similarity
  // star survives and the output is replayable row-for-row (an
  // arbitrary-representative rule would be run-dependent and
  // un-oracle-able). Two variants:
  //  - [[semanticDedup]]: the block is the WHOLE corpus — exact, O(n²),
  //    the oracle twin (DuckDB replays the rule with
  //    list_cosine_similarity over all pairs);
  //  - [[semanticDedupBlocked]]: blocks are trained k-means cells — the
  //    scale path. Pair work collapses from O(n²) to Σ|cell|², and
  //    because every within-cell pair is a real pair under the SAME
  //    rounded cosine, its pruned set is a SUBSET of the exact one
  //    (one-sided error, like the LSH families). With one cell it
  //    degenerates to the exact variant — both properties are the
  //    SimilaritySpec contracts.

  /** Per-document semantic-dedup verdicts, exact variant: (id, kept)
    * for every input row, kept = no lower-id document anywhere in the
    * corpus has cosine ≥ `threshold`. Zero-norm embeddings (no cosine
    * defined) are always kept. O(n²) — oracle twin; the scale path is
    * [[semanticDedupBlocked]]. */
  def semanticDedup(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val pruned = exactEmbeddingPairs(df, vecCol, idCol, threshold)
      .select(col("id_b").as("__pruned_id")).distinct()
    df.select(col(idCol).as("id"))
      .join(broadcast(pruned), col("id") === col("__pruned_id"), "left")
      .select(col("id"), col("__pruned_id").isNull.as("kept"))
  }

  /** Scale variant of [[semanticDedup]]: the comparison block is the
    * document's nearest k-means cell (`centroidRel`: (centroid_id,
    * centv), e.g. [[Similarity.kmeansCentroids]]). Candidate pairs are
    * generated by an equi-join on centroid_id — a hash shuffle on the
    * cell key, never a cross join — so total pair work is Σ|cell|²; at
    * 100 TB cells are sized (√n-ish counts) to keep each block's
    * quadratic term bounded, exactly the published method's trade.
    * Cross-cell near-duplicates are missed (pruned ⊆ exact pruned —
    * the one-sided error the recall contract measures); `probes` is the
    * dial that buys them back: each document joins its top-`probes`
    * cells, so a boundary pair is caught whenever the two documents
    * share ANY probed cell. Every compared pair still gets the exact
    * rounded cosine, so the one-sided property is probe-independent,
    * and the pruned set grows monotonically with `probes` (DedupSpec
    * contracts) up to ≡ exact at probes = k. Cost grows ≤ ×probes² in
    * pair work — the published multi-probe trade. Normalized vectors
    * ride the shuffle once; cosines are bit-identical to the exact
    * twin's. */
  def semanticDedupBlocked(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, centroidRel: DataFrame,
      probes: Int = 1, saltBuckets: Int = 16): DataFrame = {
    val base = unitNormalized(df, vecCol, idCol)
    val assigned = Similarity.assignToCentroidsMulti(base, "vn",
        centroidRel, probes)
      .select(col("centroid_id"), col("id"), col("vn"))
    // Salted pair join: the cell key alone has only |cells| distinct
    // values, so the quadratic pair EXPLOSION of every cell would land
    // on one reducer each — and AQE coalesces further, because the join
    // INPUTS are tiny while the output is Σ|cell|² (the blind spot of
    // size-based coalescing). Sub-blocking the left side by a hash of
    // id_a and replicating the right side across the salt range turns
    // each cell's triangle into `saltBuckets` independent tasks with
    // identical output: pair (a,b) meets exactly once, in the
    // (cell, salt(a)) partition. Right-side replication costs
    // memberships × saltBuckets shuffled rows — linear, the standard
    // skew-salting trade, and at 100 TB it is what keeps the largest
    // cell from serializing the whole stage.
    val salted = assigned
      .select(col("centroid_id"), col("id").as("id_a"), col("vn").as("vn_a"))
      .withColumn("__salt",
        pmod(xxhash64(col("id_a")), lit(saltBuckets.toLong)))
    val replicated = assigned
      .select(col("centroid_id"), col("id").as("id_b"), col("vn").as("vn_b"))
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    val pruned = salted
      .join(replicated, Seq("centroid_id", "__salt"))
      .filter(col("id_a") < col("id_b"))
      // raw kernel, not Similarity.dotProduct: vn is already
      // array<double>, and the wrapper's cast-transform would rebuild
      // BOTH 64-element arrays per scored pair — O(pairs·d) allocation
      // in the hottest loop for a no-op cast
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn_a"), col("vn_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("__pruned_id")).distinct()
    // No broadcast hint here, unlike the batch-bounded incremental
    // variants: `pruned` is the full duplicate-id set — corpus-scale on
    // dup-heavy data — and an unconditional hint would collect it on the
    // driver and OOM at the 100 TB target. AQE broadcasts it at runtime
    // when the measured size is under the threshold, and shuffles
    // otherwise; that decision belongs to the stats, not the plan.
    df.select(col(idCol).as("id"))
      .join(pruned, col("id") === col("__pruned_id"), "left")
      .select(col("id"), col("__pruned_id").isNull.as("kept"))
  }

  /** Incremental semantic dedup, exact variant (the oracle twin): per-
    * incoming-document verdicts against a STANDING already-deduplicated
    * corpus. An incoming document is pruned iff it is within `threshold`
    * of (a) any RETAINED corpus representative, or (b) any lower-id
    * document in its own batch — the non-recursive min-id rule, batch-
    * internal, exactly [[semanticDedup]]'s, so the verdict set is
    * deterministic and SQL-replayable. This is the operation a standing
    * training-data pipeline actually runs: the corpus was deduplicated
    * once; every new crawl batch is vetted against the representatives
    * without re-scoring corpus×corpus pairs. Cost here is
    * O(batch × corpus) — the scale path is
    * [[semanticDedupIncrementalBlocked]], which cuts the corpus side to
    * the batch's probed cells. */
  def semanticDedupIncremental(
      corpusKept: DataFrame, incoming: DataFrame,
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    val rep = unitNormalized(corpusKept, vecCol, idCol)
      .select(col("id").as("rep_id"), col("vn").as("rep_vn"))
    val inc = unitNormalized(incoming, vecCol, idCol)
    // (a) incoming vs retained representatives — a one-directional
    // comparison, so no id ordering applies across the two sides
    val vsCorpus = inc.crossJoin(broadcast(rep))
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn"), col("rep_vn")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id").as("__pruned_id"))
    // (b) incoming vs lower-id incoming — the batch-internal min-id rule
    val l = inc.select(col("id").as("id_a"), col("vn").as("vn_a"))
    val vsBatch = l
      .crossJoin(inc.select(col("id").as("id_b"), col("vn").as("vn_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn_a"), col("vn_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("__pruned_id"))
    val pruned = vsCorpus.unionByName(vsBatch).distinct()
    incoming.select(col(idCol).as("id"))
      .join(broadcast(pruned), col("id") === col("__pruned_id"), "left")
      .select(col("id"), col("__pruned_id").isNull.as("kept"))
  }

  /** Scale variant of [[semanticDedupIncremental]]: both directions of
    * the comparison are scoped to shared k-means cells — the corpus
    * side via the PUBLISHED cell assignment a deployment maintains
    * alongside its centroid index (assigned here from `centroidRel`),
    * the batch side via the same salted within-cell pair join
    * [[semanticDedupBlocked]] uses. Per-batch cost is
    * O(batch × probed-cell members + batch-cell pair work) and NEVER
    * rescans the corpus — the property that makes per-crawl dedup
    * affordable against a 100 TB standing corpus. Same one-sided error
    * as the other blocked paths: pruned ⊆ the exact incremental rule's
    * pruned set, probes dials the boundary recall. */
  def semanticDedupIncrementalBlocked(
      corpusKept: DataFrame, incoming: DataFrame,
      vecCol: String, idCol: String, threshold: Double,
      centroidRel: DataFrame, probes: Int = 1,
      saltBuckets: Int = 16): DataFrame = {
    val rep = Similarity.assignToCentroidsMulti(
        unitNormalized(corpusKept, vecCol, idCol), "vn", centroidRel, probes)
      .select(col("centroid_id"), col("id").as("rep_id"),
        col("vn").as("rep_vn"))
    val inc = Similarity.assignToCentroidsMulti(
        unitNormalized(incoming, vecCol, idCol), "vn", centroidRel, probes)
      .select(col("centroid_id"), col("id"), col("vn"))
    // salt the LARGE side (corpus reps) and replicate the small batch
    // across the salt range — replication cost scales with the batch,
    // never with the standing corpus
    val vsCorpus = inc
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
      .join(rep.withColumn("__salt",
          pmod(xxhash64(col("rep_id")), lit(saltBuckets.toLong))),
        Seq("centroid_id", "__salt"))
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn"), col("rep_vn")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id").as("__pruned_id"))
    val l = inc.select(col("centroid_id"), col("id").as("id_a"),
        col("vn").as("vn_a"))
      .withColumn("__salt",
        pmod(xxhash64(col("id_a")), lit(saltBuckets.toLong)))
    val vsBatch = l
      .join(inc.select(col("centroid_id"), col("id").as("id_b"),
          col("vn").as("vn_b"))
        .withColumn("__salt",
          explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L)))),
        Seq("centroid_id", "__salt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn_a"), col("vn_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("__pruned_id"))
    val pruned = vsCorpus.unionByName(vsBatch).distinct()
    incoming.select(col(idCol).as("id"))
      .join(broadcast(pruned), col("id") === col("__pruned_id"), "left")
      .select(col("id"), col("__pruned_id").isNull.as("kept"))
  }

  // ---- semantic decontamination --------------------------------------

  /** Semantic (embedding-level) DECONTAMINATION: flag every corpus
    * document within cosine `threshold` of ANY benchmark vector — the
    * paraphrase-level sibling of the n-gram decontamination family
    * (q93/q98/q99). A test-set item rewritten in different words slips
    * the gram screen; it does not slip the embedding one. Exact
    * variant: corpus × broadcast(benchmark) through the fused dot
    * kernel — an eval set is small by nature, so the broadcast is
    * bounded and the CORPUS never shuffles (one narrow scoring pass +
    * a hits-keyed aggregate). The hits relation is corpus-scale on
    * contaminated-heavy data, so it carries NO broadcast hint (AQE
    * decides; the q101b lesson). Returns (id, n_hits, contaminated). */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
      vecCol: String, idCol: String, threshold: Double): DataFrame = {
    val b = unitNormalized(bench, vecCol, idCol)
      .select(col("id").as("bench_id"), col("vn").as("bench_vn"))
    val c = unitNormalized(corpus, vecCol, idCol)
    val hits = c.crossJoin(broadcast(b))
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn"), col("bench_vn")), 6))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id")).agg(count(lit(1)).as("__nh"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("__nh"), lit(0L)).as("n_hits"),
        (coalesce(col("__nh"), lit(0L)) > 0).as("contaminated"))
  }

  /** Scale variant of [[semanticDecontaminate]]: corpus vectors probe
    * their `probes` nearest cells and compare only against benchmark
    * vectors ASSIGNED to those cells — pair work drops from
    * corpus × bench to corpus × (bench ∩ probed cells). One-sided
    * error like every blocked pass here: a flagged doc carries a real
    * exact cosine ≥ threshold (q124c pins blocked ⊆ exact through the
    * oracle gate); a cross-cell paraphrase may be missed, and probes
    * is the recall dial. n_hits counts PROBED-cell hits only. */
  def semanticDecontaminateBlocked(corpus: DataFrame, bench: DataFrame,
      vecCol: String, idCol: String, threshold: Double,
      centroidRel: DataFrame, probes: Int = 2): DataFrame = {
    val c = Similarity.assignToCentroidsMulti(
      unitNormalized(corpus, vecCol, idCol), "vn", centroidRel, probes)
    val b = Similarity.assignToCentroidsMulti(
        unitNormalized(bench, vecCol, idCol), "vn", centroidRel, 1)
      .select(col("centroid_id"), col("id").as("bench_id"),
        col("vn").as("bench_vn"))
    val hits = c.join(broadcast(b), Seq("centroid_id"))
      .withColumn("cosine",
        round(graft.functions.SketchExpressions.dotProduct(
          col("vn"), col("bench_vn")), 6))
      .filter(col("cosine") >= threshold)
      .groupBy(col("id")).agg(count(lit(1)).as("__nh"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("__nh"), lit(0L)).as("n_hits"),
        (coalesce(col("__nh"), lit(0L)) > 0).as("contaminated"))
  }
}
