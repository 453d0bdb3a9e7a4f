package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{GraftQuery, Tables}
import graft.ops.TextAnalysis

/** Training-data curation operators a large-scale pipeline runs AFTER
  * cleaning/dedup and BEFORE training: deterministic split assignment,
  * weighted source mixing, sequence packing, and positional token
  * analysis. Every query is DuckDB-oracle-checked — the split/mixing
  * hash is plain modular arithmetic precisely so an independent engine
  * can recompute it bit-for-bit (at production scale the same shape runs
  * on xxhash64; the arithmetic hash keeps the oracle exact while the
  * partition/filter structure is identical).
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Knuth multiplicative hash → [0, 100): deterministic, uniform-ish,
    * and reproducible in any engine with 64-bit integer arithmetic.
    * Never use random() for split assignment — re-runs must route every
    * document to the same split or eval sets leak into training.
    *
    * Overflow-safe by construction: the id is folded mod 2³¹ and the
    * multiplier mod 2³² BEFORE the product, so the intermediate stays
    * < 2⁶³ for any NON-NEGATIVE long id (the only shape a surrogate key
    * takes here; for negative ids Spark's pmod and SQL's % disagree on
    * sign, so the oracle pairing is scoped to ids ≥ 0) — the unmasked
    * (id·mult) silently wraps in non-ANSI Spark but raises OUT_OF_RANGE
    * in DuckDB/ANSI once ids leave the small-fixture range, which would
    * split engines. For ids in [0, 2³¹) the masked form is bit-identical
    * to the plain product mod 2³². (xxhash64 is still the
    * production-path hash; this arithmetic form exists so the oracle
    * recomputes it exactly.) */
  private[queries] def hashBucket(id: org.apache.spark.sql.Column, mult: Long) =
    ((pmod(id, lit(2147483648L)) * (mult % 4294967296L)) % 4294967296L) % 100

  /** [[hashBucket]] with a caller-chosen modulus — fine-grained rates
    * (parts-per-million keep decisions, shard routing) instead of the
    * percent granularity the split queries use. Same overflow-masked
    * arithmetic, same oracle-exact replay. */
  private[queries] def hashBucketN(
      id: org.apache.spark.sql.Column, mult: Long,
      buckets: org.apache.spark.sql.Column) =
    ((pmod(id, lit(2147483648L)) * (mult % 4294967296L)) % 4294967296L) % buckets

  /** Deterministic train/val/test split (80/10/10) by hashed doc id —
    * stateless, no shuffle at all: the split column is a narrow
    * projection, so at 100 TB this is a zero-exchange map stage. */
  val q55HashSplit = GraftQuery(
    "q55_hash_split",
    (s, dir) =>
      docs(s, dir)
        .withColumn("bucket", hashBucket(col("doc_id"), 2654435761L))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("tokens"))
        .orderBy(col("lang"), col("split")),
    Some("""SELECT lang, split, count(*) AS docs,
      CAST(sum(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))) AS BIGINT) AS tokens
      FROM (SELECT *, CASE WHEN bucket < 80 THEN 'train'
                           WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT *, (((doc_id % 2147483648) * (2654435761 % 4294967296))
                    % 4294967296) % 100 AS bucket
                  FROM documents) b) s
      GROUP BY lang, split ORDER BY lang, split"""))

  /** Weighted source mixing: each source keeps a deterministic fraction
    * of its documents (the data-mixture knob of LLM training runs). The
    * keep decision is per-row hash arithmetic — no shuffle, no sampling
    * nondeterminism; the per-source weight here is a deterministic
    * function of the source name so the oracle needs no side table. */
  val q56SourceMixing = GraftQuery(
    "q56_source_mixing",
    (s, dir) =>
      docs(s, dir)
        .withColumn("weight_pct", lit(30) + (length(col("source")) * 7) % 50)
        .withColumn("keep",
          hashBucket(col("doc_id"), 1099511628211L) < col("weight_pct"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("total_docs"),
          count(when(col("keep"), 1)).as("kept_docs"),
          first(col("weight_pct")).as("target_pct"),
          round(count(when(col("keep"), 1)) * 100.0 / count(lit(1)), 2)
            .as("achieved_pct"))
        .orderBy(col("source")),
    Some("""SELECT source, count(*) AS total_docs,
      count(CASE WHEN keep THEN 1 END) AS kept_docs,
      first(weight_pct) AS target_pct,
      round(count(CASE WHEN keep THEN 1 END) * 100.0 / count(*), 2) AS achieved_pct
      FROM (SELECT source, 30 + (len(source) * 7) % 50 AS weight_pct,
              (((doc_id % 2147483648) * (1099511628211 % 4294967296))
                % 4294967296) % 100 <
                30 + (len(source) * 7) % 50 AS keep
            FROM documents) m
      GROUP BY source ORDER BY source"""))

  /** Sequence packing: concatenate documents per language in a stable
    * order and cut at a fixed token budget — each document lands in the
    * bin where its first token falls. One running-sum window per
    * language partition (the partition key bounds window state); bins
    * and fill-rate fall out arithmetically. This is the standard
    * "greedy pack in corpus order" used to batch LLM pretraining data. */
  val q57SequencePacking = GraftQuery(
    "q57_sequence_packing", { (s, dir) =>
      val budget = 2048.0
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("lang"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .withColumn("bin",
          floor((col("cum") - col("ntok")) / lit(budget)).cast("long"))
        .groupBy(col("lang"))
        .agg(
          countDistinct(col("bin")).as("bins"),
          sum(col("ntok")).as("total_tokens"),
          round(sum(col("ntok")) / (countDistinct(col("bin")) * budget), 4)
            .as("fill_rate"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(DISTINCT bin) AS bins,
      CAST(sum(ntok) AS BIGINT) AS total_tokens,
      round(sum(ntok) / (count(DISTINCT bin) * 2048.0), 4) AS fill_rate
      FROM (SELECT lang, ntok,
              CAST(floor((sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok)
                / 2048.0) AS BIGINT) AS bin
            FROM (SELECT lang, doc_id,
                    len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS ntok
                  FROM documents) t) p
      GROUP BY lang ORDER BY lang"""))

  /** Document chunking with stride — splitting long documents into
    * overlapping context windows (chunk 64 tokens, stride 48 → 16-token
    * overlap), the other half of the packing story: q57 packs SHORT
    * documents up to a budget, this splits LONG ones down to it. One
    * narrow projection computes the stride grid per document
    * (sequence), one explode emits the chunks — rows × n/stride before
    * the single aggregate shuffle, the same Expand-then-combine posture
    * as the sliding window. Chunk token counts and boundaries are plain
    * arithmetic, so the oracle recomputes every chunk in SQL. */
  val q90ChunkingStride = GraftQuery(
    "q90_chunking_stride", { (s, dir) =>
      val chunk = 64
      val stride = 48
      // coalesce: a null text must count as an EMPTY document on both
      // engines — without it Spark's null-skipping least() would
      // fabricate a phantom full-length chunk for null docs while
      // DuckDB dropped them, splitting the oracle
      val chunks = docs(s, dir)
        .select(col("doc_id"),
          coalesce(TextAnalysis.tokenCount(col("text")), lit(0)).as("n"))
        .withColumn("start",
          explode(sequence(lit(1), greatest(col("n"), lit(1)), lit(stride))))
        .withColumn("chunk_len",
          least(lit(chunk), col("n") - col("start") + lit(1)))
        // only the n=0 degenerate grid ([1]) produces a non-positive
        // length; real starts satisfy start ≤ n → chunk_len ≥ 1
        .filter(col("chunk_len") > 0)
      chunks.agg(
        countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("chunks"),
        round(avg(col("chunk_len")), 4).as("avg_chunk_len"),
        max(col("chunk_len")).as("max_chunk_len"),
        count(when(col("chunk_len") < chunk, 1)).as("partial_chunks"))
    },
    Some("""WITH base AS (
        SELECT doc_id,
          coalesce(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)), 0) AS n
        FROM documents),
      chunks AS (
        SELECT doc_id, least(64, n - start + 1) AS chunk_len
        FROM (SELECT doc_id, n,
                unnest(generate_series(1, greatest(n, 1), 48)) AS start
              FROM base) g
        WHERE least(64, n - start + 1) > 0)
      SELECT count(DISTINCT doc_id) AS docs, count(*) AS chunks,
        round(avg(chunk_len), 4) AS avg_chunk_len,
        max(chunk_len) AS max_chunk_len,
        count(CASE WHEN chunk_len < 64 THEN 1 END) AS partial_chunks
      FROM chunks"""))

  /** posexplode generator surface (§2.10): token + position in one
    * generate step; positional stats per token. The oracle zips DuckDB's
    * parallel unnests (list + generate_series) to reproduce (pos, token)
    * pairs. 1-based positions on both sides. */
  val q58Posexplode = GraftQuery(
    "q58_posexplode",
    (s, dir) =>
      docs(s, dir)
        .select(posexplode(TextAnalysis.tokens(col("text"))))
        .select((col("pos") + 1).as("pos"), col("col").as("token"))
        .groupBy(col("token"))
        .agg(
          count(lit(1)).as("occurrences"),
          round(avg(col("pos")), 4).as("avg_pos"),
          min(col("pos")).as("min_pos"))
        .orderBy(col("occurrences").desc, col("token"))
        .limit(15),
    Some("""SELECT token, count(*) AS occurrences,
      round(avg(pos), 4) AS avg_pos, min(pos) AS min_pos
      FROM (SELECT unnest(toks) AS token,
              unnest(generate_series(1, len(toks))) AS pos
            FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
                  FROM documents) t) u
      GROUP BY token ORDER BY occurrences DESC, token LIMIT 15"""))

  /** Gopher-style repetition filters: duplicate-token fraction and
    * top-bigram share per document, aggregated per source. The Spark side
    * computes both WITHOUT a shuffle (sorted-array fold per row,
    * TextAnalysis.topBigramFraction); the oracle recomputes the same
    * numbers via the orthodox unnest + double-group route — independent
    * algorithms agreeing on every value. */
  val q60RepetitionFilters = GraftQuery(
    "q60_repetition_filters",
    (s, dir) =>
      docs(s, dir)
        .select(col("source"),
          TextAnalysis.duplicateTokenFraction(col("text")).as("dupfrac"),
          TextAnalysis.topBigramFraction(col("text")).as("topfrac"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("docs"),
          round(avg(col("dupfrac")), 4).as("avg_dup_token_frac"),
          round(avg(col("topfrac")), 4).as("avg_top_bigram_frac"),
          count(when(col("topfrac") > 0.1, 1)).as("flagged_repetitive"))
        .orderBy(col("source")),
    Some("""WITH t AS (
        SELECT doc_id, source,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        FROM documents),
      d AS (
        SELECT doc_id, source, len(toks) AS ntok, len(list_distinct(toks)) AS ndis,
          CASE WHEN len(toks) >= 2 THEN
            list_transform(generate_series(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1])
          ELSE CAST([] AS VARCHAR[]) END AS bgs
        FROM t),
      b AS (
        SELECT doc_id, max(c) AS top FROM (
          SELECT doc_id, bg, count(*) AS c
          FROM (SELECT doc_id, unnest(bgs) AS bg FROM d) u
          GROUP BY doc_id, bg) g
        GROUP BY doc_id),
      m AS (
        SELECT d.source,
          CASE WHEN ntok > 0 THEN 1.0 - ndis * 1.0 / ntok ELSE 0.0 END AS dupfrac,
          coalesce(top, 0) * 1.0 / greatest(len(bgs), 1) AS topfrac
        FROM d LEFT JOIN b USING (doc_id))
      SELECT source, count(*) AS docs,
        round(avg(dupfrac), 4) AS avg_dup_token_frac,
        round(avg(topfrac), 4) AS avg_top_bigram_frac,
        count(CASE WHEN topfrac > 0.1 THEN 1 END) AS flagged_repetitive
      FROM m GROUP BY source ORDER BY source"""))

  /** PII redaction audit. The corpus carries no PII, so a deterministic
    * injection (email on doc_id%10=0, phone on doc_id%10=5) makes the
    * redaction measurable; both engines inject identically, redact with
    * the same RE2-compatible patterns, and assert zero residual matches
    * after redaction. */
  val q61PiiRedaction = GraftQuery(
    "q61_pii_redaction", { (s, dir) =>
      val injected = docs(s, dir).withColumn("t2",
        concat(col("text"),
          when(col("doc_id") % 10 === 0,
            concat(lit(" contact u"), col("doc_id").cast("string"), lit("@example.com")))
            .when(col("doc_id") % 10 === 5, lit(" call 555-123-4567"))
            .otherwise(lit(""))))
      val anyPii = s"${TextAnalysis.EmailRe}|${TextAnalysis.PhoneRe}"
      injected
        .withColumn("redacted", TextAnalysis.redactPii(col("t2")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("docs"),
          sum(regexp_count(col("t2"), lit(TextAnalysis.EmailRe))).as("emails_found"),
          sum(regexp_count(col("t2"), lit(TextAnalysis.PhoneRe))).as("phones_found"),
          count(when(col("redacted") =!= col("t2"), 1)).as("docs_redacted"),
          sum(regexp_count(col("redacted"), lit(anyPii))).as("residual_pii"))
        .orderBy(col("source"))
    }, {
      // both regexes are RE2-compatible and pass through a DuckDB
      // single-quoted literal unmodified (no escape processing there)
      val email = TextAnalysis.EmailRe
      val phone = TextAnalysis.PhoneRe
      Some(s"""WITH inj AS (
        SELECT source, text || CASE WHEN doc_id % 10 = 0
            THEN ' contact u' || doc_id || '@example.com'
          WHEN doc_id % 10 = 5 THEN ' call 555-123-4567'
          ELSE '' END AS t2
        FROM documents),
      red AS (
        SELECT source, t2,
          regexp_replace(regexp_replace(t2, '$email', '<EMAIL>', 'g'),
            '$phone', '<PHONE>', 'g') AS redacted
        FROM inj)
      SELECT source, count(*) AS docs,
        CAST(sum(len(regexp_extract_all(t2, '$email'))) AS BIGINT) AS emails_found,
        CAST(sum(len(regexp_extract_all(t2, '$phone'))) AS BIGINT) AS phones_found,
        count(CASE WHEN redacted <> t2 THEN 1 END) AS docs_redacted,
        CAST(sum(len(regexp_extract_all(redacted, '$email|$phone'))) AS BIGINT) AS residual_pii
      FROM red GROUP BY source ORDER BY source""")
    })

  /** The NAMED Gopher quality-rule battery (Rae et al. 2021, App.
    * A1.1) as per-source telemetry: each rule's fail count plus the
    * battery pass count — the per-rule drill-down a curation run needs
    * before committing to a filter (the composite q26 score says HOW
    * GOOD, this says WHY dropped). The fixture corpus has no lines,
    * symbols or ellipses, so deterministic injections (the q61
    * pattern — identical in both engines, keyed on doc_id residues)
    * make every rule measurable. All thresholds evaluate in integer
    * arithmetic (ratios cross-multiplied), so the oracle re-derives
    * the whole battery bit-exactly in DuckDB list lambdas. Scale
    * shape: one narrow codegen projection per document, then a
    * tiny per-source aggregate — no extra shuffle. */
  val q142GopherRules = GraftQuery(
    "q142_gopher_rules", { (s, dir) =>
      val injected = docs(s, dir).withColumn("t2",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            lit(" # # # # # # # # # # # #")).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit(" " + (0 to 29).mkString(" "))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\n- x" * 10)).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit("\nto be continued...")).otherwise(lit(""))))
      val g = col("g")
      val fails = Seq("fail_word_count", "fail_mean_word_len",
        "fail_symbol_ratio", "fail_bullet_lines", "fail_ellipsis_lines",
        "fail_alpha_words", "fail_stopwords")
      injected
        // the fused one-pass kernel; gopherFlags is its bit-parity twin
        .withColumn("g", TextAnalysis.gopherFlagsCompiled(col("t2")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("docs"),
          fails.map(f =>
            sum(when(g.getField(f), 1L).otherwise(0L)).as(f)) :+
            sum(when(fails.map(f => !g.getField(f)).reduce(_ && _), 1L)
              .otherwise(0L)).as("pass_all"): _*)
        .orderBy(col("source"))
    },
    Some("""WITH inj AS (
        SELECT source, text
          || CASE WHEN doc_id % 7 = 0 THEN ' # # # # # # # # # # # #' ELSE '' END
          || CASE WHEN doc_id % 17 = 0 THEN ' 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25 26 27 28 29' ELSE '' END
          || CASE WHEN doc_id % 11 = 0 THEN repeat(chr(10) || '- x', 10) ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'to be continued...' ELSE '' END AS t2
        FROM documents),
      f AS (
        SELECT source, t2,
          list_filter(string_split_regex(t2, '\s+'), w -> len(w) > 0) AS ws,
          string_split(t2, chr(10)) AS ls
        FROM inj),
      r AS (
        SELECT source,
          CAST(len(ws) AS BIGINT) AS n, CAST(len(ls) AS BIGINT) AS nl,
          CAST(coalesce(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sumlen,
          CAST((len(t2) - len(replace(t2, '#', ''))) * 3
            + (len(t2) - len(replace(t2, '...', ''))) AS BIGINT) AS sym3,
          CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-•*]'))) AS BIGINT) AS bl,
          CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS el,
          CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS aw,
          (CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'the') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'be') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'to') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'of') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'and') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'that') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'have') THEN 1 ELSE 0 END
           + CASE WHEN list_contains(list_transform(ws, w -> lower(w)), 'with') THEN 1 ELSE 0 END) AS sh
        FROM f),
      flags AS (
        SELECT source,
          (n < 20 OR n > 100000) AS f1,
          (sumlen < n * 3 OR sumlen > n * 10) AS f2,
          (sym3 * 10 > n * 3) AS f3,
          (bl * 10 > nl * 9) AS f4,
          (el * 10 > nl * 3) AS f5,
          (aw * 5 < n * 4) AS f6,
          (sh < 2) AS f7
        FROM r)
      SELECT source, count(*) AS docs,
        CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
        CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
        CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
        CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS fail_bullet_lines,
        CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS fail_ellipsis_lines,
        CAST(sum(CASE WHEN f6 THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_words,
        CAST(sum(CASE WHEN f7 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
        CAST(sum(CASE WHEN NOT (f1 OR f2 OR f3 OR f4 OR f5 OR f6 OR f7)
          THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
      FROM flags GROUP BY source ORDER BY source"""))

  /** C4 line-level cleaning telemetry (Raffel et al. 2020 §2.2): run
    * [[TextAnalysis.cleanLines]] (keep lines with ≥ 3 words ending in
    * terminal punctuation) over the corpus plus C4's page-level flags
    * ('{' for code, 'lorem ipsum' for boilerplate), reporting per
    * source what the cleaner would do — lines kept/total, characters
    * removed, documents emptied outright. The fixture has no line
    * structure, so deterministic doc_id-keyed injections (a mixed
    * good/bad line block, a curly-brace token, a lorem-ipsum phrase)
    * make every path measurable; DuckDB replays the cleaner exactly
    * with list lambdas. All counts integer — hash-exact. */
  val q143C4LineClean = GraftQuery(
    "q143_c4_line_clean", { (s, dir) =>
      val injected = docs(s, dir).withColumn("t2",
        concat(col("text"),
          when(col("doc_id") % 19 === 0, lit(" {config}")).otherwise(lit("")),
          when(col("doc_id") % 23 === 0,
            lit(" lorem ipsum dolor")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("\nshort bad\nThis line has enough words to survive the cleaner.\nclick here now"))
            .otherwise(lit(""))))
      injected
        .withColumn("kept", TextAnalysis.cleanLinesKept(col("t2")))
        .withColumn("cleaned", array_join(col("kept"), "\n"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("docs"),
          sum(size(split(col("t2"), "\n")).cast("long")).as("lines_total"),
          sum(size(col("kept")).cast("long")).as("lines_kept"),
          sum((length(col("t2")) - length(col("cleaned"))).cast("long"))
            .as("chars_removed"),
          count(when(col("cleaned") === "", 1)).as("docs_emptied"),
          count(when(col("t2").contains("{"), 1)).as("curly_docs"),
          count(when(lower(col("t2")).contains("lorem ipsum"), 1))
            .as("lorem_docs"))
        .orderBy(col("source"))
    },
    Some("""WITH inj AS (
        SELECT source, text
          || CASE WHEN doc_id % 19 = 0 THEN ' {config}' ELSE '' END
          || CASE WHEN doc_id % 23 = 0 THEN ' lorem ipsum dolor' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'short bad' || chr(10)
               || 'This line has enough words to survive the cleaner.'
               || chr(10) || 'click here now' ELSE '' END AS t2
        FROM documents),
      k AS (
        SELECT source, t2,
          CAST(len(string_split(t2, chr(10))) AS BIGINT) AS nl,
          list_filter(string_split(t2, chr(10)), l ->
            len(list_filter(string_split_regex(l, '\s+'),
              w -> len(w) > 0)) >= 3
            AND regexp_matches(rtrim(l), '[.!?"'']$')) AS kept
        FROM inj),
      c AS (
        SELECT source, nl, CAST(len(kept) AS BIGINT) AS nk, t2,
          -- array_to_string over an EMPTY list is NULL in DuckDB;
          -- Spark's array_join gives '' — align on ''
          coalesce(array_to_string(kept, chr(10)), '') AS cleaned
        FROM k)
      SELECT source, count(*) AS docs,
        CAST(sum(nl) AS BIGINT) AS lines_total,
        CAST(sum(nk) AS BIGINT) AS lines_kept,
        CAST(sum(len(t2) - len(cleaned)) AS BIGINT) AS chars_removed,
        count(CASE WHEN cleaned = '' THEN 1 END) AS docs_emptied,
        count(CASE WHEN contains(t2, '{') THEN 1 END) AS curly_docs,
        count(CASE WHEN contains(lower(t2), 'lorem ipsum') THEN 1 END) AS lorem_docs
      FROM c GROUP BY source ORDER BY source"""))

  /** End-to-end curation pipeline: quality gate → normalized exact dedup
    * → deterministic split assignment → per-split accounting. Composes
    * the operators above the way a production run chains them; the oracle
    * replays the whole chain in SQL (quality CTE shared with q26b, dedup
    * via QUALIFY row_number, same split arithmetic), so the COMPOSITION
    * is verified, not just each stage. */
  val q62CurationPipeline = GraftQuery(
    "q62_curation_pipeline", { (s, dir) =>
      val kept = docs(s, dir)
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .filter(col("q") >= 0.88)
      val deduped = graft.ops.Dedup.normalizedExact(kept, "text", "doc_id")
      deduped
        .withColumn("bucket", hashBucket(col("doc_id"), 2654435761L))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("docs"),
          sum(TextAnalysis.tokenCount(col("text"))).as("tokens"),
          round(avg(col("q")), 4).as("avg_quality"))
        .orderBy(col("split"))
    },
    Some(s"""WITH scored AS (${TextVectorQueries.qualityScoredDocsSql}),
      kept AS (SELECT * FROM scored WHERE q >= 0.88),
      norm AS (
        SELECT *, trim(regexp_replace(regexp_replace(lower(text),
          '[[:punct:]]', ' ', 'g'), '\\s+', ' ', 'g')) AS ntext
        FROM kept),
      dedup AS (
        SELECT * FROM norm
        QUALIFY row_number() OVER (PARTITION BY ntext ORDER BY doc_id) = 1),
      assigned AS (
        SELECT *, CASE
          WHEN (((doc_id % 2147483648) * (2654435761 % 4294967296))
            % 4294967296) % 100 < 80 THEN 'train'
          WHEN (((doc_id % 2147483648) * (2654435761 % 4294967296))
            % 4294967296) % 100 < 90 THEN 'val'
          ELSE 'test' END AS split
        FROM dedup)
      SELECT split, count(*) AS docs,
        CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0))) AS BIGINT) AS tokens,
        round(avg(q), 4) AS avg_quality
      FROM assigned GROUP BY split ORDER BY split"""))

  /** Incremental ingestion dedup: an arriving batch is screened against
    * the seen corpus with semi/anti joins on the normalized 64-bit
    * content key — the join carries 8-byte keys, never documents, so at
    * 100 TB the screen is one hash shuffle of key columns. The incoming
    * batch is constructed as 1/5 replayed duplicates plus 1/5 genuinely
    * new docs; the oracle rebuilds the same batch and screens on the
    * normalized STRING (an independent key representation — agreement
    * also guards the hash-key shortcut against collisions/drift). */
  val q70IncrementalDedup = GraftQuery(
    "q70_incremental_dedup", { (s, dir) =>
      val seen = docs(s, dir)
      val normKey = xxhash64(graft.ops.Dedup.normalizeText(col("text")))
      val replayed = seen.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val fresh = seen.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("new: "), col("text")).as("text"))
      val incoming = replayed.union(fresh).withColumn("k", normKey)
      val seenKeys = seen.select(normKey.as("k"))
      incoming.agg(count(lit(1)).as("incoming_total"))
        .crossJoin(incoming.join(seenKeys, Seq("k"), "left_semi")
          .agg(count(lit(1)).as("already_seen")))
        .crossJoin(incoming.join(seenKeys, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("genuinely_new")))
    },
    Some("""WITH norm AS (
        SELECT trim(regexp_replace(regexp_replace(lower(text),
          '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS nk, doc_id, text
        FROM documents),
      incoming AS (
        SELECT nk FROM norm WHERE doc_id % 5 = 0
        UNION ALL
        SELECT trim(regexp_replace(regexp_replace(lower('new: ' || text),
          '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')) AS nk
        FROM norm WHERE doc_id % 5 = 1),
      seen AS (SELECT DISTINCT nk FROM norm)
      SELECT
        (SELECT count(*) FROM incoming) AS incoming_total,
        (SELECT count(*) FROM incoming i WHERE EXISTS
          (SELECT 1 FROM seen s WHERE s.nk = i.nk)) AS already_seen,
        (SELECT count(*) FROM incoming i WHERE NOT EXISTS
          (SELECT 1 FROM seen s WHERE s.nk = i.nk)) AS genuinely_new"""))

  /** Bloom-filter dedup pre-screen on q70's arriving batch — the stage
    * that runs BEFORE the exact anti-join at 100 TB (only maybe-seen
    * rows pay the join; definitely-new rows skip it). Contract-checked
    * like the other sketches: the bloom guarantees ZERO false negatives
    * (every replayed duplicate must probe maybe_seen = true — an exact
    * oracle value), while the false-positive rate on genuinely-new docs
    * is bounded well under the 8-bits-per-item design point (~2 %
    * expected; asserted ≤ 10 % as a boolean, stable because the bloom's
    * hash seeds are fixed). */
  val q91BloomScreen = GraftQuery(
    "q91_bloom_screen", { (s, dir) =>
      val seen = docs(s, dir)
      // is_replay travels as an explicit column through the screen
      // (bloomScreen preserves batch columns) rather than being decoded
      // back from the doc_id offsets — no assumption on the fixture's
      // id range, which only has to keep the union's ids disjoint
      val replayed = seen.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          lit(true).as("is_replay"))
      val fresh = seen.filter(col("doc_id") % 5 === 1)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("new: "), col("text")).as("text"),
          lit(false).as("is_replay"))
      val screened = graft.ops.Dedup.bloomScreen(
        seen, replayed.union(fresh), "text")
      screened
        .agg(
          count(lit(1)).as("batch_size"),
          count(when(col("is_replay"), 1)).as("replayed_rows"),
          count(when(!col("is_replay"), 1)).as("fresh_rows"),
          count(when(col("is_replay") && !col("maybe_seen"), 1))
            .as("false_negatives"),
          coalesce(
            count(when(!col("is_replay") && col("maybe_seen"), 1)) <=
              count(when(!col("is_replay"), 1)) * 0.1,
            lit(true)).as("fp_rate_ok"))
    },
    Some("""SELECT
        (SELECT count(*) FROM documents WHERE doc_id % 5 = 0) +
        (SELECT count(*) FROM documents WHERE doc_id % 5 = 1) AS batch_size,
        (SELECT count(*) FROM documents WHERE doc_id % 5 = 0) AS replayed_rows,
        (SELECT count(*) FROM documents WHERE doc_id % 5 = 1) AS fresh_rows,
        0 AS false_negatives,
        TRUE AS fp_rate_ok"""))

  /** Test-set decontamination (the GPT-3 appendix-C / PaLM pattern):
    * flag every training-split document that shares a 5-token n-gram
    * with the held-out test split, so eval answers never leak into
    * training data. Splits reuse q55's deterministic hash buckets
    * (train = bucket < 80, test = bucket >= 90) — the screen composes
    * with the split operator instead of inventing its own sampling.
    * Plan shape and 100 TB notes live on `Dedup.ngramScreen`. */
  val q93Decontaminate = GraftQuery(
    "q93_decontaminate", { (s, dir) =>
      val d = docs(s, dir)
        .withColumn("bucket", hashBucket(col("doc_id"), 2654435761L))
      val corpus = d.filter(col("bucket") < 80)
      val hits = graft.ops.Dedup
        .ngramScreen(corpus, d.filter(col("bucket") >= 90),
          "doc_id", "text", n = 5)
        .withColumn("hit", lit(1L))
      corpus.select(col("doc_id"), col("source"))
        .join(hits, Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(coalesce(col("hit"), lit(0L))).as("contaminated"))
        .orderBy(col("source"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, source,
          (((doc_id % 2147483648) * (2654435761 % 4294967296))
            % 4294967296) % 100 AS bucket,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        FROM documents),
      bench AS (
        SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - 4),
          i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM toks WHERE bucket >= 90),
      corpus AS (SELECT doc_id, source, t FROM toks WHERE bucket < 80),
      hits AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 4),
            i -> array_to_string(t[i:i+4], ' '))) AS g
          FROM corpus) cg
        WHERE g IN (SELECT g FROM bench))
      SELECT source, count(*) AS docs,
        CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS contaminated
      FROM corpus c LEFT JOIN hits h USING (doc_id)
      GROUP BY source ORDER BY source"""))

  /** CONTAMINATION SWEEP composition (oracle-exact): the q93 n-gram
    * screen finds DIRECTLY contaminated corpus docs, and personalized
    * PageRank ([[graft.ops.Graph.pageRankPersonalized]]) expands from
    * them over the near-dup graph — because a contaminated document's
    * near-duplicates are contaminated too, even when their own 5-grams
    * were perturbed past the exact screen. Seeds are the screened
    * ORIGINALS present as graph nodes; `expanded` counts the non-seed
    * nodes a 5-round walk reaches — including each hit's perturbed
    * twin, which the exact screen never flagged: the
    * float-tolerance-free zero/nonzero frontier of q156, here doing
    * the discovery it exists for.
    * The whole chain — bucket split, 5-gram screen, twin corpus,
    * shingle edges, five PPR rounds — replays in one DuckDB statement. */
  val q157ContaminationSweep = GraftQuery(
    "q157_contamination_sweep", { (s, dir) =>
      val d = docs(s, dir)
        .withColumn("bucket", hashBucket(col("doc_id"), 2654435761L))
      val corpus = d.filter(col("bucket") < 80)
        .select(col("doc_id"), col("text"))
      val bench = d.filter(col("bucket") >= 90)
      val hits = graft.ops.Dedup
        .ngramScreen(corpus, bench, "doc_id", "text", n = 5)
        .localCheckpoint(eager = false)
      val twins = corpus
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s*", "").as("text"))
      val graphCorpus = corpus.union(twins)
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
      val edges = graft.ops.DedupCluster.sharedShingleEdges(
          graphCorpus, "text", "doc_id", shingleK = 3, minShared = 10,
          maxDf = 1000)
        .localCheckpoint(eager = false)
      val nodes = edges.select(col("u").as("node"))
        .union(edges.select(col("v").as("node"))).distinct()
      // seed ONLY the screened originals: their twins (whose shifted
      // 5-grams the exact screen never saw) must surface via EXPANSION
      // — the discovery this composition exists to demonstrate
      val seeds = nodes.join(hits.select(col("doc_id").as("node")),
          Seq("node"), "left_semi")
        .localCheckpoint(eager = false)
      val ranks = graft.ops.Graph.pageRankPersonalized(
        edges, seeds, iters = 5, damping = 0.85)
      ranks
        .join(seeds.withColumn("s", lit(true)), Seq("node"), "left")
        .agg(
          count(lit(1)).as("nodes"),
          count(when(col("s"), 1)).as("seeds"),
          count(when(col("s").isNull && col("rank") > 0, 1)).as("expanded"),
          round(sum(when(col("s"), col("rank"))), 4).as("seed_mass"),
          round(sum(col("rank")), 4).as("rank_mass"))
        .crossJoin(hits.agg(count(lit(1)).as("direct_hits")))
        .select(col("direct_hits"), col("nodes"), col("seeds"),
          col("expanded"), col("seed_mass"), col("rank_mass"))
    }, {
      val iterate = (1 to 5).map { k =>
        s"""r$k AS (
          SELECT n.node,
            CASE WHEN sd.node IS NOT NULL
              THEN (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT count(*) FROM seeds)
              ELSE 0.0::DOUBLE END +
            0.85::DOUBLE * coalesce(s.inflow, 0.0::DOUBLE) AS rank
          FROM nodes n
          LEFT JOIN seeds sd ON sd.node = n.node
          LEFT JOIN (
            SELECT e.dst AS node, sum(r.rank / d.deg) AS inflow
            FROM sym e JOIN r${k - 1} r ON r.node = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s ON s.node = n.node)"""
      }.mkString(",\n      ")
      Some(s"""WITH base AS (
        SELECT doc_id, text,
          (((doc_id % 2147483648) * (2654435761 % 4294967296))
            % 4294967296) % 100 AS bucket
        FROM documents),
      corpus AS (SELECT doc_id, text FROM base WHERE bucket < 80),
      benchg AS (
        SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - 4),
          i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM (SELECT list_filter(string_split_regex(text, '\\s+'),
                x -> len(x) > 0) AS t
              FROM base WHERE bucket >= 90)),
      hits AS MATERIALIZED (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_id,
            unnest(list_transform(generate_series(1, len(t) - 4),
              i -> array_to_string(t[i:i+4], ' '))) AS g
          FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                  x -> len(x) > 0) AS t FROM corpus) c) cg
        WHERE g IN (SELECT g FROM benchg)),
      gc AS (
        SELECT doc_id, text FROM corpus
        UNION ALL
        SELECT doc_id + 1000000, regexp_replace(text, '^\\S+\\s*', '')
        FROM corpus),
      sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          generate_series(1, greatest(len(toks)-2, 1)),
          i -> array_to_string(list_slice(toks, i, i+2), ' ')))) AS s
        FROM (SELECT doc_id,
                list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
              FROM gc)),
      keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
      shf AS (SELECT doc_id, s FROM sh JOIN keep USING (s)),
      e0 AS MATERIALIZED (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 10),
      sym AS (SELECT u AS src, v AS dst FROM e0
        UNION SELECT v, u FROM e0),
      deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
      nodes AS (SELECT src AS node FROM deg),
      seeds AS MATERIALIZED (
        SELECT node FROM nodes
        WHERE node IN (SELECT doc_id FROM hits)),
      r0 AS (SELECT n.node,
          CASE WHEN sd.node IS NOT NULL
            THEN 1.0::DOUBLE / (SELECT count(*) FROM seeds)
            ELSE 0.0::DOUBLE END AS rank
        FROM nodes n LEFT JOIN seeds sd ON sd.node = n.node),
      $iterate
      SELECT (SELECT count(*) FROM hits) AS direct_hits,
        count(*) AS nodes,
        (SELECT count(*) FROM seeds) AS seeds,
        count(CASE WHEN sd.node IS NULL AND rank > 0 THEN 1 END)
          AS expanded,
        round(sum(CASE WHEN sd.node IS NOT NULL THEN rank END), 4)
          AS seed_mass,
        round(sum(rank), 4) AS rank_mass
      FROM r5 LEFT JOIN seeds sd USING (node)""")
    })

  /** Deterministic epoch shuffle: the training-order randomization every
    * LLM run needs — each epoch visits documents in a different but
    * REPRODUCIBLE pseudo-random order (never `rand()`: re-runs and
    * restarted jobs must agree on the order). The sort key is the q55
    * overflow-safe multiplicative hash at full 2³² resolution with a
    * per-epoch multiplier, so permutations differ across epochs yet any
    * engine recomputes them bit-for-bit.
    *
    * Scale shape: ordering is per (epoch, source) shard — one corpus
    * scan exploded against the epoch dimension, one hash exchange, the
    * window sorts within shards — exactly how shuffled
    * training shards are serialized; a corpus-wide order would instead
    * be repartitionByRange(key) + sortWithinPartitions, never a global
    * single-partition sort. The query surfaces the first 3 docs per
    * (epoch, source) so the oracle observes the head of every shard's
    * permutation without dumping the corpus. */
  val q94EpochShuffle = GraftQuery(
    "q94_epoch_shuffle", { (s, dir) =>
      // ONE corpus scan exploded against the tiny (epoch, mult)
      // dimension and ONE window exchange on (epoch, source) — not a
      // scan + exchange per epoch, which would multiply the 100 TB read
      // by the epoch count
      val epochMults = Seq(1 -> 2654435761L, 2 -> 2246822519L)
      val epochDim = explode(array(epochMults.map { case (e, m) =>
        struct(lit(e).as("epoch"), lit(m).as("mult"))
      }: _*)).as("em")
      // epoch folds into the hashed id (not just the multiplier) so
      // id 0 is not a fixed point of every epoch's permutation
      val key =
        (pmod(col("doc_id") + col("epoch"), lit(2147483648L)) *
          (col("mult") % 4294967296L)) % 4294967296L
      val w = Window.partitionBy(col("epoch"), col("source"))
        .orderBy(key.asc, col("doc_id").asc)
      docs(s, dir)
        .select(col("source"), col("doc_id"), epochDim)
        .select(col("em.epoch").as("epoch"), col("em.mult").as("mult"),
          col("source"), col("doc_id"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("epoch"), col("source"), col("doc_id"), col("rn"))
        .orderBy(col("epoch"), col("source"), col("rn"))
    },
    Some("""WITH keyed AS (
        SELECT e.epoch, d.source, d.doc_id,
          row_number() OVER (
            PARTITION BY e.epoch, d.source
            ORDER BY (((d.doc_id + e.epoch) % 2147483648) * (e.mult % 4294967296))
                       % 4294967296 ASC, d.doc_id ASC) AS rn
        FROM documents d
        CROSS JOIN (VALUES (1, 2654435761), (2, 2246822519)) AS e(epoch, mult))
      SELECT epoch, source, doc_id, rn FROM keyed
      WHERE rn <= 3 ORDER BY epoch, source, rn"""))

  /** Graded contamination score — the thresholded form of q93's binary
    * screen: per training document, the FRACTION of its 5-grams found in
    * the held-out split, banded into clean (no hit) / light (< 20 %) /
    * heavy. Real pipelines drop heavy overlaps and keep-but-log light
    * ones; the binary flag can't make that distinction. Same plan shape
    * as q93 (broadcast gram set), except the probe is a left OUTER join
    * because the miss count is part of the answer; the per-doc aggregate
    * map-side-combines the exploded grams back to one row per document
    * before the exchange. Documents shorter than 5 tokens have no grams
    * and land in `clean` by construction. */
  val q99ContaminationScore = GraftQuery(
    "q99_contamination_score", { (s, dir) =>
      val n = 5
      val d = docs(s, dir)
        .withColumn("bucket", hashBucket(col("doc_id"), 2654435761L))
        .withColumn("t", TextAnalysis.tokens(col("text")))
      def grams(df: DataFrame) =
        df.filter(size(col("t")) >= n)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("t")) - (n - 1)),
              i => concat_ws(" ", slice(col("t"), i, lit(n))))).as("g"))
      val bench = grams(d.filter(col("bucket") >= 90))
        .select("g").distinct().withColumn("hit", lit(1L))
      val scores = grams(d.filter(col("bucket") < 80))
        .join(broadcast(bench), Seq("g"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("grams"),
          sum(coalesce(col("hit"), lit(0L))).as("matched"))
        .withColumn("score", col("matched") / col("grams"))
      d.filter(col("bucket") < 80).select(col("doc_id"))
        .join(scores, Seq("doc_id"), "left_outer")
        .withColumn("band",
          when(coalesce(col("matched"), lit(0L)) === 0L, "clean")
            .when(col("score") < 0.2, "light")
            .otherwise("heavy"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("docs"),
          round(avg(coalesce(col("score"), lit(0.0))), 4).as("avg_score"))
        .orderBy(col("band"))
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          (((doc_id % 2147483648) * (2654435761 % 4294967296))
            % 4294967296) % 100 AS bucket,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        FROM documents),
      bench AS (
        SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - 4),
          i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM toks WHERE bucket >= 90),
      cg AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 4),
          i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM toks WHERE bucket < 80),
      scores AS (
        SELECT cg.doc_id, count(*) AS grams,
          CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS matched
        FROM cg LEFT JOIN bench b USING (g) GROUP BY cg.doc_id),
      banded AS (
        SELECT c.doc_id,
          coalesce(s.matched, 0) AS matched,
          coalesce(s.matched * 1.0 / s.grams, 0.0) AS score,
          CASE WHEN coalesce(s.matched, 0) = 0 THEN 'clean'
               WHEN s.matched * 1.0 / s.grams < 0.2 THEN 'light'
               ELSE 'heavy' END AS band
        FROM (SELECT doc_id FROM toks WHERE bucket < 80) c
        LEFT JOIN scores s USING (doc_id))
      SELECT band, count(*) AS docs, round(avg(score), 4) AS avg_score
      FROM banded GROUP BY band ORDER BY band"""))

  /** Temperature-weighted source resampling (oracle-checked) — the
    * DoReMi/multinomial α-mixing knob: target source weights
    * w_s ∝ n_s^α with α = 0.5 flatten the source distribution (an
    * over-represented crawl contributes relatively less, a rare
    * high-quality source relatively more), the total budget is half
    * the corpus, and each source keeps a deterministic
    * parts-per-million fraction rate_s = min(1, B·w_s / n_s) of its
    * documents by hashed id. q56 is the fixed-weight mixing knob; this
    * is the knob that DERIVES the weights from the corpus's own
    * counts. Scale shape: one source-count aggregate (tiny), one 1-row
    * total, a broadcast rate join, and a narrow per-row keep stamp —
    * no corpus shuffle anywhere. */
  val q110TemperatureMixing = GraftQuery(
    "q110_temperature_mixing", { (s, dir) =>
      val counts = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.agg(
        sum(col("n")).cast("double").as("nn"),
        sum(sqrt(col("n"))).as("sq"))
      val rates = counts.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          round(least(lit(1.0),
            (lit(0.5) * col("nn")) * (sqrt(col("n")) / col("sq")) / col("n"))
            * 1000000).cast("long").as("rate_ppm"))
      docs(s, dir)
        .select(col("source"),
          hashBucketN(col("doc_id"), 2654435761L, lit(1000000L)).as("bucket"))
        .join(broadcast(rates), Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("bucket") < col("rate_ppm"), 1)).as("kept_docs"),
          first(col("rate_ppm")).as("rate_ppm"))
        .orderBy(col("source"))
    },
    Some("""WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, sum(sqrt(n)) AS sq
              FROM counts),
      rates AS (
        SELECT source, n,
          CAST(round(least(1.0, (0.5 * nn) * (sqrt(n) / sq) / n) * 1000000)
            AS BIGINT) AS rate_ppm
        FROM counts, tot)
      SELECT d.source, count(*) AS n_docs,
        count(CASE WHEN d.bucket < r.rate_ppm THEN 1 END) AS kept_docs,
        first(r.rate_ppm) AS rate_ppm
      FROM (SELECT source,
              (((doc_id % 2147483648) * (2654435761 % 4294967296))
                % 4294967296) % 1000000 AS bucket
            FROM documents) d
      JOIN rates r USING (source)
      GROUP BY d.source ORDER BY d.source"""))

  /** Sharded JSONL training-data EXPORT, verified through the round
    * trip (oracle-checked): the corpus is routed to
    * ceil(total_chars / 16384) hash-addressed shards, written as one
    * JSONL directory per shard (the hand-off format tokenizer/training
    * jobs consume), read BACK from disk, and summarized per shard —
    * so the oracle row verifies the real files, not the plan: a shard
    * the writer dropped or duplicated hash-fails against DuckDB's
    * from-source expectation. Shard routing is the same masked
    * arithmetic as the split family (replayable); shard COUNT derives
    * from corpus size, so the export auto-scales toward a fixed
    * shard-size target instead of a fixed shard count. */
  val q111ShardExport = GraftQuery(
    "q111_shard_export", { (s, dir) =>
      val out = graft.ops.Export.shardedJsonl(docs(s, dir), "doc_id",
        "text", Seq("doc_id", "text", "source"), targetChars = 16384L)
      graft.ops.Export.readShardedJsonl(s, out,
          "doc_id LONG, text STRING, source STRING, shard INT")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("docs"),
          sum(length(col("text"))).as("chars"))
        .orderBy(col("shard"))
        .localCheckpoint(eager = true)
    },
    Some("""WITH k AS (
        SELECT greatest(1, CAST(ceil(sum(len(text)) / 16384.0) AS BIGINT))
          AS k FROM documents)
      SELECT CAST((((doc_id % 2147483648) * (2654435761 % 4294967296))
          % 4294967296) % k AS INT) AS shard,
        count(*) AS docs, CAST(sum(len(text)) AS BIGINT) AS chars
      FROM documents, k
      GROUP BY shard ORDER BY shard"""))

  /** Provenance audit: every document gets a REASON CODE from the first
    * curation gate it fails (length → repetition → quality, the order a
    * production pipeline applies them) plus a count of ALL gates it
    * fails — the "why was my document dropped" lineage record that a
    * 100 TB curation run must emit to be debuggable. One narrow
    * projection computes every signal per row (no shuffle until the
    * final reason-sized groupBy); the per-source share comes from a
    * window over the already-aggregated frame (|sources|×|reasons|
    * rows, negligible). The oracle replays all three gates and the
    * first-fail precedence in SQL — composition of q26b's quality
    * derivation and q60's repetition CTEs, so the AUDIT semantics
    * (precedence, thresholds, token accounting) are what's verified. */
  val q113ProvenanceAudit = GraftQuery(
    "q113_provenance_audit", { (s, dir) =>
      val scored = docs(s, dir).select(
        col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"),
        TextAnalysis.topBigramFraction(col("text")).as("topfrac"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      val reasoned = scored
        .withColumn("reason",
          when(col("ntok") < 10, "1_too_short")
            .when(col("topfrac") > 0.1, "2_repetitive")
            .when(col("q") < 0.88, "3_low_quality")
            .otherwise("4_kept"))
        .withColumn("gates_failed",
          (col("ntok") < 10).cast("int") + (col("topfrac") > 0.1).cast("int") +
            (col("q") < 0.88).cast("int"))
        // q is round(·,6), so q·10⁶ is an exact integer: summing micros
        // keeps the aggregate in ℤ (no FP accumulation-order noise) and
        // both engines then round the IDENTICAL quotient double — an
        // avg(double) here hash-flipped on a .xxxx5 tie at sf0.01
        .withColumn("q_micro", round(col("q") * 1000000).cast("long"))
      val bySrc = Window.partitionBy(col("source"))
      reasoned
        .groupBy(col("source"), col("reason"))
        .agg(
          count(lit(1)).as("docs"),
          sum(col("ntok")).as("tokens"),
          sum(col("q_micro")).as("qm"),
          round(avg(col("gates_failed").cast("double")), 4).as("avg_gates_failed"))
        .withColumn("avg_quality",
          round(col("qm") / (col("docs") * 1000000.0), 4))
        .drop("qm")
        .withColumn("pct_of_source",
          round(col("docs") * 100.0 / sum(col("docs")).over(bySrc), 2))
        .orderBy(col("source"), col("reason"))
    },
    Some(s"""WITH scored AS (${TextVectorQueries.qualityScoredDocsSql}),
      t AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
        FROM documents),
      d AS (SELECT doc_id, len(toks) AS ntok,
          CASE WHEN len(toks) >= 2 THEN
            list_transform(generate_series(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1])
          ELSE CAST([] AS VARCHAR[]) END AS bgs
        FROM t),
      b AS (SELECT doc_id, max(c) AS top FROM (
          SELECT doc_id, bg, count(*) AS c
          FROM (SELECT doc_id, unnest(bgs) AS bg FROM d) u
          GROUP BY doc_id, bg) g
        GROUP BY doc_id),
      m AS (SELECT s.source, d.ntok,
          coalesce(b.top, 0) * 1.0 / greatest(len(d.bgs), 1) AS topfrac, s.q
        FROM scored s JOIN d USING (doc_id) LEFT JOIN b USING (doc_id)),
      r AS (SELECT source, ntok, q,
          CASE WHEN ntok < 10 THEN '1_too_short'
               WHEN topfrac > 0.1 THEN '2_repetitive'
               WHEN q < 0.88 THEN '3_low_quality'
               ELSE '4_kept' END AS reason,
          (CASE WHEN ntok < 10 THEN 1 ELSE 0 END) +
          (CASE WHEN topfrac > 0.1 THEN 1 ELSE 0 END) +
          (CASE WHEN q < 0.88 THEN 1 ELSE 0 END) AS gates_failed
        FROM m),
      g AS (SELECT source, reason, count(*) AS docs,
          CAST(sum(ntok) AS BIGINT) AS tokens,
          CAST(sum(CAST(round(q * 1000000) AS BIGINT)) AS BIGINT) AS qm,
          round(avg(gates_failed * 1.0), 4) AS avg_gates_failed
        FROM r GROUP BY source, reason)
      SELECT source, reason, docs, tokens,
        round(qm / (docs * 1000000.0), 4) AS avg_quality, avg_gates_failed,
        round(docs * 100.0 / sum(docs) OVER (PARTITION BY source), 2)
          AS pct_of_source
      FROM g ORDER BY source, reason"""))

  /** Exact k-per-stratum sampling in deterministic hash order — the
    * exact-quota companion to q107's cluster-balanced sampler. Rather
    * than a full per-stratum sort (one reducer per stratum at corpus
    * scale), a TWO-PHASE plan: a tiny per-stratum count aggregate
    * broadcast back sets a hash-threshold prefilter sized at 4× the
    * quota (expected survivors ≈ 4k per stratum, so the ranking window
    * runs over O(k) rows however large the stratum), then an exact
    * row_number over (hash, id) takes the quota. The algorithm is
    * deterministic end to end, so the oracle replays BOTH phases and
    * hash-matches the exact sample membership; StratifiedSampleSpec
    * asserts the two-phase plan selects the identical sample as the
    * naive single-window form.
    *
    * Under-coverage guard: the 4× margin makes prefilter survivors < k
    * astronomically unlikely, but not impossible on an adversarial id
    * set — and because the prefilter thresholds the very ORDERING key
    * (hkey), a silent under-fill would be invisible (the plan still
    * returns rows, just fewer than quota). A tiny per-stratum survivor
    * count therefore rides along with the count aggregate, and any
    * stratum whose survivors fall below min(k, |stratum|) disables its
    * prefilter (predicate `hkey < thr OR NOT ok`), degrading that one
    * stratum to the naive full-stratum window instead of under-filling.
    * Since excluded rows all order AFTER every survivor, the output is
    * ALWAYS identical to the naive sampler — covered strata keep the
    * O(k) window. Cost: one extra narrow aggregate pass over (lang,
    * hkey), map-side combinable. */
  val q116StratifiedSample = GraftQuery(
    "q116_stratified_sample", { (s, dir) =>
      val k = 40
      val h = docs(s, dir).select(col("lang"), col("doc_id"),
        hashBucketN(col("doc_id"), 2246822519L, lit(1000000L)).as("hkey"))
      val n = h.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
        .withColumn("thr",
          ceil(lit(k) * 4 * 1000000.0 / col("nl")).cast("long"))
      val sv = h.join(broadcast(n), Seq("lang"))
        .filter(col("hkey") < col("thr"))
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val cov = n.join(sv, Seq("lang"), "left_outer")
        .withColumn("ok",
          coalesce(col("cnt"), lit(0L)) >= least(lit(k.toLong), col("nl")))
        .select(col("lang"), col("thr"), col("ok"))
      val cand = h.join(broadcast(cov), Seq("lang"))
        .filter(col("hkey") < col("thr") || !col("ok"))
      val w = Window.partitionBy(col("lang")).orderBy(col("hkey"), col("doc_id"))
      cand
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },
    Some("""WITH h AS (
        SELECT lang, doc_id,
          (((doc_id % 2147483648) * (2246822519 % 4294967296))
            % 4294967296) % 1000000 AS hkey
        FROM documents),
      n AS (SELECT lang, count(*) AS nl,
          CAST(ceil(40 * 4 * 1000000.0 / count(*)) AS BIGINT) AS thr
        FROM h GROUP BY lang),
      sv AS (SELECT h.lang, count(*) AS cnt
        FROM h JOIN n USING (lang) WHERE h.hkey < n.thr GROUP BY h.lang),
      cov AS (SELECT n.lang, n.thr,
          coalesce(sv.cnt, 0) >= least(40, n.nl) AS ok
        FROM n LEFT JOIN sv USING (lang)),
      c AS (SELECT h.lang, h.doc_id, h.hkey
        FROM h JOIN cov USING (lang)
        WHERE h.hkey < cov.thr OR NOT cov.ok),
      r AS (SELECT lang, doc_id, hkey,
          row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rk
        FROM c)
      SELECT lang, rk, doc_id FROM r WHERE rk <= 40 ORDER BY lang, rk"""))

  /** End-to-end composition of the round-12 operator wave (the q62
    * pattern scaled up): perplexity terciles (q108) → trained NB
    * quality gate (q112) → temperature mixing over the survivors
    * (q110) → curriculum epoch keep (q121) → sharded export manifest
    * (q111), as ONE query whose DuckDB oracle replays the ENTIRE
    * composition — proving the operators compose, not just pass alone.
    * The epoch-3 slice goes through the REAL file sink (write + read
    * back), so its manifest rows verify bytes on disk against the
    * from-source expectation; epochs 1–2 are in-plan manifests of the
    * identical routing arithmetic.
    *
    * Scale shape, stage by stage: perplexity = two vocabulary-bounded
    * groupBys; the exact per-language ntile is the oracle anchor (the
    * 100 TB path swaps in q108b's broadcast thresholds, schedule
    * unchanged); NB gate = two vocabulary-keyed shuffles + a semi-join;
    * mixing = source-sized aggregates broadcast back; curriculum +
    * shard routing = narrow hash projections; manifest = one
    * epoch×shard-sized aggregate. No corpus-scale sort or collect
    * anywhere outside the documented tercile anchor. */
  val q122CurationPipeline = GraftQuery(
    "q122_curation_pipeline", { (s, dir) =>
      import graft.ops.Classifier
      val d = docs(s, dir)
      // stage 1 — q108: per-language perplexity terciles (exact rule)
      val ppl = TextAnalysis.bigramPerplexity(d, "text", "doc_id", 0.5)
      val w = Window.partitionBy(col("lang"))
        .orderBy(round(col("ppl"), 6), col("doc_id"))
      val bucketed = d
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
        .join(ppl, col("doc_id") === col("id"))
        .withColumn("bucket", ntile(3).over(w))
        .select(col("doc_id"), col("source"), col("text"), col("bucket"))
      // stage 2 — q112: NB gate trained on the corpus's own weak labels
      val labeled = d.withColumn("y",
        TextAnalysis.qualityScore(col("text")) >= 0.88)
      val highIds = Classifier.nbScores(labeled, "doc_id", "text", "y")
        .filter(col("score") > 0).select(col("doc_id"))
      val gated = bucketed.join(highIds, Seq("doc_id"), "left_semi")
      // stage 3 — q110: temperature mixing (α=0.5, half budget) with
      // weights derived from the GATED survivor counts
      val counts = gated.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val mtot = counts.agg(sum(col("n")).cast("double").as("nn"),
        sum(sqrt(col("n"))).as("sq"))
      val rates = counts.crossJoin(broadcast(mtot))
        .select(col("source"),
          round(least(lit(1.0),
            (lit(0.5) * col("nn")) * (sqrt(col("n")) / col("sq")) / col("n"))
            * 1000000).cast("long").as("rate_ppm"))
      val mixed = gated.join(broadcast(rates), Seq("source"))
        .filter(hashBucketN(col("doc_id"), 2654435761L, lit(1000000L))
          < col("rate_ppm"))
        .select(col("doc_id"), col("source"), col("text"), col("bucket"))
      // stage 4 — q121: curriculum epoch keep over the mixed survivors
      val epochs = s.range(1, 4).select(col("id").cast("int").as("epoch"))
      val kept = mixed.crossJoin(broadcast(epochs))
        .withColumn("keep_pct",
          when(col("bucket") === 1, lit(100))
            .when(col("bucket") === 2,
              element_at(array(lit(50), lit(80), lit(100)), col("epoch")))
            .otherwise(
              element_at(array(lit(20), lit(50), lit(100)), col("epoch"))))
        .filter(((pmod(col("doc_id"), lit(2147483648L)) *
          ((lit(2654435761L) * col("epoch")) % 4294967296L)) % 4294967296L)
          % 100 < col("keep_pct"))
      // stage 5 — q111: sharded manifest; epoch 3 through REAL files.
      // `kept` feeds THREE consumers (per-epoch totals, the in-plan
      // manifests, and the epoch-3 file write) — without a snapshot the
      // whole upstream (perplexity model + NB fit + mixing) re-executes
      // per consumer. localCheckpoint materializes the epoch-tagged
      // survivors once (bounded: ≤ 3× the mixed survivor count); a
      // cluster deployment would persist this boundary to storage.
      val keptSnap = kept
        .select(col("doc_id"), col("source"), col("text"), col("epoch"))
        .localCheckpoint(eager = true)
      val planEpochs = keptSnap.filter(col("epoch") =!= 3)
      val ks = planEpochs.groupBy(col("epoch"))
        .agg(greatest(lit(1L),
          ceil(sum(length(col("text"))) / 16384.0).cast("long")).as("k"))
      val inPlan = planEpochs.join(broadcast(ks), Seq("epoch"))
        .withColumn("shard",
          hashBucketN(col("doc_id"), 2654435761L, col("k")).cast("int"))
        .groupBy(col("epoch"), col("shard"))
        .agg(count(lit(1)).as("docs"), sum(length(col("text"))).as("chars"))
      val e3 = keptSnap.filter(col("epoch") === 3)
        .select(col("doc_id"), col("text"), col("source"))
      val out = graft.ops.Export.shardedJsonl(e3, "doc_id", "text",
        Seq("doc_id", "text", "source"), targetChars = 16384L)
      val e3Manifest = graft.ops.Export.readShardedJsonl(s, out,
          "doc_id LONG, text STRING, source STRING, shard INT")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("docs"), sum(length(col("text"))).as("chars"))
        .withColumn("epoch", lit(3))
      inPlan.select(col("epoch"), col("shard"), col("docs"), col("chars"))
        .unionByName(e3Manifest
          .select(col("epoch"), col("shard"), col("docs"), col("chars")))
        .orderBy(col("epoch"), col("shard"))
        .localCheckpoint(eager = true)
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, lang,
          list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS t
        FROM documents),
      bg AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS bg, t[i] AS w1
        FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2),
      bgd AS (SELECT doc_id, bg, w1, count(*) AS n
              FROM bg GROUP BY doc_id, bg, w1),
      cb AS (SELECT bg, sum(n) AS cb FROM bgd GROUP BY bg),
      c1 AS (SELECT w1, sum(n) AS c1 FROM bgd GROUP BY w1),
      v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vsz
            FROM (SELECT unnest(t) AS tok FROM toks)),
      pplsc AS (
        SELECT b.doc_id,
          exp(-(sum(n * ln((cb.cb + 0.5) / (c1.c1 + 0.5 * v.vsz))) / sum(n))) AS ppl
        FROM bgd b JOIN cb USING (bg) JOIN c1 USING (w1) CROSS JOIN v
        GROUP BY b.doc_id),
      bucketed AS (
        SELECT d.doc_id, d.source, d.text,
          ntile(3) OVER (PARTITION BY d.lang
            ORDER BY round(s.ppl, 6), s.doc_id) AS bucket
        FROM pplsc s JOIN documents d USING (doc_id)),
      qsc AS (${TextVectorQueries.qualityScoredDocsSql}),
      lab AS (SELECT doc_id, text, (q >= 0.88) AS y FROM qsc),
      tok AS (SELECT doc_id, y,
          unnest(list_filter(string_split_regex(lower(text), '\\s+'),
            x -> len(x) > 0)) AS token
        FROM lab),
      tc AS (SELECT token,
          count(CASE WHEN y THEN 1 END) AS hi,
          count(CASE WHEN NOT y THEN 1 END) AS lo
        FROM tok GROUP BY token),
      nbtot AS (SELECT sum(hi) AS tot_hi, sum(lo) AS tot_lo, count(*) AS vv
        FROM tc),
      wt AS (SELECT token,
          ln((hi + 1.0) / (tot_hi + vv)) - ln((lo + 1.0) / (tot_lo + vv)) AS w
        FROM tc, nbtot),
      pri AS (SELECT
          ln((count(CASE WHEN y THEN 1 END) + 1.0) / (count(*) + 2.0)) -
          ln((count(CASE WHEN NOT y THEN 1 END) + 1.0) / (count(*) + 2.0))
            AS bias
        FROM lab),
      dt AS (SELECT doc_id, token, count(*) AS c
        FROM tok GROUP BY doc_id, token),
      ds AS (SELECT doc_id, sum(c * w) AS s
        FROM dt JOIN wt USING (token) GROUP BY doc_id),
      nbsc AS (SELECT l.doc_id, coalesce(ds.s, 0) + pri.bias AS score
        FROM lab l LEFT JOIN ds ON l.doc_id = ds.doc_id, pri),
      gated AS (
        SELECT b.doc_id, b.source, b.text, b.bucket
        FROM bucketed b JOIN nbsc USING (doc_id) WHERE nbsc.score > 0),
      mcounts AS (SELECT source, count(*) AS n FROM gated GROUP BY source),
      mtot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, sum(sqrt(n)) AS sq
        FROM mcounts),
      rates AS (
        SELECT source,
          CAST(round(least(1.0, (0.5 * nn) * (sqrt(n) / sq) / n) * 1000000)
            AS BIGINT) AS rate_ppm
        FROM mcounts, mtot),
      mixed AS (
        SELECT g.doc_id, g.text, g.bucket
        FROM gated g JOIN rates r USING (source)
        WHERE (((g.doc_id % 2147483648) * (2654435761 % 4294967296))
          % 4294967296) % 1000000 < r.rate_ppm),
      kept AS (
        SELECT m.doc_id, m.text, e.epoch
        FROM mixed m, (SELECT unnest([1, 2, 3]) AS epoch) e
        WHERE (((m.doc_id % 2147483648) * ((2654435761 * e.epoch) % 4294967296))
            % 4294967296) % 100 <
          CASE WHEN m.bucket = 1 THEN 100
               WHEN m.bucket = 2 THEN ([50, 80, 100])[e.epoch]
               ELSE ([20, 50, 100])[e.epoch] END),
      ks AS (
        SELECT epoch,
          greatest(1, CAST(ceil(sum(len(text)) / 16384.0) AS BIGINT)) AS k
        FROM kept GROUP BY epoch)
      SELECT kept.epoch,
        CAST((((doc_id % 2147483648) * (2654435761 % 4294967296))
          % 4294967296) % k AS INT) AS shard,
        count(*) AS docs, CAST(sum(len(text)) AS BIGINT) AS chars
      FROM kept JOIN ks USING (epoch)
      GROUP BY kept.epoch, shard ORDER BY epoch, shard"""))

  /** Length-bucketed batching (oracle-checked): fixed-size batches of
    * 32 documents drawn in token-length order vs in corpus (doc_id)
    * order, with the padding waste each policy pays — every batch pads
    * to its longest member, so length-sorted batching is the standard
    * trick that cuts padded-token waste in training and inference.
    * The row quantifies the win per language: waste_sorted ≪
    * waste_corpus on any length-diverse corpus.
    *
    * Scale note: both batch assignments here are exact rank windows
    * per language — the oracle anchor, same posture as q108's tercile
    * anchor. The 100 TB path buckets by LENGTH RANGE (a narrow
    * projection, q108b-style broadcast thresholds) and batches within
    * buckets; the waste accounting is unchanged. */
  val q128LengthBucketedBatching = GraftQuery(
    "q128_length_bucketed_batching", { (s, dir) =>
      val b = 32
      val d = docs(s, dir).select(col("lang"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
      val wSorted = Window.partitionBy(col("lang"))
        .orderBy(col("ntok"), col("doc_id"))
      val wCorpus = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val assigned = d
        .withColumn("batch_sorted",
          floor((row_number().over(wSorted) - 1) / b).cast("long"))
        .withColumn("batch_corpus",
          floor((row_number().over(wCorpus) - 1) / b).cast("long"))
      val sortedWaste = assigned.groupBy(col("lang"), col("batch_sorted"))
        .agg((max(col("ntok")) * count(lit(1)) - sum(col("ntok")))
          .as("waste"))
        .groupBy(col("lang")).agg(sum(col("waste")).as("waste_sorted"))
      val corpusWaste = assigned.groupBy(col("lang"), col("batch_corpus"))
        .agg((max(col("ntok")) * count(lit(1)) - sum(col("ntok")))
          .as("waste"))
        .groupBy(col("lang")).agg(sum(col("waste")).as("waste_corpus"))
      val totals = d.groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"), sum(col("ntok")).as("tokens"))
      totals.join(sortedWaste, Seq("lang")).join(corpusWaste, Seq("lang"))
        .withColumn("waste_ratio_pct", round(
          col("waste_sorted") * 100.0 /
            greatest(col("waste_corpus"), lit(1L)), 2))
        .orderBy(col("lang"))
    },
    Some("""WITH d AS (
        SELECT lang, doc_id,
          CAST(len(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS BIGINT) AS ntok
        FROM documents),
      a AS (
        SELECT lang, ntok,
          CAST(floor((row_number() OVER (PARTITION BY lang
            ORDER BY ntok, doc_id) - 1) / 32) AS BIGINT) AS batch_sorted,
          CAST(floor((row_number() OVER (PARTITION BY lang
            ORDER BY doc_id) - 1) / 32) AS BIGINT) AS batch_corpus
        FROM d),
      ws AS (SELECT lang, CAST(sum(w) AS BIGINT) AS waste_sorted FROM (
          SELECT lang, max(ntok) * count(*) - sum(ntok) AS w
          FROM a GROUP BY lang, batch_sorted) t GROUP BY lang),
      wc AS (SELECT lang, CAST(sum(w) AS BIGINT) AS waste_corpus FROM (
          SELECT lang, max(ntok) * count(*) - sum(ntok) AS w
          FROM a GROUP BY lang, batch_corpus) t GROUP BY lang),
      tot AS (SELECT lang, count(*) AS docs, CAST(sum(ntok) AS BIGINT)
          AS tokens FROM d GROUP BY lang)
      SELECT t.lang, t.docs, t.tokens, ws.waste_sorted, wc.waste_corpus,
        round(ws.waste_sorted * 100.0 / greatest(wc.waste_corpus, 1), 2)
          AS waste_ratio_pct
      FROM tot t JOIN ws USING (lang) JOIN wc USING (lang)
      ORDER BY lang"""))

  /** Token-budget mixture plan ([[graft.ops.Mixture.tokenBudgetPlan]],
    * oracle-EXACT): per source, the target token share of a 1M-token
    * budget under deterministic integer weights, the epoch factor over
    * what is available (> 1e6 micros = the source must repeat), and
    * the capped per-epoch keep rate — the arithmetic between curation
    * and the data loader. Weights are integers by design (the
    * q55/q56 replayable-arithmetic discipline), so every derived
    * number is an exact 64-bit floor division both engines replay. */
  val q159TokenBudgetMixture = GraftQuery(
    "q159_token_budget_mixture", { (s, dir) =>
      val avail = docs(s, dir)
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")))
          .as("available_tokens"))
      val weights = avail.select(col("source"),
        (length(col("source")) % 5 + 1).cast("long").as("weight"))
      graft.ops.Mixture.tokenBudgetPlan(avail, weights,
          budgetTokens = 1000000L)
        .orderBy(col("source"))
    },
    Some("""WITH avail AS (
        SELECT source,
          CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0))) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source),
      w AS (SELECT source, available_tokens,
          CAST(len(source) % 5 + 1 AS BIGINT) AS weight FROM avail),
      tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM w),
      plan AS (SELECT source, available_tokens, weight,
          (1000000 * weight) // wsum AS target_tokens
        FROM w, tot)
      SELECT source, available_tokens, weight, target_tokens,
        CASE WHEN available_tokens > 0
          THEN (target_tokens * 1000000) // available_tokens END
          AS epochs_micro,
        CASE WHEN available_tokens > 0
          THEN least(1000000, (target_tokens * 1000000) // available_tokens)
          END AS rate_micro
      FROM plan ORDER BY source"""))

  /** TEMPERATURE mixture at T = 2 ([[graft.ops.Mixture
    * .temperatureMixturePlan]], oracle-EXACT): per-source sampling
    * shares ∝ √(available tokens) — the mT5-style exponential
    * smoothing that up-weights small sources without hand-set weights.
    * T = 2 is the implemented curve point because sqrt is IEEE-exact
    * in both engines (a general pow() is libm-dependent and would
    * flake the hash gate); each source takes ONE shared sqrt quantized
    * to MILLIS (micros would overflow the share numerator at frontier
    * corpus sizes), the normalizer is a sum of LONGS, and every
    * share/target/epoch/rate is a 64-bit floor division DuckDB
    * replays bit-for-bit. */
  val q166TemperatureMixture = GraftQuery(
    "q166_temperature_mixture", { (s, dir) =>
      val avail = docs(s, dir)
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")))
          .as("available_tokens"))
      graft.ops.Mixture.temperatureMixturePlan(avail,
          budgetTokens = 2500000L)
        .orderBy(col("source"))
    },
    Some("""WITH avail AS (
        SELECT source,
          CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0))) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source),
      sc AS (SELECT source, available_tokens,
          CASE WHEN available_tokens > 0
            THEN CAST(round(sqrt(CAST(available_tokens AS DOUBLE)) * 1e3)
              AS BIGINT)
            ELSE 0 END AS sqrt_milli
        FROM avail),
      tot AS (SELECT CAST(sum(sqrt_milli) AS BIGINT) AS den FROM sc),
      plan AS (SELECT source, available_tokens, sqrt_milli,
          (sqrt_milli * 1000000) // den AS share_micro
        FROM sc, tot),
      tgt AS (SELECT *,
          (2500000 * share_micro) // 1000000 AS target_tokens FROM plan)
      SELECT source, available_tokens, sqrt_milli, share_micro,
        target_tokens,
        CASE WHEN available_tokens > 0
          THEN (target_tokens * 1000000) // available_tokens END
          AS epochs_micro,
        CASE WHEN available_tokens > 0
          THEN least(1000000, (target_tokens * 1000000) // available_tokens)
          END AS rate_micro
      FROM tgt ORDER BY source"""))

  /** Preference-pair mining ([[graft.ops.Preference.minePairs]],
    * oracle-EXACT): within each (source:lang) group, the
    * highest-token-density document pairs as `chosen` against the
    * lowest as `rejected` when the margin clears 1000 micros — the
    * DPO/RLHF dataset-construction step, with the near-tie filter that
    * keeps label noise out. Scores quantize once to integer micros;
    * best/worst are max_by/min_by picks under struct TOTAL orders
    * (one hash aggregate — no window, no join), so DuckDB's
    * row_number oracle replays the exact same pairs, margins
    * included. */
  val q160PreferencePairs = GraftQuery(
    "q160_preference_pairs", { (s, dir) =>
      val scored = docs(s, dir)
        .filter(col("n_chars") > 0)
        .select(concat_ws(":", col("source"), col("lang")).as("g"),
          col("doc_id"),
          (TextAnalysis.tokenCount(col("text")).cast("double") /
            col("n_chars")).as("density"))
      graft.ops.Preference.minePairs(scored, "g", "doc_id",
          col("density"), minMarginMicro = 1000L)
        .orderBy(col("grp"))
    },
    Some("""WITH scored AS (
        SELECT source || ':' || lang AS grp, doc_id,
          CAST(round((CAST(len(list_filter(string_split_regex(text, '\s+'),
            x -> len(x) > 0)) AS DOUBLE) / n_chars) * 1e6) AS BIGINT) AS m
        FROM documents WHERE n_chars > 0),
      best AS (SELECT grp, doc_id AS chosen_id, m AS chosen_micro,
          row_number() OVER (PARTITION BY grp ORDER BY m DESC, doc_id)
            AS rn FROM scored),
      worst AS (SELECT grp, doc_id AS rejected_id, m AS rejected_micro,
          row_number() OVER (PARTITION BY grp ORDER BY m ASC, doc_id)
            AS rn FROM scored)
      SELECT b.grp, chosen_id, rejected_id, chosen_micro, rejected_micro,
        chosen_micro - rejected_micro AS margin_micro
      FROM best b JOIN worst w ON b.grp = w.grp AND b.rn = 1 AND w.rn = 1
      WHERE chosen_id <> rejected_id
        AND chosen_micro - rejected_micro >= 1000
      ORDER BY b.grp"""))

  /** End-to-end composition of the round-16 curation operators (the
    * q122 pattern — compositions are where cross-operator bugs hide):
    * the token-budget mixture plan (q159) computes per-source keep
    * RATES that actually GATE a corpus pass (ppm hash decision, the
    * q56 posture — the corpus itself never shuffles), NB quality
    * scores are trained on the gated SURVIVORS' own weak labels via
    * the integer-micros twin ([[graft.ops.Classifier.nbScoresMicro]] —
    * the q107c discipline that lets a hash oracle expose per-doc
    * scores: exact integer sums, no cross-partition double
    * accumulation), and preference pairs (q160) mine per source group
    * from those scores. ONE DuckDB statement replays the entire chain
    * — plan arithmetic, gate, NB fit, pair mining, margins included.
    *
    * Scale shape, stage by stage: the plan is a source-sized broadcast
    * relation; the gate is a narrow ppm hash filter; the NB fit is two
    * vocabulary-keyed shuffles over survivors only; the mining is one
    * hash aggregate on the group key. */
  val q162MixturePreferencePipeline = GraftQuery(
    "q162_mixture_preference_pipeline", { (s, dir) =>
      val d = docs(s, dir)
      // stage 1 — q159: token-budget plan over the corpus's sources
      val avail = d.groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")))
          .as("available_tokens"))
      val weights = avail.select(col("source"),
        (length(col("source")) % 5 + 1).cast("long").as("weight"))
      val plan = graft.ops.Mixture.tokenBudgetPlan(avail, weights,
          budgetTokens = 1000000L)
        .select(col("source"), col("rate_micro"))
      // stage 2 — the plan's keep rates gate the corpus pass
      val gated = d.join(broadcast(plan), Seq("source"))
        .filter(hashBucketN(col("doc_id"), 2654435761L, lit(1000000L))
          < col("rate_micro"))
        .select(col("source"), col("doc_id"), col("text"))
      // stage 3 — NB scored on the survivors' own weak labels (micros)
      val labeled = gated.withColumn("y",
        TextAnalysis.qualityScore(col("text")) >= 0.88)
      val scored = graft.ops.Classifier.nbScoresMicro(
        labeled, "doc_id", "text", "y")
      // stage 4 — q160: preference pairs per source group
      graft.ops.Preference.minePairs(
          scored.select(col("source"), col("doc_id"), col("score_micro")),
          "source", "doc_id",
          col("score_micro").cast("double") / 1e6,
          minMarginMicro = 1000L)
        .orderBy(col("grp"))
    },
    Some(s"""WITH avail AS (
        SELECT source,
          CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
            x -> len(x) > 0))) AS BIGINT) AS available_tokens
        FROM documents GROUP BY source),
      pw AS (SELECT source, available_tokens,
          CAST(len(source) % 5 + 1 AS BIGINT) AS weight FROM avail),
      ptot AS (SELECT CAST(sum(weight) AS BIGINT) AS wsum FROM pw),
      plan AS (SELECT source,
          CASE WHEN available_tokens > 0
            THEN least(1000000,
              ((((1000000 * weight) // wsum) * 1000000)
                // available_tokens))
            END AS rate_micro
        FROM pw, ptot),
      gated AS (
        SELECT d.doc_id, d.source, d.text
        FROM documents d JOIN plan p USING (source)
        WHERE (((d.doc_id % 2147483648) * (2654435761 % 4294967296))
          % 4294967296) % 1000000 < p.rate_micro),
      qsc AS (${TextVectorQueries.qualityScoredDocsSql}),
      lab AS (SELECT g.doc_id, g.source, g.text, (qs.q >= 0.88) AS y
        FROM gated g JOIN qsc qs USING (doc_id)),
      tok AS (SELECT doc_id, y,
          unnest(list_filter(string_split_regex(lower(text), '\\s+'),
            x -> len(x) > 0)) AS token
        FROM lab),
      tc AS (SELECT token,
          count(CASE WHEN y THEN 1 END) AS hi,
          count(CASE WHEN NOT y THEN 1 END) AS lo
        FROM tok GROUP BY token),
      nbtot AS (SELECT sum(hi) AS tot_hi, sum(lo) AS tot_lo,
          count(*) AS vv FROM tc),
      wt AS (SELECT token,
          CAST(round((ln((hi + 1.0) / (tot_hi + vv)) -
            ln((lo + 1.0) / (tot_lo + vv))) * 1000000) AS BIGINT) AS wm
        FROM tc, nbtot),
      pri AS (SELECT CAST(round((
          ln((count(CASE WHEN y THEN 1 END) + 1.0) / (count(*) + 2.0)) -
          ln((count(CASE WHEN NOT y THEN 1 END) + 1.0) / (count(*) + 2.0)))
            * 1000000) AS BIGINT) AS bias_m
        FROM lab),
      dt AS (SELECT doc_id, token, count(*) AS c
        FROM tok GROUP BY doc_id, token),
      ds AS (SELECT doc_id, CAST(sum(c * wm) AS BIGINT) AS s
        FROM dt JOIN wt USING (token) GROUP BY doc_id),
      nbsc AS (SELECT l.source, l.doc_id,
          coalesce(ds.s, 0) + pri.bias_m AS sm
        FROM lab l LEFT JOIN ds ON l.doc_id = ds.doc_id, pri),
      scored AS (SELECT source AS grp, doc_id,
          CAST(round((CAST(sm AS DOUBLE) / 1e6) * 1e6) AS BIGINT) AS m
        FROM nbsc),
      best AS (SELECT grp, doc_id AS chosen_id, m AS chosen_micro,
          row_number() OVER (PARTITION BY grp ORDER BY m DESC, doc_id)
            AS rn FROM scored),
      worst AS (SELECT grp, doc_id AS rejected_id, m AS rejected_micro,
          row_number() OVER (PARTITION BY grp ORDER BY m ASC, doc_id)
            AS rn FROM scored)
      SELECT b.grp, chosen_id, rejected_id, chosen_micro, rejected_micro,
        chosen_micro - rejected_micro AS margin_micro
      FROM best b JOIN worst w2 ON b.grp = w2.grp AND b.rn = 1 AND w2.rn = 1
      WHERE chosen_id <> rejected_id
        AND chosen_micro - rejected_micro >= 1000
      ORDER BY b.grp"""))

  val all: Seq[GraftQuery] = Seq(
    q159TokenBudgetMixture, q166TemperatureMixture, q160PreferencePairs,
    q162MixturePreferencePipeline,
    q55HashSplit, q56SourceMixing, q57SequencePacking, q58Posexplode,
    q60RepetitionFilters, q61PiiRedaction, q142GopherRules,
    q143C4LineClean, q62CurationPipeline,
    q70IncrementalDedup, q90ChunkingStride, q91BloomScreen,
    q93Decontaminate, q94EpochShuffle, q99ContaminationScore,
    q110TemperatureMixing, q111ShardExport, q113ProvenanceAudit,
    q116StratifiedSample, q122CurationPipeline,
    q128LengthBucketedBatching, q157ContaminationSweep)
}
