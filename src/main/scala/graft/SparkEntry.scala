package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.GraftQuery
import graft.queries.{ClassifierQueries, CurationQueries, EventsQueries, PharmaQueries, Relational, StreamingQueries, TextVectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry layout:
  *  - Relational: the reference's operator surface (SURVEY.md §2) on the
  *    TPC-H-ish star schema, every query DuckDB-oracle-checked
  *  - EventsQueries: JSON extraction, time windows, sessionization
  *  - TextVectorQueries: dedup / similarity / text analysis (north star)
  *  - StreamingQueries: Structured Streaming + multimodal plumbing
  *  - PharmaQueries: the reference pipeline end-to-end on the embedded
  *    fixture feed, DuckDB-oracle-checked via the self-contained raw-feed
  *    dump (plus golden tests in PharmaSpec/PharmaMlSpec)
  */
object SparkEntry {

  val registry: Seq[GraftQuery] =
    Relational.all ++ EventsQueries.all ++ TextVectorQueries.all ++
      CurationQueries.all ++ ClassifierQueries.all ++ StreamingQueries.all ++
      PharmaQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.queryMap(registry)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = GraftQuery.oracleMap(registry)

  /** Headline benchmark set: one representative per operator family,
    * weighted toward the scale-sensitive plans (joins, windows, dedup,
    * ANN). Bench times these on sf0.1. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_count_distinct", "q04_percentile",
    "q09_scalar_subquery", "q10_topk", "q12_fact_join", "q13_outer_join",
    "q16_window_running", "q22_tumbling_window", "q23_sessionize",
    "q85_sliding_window",
    "q25_text_stats", "q27_token_topk", "q30_minhash_neardup",
    "q31_simhash_neardup", "q33_ann_brute", "q33b_ann_brute_partial",
    "q35_ann_ivf", "q35b_ann_pq", "q36b_embed_neardup_lsh", "q41_asof_join",
    "q51_dedup_clusters", "q93_decontaminate",
    // round-15: the q51 scale trio — the winnowed-edge path (duplicate-
    // mass constant cut; codegen deque selection) and the LSH star-
    // linked path (strictly linear edge work) timed beside their exact
    // parent, so both scale stories are tracked per round (BASELINE.md
    // r15 probes)
    "q51c_dedup_clusters_winnowed", "q51e_dedup_clusters_lsh",
    // round-10 additions: substring-level span dedup (hash-count +
    // islands window), blocked semantic dedup (cell-scoped pair work),
    // and the CDC → incremental-aggregate refresh loop through real
    // versioned storage
    "q104_duplicated_spans", "q101b_semantic_dedup_blocked",
    "q103_incremental_agg",
    // round-11: blocked semantic dedup served from the persisted
    // centroid index (build-once/serve-many; the timed min is the
    // per-query serving cost, since only the first pass trains), and
    // the blocked INCREMENTAL path (a crawl batch vetted against the
    // standing corpus's representatives without a corpus rescan)
    "q101c_semantic_dedup_index", "q101f_semantic_dedup_incr_blocked",
    // round-11: hybrid retrieval (TF-IDF keyword leg + exact cosine
    // leg + RRF fusion) — the timed representative of the retrieval
    // family; the served-ANN twin q105c is correctness-gated instead
    // (its PQ build would dominate the timing, the q35b/q35d rationale)
    "q105_hybrid_rrf",
    // round-12: bigram-LM perplexity bucketing, timed via the
    // threshold scale path (no per-language global sort — the exact
    // ntile twin q108 is the oracle anchor, not the timed row)
    "q108b_perplexity_thresholds",
    // round-12: blocked kNN graph — the all-to-all ANN shape, timed
    // via the cell-scoped scale path (exact O(n²) twin q109 is the
    // oracle anchor, not the timed row)
    "q109b_knn_graph_blocked",
    // round-12: the JSONL shard-export sink — the only headline row
    // whose cost is dominated by real file I/O + read-back, which is
    // exactly why it is timed (a sink regression is invisible to
    // plan-only rows)
    "q111_shard_export",
    // round-12 second wave: the trained NB quality classifier (two
    // vocabulary-keyed shuffles — fit + score in one plan), the
    // provenance audit (the heaviest pure narrow-projection row:
    // every gate signal per row, no shuffle until the reason-sized
    // agg), and label propagation over the BLOCKED kNN graph (the
    // iterative join/agg rounds on top of q109b's edge build)
    "q112_nb_quality_classifier", "q113_provenance_audit",
    "q114b_label_propagation_blocked",
    // round-13: the winnowed span-dedup scale path (only MOSS-selected
    // fingerprints shuffle — timed beside q104 so the sparse/exact
    // cost ratio is visible per round), and the end-to-end curation
    // composition (terciles → NB gate → mixing → curriculum → sharded
    // export with a real file round-trip) — the closest thing the
    // suite has to a full-pipeline wall-time
    "q104b_duplicated_spans_winnowed", "q122_curation_pipeline",
    // round-14: the two heaviest telemetry rows — embedding-cluster
    // coherence (the full (label, dim) explode + per-vector exact
    // integer dot products; the densest pure-arithmetic shuffle in the
    // suite) and the n-gram diversity scan (three gram passes over the
    // corpus — times the HOF gram builder the dedup family leans on)
    "q136_embedding_coherence", "q134_ngram_diversity",
    // round-16: the graph family's timed representative — the triangle
    // census over the memoized winnowed edge relation. Pass 1 builds
    // the shared edges (that cost is already controlled by the
    // q51/q51c bands); the min-of-3 is the CENSUS itself (orient +
    // wedge join + close), which no other row exercises — a wedge-join
    // regression now shows per round instead of only in Wave probes
    "q151d_triangle_census_winnowed",
    // round-18: HyperBall neighborhood function — the graph family's
    // iterative SKETCH plan (per-round edge join + HLL register-union
    // aggregate), a shape no other timed row exercises; the exact BFS
    // twin q167 is the oracle anchor, not the timed row
    "q167b_neighborhood_hyperball",
    // round-19: HyperBall over the representative-COLLAPSED graph —
    // the q167b iteration composed with the q151b collapse; times the
    // quotient-graph ball rounds (effective diameter / avg distance
    // telemetry over genuinely-distinct survivors)
    "q167d_hyperball_collapsed",
    // round-17: the second end-to-end composition (mixture plan → ppm
    // gate → NB fit on survivors → preference mining) — the q122
    // sibling; times the vocabulary-keyed NB shuffle pair plus the
    // single-exchange max_by/min_by mining that replaced the rank
    // windows
    "q162_mixture_preference_pipeline",
    // the one two-source join in the pharma family (meds ⋈ labs via the
    // managed catalog) — cheap, but it keeps the S8 ingestion edge and
    // the catalog round-trip inside the per-round timing surface
    "pharma_q15_lab_directory")
}
