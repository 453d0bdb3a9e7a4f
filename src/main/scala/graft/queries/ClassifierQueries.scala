package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftQuery, Tables}
import graft.ops.{Classifier, TextAnalysis}

/** Learned quality classification (ops/Classifier): the corpus
  * self-trains a multinomial Naive Bayes on its own heuristic weak
  * labels and scores every document — the trained-filter stage of a
  * CCNet-style curation pipeline. q112's oracle re-derives the ENTIRE
  * fit (weak labels, class-conditional token counts, smoothed
  * log-likelihood ratios, per-doc scores) in DuckDB; q112b pins
  * sign-equality against MLlib's independently-coded NaiveBayes. */
object ClassifierQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def weakLabeled(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("y",
      TextAnalysis.qualityScore(col("text")) >= 0.88)

  /** Per-source classifier report: prediction counts, agreement with the
    * weak labels it trained on, mean signed margin (score oriented
    * toward the label, so positive = separating). Fully oracle-checked:
    * DuckDB refits the same closed-form model from the raw corpus.
    * avg_margin accumulates in exact integer micros (per-doc margin →
    * round(·*1e6) as long, summed exactly, divided once) — the q113
    * pattern — so the average is one identical-operand IEEE division in
    * both engines instead of an order-dependent double accumulation
    * that could land on a .0005 rounding tie. */
  val q112NbQualityClassifier = GraftQuery(
    "q112_nb_quality_classifier",
    (s, dir) =>
      Classifier.nbScores(weakLabeled(s, dir), "doc_id", "text", "y")
        .withColumn("margin_micro",
          round(when(col("y"), col("score")).otherwise(-col("score"))
            * lit(1e6)).cast("long"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("docs"),
          count(when(col("score") > 0, 1)).as("pred_high"),
          count(when(col("y"), 1)).as("weak_high"),
          count(when((col("score") > 0) === col("y"), 1)).as("agree"),
          round(sum(col("margin_micro")) / (count(lit(1)) * lit(1e6)), 3)
            .as("avg_margin"))
        .orderBy(col("source")),
    Some(s"""WITH scored AS (${TextVectorQueries.qualityScoredDocsSql}),
      lab AS (SELECT doc_id, source, text, (q >= 0.88) AS y FROM scored),
      tok AS (SELECT doc_id, y,
          unnest(list_filter(string_split_regex(lower(text), '\\s+'),
            x -> len(x) > 0)) AS token
        FROM lab),
      tc AS (SELECT token,
          count(CASE WHEN y THEN 1 END) AS hi,
          count(CASE WHEN NOT y THEN 1 END) AS lo
        FROM tok GROUP BY token),
      tot AS (SELECT sum(hi) AS tot_hi, sum(lo) AS tot_lo, count(*) AS v
        FROM tc),
      w AS (SELECT token,
          ln((hi + 1.0) / (tot_hi + v)) - ln((lo + 1.0) / (tot_lo + v)) AS w
        FROM tc, tot),
      pri AS (SELECT
          ln((count(CASE WHEN y THEN 1 END) + 1.0) / (count(*) + 2.0)) -
          ln((count(CASE WHEN NOT y THEN 1 END) + 1.0) / (count(*) + 2.0))
            AS bias
        FROM lab),
      dt AS (SELECT doc_id, token, count(*) AS c
        FROM tok GROUP BY doc_id, token),
      ds AS (SELECT doc_id, sum(c * w) AS s
        FROM dt JOIN w USING (token) GROUP BY doc_id),
      sc AS (SELECT l.doc_id, l.source, l.y,
          coalesce(ds.s, 0) + pri.bias AS score
        FROM lab l LEFT JOIN ds ON l.doc_id = ds.doc_id, pri)
      SELECT source, count(*) AS docs,
        count(CASE WHEN score > 0 THEN 1 END) AS pred_high,
        count(CASE WHEN y THEN 1 END) AS weak_high,
        count(CASE WHEN (score > 0) = y THEN 1 END) AS agree,
        round(sum(CAST(round((CASE WHEN y THEN score ELSE -score END) * 1e6)
            AS BIGINT)) / (count(*) * 1e6), 3) AS avg_margin
      FROM sc GROUP BY source ORDER BY source"""))

  /** Contract row (q101d pattern, hash-checked vs the empty relation):
    * the aggregate-fit score and MLlib's NaiveBayes must agree on the
    * CLASS of every document whose score clears an FP-epsilon band of
    * the decision boundary — same smoothing, same priors, independent
    * implementations, so any surviving row is a real model divergence,
    * not float noise. */
  val q112bNbMllibContract = GraftQuery(
    "q112b_nb_mllib_contract", { (s, dir) =>
      val labeled = weakLabeled(s, dir)
      val scores = Classifier.nbScores(labeled, "doc_id", "text", "y")
        .select(col("doc_id"), col("score"))
      val ml = Classifier.nbMllibPredictions(labeled, "doc_id", "text", "y")
      scores.join(ml, Seq("doc_id"))
        .filter(((col("score") > 0) =!= (col("prediction") === 1.0)) &&
          abs(col("score")) > 1e-9)
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          col("prediction"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT CAST(NULL AS BIGINT) AS doc_id,
      CAST(NULL AS DOUBLE) AS score,
      CAST(NULL AS DOUBLE) AS prediction WHERE 1 = 0"""))

  /** Incremental-refresh contract (q101d pattern): the classifier's
    * sufficient statistics are integer counts, so
    * merge(fit(standing), fit(batch)) must yield BIT-IDENTICAL
    * token weights to a from-scratch fit over the full corpus — the
    * property that lets a 100 TB pipeline refresh its quality filter
    * per ingest batch at O(batch) cost. Any float inequality at all is
    * a violation (identical integers through an identical formula). */
  val q112cNbIncrementalContract = GraftQuery(
    "q112c_nb_incremental_contract", { (s, dir) =>
      val labeled = weakLabeled(s, dir)
      val standing = labeled.filter(col("doc_id") % 10 =!= 7)
      val batch = labeled.filter(col("doc_id") % 10 === 7)
      val merged = Classifier.nbWeightsFromCounts(Classifier.mergeTokenCounts(
        Classifier.nbTokenClassCounts(standing, "doc_id", "text", "y"),
        Classifier.nbTokenClassCounts(batch, "doc_id", "text", "y")))
      val full = Classifier.nbWeightsFromCounts(
        Classifier.nbTokenClassCounts(labeled, "doc_id", "text", "y"))
      merged.toDF("token", "w_merged")
        .join(full.toDF("token", "w_full"), Seq("token"), "full_outer")
        .filter(col("w_merged").isNull || col("w_full").isNull ||
          col("w_merged") =!= col("w_full"))
        .select(col("token"), col("w_merged"), col("w_full"))
        .orderBy(col("token"))
    },
    Some("""SELECT CAST(NULL AS VARCHAR) AS token,
      CAST(NULL AS DOUBLE) AS w_merged,
      CAST(NULL AS DOUBLE) AS w_full WHERE 1 = 0"""))

  /** Score-calibration audit for the trained quality classifier
    * (oracle-exact): NB scores squash through the logistic into
    * pseudo-probabilities, quantize to integer micros, and bucket into
    * deciles by INTEGER division (so the bucket boundary is a
    * deterministic integer comparison in both engines — no float
    * bucketing ties); per decile the row reports count, mean predicted
    * probability (exact micro sum, one division) and the empirical
    * weak-label positive rate. A well-calibrated filter shows
    * mean_p ≈ frac_pos per bucket — the reliability diagram an ML-ops
    * pipeline monitors before trusting classifier-thresholded
    * curation. The DuckDB oracle refits the ENTIRE model from the raw
    * corpus (the q112 replay) and re-derives the calibration table, so
    * a defect anywhere in fit, scoring, squash, quantization, or
    * bucketing hash-fails. Cross-engine exposure: libm exp at 1 ulp
    * landing within 1 ulp of a .5 micro boundary — the q135 ln() risk
    * class, negligible and documented. Scale shape: scoring is q112's
    * vocabulary-keyed shuffles; the calibration itself is one
    * 10-bucket aggregate. */
  val q138NbCalibration = GraftQuery(
    "q138_nb_calibration", { (s, dir) =>
      Classifier.nbScores(weakLabeled(s, dir), "doc_id", "text", "y")
        .withColumn("p_micro",
          round(lit(1.0) / (lit(1.0) + exp(-col("score"))) * lit(1e6))
            .cast("long"))
        .withColumn("bucket",
          least(expr("p_micro div 100000"), lit(9L)).cast("int"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("docs"),
          count(when(col("y"), 1)).as("weak_pos"),
          round(sum(col("p_micro")).cast("double")
            / (count(lit(1)) * lit(1e6)), 6).as("mean_p"),
          round(count(when(col("y"), 1)).cast("double") / count(lit(1)), 6)
            .as("frac_pos"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH scored AS (${TextVectorQueries.qualityScoredDocsSql}),
      lab AS (SELECT doc_id, source, text, (q >= 0.88) AS y FROM scored),
      tok AS (SELECT doc_id, y,
          unnest(list_filter(string_split_regex(lower(text), '\\s+'),
            x -> len(x) > 0)) AS token
        FROM lab),
      tc AS (SELECT token,
          count(CASE WHEN y THEN 1 END) AS hi,
          count(CASE WHEN NOT y THEN 1 END) AS lo
        FROM tok GROUP BY token),
      tot AS (SELECT sum(hi) AS tot_hi, sum(lo) AS tot_lo, count(*) AS v
        FROM tc),
      w AS (SELECT token,
          ln((hi + 1.0) / (tot_hi + v)) - ln((lo + 1.0) / (tot_lo + v)) AS w
        FROM tc, tot),
      pri AS (SELECT
          ln((count(CASE WHEN y THEN 1 END) + 1.0) / (count(*) + 2.0)) -
          ln((count(CASE WHEN NOT y THEN 1 END) + 1.0) / (count(*) + 2.0))
            AS bias
        FROM lab),
      dt AS (SELECT doc_id, token, count(*) AS c
        FROM tok GROUP BY doc_id, token),
      ds AS (SELECT doc_id, sum(c * w) AS s
        FROM dt JOIN w USING (token) GROUP BY doc_id),
      sc AS (SELECT l.doc_id, l.y,
          coalesce(ds.s, 0) + pri.bias AS score
        FROM lab l LEFT JOIN ds ON l.doc_id = ds.doc_id, pri),
      pm AS (SELECT y,
          CAST(round((1.0 / (1.0 + exp(-score))) * 1e6) AS BIGINT)
            AS p_micro
        FROM sc),
      bk AS (SELECT y, p_micro,
          CAST(least(p_micro // 100000, 9) AS INT) AS bucket FROM pm)
      SELECT bucket, count(*) AS docs,
        count(CASE WHEN y THEN 1 END) AS weak_pos,
        round(CAST(sum(p_micro) AS DOUBLE) / (count(*) * 1e6), 6) AS mean_p,
        round(CAST(count(CASE WHEN y THEN 1 END) AS DOUBLE) / count(*), 6)
          AS frac_pos
      FROM bk GROUP BY bucket ORDER BY bucket"""))

  val all: Seq[GraftQuery] = Seq(q112NbQualityClassifier,
    q112bNbMllibContract, q112cNbIncrementalContract, q138NbCalibration)
}
