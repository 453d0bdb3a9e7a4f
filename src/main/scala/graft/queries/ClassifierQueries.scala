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

  val all: Seq[GraftQuery] = Seq(q112NbQualityClassifier,
    q112bNbMllibContract, q112cNbIncrementalContract)
}
