package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained document-quality classification — the LEARNED complement to
  * the heuristic score (TextAnalysis.qualityScore): a multinomial Naive
  * Bayes over document tokens, the closed-form reduction of the
  * fastText-style quality filter CCNet/GPT-3-era pipelines train on weak
  * labels (Wenzek et al., CCNet, 2020; Brown et al., 2020 §A).
  *
  * Training is PURE COUNTING — two vocabulary-keyed shuffles (per-token
  * class counts; per-doc distinct-token weights join) and two one-row
  * aggregates broadcast back. No iterative optimizer, no driver-side
  * state: the fitted model IS a (token → log-likelihood-ratio) relation
  * sized by vocabulary, not corpus, so the identical plan trains at
  * 100 TB and the model relation broadcasts or shuffle-joins for
  * scoring. Deterministic arithmetic end to end — which is what lets
  * q112 carry an exact DuckDB oracle re-deriving the entire fit.
  *
  * Smoothing matches MLlib's NaiveBayes(smoothing = 1.0) exactly —
  * P(t|c) = (count(t,c)+1)/(tokens(c)+V), prior (n_c+1)/(n+2) — so the
  * MLlib CountVectorizer→NaiveBayes pipeline over the same corpus is a
  * bit-for-bit independent twin (q112b pins sign-equality of every
  * prediction outside an FP-epsilon band of the decision boundary).
  */
object Classifier {

  private def toks(df: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(labelCol).as("y"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))

  /** The model's SUFFICIENT STATISTICS as a relation: per-token class
    * counts (token, hi, lo). Integer counts are mergeable —
    * [[mergeTokenCounts]] of per-batch relations equals the from-scratch
    * fit, which is how the classifier refreshes per ingest batch at
    * O(batch) cost (q112c pins the equality bit-for-bit). */
  def nbTokenClassCounts(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame =
    toks(docs, idCol, textCol, labelCol).groupBy(col("token")).agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("hi"),
      sum(when(not(col("y")), 1L).otherwise(0L)).as("lo"))

  def mergeTokenCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy(col("token"))
      .agg(sum(col("hi")).as("hi"), sum(col("lo")).as("lo"))

  /** (token, w) log-likelihood-ratio weights from the count relation —
    * totals and vocabulary size derive from the counts themselves, so
    * identical counts yield bit-identical weights however they were
    * accumulated. */
  def nbWeightsFromCounts(tokenCounts: DataFrame): DataFrame = {
    val tot = tokenCounts.agg(sum(col("hi")).as("tot_hi"),
      sum(col("lo")).as("tot_lo"), count(lit(1)).as("v"))
    tokenCounts.crossJoin(broadcast(tot)).select(col("token"),
      (log((col("hi") + 1.0) / (col("tot_hi") + col("v"))) -
        log((col("lo") + 1.0) / (col("tot_lo") + col("v")))).as("w"))
  }

  /** Fit + score in one plan: every input row comes back with a `score`
    * column (log-odds of the positive class; predict positive ⇔ > 0).
    * `labelCol` must be boolean — the weak label the model self-trains
    * on. All other input columns pass through. */
  def nbScores(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val t = toks(docs, idCol, textCol, labelCol)
    val w = nbWeightsFromCounts(
      nbTokenClassCounts(docs, idCol, textCol, labelCol))
    val bias = docs.agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_hi"),
        sum(when(not(col(labelCol)), 1L).otherwise(0L)).as("n_lo"),
        count(lit(1)).as("n"))
      .select((log((col("n_hi") + 1.0) / (col("n") + 2.0)) -
        log((col("n_lo") + 1.0) / (col("n") + 2.0))).as("bias"))
    // one row per (doc, DISTINCT token) with a multiplicity weight — the
    // scoring join is vocabulary-dense, not token-stream-dense
    val dt = t.groupBy(col("id"), col("token")).agg(count(lit(1)).as("c"))
    val sums = dt.join(w, Seq("token"))
      .groupBy(col("id")).agg(sum(col("c") * col("w")).as("s"))
    docs
      .join(sums.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .crossJoin(broadcast(bias))
      .withColumn("score", coalesce(col("s"), lit(0.0)) + col("bias"))
      .drop("s", "bias")
  }

  /** The independent MLlib twin: CountVectorizer (full vocabulary) →
    * NaiveBayes(multinomial, smoothing 1.0) — mathematically the same
    * model as [[nbScores]], fitted by a different codebase. Returns
    * (idCol, prediction: 1.0 = positive). CountVectorizer.fit collects
    * the vocabulary to the driver, so this path is fixture/cross-check
    * scale; the aggregate fit above is the 100 TB path. */
  def nbMllibPredictions(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.ml.feature.CountVectorizer
    import org.apache.spark.ml.classification.NaiveBayes
    val prepared = docs.select(col(idCol),
      col(labelCol).cast("double").as("label"),
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
    val cvm = new CountVectorizer().setInputCol("toks")
      .setOutputCol("features").setVocabSize(1 << 20).setMinDF(1.0)
      .fit(prepared)
    val model = new NaiveBayes().setSmoothing(1.0)
      .setModelType("multinomial").fit(cvm.transform(prepared))
    model.transform(cvm.transform(prepared))
      .select(col(idCol), col("prediction"))
  }
}
