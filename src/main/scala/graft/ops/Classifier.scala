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

  /** INTEGER-MICROS twin of [[nbScores]] (the q107c/q147 oracle
    * discipline): each token's log-likelihood-ratio weight and the
    * class prior quantize ONCE to integer micros — one ln + one round
    * per vocabulary entry / per corpus — and every per-doc score is
    * then an EXACT integer sum, immune to the summation-order
    * nondeterminism a cross-partition DOUBLE sum carries (the reason
    * nbScores itself must not feed a hash oracle). Any engine replays
    * score_micro bit-for-bit; sign agreement with nbScores holds
    * outside a sub-micro band of the decision boundary. Same plan
    * shape: two vocabulary-keyed shuffles, model relation sized by
    * vocabulary. All input columns pass through plus `score_micro`. */
  def nbScoresMicro(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val t = toks(docs, idCol, textCol, labelCol)
    val w = nbWeightsFromCounts(
        nbTokenClassCounts(docs, idCol, textCol, labelCol))
      .select(col("token"),
        round(col("w") * 1e6).cast("long").as("wm"))
    val bias = docs.agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_hi"),
        sum(when(not(col(labelCol)), 1L).otherwise(0L)).as("n_lo"),
        count(lit(1)).as("n"))
      .select(round((log((col("n_hi") + 1.0) / (col("n") + 2.0)) -
          log((col("n_lo") + 1.0) / (col("n") + 2.0))) * 1e6)
        .cast("long").as("bias_micro"))
    val dt = t.groupBy(col("id"), col("token")).agg(count(lit(1)).as("c"))
    val sums = dt.join(w, Seq("token"))
      .groupBy(col("id")).agg(sum(col("c") * col("wm")).as("s"))
    docs
      .join(sums.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .crossJoin(broadcast(bias))
      .withColumn("score_micro",
        coalesce(col("s"), lit(0L)) + col("bias_micro"))
      .drop("s", "bias_micro")
  }

  /** Character k-grams (every position, multiplicity kept) of a BOUND
    * lowered-text attribute — pass a materialized column, not an
    * embedded expression tree (HOF lambdas evaluate interpreted; the
    * bigramsOf lesson). Docs shorter than k chars → empty array. */
  private def charGrams(lt: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(1), greatest(length(lt) - (k - 1), lit(0))),
      i => lt.substr(i, lit(k)))

  /** TRAINED multiclass language ID — a char-n-gram multinomial Naive
    * Bayes, the closed-form counting fit of the fastText/CLD-style
    * classifier every production curation pipeline runs where the
    * marker-ratio heuristic ([[TextAnalysis.langId]], q28) is only a
    * screen. Same architecture as the binary quality NB above: the
    * fitted model IS a (gram, label, weight) relation sized by
    * vocabulary × labels, trained in two vocabulary-keyed shuffles —
    * no iterative optimizer, no driver state, the identical plan at
    * 100 TB.
    *
    * Exactness discipline (the q113/q135 integer-micros pattern):
    * every smoothed log weight quantizes to integer MICROS at the
    * (gram, label) grain — one ln + one round per weight — and scores
    * accumulate as exact integer sums, so the argmax compares exact
    * integers in both engines and the only cross-engine exposure is a
    * ≤1-ulp libm ln landing within 1 ulp of a .5 micro boundary (the
    * documented q135 class). Ties break label-ascending,
    * deterministically.
    *
    * Returns `(weights, labelInfo)`:
    *  - weights: (g, lab, w_micro) DENSE over vocabulary × labels
    *    (zero counts carry their smoothed floor explicitly);
    *  - labelInfo: (lab, p_micro, w0_micro) — the doc-count prior
    *    ln((n_l+1)/(n+L)) and the unseen-gram floor ln(1/(tot_l+V)),
    *    both in micros. */
  def nbCharGramFit(train: DataFrame, textCol: String, labelCol: String,
      k: Int = 3): (DataFrame, DataFrame) = {
    val base = train.select(col(labelCol).as("lab"),
      lower(col(textCol)).as("lt"))
    val grams = base.select(col("lab"),
      explode(charGrams(col("lt"), k)).as("g"))
    val counts = grams.groupBy(col("g"), col("lab"))
      .agg(count(lit(1)).as("cnt"))
    val labels = base.groupBy(col("lab")).agg(count(lit(1)).as("n_l"))
    val totPerLab = counts.groupBy(col("lab"))
      .agg(sum(col("cnt")).as("tot_l"))
    val vocab = counts.select(col("g")).distinct()
    val v = vocab.agg(count(lit(1)).as("v"))
    // dense vocabulary × labels: a zero class count is still a real
    // (smoothed) weight, and densifying at fit time keeps scoring a
    // plain equi-join — V × L rows, vocabulary-bounded, never corpus
    val weights = vocab
      .crossJoin(totPerLab)
      .join(counts, Seq("g", "lab"), "left")
      .crossJoin(broadcast(v))
      .select(col("g"), col("lab"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1.0)
          / (col("tot_l") + col("v"))) * 1e6).cast("long").as("w_micro"))
    val n = base.agg(count(lit(1)).as("n"))
    val l = labels.agg(count(lit(1)).as("l"))
    val labelInfo = labels.join(totPerLab, Seq("lab"), "left")
      .crossJoin(broadcast(n)).crossJoin(broadcast(l))
      .crossJoin(broadcast(v))
      .select(col("lab"),
        round(log((col("n_l") + 1.0) / (col("n") + col("l"))) * 1e6)
          .cast("long").as("p_micro"),
        round(log(lit(1.0) / (coalesce(col("tot_l"), lit(0L)) + col("v")))
          * 1e6).cast("long").as("w0_micro"))
    (weights, labelInfo)
  }

  /** Score `docs` against a [[nbCharGramFit]] model and keep the argmax
    * label per document: (idCol, pred, best_micro). Grams unseen at fit
    * time contribute each label's smoothed floor `w0_micro` (the m − mc
    * term), so held-out text scores by the same formula the fit implies
    * — for self-trained corpora the term is exactly zero. Docs with no
    * grams (shorter than k) fall back to the prior argmax. */
  def nbCharGramPredict(weights: DataFrame, labelInfo: DataFrame,
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).as("id"), lower(col(textCol)).as("lt"))
    val dt = base.select(col("id"), explode(charGrams(col("lt"), k)).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
    val m = dt.groupBy(col("id")).agg(sum(col("c")).as("m"))
    val matched = dt.join(weights, Seq("g"))
      .groupBy(col("id"), col("lab"))
      .agg(sum(col("c") * col("w_micro")).as("ms"), sum(col("c")).as("mc"))
    val scored = base.select(col("id"))
      .crossJoin(labelInfo)
      .join(m, Seq("id"), "left")
      .join(matched, Seq("id", "lab"), "left")
      .select(col("id"), col("lab"),
        (col("p_micro") + coalesce(col("ms"), lit(0L)) +
          (coalesce(col("m"), lit(0L)) - coalesce(col("mc"), lit(0L)))
            * col("w0_micro")).as("score_micro"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    scored
      .withColumn("rk", row_number().over(
        byDoc.orderBy(col("score_micro").desc, col("lab"))))
      .filter(col("rk") === 1)
      .select(col("id").as(idCol), col("lab").as("pred"),
        col("score_micro").as("best_micro"))
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
