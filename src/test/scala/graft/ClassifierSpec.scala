package graft

import org.apache.spark.sql.functions._

import graft.ops.Classifier
import graft.queries.ClassifierQueries

/** Hand-computed and cross-implementation contracts for the closed-form
  * Naive Bayes quality classifier. */
class ClassifierSpec extends SparkTestBase {

  import spark.implicits._

  test("nbScores matches the hand-computed closed form on a 2-doc corpus") {
    // tokens: good(hi=2,lo=0), bad(hi=0,lo=1); tot_hi=2, tot_lo=1, V=2
    // w(good) = ln(3/4) - ln(1/3) = ln(2.25); w(bad) = ln(1/4) - ln(2/3)
    // bias = ln(2/4) - ln(2/4) = 0
    // score(d1) = 2·ln(2.25); score(d2) = ln(0.375)
    val docs = Seq((1L, "good good", true), (2L, "bad", false))
      .toDF("doc_id", "text", "y")
    val s = Classifier.nbScores(docs, "doc_id", "text", "y")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(math.abs(s(1L) - 2 * math.log(2.25)) < 1e-12, s"d1: ${s(1L)}")
    assert(math.abs(s(2L) - math.log(0.375)) < 1e-12, s"d2: ${s(2L)}")
  }

  test("empty documents score exactly the prior bias") {
    val docs = Seq((1L, "alpha beta", true), (2L, "", false), (3L, "gamma", false))
      .toDF("doc_id", "text", "y")
    // bias = ln((1+1)/(3+2)) - ln((2+1)/(3+2)) = ln(2/5) - ln(3/5)
    val expected = math.log(2.0 / 5.0) - math.log(3.0 / 5.0)
    val s = Classifier.nbScores(docs, "doc_id", "text", "y")
      .filter(col("doc_id") === 2L).head().getAs[Double]("score")
    assert(math.abs(s - expected) < 1e-12)
  }

  test("aggregate fit and MLlib NaiveBayes agree on every prediction off the boundary (q112b contract, fixture corpus)") {
    assert(ClassifierQueries.q112bNbMllibContract.run(spark, sfDir).isEmpty)
  }

  test("self-trained classifier substantially agrees with its weak labels") {
    val rep = ClassifierQueries.q112NbQualityClassifier.run(spark, sfDir)
      .agg(sum("agree").as("a"), sum("docs").as("d")).head()
    val acc = rep.getLong(0).toDouble / rep.getLong(1)
    assert(acc >= 0.75, s"train-set agreement $acc below floor")
  }
}
