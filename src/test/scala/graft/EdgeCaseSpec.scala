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
}
