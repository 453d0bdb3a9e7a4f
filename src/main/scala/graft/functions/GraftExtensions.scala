package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** SparkSessionExtensions entry point: registers the custom sketch
  * expressions as SQL functions, so `spark.sql` users get them too —
  * activate with `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`).
  *
  *   SELECT minhash_signature(shingle_hashes(token_hashes, 3), 32)
  *
  * Sizing arguments (numHashes, k) must be integer literals — they fix
  * the generated code shape, exactly like a window frame spec. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_signature(hashes, numHashes)")
        MinHashSignatureExpr(children.head,
          intLit(children(1), "minhash_signature", "numHashes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash64(tokenHashes)")
        SimHash64Expr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hashes(tokenHashes, k)")
        ShingleHashesExpr(children.head,
          intLit(children(1), "shingle_hashes", "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_strings"),
      info("gram_strings"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "gram_strings(tokens, k)")
        GramStringsExpr(children.head,
          intLit(children(1), "gram_strings", "k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("gopher_stats"),
      info("gopher_stats"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "gopher_stats(text)")
        GopherStatsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "winnow_fingerprints(tokenHashes, k, w)")
        WinnowFingerprintsExpr(children.head,
          intLit(children(1), "winnow_fingerprints", "k"),
          intLit(children(2), "winnow_fingerprints", "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("all_sign_bits"),
      info("all_sign_bits"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "all_sign_bits(vec, planes, tables)")
        SignBitsExpr(children.head,
          intLit(children(1), "all_sign_bits", "planes"),
          intLit(children(2), "all_sign_bits", "tables"))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product(a, b)")
        VectorKernelExpr(children.head, children(1), cosine = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity(a, b)")
        VectorKernelExpr(children.head, children(1), cosine = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "jaro_winkler(a, b)")
        JaroWinklerExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_cosine_index"),
      info("nearest_cosine_index"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "nearest_cosine_index(vec, candidates)")
        NearestIndexExpr(children.head, children(1), cosine = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_l2_index"),
      info("nearest_l2_index"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "nearest_l2_index(vec, candidates)")
        NearestIndexExpr(children.head, children(1), cosine = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("top_cosine_indices"),
      info("top_cosine_indices"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "top_cosine_indices(vec, candidates, p)")
        TopCosineIndicesExpr(children.head, children(1),
          intLit(children(2), "top_cosine_indices", "p"))
      }))
  }
}
