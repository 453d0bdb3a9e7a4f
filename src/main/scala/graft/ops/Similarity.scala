package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, sign-LSH bucketing and
  * an IVF-style coarse index as the scale paths (north-star surface,
  * SURVEY.md §7.1).
  *
  * All vector math is `functions` higher-order ops (zip_with/aggregate)
  * over double-cast elements — codegen'd, deterministic, and bit-identical
  * to a sequential dot product, which keeps the DuckDB oracle exact.
  */
object Similarity {

  /** Cosine similarity of two float/double array columns, accumulated in
    * double in element order. Backed by the fused codegen kernel
    * (graft.functions.VectorKernelExpr) — the three-fold HOF formulation
    * runs interpreted with a materialized zip array per pair, and this is
    * the scoring/verify hot loop of every ANN path; values are
    * bit-identical (asserted in SimilaritySpec). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.SketchExpressions.cosineSimilarity(
      transform(a, x => x.cast("double")), transform(b, x => x.cast("double")))

  def dotProduct(a: Column, b: Column): Column =
    graft.functions.SketchExpressions.dotProduct(
      transform(a, _.cast("double")), transform(b, _.cast("double")))

  /** The interpreted HOF twin of [[cosine]], kept as the bit-identity
    * reference for SimilaritySpec. */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact brute-force cosine top-k: broadcast the (small) query set
    * against the corpus, score every pair, keep k per query.
    *
    * Scale shape: the corpus scan is embarrassingly parallel; the only
    * shuffle is the per-query ranking. The window ranking here shuffles
    * |corpus|×|queries| score rows on query_id; [[bruteForceTopKPartial]]
    * is the same contract with the shuffle bounded to
    * k×partitions×queries rows via per-partition heaps.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Exact top-k with a BOUNDED ranking shuffle: each partition keeps only
    * its k best (cosine, neighbor) per query in a bounded heap, so the
    * exchange carries ≤ k×partitions rows per query instead of the full
    * |corpus|×|queries| score relation — the shape that survives a 100×
    * corpus. Same results as [[bruteForceTopK]] (asserted in
    * SimilaritySpec); ties resolve identically via the (cosine desc,
    * neighbor_id asc) order. */
  def bruteForceTopKPartial(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        cosine(col("qv"), col("cv")).as("cos"))
      .toDF("query_id", "neighbor_id", "cos")
    // per-partition bounded heaps: worst (lowest cosine, then HIGHEST
    // neighbor id) on top so the kept set matches the global order's
    // tie-break exactly
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cos", org.apache.spark.sql.types.DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val candidates = scored.mapPartitions { rows =>
      val heapOrd = Ordering.by[(Long, Long, Double), (Double, Long)] {
        case (_, nId, cos) => (-cos, nId)
      } // max-heap head = worst kept entry
      val heaps = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.PriorityQueue[(Long, Long, Double)]]
      rows.foreach { r =>
        val entry = (r.getLong(0), r.getLong(1), r.getDouble(2))
        val h = heaps.getOrElseUpdate(entry._1,
          scala.collection.mutable.PriorityQueue.empty[(Long, Long, Double)](heapOrd))
        if (h.size < k) h.enqueue(entry)
        else if (heapOrd.lt(entry, h.head)) { h.dequeue(); h.enqueue(entry) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
        .map { case (qId, nId, cos) => org.apache.spark.sql.Row(qId, nId, cos) }
    }(enc)
    // global merge over ≤ k×partitions rows per query
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane weight for global plane index
    * `p`, dimension index `i`, in [-1, 1): seeded from xxhash64 so every
    * executor materializes identical planes with zero driver state. */
  private def planeWeight(p: Column, i: Column): Column =
    pmod(xxhash64(p, i), lit(2000)).cast("double") / 1000.0 - 1.0

  /** Sign-LSH signature: `planes` random-hyperplane sign bits packed into
    * a long. Nearby vectors (cosine) collide with high probability. */
  def signBits(v: Column, planes: Int): Column =
    signBitsTable(v, planes, lit(0))

  /** Sign-LSH signature for hash table `table` (a column, so one explode
    * can fan a row out over L independent tables): plane indices are
    * offset by table·planes, giving every table its own hyperplane set.
    * Multi-table LSH is the standard recall amplifier — candidate recall
    * is 1-(1-p^planes)^tables instead of p^planes. */
  def signBitsTable(v: Column, planes: Int, table: Column): Column = {
    val vd = transform(v, x => x.cast("double"))
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vd, transform(vd, (_, i) => planeWeight(table * planes + p, i)),
          (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table LSH approximate top-k: score only corpus vectors sharing
    * a sign signature with the query in at least one of `tables`
    * independent hyperplane tables. Candidates dedup id-only (a neighbor
    * found in several tables scores once), then vectors re-join for the
    * exact cosine — the bucket join and the pair dedup never carry vector
    * payloads. Bucket join is an equi-join on (table, signature) — a
    * uniform hash shuffle at any scale; recall vs bruteForceTopK is
    * asserted in SimilaritySpec at floor 0.85 with THESE defaults
    * (measured r8 grid: 0.90 at the 500-vector fixture, 0.88 at the
    * 2000-vector fixture — RecallProbe in the test sourceset reproduces
    * the grid).
    *
    * Parameter posture: recall ≈ 1-(1-p^planes)^tables, candidate mass
    * ≈ n·tables/2^planes per query pre-dedup. planes=3 was rejected
    * (ADVICE r7): mass ≈ 2n means the "approximate" path scores MORE
    * pairs than brute force — recall 1.0 bought by a near-exhaustive
    * scan. planes=4/tables=16 is the smallest grid point holding ≥0.85
    * on both fixtures at mass ≈ 1n. `planes` should grow ~log2(n) to
    * hold the candidate fraction constant as the corpus grows; `tables`
    * buys recall back linearly in cost. A 100 TB corpus wants
    * planes≈16–20, tables 8–32. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, planes: Int = 4, tables: Int = 16): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
    def sigs(df: DataFrame, idAlias: String, vec: String) = df
      .select(col(idAlias), posexplode(
        graft.functions.SketchExpressions.allSignBits(
          transform(col(vec), x => x.cast("double")), planes, tables)))
      .select(col("pos").as("t"), col("col").as("sig"), col(idAlias))
    val candidates = sigs(c, "neighbor_id", "cv")
      .join(broadcast(sigs(q, "query_id", "qv")), Seq("t", "sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates(Seq("query_id", "neighbor_id"))
    val scored = candidates
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** IVF-style coarse quantizer: pick every `stride`-th corpus vector as a
    * centroid (deterministic), assign corpus vectors to their nearest
    * centroid, probe `nprobe` centroids per query. The inverted lists are
    * the partition layout at scale: repartition by centroid id and each
    * probe touches nprobe/|centroids| of the data. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, stride: Long = 50, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val centroids =
      c.filter(pmod(col("neighbor_id"), lit(stride)) === 0)
        .select(col("neighbor_id").as("centroid_id"), col("cv").as("centv"))
    ivfTopKWithCentroids(corpus, queries, corpusId, corpusVec,
      queryId, queryVec, centroids, k, nprobe)
  }

  /** [[ivfTopK]] with the centroid count FIXED instead of the stride:
    * stride = n/cells, so the index keeps ~`cells` inverted lists as the
    * corpus grows and recall@nprobe stays comparable across scales
    * (a fixed stride means cells ∝ n — at 4× the corpus the same nprobe
    * probes 1/4 the fraction and recall collapses; measured r8 grid:
    * cells=10 nprobe=8 holds 0.96 at BOTH the 500- and 2000-vector
    * fixtures, asserted in SimilaritySpec at floor 0.85). The one
    * `count()` here is index-BUILD cost (like the k-means trainer), not
    * per-query cost. stride stays Long end to end — an Int stride would
    * silently overflow above ~cells·2^31 corpus rows (ADVICE r7). */
  def ivfTopKCells(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      k: Int, cells: Int = 10, nprobe: Int = 8): DataFrame = {
    val stride = math.max(1L, corpus.count() / cells)
    ivfTopK(corpus, queries, corpusId, corpusVec, queryId, queryVec,
      k, stride, nprobe)
  }

  /** ALL centroids collapsed to ONE broadcastable row of parallel arrays
    * (cent_ids, cent_vecs), ordered by centroid_id so the argbest
    * kernel's lowest-index tie-break equals the (score, centroid_id asc)
    * window tie-break it replaces. A centroid relation is model-sized
    * (k ≤ ~√n rows) — collapsing it is one tiny single-partition
    * aggregate, never a data-sized job. */
  private def centroidArrays(centroidRel: DataFrame): DataFrame =
    centroidRel
      .agg(array_sort(collect_list(struct(
        col("centroid_id").as("cid"),
        transform(col("centv"), _.cast("double")).as("cd")))).as("cents"))
      .select(transform(col("cents"), _.getField("cid")).as("cent_ids"),
        transform(col("cents"), _.getField("cd")).as("cent_vecs"))

  /** NARROW nearest-centroid assignment: appends `centroid_id` to every
    * corpus row by folding over the broadcast centroid arrays with the
    * codegen argbest kernel — O(k·d) arithmetic per row, zero shuffles,
    * zero windows (asserted in PlanSpec). The window-argmin formulation
    * this replaces materialized a |corpus|×k relation and shuffled it on
    * a unique key just to take the per-row best — invisible at test k,
    * thousands× the corpus at a production IVF cell count (VERDICT r3).
    * Assignment (incl. ties) is identical to that formulation. */
  private[graft] def assignToCentroids(
      corpus: DataFrame, vecColName: String,
      centroidRel: DataFrame, byCosine: Boolean): DataFrame =
    corpus.crossJoin(broadcast(centroidArrays(centroidRel)))
      .withColumn("__nearest", graft.functions.SketchExpressions.nearestIndex(
        transform(col(vecColName), _.cast("double")), col("cent_vecs"), byCosine))
      .withColumn("centroid_id",
        when(col("__nearest") >= 0, element_at(col("cent_ids"), col("__nearest") + 1)))
      .drop("cent_ids", "cent_vecs", "__nearest")

  /** IVF probe against an EXPLICIT centroid relation
    * (centroid_id, centv) — e.g. one trained by [[kmeansCentroids]].
    * Same inverted-list shape as [[ivfTopK]]; better-placed centroids
    * raise recall at the same nprobe. */
  def ivfTopKWithCentroids(
      corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      centroidRel: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("cv"))
    val centroids = broadcast(
      centroidRel.select(col("centroid_id"), col("centv")))
    // Assign each corpus vector to its nearest centroid (argmax cosine)
    // — narrow kernel fold, no corpus×k relation, no shuffle.
    val assigned = assignToCentroids(c, "cv", centroidRel, byCosine = true)
      .select(col("centroid_id"), col("neighbor_id"), col("cv"))
    // Each query probes its nprobe nearest centroids.
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("centroid_id"))
    val probes = broadcast(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))
        .crossJoin(centroids)
        .withColumn("qcos", cosine(col("qv"), col("centv")))
        .withColumn("prnk", row_number().over(probeW))
        .filter(col("prnk") <= nprobe)
        .select(col("query_id"), col("qv"), col("centroid_id")))
    val scored = assigned.join(probes, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Lloyd's k-means over the embedding corpus, entirely in DataFrame
    * ops: assignment is the NARROW argbest-kernel fold over the broadcast
    * centroid arrays (zero shuffle over the corpus — the only exchange is
    * the elementwise-mean groupBy over (cluster, dim), k·d keys), and the
    * new centroids are reassembled from sorted (dim, mean) structs. A
    * FIXED iteration count with deterministic lowest-id initialization
    * keeps the result reproducible run-to-run — at scale this is the
    * centroid trainer for the IVF index, and the centroid relation stays
    * k rows (model-sized) end to end, never collected to the driver.
    *
    * A cluster that loses all members drops out (standard Lloyd
    * degeneracy); callers get ≤ k centroids. */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val initW = Window.orderBy(col("vid"))
    var centroids = c.orderBy(col("vid")).limit(k)
      .select((row_number().over(initW) - 1).as("centroid_id"),
        col("v").as("centv"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val assigned = assignToCentroids(c, "v", centroids, byCosine = false)
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("s"))
        .select(col("centroid_id"),
          transform(col("s"), x => x.getField("m")).as("centv"))
        .localCheckpoint(eager = false)
    }
    centroids
  }
}
