package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the second iterative DataFrame
  * algorithm family next to DedupCluster's connected components. At
  * corpus scale the graph (near-dup edges, citation/link graphs) lives
  * as a distributed edge relation; rank iterations are join + aggregate
  * rounds with lineage truncated per round, never a driver-side
  * adjacency structure. */
object Graph {

  /** PageRank over an UNDIRECTED edge list (columns u, v): each
    * iteration is one join (ranks onto directed edges) and one aggregate
    * (contributions by target) — both hash-shuffles on node id, the
    * textbook Pregel round expressed relationally. Undirected edges mean
    * every node has out-degree ≥ 1, so there is no dangling-mass term.
    * Fixed iteration count, deterministic result (asserted against an
    * unrolled-iteration oracle). Returns (node, rank). */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node")).localCheckpoint(eager = false)
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = sym
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("inflow"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Synchronous label propagation (Zhu & Ghahramani 2002 / Raghavan
    * et al. 2007 style) over a DIRECTED edge list: each round, every
    * node adopts the majority label of its out-neighbors (ties break
    * toward the smallest label), seed nodes stay clamped, and a node
    * with no labeled neighbor keeps its previous label. The
    * semi-supervised labeling pass a curation pipeline runs over the
    * kNN graph (q109) to spread scarce human labels across a corpus.
    *
    * `nodes`: (node, seed_label) with seed_label null for unlabeled
    * nodes; `edges`: (src, dst). Each of the fixed `iters` rounds is one
    * hash-join of labels onto edges plus two aggregates on node id — the
    * same Pregel-round shape as [[pageRank]], linear in |E| per round
    * with map-side combine on the (src, label) count, and lineage
    * truncated per round. Deterministic end to end (count-then-min-label
    * argmax, no FP), which is what lets q114 carry an exact DuckDB
    * oracle with the iterations unrolled. Returns (node, lab). */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int = 3): DataFrame =
    propagate(nodes, edges, iters, trackChanges = false)._1

  /** [[labelPropagation]] plus convergence telemetry: the per-round
    * count of nodes whose label CHANGED that round (null-aware). On a
    * fixed static graph with clamped seeds the changed count is the
    * propagation frontier; it must trend toward zero as labels
    * stabilize (GraphSpec asserts near-monotone decline, Bench emits it
    * per round so stability is visible across rounds). Costs one extra
    * count() action per round — telemetry-path only; the registered
    * queries call the action-free twin above. */
  def labelPropagationWithStats(
      nodes: DataFrame, edges: DataFrame, iters: Int = 3)
      : (DataFrame, Seq[(Int, Long)]) =
    propagate(nodes, edges, iters, trackChanges = true)

  private def propagate(nodes: DataFrame, edges: DataFrame, iters: Int,
      trackChanges: Boolean): (DataFrame, Seq[(Int, Long)]) = {
    // NOT pre-hashed by the round join key (measured r21 edge-side and
    // r22 both-sides, neutral at 3.03 → 3.14 s on q114b): a
    // `localCheckpoint` comes back as a bare `Scan ExistingRDD` with no
    // outputPartitioning, so EnsureRequirements re-inserts the
    // hash(dst) exchange above it EVERY round regardless of how the
    // checkpointed rows were distributed (plan-verified r22 — see
    // OPTIMIZATION_r22.md). A pre-repartition therefore only pays an
    // extra build exchange; the per-round exchange it targets cannot be
    // removed through a checkpoint boundary. (Graph.symmetric keeps its
    // repartition on its own r21 reversed-order 2x measurement — the
    // effect there is the checkpoint's physical layout, not exchange
    // elimination.)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    val seeds = nodes.select(col("node"), col("seed_label"))
      .localCheckpoint(eager = false)
    var labels = seeds.select(col("node"), col("seed_label").as("lab"))
    val changed = Seq.newBuilder[(Int, Long)]
    for (round <- 1 to iters) {
      val counts = e
        .join(labels.select(col("node").as("dst"), col("lab")), Seq("dst"))
        .filter(col("lab").isNotNull)
        .groupBy(col("src"), col("lab")).agg(count(lit(1)).as("c"))
      // argmax(count, tie → min label) as a single agg: max over
      // (count, −label) structs — combiner-friendly, no per-node window
      val upd = counts
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("src").as("node"), (-col("m.nl")).as("newlab"))
      val joined = seeds
        .join(labels.withColumnRenamed("lab", "prev"), Seq("node"), "left")
        .join(upd, Seq("node"), "left")
        .withColumn("lab",
          coalesce(col("seed_label"), col("newlab"), col("prev")))
      val next =
        (if (trackChanges) joined.select(col("node"), col("lab"), col("prev"))
         else joined.select(col("node"), col("lab")))
          .localCheckpoint(eager = false)
      if (trackChanges)
        changed += round ->
          next.filter(!(col("lab") <=> col("prev"))).count()
      labels = next.select(col("node"), col("lab"))
    }
    (labels, changed.result())
  }

  /** PERSONALIZED PageRank over an undirected edge list: random walks
    * restart at the SEED set instead of everywhere — rank becomes
    * proximity-to-seeds (seed-based relevance: "documents like these",
    * contamination neighborhoods around known-bad docs) rather than
    * global centrality. Same join+aggregate Pregel rounds as
    * [[pageRank]]; the teleport term (1−d)/|seeds| lands on seeds
    * only, rank starts as 1/|seeds| on seeds and ZERO elsewhere, and a
    * node's rank stays exactly 0.0 until a walk can reach it — after
    * `iters` rounds exactly the <= iters-hop neighborhood of the seed
    * set is nonzero, a crisp reachability invariant the oracle checks
    * without any float tolerance. Seeds must be graph nodes (checked —
    * a silent non-node seed would leak teleport mass nowhere). */
  def pageRankPersonalized(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node")).localCheckpoint(eager = false)
    val seedSet = seeds.select(col("node")).distinct()
      .localCheckpoint(eager = false)
    val stray = seedSet.join(nodes, Seq("node"), "left_anti").limit(1).collect()
    require(stray.isEmpty,
      s"seed ${stray.headOption.map(_.get(0)).orNull} is not a graph node — " +
        "its teleport mass would vanish silently")
    val k = seedSet.count().toDouble
    require(k > 0, "empty seed set")
    val isSeed = seedSet.withColumn("seed", lit(true))
    var ranks = nodes.join(isSeed, Seq("node"), "left")
      .select(col("node"),
        when(col("seed"), lit(1.0 / k)).otherwise(lit(0.0)).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = sym
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("inflow"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .join(isSeed, Seq("node"), "left")
        .select(col("node"),
          (when(col("seed"), lit((1.0 - damping) / k)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** K-CORE decomposition by iterative peeling: repeatedly drop nodes
    * whose degree in the SURVIVING subgraph is < k until a fixpoint —
    * the maximal subgraph where every node keeps >= k neighbors, the
    * dense-region extractor (template/spam families in a near-dup
    * graph are high-k cores; the periphery peels away). Each round is
    * one degree aggregation + one semi-join on the survivor set —
    * hash-shuffles on node id, lineage truncated per round; rounds are
    * bounded by `maxRounds` and the CONVERGED flag is computed
    * in-plan (one more peel changes nothing) and RETURNED, so an
    * insufficient bound cannot pass silently — the q100 discipline:
    * rounds == maxRounds alone is ambiguous (the peel may converge
    * exactly on the last round), so callers gate on the flag, not the
    * count; a truncated result is NOT a k-core. Returns the surviving
    * (node, degree) relation, the rounds taken, and convergence. */
  def kCore(edges: DataFrame, k: Int,
      maxRounds: Int = 30): (DataFrame, Int, Boolean) = {
    require(k >= 1, s"k must be >= 1: $k")
    var cur = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    var rounds = 0
    var done = false
    // The previous round's edge count rides a driver variable (r22,
    // guide §5): this round's `cur` IS last round's `next`, so its
    // count was already measured by last round's materializing action —
    // re-counting the materialized checkpoint was one extra blocking
    // driver job per peel round.
    var curCount = cur.count()
    while (!done && rounds < maxRounds) {
      val deg = cur.select(col("a").as("node"))
        .unionAll(cur.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k)
        .select(col("node")).localCheckpoint(eager = false)
      val next = cur
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(eager = false)
      rounds += 1
      // fixpoint when the peel removed no edge (every dropped node had
      // degree >= 1, so "no node dropped" ⟺ "edge count unchanged");
      // the count is also the action that materializes the checkpoint
      val nextCount = next.count()
      done = nextCount == curCount
      cur = next
      curCount = nextCount
    }
    val finalDeg = cur.select(col("a").as("node"))
      .unionAll(cur.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    (finalDeg, rounds, done)
  }

  /** The EXACT-integer moment vector degree assortativity divides at
    * the end — (m, Σdx, Σdy, Σdxdy, Σdx², Σdy²) over both directions
    * of every canonical edge. Exposed so restriction contracts
    * (q153d) can pin bit-equality of the arithmetic the statistic is
    * built from, against THIS implementation rather than a copy. */
  def assortativityMoments(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // both directions: Newman's formulation sums over edge ENDS, which
    // also makes r symmetric without a half-correction term
    val pairs = canon
      .join(deg.select(col("node").as("a"), col("deg").as("dx")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("dy")), Seq("b"))
      .select(col("dx"), col("dy"))
    val both = pairs.unionAll(pairs.select(col("dy").as("dx"),
      col("dx").as("dy")))
    both.agg(
      count(lit(1)).as("m"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"))
  }

  /** Degree ASSORTATIVITY (Newman 2002): the Pearson correlation of
    * endpoint degrees over every directed edge instance — positive
    * when high-degree nodes attach to high-degree nodes (template
    * families linking among themselves), negative for hub-and-spoke.
    * ALL-INTEGER exactness: degrees are integers, so every sum
    * (Σx, Σy, Σxy, Σx², Σy², m) is an exact long and the final
    * r = (mΣxy − ΣxΣy) / √(mΣx²−(Σx)²) / √(mΣy²−(Σy)²) is a handful
    * of shared IEEE operations on identical operands in any engine —
    * the q135 OLS discipline applied to graph telemetry. Returns one
    * row (m, r rounded to 6). Degenerate graphs (zero degree variance)
    * return NULL r, never a division crash. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    assortativityMoments(edges)
      .select(col("m"),
        // zero degree variance (regular graphs) → NULL, not an ANSI
        // divide-by-zero: the correlation is undefined there
        when(col("m") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("m") * col("syy") - col("sy") * col("sy") > 0,
          round((col("m") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) /
            sqrt((col("m") * col("syy") - col("sy") * col("sy"))
              .cast("double")), 6)).as("assortativity"))
  }

  /** Per-node TRIANGLE counts over an undirected edge list (columns
    * u, v) by DEGREE ORIENTATION — the standard trick that makes
    * triangle enumeration tractable at scale (Chiba–Nishizeki;
    * node-iterator++): orient every edge from its lower-(degree, id)
    * endpoint to the higher, turning the graph into a DAG whose
    * out-degrees are O(√m); every triangle then has EXACTLY ONE apex
    * with both edges outgoing, so joining the oriented edge list with
    * itself on the apex (a→b, a→c, b<c under the same order) and
    * probing the closing pair against the canonical edge set counts
    * each triangle once — pair work is Σ outdeg², bounded by m·√m
    * instead of the naive Σ deg² that a hub node explodes. All three
    * legs are hash-joins on node/pair keys; nothing collects.
    *
    * Returns (node, triangles, degree, lcc_micro): per-node triangle
    * count, degree, and the local clustering coefficient
    * 2T/(d(d−1)) quantized to integer micros (the q136 discipline —
    * exact cross-engine mean-able). Nodes in no triangle carry 0. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected edge set (u < v), self-loops dropped
    val canon = edges
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    // orient by (degree, id) ascending: src = the smaller endpoint
    val oriented = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(eager = false)
    // wedges at the unique apex; the closing edge probes the canonical set
    val wedges = oriented.select(col("src").as("apex"), col("dst").as("x"))
      .join(oriented.select(col("src").as("apex"), col("dst").as("y")),
        Seq("apex"))
      .filter(col("x") < col("y"))
    val triangles = wedges
      .join(canon.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
      .select(col("apex"), col("x"), col("y"))
    val perNode = triangles
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        col("deg").as("degree"))
      .withColumn("lcc_micro",
        when(col("degree") < 2, lit(0L)).otherwise(
          round(col("triangles") * 2.0 * 1e6 /
            (col("degree") * (col("degree") - 1))).cast("long")))
  }

  /** Symmetric closure of an UNDIRECTED edge list (u, v) — both
    * directions, lineage-truncated (the neighborhood ops replay it
    * every round).
    *
    * Hash-distributed by the probe key BEFORE the checkpoint (r21,
    * guide §2.4): every ball/frontier round joins this relation on `u`,
    * and a checkpoint taken unpartitioned forces a fresh exchange of
    * the edge list in EVERY round. Partitioning once by `u` makes each
    * round's join co-partitioned with the ball side (whose groupBy
    * output is already hashed on the node key) — measured at ~2× on
    * hyperBall at sf0.1 (2.7 s → 1.4 s per call, reversed-order A/B)
    * and strictly fewer per-round shuffles at any scale. */
  private def symmetric(edges: DataFrame): DataFrame =
    edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
      .localCheckpoint(eager = false)

  /** EXACT neighborhood function by frontier BFS: (d, new_pairs) for
    * d = 0..maxD, new_pairs = #(src, dst) pairs whose shortest
    * distance IS d (d = 0 counts every node against itself). Each
    * round expands only the pairs discovered last round and anti-joins
    * the reached set — round work O(frontier · avg degree), the
    * distributed-BFS shape — so d is min-distance by construction.
    * N(d) = Σ_{d' ≤ d} new_pairs. Scale boundary: the reached relation
    * is O(Σ|C|²) over component sizes (q100's closure bound); the
    * linear-cost path is [[hyperBall]]. */
  def neighborhoodFunction(edges: DataFrame, maxD: Int): DataFrame = {
    require(maxD >= 0, s"maxD $maxD must be >= 0")
    val sym = symmetric(edges)
    val nodes = sym.select(col("u").as("node")).distinct()
    var reached = nodes
      .select(col("node").as("src"), col("node").as("dst"), lit(0).as("d"))
      .localCheckpoint(eager = false)
    var frontier = reached
    for (t <- 1 to maxD) {
      val nxt = frontier.select(col("src"), col("dst").as("u"))
        .join(sym, Seq("u"))
        .select(col("src"), col("v").as("dst"))
        .distinct()
        .join(reached.select(col("src"), col("dst")),
          Seq("src", "dst"), "left_anti")
        .withColumn("d", lit(t))
        .localCheckpoint(eager = false)
      reached = reached.unionByName(nxt).localCheckpoint(eager = false)
      frontier = nxt
    }
    reached.groupBy(col("d")).agg(count(lit(1)).as("new_pairs"))
  }

  /** HyperBall (Boldi–Rosa–Vigna 2011): neighborhood-function
    * ESTIMATES from per-node mergeable HLL sketches of the
    * distance-≤ d ball — one edge join + one register-union aggregate
    * per round, O(m) independent of ball sizes, which is what makes
    * effective-diameter telemetry payable on a web-scale graph where
    * the exact pair relation is quadratic in component size. Returns
    * (d, nf_est) for d = 0..maxD with nf_est = Σ_v |ball_d(v)|
    * estimated; at small ball cardinalities the DataSketches HLL is
    * still in exact coupon mode, so estimates are exact there (the
    * q167c contract's lever). */
  def hyperBall(edges: DataFrame, maxD: Int, lgK: Int = 12): DataFrame = {
    require(maxD >= 0, s"maxD $maxD must be >= 0")
    val sym = symmetric(edges)
    val nodes = sym.select(col("u").as("node")).distinct()
    var ball = nodes.groupBy(col("node"))
      .agg(hll_sketch_agg(col("node"), lit(lgK)).as("sk"))
      .localCheckpoint(eager = false)
    def estimate(b: DataFrame, t: Int): DataFrame =
      b.agg(sum(hll_sketch_estimate(col("sk"))).as("nf_est"))
        .select(lit(t).as("d"), col("nf_est"))
    val rounds = Seq.newBuilder[DataFrame]
    rounds += estimate(ball, 0)
    for (t <- 1 to maxD) {
      val contrib = ball.select(col("node").as("u"), col("sk"))
        .join(sym, Seq("u"))
        .select(col("v").as("node"), col("sk"))
      ball = ball.unionByName(contrib)
        .groupBy(col("node"))
        .agg(hll_union_agg(col("sk")).as("sk"))
        .localCheckpoint(eager = false)
      rounds += estimate(ball, t)
    }
    rounds.result().reduce(_.unionByName(_))
  }
}
