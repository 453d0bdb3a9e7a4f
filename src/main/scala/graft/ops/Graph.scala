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
}
