package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column file-skipping
  * layout Delta ships as OPTIMIZE ZORDER BY, rebuilt on plain parquet.
  *
  * A range sort on column A gives perfect min/max pruning on A and NONE
  * on B: every file spans B's whole domain. Interleaving the bit codes
  * of both columns into one sort key makes each output file a small
  * hyper-rectangle of the (A, B) space, so footer min/max statistics
  * prune on EVERY clustered column at once — a point/band query on B
  * alone now skips most files instead of reading all of them. At 100 TB
  * that is the difference between a scan and a seek; WriterSpec measures
  * the effect on real parquet footers rather than trusting the theory.
  *
  * Everything stays in-plan: per-column min/max come from a 1-row
  * aggregate cross-joined back (no driver collect), the cell code is a
  * codegen'd width_bucket, and the interleave is a static fold of
  * shift/mask expressions built at plan time.
  */
object Zorder {

  /** Per-column cell codes shared by BOTH curves: `df` cross-joined
    * with its broadcast 1-row min/max aggregate, plus one [0, 2^bits)
    * equal-width bucket expression per clustered column. */
  private def cellCodes(df: DataFrame, cols: Seq[String],
      bits: Int): (DataFrame, Seq[Column]) = {
    // <= 62, not 63: cells = 1L << bits must itself stay positive;
    // bits >= 1 because a 0- or negative-bit shift wraps mod 64 and
    // yields garbage cells
    require(cols.nonEmpty && bits >= 1 && cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits must each be >= 1 bit and fit a signed long")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"__mn$i"),
        max(col(c)).cast("double").as(s"__mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val cells = 1L << bits
    val codes = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) = (col(s"__mn$i"), col(s"__mx$i"))
      // width_bucket yields 1..cells in range and cells+1 at v = mx;
      // shift to 0-based and clamp the max edge into the top cell.
      // NULLs go to cell 0 explicitly — least() skips null arguments,
      // which would otherwise silently co-cluster nulls with the max
      when(col(c).isNotNull && mx > mn,
        least(width_bucket(col(c).cast("double"), mn, mx, lit(cells)) - 1,
          lit(cells - 1)))
        .otherwise(lit(0L))
    }
    (withStats, codes)
  }

  private def dropStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.indices.flatMap(i => Seq(s"__mn$i", s"__mx$i")): _*)

  /** Add a z-order key column interleaving `cols` at `bits` bits each
    * (cols.size * bits must fit a signed long). Columns are mapped to
    * [0, 2^bits) cells by equal-width bucketing between their own
    * min/max; constant columns and NULL values collapse to cell 0. */
  def withKey(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      keyName: String = "__z"): DataFrame = {
    val (withStats, codes) = cellCodes(df, cols, bits)
    val k = cols.size
    val zkey = (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      codes.indices.foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(
          shiftright(codes(i), j).bitwiseAND(lit(1L)), j * k + i))
      }
    }
    dropStats(withStats.withColumn(keyName, zkey), cols)
  }

  /** Add a HILBERT key column over the same cell codes — the
    * locality-preserving upgrade of [[withKey]] (Databricks ships it
    * as liquid clustering's layout): consecutive key values are grid
    * NEIGHBORS, never Morton's plate-crossing jumps, so equal-size key
    * ranges are tighter hyper-rectangles and footer min/max stats skip
    * more. The coordinate→index transform is a compiled expression
    * ([[graft.functions.Hilbert]]) because its per-bit state machine
    * cannot fold into static shift/mask columns. */
  def withHilbertKey(
      df: DataFrame, cols: Seq[String], bits: Int = 8,
      keyName: String = "__z"): DataFrame = {
    val (withStats, codes) = cellCodes(df, cols, bits)
    dropStats(withStats.withColumn(keyName,
      graft.functions.Hilbert.hilbertIndex(array(codes: _*), bits)), cols)
  }

  /** `df` shaped for a clustered write: curve key on `cols` ("morton"
    * | "hilbert"), range-partitioned into `files` (each output file
    * owns a contiguous curve range = a hyper-rectangle of the column
    * space), sorted within partitions so row groups stay tight too,
    * key dropped — the one dispatch [[clusteredWrite]] and both
    * OPTIMIZE forms share. */
  def curveShaped(df: DataFrame, cols: Seq[String], bits: Int,
      files: Int, curve: String): DataFrame = {
    val keyed = curve match {
      case "morton" => withKey(df, cols, bits)
      case "hilbert" => withHilbertKey(df, cols, bits)
      case other => throw new IllegalArgumentException(
        s"unknown clustering curve '$other' — morton or hilbert")
    }
    keyed
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` as parquet clustered on the space-filling-curve key
    * of `cols` — [[curveShaped]] to disk. */
  def clusteredWrite(
      df: DataFrame, path: String, cols: Seq[String], bits: Int = 8,
      files: Int = 8, curve: String = "morton"): Unit =
    curveShaped(df, cols, bits, files, curve)
      .write.mode("overwrite").parquet(path)

  /** Outcome of [[skipProbe]]: candidate-file counts for the same band
    * predicate under the three layouts, plus the z-layout's row count
    * so callers can assert the clustering rewrite lost nothing. The
    * probe dirs themselves are deleted before returning — Bench runs
    * this every round on the sf lineitem, and full table copies per
    * run would accumulate in /tmp (ADVICE r8). */
  final case class SkipProbe(
      linearCandidates: Long, zorderCandidates: Long, zorderRows: Long,
      hilbertCandidates: Long)

  /** Measure file-skipping on REAL parquet footers instead of trusting
    * the Morton-curve theory: write `df` twice — linear range-sort on
    * `cols.head` vs z-order on all of `cols` — then count candidate
    * files for a [loFrac, hiFrac] band predicate on `probeCol`, judged
    * from the same per-file min/max statistics the parquet reader prunes
    * with. The linear layout's files each span (nearly) all of
    * `probeCol`, so it prunes little; z-order must cut the candidate
    * set. WriterSpec asserts the ≥2× boolean contract; Bench emits the
    * measured ratio into the round JSON so clustering quality is tracked
    * per round like latency (VERDICT r4 item 8). */
  def skipProbe(
      df: DataFrame, cols: Seq[String], probeCol: String,
      loFrac: Double, hiFrac: Double,
      bits: Int = 8, files: Int = 8): SkipProbe = {
    val spark = df.sparkSession
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val hDir = java.nio.file.Files.createTempDirectory("graft_hilbert").toString
    df.repartitionByRange(files, col(cols.head))
      .sortWithinPartitions(col(cols.head))
      .write.mode("overwrite").parquet(linDir)
    clusteredWrite(df, zDir, cols, bits, files)
    clusteredWrite(df, hDir, cols, bits, files, curve = "hilbert")
    val bounds = df.agg(
      min(col(probeCol)).cast("double").as("lo"),
      max(col(probeCol)).cast("double").as("hi")).head()
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val (qLo, qHi) = (lo + loFrac * (hi - lo), lo + hiFrac * (hi - lo))
    def candidates(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(probeCol)).cast("double").as("mn"),
          max(col(probeCol)).cast("double").as("mx"))
        .filter(col("mx") >= qLo && col("mn") <= qHi)
        .count()
    val probe = SkipProbe(candidates(linDir), candidates(zDir),
      spark.read.parquet(zDir).count(), candidates(hDir))
    Seq(linDir, zDir, hDir).foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    probe
  }
}
