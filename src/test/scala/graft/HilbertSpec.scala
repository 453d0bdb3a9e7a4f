package graft

import org.apache.spark.sql.functions._

import graft.functions.Hilbert

/** Hilbert-curve clustering: the coordinate→index transform's defining
  * properties (exhaustively, at several dims × bits), interpreted ≡
  * compiled expression parity, the measured file-skipping win on real
  * parquet footers, and the OPTIMIZE integration. The two properties —
  * bijectivity and unit-step adjacency — CHARACTERIZE a Hilbert-style
  * walk: together they force consecutive key values to be grid
  * neighbors covering every cell exactly once, which is precisely the
  * locality the clustering exists to buy. */
class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  private def allCells(dims: Int, bits: Int): Seq[Array[Long]] = {
    val side = 1L << bits
    def rec(d: Int): Seq[List[Long]] =
      if (d == 0) Seq(Nil)
      else for (rest <- rec(d - 1); c <- 0L until side) yield c :: rest
    rec(dims).map(_.toArray)
  }

  test("bijective and unit-step adjacent for dims 1..3, bits 1..3 (exhaustive)") {
    for (dims <- 1 to 3; bits <- 1 to 3) {
      val cells = allCells(dims, bits)
      val byIndex = cells.map(c => Hilbert.index(c, bits) -> c.toSeq)
      // bijective: every index 0..2^(d*b)-1 hit exactly once
      assert(byIndex.map(_._1).sorted === (0L until (1L << (dims * bits))),
        s"dims=$dims bits=$bits not bijective")
      // unit-step: consecutive indices differ by 1 in EXACTLY one
      // coordinate — the Hilbert walk, not Morton's diagonal jumps
      val walk = byIndex.sortBy(_._1).map(_._2)
      walk.sliding(2).foreach { case Seq(a, b) =>
        val l1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(l1 === 1L, s"dims=$dims bits=$bits jump $a -> $b")
      }
    }
  }

  test("the input array is not mutated; bounds are enforced") {
    val in = Array(3L, 1L)
    Hilbert.index(in, 2)
    assert(in.toSeq === Seq(3L, 1L))
    intercept[IllegalArgumentException](Hilbert.index(Array(1L), 0))
    intercept[IllegalArgumentException](
      Hilbert.index(Array.fill(8)(0L), 8)) // 64 bits > 62
  }

  test("compiled expression matches the driver-side transform on every cell (eval/codegen share one code path)") {
    val bits = 3
    val cells = allCells(2, bits)
    val df = cells.map(c => (c(0), c(1))).toDF("x", "y")
      .withColumn("h", Hilbert.hilbertIndex(array(col("x"), col("y")), bits))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = cells.map(c => (c(0), c(1)) -> Hilbert.index(c, bits)).toMap
    assert(got === want)
  }

  test("hilbert layout skips files on the non-sort dimension at least as claimed for z-order") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val probe = graft.core.Zorder.skipProbe(
      li, Seq("l_quantity", "l_extendedprice"), "l_extendedprice",
      loFrac = 0.32, hiFrac = 0.42, bits = 8, files = 8)
    assert(probe.linearCandidates >= 6L,
      s"linear layout unexpectedly pruned: ${probe.linearCandidates}")
    // the ≥2× contract z-order carries, under the unit-step walk
    assert(probe.hilbertCandidates * 2 <= probe.linearCandidates,
      s"hilbert=${probe.hilbertCandidates} linear=${probe.linearCandidates}")
  }

  test("OPTIMIZE with curve=hilbert rewrites the table losslessly and prunes like the morton form") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_opt_hilbert").toString
    val df = spark.range(4000).select(
      col("id"),
      (col("id") % 63).cast("long").as("a"),
      ((col("id") * 37) % 61).cast("long").as("b"))
    graft.core.DeltaExport.writeDeltaTable(spark,
      df.repartition(4), dir)
    val v = graft.core.DeltaExport.optimizeDeltaTable(spark, dir,
      targetFiles = 8, zorderBy = Seq("a", "b"), curve = "hilbert")
    assert(v === 1L)
    val back = graft.core.DeltaExport.readDeltaTable(spark, dir)
    assert(back.count() === 4000L)
    assert(back.agg(sum(col("id"))).head().getLong(0) ===
      (0L until 4000L).sum)
    // the pruned reader sees tighter per-file `a` stats than the
    // pre-optimize random layout: a band on `a` must not need all 8
    // files
    val files = graft.core.DeltaExport
      .readDeltaTable(spark, dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("a")).as("mn"), max(col("a")).as("mx"))
      .filter(col("mx") >= 20 && col("mn") <= 30)
      .count()
    assert(files < 8L, s"hilbert layout pruned nothing: $files of 8")
    val e = intercept[IllegalArgumentException](
      graft.core.DeltaExport.optimizeDeltaTable(spark, dir,
        zorderBy = Seq("a"), curve = "peano"))
    assert(e.getMessage.contains("peano"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
