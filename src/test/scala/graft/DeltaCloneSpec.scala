package graft

import org.apache.spark.sql.functions._

import graft.core.DeltaExport

/** SHALLOW CLONE — zero-copy table copies via absolute-path add
  * actions, the protocol's "path may be an absolute path" leg: the
  * clone reads byte-identically without moving data, evolves
  * independently (fresh table id; appends land relative beside the
  * absolute references), keeps the source untouched, and the
  * file-rewrite family refuses by name until it learns not to reclaim
  * the source's files. */
class DeltaCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dirs: String*): Unit = dirs.foreach(d =>
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))

  test("clone reads the source snapshot byte-for-byte, takes a fresh id, and appends evolve it independently") {
    val src = tmp("graft_clone_src")
    val dst = tmp("graft_clone_dst")
    rm(dst) // clone creates the target itself
    DeltaExport.writeDeltaTable(spark,
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
        .repartition(3), src)
    DeltaExport.appendDeltaTable(spark,
      Seq((1000L, 1L)).toDF("id", "v"), src)
    assert(DeltaExport.cloneDeltaTableShallow(spark, src, dst) === 0L)
    // no data bytes under the target — only the log
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 101L)
    val localParquet = java.nio.file.Files.walk(java.nio.file.Paths.get(dst))
    val dataFiles = try {
      import scala.jdk.CollectionConverters._
      localParquet.iterator().asScala.count(p =>
        p.toString.endsWith(".parquet") &&
          !p.toString.contains("_delta_log"))
    } finally localParquet.close()
    assert(dataFiles === 0, s"clone copied $dataFiles data files")
    // fresh table id
    def idOf(dir: String): String = {
      val raw = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_delta_log",
          "00000000000000000000.json")), "UTF-8")
      """"metaData":\{"id":"([^"]+)"""".r.findFirstMatchIn(raw)
        .map(_.group(1)).get
    }
    assert(idOf(src) !== idOf(dst))
    // append evolves the CLONE only
    DeltaExport.appendDeltaTable(spark, Seq((2000L, 2L)).toDF("id", "v"), dst)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 102L)
    assert(DeltaExport.readDeltaTable(spark, src).count() === 101L)
    // sums match relationally (values, not just counts)
    val srcSum = DeltaExport.readDeltaTable(spark, src)
      .agg(sum(col("v"))).head().getLong(0)
    val dstSum = DeltaExport.readDeltaTable(spark, dst)
      .agg(sum(col("v"))).head().getLong(0)
    assert(dstSum === srcSum + 2L)
    rm(src, dst)
  }

  test("clone carries stats, partitionValues and deletion vectors; pruned reads still prune; masked rows stay masked") {
    val src = tmp("graft_clone_dv_src")
    val dst = tmp("graft_clone_dv_dst"); rm(dst)
    DeltaExport.writeDeltaTablePartitioned(spark,
      spark.range(200).select(col("id"),
        (col("id") % 4).cast("string").as("p"),
        (col("id") * 3).as("v")), src, Seq("p"))
    DeltaExport.deleteFromDeltaTableDv(spark, src, col("id") % 10 === 7)
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
    // DV survives: the clone hides exactly what the source hides
    assert(DeltaExport.readDeltaTable(spark, dst).count() ===
      DeltaExport.readDeltaTable(spark, src).count())
    assert(DeltaExport.readDeltaTable(spark, dst)
      .filter(col("id") % 10 === 7).count() === 0L)
    // partition-pruned read on the clone plans from ITS log (the DV'd
    // ids end in 7 — odd — so partition p=2's even ids keep all 50)
    val (pruned, scanned, total) = DeltaExport
      .readDeltaTablePartitionPruned(spark, dst, Map("p" -> "2"))
    assert(pruned.count() === 50L)
    assert(scanned < total, s"pruned nothing: $scanned of $total")
    rm(src, dst)
  }

  test("the rewrite family refuses by name on a clone; overwrite and vacuum stay safe") {
    val src = tmp("graft_clone_grd_src")
    val dst = tmp("graft_clone_grd_dst"); rm(dst)
    DeltaExport.writeDeltaTable(spark,
      spark.range(50).select(col("id"), (col("id") * 2).as("v"))
        .repartition(2), src)
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
    for ((name, op) <- Seq[(String, () => Any)](
        ("optimize", () => DeltaExport.optimizeDeltaTable(spark, dst)),
        ("delete", () => DeltaExport.deleteFromDeltaTable(spark, dst,
          col("id") === 1L)),
        ("deleteDv", () => DeltaExport.deleteFromDeltaTableDv(spark, dst,
          col("id") === 1L)),
        ("updateDv", () => DeltaExport.updateDeltaTableDv(spark, dst,
          col("id") === 1L, Map("v" -> lit(0L)))),
        ("merge", () => DeltaExport.mergeDeltaTable(spark,
          Seq((1L, 9L)).toDF("id", "v"), dst, Seq("id"))),
        ("checkpoint", () => DeltaExport.checkpointDeltaTable(spark, dst)))) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("ABSOLUTE"), s"$name: ${e.getMessage}")
    }
    // OVERWRITE is log surgery — works, and the SOURCE keeps its rows
    DeltaExport.overwriteDeltaTable(spark,
      Seq((7L, 7L)).toDF("id", "v"), dst)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 1L)
    assert(DeltaExport.readDeltaTable(spark, src).count() === 50L)
    // vacuum on the clone reclaims NOTHING of the source: the absolute
    // references never match the target's local listing
    DeltaExport.vacuumDeltaTable(spark, dst)
    assert(DeltaExport.readDeltaTable(spark, src).count() === 50L)
    // time travel on the clone back to v0 still resolves via the
    // source bytes
    assert(DeltaExport.readDeltaTable(spark, dst, Some(0L)).count() === 50L)
    rm(src, dst)
  }

  test("cloning a COLUMN-MAPPED source keeps the mapping: reads resolve physically, appends land physically") {
    val src = tmp("graft_clone_cm_src")
    val dst = tmp("graft_clone_cm_dst"); rm(dst)
    DeltaExport.writeDeltaTable(spark,
      spark.range(30).select(col("id"), (col("id") * 2).as("v"))
        .repartition(1), src)
    DeltaExport.upgradeToColumnMapping(spark, src)
    DeltaExport.renameDeltaTableColumn(spark, src, "v", "value")
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
    // the clone reads under the RENAMED logical schema through the
    // source's physical bytes
    assert(DeltaExport.readDeltaTable(spark, dst).columns.toSeq ===
      Seq("id", "value"))
    assert(DeltaExport.readDeltaTable(spark, dst)
      .agg(sum(col("value"))).head().getLong(0) ===
      (0L until 30L).map(_ * 2).sum)
    // an append lands physical-named columns beside the absolute refs
    DeltaExport.appendDeltaTable(spark,
      Seq((100L, 7L)).toDF("id", "value"), dst)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 31L)
    assert(DeltaExport.readDeltaTable(spark, src).count() === 30L)
    rm(src, dst)
  }

  test("cloning an ICT source seeds the target's own timestamp chain with re-anchored enablement markers") {
    val src = tmp("graft_clone_ict_src")
    val dst = tmp("graft_clone_ict_dst"); rm(dst)
    DeltaExport.writeDeltaTable(spark,
      spark.range(10).toDF("id").repartition(1), src)
    DeltaExport.enableInCommitTimestamps(spark, src)
    DeltaExport.appendDeltaTable(spark, Seq(100L).toDF("id"), src)
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
    def line0(dir: String, v: Long): String =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json")),
        "UTF-8").split("\n").head
    def ictIn(l: String): Option[Long] =
      """"inCommitTimestamp":(\d+)""".r.findFirstMatchIn(l)
        .map(_.group(1).toLong)
    // the CLONE commit itself carries the target's first ICT …
    val ict0 = ictIn(line0(dst, 0L))
    assert(ict0.isDefined)
    // … the enablement markers re-anchor at the target's v0 (the
    // source's marker points at a version the target's log never had)
    val full0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "_delta_log",
        "00000000000000000000.json")), "UTF-8")
    assert(full0.contains(
      """"delta.inCommitTimestampEnablementVersion":"0""""), full0)
    // … and later commits continue the chain strictly
    DeltaExport.appendDeltaTable(spark, Seq(200L).toDF("id"), dst)
    assert(ictIn(line0(dst, 1L)).get > ict0.get)
    rm(src, dst)
  }

  test("clone of a clone stays zero-copy; cloning onto an existing log refuses") {
    val src = tmp("graft_clone2_src")
    val mid = tmp("graft_clone2_mid"); rm(mid)
    val dst = tmp("graft_clone2_dst"); rm(dst)
    DeltaExport.writeDeltaTable(spark,
      spark.range(10).toDF("id").repartition(1), src)
    DeltaExport.cloneDeltaTableShallow(spark, src, mid)
    DeltaExport.cloneDeltaTableShallow(spark, mid, dst)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 10L)
    val e = intercept[IllegalArgumentException](
      DeltaExport.cloneDeltaTableShallow(spark, src, mid))
    assert(e.getMessage.contains("already holds"))
    rm(src, mid, dst)
  }
}
