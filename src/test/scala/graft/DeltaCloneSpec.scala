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

  /** Bytes of every data file + log commit under a table root, for
    * byte-identity assertions on the SOURCE after clone DML. */
  private def contentSig(dir: String): Map[String, Long] = {
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => p.toString -> {
          val b = java.nio.file.Files.readAllBytes(p)
          java.util.Arrays.hashCode(b).toLong * 31 + b.length
        }).toMap
    } finally walk.close()
  }

  test("DML on a clone LOCALIZES: rewrites land target-local, the source stays byte-identical, vacuum reclaims only local files") {
    val src = tmp("graft_clone_dml_src")
    val dst = tmp("graft_clone_dml_dst"); rm(dst)
    DeltaExport.writeDeltaTable(spark,
      spark.range(50).select(col("id"), (col("id") * 2).as("v"))
        .repartition(2), src)
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
    val srcBefore = contentSig(src)
    // MERGE: update one row, insert one — touched source-absolute
    // files rewrite into TARGET-local files
    DeltaExport.mergeDeltaTable(spark,
      Seq((1L, 999L), (500L, 1L)).toDF("id", "v"), dst, Seq("id"))
    val afterMerge = DeltaExport.readDeltaTable(spark, dst)
    assert(afterMerge.count() === 51L)
    assert(afterMerge.filter(col("id") === 1L)
      .select("v").head().getLong(0) === 999L)
    // COW DELETE localizes the touched file too
    DeltaExport.deleteFromDeltaTable(spark, dst, col("id") === 2L)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 50L)
    // DV DELETE masks rows of a still-absolute add with a TARGET-local
    // vector — zero bytes moved
    DeltaExport.deleteFromDeltaTableDv(spark, dst, col("id") === 3L)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 49L)
    // DV UPDATE composes
    DeltaExport.updateDeltaTableDv(spark, dst,
      col("id") === 4L, Map("v" -> lit(0L)))
    assert(DeltaExport.readDeltaTable(spark, dst)
      .filter(col("id") === 4L).select("v").head().getLong(0) === 0L)
    // CHECKPOINT materializes absolute adds verbatim and replays
    DeltaExport.checkpointDeltaTable(spark, dst)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 49L)
    // OPTIMIZE fully localizes the clone: no live absolute refs remain
    DeltaExport.optimizeDeltaTable(spark, dst)
    val (_, liveAfter) = DeltaExport.snapshotAt(spark, dst, None)
    assert(liveAfter.forall(f => !f.startsWith("/") &&
      !f.contains(":")), liveAfter.mkString(", "))
    val expect = DeltaExport.readDeltaTable(spark, dst)
      .agg(sum(col("v"))).head().getLong(0)
    // vacuum reclaims only TARGET-local files; the source is
    // byte-identical through the whole DML run
    DeltaExport.vacuumDeltaTable(spark, dst)
    assert(DeltaExport.readDeltaTable(spark, dst)
      .agg(sum(col("v"))).head().getLong(0) === expect)
    assert(contentSig(src) === srcBefore, "source bytes changed")
    assert(DeltaExport.readDeltaTable(spark, src).count() === 50L)
    // values survived the full localize chain
    val vals = DeltaExport.readDeltaTable(spark, dst)
      .orderBy("id").filter(col("id") <= 5L)
      .select("id", "v").as[(Long, Long)].collect().toSeq
    assert(vals === Seq((0L, 0L), (1L, 999L), (4L, 0L), (5L, 10L)), vals)
    rm(src, dst)
  }

  test("partitioned clone: DV delete then PURGE localizes rewrites into the TARGET's Hive directories; prunes keep planning") {
    val src = tmp("graft_clone_part_src")
    val dst = tmp("graft_clone_part_dst"); rm(dst)
    DeltaExport.writeDeltaTablePartitioned(spark,
      spark.range(200).select(col("id"),
        (col("id") % 4).cast("string").as("p"),
        (col("id") * 3).as("v")), src, Seq("p"))
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
    val srcBefore = contentSig(src)
    // DV delete masks rows of the absolute adds with target-local bins
    DeltaExport.deleteFromDeltaTableDv(spark, dst, col("id") % 10 === 7)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 180L)
    // PURGE rewrites each DV-carrying absolute add into the TARGET's
    // own Hive directory (rebuilt from the add's partitionValues)
    DeltaExport.purgeDeletionVectors(spark, dst)
    assert(DeltaExport.readDeltaTable(spark, dst).count() === 180L)
    // the fresh files live under $dst/p=X/ and parse their partition
    // values off the local Hive path
    val (_, liveAfter) = DeltaExport.snapshotAt(spark, dst, None)
    val localized = liveAfter.filterNot(_.startsWith("/"))
    assert(localized.nonEmpty && localized.forall(_.startsWith("p=")),
      localized.mkString(", "))
    // prune on the clone still plans from ITS log; values correct
    val (pruned, scanned, total) = DeltaExport
      .readDeltaTablePartitionPruned(spark, dst, Map("p" -> "2"))
    assert(scanned < total)
    assert(pruned.agg(sum(col("v"))).head().getLong(0) ===
      (0L until 200L).filter(i => i % 4 == 2 && i % 10 != 7)
        .map(_ * 3).sum)
    assert(contentSig(src) === srcBefore, "source bytes changed")
    rm(src, dst)
  }

  test("overwrite and vacuum stay safe on a fresh clone; time travel resolves via source bytes") {
    val src = tmp("graft_clone_grd_src")
    val dst = tmp("graft_clone_grd_dst"); rm(dst)
    DeltaExport.writeDeltaTable(spark,
      spark.range(50).select(col("id"), (col("id") * 2).as("v"))
        .repartition(2), src)
    DeltaExport.cloneDeltaTableShallow(spark, src, dst)
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
