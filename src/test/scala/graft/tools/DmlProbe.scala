package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.DeltaExport

/** Round-16 DML probe: deletion-vector DELETE vs copy-on-write DELETE
  * on the same table, at 1× and 10× row counts — the scale story the
  * two writers claim made measurable. The predicate matches 0.1% of
  * rows SPREAD ACROSS EVERY FILE (the shape that makes COW worst-case:
  * all files touched, near-full rewrite), so the expected split is
  * DV ≈ O(matched rows) vs COW ≈ O(table). Also reports the commit's
  * write amplification (bytes of data files written by the op).
  * Test sourceset, never ships.
  *
  * Run: sbt "Test/runMain graft.tools.DmlProbe"
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dataBytes(dir: String): Long = {
      val root = java.nio.file.Paths.get(dir)
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet") &&
            !root.relativize(p).toString.startsWith("_delta_log"))
          .map(java.nio.file.Files.size(_)).sum
      } finally walk.close()
    }

    for (scale <- Seq(1L, 10L)) {
      val n = 1000000L * scale
      def freshTable(): String = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_dml_${scale}x").toString
        DeltaExport.writeDeltaTable(spark,
          spark.range(n).select(col("id"),
            (col("id") % 997L).cast("double").as("v"))
            .repartitionByRange(8, col("id")),
          dir)
        dir
      }
      val pred = col("id") % 1000L === 7L // 0.1%, every file
      for (mode <- Seq("dv", "cow")) {
        val dir = freshTable()
        val before = dataBytes(dir)
        val t0 = System.nanoTime()
        if (mode == "dv") DeltaExport.deleteFromDeltaTableDv(spark, dir, pred)
        else DeltaExport.deleteFromDeltaTable(spark, dir, pred)
        val sec = (System.nanoTime() - t0) / 1e9
        val written = dataBytes(dir) - before
        val rows = DeltaExport.readDeltaTable(spark, dir).count()
        println(f"scale=${scale}x n=$n%,d mode=$mode%-3s delete=$sec%7.3f s " +
          f"dataBytesWritten=$written%,d rows=$rows%,d")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
