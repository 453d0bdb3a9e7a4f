package graft

import org.apache.spark.sql.functions._

import graft.core.TableStore

/** Contract tests for the shared managed-table persistence helpers: the
  * orphan-location cleanup every catalog sink needs in this environment
  * (in-memory catalog forgets tables across sessions, warehouse dirs
  * persist) and the stage-then-swap publish the streaming upsert sink
  * rides on. */
class TableStoreSpec extends SparkTestBase {

  private def uniq(prefix: String) =
    s"${prefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}"

  test("overwriteTable creates over an orphan warehouse location left by a 'previous session'") {
    import spark.implicits._
    val table = uniq("ts_orphan")
    // simulate the previous-session leftover: a directory at the managed
    // location with no catalog entry — a bare saveAsTable would refuse
    // with LOCATION_ALREADY_EXISTS
    val wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    val orphan = java.nio.file.Paths.get(wh, table)
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("junk.txt"), "stale")
    try {
      TableStore.overwriteTable(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(spark.table(table).count() === 2L)
      // the stale file did not survive into the managed location
      assert(!java.nio.file.Files.exists(orphan.resolve("junk.txt")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("publishTable swaps a complete snapshot in, drops staging, and republishes cleanly") {
    import spark.implicits._
    val table = uniq("ts_publish")
    try {
      TableStore.publishTable(spark, table, Seq((1L, "a")).toDF("id", "v"))
      assert(spark.table(table).collect().map(_.getString(1)).toSeq === Seq("a"))
      // no staging residue — neither a catalog entry nor a warehouse dir
      assert(!spark.catalog.tableExists(table + "__staging"))
      val wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(wh, table + "__staging")))
      // second publish replaces the snapshot (the swap path, not create)
      TableStore.publishTable(spark, table, Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
      assert(spark.table(table).count() === 2L)
      assert(spark.table(table).filter(col("v") === "a").count() === 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("publishTable lets a plan READ the table it replaces — no eager materialization needed") {
    import spark.implicits._
    val table = uniq("ts_selfread")
    try {
      TableStore.publishTable(spark, table, Seq((1L, 10.0)).toDF("id", "x"))
      // the classic self-overwrite hazard: this plan scans `table`; with
      // an in-place overwrite it would read a table being deleted under
      // it unless checkpointed first. Stage-then-swap executes the read
      // against the intact target while writing to staging.
      val merged = spark.table(table)
        .unionByName(Seq((2L, 20.0)).toDF("id", "x"))
        .groupBy(col("id")).agg(sum(col("x")).as("x"))
      TableStore.publishTable(spark, table, merged)
      assert(spark.table(table).count() === 2L)
      assert(spark.table(table).agg(sum(col("x"))).head().getDouble(0) === 30.0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
