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

  test("recoverStaging finishes a same-session swap interrupted between drop and rename") {
    import spark.implicits._
    val table = uniq("ts_midswap")
    try {
      // the exact crash state: complete snapshot in the staging table,
      // target already dropped, rename never ran
      TableStore.overwriteTable(spark, table + "__staging",
        Seq((1L, "recovered")).toDF("id", "v"))
      assert(!spark.catalog.tableExists(table))
      assert(TableStore.recoverStaging(spark, table))
      assert(spark.table(table).head().getString(1) === "recovered")
      assert(!spark.catalog.tableExists(table + "__staging"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("recoverStaging re-publishes from a cross-session orphan staging directory") {
    import spark.implicits._
    val table = uniq("ts_crashdir")
    // a crash that killed the session leaves ONLY the staging directory:
    // the in-memory catalog lost both entries
    val wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    val stagingDir = java.nio.file.Paths.get(wh, table + "__staging")
    try {
      Seq((7L, "survived")).toDF("id", "v")
        .write.parquet(stagingDir.toString)
      assert(TableStore.recoverStaging(spark, table))
      assert(spark.table(table).head().getString(1) === "survived")
      assert(!java.nio.file.Files.exists(stagingDir))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("recoverStaging discards stale staging when the target is intact") {
    import spark.implicits._
    val table = uniq("ts_stale")
    try {
      // writer died BEFORE the drop: published table intact, staging
      // residue present — the interrupted batch replays from its
      // checkpoint, so the residue must be discarded, not swapped in
      TableStore.publishTable(spark, table, Seq((1L, "live")).toDF("id", "v"))
      TableStore.overwriteTable(spark, table + "__staging",
        Seq((2L, "stale")).toDF("id", "v"))
      assert(!TableStore.recoverStaging(spark, table))
      assert(spark.table(table).head().getString(1) === "live")
      assert(!spark.catalog.tableExists(table + "__staging"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
