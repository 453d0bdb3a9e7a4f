package graft

import org.apache.spark.sql.functions._

import graft.pharma.{Cleaning, MedsFeed, PharmaFixture}

/** Interchange sinks round-trip: the cleaned relation must survive
  * CSV (flat columns, header, explicit read schema — inference would be
  * a second pass and nondeterministic on dirty data) and JSON (nested
  * structs included) without value drift. Parquet round-trips are
  * exercised by every other suite; these are the export formats a
  * downstream non-Spark consumer reads. */
class WriterSpec extends SparkTestBase {

  private lazy val meds = Cleaning.all(
    MedsFeed.fromJsonString(spark, PharmaFixture.feedJson())).cache()

  test("CSV round-trip preserves the flat projection") {
    val flat = meds.drop("lab", "class") // CSV cannot carry structs
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    // explicit NULL sentinel: by default CSV writes both NULL and "" as
    // an empty field and reads them ALL back as NULL — the feed's empty
    // `generic` values would silently become nulls
    flat.write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N").csv(dir)
    val back = spark.read.schema(flat.schema)
      .option("header", "true").option("nullValue", "\\N").csv(dir)
    assert(back.count() === flat.count())
    assert(back.exceptAll(flat).count() === 0L)
    assert(flat.exceptAll(back).count() === 0L)
  }

  test("ORC round-trip preserves nested structs and values") {
    // the columnar interchange format besides parquet (avro has no
    // datasource jar in this runtime); structs are first-class in ORC
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    meds.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === meds.count())
    // names + types survive; nullability flags do not round-trip through
    // ORC (every read column comes back nullable) — values are the check
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      meds.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(meds).count() === 0L)
    assert(meds.exceptAll(back).count() === 0L)
  }

  test("zstd-compressed parquet round-trips and is labeled zstd") {
    // codec choice is a real 100 TB lever (zstd ~30% smaller than the
    // snappy default at similar scan cost); values must be unaffected
    val dir = java.nio.file.Files.createTempDirectory("graft_zstd").toString
    meds.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === meds.count())
    assert(back.exceptAll(meds).count() === 0L)
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.contains(".zstd.parquet")), files.mkString(","))
  }

  test("JSON round-trip preserves nested structs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    meds.write.mode("overwrite").json(dir)
    val back = spark.read.schema(meds.schema).json(dir)
    assert(back.count() === meds.count())
    // struct fields survive: spot-check the nested lab name column
    assert(back.filter(col("lab.name").isNotNull).count() ===
      meds.filter(col("lab.name").isNotNull).count())
    assert(back.exceptAll(meds).count() === 0L)
  }

  test("PERMISSIVE JSON ingestion quarantines corrupt records instead of failing") {
    // dead-letter handling for a dirty feed: good rows parse, bad rows
    // land whole in the corrupt-record column for a quarantine sink
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty")
    java.nio.file.Files.writeString(dir.resolve("feed.jsonl"),
      """{"name": "ok-1", "price": 10}
        |this is not json at all
        |{"name": "ok-2", "price": 20}
        |{"name": "bad-type", "price": "NaN-ish"
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_bad", org.apache.spark.sql.types.StringType)))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(dir.toString).cache()
    assert(parsed.filter(col("_bad").isNull).count() === 2L)
    assert(parsed.filter(col("_bad").isNotNull).count() === 2L)
    // quarantined rows carry the raw line for replay
    assert(parsed.filter(col("_bad").contains("not json")).count() === 1L)
  }

  test("PERMISSIVE labs-feed ingestion quarantines corrupt documents instead of failing") {
    // the labs directory arrives as whole JSON documents (one array per
    // fetch); a malformed document must contribute zero rows to the
    // flatten and land in the dead-letter relation for replay — the same
    // discipline as the meds feed's corrupt-record handling above
    import spark.implicits._
    val raw = Seq(
      graft.pharma.PharmaFixture.labsJson(),
      "this is { not a labs feed").toDF("json")
    val flat = graft.pharma.LabsFeed.flatten(raw)
    assert(flat.count() ===
      graft.pharma.LabsFeed.fromJsonString(
        spark, graft.pharma.PharmaFixture.labsJson()).count())
    val quarantined = graft.pharma.LabsFeed.corrupt(raw)
    assert(quarantined.count() === 1L)
    // the raw document survives whole for replay
    assert(quarantined.head().getString(0).contains("not a labs feed"))
  }

  test("z-order clustering skips files on the non-sort dimension, linear sort cannot") {
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    // 10%-band predicate on extendedprice sits INSIDE one z-quadrant
    // (0.25..0.5), clear of the 0.25/0.5 prefix boundaries: straddling a
    // boundary doubles the quadrants touched and halves the measured
    // skipping. Candidate files judged from the same footer min/max
    // stats the parquet reader prunes with (shared probe: Zorder.skipProbe,
    // also emitted per round by Bench as zorder_skip_ratio).
    val probe = graft.core.Zorder.skipProbe(
      li, Seq("l_quantity", "l_extendedprice"), "l_extendedprice",
      loFrac = 0.32, hiFrac = 0.42, bits = 8, files = 8)
    // quantity-sorted files each span (nearly) all of extendedprice, so
    // the linear layout prunes little or nothing; z-order must cut the
    // candidate set at least in half. Not pinned to exactly 8 files —
    // range-partitioner sampling may emit an empty partition.
    assert(probe.linearCandidates >= 6L,
      s"linear layout unexpectedly pruned: ${probe.linearCandidates}")
    assert(probe.zorderCandidates * 2 <= probe.linearCandidates,
      s"zorder=${probe.zorderCandidates} linear=${probe.linearCandidates}")
    // clustering must not lose or duplicate rows (counted inside the
    // probe — the probe dirs are cleaned up before it returns)
    assert(probe.zorderRows === li.count())
  }

  test("mergeSchema unions parquet files written with evolved schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 3.5)).toDF("id", "v1", "v2_added").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1", "v2_added", "p"))
    assert(merged.count() === 2L)
    // the pre-evolution file reads the new column as NULL
    assert(merged.filter(col("id") === 1L && col("v2_added").isNull).count() === 1L)
  }

  test("sharded JSONL export round-trips every document, sizes shards to target, routes deterministically") {
    import graft.core.Tables
    import graft.ops.Export
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val out = Export.shardedJsonl(d, "doc_id", "text",
      Seq("doc_id", "text", "source"), targetChars = 4096L)
    val schema = "doc_id LONG, text STRING, source STRING, shard INT"
    val back = Export.readShardedJsonl(spark, out, schema).cache()
    // multiset round trip: nothing dropped, duplicated, or mangled
    assert(back.count() === d.count())
    assert(back.select("doc_id", "text", "source")
      .exceptAll(d).count() === 0L)
    assert(d.exceptAll(back.select("doc_id", "text", "source"))
      .count() === 0L)
    // shard count targets total_chars / target, and no shard is empty
    val totalChars = d.agg(sum(length(col("text")))).head().getLong(0)
    val expectShards = math.max(1L, math.ceil(totalChars / 4096.0).toLong)
    val perShard = back.groupBy("shard").count()
    assert(perShard.count() <= expectShards,
      "hash routing cannot invent shards beyond the computed count")
    // determinism: a second export of the same corpus routes every
    // document to the same shard
    val out2 = Export.shardedJsonl(d, "doc_id", "text",
      Seq("doc_id", "text", "source"), targetChars = 4096L)
    val back2 = Export.readShardedJsonl(spark, out2, schema)
    assert(back.select("doc_id", "shard")
      .exceptAll(back2.select("doc_id", "shard")).count() === 0L)
    back.unpersist()
  }

  test("sharded JSONL export honors a caller-supplied base path (cluster hand-off seam)") {
    import graft.core.Tables
    import graft.ops.Export
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val target = java.nio.file.Files
      .createTempDirectory("graft_explicit_out").toString
    val out = Export.shardedJsonl(d, "doc_id", "text",
      Seq("doc_id", "text", "source"), targetChars = 4096L,
      basePath = Some(target))
    // the sink writes exactly where it was told, not a private temp dir
    assert(out === target)
    val schema = "doc_id LONG, text STRING, source STRING, shard INT"
    val back = Export.readShardedJsonl(spark, target, schema)
    assert(back.count() === d.count())
    assert(back.select("doc_id", "text", "source")
      .exceptAll(d).count() === 0L)
    // explicit-path routing is identical to the default-path routing
    val defOut = Export.shardedJsonl(d, "doc_id", "text",
      Seq("doc_id", "text", "source"), targetChars = 4096L)
    val defBack = Export.readShardedJsonl(spark, defOut, schema)
    assert(back.select("doc_id", "shard")
      .exceptAll(defBack.select("doc_id", "shard")).count() === 0L)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(target))
  }

  test("sharded JSONL export: the size-gated shard clustering branch is content-identical") {
    import graft.core.Tables
    import graft.ops.Export
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val schema = "doc_id LONG, text STRING, source STRING, shard INT"
    // threshold 0 forces the cluster-scale branch (repartition by shard
    // before the partitioned write); Long.MaxValue pins the small-input
    // single-pass branch — the sf-default path the bench times
    val clustered = Export.readShardedJsonl(spark,
      Export.shardedJsonl(d, "doc_id", "text",
        Seq("doc_id", "text", "source"), targetChars = 4096L,
        clusterThresholdBytes = 0L), schema)
    val direct = Export.readShardedJsonl(spark,
      Export.shardedJsonl(d, "doc_id", "text",
        Seq("doc_id", "text", "source"), targetChars = 4096L,
        clusterThresholdBytes = Long.MaxValue), schema)
    // identical multiset of (row, shard) — clustering only moves rows
    // between write tasks, never between shards
    assert(clustered.exceptAll(direct).count() === 0L)
    assert(direct.exceptAll(clustered).count() === 0L)
    assert(clustered.count() === d.count())
  }
}
