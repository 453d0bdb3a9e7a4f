package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.core.Tables
import graft.streaming.EventPipeline

/** Data-contract canary: opens the DRIVER's real events.parquet — not a
  * self-staged fixture — through BOTH the batch and streaming readers and
  * asserts the decoded timeline lands in the fixture's documented epoch
  * range (FIXTURES.md: ts from 2024-01-01, ~150-day span). A physical
  * re-encoding of the upstream table (the nanos→micros vintage change
  * that broke round 10) fails HERE, loudly, instead of letting
  * self-consistent staged-fixture round-trips stay green around a broken
  * product path. */
class DataContractSpec extends SparkTestBase {

  private val epochLo = java.sql.Timestamp.valueOf("2023-12-31 00:00:00")
  private val epochHi = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")

  private def assertTimeline(mn: java.sql.Timestamp, mx: java.sql.Timestamp,
      who: String): Unit = {
    assert(mn.after(epochLo) && mn.before(epochHi),
      s"$who min(ts)=$mn outside the documented 2024 epoch — " +
        "physical timestamp contract broke")
    assert(mx.after(epochLo) && mx.before(epochHi),
      s"$who max(ts)=$mx outside the documented 2024 epoch")
    // fixture timeline is ~30 days; a vintage mixup divides by 1000 and
    // collapses it to ~43 minutes, so a 7-day floor discriminates cleanly
    val spanDays = (mx.getTime - mn.getTime) / 86400000L
    assert(spanDays >= 7L,
      s"$who timeline spans only $spanDays days — a collapsed timeline " +
        "means the reader divided an already-micros encoding")
  }

  test("batch reader decodes the driver's events.parquet into the 2024 epoch") {
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType === TimestampType,
      "loadEvents must always surface session-zone TimestampType")
    val r = ev.agg(min("ts"), max("ts")).head()
    assertTimeline(r.getTimestamp(0), r.getTimestamp(1), "batch")
  }

  test("streaming reader decodes the driver's events.parquet into the 2024 epoch") {
    val sink = s"t_canary_${System.nanoTime()}"
    val out = EventPipeline.runToMemorySink(spark, sfDir, sink,
      df => df.agg(min("ts").as("mn"), max("ts").as("mx"), count(lit(1)).as("n")))
    val r = out.head()
    assert(r.getLong(2) > 0L)
    assertTimeline(r.getTimestamp(0), r.getTimestamp(1), "streaming")
  }

  test("both vintages decode identically: staged int64-nanos == native micros") {
    val native = Tables.load(spark, sfDir, "events")
    val staged = EventPipeline.stageAsStreamDir(native) // writes int64 nanos
    val sink = s"t_vintage_${System.nanoTime()}"
    val replayed = EventPipeline.runToMemorySink(spark, staged, sink,
      identity, org.apache.spark.sql.streaming.OutputMode.Append())
    assert(replayed.schema("ts").dataType === TimestampType)
    assert(replayed.count() === native.count())
    assert(native.exceptAll(replayed.select(native.columns.map(col).toIndexedSeq: _*))
      .count() === 0L, "legacy-nanos replay decoded to different instants")
  }

  test("cross-vintage reads fail loudly, never return corrupt rows") {
    // native micros dir through the pinned nanos wire schema: the r10
    // silent-corruption path (q37 collapsed to 5 rows) must now throw
    // up front, before the stream starts
    val e1 = intercept[IllegalArgumentException] {
      EventPipeline.readEventStream(spark, sfDir,
        schema = EventPipeline.eventSchema)
    }
    assert(e1.getMessage.contains("vintage mismatch"))
    // and the mirror image: staged int64-nanos files through a pinned
    // native-timestamp schema
    val staged = EventPipeline.stageAsStreamDir(
      Tables.load(spark, sfDir, "events").limit(10))
    val nativeSchema = StructType(EventPipeline.eventSchema.fields.map(f =>
      if (f.name == "ts") StructField("ts", TimestampType) else f))
    val e2 = intercept[IllegalArgumentException] {
      EventPipeline.readEventStream(spark, staged, schema = nativeSchema)
    }
    assert(e2.getMessage.contains("vintage mismatch"))
  }

  test("pinned-schema stream starts on an empty directory, then adopts the first file") {
    // the normal state for the Kafka-topic stand-in before the first
    // file lands: a pinned wire contract must let the stream START on an
    // empty dir (no footer to infer), and the vintage guard defers until
    // files exist rather than failing stream-start with AnalysisException
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_stream")
    val sink = s"t_empty_${System.nanoTime()}"
    val q = EventPipeline.readEventStream(spark, dir.toString,
        schema = EventPipeline.eventSchema)
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 0L, "empty dir streams zero rows")
      val staged = EventPipeline.stageAsStreamDir(
        Tables.load(spark, sfDir, "events").limit(5))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(staged, "events.parquet"),
        dir.resolve("events.parquet"))
      q.processAllAvailable()
      assert(spark.table(sink).count() === 5L,
        "rows from the first landed file flow through the pinned contract")
    } finally q.stop()
    // schema=null on an empty dir still fails (nothing to infer a
    // schema from) — only the pinned-contract path gained the fallback
    intercept[Exception] {
      val d2 = java.nio.file.Files.createTempDirectory("graft_empty2")
      EventPipeline.readEventStream(spark, d2.toString)
    }
  }

  test("explicit legacy wire schema still decodes staged fixtures") {
    val native = Tables.load(spark, sfDir, "events")
    val staged = EventPipeline.stageAsStreamDir(native)
    assert(EventPipeline.inferEventSchema(spark, staged)("ts").dataType === LongType,
      "stageAsStreamDir stages the int64-nanos vintage")
    val sink = s"t_wire_${System.nanoTime()}"
    val q = EventPipeline.readEventStream(spark, staged,
        schema = EventPipeline.eventSchema)
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val r = spark.table(sink).agg(min("ts"), max("ts")).head()
    assertTimeline(r.getTimestamp(0), r.getTimestamp(1), "legacy-wire")
  }
}
