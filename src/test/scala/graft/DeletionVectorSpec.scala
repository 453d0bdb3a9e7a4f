package graft

import org.apache.spark.sql.functions._

import graft.core.{DeletionVectors, DeltaExport}

/** Deletion-vector consumer tests: the Z85/roaring codecs against
  * hand-built bytes, the end-to-end read of hand-built DV commits
  * (inline and on-disk), CDC over a DV-only change, and the loud
  * by-name refusals (column mapping, unknown reader features, writes
  * against DV tables). graft never WRITES DVs into real tables — the
  * writer-side helpers here exist only to build protocol-shaped
  * fixtures, which is exactly the cross-implementation posture the
  * reader needs. */
class DeletionVectorSpec extends SparkTestBase {
  import spark.implicits._

  test("Z85 round-trips and rejects junk") {
    val bytes = Array.tabulate(32)(i => (i * 37 + 11).toByte)
    assert(DeletionVectors.z85decode(
      DeletionVectors.z85encode(bytes)).toSeq === bytes.toSeq)
    // the all-zero and all-ff words exercise the alphabet's edges
    assert(DeletionVectors.z85decode(DeletionVectors.z85encode(
      Array[Byte](0, 0, 0, 0, -1, -1, -1, -1))).toSeq ===
      Seq[Byte](0, 0, 0, 0, -1, -1, -1, -1))
    intercept[IllegalArgumentException](DeletionVectors.z85decode("abc"))
    intercept[IllegalArgumentException](DeletionVectors.z85decode("ab\"de"))
  }

  test("portable roaring round-trips across 16-bit keys and 32-bit bitmap boundaries") {
    val positions = Seq(0L, 2L, 5L, 65535L, 65536L, 131072L + 7L,
      (1L << 32) + 3L, (1L << 32) + 70000L, (3L << 32) + 1L)
    val got = DeletionVectors.deserializePortable(
      DeletionVectors.serializePortable(positions))
    assert(got.toSeq === positions.sorted)
    // empty vector
    assert(DeletionVectors.deserializePortable(
      DeletionVectors.serializePortable(Seq.empty)).isEmpty)
  }

  test("roaring decode handles run and bitmap containers a real writer emits") {
    // hand-build: magic + 1 bitmap, SERIAL_COOKIE (runs), 2 containers:
    //   key 0 = run container {[10..12], [100..100]}
    //   key 1 = bitmap container (card 4097: values 0..4096)
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >>> 16) }
    w32(1681511377); w32(1); w32(0)           // magic, count=1 (as i64le)
    w32(12347 | (1 << 16))                    // cookie: 2 containers
    w8(0x01)                                  // run flags: container 0 runs
    w16(0); w16(4 - 1)                        // key 0, card 4
    w16(1); w16(4097 - 1)                     // key 1, card 4097
    // < 4 containers with the run cookie → NO offset header
    w16(2); w16(10); w16(2); w16(100); w16(0) // runs: [10,12], [100,100]
    (0 until 1024).foreach { w =>             // bitmap: bits 0..4096 set
      val base = w * 64L
      var word = 0L
      (0 until 64).foreach { b =>
        if (base + b <= 4096) word |= (1L << b)
      }
      w32(word.toInt); w32((word >>> 32).toInt)
    }
    val got = DeletionVectors.deserializePortable(bos.toByteArray).toSeq
    val expect = (Seq(10L, 11L, 12L, 100L) ++
      (0L to 4096L).map(v => (1L << 16) | v)).sorted
    assert(got === expect)
  }

  test("inline DV: deleted positions vanish from the read, remain in time travel, classify as CDC deletes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dv_inline").toString
    // one sorted single-partition file: row position == id - 1
    val d = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("id", "s").repartition(1).sortWithinPartitions("id")
    DeltaExport.writeDeltaTable(spark, d, dir)
    val file = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    val dvBytes = DeletionVectors.serializePortable(Seq(0L, 2L))
    val desc = DeletionVectors.Descriptor("i",
      DeletionVectors.z85encode(dvBytes), None, dvBytes.length.toLong, 2L)
    val commit = Seq(
      """{"commitInfo":{"timestamp":1,"operation":"DELETE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"add":{"path":"$file","partitionValues":{},"size":${new java.io.File(dir, file).length},"modificationTime":1,"dataChange":true,"deletionVector":${DeletionVectors.descriptorJson(desc)}}}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000001.json"),
      (commit.mkString("\n") + "\n").getBytes("UTF-8"))
    // positions 0 and 2 (ids 1 and 3) are logically deleted
    assert(DeltaExport.readDeltaTable(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L, 4L, 5L))
    // v0 time travel still sees every row
    assert(DeltaExport.readDeltaTable(spark, dir, Some(0L)).count() === 5L)
    // CDC: the DV-only change reads as two row-level deletes
    val cdc = DeltaExport.deltaChangesBetween(spark, dir, 0L, 1L, Seq("id"))
      .select("id", "_change_type").as[(Long, String)].collect().sorted.toSeq
    assert(cdc === Seq((1L, "delete"), (3L, "delete")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("on-disk DV (uuid storage): framed file reads back, corrupted checksum fails loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dv_file").toString
    val d = (1L to 50L).map(i => (i, s"row $i"))
      .toDF("id", "s").repartition(1).sortWithinPartitions("id")
    DeltaExport.writeDeltaTable(spark, d, dir)
    val file = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    // delete even positions (ids 2,4,…,50 → positions 1,3,…,49)
    val positions = (1L to 49L by 2L).toSeq
    val desc = DeletionVectors.writeDvFile(dir, positions)
    val commit = Seq(
      """{"commitInfo":{"timestamp":1,"operation":"DELETE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      s"""{"add":{"path":"$file","partitionValues":{},"size":${new java.io.File(dir, file).length},"modificationTime":1,"dataChange":true,"deletionVector":${DeletionVectors.descriptorJson(desc)}}}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_delta_log", "00000000000000000001.json"),
      (commit.mkString("\n") + "\n").getBytes("UTF-8"))
    val got = DeltaExport.readDeltaTable(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (1L to 49L by 2L).toSeq)
    // flip one bitmap byte inside the framing: CRC must catch it
    val dvFile = new java.io.File(dir).listFiles()
      .map(_.getName).find(_.startsWith("deletion_vector_")).get
    val p = java.nio.file.Paths.get(dir, dvFile)
    val bytes = java.nio.file.Files.readAllBytes(p)
    bytes(7) = (bytes(7) ^ 0x5a).toByte
    java.nio.file.Files.write(p, bytes)
    val e = intercept[Exception](
      DeltaExport.readDeltaTable(spark, dir).count())
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).map(_.getMessage).mkString(" ").contains("checksum"),
      e.toString)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("unsupported protocols refuse BY NAME; writes against DV tables refuse by name") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dv_refuse").toString
    val d = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(1).sortWithinPartitions("id")
    DeltaExport.writeDeltaTable(spark, d, dir)
    def writeCommit(v: Int, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    // reader v2 (column mapping) is SUPPORTED since round 16 — with no
    // mapping configured the table reads as-is (ColumnMappingSpec holds
    // the mapped-read and id-mode/nested refusal coverage)
    writeCommit(1, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""))
    assert(DeltaExport.readDeltaTable(spark, dir).count() === 2L)
    // v3 with a feature beyond deletionVectors — named
    writeCommit(1, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","v2Checkpoint"]}}"""))
    val vf = intercept[IllegalArgumentException](
      DeltaExport.readDeltaTable(spark, dir))
    assert(vf.getMessage.contains("v2Checkpoint"), vf.getMessage)
    // a DV table: reads fine, every mutator refuses naming the feature
    val file = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    val dvBytes = DeletionVectors.serializePortable(Seq(0L))
    val desc = DeletionVectors.Descriptor("i",
      DeletionVectors.z85encode(dvBytes), None, dvBytes.length.toLong, 1L)
    writeCommit(1, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      s"""{"add":{"path":"$file","partitionValues":{},"size":${new java.io.File(dir, file).length},"modificationTime":1,"dataChange":true,"deletionVector":${DeletionVectors.descriptorJson(desc)}}}"""))
    assert(DeltaExport.readDeltaTable(spark, dir)
      .select("id").as[Long].collect().sorted.toSeq === Seq(2L))
    for ((name, op) <- Seq[(String, () => Any)](
        ("merge", () => DeltaExport.mergeDeltaTable(spark,
          Seq((2L, "x")).toDF("id", "s"), dir, Seq("id"))),
        ("optimize", () => DeltaExport.optimizeDeltaTable(spark, dir)),
        ("checkpoint", () => DeltaExport.checkpointDeltaTable(spark, dir)),
        ("restore", () => DeltaExport.restoreDeltaTable(spark, dir, 0L)),
        ("appendsSince", () =>
          DeltaExport.readDeltaAppendsSince(spark, dir, 0L).count()))) {
      val e = intercept[Exception](op())
      assert(e.getMessage.contains("DELETION VECTOR"), s"$name: ${e.getMessage}")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
