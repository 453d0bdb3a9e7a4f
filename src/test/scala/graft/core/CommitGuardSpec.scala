package graft.core

/** The commit primitive's put-if-absent contract (the Delta protocol's
  * one concurrency rule): version N commits atomically or not at all,
  * and a writer that lost the race must surface a named conflict — the
  * default truncating write would silently DESTROY the winner's
  * committed version. Lives in graft.core so it can drive the
  * private[core] primitive directly and deterministically (a
  * thread-race test over the public writers would be flaky AND would
  * conflate this guard with the driver-serial design the writers
  * document). */
class CommitGuardSpec extends graft.SparkTestBase {

  test("logged data paths: scheme-qualified URIs are absolute and resolve verbatim, relative paths join the root") {
    // a foreign shallow clone may log s3://, hdfs://, abfss:// or
    // file: adds — all absolute per RFC 3986; mangling one into
    // "$dir/s3://…" surfaced as a misleading 'vacuumed or missing'
    // error instead of the clone-specific handling (ADVICE r18)
    for (p <- Seq("/abs/part.parquet", "file:///abs/part.parquet",
        "s3://bucket/t/part.parquet", "hdfs://nn:8020/t/part.parquet",
        "abfss://c@a.dfs.core.windows.net/t/part.parquet"))
      assert(DeltaExport.isAbsoluteDataPath(p), p)
    for (p <- Seq("part.parquet", "dt=2024-01-01/part.parquet",
        "year=2024/month=07/part.parquet"))
      assert(!DeltaExport.isAbsoluteDataPath(p), p)
    assert(DeltaExport.resolveDataPath("/root/t",
      "s3://bucket/t/part.parquet") === "s3://bucket/t/part.parquet")
    assert(DeltaExport.resolveDataPath("/root/t",
      "hdfs://nn:8020/t/p.parquet") === "hdfs://nn:8020/t/p.parquet")
    assert(DeltaExport.resolveDataPath("/root/t", "/abs/p.parquet")
      === "/abs/p.parquet")
    assert(DeltaExport.resolveDataPath("/root/t", "file:///abs/p.parquet")
      === "/abs/p.parquet")
    assert(DeltaExport.resolveDataPath("/root/t", "dt=1/p.parquet")
      === "/root/t/dt=1/p.parquet")
  }

  test("writeCommit is put-if-absent: a lost race throws by name and never clobbers the winner") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_commit_guard").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "_delta_log"))
    val winner = Seq(
      """{"add":{"path":"a.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""")
    DeltaExport.writeCommit(dir, 1L, winner, "APPEND")
    val p = java.nio.file.Paths.get(dir, "_delta_log",
      "00000000000000000001.json")
    val committed = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(committed.contains("a.parquet"))
    // the loser: same version, different content — must throw and
    // leave the winner byte-identical
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaExport.writeCommit(dir, 1L, Seq(
        """{"add":{"path":"b.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""),
        "APPEND"))
    assert(e.getMessage.contains("v1") &&
      e.getMessage.contains("another writer"), e.getMessage)
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      === committed, "the committed version was clobbered")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
