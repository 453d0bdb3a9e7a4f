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
