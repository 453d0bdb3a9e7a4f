package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Best-effort Delta Lake interchange: write a dataset as a
  * STRUCTURALLY VALID Delta table — a parquet directory plus a
  * `_delta_log/00000000000000000000.json` commit holding the protocol,
  * metaData and add actions the public Delta transaction protocol
  * (delta-io PROTOCOL.md) specifies for an initial commit. Delta's
  * `schemaString` IS the Spark StructType JSON, so the schema carries
  * over without any Delta library.
  *
  * Honest scope (SURVEY §1.5 / VERDICT "what's missing" #1): no Delta
  * client exists in this sandbox (zero egress — no delta-spark jar, no
  * DuckDB delta extension), so cross-engine readability cannot be
  * DEMONSTRATED here. What the spec pins instead is structural
  * fidelity: every data file in the directory has exactly one `add`
  * action with the correct byte size, the protocol versions are the
  * minimal reader/writer pair for a plain append table, the
  * schemaString round-trips through `DataType.fromJson` to the written
  * DataFrame's schema, and scanning exactly the `add`-listed files
  * reproduces the dataset. Those are the properties a real Delta
  * reader checks first.
  *
  * Scale shape: the data write is an ordinary distributed parquet
  * write; only the log (one JSON line per file + 2 header actions) is
  * driver-side — the same O(files) metadata cost every Delta writer
  * pays. */
object DeltaExport {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Top-level parquet DATA files of `dir` (regular files only — a
    * planted `*.parquet` directory or a hidden/_delta_log entry is not
    * a data file), name-sorted so commit logs are deterministic. */
  private def dataFiles(dir: String): Seq[java.nio.file.Path] = {
    val files = Files.list(Paths.get(dir))
    try {
      val b = Seq.newBuilder[java.nio.file.Path]
      val it = files.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.endsWith(".parquet") && !n.startsWith(".") &&
            Files.isRegularFile(p)) b += p
      }
      b.result().sortBy(_.getFileName.toString)
    } finally files.close()
  }

  private def commitFile(v: Long): String = f"$v%020d.json"

  private def addAction(p: java.nio.file.Path, now: Long): String =
    s"""{"add":{"path":"${esc(p.getFileName.toString)}","partitionValues":{},"size":${Files
        .size(p)},"modificationTime":$now,"dataChange":true}}"""

  /** Write `df` under `dir` as an unpartitioned Delta table (version 0
    * commit). Returns the number of `add` actions written. */
  def writeDeltaTable(spark: SparkSession, df: DataFrame, dir: String): Int = {
    df.write.mode("overwrite").parquet(dir)
    val parts = dataFiles(dir)
    val now = System.currentTimeMillis()
    val protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val metaData =
      s"""{"metaData":{"id":"${java.util.UUID.nameUUIDFromBytes(
          dir.getBytes(StandardCharsets.UTF_8))}","format":{"provider":"parquet","options":{}},"schemaString":"${esc(
          df.schema.json)}","partitionColumns":[],"configuration":{},"createdTime":$now}}"""
    val adds = parts.map(addAction(_, now))
    val logDir = Paths.get(dir).resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(commitFile(0L)),
      ((protocol +: metaData +: adds).mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    adds.size
  }

  /** Sorted commit versions present in `dir`'s log. */
  def logVersions(dir: String): Seq[Long] = {
    val logDir = Paths.get(dir, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $dir")
    val files = Files.list(logDir)
    try {
      val b = Seq.newBuilder[Long]
      val it = files.iterator()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.endsWith(".json")) b += n.stripSuffix(".json").toLong
      }
      b.result().sorted
    } finally files.close()
  }

  private def writeCommit(dir: String, v: Long, actions: Seq[String]): Unit =
    Files.write(Paths.get(dir, "_delta_log", commitFile(v)),
      (actions.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))

  /** Append `df` to an existing Delta table as the next commit: write
    * the new parquet files beside the old ones (append mode — Delta
    * never rewrites committed data files) and log one `add` per new
    * file. Per the protocol, an append commit carries no protocol or
    * metaData action — those are inherited from the last commit that
    * set them. Returns the new version number.
    *
    * The before/after directory diff that identifies the new files is
    * driver-side METADATA (file names only), the same O(new files)
    * bookkeeping every Delta writer performs when it collects the
    * task-level write results into add actions. */
  def appendDeltaTable(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val v = logVersions(dir).max + 1
    val before = dataFiles(dir).map(_.getFileName.toString).toSet
    df.write.mode("append").parquet(dir)
    val fresh = dataFiles(dir).filterNot(p => before(p.getFileName.toString))
    require(fresh.nonEmpty, "append produced no data files")
    val now = System.currentTimeMillis()
    writeCommit(dir, v, fresh.map(addAction(_, now)))
    v
  }

  /** Replace the table's contents as the next commit: `remove` every
    * currently-live file and `add` the replacement files. The OLD data
    * files stay on disk — that is what makes time travel
    * ([[readDeltaTable]] with `versionAsOf`) work; only a vacuum may
    * reclaim them. Returns the new version number. */
  def overwriteDeltaTable(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val v = logVersions(dir).max + 1
    val live = liveFilesAt(dir, None)._2.toSet
    val before = dataFiles(dir).map(_.getFileName.toString).toSet
    df.write.mode("append").parquet(dir)
    val fresh = dataFiles(dir).filterNot(p => before(p.getFileName.toString))
    require(fresh.nonEmpty, "overwrite produced no data files")
    val now = System.currentTimeMillis()
    val removes = live.toSeq.sorted.map(p =>
      s"""{"remove":{"path":"${esc(p)}","deletionTimestamp":$now,"dataChange":true}}""")
    writeCommit(dir, v, removes ++ fresh.map(addAction(_, now)))
    v
  }

  /** Parse a [[writeDeltaTable]] log back into its action lines,
    * grouped — the structural-fidelity check surface. Returns
    * (protocolLines, metaDataLines, addPathsWithSizes). */
  def readDeltaLog(dir: String): (Seq[String], Seq[String], Seq[(String, Long)]) = {
    val log = Paths.get(dir, "_delta_log", "00000000000000000000.json")
    val lines = new String(Files.readAllBytes(log), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
    val protocol = lines.filter(_.startsWith("""{"protocol""""))
    val meta = lines.filter(_.startsWith("""{"metaData""""))
    val addRe = """\{"add":\{"path":"([^"]+)","partitionValues":\{\},"size":(\d+)""".r
    val adds = lines.collect {
      case l if l.startsWith("""{"add"""") =>
        addRe.findFirstMatchIn(l)
          .map(m => (m.group(1), m.group(2).toLong))
          .getOrElse(throw new IllegalStateException(s"malformed add: $l"))
    }
    (protocol, meta, adds)
  }

  /** Vacuum with retention 0: physically delete the data files that
    * are no longer live at the LATEST version (the superseded
    * history), keeping the log intact — exactly Delta's trade: the
    * latest snapshot is untouched, but time travel to a version whose
    * snapshot needs a deleted file now fails loudly at read time
    * ([[readDeltaTable]]'s existence check names the missing files).
    * Returns the deleted file names. Driver-side METADATA only — the
    * same O(files) listing every Delta vacuum performs. */
  def vacuumDeltaTable(dir: String): Seq[String] = {
    val live = liveFilesAt(dir, None)._2.toSet
    val stale = dataFiles(dir).filterNot(p => live(p.getFileName.toString))
    stale.foreach(Files.delete)
    stale.map(_.getFileName.toString)
  }

  /** Replay the commit log through `versionAsOf` (latest when None)
    * and return (last metaData line seen, live file paths): `add`
    * inserts a path into the live set, `remove` deletes it, later
    * metaData supersedes earlier — the snapshot-reconstruction rule of
    * the Delta protocol. Every protocol action encountered must be one
    * this reader supports (minReaderVersion 1). */
  def liveFilesAt(dir: String, versionAsOf: Option[Long]): (String, Seq[String]) = {
    val versions = logVersions(dir)
    require(versions.headOption.contains(0L), s"log does not start at 0: $versions")
    val cut = versionAsOf.getOrElse(versions.max)
    require(versions.contains(cut),
      s"version $cut not in log (have ${versions.mkString(",")})")
    val removeRe = """\{"remove":\{"path":"((?:[^"\\]|\\.)+)"""".r
    val addRe = """\{"add":\{"path":"((?:[^"\\]|\\.)+)"""".r
    var meta: String = null
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    versions.takeWhile(_ <= cut).foreach { v =>
      val lines = new String(
        Files.readAllBytes(Paths.get(dir, "_delta_log", commitFile(v))),
        StandardCharsets.UTF_8).split("\n").toSeq.filter(_.nonEmpty)
      lines.foreach { l =>
        if (l.startsWith("""{"protocol""""))
          require(l.contains(""""minReaderVersion":1"""),
            s"unsupported reader protocol at v$v: $l")
        else if (l.startsWith("""{"metaData"""")) meta = l
        else if (l.startsWith("""{"add""""))
          live += addRe.findFirstMatchIn(l)
            .getOrElse(throw new IllegalStateException(s"malformed add: $l"))
            .group(1)
        else if (l.startsWith("""{"remove""""))
          live -= removeRe.findFirstMatchIn(l)
            .getOrElse(throw new IllegalStateException(s"malformed remove: $l"))
            .group(1)
      }
    }
    require(meta != null, "no metaData action in the replayed log")
    (meta, live.toSeq)
  }

  /** Read a Delta table THROUGH ITS LOG — the consumer side of the
    * protocol: verify every protocol action is one this reader
    * supports (minReaderVersion 1), reconstruct the live-file snapshot
    * at `versionAsOf` (latest when None) by replaying add/remove
    * actions in commit order, parse the governing metaData's
    * schemaString into a StructType, and scan exactly the live files
    * with that schema. Never lists the directory for data files — a
    * Delta reader trusts the log, not the filesystem, which is what
    * makes stale, torn, or superseded data files invisible
    * (TableStoreSpec pins both: a planted orphan parquet file the read
    * must NOT surface, and time travel across append + overwrite
    * commits). */
  def readDeltaTable(spark: SparkSession, dir: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val (meta, files) = liveFilesAt(dir, versionAsOf)
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(schemaStringOf(meta))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    require(files.nonEmpty,
      s"no live files at version ${versionAsOf.getOrElse("latest")}")
    val gone = files.filterNot(f =>
      Files.isRegularFile(Paths.get(dir, f)))
    require(gone.isEmpty,
      s"snapshot at version ${versionAsOf.getOrElse("latest")} is no longer " +
        s"reconstructible — add-listed file(s) vacuumed or missing: " +
        gone.mkString(", "))
    spark.read.schema(schema).parquet(files.map(f => s"$dir/$f"): _*)
  }

  /** Extract the schemaString from the metaData action (JSON-unescaped)
    * so callers can `DataType.fromJson` it. */
  def schemaStringOf(metaDataLine: String): String = {
    val re = """"schemaString":"((?:[^"\\]|\\.)*)"""".r
    val raw = re.findFirstMatchIn(metaDataLine)
      .getOrElse(throw new IllegalStateException("no schemaString")).group(1)
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      raw(i) match {
        case '\\' if i + 1 < raw.length =>
          raw(i + 1) match {
            case '"'  => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case 'n'  => sb += '\n'; i += 2
            case 'r'  => sb += '\r'; i += 2
            case 't'  => sb += '\t'; i += 2
            case 'u' =>
              sb += Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }
}
