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

  /** Write `df` under `dir` as an unpartitioned Delta table (version 0
    * commit). Returns the number of `add` actions written. */
  def writeDeltaTable(spark: SparkSession, df: DataFrame, dir: String): Int = {
    df.write.mode("overwrite").parquet(dir)
    val base = Paths.get(dir)
    val files = Files.list(base)
    val parts =
      try {
        val b = Seq.newBuilder[java.nio.file.Path]
        val it = files.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.endsWith(".parquet") && !n.startsWith(".")) b += p
        }
        b.result().sortBy(_.getFileName.toString)
      } finally files.close()
    val now = System.currentTimeMillis()
    val protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val metaData =
      s"""{"metaData":{"id":"${java.util.UUID.nameUUIDFromBytes(
          dir.getBytes(StandardCharsets.UTF_8))}","format":{"provider":"parquet","options":{}},"schemaString":"${esc(
          df.schema.json)}","partitionColumns":[],"configuration":{},"createdTime":$now}}"""
    val adds = parts.map { p =>
      s"""{"add":{"path":"${esc(p.getFileName.toString)}","partitionValues":{},"size":${Files
          .size(p)},"modificationTime":$now,"dataChange":true}}"""
    }
    val logDir = base.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve("00000000000000000000.json"),
      ((protocol +: metaData +: adds).mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    adds.size
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

  /** Read a Delta table THROUGH ITS LOG — the consumer side of the
    * protocol: verify the protocol action is one this reader supports
    * (minReaderVersion 1), parse the metaData's schemaString into a
    * StructType, and scan exactly the add-listed files with that
    * schema. Never lists the directory for data files — a Delta reader
    * trusts the log, not the filesystem, which is what makes stale or
    * torn data files invisible (the property TableStoreSpec pins by
    * planting an orphan parquet file the read must NOT surface). */
  def readDeltaTable(spark: SparkSession, dir: String): DataFrame = {
    val (protocol, meta, adds) = readDeltaLog(dir)
    require(protocol.exists(_.contains(""""minReaderVersion":1""")),
      s"unsupported reader protocol: $protocol")
    require(meta.size == 1, s"expected one metaData action, got ${meta.size}")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(schemaStringOf(meta.head))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    require(adds.nonEmpty, "no add actions in the commit")
    spark.read.schema(schema)
      .parquet(adds.map(a => s"$dir/${a._1}"): _*)
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
