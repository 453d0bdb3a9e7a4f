package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, SketchExpressions}

/** The SparkSessionExtensions registration path: a session built with
  * GraftExtensions can call the custom sketch expressions from pure SQL,
  * and the SQL results equal the Column-API results. The extension
  * session is created (and its default-session slot restored) explicitly
  * — getOrCreate would silently reuse the shared test session and skip
  * extension wiring. */
class ExtensionsSpec extends SparkTestBase {

  private def withExtensionSession[T](f: SparkSession => T): T = {
    val base = spark // force shared session creation first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val extended = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(extended)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("custom sketch functions resolve and compute through spark.sql") {
    withExtensionSession { s =>
      val row = s.sql(
        """SELECT
          |  minhash_signature(array(xxhash64('a'), xxhash64('b')), 4) AS mh,
          |  simhash64(array(xxhash64('a'), xxhash64('b'))) AS sh,
          |  shingle_hashes(array(xxhash64('a'), xxhash64('b'), xxhash64('c')), 2) AS sg
          |""".stripMargin).head()
      // same values through the Column API on the shared session
      val viaApi = spark.range(1).select(
        SketchExpressions.minhashSignature(
          array(xxhash64(lit("a")), xxhash64(lit("b"))), 4).as("mh"),
        SketchExpressions.simhash64(
          array(xxhash64(lit("a")), xxhash64(lit("b")))).as("sh"),
        SketchExpressions.shingleHashes(
          array(xxhash64(lit("a")), xxhash64(lit("b")), xxhash64(lit("c"))), 2).as("sg"))
        .head()
      assert(row.getSeq[Long](0) === viaApi.getSeq[Long](0))
      assert(row.getLong(1) === viaApi.getLong(1))
      assert(row.getSeq[Long](2) === viaApi.getSeq[Long](2))
    }
  }

  test("vector kernels resolve through spark.sql with exact values") {
    withExtensionSession { s =>
      val row = s.sql(
        """SELECT
          |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp,
          |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs
          |""".stripMargin).head()
      assert(row.getDouble(0) === 32.0)
      assert(row.getDouble(1) === 1.0)
    }
  }

  test("jaro_winkler and nearest-index kernels resolve through spark.sql") {
    withExtensionSession { s =>
      val row = s.sql(
        """SELECT
          |  jaro_winkler('MARTHA', 'MARHTA') AS jw,
          |  nearest_cosine_index(array(1.0D, 0.0D),
          |    array(array(0.0D, 1.0D), array(1.0D, 0.1D))) AS nc,
          |  nearest_l2_index(array(1.0D, 0.0D),
          |    array(array(0.9D, 0.0D), array(5.0D, 5.0D))) AS nl
          |""".stripMargin).head()
      // published Winkler value for MARTHA/MARHTA
      assert(math.abs(row.getDouble(0) - 0.9611) < 1e-3)
      assert(row.getInt(1) === 1)
      assert(row.getInt(2) === 0)
    }
  }

  test("gram_strings resolves via SQL and is value-identical to the HOF gram builder") {
    withExtensionSession { s =>
      val row = s.sql("SELECT gram_strings(array('a','b','c','d'), 2) AS g")
        .head()
      assert(row.getSeq[String](0) === Seq("a b", "b c", "c d"))
      assert(s.sql("SELECT gram_strings(array('a'), 3) AS g")
        .head().getSeq[String](0).isEmpty)
    }
    // parity over real fixture docs for every n the diversity scan uses
    val ts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(lower(col("text"))).as("ts"))
    Seq(1, 2, 3).foreach { n =>
      val hof = ts.select(col("doc_id"),
        when(size(col("ts")) >= n,
          transform(sequence(lit(1), size(col("ts")) - (n - 1)),
            i => concat_ws(" ", slice(col("ts"), i, lit(n)))))
          .otherwise(array().cast("array<string>")).as("g"))
      val fast = ts.select(col("doc_id"),
        SketchExpressions.gramStrings(col("ts"), n).as("g"))
      assert(fast.exceptAll(hof).count() === 0L, s"n=$n")
      assert(hof.exceptAll(fast).count() === 0L, s"n=$n")
    }
  }

  test("gopher_stats fused scan: compiled flags are value-identical to the HOF battery over the injected corpus and edge shapes") {
    import graft.ops.TextAnalysis
    // the q142 injection: every rule's trigger present in the corpus
    val injected = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("t2", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          lit(" # # # # # # # # # # # #")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit(" " + (0 to 29).mkString(" "))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\n- x" * 10)).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit("\nto be continued...")).otherwise(lit(""))))
      .select(col("doc_id"), col("t2"))
    val edges = Seq("", " ", "   \n  ", "...", ".....", "......",
      "the THE tHe", "\n\n\n", "• bullet\n* star\n- dash",
      "a...\nb... \nc.. .", "word\tword", "- \n-x\n -  y",
      "to be or not to be", "# ##", "ab...cd...ef").zipWithIndex
      .map { case (t, i) => (-(i + 1).toLong, t) }
    import spark.implicits._
    val all = injected.unionAll(edges.toDF("doc_id", "t2"))
    val hof = all.select(col("doc_id"),
      TextAnalysis.gopherFlags(col("t2")).as("g"))
    val fast = all.select(col("doc_id"),
      TextAnalysis.gopherFlagsCompiled(col("t2")).as("g"))
    assert(fast.schema === hof.schema)
    assert(fast.exceptAll(hof).count() === 0L)
    assert(hof.exceptAll(fast).count() === 0L)
    // SQL registration: the counters resolve through spark.sql too
    withExtensionSession { s =>
      val r = s.sql(
        "SELECT gopher_stats('the quick fox... #tag\n- b') AS g").head()
        .getStruct(0)
      assert(r.getAs[Long]("n_words") === 6L)   // incl '#tag', '-', 'b'
      assert(r.getAs[Long]("n_lines") === 2L)
      assert(r.getAs[Long]("bullet_lines") === 1L)
      assert(r.getAs[Long]("hash_chars") === 1L)
      assert(r.getAs[Long]("ellipsis_runs") === 1L)
      assert(r.getAs[Long]("stop_hits") === 1L) // 'the'
    }
  }

  test("winnow_fingerprints resolves through spark.sql and matches the Column API") {
    withExtensionSession { s =>
      val viaSql = s.sql(
        """SELECT winnow_fingerprints(
          |  array(xxhash64('a'), xxhash64('b'), xxhash64('c'),
          |        xxhash64('d'), xxhash64('e'), xxhash64('f')), 3, 2) AS fp
          |""".stripMargin).head().getSeq[org.apache.spark.sql.Row](0)
      val viaApi = spark.range(1).select(
        SketchExpressions.winnowFingerprints(
          array(Seq("a", "b", "c", "d", "e", "f")
            .map(t => xxhash64(lit(t))): _*), 3, 2).as("fp"))
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(viaSql.map(r => (r.getLong(0), r.getInt(1))) ===
        viaApi.map(r => (r.getLong(0), r.getInt(1))))
      assert(viaApi.nonEmpty)
    }
  }

  test("gram_strings rejects null tokens loudly instead of corrupting grams") {
    withExtensionSession { s =>
      // k=1 would otherwise pass the null into a containsNull=false array;
      // k>1 would let concatWs silently drop it and shrink the gram
      Seq("SELECT gram_strings(array('a', CAST(NULL AS STRING)), 1)",
          "SELECT gram_strings(array('a', CAST(NULL AS STRING), 'b'), 2)")
        .foreach { q =>
          val e = intercept[Exception] { s.sql(q).collect() }
          def chain(t: Throwable): Seq[Throwable] =
            if (t == null) Nil else t +: chain(t.getCause)
          assert(chain(e).exists(c =>
            c.getMessage != null && c.getMessage.contains("null token")), q)
        }
    }
  }

  test("non-literal sizing argument is rejected with a clear error") {
    withExtensionSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT minhash_signature(array(1L), cast(rand()*4 AS INT))").collect()
      }
      assert(e.getMessage.contains("integer literal"))
    }
  }
}
