package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Bucketing, Tables}
import graft.ops.Skew
import graft.queries.Relational

/** Physical-plan shape assertions: the scale claims made in the query
  * Scaladoc (pushdown, broadcast, top-k, co-located bucket joins, salted
  * rewrites) asserted against the actual planned operators, so a plan
  * regression fails CI instead of silently costing a shuffle at 100 TB. */
class PlanSpec extends SparkTestBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01 pushes the shipdate filter and prunes columns at the parquet scan") {
    val p = planOf(Relational.q01PricingSummary.run(spark, sfDir))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate"), p)
    // pruned read schema must not include unreferenced wide columns
    assert(!p.contains("l_comment"))
  }

  test("q11 star join broadcasts both dimension tables") {
    val p = planOf(Relational.q11StarJoin.run(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("q10 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = planOf(Relational.q10TopK.run(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bucketed fact-fact join eliminates both exchanges") {
    val orders = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the small test tables take the same
      // sort-merge path the full-scale join would
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(li, "lineitem_b", "l_orderkey", 4)
      val joined = Bucketing.bucketedEquiJoin(
        spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      val p = planOf(joined)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount"), p)
      // and it is the same relation the shuffled join produces
      val direct = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() === direct.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("static partition pruning: a partition-column filter reaches PartitionFilters") {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Bucketing.writePartitioned(ev, "events_p", "day")
    val oneDay = spark.table("events_p").filter(col("day") === "2024-01-05")
    val p = planOf(oneDay)
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("2024-01-05"), p)
    // pruned scan must agree with the unpartitioned filter
    assert(oneDay.count() ===
      ev.filter(col("day") === "2024-01-05").count())
  }

  test("dynamic partition overwrite reprocesses one day without touching others") {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Bucketing.writePartitioned(ev, "events_dpo", "day")
    val day = "2024-01-05"
    val before = spark.table("events_dpo")
    val otherDaysBefore = before.filter(col("day") =!= day).count()
    val dayBefore = before.filter(col("day") === day).count()
    assert(dayBefore > 0L)
    // reprocess the day: same rows with value doubled, derived from the
    // SOURCE (reading the target table during its own overwrite is
    // illegal); insertInto is position-based — keep the table's column
    // order, partition column last
    val cols = spark.table("events_dpo").columns.map(col)
    val reprocessed = ev.filter(col("day") === day)
      .withColumn("value", col("value") * 2)
      .select(cols.toIndexedSeq: _*)
    Bucketing.overwritePartitions(reprocessed, "events_dpo")
    val after = spark.table("events_dpo")
    assert(after.filter(col("day") =!= day).count() === otherDaysBefore)
    assert(after.filter(col("day") === day).count() === dayBefore)
    // the day's data really was replaced
    val expectedSum = reprocessed.agg(sum(col("value"))).head().getDouble(0)
    val actualSum = after.filter(col("day") === day)
      .agg(sum(col("value"))).head().getDouble(0)
    assert(math.abs(actualSum - expectedSum) < 1e-6)
  }

  test("partitioned-upsert merge plan prunes to the touched buckets at planning time") {
    // The read-side half of the partition-scoped upsert sink's O(touched)
    // claim (StreamingSpec proves the write side by file mtimes): the
    // batch's bucket ids must land in the scan's PartitionFilters as a
    // literal IN — a post-scan Filter would still list and read every
    // partition's files.
    import graft.streaming.EventPipeline
    val buckets = 8
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("__bucket", Bucketing.bucketExpr(col("user_id"), buckets))
    Bucketing.writePartitioned(ev, "events_upsert_plan", "__bucket")
    // a batch touching a strict subset of buckets, with no helpful
    // lineage: re-read from a staged file like a real micro-batch
    val stage = java.nio.file.Files.createTempDirectory("graft_plan_batch")
    ev.limit(3).write.mode("overwrite").parquet(stage.toString)
    EventPipeline.registerTempCleanup(stage)
    val incoming = spark.read.parquet(stage.toString)
    val merged = EventPipeline.partitionedMergeFrame(
      spark, "events_upsert_plan", incoming)
    val p = planOf(merged)
    val touched = incoming.select("__bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(touched.nonEmpty && touched.length < buckets,
      s"fixture batch must touch a strict subset of buckets, got ${touched.length}")
    // the table scan's PartitionFilters must carry the touched ids as a
    // planning-time predicate (Catalyst renders a 1-element IN as `=`)
    val pf = """events_upsert_plan.*?PartitionFilters: \[([^\]]*)\]""".r
      .findFirstMatchIn(p).map(_.group(1))
      .getOrElse(fail(s"no PartitionFilters on the table scan:\n$p"))
    assert(pf.contains("__bucket"), pf)
    assert(pf.contains(" IN (") || pf.contains(" = "),
      s"expected a literal bucket predicate, got: $pf")
    touched.foreach(b => assert(pf.contains(b.toString),
      s"bucket $b missing from PartitionFilters: $pf"))
    spark.sql("DROP TABLE IF EXISTS events_upsert_plan")
  }

  test("IVF-PQ serving prunes the partitioned index scan to the probed cells at planning time") {
    // The read-side half of ivfPqTopKEncoded's sublinear claim: the
    // probed cell ids must land in the index scan's PartitionFilters as
    // a literal predicate — a broadcast-join-only plan would list every
    // cell directory and prune at runtime, which at 100 TB is a full
    // file-index listing per query batch.
    import graft.ops.Similarity
    val embeds = Tables.load(spark, sfDir, "embeddings")
    val cells = 10
    val cents = Similarity.kmeansCentroids(embeds, "embedding", "vec_id",
      k = cells, iters = 2)
    val books = Similarity.pqCodebooks(embeds, "embedding", "vec_id",
      m = 16, ksub = 32, iters = 1)
    Bucketing.writePartitioned(
      Similarity.ivfPqIndex(embeds, "vec_id", "embedding", cents, books),
      "ivfpq_index_plan", "centroid_id")
    // one query at a small nprobe probes a strict subset of the cells
    val served = Similarity.ivfPqTopKEncoded(
      spark.table("ivfpq_index_plan"), books, cents,
      embeds, embeds.filter(col("vec_id") === 0),
      "vec_id", "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nprobe = 2)
    val p = planOf(served)
    val pf = """ivfpq_index_plan.*?PartitionFilters: \[([^\]]*)\]""".r
      .findFirstMatchIn(p).map(_.group(1))
      .getOrElse(fail(s"no PartitionFilters on the index scan:\n$p"))
    assert(pf.contains("centroid_id"), pf)
    assert(pf.contains(" IN (") || pf.contains(" = "),
      s"expected a literal cell predicate, got: $pf")
    // and the result is still a full top-k
    assert(served.count() === 5L)
    spark.sql("DROP TABLE IF EXISTS ivfpq_index_plan")
  }

  test("dynamic partition pruning fires for a join against a filtered dimension") {
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    if (!spark.catalog.tableExists("events_p")) {
      Bucketing.writePartitioned(ev, "events_p", "day")
    }
    // tiny dimension with an explicit FILTER predicate — DPP only plans a
    // pruning subquery when the build side is selectively filtered
    val dim = ev.select(col("day")).distinct()
      .filter(col("day").isin("2024-01-05", "2024-01-11"))
    val joined = spark.table("events_p")
      .join(broadcast(dim), Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val p = planOf(joined)
    assert(p.contains("dynamicpruning"), p)
    assert(joined.count() === 2L)
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At 100 TB the runtime bloom filter drops non-joining fact rows
    // BEFORE the exchange. Production thresholds (10 MB build / 10 GB
    // probe scan) are far above test data, so lower them to observe the
    // rewrite; assert the might_contain probe lands in the fact scan side.
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // applicationSideScanSizeThreshold is a MINIMUM probe size (10 GB
      // default); creationSideThreshold is a MAXIMUM build size and the
      // tiny test dimension is already under it — only the former needs
      // lowering here
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.load(spark, sfDir, "lineitem")
      val o = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p)
      // and the rewrite must not change the answer
      val expected = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n2"))
      assert(joined.join(expected, Seq("l_returnflag"))
        .filter(col("n") =!= col("n2")).count() === 0L)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("sortWithinPartitions avoids the global range exchange orderBy pays") {
    // write-layout control: per-file sorted order (for rowgroup
    // statistics / data skipping) needs only a local sort; a global
    // orderBy adds a rangepartitioning exchange that a layout job
    // does not want
    val li = Tables.load(spark, sfDir, "lineitem")
    val local = planOf(li.repartition(4, col("l_orderkey"))
      .sortWithinPartitions(col("l_shipdate")))
    assert(!local.contains("rangepartitioning"), local)
    assert(local.contains("Sort") && local.contains("false, 0"), local) // global=false
    val global = planOf(li.orderBy(col("l_shipdate")))
    assert(global.contains("rangepartitioning"), global)
  }

  test("join strategy hints steer the physical join selection") {
    val o = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val cond = col("o_orderkey") === col("l_orderkey")
    // broadcast hint beats size estimation
    assert(planOf(li.join(o.hint("broadcast"), cond))
      .contains("BroadcastHashJoin"))
    // merge hint forces sort-merge even under the broadcast threshold
    assert(planOf(li.join(o.hint("merge"), cond))
      .contains("SortMergeJoin"))
    // shuffle_hash builds a hash map per partition, no sort
    assert(planOf(li.join(o.hint("shuffle_hash"), cond))
      .contains("ShuffledHashJoin"))
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // 90% of fact rows share key 0 — the shape AQE's skew-join handling
    // exists for. Production thresholds are MB-scale; lower them so the
    // splitter observes the test-sized shuffle. Assert on the FINAL
    // adaptive plan (after an action), which marks split joins skew=true.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.load(spark, sfDir, "lineitem")
      // the skewed reduce partition is split by MAPPER ranges — a
      // single-file scan is one map task and thus unsplittable, so fan
      // the fact side out over several mappers first
      val fact = li.repartition(8, col("l_orderkey")).select(
        when(col("l_orderkey") % 100 < 90, 0L)
          .otherwise(col("l_orderkey") % 100).as("k"),
        col("l_extendedprice"))
      // plain range dimension: the skew rule only matches when BOTH join
      // inputs are Sort-over-shuffle-stage, so the dim side must not
      // carry an aggregate between its exchange and the join
      val dim = spark.range(0, 100).select(col("id").as("k"))
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("s"))
      val expectedN = li.count()
      // collect(), not head(): head() builds a separate limited plan, so
      // THIS queryExecution would never run and the adaptive plan would
      // stay isFinalPlan=false
      val rows = joined.collect()
      assert(rows.head.getLong(0) === expectedN)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q68 time-series scan reads only the two referenced order columns") {
    val p = planOf(Relational.q68MonthOverMonth.run(spark, sfDir))
    assert(p.contains("o_orderdate") && p.contains("o_totalprice"), p)
    // pruning: the wide columns never reach the scan
    assert(!p.contains("o_custkey") && !p.contains("o_orderpriority"), p)
  }

  test("q55 hash split is a single-exchange aggregation") {
    // split assignment is pure projection arithmetic — the only DATA
    // shuffle in the plan is the final (lang, split) aggregate (the
    // presentation orderBy adds a range exchange over ~15 rows)
    val p = planOf(graft.queries.CurationQueries.q55HashSplit.run(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("q160 preference mining is a single-exchange aggregation") {
    // max_by/min_by under struct total orders replace the old two rank
    // windows + self-join: ONE hash aggregate on the group key with
    // map-side partial combine — no window sort, no join (the
    // presentation orderBy adds a range exchange over ~15 group rows)
    val p = planOf(
      graft.queries.CurationQueries.q160PreferencePairs.run(spark, sfDir))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
    assert(!p.contains("Window"), s"no rank window expected:\n$p")
    assert(!p.contains("Join"), s"no self-join expected:\n$p")
  }

  test("sliding window plans one Expand and one aggregate exchange") {
    // window(ts, 1d, 6h) fans each row into duration/slide = 4 windows
    // via a single map-side Expand with partial aggregation — NOT four
    // scans or a join against a window grid; the only data shuffle is
    // the final (window, event_type) aggregate (orderBy adds a range
    // exchange over the small result)
    val p = planOf(graft.queries.EventsQueries.q85SlidingWindow.run(spark, sfDir))
    assert(p.contains("Expand"), p)
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("IVF/k-means centroid assignment is narrow: no window, no corpus shuffle") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centv"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val assigned = graft.ops.Similarity.assignToCentroids(
      corpus, "cv", cents, byCosine = true)
    val p = planOf(assigned)
    // the corpus-side argbest must be a projection: no window operator,
    // no hash exchange anywhere (the only exchanges are the
    // single-partition centroid collect + its broadcast)
    assert(!p.contains("Window"), p)
    assert(!"Exchange hashpartitioning".r.findFirstIn(p).isDefined, p)
    // and it must agree with the window-argmin formulation it replaced
    val aw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("neighbor_id")).orderBy(col("ccos").desc, col("centroid_id"))
    val windowed = corpus.crossJoin(broadcast(cents))
      .withColumn("ccos", graft.ops.Similarity.cosine(col("cv"), col("centv")))
      .withColumn("rnk", row_number().over(aw)).filter(col("rnk") === 1)
      .select(col("neighbor_id"), col("centroid_id"))
    val disagree = assigned.select(col("neighbor_id"), col("centroid_id"))
      .join(windowed.withColumnRenamed("centroid_id", "w_centroid_id"),
        Seq("neighbor_id"))
      .filter(col("centroid_id") =!= col("w_centroid_id")).count()
    assert(disagree === 0L)
  }

  test("correlated LATERAL top-k decorrelates to a group-limit window, no nested loop") {
    val p = planOf(Relational.q95LateralTopK.run(spark, sfDir))
    // the per-outer-row LIMIT must become a rank filter with a PARTIAL
    // group-limit before the exchange — never a per-row nested loop
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("ngram decontamination screen is a broadcast semi-join, corpus side unshuffled") {
    val d = Tables.load(spark, sfDir, "documents")
    val flagged = graft.ops.Dedup.ngramScreen(
      d.filter(col("doc_id") % 10 =!= 0), d.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", n = 5)
    val p = planOf(flagged)
    // bench gram set broadcasts into a left-semi probe — the corpus-side
    // explode is pipelined into it, never shuffled on the gram string
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only hash exchanges are the bench-gram distinct and the final
    // contaminated-id distinct; a third would mean corpus grams shuffled
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2, p)
  }

  test("salted join shuffles on (key, salt) and equals the direct join") {
    val ev = Tables.load(spark, sfDir, "events")
    val dim = ev.groupBy(col("event_type"))
      .agg(round(avg(col("value")), 6).as("type_avg"))
      .withColumnRenamed("event_type", "t")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the tiny test dim takes the same shuffle
      // path a too-big-to-broadcast dim takes at scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = Skew.saltedEquiJoin(ev, dim, "event_type", "t",
        saltFrom = Seq("event_id"), salts = 16)
      val p = planOf(salted)
      // the join's exchange must carry the salt — that IS the skew
      // spread: each hot key occupies 16 reducer subkeys, not one
      assert(p.contains("__fsalt") && p.contains("hashpartitioning"), p)
      val direct = ev.join(dim, col("event_type") === col("t"))
      assert(salted.count() === direct.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("salted aggregation equals the direct aggregate") {
    val ev = Tables.load(spark, sfDir, "events")
    val salted = Skew.saltedSumCount(ev, Seq("event_type"), "value",
      saltFrom = Seq("event_id"), salts = 16)
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("value")).as("d_sum"), count(lit(1)).as("d_cnt"))
    val joined = salted.join(direct, Seq("event_type")).cache()
    assert(joined.count() === direct.count())
    assert(joined.filter(col("count_rows") =!= col("d_cnt")).count() === 0L)
    assert(joined.filter(
      abs(col("sum_value") - col("d_sum")) > lit(1e-6)).count() === 0L)
  }

  test("blocked semantic dedup joins pairs on (cell, salt), never the bare cell key") {
    // the SCALING claim: the within-cell pair join must carry __salt in
    // its join key — on the bare |cells|-ary key every cell's quadratic
    // pair explosion lands on one reducer and AQE's size-based
    // coalescing (which sees tiny inputs, not the Σ|cell|² output)
    // makes it worse
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.ops.Similarity.kmeansCentroids(
      e, "embedding", "vec_id", k = 4, iters = 1)
    val p = planOf(graft.ops.Dedup.semanticDedupBlocked(
      e, "embedding", "vec_id", 0.45, cents, probes = 2))
    // at fixture scale the replicated side fits a broadcast (no
    // exchange to inspect); at scale the same keys hash-partition — in
    // BOTH physical strategies the join KEYS must carry the salt
    val pairJoinKeys =
      "(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[centroid_id[^\\]]*__salt".r
    assert(pairJoinKeys.findFirstIn(p).isDefined,
      s"pair join keys do not include (centroid_id, __salt):\n$p")
  }

  test("blocked semantic dedup carries NO broadcast hint on the pruned side (AQE decides from stats)") {
    // the r11 ADVICE fix, pinned: `pruned` is the full duplicate-id set
    // — corpus-scale on dup-heavy data — so an unconditional
    // broadcast() hint would collect it on the driver and OOM at the
    // 100 TB target. The anti-join must reach the optimizer hint-free;
    // AQE may still CHOOSE a broadcast at runtime when the measured
    // size is small (that physical choice is the point), but no hint
    // may force it.
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.ops.Similarity.kmeansCentroids(
      e, "embedding", "vec_id", k = 4, iters = 1)
    val df = graft.ops.Dedup.semanticDedupBlocked(
      e, "embedding", "vec_id", 0.45, cents, probes = 2)
    // the k-centroid relation (a one-row collect_list aggregate) is
    // MEANT to broadcast — it is bounded by k. What must never carry a
    // hint is any side that still scans the corpus parquet relation,
    // because its size is data-dependent.
    val corpusHinted = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.left -> j.hint.leftHint, j.right -> j.hint.rightHint).filter {
          case (side, h) => h.exists(_.strategy.isDefined) &&
            side.toString.contains("parquet")
        }
    }.flatten
    assert(corpusHinted.isEmpty,
      s"corpus-scan join sides must be hint-free:\n${corpusHinted.mkString("\n")}")
  }

  test("hybrid retrieval keyword leg broadcasts the query terms, never shuffles postings against them") {
    // the query-term set is a handful of tokens: the postings join must
    // be a BroadcastHashJoin (build = query terms), not an exchange of
    // the full term relation on tok
    val docs = Tables.load(spark, sfDir, "documents")
    val qterms = docs.filter(col("doc_id") === 0)
      .select(explode(slice(graft.ops.TextAnalysis.tokens(col("text")), 1, 5)).as("tok"))
      .distinct()
    for (scores <- Seq(
        graft.ops.TextAnalysis.keywordScores(docs, "text", "doc_id", qterms),
        graft.ops.TextAnalysis.bm25Scores(docs, "text", "doc_id", qterms))) {
      val p = planOf(scores)
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }

  test("q116 stratified sample broadcasts the per-stratum counts; the hash prefilter sits under the window") {
    val p = planOf(graft.queries.CurationQueries.q116StratifiedSample
      .run(spark, sfDir))
    // phase 1: counts join back via broadcast (no corpus re-shuffle to
    // co-locate them); phase 2's window must rank only prefiltered
    // survivors, so the hkey threshold filter appears BELOW the window
    assert(p.contains("BroadcastHashJoin"), p)
    val windowIdx = p.indexOf("Window")
    assert(windowIdx >= 0, p)
    assert(p.lastIndexOf("Filter") > windowIdx,
      s"prefilter must be below the window:\n$p")
  }

  test("q123 bottom-k sketch keeps the q116 discipline: counts broadcast back, prefilter under the window") {
    val p = planOf(graft.queries.TextVectorQueries.q123QuantileSketch
      .run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    val windowIdx = p.indexOf("Window")
    assert(windowIdx >= 0, p)
    assert(p.lastIndexOf("Filter") > windowIdx,
      s"prefilter must be below the window:\n$p")
  }

  test("q133 OOV gate: top-V cut rides TakeOrderedAndProject and joins back as a broadcast") {
    val p = planOf(graft.queries.TextVectorQueries.q133OovRate
      .run(spark, sfDir))
    // the vocabulary cut must NOT be a global sort — V is literal, so
    // the planner takes the bounded top-k path
    assert(p.contains("TakeOrderedAndProject"), p)
    // the V-row membership gate joins the per-source counts by
    // broadcast, never re-shuffling the corpus-side aggregate on token
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q136 embedding coherence: centroid join carries no broadcast hint (AQE decides)") {
    val df = graft.queries.TextVectorQueries.q136EmbeddingCoherence
      .run(spark, sfDir)
    // the centroid/norm relations are label-cardinality — data-
    // dependent — so per the Quantiles no-hint rule NO join may carry
    // a strategy hint; AQE broadcasts them at runtime when small
    val hintedSides = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.hint.leftHint, j.hint.rightHint)
          .count(_.exists(_.strategy.isDefined))
    }.sum
    assert(hintedSides === 0, s"expected hint-free joins, found $hintedSides")
  }

  test("q124 semantic decontamination: benchmark broadcasts, corpus-scan join sides hint-free") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val df = graft.ops.Dedup.semanticDecontaminate(
      e.filter(col("vec_id") % 20 =!= 0), e.filter(col("vec_id") % 20 === 0),
      "embedding", "vec_id", 0.45)
    val p = planOf(df)
    // the bench side rides as a broadcast (nested-loop from the scored
    // crossJoin); the corpus never exchanges before scoring
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // exactly ONE hinted join side exists — the bounded bench
    // broadcast; the corpus-scale hits join is left to AQE (same
    // discipline as blocked semantic dedup)
    val hintedSides = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Seq(j.hint.leftHint, j.hint.rightHint)
          .count(_.exists(_.strategy.isDefined))
    }.sum
    assert(hintedSides === 1,
      s"expected only the bench broadcast hint, found $hintedSides")
  }

  test("q113 provenance audit is shuffle-light: no join, no corpus window") {
    val p = planOf(graft.queries.CurationQueries.q113ProvenanceAudit
      .run(spark, sfDir))
    // every gate signal is per-row arithmetic; the only exchanges are
    // the reason-sized aggregate and the tiny window frame over it
    assert(!p.contains("Join"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected agg + window-frame exchange only:\n$p")
  }

  test("q105/q105c ranking legs: TakeOrderedAndProject; every global window limit-bounded") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    for (q <- Seq(graft.queries.TextVectorQueries.q105HybridRrf,
                  graft.queries.TextVectorQueries.q105cHybridRrfAnn)) {
      val plan = q.run(spark, sfDir).queryExecution.sparkPlan
      assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
      // every UN-partitioned window (a single-partition sort) must rank a
      // limit-bounded relation, never the corpus-sized scored leg;
      // per-query partitioned windows (the ANN rerank) are exempt
      val globalWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.nonEmpty, s"[${q.name}] ranks should materialize via a bounded window")
      globalWindows.foreach { w =>
        val bounded = w.child.collect {
          case t: TakeOrderedAndProjectExec => t
          case g: GlobalLimitExec => g
        }
        assert(bounded.nonEmpty,
          s"[${q.name}] WindowExec over an unbounded (corpus-sized) input:\n$w")
      }
    }
  }

  test("round-13 windowed queries plan only PARTITIONED or limit-bounded windows") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec}
    // q128's batch windows partition by lang, q123's by sketch group,
    // q125/q126/q129 ride the bounded-heap kernel (no window at all on
    // the corpus side) — no query in the round-13 wave may plan an
    // un-partitioned window over an unbounded input
    for (q <- Seq(graft.queries.CurationQueries.q128LengthBucketedBatching,
                  graft.queries.TextVectorQueries.q123QuantileSketch,
                  graft.queries.TextVectorQueries.q125HardNegativeMining,
                  graft.queries.TextVectorQueries.q126RetrievalMetrics)) {
      val plan = q.run(spark, sfDir).queryExecution.sparkPlan
      val unbounded = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
            w.child.collect {
              case t: TakeOrderedAndProjectExec => t
              case g: GlobalLimitExec => g
            }.isEmpty => w
      }
      assert(unbounded.isEmpty,
        s"[${q.name}] un-partitioned window over an unbounded input:\n${unbounded.mkString("\n")}")
    }
  }

  test("q112 NB classifier plans no window; one-row totals ride as broadcasts") {
    val labeled = Tables.load(spark, sfDir, "documents")
      .withColumn("y", graft.ops.TextAnalysis.qualityScore(col("text")) >= 0.88)
    val p = planOf(graft.ops.Classifier.nbScores(labeled, "doc_id", "text", "y"))
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("interval overlap join plans a bucket hash join, not a nested loop") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i, i * 1000L, i * 1000L + 500L))
      .toDF("iid", "s", "e")
    val p = planOf(graft.ops.Intervals.overlapJoin(a, a, 10000L))
    // the pure theta form of this join IS a nested loop — the bucket
    // rewrite must surface as an equi-join on the bucket key
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("prefix Jaccard join never plans a cartesian/nested-loop expansion") {
    val d = Tables.load(spark, sfDir, "documents")
    val p = planOf(graft.ops.Dedup.jaccardJoinPrefix(
      d.select(col("doc_id"), col("text")), "text", "doc_id", 0.8))
    // the exact similarity join must stay a prefix-postings hash join
    // plus a candidate-keyed verify — an all-pairs expansion anywhere
    // would be the quadratic plan the operator exists to avoid
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
