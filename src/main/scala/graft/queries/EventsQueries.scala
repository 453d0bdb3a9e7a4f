package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{GraftQuery, Tables}

/** Event-stream analytics in batch form over the `events` table (the same
  * transforms graft.streaming.EventPipeline runs incrementally — one
  * logical plan shared by batch and Structured Streaming, SURVEY.md §2.9).
  *
  * Timestamps are emitted as formatted strings so Spark-parquet and
  * DuckDB hash identically regardless of physical timestamp precision
  * (parquet ns vs Spark micros).
  */
object EventsQueries {

  /** Semi-structured extraction: pull an int out of the JSON `props`
    * column (extension surface, SURVEY.md §2.8 note). At scale this stays
    * in whole-stage codegen — no UDF. */
  val q21JsonExtract = GraftQuery(
    "q21_json_extract",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          round(avg(col("k")), 3).as("avg_k"),
          max(col("k")).as("max_k"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n_events,
      round(avg(CAST(json_extract_string(props,'$.k') AS INT)),3) AS avg_k,
      max(CAST(json_extract_string(props,'$.k') AS INT)) AS max_k,
      round(sum(value),2) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Tumbling event-time window (1 day) — the batch twin of the streaming
    * groupBy(window($"ts","1 day")) aggregation. date_trunc is the
    * deterministic batch spelling; the streaming path in
    * graft.streaming.EventPipeline uses window() + watermark. */
  val q22TumblingWindow = GraftQuery(
    "q22_tumbling_window",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"),
          countDistinct(col("user_id")).as("unique_users"))
        .orderBy(col("day"), col("event_type")),
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      event_type, count(*) AS n_events,
      round(sum(value),2) AS total_value,
      count(DISTINCT user_id) AS unique_users
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""))

  /** SLIDING event-time window (1 day long, sliding every 6 hours) — the
    * batch twin of the streaming window(ts, dur, slide) aggregation
    * (§2.9 mapping; streaming twin is q86). Each event lands in
    * duration/slide = 4 overlapping windows: Spark plans ONE Expand
    * (×4 rows) before the single aggregate shuffle — same scale posture
    * as GROUPING SETS, the fan-out happens map-side and combines
    * partially. The oracle recomputes the epoch-aligned 6-hour grid
    * explicitly: the 4 containing windows of t start at
    * (floor(t/21600)−i)·21600, i ∈ 0..3 (make_timestamp keeps the oracle
    * timezone-free). */
  val q85SlidingWindow = GraftQuery(
    "q85_sliding_window",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy(col("win_start"), col("event_type")),
    Some("""SELECT strftime(make_timestamp(
        ((CAST(floor(epoch(ts) / 21600) AS BIGINT) - i) * 21600) * 1000000),
        '%Y-%m-%d %H:%M') AS win_start,
      event_type, count(*) AS n_events, round(sum(value),2) AS total_value
      FROM events, (SELECT unnest([0,1,2,3]) AS i) shifts
      GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  /** Sessionization via gap detection (30-min inactivity) — the batch twin
    * of session_window(). lag() over (user, ts) marks session starts; one
    * shuffle on user_id, every window bounded by a user's own events —
    * scales horizontally. Epoch seconds compared as double on both engines
    * (events carry microsecond precision). */
  val q23Sessionize = GraftQuery(
    "q23_sessionize", { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sessions = Tables.load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull, 0)
            .when(col("ts").cast("double") - col("prev_ts").cast("double") > 1800d, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg((sum(col("new_session")) + lit(1)).as("sessions"),
          count(lit(1)).as("events"))
      sessions.agg(
        count(lit(1)).as("users"),
        sum(col("sessions")).as("total_sessions"),
        round(avg(col("sessions")), 4).as("avg_sessions_per_user"),
        max(col("sessions")).as("max_sessions"))
    },
    Some("""WITH marked AS (
        SELECT user_id,
          CASE WHEN lag(ts) OVER w IS NULL THEN 0
               WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1
               ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      per_user AS (
        SELECT user_id, CAST(sum(new_session) + 1 AS BIGINT) AS sessions,
          count(*) AS events
        FROM marked GROUP BY user_id)
      SELECT count(*) AS users, CAST(sum(sessions) AS BIGINT) AS total_sessions,
        round(avg(sessions),4) AS avg_sessions_per_user,
        max(sessions) AS max_sessions
      FROM per_user"""))

  /** Top-k users by spend inside one event type — window row_number topk
    * per group, then global order (§2.6 O6 generalized per-group). */
  val q24TopUsersPerType = GraftQuery(
    "q24_top_users_per_type", { (s, dir) =>
      val perUser = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(round(sum(col("value")), 2).as("spend"), count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("spend").desc, col("user_id"))
      perUser.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("event_type"), col("rnk"), col("user_id"), col("spend"), col("n"))
        .orderBy(col("event_type"), col("rnk"))
    },
    Some("""SELECT event_type, rnk, user_id, spend, n
      FROM (SELECT event_type, user_id, spend, n,
              row_number() OVER (PARTITION BY event_type
                ORDER BY spend DESC, user_id) AS rnk
            FROM (SELECT event_type, user_id,
                    round(sum(value),2) AS spend, count(*) AS n
                  FROM events GROUP BY event_type, user_id) per_user) ranked
      WHERE rnk <= 5 ORDER BY event_type, rnk"""))

  /** As-of join (SURVEY §2.3 J6): each click event enriched with the most
    * recent purchase AT OR BEFORE it by the same user, without a built-in
    * ASOF operator — the union+window formulation: tag both sides, union,
    * and take running max(purchase_ts) over (user, time) order. One
    * shuffle on user_id, windows bounded per user — the scale shape of an
    * as-of join without any range-join explosion. The right side sorts
    * before the left at equal timestamps (tag 0 < 1), giving the
    * inclusive `click.ts >= purchase.ts` semantics DuckDB's ASOF JOIN
    * uses, which is the oracle. */
  val q41AsofJoin = GraftQuery(
    "q41_asof_join", { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("timestamp").as("pts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("ts").as("pts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.union(purchases)
        .withColumn("last_purchase", max(col("pts")).over(w))
        .filter(col("tag") === 1)
        .agg(
          count(lit(1)).as("clicks"),
          count(col("last_purchase")).as("matched"),
          round(avg(col("ts").cast("double") - col("last_purchase").cast("double")), 2)
            .as("avg_gap_s"),
          round(max(col("ts").cast("double") - col("last_purchase").cast("double")), 2)
            .as("max_gap_s"))
    },
    Some("""SELECT count(*) AS clicks, count(pts) AS matched,
      round(avg(epoch(ts) - epoch(pts)), 2) AS avg_gap_s,
      round(max(epoch(ts) - epoch(pts)), 2) AS max_gap_s
      FROM (SELECT c.ts, p.pts
            FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
              (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.pts) matched"""))

  /** Salted aggregation for hot-key skew (§7 scale posture): event_type
    * has 5 giant groups — the worst aggregation-skew shape, where a plain
    * groupBy lands each key's full volume on one reducer. The salted
    * two-phase plan bounds per-reducer load at |key|/16; the oracle is
    * the direct single-phase aggregate, proving the rewrite is
    * result-identical. */
  val q43SaltedAgg = GraftQuery(
    "q43_salted_agg",
    (s, dir) =>
      graft.ops.Skew.saltedSumCount(
          Tables.load(s, dir, "events"),
          keyCols = Seq("event_type"), sumCol = "value",
          saltFrom = Seq("event_id"), salts = 16)
        .select(col("event_type"),
          round(col("sum_value"), 2).as("total_value"), col("count_rows"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, round(sum(value),2) AS total_value,
      count(*) AS count_rows
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Salted shuffle JOIN for the same hot-key shape as q43 but on the
    * JOIN side: event_type has 5 giant key groups, so a plain shuffle
    * join lands each type's full volume on one reducer, and AQE's skew
    * split cannot help when the skewed side isn't a splittable
    * sort-merge input (or the dim is too big to broadcast at real
    * scale). The manual rewrite joins on (key, salt): fact rows salt
    * into 16 subkeys, dim rows replicate ×16 — per-reducer load drops
    * 16×, exchange grows only by |dim|×16. The oracle is the direct
    * join, proving the rewrite result-identical; the (key, salt)
    * exchange shape is asserted in PlanSpec. */
  val q92SaltedJoin = GraftQuery(
    "q92_salted_join", { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val dim = ev.groupBy(col("event_type"))
        .agg(round(avg(col("value")), 6).as("type_avg"))
        .withColumnRenamed("event_type", "t")
      graft.ops.Skew.saltedEquiJoin(ev, dim, "event_type", "t",
          saltFrom = Seq("event_id"), salts = 16)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(when(col("value") > col("type_avg"), 1)).as("above_type_avg"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT e.event_type, count(*) AS n_events,
      count(CASE WHEN e.value > d.type_avg THEN 1 END) AS above_type_avg
      FROM events e JOIN (SELECT event_type AS t, round(avg(value),6) AS type_avg
                          FROM events GROUP BY event_type) d
        ON e.event_type = d.t
      GROUP BY e.event_type ORDER BY e.event_type"""))

  /** Funnel analysis: per user, does the first view precede the first
    * click precede the first purchase? One groupBy(user) with min(CASE)
    * per stage — a single shuffle regardless of funnel depth, the shape
    * that beats per-stage self-joins at scale. */
  val q47Funnel = GraftQuery(
    "q47_funnel", { (s, dir) =>
      val perUser = Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("first_view"),
          min(when(col("event_type") === "click", col("ts"))).as("first_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      perUser.agg(
        count(lit(1)).as("users"),
        count(when(col("first_view").isNotNull, 1)).as("viewed"),
        count(when(col("first_view") < col("first_click"), 1)).as("view_then_click"),
        count(when(col("first_view") < col("first_click") &&
          col("first_click") < col("first_purchase"), 1)).as("full_funnel"))
    },
    Some("""SELECT count(*) AS users,
      count(CASE WHEN first_view IS NOT NULL THEN 1 END) AS viewed,
      count(CASE WHEN first_view < first_click THEN 1 END) AS view_then_click,
      count(CASE WHEN first_view < first_click AND first_click < first_purchase
            THEN 1 END) AS full_funnel
      FROM (SELECT user_id,
              min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
              min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
              min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events GROUP BY user_id) per_user"""))

  /** Retention cohorts: users grouped by their first-activity day, with
    * day-7 and day-14 return rates — first-touch attribution via a
    * per-user min(ts), then one semi-join-free conditional re-aggregation
    * (the cohort table stays one row per user; no event-level self-join). */
  val q48Retention = GraftQuery(
    "q48_retention", { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val firstDay = ev.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
      val activity = ev.select(col("user_id"),
        date_trunc("day", col("ts")).as("act_day")).distinct()
      firstDay.join(activity, Seq("user_id"))
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"))
        .agg(
          countDistinct(col("user_id")).as("cohort_users"),
          countDistinct(when(
            col("act_day").cast("double") - col("cohort_day").cast("double") >= 7 * 86400d,
            col("user_id"))).as("returned_7d"),
          countDistinct(when(
            col("act_day").cast("double") - col("cohort_day").cast("double") >= 14 * 86400d,
            col("user_id"))).as("returned_14d"))
        .orderBy(col("cohort"))
    },
    Some("""WITH first_day AS (
        SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        FROM events GROUP BY user_id),
      activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS act_day FROM events)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
        count(DISTINCT user_id) AS cohort_users,
        count(DISTINCT CASE WHEN epoch(act_day) - epoch(cohort_day) >= 604800.0
          THEN user_id END) AS returned_7d,
        count(DISTINCT CASE WHEN epoch(act_day) - epoch(cohort_day) >= 1209600.0
          THEN user_id END) AS returned_14d
      FROM first_day JOIN activity USING (user_id)
      GROUP BY cohort_day ORDER BY cohort"""))

  /** Pivot (long→wide reshape): daily event counts, one column per event
    * type. The value list is EXPLICIT — pivot without one needs an extra
    * distinct pass over the data to discover the columns, and an
    * unbounded column space is a driver-memory hazard at scale. */
  val q49Pivot = GraftQuery(
    "q49_pivot",
    (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("day")),
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY 1 ORDER BY day"""))

  /** RANGE window frame (value-based, not row-based): 7-day trailing
    * average of daily revenue. The un-partitioned window is safe HERE
    * because it runs on the per-day aggregate, whose row count is bounded
    * by the calendar, not the event volume — aggregate first, window the
    * small relation. */
  val q50RangeFrame = GraftQuery(
    "q50_range_frame", { (s, dir) =>
      val daily = Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(sum(col("value")).as("rev"))
      val w = Window.orderBy(col("day_sec"))
        .rangeBetween(-6 * 86400L, Window.currentRow)
      daily.withColumn("day_sec", col("d").cast("long"))
        .withColumn("ma7_revenue", round(avg(col("rev")).over(w), 2))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          round(col("rev"), 2).as("revenue"), col("ma7_revenue"))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (
        SELECT date_trunc('day', ts) AS d, sum(value) AS rev
        FROM events GROUP BY 1)
      SELECT strftime(d, '%Y-%m-%d') AS day, round(rev, 2) AS revenue,
        round(avg(rev) OVER (ORDER BY epoch(d)
          RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW), 2) AS ma7_revenue
      FROM daily ORDER BY day"""))

  /** Last-observation-carried-forward gap fill (LOCF) — the time-series
    * imputation primitive: nulls take the most recent non-null value in
    * their user's timeline via last(IGNORE NULLS) over a running frame.
    * One partitioned window, no shuffle beyond it; gaps are injected
    * deterministically (event_id % 7) so both engines fill the same
    * holes. */
  val q74ForwardFill = GraftQuery(
    "q74_forward_fill", { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("gappy",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
        .withColumn("filled", last(col("gappy"), ignoreNulls = true).over(w))
        .agg(
          count(lit(1)).as("events"),
          count(when(col("gappy").isNull, 1)).as("gaps"),
          count(when(col("filled").isNull, 1)).as("unfillable"),
          round(sum(col("filled")), 2).as("sum_filled"))
    },
    Some("""SELECT count(*) AS events,
      count(CASE WHEN gappy IS NULL THEN 1 END) AS gaps,
      count(CASE WHEN filled IS NULL THEN 1 END) AS unfillable,
      round(sum(filled), 2) AS sum_filled
      FROM (SELECT gappy,
        last_value(gappy IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM (SELECT *, CASE WHEN event_id % 7 = 0 THEN NULL
                             ELSE value END AS gappy
              FROM events) g) f"""))

  /** Robust outlier detection via median absolute deviation — the
    * data-quality screen that survives heavy tails where z-scores
    * saturate. Two exact-percentile passes (both one sort-based
    * aggregate; the approx_percentile twin applies at scale per q04b),
    * threshold broadcast as a 1-row aggregate. */
  val q75MadOutliers = GraftQuery(
    "q75_mad_outliers", { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val med = o.agg(expr("percentile(o_totalprice, 0.5)").as("med"))
      val mad = o.crossJoin(med)
        .agg(first(col("med")).as("med"),
          expr("percentile(abs(o_totalprice - med), 0.5)").as("mad"))
      o.crossJoin(broadcast(mad))
        .agg(
          count(lit(1)).as("orders"),
          round(first(col("med")), 2).as("median"),
          round(first(col("mad")), 2).as("mad"),
          count(when(abs(col("o_totalprice") - col("med")) >
            col("mad") * 3, 1)).as("outliers"))
    },
    Some("""WITH med AS (
        SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
        FROM orders),
      mad AS (
        SELECT med.med,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(o_totalprice - med.med)) AS mad
        FROM orders, med GROUP BY med.med)
      SELECT count(*) AS orders, round(mad.med, 2) AS median,
        round(mad.mad, 2) AS mad,
        count(CASE WHEN abs(o_totalprice - mad.med) > mad.mad * 3 THEN 1 END)
          AS outliers
      FROM orders, mad GROUP BY mad.med, mad.mad"""))

  /** SCD2-style interval collapse: consecutive same-type runs in each
    * user's event timeline become (valid_from, valid_to) dimension rows —
    * the slowly-changing-dimension build, expressed with lag (run
    * boundary detection) + lead (interval close) windows. */
  val q76Scd2Intervals = GraftQuery(
    "q76_scd2_intervals", { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val starts = Tables.load(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      starts.agg(
        count(lit(1)).as("intervals"),
        countDistinct(col("user_id")).as("users"),
        count(when(col("valid_to").isNull, 1)).as("open_intervals"),
        round(sum(unix_micros(col("valid_to")) - unix_micros(col("ts"))) / 1e6 / 3600.0, 2)
          .as("closed_hours"))
    },
    Some("""WITH starts AS (
        SELECT user_id, ts, event_id,
          lag(event_type) OVER w AS prev_type, event_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      runs AS (
        SELECT user_id, ts,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        FROM starts
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT count(*) AS intervals,
        count(DISTINCT user_id) AS users,
        count(CASE WHEN valid_to IS NULL THEN 1 END) AS open_intervals,
        round(sum(epoch(valid_to) - epoch(ts)) / 3600.0, 2) AS closed_hours
      FROM runs"""))

  /** STRICT linear interpolation of gapped values between bracketing
    * observations ([[graft.ops.TimeSeries.interpolateLinear]]) — the
    * continuous-signal repair beside q74's step-function forward fill,
    * oracle-EXACT: time runs in epoch micros (exact integer
    * differences), the fraction is ONE shared IEEE divide on identical
    * operands in both engines, equal-timestamp brackets take the
    * earlier observation instead of a 0/0 NaN, and the interpolated
    * mass sums as quantized micros (order-independent). Edge rows with
    * no bracket stay NULL — interpolation never extrapolates, and the
    * `unfillable` count pins that refusal through the gate. */
  val q152InterpolateLinear = GraftQuery(
    "q152_interpolate_linear", { (s, dir) =>
      val gappy = Tables.load(s, dir, "events")
        .withColumn("gappy",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      graft.ops.TimeSeries.interpolateLinear(
          gappy, "user_id", "ts", "gappy", Seq("event_id"))
        .agg(
          count(lit(1)).as("events"),
          count(when(col("gappy").isNull, 1)).as("gaps"),
          count(when(col("gappy").isNull && col("gappy_interp").isNotNull,
            1)).as("interpolated"),
          count(when(col("gappy_interp").isNull, 1)).as("unfillable"),
          sum(round(col("gappy_interp") * 1e6).cast("long"))
            .as("sum_interp_micro"))
    },
    Some("""WITH g AS (SELECT user_id, ts, event_id,
        CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS gappy,
        epoch_us(ts) AS tm
      FROM events),
    w AS (SELECT gappy, tm,
        last_value(CASE WHEN gappy IS NOT NULL
            THEN struct_pack(t := tm, v := gappy) END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        first_value(CASE WHEN gappy IS NOT NULL
            THEN struct_pack(t := tm, v := gappy) END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM g),
    f AS (SELECT gappy,
        CASE WHEN gappy IS NOT NULL THEN gappy
             WHEN p IS NOT NULL AND n IS NOT NULL AND n.t = p.t THEN p.v
             WHEN p IS NOT NULL AND n IS NOT NULL
               THEN p.v + (n.v - p.v) * ((tm - p.t) / (n.t - p.t))
        END AS interp
      FROM w)
    SELECT count(*) AS events,
      count(CASE WHEN gappy IS NULL THEN 1 END) AS gaps,
      count(CASE WHEN gappy IS NULL AND interp IS NOT NULL THEN 1 END)
        AS interpolated,
      count(CASE WHEN interp IS NULL THEN 1 END) AS unfillable,
      CAST(sum(CAST(round(interp * 1e6) AS BIGINT)) AS BIGINT)
        AS sum_interp_micro
    FROM f"""))

  /** Cross-user session CONCURRENCY via the bucketed interval-overlap
    * join ([[graft.ops.Intervals.overlapJoin]], oracle-exact): derive
    * closed session intervals with q23's gap rule, then pair every two
    * sessions of DIFFERENT users that overlap in time — the
    * two-relation theta join Spark would otherwise plan as a nested
    * loop, rewritten to a bucket equi-join + exact refine, each pair
    * credited once in its overlap's first bucket (no distinct pass).
    * The DuckDB oracle runs the quadratic join directly at verify SF;
    * counts, total and max overlap (exact integer micros) must
    * hash-match — a pair double-credited across buckets, missed at a
    * bucket boundary, or mis-refined fails the row. */
  val q155IntervalOverlapJoin = GraftQuery(
    "q155_interval_overlap", { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sessions = Tables.load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull, 0)
            .when(col("ts").cast("double") - col("prev_ts").cast("double")
              > 1800d, 1)
            .otherwise(0))
        .withColumn("sess", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(unix_micros(col("ts"))).as("s"),
          max(unix_micros(col("ts"))).as("e"))
        // fixture-bounded interval id: user ids and per-user session
        // counts are far below 1e5 at every driver SF
        .select((col("user_id") * 100000L + col("sess")).as("iid"),
          col("user_id"), col("s"), col("e"))
        .localCheckpoint(eager = false)
      // bucket width AUTO-derived (median session length) — the r15
      // scaladoc's tuning rule made executable; the oracle runs the
      // quadratic join directly, so a mis-derived width that changed
      // any row (rather than just the plan's fan-out) would hash-fail
      val pairs = graft.ops.Intervals.overlapJoinAuto(
        sessions.select(col("iid"), col("s"), col("e")),
        sessions.select(col("iid"), col("s"), col("e")))
      pairs
        .join(sessions.select(col("iid").as("a_iid"),
          col("user_id").as("ua")), Seq("a_iid"))
        .join(sessions.select(col("iid").as("b_iid"),
          col("user_id").as("ub")), Seq("b_iid"))
        .filter(col("ua") < col("ub"))
        .agg(count(lit(1)).as("overlapping_pairs"),
          sum(col("overlap_micros")).as("total_overlap_micros"),
          max(col("overlap_micros")).as("max_overlap_micros"))
    },
    Some("""WITH marked AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL THEN 0
               WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1
               ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      numbered AS (
        SELECT user_id,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess,
          epoch_us(ts) AS tm
        FROM marked),
      sessions AS (
        SELECT user_id, sess, min(tm) AS s, max(tm) AS e
        FROM numbered GROUP BY user_id, sess),
      pairs AS (
        SELECT least(a.e, b.e) - greatest(a.s, b.s) AS ov
        FROM sessions a JOIN sessions b
          ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e)
      SELECT count(*) AS overlapping_pairs,
        CAST(sum(ov) AS BIGINT) AS total_overlap_micros,
        max(ov) AS max_overlap_micros
      FROM pairs"""))

  val all: Seq[GraftQuery] =
    Seq(q21JsonExtract, q22TumblingWindow, q23Sessionize, q24TopUsersPerType,
      q41AsofJoin, q43SaltedAgg, q47Funnel, q48Retention, q49Pivot,
      q50RangeFrame, q74ForwardFill, q75MadOutliers, q76Scd2Intervals,
      q85SlidingWindow, q92SaltedJoin, q152InterpolateLinear,
      q155IntervalOverlapJoin)
}
