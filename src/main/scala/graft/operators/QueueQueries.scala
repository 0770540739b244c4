package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.RegexpFunctions.regexp_count_fast

/** The goose console/API query surface (SURVEY.md §2.2-2.4), re-expressed
  * as declarative Spark plans over the driver test tables.
  *
  * Every query here mirrors one operator of the reference
  * (nilenso/goose, cited per-query) and has a DuckDB oracle in
  * [[oracles]] with identically-named output columns. All plans are
  * scan→filter→agg/sort shapes that Catalyst fully pushes down
  * (PushedFilters + pruned ReadSchema at the parquet scan); none
  * collects to the driver, so each would run unchanged on a
  * 1000-executor cluster over a partitioned 100 TB table.
  */
object QueueQueries {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def orders(s: SparkSession, d: String) = Tables.orders(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 queue `size` — commands.clj:170-171 (LLEN/ZCOUNT per collection).
    "q01_size_by_queue" -> ((s, d) =>
      events(s, d).groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    // F1 find-by-id — redis/api/enqueued_jobs.clj:22-27 (scan + equality, limit 1).
    "q02_find_by_id" -> ((s, d) =>
      events(s, d).filter(col("event_id") === 421)
        .select("event_id", "user_id", "event_type").limit(1)),

    // F3 console filter by execute-fn-sym — console/data.clj:33-38.
    "q03_find_by_fn_sym" -> ((s, d) =>
      events(s, d).filter(col("event_type") === "click")
        .select("event_id", "event_type").orderBy("event_id").limit(10)),

    // F7 scheduler due-scan — commands.clj:219-228 (ZRANGEBYSCORE -inf..now LIMIT 50).
    "q04_due_scan" -> ((s, d) =>
      orders(s, d).filter(col("o_orderdate") <= lit("1996-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderdate", "o_orderkey").limit(50)),

    // F4 console filter type=failed — console/data.clj:39-47 via job.clj:18-19.
    "q05_filter_failed" -> ((s, d) =>
      orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey").orderBy("o_orderkey").limit(25)),

    // O4/S9 dead-jobs pop/peek oldest — commands.clj:253-262 (ZPOPMIN).
    "q06_dead_peek_oldest" -> ((s, d) =>
      events(s, d).select("event_id", "ts").orderBy("ts", "event_id").limit(1)),

    // O1 enqueued page — commands.clj:198-203 (LRANGE window), page size 10.
    "q07_page_asc_offset" -> ((s, d) =>
      events(s, d).select("event_id", "ts")
        .orderBy("ts", "event_id").offset(20).limit(10)),

    // O3 dead page — commands.clj:264-266 (ZREVRANGE by died-at desc).
    "q08_page_desc" -> ((s, d) =>
      events(s, d).select("event_id", "ts")
        .orderBy(col("ts").desc, col("event_id").desc).limit(10)),

    // A2 home-page jobs-size totals — console/data.clj:18-28.
    "q09_home_stats" -> ((s, d) =>
      orders(s, d).groupBy(col("o_orderstatus").as("state"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("state")),

    // F8 list-all-queues — commands.clj:173-181 (SCAN keys, distinct).
    "q10_list_queues" -> ((s, d) =>
      events(s, d).select("event_type").distinct().orderBy("event_type")),

    // A3 batch status derivation — batch.clj:40-46 (conditional over 4 set sizes).
    "q11_batch_status" -> ((s, d) =>
      events(s, d).filter(col("user_id") === 7).groupBy("user_id")
        .agg(
          when(sum(when(col("event_type").isin("view", "click"), 1).otherwise(0)) > 0, "in-progress")
            .when(sum(when(col("event_type") === "error", 1).otherwise(0)) === 0, "success")
            .otherwise("partial-success").as("status"),
          count(lit(1)).as("n"))
        .select("status", "n").orderBy("status")),

    // A4 broker metrics gauges — redis/metrics.clj:14-58.
    "q12_metrics_gauges" -> ((s, d) =>
      events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_v"), max("value").as("max_v"))
        .orderBy("event_type")),

    // F9 heartbeat liveness probe — the anti-join shape of redis/heartbeat.clj:10-11
    // + orphan_checker.clj:13-20 (processes without live heartbeats).
    "q13_worker_liveness" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = orders(s, d).filter(col("o_orderstatus") === "P")
        .select("o_custkey").distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),

    // A6 latency source selection — job.clj:45-61 (cond over retry-at |
    // schedule-run-at | cron-run-at | enqueued-at) ⇒ COALESCE.
    "q14_latency_source" -> ((s, d) =>
      orders(s, d)
        .select(coalesce(nullif(col("o_orderstatus"), lit("O")), col("o_orderpriority")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("n")).orderBy("src")),

    // O5 prioritise-execution — commands.clj:145-164; consume order is
    // (priority DESC, enqueued_at ASC) replacing Redis list-front moves.
    "q15_prioritised_order" -> ((s, d) =>
      events(s, d)
        .withColumn("priority", when(col("event_type") === "error", 1).otherwise(0))
        .select("event_id", "priority")
        .orderBy(col("priority").desc, col("event_id").asc).limit(15)),

    // D12 delete-by-ids — anti-join rewrite of LREM/ZREM
    // (redis/api/enqueued_jobs.clj:42-48).
    "q16_delete_jobs" -> ((s, d) => {
      val e = events(s, d)
      val victims = e
        .filter(col("event_type") === "error" &&
          col("ts") < lit("2024-01-02").cast("timestamp_ntz"))
        .select(col("user_id").as("vu")).distinct()
      e.join(victims, e("user_id") === victims("vu"), "left_anti")
        .select("event_id").orderBy("event_id").limit(20)
    }),

    // D5 scheduler promote: due jobs grouped by ready-queue —
    // redis/scheduler.clj:22-48 + group-by job.clj:21-25.
    "q17_promote_due_grouped" -> ((s, d) =>
      events(s, d).filter(col("ts") <= lit("2024-01-05").cast("timestamp_ntz"))
        .groupBy(col("event_type").as("ready_queue"))
        .agg(count(lit(1)).as("n"), min("ts").as("oldest"))
        .orderBy("ready_queue")),

    // D3 retry backoff — goose.retry default `20 + rand(20)*(n+1) + n^4`
    // (retry.clj:22-27); deterministic part (the rand term is seeded
    // per-process in goose, so the oracle checks the n^4 curve).
    "q18_retry_backoff" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          (lit(20) + pow((col("event_id") % 28).cast("double"), 4)).cast("long").as("backoff_sec"))
        .orderBy("event_id").limit(30)),

    // D11 replay-n-dead-jobs: n oldest dead — redis/api/dead_jobs.clj:42-47.
    "q20_replay_dead" -> ((s, d) =>
      events(s, d).filter(col("event_type") === "error")
        .select("event_id", "ts").orderBy("ts", "event_id").limit(5)),

    // S10 purge — size after purging one queue (redis/api/enqueued_jobs.clj:50-54).
    "q21_purge_count" -> ((s, d) =>
      events(s, d).filter(col("event_type") =!= "view")
        .agg(count(lit(1)).as("n"))),

    // Broadcast-join rollup (console would show per-tenant totals; the tiny
    // nation dim is broadcast — `.explain` shows BroadcastHashJoin).
    "q22_revenue_by_nation" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      orders(s, d).select("o_custkey", "o_totalprice")
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("n_name")
    }),

    // Windowed aggregation (beyond the reference surface — SURVEY §2.6:
    // goose has no windowed aggs; Spark provides them natively).
    "q24_daily_window" -> ((s, d) =>
      events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_v"))
        .orderBy("day", "event_type")),

    // Gap-based sessionization (1-hour inactivity): lag + running sum of
    // session breaks — the standard distributed sessionize, one shuffle
    // per user partition.
    "q25_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("brk",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 1 HOUR"), 1).otherwise(0))
        .withColumn("sess", sum("brk").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"), min("ts").as("start_ts"))
        .orderBy("user_id", "sess").limit(100)
    }),

    // Rollup (grouping sets family — also free from Catalyst).
    "q26_rollup" -> ((s, d) =>
      events(s, d)
        .rollup(col("event_type"), (col("user_id") % 5).as("cohort"))
        .agg(count(lit(1)).as("n"))
        // sentinel-coalesce the rollup nulls: null sort/compare semantics
        // differ across engines and drivers
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("cohort"), lit(-1)).as("cohort"), col("n"))
        .orderBy("event_type", "cohort")),

    // Exact per-queue latency percentiles (the SLO view a queue console
    // needs; goose has no percentile surface at all). Implemented through
    // the spark.sql path: the engine's tables work as plain SQL views.
    "q27_percentiles" -> ((s, d) => {
      events(s, d).createOrReplaceTempView("q27_events")
      s.sql(
        """SELECT event_type,
          |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
          |  ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 4) AS p95
          |FROM q27_events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }),

    // Top-k per group (console "latest per queue" view) — window row_number.
    "q23_topk_per_status" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderstatus", "rn")
    }),

    // Distributed AS-OF join: each click joined to the same user's most
    // recent error at-or-before it. Spark has no ASOF operator; the
    // scalable composition is union-tag + one window pass — ONE shuffle
    // keyed by user, one sort, `last(_, ignoreNulls)` carrying the
    // latest right-side row forward. The naive alternatives both die at
    // scale: an inequality theta-join is O(clicks × errors-per-user)
    // and a per-key collect isn't distributed at all. Right rows sort
    // before left rows at equal ts (tag 0 < 1) = inclusive `>=` ASOF.
    "q38_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          lit(null).cast("long").as("event_id"),
          col("ts").as("err_ts"), col("value").as("err_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          col("event_id"),
          // NTZ, matching Tables.events' ts convention — an LTZ null here
          // would coerce the whole unioned column away from timestamp_ntz.
          lit(null).cast("timestamp_ntz").as("err_ts"),
          lit(null).cast("double").as("err_value"))
      // err_value in the ordering breaks ties between two error rows at
      // the same (user_id, ts) deterministically (last = max err_value);
      // within a (ts, tag) group err_value is homogeneously null (clicks)
      // or non-null (errors), so null-ordering never differs vs DuckDB.
      val w = Window.partitionBy("user_id").orderBy("ts", "tag", "err_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errors.union(clicks)
        .withColumn("last_err_ts", last("err_ts", ignoreNulls = true).over(w))
        .withColumn("last_err_value", last("err_value", ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select("event_id", "user_id", "last_err_ts", "last_err_value")
        .orderBy("event_id").limit(500)
    }),

    // JSON column extraction (event props arrive as JSON strings from any
    // real event source): path extraction stays inside codegen —
    // get_json_object, no UDF — so the parse is a scan-local expression.
    "q39_json_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 90)
        .orderBy("event_id").limit(200)),

    // Distributed RANGE join: clicks within the hour before each error,
    // per user ("what led up to this failure"). A naive theta-join
    // (c.ts BETWEEN e.ts - 1h AND e.ts) has no equi-key — Spark would
    // pick BroadcastNestedLoopJoin and die at scale. The banded form
    // buckets both sides by the hour and equi-joins on (user_id, bucket)
    // with errors exploded over the 2 buckets a 1-hour lookback can
    // touch: each click lands in exactly one of an error's buckets, so
    // no post-join dedup, and every join key's fan-out is one user-hour.
    "q40_range_join" -> ((s, d) => {
      val ev = events(s, d)
      val hourOf = (c: Column) => floor(unix_timestamp(c.cast("timestamp")) / 3600)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
          col("event_id").as("click_id"), hourOf(col("ts")).as("c_bkt"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("err_ts"))
        .withColumn("bkt", explode(array(hourOf(col("err_ts")) - 1, hourOf(col("err_ts")))))
      errors.join(clicks,
          col("user_id") === col("c_uid") && col("bkt") === col("c_bkt") &&
            col("c_ts") > col("err_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("err_ts"),
          "left")
        .groupBy("err_id")
        .agg(count(col("click_id")).as("n_clicks"))
        .orderBy("err_id").limit(500)
    }),

    // SALTED skew join — the fix for a shuffle join whose key space is
    // tiny/hot (here: event_type, 5 values — every key is a hot key, the
    // worst case for a hash-partitioned join). The fact side gets
    // salt = pmod(hash(event_id), 32); the dim side explodes over all 32
    // salts; the join key becomes (event_type, salt), spreading each hot
    // key over 32 partitions instead of pinning it to one straggler
    // task. Results are salt-invariant, so the oracle is the plain join.
    // (AQE's skewedJoin rewrite does this adaptively for sort-merge
    // stragglers; explicit salting is the deterministic form that also
    // covers aggregation skew.)
    "q41_salted_join" -> ((s, d) => {
      val SaltN = 32
      val ev = events(s, d)
      val dim = ev.groupBy("event_type")
        .agg(round(avg("value"), 4).as("type_avg"))
        .withColumn("salt", explode(array((0 until SaltN).map(lit): _*)))
      val facts = ev.withColumn("salt", pmod(hash(col("event_id")), lit(SaltN)))
      // SHUFFLE_HASH hint: at test SF the 160-row dim would broadcast and
      // the join would never hash-partition — the hint forces the
      // partitioned-by-(key, salt) plan the operator exists to produce
      // (in production the skewed side's dim is far past the broadcast
      // threshold and this is the plan Catalyst picks unhinted).
      facts.join(dim.hint("SHUFFLE_HASH"), Seq("event_type", "salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value") - col("type_avg")), 2).as("dev_sum"))
        .orderBy("event_type")
    }),

    // PIVOT — long→wide reshaping with an EXPLICIT value list (the only
    // scale-safe form: an unlisted pivot first runs a distinct scan to
    // discover columns, a driver round-trip a 100 TB plan shouldn't hide).
    // Compiles to one grouped conditional agg — same shuffle as q01.
    "q42_pivot" -> ((s, d) =>
      events(s, d)
        .withColumn("cohort", col("user_id") % 5)
        .groupBy("cohort")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("cohort")),

    // Analytic window-function suite over one user_id sort: lag/lead
    // deltas, running rank, quartile bucket and per-user running sum all
    // share a SINGLE exchange+sort (plan-audited) — the one-pass shape
    // that makes wide per-key session analytics affordable at scale.
    "q43_window_suite" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        // integer microseconds on both engines (unix_micros / epoch_us) —
        // second-level arithmetic would truncate in Spark but round in
        // DuckDB's double->BIGINT cast
        .withColumn("prev_gap_us",
          coalesce(unix_micros(col("ts").cast("timestamp")) -
            unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")), lit(-1L)))
        .withColumn("next_type", coalesce(lead(col("event_type"), 1).over(w), lit("none")))
        .withColumn("k", row_number().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("run_value", round(sum("value").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .filter(col("user_id") < 20)
        .select("user_id", "event_id", "prev_gap_us", "next_type", "k",
          "quartile", "run_value")
        .orderBy("user_id", "k").limit(300)
    }),

    // UNPIVOT (wide→long): per-source token-budget columns melted back to
    // (source, metric, value) rows — the inverse reshaping of q42, again
    // scan-local (an Expand node, no shuffle beyond the feeding agg).
    "q44_unpivot" -> ((s, d) => {
      val wide = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).cast("long").as("docs"),
          sum(regexp_count_fast(col("text"), "\\S+"))
            .cast("long").as("ws_tokens"),
          sum("n_chars").cast("long").as("chars"))
      wide.unpivot(Array(col("source")),
          Array(col("docs"), col("ws_tokens"), col("chars")),
          "metric", "v")
        .orderBy("source", "metric")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_size_by_queue" ->
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    "q02_find_by_id" ->
      "SELECT event_id, user_id, event_type FROM events WHERE event_id = 421 LIMIT 1",
    "q03_find_by_fn_sym" ->
      "SELECT event_id, event_type FROM events WHERE event_type = 'click' ORDER BY event_id LIMIT 10",
    "q04_due_scan" ->
      "SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderdate <= TIMESTAMP '1996-01-01 00:00:00' ORDER BY o_orderdate, o_orderkey LIMIT 50",
    "q05_filter_failed" ->
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 25",
    "q06_dead_peek_oldest" ->
      "SELECT event_id, ts FROM events ORDER BY ts, event_id LIMIT 1",
    "q07_page_asc_offset" ->
      "SELECT event_id, ts FROM events ORDER BY ts, event_id LIMIT 10 OFFSET 20",
    "q08_page_desc" ->
      "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 10",
    "q09_home_stats" ->
      "SELECT o_orderstatus AS state, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total FROM orders GROUP BY o_orderstatus ORDER BY state",
    "q10_list_queues" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q11_batch_status" ->
      "SELECT CASE WHEN SUM(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END) > 0 THEN 'in-progress' WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 0 THEN 'success' ELSE 'partial-success' END AS status, COUNT(*) AS n FROM events WHERE user_id = 7 GROUP BY user_id ORDER BY status",
    "q12_metrics_gauges" ->
      "SELECT event_type, COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_v, MAX(value) AS max_v FROM events GROUP BY event_type ORDER BY event_type",
    "q13_worker_liveness" ->
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P') ORDER BY c_custkey",
    "q14_latency_source" ->
      "SELECT COALESCE(NULLIF(o_orderstatus, 'O'), o_orderpriority) AS src, COUNT(*) AS n FROM orders GROUP BY src ORDER BY src",
    "q15_prioritised_order" ->
      "SELECT event_id, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS priority FROM events ORDER BY priority DESC, event_id ASC LIMIT 15",
    "q16_delete_jobs" ->
      "SELECT event_id FROM events WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-02 00:00:00') ORDER BY event_id LIMIT 20",
    "q17_promote_due_grouped" ->
      "SELECT event_type AS ready_queue, COUNT(*) AS n, MIN(ts) AS oldest FROM events WHERE ts <= TIMESTAMP '2024-01-05 00:00:00' GROUP BY event_type ORDER BY ready_queue",
    "q18_retry_backoff" ->
      "SELECT event_id, CAST(20 + POW(CAST(event_id % 28 AS DOUBLE), 4) AS BIGINT) AS backoff_sec FROM events ORDER BY event_id LIMIT 30",
    "q20_replay_dead" ->
      "SELECT event_id, ts FROM events WHERE event_type = 'error' ORDER BY ts, event_id LIMIT 5",
    "q21_purge_count" ->
      "SELECT COUNT(*) AS n FROM events WHERE event_type <> 'view'",
    "q22_revenue_by_nation" ->
      "SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q23_topk_per_status" ->
      "SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (SELECT o_orderstatus, o_orderkey, o_totalprice, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_orderstatus, rn",
    "q24_daily_window" ->
      "SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_v FROM events GROUP BY 1, 2 ORDER BY day, event_type",
    "q25_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL OR ts > lag(ts) OVER w + INTERVAL 1 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
        |  FROM g)
        |SELECT user_id, sess, COUNT(*) AS n_events, MIN(ts) AS start_ts
        |FROM s GROUP BY user_id, sess ORDER BY user_id, sess LIMIT 100""".stripMargin,
    "q26_rollup" ->
      "SELECT COALESCE(event_type, 'ALL') AS event_type, COALESCE(user_id % 5, -1) AS cohort, COUNT(*) AS n FROM events GROUP BY ROLLUP(event_type, user_id % 5) ORDER BY event_type, cohort",
    "q27_percentiles" ->
      """SELECT event_type,
        |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
        |  ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Mirrors the union-tag + window formulation rather than DuckDB's
    // native ASOF JOIN: at equal error ts the ASOF row choice is
    // unspecified, while this form pins the same (ts, tag, err_value)
    // tiebreak on both engines.
    "q38_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, 0 AS tag, CAST(NULL AS BIGINT) AS event_id,
        |         ts AS err_ts, value AS err_value
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS tag, event_id, NULL, NULL
        |  FROM events WHERE event_type = 'click')
        |SELECT event_id, user_id, last_err_ts, last_err_value FROM (
        |  SELECT *,
        |    last_value(err_ts IGNORE NULLS) OVER w AS last_err_ts,
        |    last_value(err_value IGNORE NULLS) OVER w AS last_err_value
        |  FROM u WINDOW w AS (
        |    PARTITION BY user_id ORDER BY ts, tag, err_value
        |    ROWS UNBOUNDED PRECEDING))
        |WHERE tag = 1 ORDER BY event_id LIMIT 500""".stripMargin,
    "q39_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 90
        |ORDER BY event_id LIMIT 200""".stripMargin,
    "q40_range_join" ->
      """SELECT e.event_id AS err_id, COUNT(c.event_id) AS n_clicks
        |FROM events e LEFT JOIN events c
        |  ON c.event_type = 'click' AND c.user_id = e.user_id
        |  AND c.ts > e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY err_id LIMIT 500""".stripMargin,
    // the plain (unsalted) join — salting must not change any value
    "q41_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, ROUND(AVG(value), 4) AS type_avg
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n,
        |  ROUND(SUM(e.value - d.type_avg), 2) AS dev_sum
        |FROM events e JOIN dim d ON e.event_type = d.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q42_pivot" ->
      """SELECT user_id % 5 AS cohort,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q43_window_suite" ->
      """SELECT user_id, event_id,
        |  COALESCE(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) AS prev_gap_us,
        |  COALESCE(lead(event_type) OVER w, 'none') AS next_type,
        |  ROW_NUMBER() OVER w AS k,
        |  NTILE(4) OVER w AS quartile,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING), 2) AS run_value
        |FROM events
        |WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, k LIMIT 300""".stripMargin,
    "q44_unpivot" ->
      """WITH wide AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
        |    CAST(SUM(len(regexp_extract_all(text, '\S+', 0))) AS BIGINT) AS ws_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY source)
        |SELECT source, metric, v FROM (
        |  SELECT source, 'docs' AS metric, docs AS v FROM wide
        |  UNION ALL SELECT source, 'ws_tokens', ws_tokens FROM wide
        |  UNION ALL SELECT source, 'chars', chars FROM wide)
        |ORDER BY source, metric""".stripMargin
  )
}
