package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling evidence: replicate documents/embeddings 10× into a
  * scratch dir (ids offset per copy so they stay unique), run the
  * dedup/similarity/text operators at 1× and 10×, and write SCALING.md
  * with the observed time ratios. An operator whose ratio tracks ~10× (or
  * the join-output growth for pair generators) scales linearly in data
  * volume — the property that matters at 100 TB; a ratio far above that
  * flags a super-linear plan.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    // arg 1: replication factor (default 10 → SCALING.md; any other value
    // writes SCALING_<f>x.md — e.g. the 100× flagship spot check).
    // arg 2: optional comma-separated query subset for focused runs, or
    // the literal "engine" to run ONLY the engine-side probes (promote/
    // track/pipeline/orphan) without the 40-query sweep.
    val factor = if (args.nonEmpty) args(0).toInt else 10
    // "engine" runs every engine lane; "engine:<lane>" runs ONE lane
    // (promote|track|pipeline|fleet|fleet2p|fleet4p|shared|shared1m|
    // producers|orphan|rocks|tinyfile|visibility) — a focused
    // re-measurement shouldn't pay minutes of unrelated probes.
    val engineArg: Option[String] =
      if (args.length > 1 && args(1).trim.startsWith("engine")) Some(args(1).trim)
      else None
    val engineOnly = engineArg.isDefined
    val engineLane: Option[String] =
      engineArg.filter(_.contains(":")).map(_.split(":", 2)(1))
    def laneOn(name: String): Boolean = engineLane.forall(_ == name)
    val subset: Option[Set[String]] =
      if (args.length > 1 && !engineOnly)
        Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    // a focused (subset/engine) run at the default factor must never
    // overwrite the canonical full SCALING.md with a partial table
    val outFile =
      if (engineOnly) "SCALING_engine_partial.md"
      else if (factor == 10 && subset.isEmpty) "SCALING.md"
      else if (subset.isEmpty) s"SCALING_${factor}x.md"
      else s"SCALING_${factor}x_partial.md"
    val scaled = s"/tmp/graft-scale$factor"
    // Shuffle partitions follow DATA at scale, not core count: the 1×
    // suite default (32 = cores) under-partitions a 1000× shuffle —
    // d26's 21M-row/partition SMJ sorts OOM'd a 24 GB heap at 32
    // partitions and needed 48 GB to spill through, while 256 partitions
    // fit the same sorts in memory. A 1000-executor cluster sizes this
    // by maxPartitionBytes/AQE automatically; the probe exposes the knob
    // so the at-scale configuration is measured, not asserted.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Build each scaled table once (guarded PER TABLE — a scratch dir
    // left by an earlier revision may predate newer tables). The
    // engine-only mode synthesizes its own jobs and needs none of them.
    val copies = spark.range(factor).withColumnRenamed("id", "copy")
    if (!engineOnly && !Files.exists(Paths.get(s"$scaled/documents.parquet"))) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val nDocs = docs.count()
      docs.crossJoin(copies)
        .withColumn("doc_id", col("doc_id") + col("copy") * nDocs)
        .drop("copy")
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$scaled/documents.parquet")
    }
    if (!engineOnly && !Files.exists(Paths.get(s"$scaled/embeddings.parquet"))) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val nVec = emb.count()
      emb.crossJoin(copies)
        .withColumn("vec_id", col("vec_id") + col("copy") * nVec)
        .drop("copy")
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$scaled/embeddings.parquet")
    }
    // events: offset event_id AND user_id per copy — 10× rows with 10×
    // users keeps per-user event density constant, so the join probes
    // (q38 asof, q40 banded range) measure data growth, not artificial
    // key densification. ts stays nanos-long (Tables.events normalizes).
    if (!engineOnly && !Files.exists(Paths.get(s"$scaled/events.parquet"))) {
      val ev = spark.read.parquet(s"$base/events.parquet")
      val nEv = ev.count()
      val nUsers = ev.agg(max("user_id")).head().getLong(0) + 1
      ev.crossJoin(copies)
        .withColumn("event_id", col("event_id") + col("copy") * nEv)
        .withColumn("user_id", col("user_id") + col("copy") * nUsers)
        .drop("copy")
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$scaled/events.parquet")
    }

    val allProbeQueries = Seq(
      "d01_dedup_exact", "d03_dedup_normalized", "d04_minhash_signatures",
      "d05_lsh_candidate_pairs", "d09_lsh_skew_guarded", "d06_ngram_jaccard",
      "d10_lsh_verified", "d12_dedup_clusters", "d07_simhash", "d08_embedding_neardup",
      "d11_contamination", "s01_cosine_topk", "s02_ann_signlsh", "s03_ann_ivf",
      "s04_ann_multiquery", "s06_ivf_recall_sweep", "s07_centroid_outliers",
      "t01_lang_id", "t02_quality_score", "t03_token_count",
      "t04_fingerprint", "t05_top_bigrams", "t06_repetition",
      "t07_tfidf", "t08_unigram_logprob",
      "t11_bigram_logprob",
      "m01_media_decode", "m02_frame_sample",
      "m03_resize_plan", "p01_clean_corpus", "p02_source_mixing",
      "p03_pack_stats", "p04_shard_plan", "p05_quantile_filter",
      "p06_length_histogram", "t09_vocab_coverage", "t10_pii_scan",
      "s09_lsh_table_sweep", "p07_temperature_mix",
      "d13_sketch_error", "d14_incremental_dedup",
      "d15_semantic_dedup", "d16_threshold_sweep", "d17_bloom_contamination",
      "d18_dedup_prune_stats",
      "d18a_verified_edges", "d18b_cluster_census",
      "t12_gopher_rules", "t13_ttr_diversity", "s11_two_stage",
      "p08_epoch_schedule", "d19_dup_provenance", "m04_ahash",
      "d20_passage_dedup", "s12_coarsek_sweep",
      "d21_passage_prune", "p09_dsir_resample", "m05_ahash_neardup",
      "s13_kmeans_step", "p10_diverse_budget", "t14_novelty",
      "t15_char_entropy", "p11_dedup_discounted_mix", "s15_dimred_sweep",
      "t16_token_drift", "d22_cdc_chunks",
      "t17_zipf_slope", "p12_curriculum_phases", "s16_knn_graph",
      "m06_phash_dup_groups", "d23_band_sweep", "p13_unimax_mix",
      "t18_perplexity_buckets", "s17_pq_error",
      "p14_leakage_safe_split", "t19_bpe_pair_census", "t22_bpe_apply",
      "t23_bpe_encode_native",
      "d23a_window_census",
      "d24_window_coverage", "s18_range_search", "s19_ivf_balance",
      "d25_editdist_verify", "s20_embedding_drift", "t20_encoding_audit",
      "d26_dupspan_excision",
      "p15_shard_balance", "s21_hybrid_search", "s22_pq_adc_topk",
      "s23_filtered_topk", "s24_ivf_knn_join", "m07_decode_quarantine",
      "t21_readability",
      "s25_sql_minhash", "s26_sql_entropy", "s27_sql_window",
      "s28_sql_ngram_jaccard", "s29_sql_length_histogram", "s30_sql_dupspan",
      "q38_asof_join", "q40_range_join", "q41_salted_join")
    subset.foreach { s =>
      val unknown = s -- allProbeQueries.toSet
      require(unknown.isEmpty, s"unknown probe name(s): ${unknown.mkString(", ")}")
    }
    val probeQueries =
      if (engineOnly) Seq.empty[String]
      else subset.fold(allProbeQueries)(s => allProbeQueries.filter(s))

    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }

    // Best-of-2 with the second samples taken as a SEPARATE full pass
    // (same rationale as Bench): shared-host contention windows last
    // minutes; back-to-back samples both land inside one, minutes-apart
    // samples don't. A single contaminated sample otherwise fabricates
    // ratios (observed: 0.3×-41× swings on the same plan).
    val samples = scala.collection.mutable.Map.empty[(String, String), Double]
    def time(name: String, dir: String): Double = {
      val t = timeOnce(name, dir)
      val key = (name, dir)
      samples(key) = samples.get(key).fold(t)(math.min(_, t))
      samples(key)
    }

    // warm both paths
    probeQueries.foreach(q => time(q, "/root/testdata/sf0.001"))

    val sb = new StringBuilder
    sb.append(s"# SCALING — operator wall-time at 1× (sf0.1) vs $factor× corpus\n\n")
    sb.append("Generated by `graft.ScaleProbe` (documents/embeddings replicated ")
    sb.append(s"$factor× with unique ids into /tmp). Ratio ≈ $factor ⇒ linear in rows; ")
    sb.append("pair generators/verifiers (d08/d09/d10; m05 rides the same band joins behind its MediaMaxBandWidth hot-key guard) legitimately grow with ")
    sb.append("candidate-pair count — the scale-path forms (d09 guard, d10 verify-over-")
    sb.append("candidates) hold near-flat because the guard bounds per-key fan-out. ")
    sb.append("The diagnostic quadratic forms (d05 unguarded, d06 all-same-source) now ")
    sb.append("take a FIXED doc_id-prefix input, so their cost is constant at any corpus ")
    sb.append("size (ratio ≈ 1) — the r2 verdict's gate-domination fix. ")
    sb.append("Driver-bounded registries: `fireCron` collects the due cron registry and ")
    sb.append("ENFORCES its design envelope (SchedulerEngine.DefaultMaxCronEntries = 10k ")
    sb.append("schedules; past that it throws rather than balloon the driver heap).\n\n")
    sb.append(s"| query | 1× sec | $factor× sec | ratio |\n|---|---|---|---|\n")

    // Artifact-building queries first and only once cold: the first
    // touch per corpus builds and caches a prebuilt index artifact (s03
    // the IVF centroid table, m04 the media-sketch table, d23a the
    // stride-1 window census + dup stats that d24/d26/s30 ride), so a
    // best-of-2 would silently fold the warm path into the "cold" row —
    // and the cold row IS these probes' meaning (the ingest cost).
    val ColdOnce = Seq("s03_ann_ivf", "m04_ahash", "d23a_window_census")
    // The artifact store is cross-session persistent (r14): without an
    // explicit eviction a prior probe/verify run's stored census would
    // make the "cold" rows silently warm. Evict both corpora's
    // artifacts so cold means built-from-raw-text.
    if (!engineOnly) Seq(base, scaled).foreach { dir =>
      val n = graft.ArtifactStore.evict(s"$dir/documents.parquet")
      if (n > 0) println(s"PROBE evicted $n stored artifact(s) for $dir (cold-path reset)")
    }
    val coldRows = ColdOnce.filter(probeQueries.contains).map { q =>
      q -> (timeOnce(q, base), timeOnce(q, scaled))
    }.toMap
    val rest = probeQueries.filterNot(coldRows.contains)
    (1 to 2).foreach { _ => rest.foreach { q => time(q, base); time(q, scaled) } }

    probeQueries.foreach { q =>
      val (t1, t10) =
        coldRows.getOrElse(q, (samples((q, base)), samples((q, scaled))))
      sb.append(f"| $q | $t1%.2f | $t10%.2f | ${t10 / t1}%.1f× |\n")
      println(f"PROBE $q: $t1%.2fs -> $t10%.2fs (${t10 / t1}%.1fx)")
    }

    // Artifact queries again per corpus: a SECOND lookup pays only the
    // query-side cost — the 100 TB serving shape (build once, look up
    // many).
    coldRows.keys.toSeq.sorted.foreach { q =>
      val t1 = math.min(timeOnce(q, base), timeOnce(q, base))
      val t10 = math.min(timeOnce(q, scaled), timeOnce(q, scaled))
      sb.append(f"| $q (artifact prebuilt) | $t1%.2f | $t10%.2f | ${t10 / t1}%.1f× |\n")
      println(f"PROBE $q cached: $t1%.2fs -> $t10%.2fs (${t10 / t1}%.1fx)")
    }

    // BPE vocabulary-size probe (VERDICT r13 #4): native encode cost as
    // a function of MERGE TABLE size over the same corpus. The replace
    // chain compiles one nested expression per merge (64 is already the
    // oracle's comfortable ceiling; 30-100k cannot compile at all); the
    // native encoder carries the table as one reference object and its
    // per-word cost tracks merges APPLIED (bounded by word length), not
    // table size — so the 64-merge and 1200-merge rows should sit flat
    // against each other at every corpus size.
    if (!engineOnly && subset.forall(_.contains("t23_bpe_encode_native"))) {
      val (_, bigMerges) = graft.operators.TextOps.syntheticVocabMerges(1200)
      val smallMerges = graft.operators.TextOps.BpeMerges64
      def timeEncode(merges: Seq[(String, String)], dir: String): Double = {
        val enc = graft.functions.BpeFunctions.bpe_encode(col("tok"), merges)
        val df = spark.read.parquet(s"$dir/documents.parquet")
          .select(explode(split(col("text"), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
          .select(sum(length(enc)).as("n"))
        val t0 = System.nanoTime()
        Bench.force(df)
        (System.nanoTime() - t0) / 1e9
      }
      Seq("64-merge corpus table" -> smallMerges,
          "1200-merge synthetic table" -> bigMerges).foreach { case (label, m) =>
        val t1 = math.min(timeEncode(m, base), timeEncode(m, base))
        val t10 = math.min(timeEncode(m, scaled), timeEncode(m, scaled))
        sb.append(f"| native bpe_encode ($label) | $t1%.2f | $t10%.2f | ${t10 / t1}%.1f× |\n")
        println(f"PROBE bpe_encode $label: $t1%.2fs -> $t10%.2fs (${t10 / t1}%.1fx)")
      }
    }

    // engine-side probes are factor-independent: run them on full sweeps
    // only — a focused subset run shouldn't pay minutes of unrelated
    // promote/track/pipeline executions
    if (subset.isEmpty) {
    sb.append("\n## Engine-side probes\n\n")

    // promoteDue at 1× vs 10× due backlog: fully distributed (enqueue +
    // Dataset tombstone, no driver collect of victim ids) ⇒ wall time
    // must track ~linearly in rows, with flat driver memory.
    def timePromote(n: Int): Double = graft.Scratch.withDir(s"probe-due-$n") { root =>
      import spark.implicits._
      val backend = new graft.backend.ParquetBackend(spark, root)
      val t0v = 1700000000000L
      val retry = graft.model.RetryOpts()
      backend.schedule(spark.range(0, n, 1, 32).map { i =>
        graft.model.Job(
          id = i.toString, executeFnSym = "noop", argsJson = "[]",
          queue = "q", readyQueue = "q", priority = 0, enqueuedAt = t0v,
          scheduleRunAt = Some(t0v - 1000), cronRunAt = None, batchId = None,
          retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())
      })
      val sched = new graft.worker.SchedulerEngine(backend, spark, () => t0v)
      val t0 = System.nanoTime()
      require(sched.promoteDue() == n)
      (System.nanoTime() - t0) / 1e9
    }
    sb.append("| probe | small | large | ratio | note |\n|---|---|---|---|---|\n")
    if (laneOn("promote")) locally {
      val t1 = math.min(timePromote(100000), timePromote(100000))
      val t10 = math.min(timePromote(1000000), timePromote(1000000))
      sb.append(f"| promoteDue (100k → 1M due backlog) | $t1%.2f | $t10%.2f | ${t10 / t1}%.1f× | distributed tombstones, no driver collect |\n")
      println(f"PROBE promoteDue: $t1%.2fs -> $t10%.2fs (${t10 / t1}%.1fx)")
    }

    // trackPass with a CONSTANT active-batch load while terminal history
    // grows 10×: already-terminal batches are anti-joined out before the
    // fold, so per-tick cost must stay near-flat.
    def timeTrackPass(historyEvents: Int): Double =
        graft.Scratch.withDir(s"probe-track-$historyEvents") { root =>
      import spark.implicits._
      val backend = new graft.backend.ParquetBackend(spark, root)
      val t0v = 1700000000000L
      val nb = 100 // terminal batches carrying the history
      val per = historyEvents / nb
      (0 until nb).foreach(b => backend.putBatch(graft.model.BatchMeta(
        s"b$b", "cb", 60, "q", "q", graft.model.RetryOpts(), per, "in-progress", t0v)))
      backend.recordBatchStatus((0 until nb).map(b =>
        graft.backend.BatchStatusEvent(s"b$b", "success", t0v)))
      backend.recordCompletions(spark.range(0, historyEvents, 1, 32).map(i =>
        graft.model.CompletionEvent(i.toString, 0, Some(s"b${i % nb}"), "q",
          "success", wasRetried = false, None, 1, t0v)))
      // the constant live load: one active batch, half done
      backend.putBatch(graft.model.BatchMeta(
        "active", "cb", 60, "q", "q", graft.model.RetryOpts(), 200, "in-progress", t0v))
      backend.recordCompletions(spark.range(0, 100, 1, 4).map(i =>
        graft.model.CompletionEvent(s"a$i", 0, Some("active"), "q",
          "success", wasRetried = false, None, 1, t0v)))
      val tracker = new graft.worker.BatchTracker(backend, spark)
      val t0 = System.nanoTime()
      require(tracker.trackPass().isEmpty) // nothing newly terminal
      (System.nanoTime() - t0) / 1e9
    }
    if (laneOn("track")) locally {
      val t1 = math.min(timeTrackPass(50000), timeTrackPass(50000))
      val t10 = math.min(timeTrackPass(500000), timeTrackPass(500000))
      sb.append(f"| trackPass (50k → 500k terminal-history events, constant live load) | $t1%.2f | $t10%.2f | ${t10 / t1}%.1f× | pre-fold anti-join of terminal batches |\n")
      println(f"PROBE trackPass: $t1%.2fs -> $t10%.2fs (${t10 / t1}%.1fx)")
    }

    // the reference's own headline workload, 10× larger: 100k → 1M jobs
    // through enqueue → execute → retry-promote → execute. Partitions
    // follow volume inside benchJobPipeline, so throughput should HOLD
    // (ratio ≈ 10 in time, ≈ 1 in jobs/s). Best-of-2 like every other
    // row — one contaminated sample would fabricate the ratio.
    if (laneOn("pipeline")) locally {
      val (a1, b1) = (Bench.benchJobPipeline(spark, 100000),
        Bench.benchJobPipeline(spark, 100000))
      val (a10, b10) = (Bench.benchJobPipeline(spark, 1000000),
        Bench.benchJobPipeline(spark, 1000000))
      val (sec1, jps1) = if (a1._1 <= b1._1) a1 else b1
      val (sec10, jps10) = if (a10._1 <= b10._1) a10 else b10
      sb.append(f"| job pipeline (100k → 1M jobs, 1%% failure+retry) | $sec1%.2f | $sec10%.2f | ${sec10 / sec1}%.1f× | jobs/s ${jps1}%.0f → ${jps10}%.0f |\n")
      println(f"PROBE pipeline: $sec1%.2fs ($jps1%.0f j/s) -> $sec10%.2fs ($jps10%.0f j/s)")
    }

    // D15 fleet at scale (VERDICT r12 #4 — q54's shape priced): N live
    // GraftWorker instances (worker 0 = the coordinator, running the
    // global maintenance duties beside its consumption) drain one
    // workload from ONE shared CommitLogBackend root, each through its
    // OWN backend instance — the separate-process multi-writer shape the
    // manifest log's optimistic version claim exists for. Jobs split
    // across N queues (one per worker); noop bodies, so the row prices
    // commit-claim contention + coordinator-tick interference, not the
    // retry path (the pipeline row above prices that; q54 gates fleet
    // retry/cron semantics). Published beside the wall: the fleet-wide
    // lost-claim count (each is one extra list+claim round trip) and an
    // exactly-once completion audit over the shared log.
    def timeFleet(nWorkers: Int, n: Int): (Double, Long) =
      graft.Scratch.withDir(s"probe-fleet-$nWorkers") { root =>
        import spark.implicits._
        graft.model.JobRegistry.register("probe_noop", _ => "ok")
        val t0v = 1700000000000L
        val retry = graft.model.RetryOpts()
        val backends = (0 until nWorkers).map(_ =>
          new graft.backend.CommitLogBackend(spark, root))
        backends.head.enqueue(
          spark.range(0, n, 1, math.max(8, n / 12500)).map { i =>
            val q = s"fleet${i % nWorkers}"
            graft.model.Job(
              id = i.toString, executeFnSym = "probe_noop", argsJson = "[]",
              queue = q, readyQueue = q, priority = 0, enqueuedAt = t0v,
              scheduleRunAt = None, cronRunAt = None, batchId = None,
              retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())
          })
        val claimed0 = backends.map(_.claimRetries.get).sum
        val workers = backends.zipWithIndex.map { case (b, i) =>
          new graft.worker.GraftWorker(b, spark, root,
            trigger = org.apache.spark.sql.streaming.Trigger
              .ProcessingTime("100 milliseconds"),
            maintenanceIntervalMs = 200, queue = Some(s"fleet$i"),
            coordinator = i == 0, nowFn = () => t0v)
        }
        val t0 = System.nanoTime()
        workers.foreach(_.start())
        val sec = try {
          workers.foreach(w => require(w.awaitDrained(600000), "fleet drain timeout"))
          (System.nanoTime() - t0) / 1e9
        } finally workers.foreach(_.stop(graceful = true))
        // exactly-once over the shared log: no lost AND no double-executed
        // job across the fleet (a contention pathology would land here).
        // Distinct jobIds catch losses; the TOTAL success row count
        // catches doubles — noop bodies never retry, so any extra row is
        // a second execution (ADVICE r13: distinct-only counted two
        // success rows for one job as one).
        val fns = org.apache.spark.sql.functions
        val done = backends.head.completions.toDF()
          .filter(fns.col("terminalState") === "success")
          .agg(fns.countDistinct(fns.col("jobId")).as("d"),
            fns.count(fns.lit(1)).as("t"))
          .head()
        val (doneIds, doneRows) = (done.getLong(0), done.getLong(1))
        require(doneIds == n, s"fleet drain lost jobs: $doneIds of $n")
        require(doneRows == n,
          s"fleet drain double-executed: $doneRows success rows for $n jobs")
        (sec, backends.map(_.claimRetries.get).sum - claimed0)
      }
    if (laneOn("fleet")) locally {
      val n = 200000
      val fleet = Seq(1, 2, 4).map(w => w -> timeFleet(w, n))
      val (w1sec, _) = fleet.head._2
      fleet.foreach { case (w, (sec, claims)) =>
        sb.append(f"| fleet drain ($w worker(s), ${n / 1000}k jobs, shared commit-log root) | $w1sec%.2f | $sec%.2f | ${sec / w1sec}%.2f× | ${n / sec}%.0f jobs/s aggregate; $claims lost claim races |\n")
        println(f"PROBE fleet$w: $sec%.2fs (${n / sec}%.0f j/s, $claims lost claims)")
      }
    }

    // Cross-PROCESS fleet drain (VERDICT r13 #3): the lanes above share
    // one JVM; this one forks a second JVM (FleetWorkerMain — own
    // SparkSession, own backend instance, same classpath/--add-opens)
    // scoped to half the jobs, while THIS process's coordinator worker
    // drains the other half. Only the filesystem arbitrates: commit
    // claims by atomic rename, folds by retract/add, vacuum behind the
    // retention linger. Books published: per-side drain seconds (child's
    // measured inside the child, excluding its ~15 s JVM+Spark cold
    // start, priced separately), claim races both sides, and the
    // exactly-once audit (distinct ids AND total success rows — the
    // double-execution check).
    def timeFleetCrossProcess(n: Int): Unit =
      graft.Scratch.withDir("probe-fleet2p") { root =>
        import spark.implicits._
        graft.model.JobRegistry.register("fleet_noop", _ => "ok")
        val t0v = 1700000000000L
        val retry = graft.model.RetryOpts()
        val backend = new graft.backend.CommitLogBackend(spark, root)
        backend.enqueue(spark.range(0, n, 1, math.max(8, n / 12500)).map { i =>
          val q = if (i % 2 == 0) "fleetA" else "fleetB"
          graft.model.Job(
            id = i.toString, executeFnSym = "fleet_noop", argsJson = "[]",
            queue = q, readyQueue = q, priority = 0, enqueuedAt = t0v,
            scheduleRunAt = None, cronRunAt = None, batchId = None,
            retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())
        })
        val claimed0 = backend.claimRetries.get
        val cmd = graft.worker.FleetWorkerMain.command(
          root, "fleetB", coordinator = false, cpus = 8)
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(true)
        val tChild0 = System.nanoTime()
        val child = pb.start()
        val childOut = new StringBuilder
        val pump = new Thread(() => {
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(child.getInputStream))
          var line = r.readLine()
          while (line != null) {
            childOut.synchronized { childOut.append(line).append('\n'); () }
            line = r.readLine()
          }
        })
        pump.setDaemon(true)
        pump.start()
        val w = new graft.worker.GraftWorker(backend, spark, root,
          trigger = org.apache.spark.sql.streaming.Trigger
            .ProcessingTime("100 milliseconds"),
          maintenanceIntervalMs = 200, queue = Some("fleetA"),
          coordinator = true, nowFn = () => t0v)
        val t0 = System.nanoTime()
        w.start()
        val (localSec, childWallSec) = try {
          require(w.awaitDrained(600000), "cross-process local drain timeout")
          val sec = (System.nanoTime() - t0) / 1e9
          require(child.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
            "cross-process child never exited")
          (sec, (System.nanoTime() - tChild0) / 1e9)
        } finally {
          w.stop(graceful = true)
          if (child.isAlive) { child.destroyForcibly(); () }
        }
        val out = childOut.synchronized(childOut.toString)
        require(child.exitValue() == 0, s"child failed: $out")
        def childField(k: String): String =
          s"FLEET_${k}_fleetB=([0-9.]+)".r.findFirstMatchIn(out)
            .map(_.group(1)).getOrElse("?")
        val fns = org.apache.spark.sql.functions
        val done = new graft.backend.CommitLogBackend(spark, root)
          .completions.toDF()
          .filter(fns.col("terminalState") === "success")
          .agg(fns.countDistinct(fns.col("jobId")).as("d"),
            fns.count(fns.lit(1)).as("t"))
          .head()
        require(done.getLong(0) == n,
          s"cross-process drain lost jobs: ${done.getLong(0)} of $n")
        require(done.getLong(1) == n,
          s"cross-process drain double-executed: ${done.getLong(1)} rows")
        val claims = backend.claimRetries.get - claimed0
        sb.append(f"| fleet drain CROSS-PROCESS (2 JVMs, ${n / 1000}k jobs, shared root) | — | $localSec%.2f local / ${childField("SECONDS")} child (wall $childWallSec%.2f incl cold start) | — | exactly-once audit green; claim races local=$claims child=${childField("CLAIMRETRIES")} |\n")
        println(f"PROBE fleet2p: local $localSec%.2fs, child ${childField("SECONDS")}s " +
          f"(wall $childWallSec%.2fs), claims local=$claims child=${childField("CLAIMRETRIES")}")
      }
    if (laneOn("fleet2p")) timeFleetCrossProcess(200000)

    // Cross-process fleet at 4 JVMs under AGGRESSIVE coordinator
    // maintenance (VERDICT r14 #3): three child JVMs stream their queues
    // while THIS process's coordinator compacts on a hair trigger and
    // vacuums with a seconds-scale retention linger — so replaced
    // manifest files are genuinely unlinked while other PROCESSES hold
    // read plans over them. The books prove the linger's contract at
    // fleet scale: zero FileNotFoundException in any child, every queue
    // drained, exactly-once by per-process EXECUTION counts (completion
    // ROWS are retention-GC'd under this cadence by design — see
    // FleetWorkerMain.executed; the r15 soak caught the old row-count
    // audit measuring retention timing, not correctness).
    def timeFleetCrossProcessVacuum(n: Int): Unit =
      graft.Scratch.withDir("probe-fleet4p") { root =>
        import spark.implicits._
        val localExec = new java.util.concurrent.atomic.AtomicLong()
        graft.model.JobRegistry.register("fleet_noop", _ => "ok")
        graft.model.JobRegistry.register("fleet_count_local",
          _ => { localExec.incrementAndGet(); "ok" })
        val t0v = 1700000000000L
        val retry = graft.model.RetryOpts()
        val backend = new graft.backend.CommitLogBackend(spark, root)
        val queues = Vector("fleetA", "fleetB", "fleetC", "fleetD")
        backend.enqueue(spark.range(0, n, 1, math.max(8, n / 12500)).map { i =>
          val q = queues((i % 4).toInt)
          graft.model.Job(
            id = i.toString,
            executeFnSym = if (q == "fleetA") "fleet_count_local" else "fleet_noop",
            argsJson = "[]",
            queue = q, readyQueue = q, priority = 0, enqueuedAt = t0v,
            scheduleRunAt = None, cronRunAt = None, batchId = None,
            retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())
        })
        val children = queues.tail.map { q =>
          val pb = new ProcessBuilder(graft.worker.FleetWorkerMain.command(
            root, q, coordinator = false, cpus = 4, maxHeap = "3g"): _*)
          pb.redirectErrorStream(true)
          val child = pb.start()
          val out = new StringBuilder
          val pump = new Thread(() => {
            val r = new java.io.BufferedReader(
              new java.io.InputStreamReader(child.getInputStream))
            var line = r.readLine()
            while (line != null) {
              out.synchronized { out.append(line).append('\n'); () }
              line = r.readLine()
            }
          })
          pump.setDaemon(true)
          pump.start()
          (q, child, out)
        }
        val w = new graft.worker.GraftWorker(backend, spark, root,
          trigger = org.apache.spark.sql.streaming.Trigger
            .ProcessingTime("100 milliseconds"),
          maintenanceIntervalMs = 200, compactEveryTicks = 2,
          compactMinFiles = 4, queue = Some("fleetA"), coordinator = true,
          vacuumRetentionMs = 2000, nowFn = () => t0v)
        val t0 = System.nanoTime()
        w.start()
        val localSec = try {
          require(w.awaitDrained(600000), "4-JVM local drain timeout")
          val sec = (System.nanoTime() - t0) / 1e9
          children.foreach { case (q, child, _) =>
            require(child.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
              s"4-JVM child $q never exited") }
          sec
        } finally {
          w.stop(graceful = true)
          children.foreach { case (_, child, _) =>
            if (child.isAlive) { child.destroyForcibly(); () } }
        }
        var fnf = 0
        var childExec = 0L
        children.foreach { case (q, child, out) =>
          val o = out.synchronized(out.toString)
          require(child.exitValue() == 0, s"4-JVM child $q failed: $o")
          require(o.contains(s"FLEET_DRAINED_$q"), s"4-JVM child $q not drained: $o")
          childExec += "FLEET_EXECUTED_[A-Za-z]+=(\\d+)".r
            .findFirstMatchIn(o).map(_.group(1).toLong)
            .getOrElse(sys.error(s"4-JVM child $q printed no execution count: $o"))
          fnf += "FileNotFoundException".r.findAllIn(o).length
        }
        require(fnf == 0, s"$fnf FileNotFoundException hits under aggressive vacuum")
        // exactly-once by execution counts: each process counts its own
        // body invocations; the sum must be exactly n (losses undershoot,
        // crash replays / claim-race doubles overshoot)
        val executed = localExec.get() + childExec
        require(executed == n, s"4-JVM executions off: $executed of $n " +
          s"(local=${localExec.get()} children=$childExec)")
        require(new graft.backend.CommitLogBackend(spark, root).readyJobs.isEmpty,
          "4-JVM drain left ready rows")
        sb.append(f"| fleet drain CROSS-PROCESS under AGGRESSIVE vacuum (4 JVMs, ${n / 1000}k jobs, 2 s linger, fold pressure 4 files) | — | $localSec%.2f local wall | — | 0 FileNotFoundException across 3 child JVMs; exactly-once by per-process execution counts |\n")
        println(f"PROBE fleet4p: local $localSec%.2fs, fnf=$fnf, executed=$executed books green")
      }
    if (laneOn("fleet4p")) timeFleetCrossProcessVacuum(100000)

    // SHARED-queue contended consumption (VERDICT r13 #8 stretch — the
    // BLMOVE analog under the reference's own workload shape): N workers
    // CONTEND on ONE queue under the r14 claim protocol, with the goose
    // perf workload (1% of jobs fail once and retry instantly). Books:
    // wall + aggregate rate per N, the exactly-once audit per ATTEMPT
    // (first attempts all succeed-or-retry once, retried attempts
    // succeed once — any extra success row is a double execution), and
    // the claim overhead (one commit + one as-of read per micro-batch
    // per worker) priced against the scoped 1-worker lane above.
    def timeSharedQueue(nWorkers: Int, n: Int): (Double, Long) =
      graft.Scratch.withDir(s"probe-shared-$nWorkers") { root =>
        import spark.implicits._
        // exactly-once audited by EXECUTION COUNTS (local[32] keeps job
        // bodies in-process): completion ROWS are retention-GC'd once
        // compaction kicks in — at 1M jobs the coordinator's fold
        // pressure fires and the old completion-row books read an empty
        // (correctly collected) log. Same reasoning as the fleet4p
        // lane / FleetWorkerMain.executed.
        val noopExec = new java.util.concurrent.atomic.AtomicLong()
        val flakyExec = new java.util.concurrent.atomic.AtomicLong()
        graft.model.JobRegistry.register("probe_noop",
          _ => { noopExec.incrementAndGet(); "ok" })
        graft.model.JobRegistry.register("probe_flaky",
          _ => { flakyExec.incrementAndGet(); throw new RuntimeException("probe") })
        graft.model.JobRegistry.registerBackoff("probe_instant", _ => 0)
        val t0v = 1700000000000L
        val retry = graft.model.RetryOpts(
          maxRetries = 1, retryDelaySecFn = "probe_instant")
        val backends = (0 until nWorkers).map(_ =>
          new graft.backend.CommitLogBackend(spark, root))
        backends.head.enqueue(
          spark.range(0, n, 1, math.max(8, n / 12500)).map { i =>
            graft.model.Job(
              id = i.toString,
              executeFnSym = if (i % 100 == 0) "probe_flaky" else "probe_noop",
              argsJson = "[]", queue = "shared", readyQueue = "shared",
              priority = 0, enqueuedAt = t0v, scheduleRunAt = None,
              cronRunAt = None, batchId = None, retryOpts = retry,
              state = None, seq = graft.model.Job.nextSeq())
          })
        // FIXED clock (not ticking): a mutable clock is cloned into each
        // serialized task closure, so executor-side now() would stamp
        // retryAt into the driver clock's future and awaitDrained would
        // settle with retries pending (the first r14 lane run lost
        // 996/1000 retries to exactly this). A constant clock keeps
        // instant retries due (retryAt = t0v <= t0v).
        val workers = backends.zipWithIndex.map { case (b, i) =>
          new graft.worker.GraftWorker(b, spark, root,
            trigger = org.apache.spark.sql.streaming.Trigger
              .ProcessingTime("100 milliseconds"),
            maintenanceIntervalMs = 200, queue = Some("shared"),
            coordinator = i == 0, claimedConsumption = true,
            nowFn = () => t0v)
        }
        val t0 = System.nanoTime()
        workers.foreach(_.start())
        val sec = try {
          workers.foreach(w => require(w.awaitDrained(600000),
            "shared-queue drain timeout"))
          (System.nanoTime() - t0) / 1e9
        } finally workers.foreach(_.stop(graceful = true))
        // exactly-once per ATTEMPT, counted where it happens: the 1%
        // flaky jobs execute twice (attempt 1 fails, instant retry
        // fails, dead at maxRetries=1), the rest exactly once. Losses
        // undershoot the counters, contention doubles overshoot them.
        val flaky = n / 100L
        require(noopExec.get() == n - flaky,
          s"shared-queue noop executions off: ${noopExec.get()} vs ${n - flaky}")
        require(flakyExec.get() == 2 * flaky,
          s"shared-queue flaky executions off: ${flakyExec.get()} vs ${2 * flaky}")
        require(backends.head.readyJobs.isEmpty, "shared-queue drain left ready rows")
        (sec, n - flaky)
      }
    if (laneOn("shared")) locally {
      val n = 100000
      val lanes = Seq(1, 2, 4).map { w =>
        graft.Prof.snapshot(reset = true)
        val r = w -> timeSharedQueue(w, n)
        // stage attribution for the claimed path (graft.Prof labels in
        // WorkerEngine.withClaims / CommitLogBackend.claimSlice)
        val stages = graft.Prof.snapshot(reset = true).toSeq
          .sortBy(-_._2._1)
          .map { case (k, (s, c)) => f"$k=$s%.1fs/$c%d" }.mkString(" ")
        println(s"PROBE sharedstages w$w: $stages")
        r
      }
      val (s1, _) = lanes.head._2
      lanes.foreach { case (w, (sec, _)) =>
        sb.append(f"| SHARED-queue contended drain ($w worker(s), ${n / 1000}k jobs, 1%% retry, claimed consumption) | $s1%.2f | $sec%.2f | ${sec / s1}%.2f× | ${n / sec}%.0f jobs/s aggregate; exactly-once per attempt audited |\n")
        println(f"PROBE shared$w: $sec%.2fs (${n / sec}%.0f j/s)")
      }
    }

    // VERDICT r14 #8 stretch: the q55 shape at a 1M-job shared queue —
    // does the claims-table fold keep the per-trigger as-of read
    // bounded as consumed claims accumulate 10×? Run explicitly via
    // `ScaleProbe 10 engine:shared1m` (too slow for the default sweep).
    if (engineLane.contains("shared1m")) locally {
      val n = 1000000
      Seq(1, 4).foreach { w =>
        val (sec, _) = timeSharedQueue(w, n)
        sb.append(f"| SHARED-queue contended drain ($w worker(s), ${n / 1000}k jobs, 1%% retry, claimed consumption) | — | $sec%.2f | — | ${n / sec}%.0f jobs/s aggregate; exactly-once per attempt audited |\n")
        println(f"PROBE shared1m w$w: $sec%.2fs (${n / sec}%.0f j/s)")
      }
    }

    // Producer-path stage profile (r14): the official bench's producer
    // lane shows p4/p1 ≈ 0.7 with every absolute point above the prior
    // record; this lane NAMES the serialized section instead of guessing.
    // Same three stages as QuickProbe __producers_profile: framing
    // (caller-thread, must scale), framing+WAL-monitor append (the
    // channel-write ceiling), full client performAsync (adds job build /
    // args codec / backend bookkeeping). Measured r14: frame 317k →
    // 764k/s from 1→16 threads (scales); WAL ceiling ~100k/s flat; the
    // FULL path ~28k/s flat across N — the residual serialization lives
    // in the client/backend bookkeeping above the WAL, the named r15
    // frontier.
    if (laneOn("producers")) locally {
      graft.Scratch.withDir("probe-prodprof") { pr =>
        // shared harness (ADVICE r14: this block and QuickProbe's
        // __producers_profile were verbatim copies that could drift)
        graft.ProducersProfile.run(spark, pr, extended = false).foreach {
          case (label, rates) =>
            val (r1, r4, r16) = (rates(0)._2, rates(1)._2, rates(2)._2)
            sb.append(f"| producer $label (1/4/16 threads) | ${r1}%.0f/s | ${r4}%.0f / ${r16}%.0f per s | ${r4 / r1}%.2f× / ${r16 / r1}%.2f× | constant total work per point |\n")
            println(f"PROBE prodprof $label: ${r1}%.0f / ${r4}%.0f / ${r16}%.0f per s")
        }
      }
    }

    // D10 orphan recovery at scale: a crashed worker's unconsumed
    // attempts are exactly the ready rows with no (id, attempt)
    // completion record, and recovery is an ordinary pass over that
    // anti-join (q45 gates the semantics; this prices them). A crash
    // before the completion commit — mid-execution or at the commit
    // itself — leaves the identical log state: jobs present, completions
    // absent. Two axes, separately:
    //  - history 10× at CONSTANT orphan load ⇒ near-flat (the anti-join
    //    prunes consumed rows scan-side; recovery doesn't reread history
    //    proportionally),
    //  - orphans 100× at constant history ⇒ grows with orphan count —
    //    the axis recovery SHOULD scale with.
    def timeOrphanRecovery(history: Int, orphans: Int): Double =
      graft.Scratch.withDir(s"probe-orphan-$history-$orphans") { root =>
        import spark.implicits._
        graft.model.JobRegistry.register("probe_noop", _ => "ok")
        val t0v = 1700000000000L
        val backend = new graft.backend.ParquetBackend(spark, root)
        val retry = graft.model.RetryOpts()
        def jobs(from: Int, n: Int) =
          spark.range(from, from + n, 1, math.max(4, n / 12500)).map { i =>
            graft.model.Job(
              id = i.toString, executeFnSym = "probe_noop", argsJson = "[]",
              queue = "q", readyQueue = "q", priority = 0, enqueuedAt = t0v,
              scheduleRunAt = None, cronRunAt = None, batchId = None,
              retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())
          }
        val worker = new graft.worker.WorkerEngine(backend, spark, Nil, () => t0v)
        backend.enqueue(jobs(0, history))
        require(worker.runPass().succeeded == history) // the consumed past
        backend.enqueue(jobs(history, orphans)) // the crashed pass's attempts
        val t0 = System.nanoTime()
        require(worker.runPass().succeeded == orphans) // replay ONLY orphans
        (System.nanoTime() - t0) / 1e9
      }
    if (laneOn("orphan")) locally {
      val h1 = math.min(timeOrphanRecovery(50000, 100), timeOrphanRecovery(50000, 100))
      val h10 = math.min(timeOrphanRecovery(500000, 100), timeOrphanRecovery(500000, 100))
      sb.append(f"| orphan recovery (100 orphans; 50k → 500k completed history) | $h1%.2f | $h10%.2f | ${h10 / h1}%.1f× | cost tracks orphans, not history |\n")
      println(f"PROBE orphanHistory: $h1%.2fs -> $h10%.2fs (${h10 / h1}%.1fx)")
      val o1 = math.min(timeOrphanRecovery(50000, 100), timeOrphanRecovery(50000, 100))
      val o10 = math.min(timeOrphanRecovery(50000, 10000), timeOrphanRecovery(50000, 10000))
      sb.append(f"| orphan recovery (50k history; 100 → 10k orphans) | $o1%.2f | $o10%.2f | ${o10 / o1}%.1f× | 100× the orphans for ${o10 / o1}%.1f× the wall — per-orphan cost amortizes |\n")
      println(f"PROBE orphanCount: $o1%.2fs -> $o10%.2fs (${o10 / o1}%.1fx)")
    }

    // RocksDB state store at 100k → 1M distinct streaming-dedup keys:
    // the oracle-gated streaming fixtures run under this provider
    // (EngineE2E.drainAndRollup) at fixture cardinality; this prices it
    // at state sizes where the default HDFS-backed provider would hold
    // the whole map in executor heap. dropDuplicates keeps ONE state row
    // per distinct key, so 1M keys ⇒ 1M-entry RocksDB state across the
    // stream's partitions — per-key cost should hold ~flat (time ratio
    // ≈ 10 at 10× keys), with state off-heap, which is exactly the
    // property the 100 TB/day scaladoc claim rests on.
    def timeRocksState(nKeys: Int): Double =
      graft.Scratch.withDir(s"probe-rocks-$nKeys") { root =>
        spark.range(0, nKeys, 1, 32)
          .selectExpr("id AS k",
            "timestamp_seconds(1700000000 + id % 3600) AS ts")
          .write.parquet(s"$root/in")
        val confs = Seq(
          "spark.sql.shuffle.partitions" -> "8",
          "spark.sql.streaming.stateStore.providerClass" ->
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val t0 = System.nanoTime()
          val q = spark.readStream
            .schema("k LONG, ts TIMESTAMP")
            .parquet(s"$root/in")
            .withWatermark("ts", "2 hours")
            .dropDuplicates("k")
            .writeStream
            .format("noop")
            .option("checkpointLocation", s"$root/ckpt")
            .start()
          try q.processAllAvailable() finally q.stop()
          (System.nanoTime() - t0) / 1e9
        } finally prev.foreach { case (k, old) =>
          old.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
        }
      }
    if (laneOn("rocks")) locally {
      val r1 = math.min(timeRocksState(100000), timeRocksState(100000))
      val r10 = math.min(timeRocksState(1000000), timeRocksState(1000000))
      sb.append(f"| streaming dedup state, RocksDB provider (100k → 1M distinct keys) | $r1%.2f | $r10%.2f | ${r10 / r1}%.1f× | off-heap state, one row per key |\n")
      println(f"PROBE rocksState: $r1%.2fs -> $r10%.2fs (${r10 / r1}%.1fx)")
    }

    // Per-call tiny-file accumulation: the direct-append latency path's
    // failure mode at scale is not write speed but READ amplification —
    // K one-row part files per table until compaction folds them. Price
    // the visible-set read at K accumulated per-call files, then after
    // one compact() — the number that justifies the worker's
    // file-count-pressure compaction policy (compactMinFiles).
    if (laneOn("tinyfile")) locally {
      graft.Scratch.withDir("probe-tinyfiles") { root =>
        val backend = new graft.backend.ParquetBackend(spark, root)
        val t0v = 1700000000000L
        val retry = graft.model.RetryOpts()
        var i = 0
        val w0 = System.nanoTime()
        while (i < 2000) {
          backend.enqueueRows(Seq(graft.model.Job(
            id = i.toString, executeFnSym = "noop", argsJson = "[]",
            queue = "q", readyQueue = "q", priority = 0, enqueuedAt = t0v,
            scheduleRunAt = None, cronRunAt = None, batchId = None,
            retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())))
          i += 1
        }
        val perCallMs = (System.nanoTime() - w0) / 1e6 / 2000
        def timeRead(): Double = {
          val t0 = System.nanoTime()
          require(backend.readyJobs.count() == 2000)
          (System.nanoTime() - t0) / 1e9
        }
        val rBefore = math.min(timeRead(), timeRead())
        backend.compact("ready")
        val rAfter = math.min(timeRead(), timeRead())
        sb.append(f"| per-call tiny-file read amplification (2k one-row files → one compact) | $rBefore%.2f | $rAfter%.2f | ${rBefore / rAfter}%.1f× recovered | append ~$perCallMs%.1f ms/call; compaction is the policy that caps K |\n")
        println(f"PROBE tinyFiles: read $rBefore%.2fs -> $rAfter%.2fs after compact (append $perCallMs%.1f ms/call)")
      }
    }

    // Retention (VERDICT r9 stretch #8 / r10 #9): the two logs that grow
    // with WORK DONE rather than work pending are completions and
    // tombstones — every consumed job leaves a completion row, every
    // delete/promote leaves a tombstone, and the hot visibility read
    // (readyJobs = log MINUS completions MINUS tombstones) anti-joins
    // BOTH. This prices that read with a constant 1k-job live set while
    // consumed history grows 10× (50k → 500k), then after the retention
    // mechanism (compact("ready") folds the log to survivors and shrinks
    // completions to survivor ∪ live-batch rows) — the number that says
    // how often a 100 TB deployment must compact to keep dequeue latency
    // flat, and what it buys back.
    def timeVisibilityRead(history: Int): (Double, Double) =
      graft.Scratch.withDir(s"probe-retention-$history") { root =>
        import spark.implicits._
        graft.model.JobRegistry.register("probe_noop", _ => "ok")
        val t0v = 1700000000000L
        val backend = new graft.backend.ParquetBackend(spark, root)
        val retry = graft.model.RetryOpts()
        def jobs(from: Int, n: Int) =
          spark.range(from, from + n, 1, math.max(4, n / 12500)).map { i =>
            graft.model.Job(
              id = i.toString, executeFnSym = "probe_noop", argsJson = "[]",
              queue = "q", readyQueue = "q", priority = 0, enqueuedAt = t0v,
              scheduleRunAt = None, cronRunAt = None, batchId = None,
              retryOpts = retry, state = None, seq = graft.model.Job.nextSeq())
          }
        val worker = new graft.worker.WorkerEngine(backend, spark, Nil, () => t0v)
        backend.enqueue(jobs(0, history))
        require(worker.runPass().succeeded == history) // the consumed past
        backend.enqueue(jobs(history, 1000)) // the constant live set
        def timeRead(): Double = {
          val t0 = System.nanoTime()
          require(backend.readyJobs.count() == 1000)
          (System.nanoTime() - t0) / 1e9
        }
        val before = math.min(timeRead(), timeRead())
        backend.compact("ready")
        val after = math.min(timeRead(), timeRead())
        (before, after)
      }
    if (laneOn("visibility")) locally {
      val (h1, c1) = timeVisibilityRead(50000)
      val (h10, c10) = timeVisibilityRead(500000)
      sb.append(f"| visibility read, 1k live jobs (50k → 500k consumed history, pre-compact) | $h1%.2f | $h10%.2f | ${h10 / h1}%.1f× | completions+tombstone anti-joins scan history |\n")
      sb.append(f"| visibility read, 1k live jobs (same, post-compact) | $c1%.2f | $c10%.2f | ${c10 / c1}%.1f× | compaction shrinks completions to survivors — read cost restored |\n")
      println(f"PROBE retentionRead: pre $h1%.2fs -> $h10%.2fs (${h10 / h1}%.1fx); post-compact $c1%.2fs -> $c10%.2fs")
    }
    } // subset.isEmpty

    // Preserve hand-curated analysis sections across regenerations: any
    // existing content from the marker on is re-appended verbatim (the
    // r8 full-run regeneration silently dropped five curated sections —
    // per-call latency profile, tail-anomaly closure, console-load
    // table, MinHash A/B, the regex-concurrency finding).
    val out = Paths.get(outFile)
    if (Files.exists(out)) {
      val existing = Files.readString(out)
      val at = existing.indexOf(ManualMarker)
      if (at >= 0) sb.append("\n").append(existing.substring(at))
    }
    Files.writeString(out, sb.toString)
    spark.stop()
  }

  /** Everything from this line on in an existing SCALING*.md is manual
    * analysis and survives regeneration. */
  private val ManualMarker = "<!-- MANUAL SECTIONS — preserved across ScaleProbe regenerations -->"
}
