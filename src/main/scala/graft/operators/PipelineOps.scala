package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.RegexpFunctions.regexp_count_fast

/** The composed training-data cleaning pipeline — the operator a 100 TB
  * pretraining run actually calls, chaining the individual kernels
  * (TextOps lang-ID/quality, DedupOps exact/LSH/contamination) into one
  * staged funnel:
  *
  *   all → lang-ID filter → quality threshold → exact dedup (keep-first)
  *       → LSH near-dup removal (skew-guarded + Jaccard-verified)
  *       → decontamination (held-out sources excluded; training docs
  *         with heavy eval-shingle overlap dropped)
  *
  * Every stage is a pure DataFrame transform on the previous stage's
  * survivors — so filters/pruning reach the scan, and the expensive
  * stages (shingling, LSH) run on the REDUCED corpus, the ordering any
  * production pipeline uses. Output is the funnel: per-stage survivor
  * counts, verified exactly by a DuckDB oracle composing the same
  * kernels (C4/Gopher-style pipeline shape; PAPERS.md).
  */
object PipelineOps {

  private val QualityMinBp = 6000L
  // verify threshold in basis points — all-integer compare, shared with
  // the DedupOps kernel (the t18 rule; see DedupOps.NearDupBp)
  private val NearDupBp = DedupOps.NearDupBp
  private val ContaminationMax = 0.5
  private val EvalSources = Seq("src0", "src1")

  /** Decontamination shingle length: LONG (≈8-word) n-grams, the
    * standard eval-decontamination granularity — the 8-char dedup
    * shingles are far too generic (on this corpus every doc shares >70%
    * of its 8-grams with something; at 40 chars only true near-copies of
    * held-out text match). */
  private val ContamShingleLen = 40

  private def contamShingled(docs: DataFrame): DataFrame =
    docs
      .withColumn("g", explode(sequence(lit(1),
        greatest(length(col("text")) - (ContamShingleLen - 1), lit(1)))))
      .withColumn("sh", col("text").substr(col("g"), lit(ContamShingleLen)))

  /** Per-doc DISTINCT contamination-shingle hashes as one map-side array
    * expression (r15, guide §2.3/§2.4): transform over the positions,
    * xxhash64 at the scan, array_distinct — so the per-doc overlap agg
    * downstream needs no countDistinct (no Expand doubling the exchange)
    * and partial-aggregates to one row per doc before any shuffle.
    * Element-set-identical to `xxhash64(sh)` over [[contamShingled]]. */
  private def contamHashSet: Column =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length(text) - ${ContamShingleLen - 1}, 1))," +
        s" g -> xxhash64(substring(text, g, $ContamShingleLen)))"))

  // ---- stage kernels (the t01/t02/t04 formulas, inlined on a column) ----

  private val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|a)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein)\\b",
    "es" -> "\\b(el|la|los|de|que|es|un)\\b",
    "fr" -> "\\b(le|la|les|des|est|une|et)\\b")

  private def scoreCol(pat: String): Column =
    regexp_count_fast(lower(col("text")), pat)

  /** t01's argmax language heuristic as a single predicate: doc is 'en'. */
  private def isEnglish: Column = {
    val best = greatest(langPatterns.map(lp => scoreCol(lp._2)): _*)
    best > 0 && scoreCol(langPatterns.head._2) === best
  }

  /** t02's quality score in basis points. */
  private def qualityBp: Column = {
    val nTok = regexp_count_fast(col("text"), "\\S+").cast("double")
    val nPunct = regexp_count_fast(col("text"), "[^a-zA-Z0-9\\s]").cast("double")
    val nStop = scoreCol(langPatterns.head._2).cast("double")
    floor(
      (least(col("n_chars") / 500.0, lit(1.0)) * 0.4
        + (lit(1.0) - least(nPunct / greatest(nTok, lit(1.0)), lit(1.0))) * 0.3
        + least(nStop / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)) * 0.3) * 10000)
      .cast("long")
  }

  /** Per-source sampling weights for p02 (a training-mixture config: keep
    * all of the curated source, down-sample the rest). Unlisted sources
    * get [[DefaultWeight]]. */
  private val MixWeights: Seq[(String, Double)] =
    Seq("src0" -> 1.0, "src1" -> 0.6, "src2" -> 0.3)
  private val DefaultWeight = 0.1

  /** Weight fraction → 8-hex-digit threshold. A doc survives when the
    * first 8 hex chars of md5(doc_id) sort below the threshold —
    * lexicographic compare of lowercase hex is identical in Spark and
    * DuckDB, so the sample is deterministic and engine-exact (no RNG, no
    * integer-conversion dialect differences). f=1.0 clamps to "ffffffff"
    * (drops a doc only on an exact-max prefix, p≈2^-32, identically in
    * both engines). */
  private def thresholdHex(f: Double): String =
    f"${math.min((f * 4294967296.0).toLong, 0xffffffffL)}%08x"

  /** Context length (in whitespace tokens) for the p03 packing plan. */
  private val ContextLen = 256L

  /** p07 target sample size (docs) across all sources. */
  private val MixTargetN = 200.0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_clean_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)

      // Funnel head counts RIDE the s3 checkpoint job as an Observation
      // (r16, the executeBatchInner discipline): the observe node sits
      // below the filters, so the checkpoint's one corpus scan counts
      // all docs / lang survivors / quality survivors as a side effect.
      // The old shape re-scanned the whole corpus (7 regexp counters per
      // doc — the scan's dominant cost) inside the final funnel-union
      // job just to produce c1-c3; the flags are also now computed ONCE
      // per doc (projected columns feed both the counters and the
      // filters) instead of once in the filter and again in the count
      // scan.
      val headObs = new org.apache.spark.sql.Observation(
        s"graft-p01-head-${java.util.UUID.randomUUID().toString.take(8)}")
      val flagged = docs
        .withColumn("f_lang", isEnglish)
        .withColumn("f_q", qualityBp >= QualityMinBp)
        .observe(headObs,
          count(lit(1)).as("c1"),
          sum(when(col("f_lang"), 1L).otherwise(0L)).as("c2"),
          sum(when(col("f_lang") && col("f_q"), 1L).otherwise(0L)).as("c3"))
      val s2 = flagged.filter(col("f_lang") && col("f_q")).drop("f_lang", "f_q")

      // exact dedup keep-first on whitespace-normalized fingerprint (t04/d02)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(regexp_replace(lower(col("text")), "\\s+", " ")))
        .orderBy(col("doc_id").asc)
      val s3 = s2.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint(true) // shared by LSH sides + later stages

      // near-dup removal: verified pairs on the REDUCED corpus; the
      // higher doc_id of each verified pair is dropped (the d10 kernel:
      // guarded candidates, exact Jaccard over candidate docs only)
      // signatures checkpointed BEFORE the candidate generator: its band
      // frame is consumed twice (width census + guarded join), and a lazy
      // signature plan would re-run the per-doc MinHash-md5 pass — the
      // single most expensive projection in the funnel — once per
      // consumption (the exact d10 discipline, DedupOps.scala:176)
      val sig = DedupOps.signatures(s3).localCheckpoint(true)
      val cand = DedupOps.guardedCandidatePairs(sig)
      val verified = DedupOps.candidateIntersections(s3, cand)
        .withColumn("jac_bp", DedupOps.jacBpCol)
        .filter(col("jac_bp") >= NearDupBp)
        .select(col("d2").as("dup_id")).distinct()
      val s4 = s3.join(verified, s3("doc_id") === verified("dup_id"), "left_anti")
        .localCheckpoint(true)

      // decontamination (d11 inverted): held-out sources leave the
      // training set entirely; a surviving training doc is dropped when
      // ≥ ContaminationMax of its distinct shingles appear in ANY
      // held-out doc. Pure equi-join on shingle, no pairwise work.
      // both sides reduce 40-char shingles to xxhash64 before the
      // distinct+join: 5× less shuffle than raw strings; per-doc distinct
      // counts (and thus ratios) are unchanged short of an in-doc
      // collision (~n²/2⁶⁴ — the d06 argument)
      val evalShingles = docs.filter(col("source").isin(EvalSources: _*))
        .select(explode(contamHashSet).as("esh")).distinct()
      val trainDocs = s4.filter(!col("source").isin(EvalSources: _*))
      // the held-out shingle set is bounded by construction (eval corpora
      // are small), so BROADCAST it: the training side then needs exactly
      // one shuffle (the per-doc agg). r15: both sides explode the
      // PER-DOC-DISTINCT hash array (contamHashSet), so the overlap agg
      // is a plain count + conditional sum over already-distinct rows —
      // no countDistinct, no Expand, and the agg partial-aggregates to
      // one row per doc map-side before the exchange. Ratios are
      // value-identical: over distinct (doc, sh) rows,
      // countDistinct(sh) = count(*) and countDistinct(matched sh) =
      // sum(matched), and the eval set is distinct so the left join
      // never fans a row out.
      val contaminated = trainDocs
        .select(col("doc_id"), explode(contamHashSet).as("sh"))
        .join(broadcast(evalShingles), col("sh") === col("esh"), "left")
        .groupBy("doc_id")
        .agg(round(sum(when(col("esh").isNotNull, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 4).as("overlap"))
        .filter(col("overlap") >= ContaminationMax)
        .select(col("doc_id").as("c_id"))
      val s5 = trainDocs.join(contaminated, trainDocs("doc_id") === contaminated("c_id"), "left_anti")

      // funnel counts: stages 1-3 resolved from the s3 checkpoint's
      // Observation (one corpus scan, already paid above — r16); stages
      // 4-6 count their checkpointed frames. The head rows become a
      // LocalRelation, so the final union job runs only the three tail
      // counts.
      val headRow = headObs.getAsJava
      // sum() over zero rows observes NULL — an empty corpus must still
      // produce the three zero-count stage rows
      def n(k: String): Long =
        Option(headRow.get(k)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val head3 = Seq(s.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row("1_all", n("c1")),
        org.apache.spark.sql.Row("2_lang", n("c2")),
        org.apache.spark.sql.Row("3_quality", n("c3"))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("stage",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType, nullable = false)))))
      val tail3 = Seq("4_exact_dedup" -> s3, "5_near_dedup" -> s4, "6_decontaminated" -> s5)
        .map { case (n, df) =>
          df.agg(count(lit(1)).as("n_docs")).select(lit(n).as("stage"), col("n_docs"))
        }
      (head3 ++ tail3).reduce(_.unionByName(_))
        .select("stage", "n_docs").orderBy("stage")
    }),

    // Temperature-scaled source mixing — the multilingual-LM rebalancing
    // knob (sampling probability ∝ count^α, α = 0.5): big sources are
    // downweighted, small ones upweighted, rates COMPUTED from the data
    // rather than p02's fixed table. Engine-parity discipline: weights
    // are sqrt(n) quantized to integers (×1e6, floored) so the
    // cross-source sum is exact integer arithmetic — order-independent
    // across Spark partial aggregation and DuckDB — and every float op
    // after that is written in the same left-to-right order in both
    // engines. Selection reuses p02's md5-prefix threshold (hex-string
    // compare ≡ numeric compare), so the sample is deterministic across
    // reruns AND engines. One agg + a broadcast of |sources| rows back
    // onto the scan: map-side at any corpus size.
    "p07_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs")) * 1e6).cast("long"))
      val totw = counts.agg(sum("w").as("totw"))
      val rates = counts.crossJoin(broadcast(totw))
        .withColumn("rate",
          least(lit(MixTargetN) * col("w") / col("totw") / col("n_docs"), lit(1.0)))
        .withColumn("thr", lower(lpad(conv(
          least(floor(col("rate") * 4294967296.0), lit(4294967295.0))
            .cast("long").cast("string"), 10, 16), 8, "0")))
        .select("source", "n_docs", "rate", "thr")
      docs.join(broadcast(rates), Seq("source"))
        .withColumn("keep",
          substring(md5(col("doc_id").cast("string")), 1, 8) < col("thr"))
        .groupBy("source")
        .agg(first("n_docs").as("n_docs"),
          floor(first("rate") * 10000.0).cast("long").as("rate_bp"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // Deterministic weighted source mixing — the data-mixing pass that
    // turns a raw crawl into a training mixture (Pile/Dolma-style per-
    // source weights). Hash-threshold sampling: no RNG, no shuffle of the
    // kept rows, reproducible across reruns AND across engines — the
    // property a 100 TB ingest needs so that retries and backfills select
    // the same docs. One scan, map-side filter, one grouped agg.
    "p02_source_mixing" -> ((s, d) => {
      val thr = MixWeights.foldRight(lit(thresholdHex(DefaultWeight)): Column) {
        case ((src, f), acc) =>
          when(col("source") === src, thresholdHex(f)).otherwise(acc)
      }
      val keep = substring(md5(col("doc_id").cast("string")), 1, 8) < thr
      val nTok = regexp_count_fast(col("text"), "\\S+")
      Tables.documents(s, d)
        .withColumn("keep", keep).withColumn("n_tok", nTok)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("tokens_sampled"))
        .withColumn("sampled_bp",
          floor(col("n_sampled") * 10000.0 / col("n_docs")).cast("long"))
        .orderBy("source")
    }),

    // Concat-and-chunk packing plan — GPT-style sequence packing: docs
    // concatenate in a deterministic order (doc_id within source) and
    // split into fixed ContextLen windows. The per-doc window span falls
    // out of a prefix-sum window function (one shuffle, partitioned by
    // source — at 100 TB the partition key is the shard, so state per
    // partition stays bounded). Output: per-source shard plan — window
    // count, boundary-split docs, utilization.
    "p03_pack_stats" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val nTok = regexp_count_fast(col("text"), "\\S+").cast("long")
      Tables.documents(s, d)
        .withColumn("n_tok", nTok)
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("first_w", floor((col("cum") - col("n_tok")) / ContextLen.toDouble))
        .withColumn("last_w", floor((col("cum") - 1) / ContextLen.toDouble))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"),
          sum(when(col("last_w") > col("first_w"), 1L).otherwise(0L)).as("split_docs"))
        .withColumn("n_windows", expr(s"(total_tokens + ${ContextLen - 1}) div $ContextLen"))
        .withColumn("util_bp",
          floor(col("total_tokens") * 10000.0 / (col("n_windows") * ContextLen)).cast("long"))
        .select("source", "n_docs", "total_tokens", "n_windows", "split_docs", "util_bp")
        .orderBy("source")
    }),

    // Deterministic output-shard plan — the write layout of a 100 TB
    // ingest: every doc lands in shard = last md5 nibble of its id (16
    // shards here; a prefix of more nibbles scales the fan-out). Content
    // hashing (not round-robin) keeps placement stable across reruns and
    // backfills, and the per-shard stats below ARE the skew audit you
    // run before committing a layout: docs, tokens, and source spread
    // per shard. One scan, one grouped agg — shard assignment is a
    // scan-local expression, so at scale this is `write.partitionBy`.
    "p04_shard_plan" -> ((s, d) => {
      val nTok = regexp_count_fast(col("text"), "\\S+").cast("long")
      Tables.documents(s, d)
        .withColumn("shard",
          conv(substring(md5(col("doc_id").cast("string")), 32, 1), 16, 10).cast("long"))
        .withColumn("n_tok", nTok)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("shard")
    }),

    // Per-source quantile gate — "keep docs at or above their source's
    // median length" (the relative form of a Gopher length filter: an
    // absolute threshold misfits sources with different length regimes).
    // Exact interpolated percentile (percentile_cont semantics on both
    // engines), broadcast back onto the scan; integer token counts make
    // the median exactly representable, so the >= compare is engine-safe.
    "p05_quantile_filter" -> ((s, d) => {
      val nTok = regexp_count_fast(col("text"), "\\S+").cast("double")
      val docs = Tables.documents(s, d).withColumn("n_tok", nTok)
      val med = docs.groupBy("source")
        .agg(expr("percentile(n_tok, 0.5)").as("med"))
      docs.join(broadcast(med), "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tok") >= col("med"), 1L).otherwise(0L)).as("n_kept"),
          round(min("med"), 1).as("median_tok"))
        .orderBy("source")
    }),

    // Doc-length histogram, log2-bucketed — the distribution you inspect
    // BEFORE choosing any length threshold (absolute or quantile). Bucket
    // = floor(log2(tokens)), a scan-local integer expression; one grouped
    // agg, engine-exact because the bucket edges are powers of two
    // (log2 of an exact power is exact in IEEE double on both engines —
    // and floor() beside a boundary only sees exact inputs).
    "p06_length_histogram" -> ((s, d) => {
      val nTok = regexp_count_fast(col("text"), "\\S+").cast("double")
      Tables.documents(s, d)
        .withColumn("bucket",
          floor(log2(greatest(nTok, lit(1.0)))).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("bucket")
    }),

    // Multi-epoch repetition schedule — the data-recipe pass that decides
    // how many times each source repeats in a token-budgeted mix (the
    // Llama/Pile-style "epochs per source" table). Each source's budget
    // is an equal integer share of the corpus total; full epochs are the
    // integer quotient, and the fractional remainder epoch takes the
    // doc_id-ordered PREFIX whose cumulative tokens fit — deterministic
    // order, pure integer arithmetic, no sampling noise anywhere, so
    // reruns and backfills repeat the exact schedule. One token-count
    // scan + one windowed prefix-sum per source (the shard key at scale),
    // one grouped rollup.
    "p08_epoch_schedule" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val nTok = regexp_count_fast(col("text"), "\\S+").cast("long")
      val docs = Tables.documents(s, d).withColumn("n_tok", nTok)
        .withColumn("cum", sum(col("n_tok")).over(w))
      val perSource = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
      val budget = perSource.agg(expr("sum(tokens) div count(1)").as("budget"))
      val sched = perSource.crossJoin(broadcast(budget))
        .withColumn("epochs_full", expr("budget div tokens"))
        .withColumn("rem_tokens", col("budget") % col("tokens"))
      docs.join(broadcast(sched.select("source", "rem_tokens")), "source")
        .withColumn("in_frac", col("cum") <= col("rem_tokens"))
        .groupBy("source")
        .agg(sum(when(col("in_frac"), 1L).otherwise(0L)).as("frac_docs"),
          sum(when(col("in_frac"), col("n_tok")).otherwise(0L)).as("frac_tokens"))
        .join(sched.drop("budget"), "source")
        .select("source", "n_docs", "tokens", "epochs_full", "rem_tokens",
          "frac_docs", "frac_tokens")
        .orderBy("source")
    }),

    // DSIR-style importance resampling (Xie et al. 2023: Data Selection
    // for LMs via Importance Resampling) — select raw-corpus docs whose
    // hashed-n-gram profile looks like a target (curated) distribution.
    // Features: bigrams hashed into 256 buckets (first md5 hex pair —
    // engine-identical). Per-bucket importance ratio p_target/q_raw with
    // add-one smoothing, rendered in integer basis points:
    //   w_bp = (tc+1)(R+256)·10⁴ div (rc+1)(T+256)
    // (exact bigint arithmetic — the paper's log-likelihood ratio sums
    // become an arithmetic mean of per-instance ratios, the engine-exact
    // rendering; at a real 100 TB scale the products approach int64
    // range and the weights would move to double log-space, keeping this
    // integer form for the correctness gate). Doc score = mean w_bp over
    // its bigram instances (integer div); acceptance is the p02/p07
    // deterministic md5-threshold with rate = min(score, 2·10⁴)/2·10⁴ —
    // i.e. docs scoring ≥2× target-like are always kept, others kept
    // proportionally — so the sample reproduces across reruns AND
    // engines, no RNG. Plan shape: one bigram extraction feeds both the
    // 256-row weight table (broadcast back) and scoring — map-side
    // everywhere, one content-keyed exchange for the per-doc mean.
    "p09_dsir_resample" -> ((s, d) => {
      val isTarget = col("source").isin(EvalSources: _*)
      val big = Tables.documents(s, d)
        .withColumn("arr", split(col("text"), "\\s+"))
        .select(col("doc_id"), col("source"), explode(expr(
          "zip_with(slice(arr, 1, size(arr)-1), slice(arr, 2, size(arr)-1)," +
            " (a, b) -> concat(a, ' ', b))")).as("bg"))
        .withColumn("bucket", substring(md5(col("bg")), 1, 2))
        // project the bigram STRING away before the checkpoint: only the
        // 2-hex bucket is consumed downstream, and the checkpointed rows
        // feed two exchanges (r15, guide §2.3 — project before the
        // exchange)
        .select("doc_id", "source", "bucket")
        .localCheckpoint(true) // one extraction feeds weights AND scoring
      val bcnt = big.groupBy("bucket").agg(
        sum(when(isTarget, 1L).otherwise(0L)).as("tc"),
        sum(when(!isTarget, 1L).otherwise(0L)).as("rc"))
      val weights = bcnt.crossJoin(broadcast(
          bcnt.agg(sum("tc").as("tt"), sum("rc").as("rt"))))
        .withColumn("w_bp",
          expr("((tc + 1) * (rt + 256) * 10000) div ((rc + 1) * (tt + 256))"))
        .select("bucket", "w_bp")
      val scored = big.filter(!isTarget)
        .join(broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_big"), sum("w_bp").as("sw"))
        .withColumn("avg_w_bp", expr("sw div n_big"))
      scored
        .withColumn("thr", lower(lpad(conv(
          least(expr("least(avg_w_bp, 20000) * 4294967296 div 20000"),
            lit(4294967295L)).cast("string"), 10, 16), 8, "0")))
        .withColumn("keep",
          substring(md5(col("doc_id").cast("string")), 1, 8) < col("thr"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("avg_w_bp").as("sum_avg_w_bp"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // Dedup-discounted mixture budget — the "what will training actually
    // see" sheet that reconciles the p02 mixture config with the dedup
    // pass it runs after: per source, the raw volume, the keep-first
    // UNIQUE volume (corpus-wide md5 fingerprint, min doc_id wins, so a
    // cross-source duplicate is charged to the source holding the
    // canonical copy), and the mixture weight applied to the unique
    // tokens — the effective budget a sampler can still draw. A source
    // whose tokens_raw ≫ tokens_unique is buying weight with copies.
    // One content-keyed window + one rollup; all-integer arithmetic
    // (weights in basis points), so no float boundary splits engines.
    "p11_dedup_discounted_mix" -> ((s, d) => {
      val wBp = MixWeights.foldRight(
        lit((DefaultWeight * 10000).toLong): Column) {
        case ((src, f), acc) =>
          when(col("source") === src, lit((f * 10000).toLong)).otherwise(acc)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      Tables.documents(s, d)
        .withColumn("fp", md5(col("text")))
        .withColumn("n_tok", regexp_count_fast(col("text"), "\\S+").cast("long"))
        .withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("tokens_raw"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_unique"),
          sum(when(col("rn") === 1, col("n_tok")).otherwise(0L)).as("tokens_unique"))
        .withColumn("weight_bp", wBp)
        .withColumn("effective_tokens",
          floor(col("tokens_unique") * col("weight_bp") / 10000.0).cast("long"))
        .orderBy("source")
    }),

    // Curriculum-phase plan — order the corpus into four training phases
    // by a data-measured difficulty signal (char entropy: low-entropy
    // repetitive/templated text first, high-entropy dense text last —
    // the curriculum-learning recipe, with the same knob usable for the
    // reverse/anti-curriculum read). Phase boundaries are the corpus's
    // EXACT interpolated entropy quartiles (the p05 percentile pattern,
    // one 3-value row broadcast back onto the scan) — NOT a global rank
    // window, which would funnel the corpus through one partition at
    // scale; the assignment is a scan-local compare. Entropies are
    // rounded(6) BEFORE the percentile on both engines, so thresholds
    // and compares see identical doubles. Output: per (phase, source)
    // docs + chars and the phase's entropy range — the sheet a phased
    // training run schedules from.
    "p12_curriculum_phases" -> ((s, d) => {
      val ent = Tables.documents(s, d)
        .withColumn("ent",
          round(graft.functions.EntropyFunctions.char_entropy(col("text")), 6))
      val qs = ent.agg(
        expr("percentile(ent, 0.25)").as("q1"),
        expr("percentile(ent, 0.5)").as("q2"),
        expr("percentile(ent, 0.75)").as("q3"))
      ent.crossJoin(broadcast(qs))
        .withColumn("phase",
          when(col("ent") < col("q1"), 0L)
            .when(col("ent") < col("q2"), 1L)
            .when(col("ent") < col("q3"), 2L)
            .otherwise(3L))
        .groupBy("phase", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("ent").as("min_ent"),
          max("ent").as("max_ent"))
        .orderBy("phase", "source")
    }),

    // Leakage-safe train/validation split — the assignment rule that
    // prevents the classic eval-contamination bug: hash the CONTENT
    // fingerprint, not the doc id, so every copy of a duplicated doc
    // lands on the same side (an id-keyed split scatters copies across
    // the boundary and the model "generalizes" to its own training
    // set). 10% validation by the first md5 byte of the content hash —
    // p02's deterministic hash-threshold rule, scan-local, no RNG.
    // Output per source: both splits' doc/token books PLUS the audit
    // both rules are judged by: distinct fingerprints that appear on
    // BOTH sides under the content split (structurally 0) and under the
    // id split (>0 whenever dups exist — the leak, quantified). A real
    // pipeline ships the assignment column; the audit is the proof.
    "p14_leakage_safe_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("fp", md5(col("text")))
        .withColumn("n_tok", regexp_count_fast(col("text"), "\\S+").cast("long"))
        .withColumn("val_content", substring(col("fp"), 1, 2) < "1a")
        .withColumn("val_id",
          substring(md5(col("doc_id").cast("string")), 1, 2) < "1a")
      // the leak audit is GLOBAL per fingerprint (the dangerous copies
      // are the cross-source ones — a per-source grouping would hide
      // exactly them); each leaked fingerprint is charged to its
      // canonical holder, the min-doc_id copy's source (p11's rule)
      val leaks = docs.groupBy("fp")
        .agg(expr("min_by(source, doc_id)").as("source"),
          countDistinct(col("val_content")).as("sides_content"),
          countDistinct(col("val_id")).as("sides_id"))
        .groupBy("source")
        .agg(sum(when(col("sides_content") > 1, 1L).otherwise(0L)).as("leaked_content"),
          sum(when(col("sides_id") > 1, 1L).otherwise(0L)).as("leaked_id"))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("val_content"), 1L).otherwise(0L)).as("n_val"),
          sum(when(col("val_content"), col("n_tok")).otherwise(0L)).as("val_tokens"),
          sum(when(!col("val_content"), col("n_tok")).otherwise(0L)).as("train_tokens"))
        .join(leaks, Seq("source"), "left_outer")
        .na.fill(0L, Seq("leaked_content", "leaked_id"))
        .orderBy("source")
    }),

    // UniMax budget allocation (Chung et al. 2023) — the epochs-capped
    // uniform mixture: spend a token budget as evenly as possible across
    // sources, but never repeat a source past MaxEpochs epochs of its
    // UNIQUE tokens (p11's dedup-discounted census — copies don't buy
    // capacity). Closed-form water-filling instead of the paper's loop:
    // sources sorted by capacity ascending saturate in a PREFIX (proof:
    // the saturation test c_i·(n−i+1) ≤ B − Σ_{j<i}c_j is downward
    // closed under the sort), so one cumulative-sum window over the
    // SOURCES-sized rollup decides every source, and the unsaturated
    // rest split the remainder by integer division. All-integer
    // arithmetic end-to-end; the windows run over one row per source
    // (bounded registry cardinality, the fireCron rule), never the
    // corpus. Budget = 19/20 of total capacity, so the small-capacity
    // prefix genuinely saturates and the sheet shows both regimes.
    "p13_unimax_mix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val E = 4L
      val u = Tables.documents(s, d)
        .withColumn("fp", md5(col("text")))
        .withColumn("n_tok", regexp_count_fast(col("text"), "\\S+").cast("long"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .groupBy("source")
        .agg(sum(when(col("rn") === 1, col("n_tok")).otherwise(0L)).as("u_tokens"))
        .withColumn("capacity", col("u_tokens") * E)
      val tot = u.agg(sum("capacity").as("cap_total"),
        count(lit(1)).as("n_src"))
      val w = Window.orderBy("capacity", "source")
      val ranked = u.crossJoin(broadcast(tot))
        .withColumn("budget", expr("cap_total * 19 div 20"))
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cumc_prev", coalesce(
          sum("capacity").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("saturated",
          col("capacity") * (col("n_src") - col("i") + 1) <=
            col("budget") - col("cumc_prev"))
      val sat = ranked.agg(
        sum(when(col("saturated"), col("capacity")).otherwise(0L)).as("c_sat"),
        sum(when(col("saturated"), 1L).otherwise(0L)).as("k"))
      ranked.crossJoin(broadcast(sat))
        .withColumn("alloc_tokens", when(col("saturated"), col("capacity"))
          .otherwise(expr("(budget - c_sat) div greatest(n_src - k, 1)")))
        .withColumn("epochs_bp",
          floor(col("alloc_tokens") * 10000.0 / col("u_tokens")).cast("long"))
        .select(col("source"), col("u_tokens"), col("capacity"),
          col("saturated").cast("int").as("saturated"),
          col("alloc_tokens"), col("epochs_bp"))
        .orderBy("source")
    }),

    // Within-shard mixture audit — p04 plans the shard SIZES; this op
    // checks what training actually consumes: does EVERY shard carry the
    // global source mixture? A sequential trainer streaming shard 7 sees
    // only shard 7's mix, so a skewed shard silently reorders the
    // curriculum (the failure mode shard-shuffled writes exist to
    // prevent). Per shard: doc count, the worst single-source deviation
    // from the global mixture, and the L1 (total-variation·2) distance,
    // both in basis points. Determinism: each cell's deviation is
    // floor'd to integer bp BEFORE the per-shard sum, so the rollup is
    // integer arithmetic — no float-summation order sensitivity across
    // engines. Scale shape: one (shard, source)-keyed partial-agg
    // rollup over the corpus, then everything downstream is bounded —
    // 16 shards × sources cells via the broadcast grid, 1-row total
    // attach. A sparse cell (source absent from a shard) still charges
    // its full global share via the left_outer + fill.
    "p15_shard_balance" -> ((s, d) => {
      val cell = Tables.documents(s, d)
        .withColumn("shard",
          conv(substring(md5(col("doc_id").cast("string")), 32, 1), 16, 10).cast("long"))
        .groupBy("shard", "source").agg(count(lit(1)).as("n"))
      val shardTot = cell.groupBy("shard").agg(sum("n").as("st"))
      val srcTot = cell.groupBy("source").agg(sum("n").as("g"))
      val tot = srcTot.agg(sum("g").as("t"))
      shardTot.crossJoin(broadcast(srcTot))
        .join(cell, Seq("shard", "source"), "left_outer")
        .na.fill(0L, Seq("n"))
        .crossJoin(broadcast(tot))
        // |n/st - g/t| in bp, exactly: the numerator n·t - g·st is
        // integer (exact in doubles below 2^53), one floor'd division
        .withColumn("dev_bp",
          floor(abs(col("n") * col("t") - col("g") * col("st")) * 10000.0 /
            (col("st") * col("t"))).cast("long"))
        .groupBy("shard")
        .agg(max("st").as("n_docs"),
          max("dev_bp").as("max_dev_bp"),
          sum("dev_bp").as("l1_dev_bp"))
        .orderBy("shard")
    })
  )

  val oracles: Map[String, String] = Map(
    "p01_clean_corpus" -> {
      val scores = langPatterns.map { case (l, p) =>
        s"len(regexp_extract_all(lower(text), '$p', 1)) AS sc_$l"
      }.mkString(", ")
      val best = langPatterns.map(lp => s"sc_${lp._1}").mkString("greatest(", ", ", ")")
      val evalIn = EvalSources.map(s => s"'$s'").mkString(", ")
      val sigCols = (1 to DedupOps.NumHashes)
        .map(i => s"min(md5('$i' || sh)) AS h$i").mkString(", ")
      val bandsUnion = (1 to DedupOps.NumHashes)
        .map(i => s"SELECT doc_id, $i AS band, h$i AS h FROM sig")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH lang AS (
         |  SELECT *, $scores FROM documents),
         |s1 AS (
         |  SELECT * FROM (SELECT *, $best AS best FROM lang)
         |  WHERE best > 0 AND sc_en = best),
         |s2 AS (
         |  SELECT * FROM (
         |    SELECT *, CAST(FLOOR((
         |        least(n_chars / 500.0, 1.0) * 0.4
         |      + (1.0 - least(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]', 0))
         |          / CAST(greatest(len(regexp_extract_all(text, '\\S+', 0)), 1) AS DOUBLE), 1.0)) * 0.3
         |      + least(sc_en / CAST(greatest(len(regexp_extract_all(text, '\\S+', 0)), 1) AS DOUBLE) * 5.0, 1.0) * 0.3
         |      ) * 10000) AS BIGINT) AS score_bp FROM s1)
         |  WHERE score_bp >= $QualityMinBp),
         |s3 AS (
         |  SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn FROM s2)
         |  WHERE rn = 1),
         |shg AS (
         |  SELECT doc_id, substr(text, CAST(g AS INT), ${DedupOps.ShingleLen}) AS sh
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1, greatest(length(text) - ${DedupOps.ShingleLen - 1}, 1))) AS g
         |        FROM s3)),
         |sig AS (SELECT doc_id, $sigCols FROM shg GROUP BY doc_id),
         |bands AS (
         |  $bandsUnion),
         |narrow AS (SELECT band, h FROM bands GROUP BY band, h
         |           HAVING COUNT(*) <= ${DedupOps.MaxBandWidth}),
         |guarded AS (SELECT b.doc_id, b.band, b.h FROM bands b
         |            JOIN narrow n ON b.band = n.band AND b.h = n.h),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM guarded a JOIN guarded b ON a.band = b.band AND a.h = b.h
         |  WHERE a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list_distinct(list(sh)) AS shs FROM shg GROUP BY doc_id),
         |dups AS (
         |  SELECT DISTINCT c.d2 AS dup_id
         |  FROM cand c JOIN sets a ON c.d1 = a.doc_id JOIN sets b ON c.d2 = b.doc_id
         |  WHERE len(list_intersect(a.shs, b.shs)) * 10000
         |    >= $NearDupBp * (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)))),
         |s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT dup_id FROM dups)),
         |evalsh AS (
         |  SELECT DISTINCT substr(text, CAST(g AS INT), $ContamShingleLen) AS esh
         |  FROM (SELECT text,
         |          unnest(generate_series(1, greatest(length(text) - ${ContamShingleLen - 1}, 1))) AS g
         |        FROM documents WHERE source IN ($evalIn))),
         |train AS (SELECT * FROM s4 WHERE source NOT IN ($evalIn)),
         |trainsh AS (
         |  SELECT DISTINCT doc_id, substr(text, CAST(g AS INT), $ContamShingleLen) AS sh
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1, greatest(length(text) - ${ContamShingleLen - 1}, 1))) AS g
         |        FROM train)),
         |contaminated AS (
         |  SELECT doc_id FROM (
         |    SELECT t.doc_id,
         |      ROUND(SUM(CASE WHEN e.esh IS NOT NULL THEN 1 ELSE 0 END) * 1.0
         |        / COUNT(*), 4) AS overlap
         |    FROM trainsh t LEFT JOIN evalsh e ON t.sh = e.esh
         |    GROUP BY t.doc_id)
         |  WHERE overlap >= $ContaminationMax),
         |s5 AS (SELECT * FROM train WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
         |SELECT stage, n_docs FROM (
         |  SELECT '1_all' AS stage, COUNT(*) AS n_docs FROM documents
         |  UNION ALL SELECT '2_lang', COUNT(*) FROM s1
         |  UNION ALL SELECT '3_quality', COUNT(*) FROM s2
         |  UNION ALL SELECT '4_exact_dedup', COUNT(*) FROM s3
         |  UNION ALL SELECT '5_near_dedup', COUNT(*) FROM s4
         |  UNION ALL SELECT '6_decontaminated', COUNT(*) FROM s5)
         |ORDER BY stage""".stripMargin
    },

    // identical op order everywhere floats appear; weight sum is integer
    "p07_temperature_mix" ->
      s"""WITH counts AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(FLOOR(sqrt(COUNT(*)) * 1000000.0) AS BIGINT) AS w
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS totw FROM counts),
         |rates AS (
         |  SELECT source, n_docs,
         |    least($MixTargetN * w / totw / n_docs, 1.0) AS rate
         |  FROM counts, tot),
         |thr AS (
         |  SELECT source, n_docs, rate,
         |    printf('%08x', CAST(least(FLOOR(rate * 4294967296.0), 4294967295.0) AS BIGINT)) AS thr
         |  FROM rates)
         |SELECT t.source, t.n_docs,
         |  CAST(FLOOR(t.rate * 10000.0) AS BIGINT) AS rate_bp,
         |  CAST(SUM(CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr
         |        THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents d JOIN thr t USING (source)
         |GROUP BY t.source, t.n_docs, t.rate
         |ORDER BY t.source""".stripMargin,

    "p02_source_mixing" -> {
      val thrCase = MixWeights.foldRight(s"'${thresholdHex(DefaultWeight)}'") {
        case ((src, f), acc) =>
          s"CASE WHEN source = '$src' THEN '${thresholdHex(f)}' ELSE $acc END"
      }
      s"""WITH t AS (
         |  SELECT source,
         |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < ($thrCase) AS keep,
         |    len(regexp_extract_all(text, '\\S+', 0)) AS n_tok
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_sampled,
         |  CAST(FLOOR(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 10000.0 / COUNT(*)) AS BIGINT)
         |    AS sampled_bp
         |FROM t GROUP BY source ORDER BY source""".stripMargin
    },

    "p03_pack_stats" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    CAST(len(regexp_extract_all(text, '\\S+', 0)) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT source, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t),
         |f AS (
         |  SELECT source, n_tok,
         |    FLOOR((cum - n_tok) / $ContextLen.0) AS first_w,
         |    FLOOR((cum - 1) / $ContextLen.0) AS last_w
         |  FROM c),
         |agg AS (
         |  SELECT source, COUNT(*) AS n_docs, SUM(n_tok) AS total_tokens,
         |    SUM(CASE WHEN last_w > first_w THEN 1 ELSE 0 END) AS split_docs
         |  FROM f GROUP BY source)
         |SELECT source, n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
         |  CAST((total_tokens + ${ContextLen - 1}) // $ContextLen AS BIGINT) AS n_windows,
         |  CAST(split_docs AS BIGINT) AS split_docs,
         |  CAST(FLOOR(total_tokens * 10000.0
         |    / (((total_tokens + ${ContextLen - 1}) // $ContextLen) * $ContextLen)) AS BIGINT)
         |    AS util_bp
         |FROM agg ORDER BY source""".stripMargin,

    "p04_shard_plan" ->
      """WITH t AS (
        |  SELECT strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1
        |      AS shard,
        |    CAST(len(regexp_extract_all(text, '\S+', 0)) AS BIGINT) AS n_tok,
        |    source
        |  FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin,

    "p05_quantile_filter" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(regexp_extract_all(text, '\S+', 0)) AS DOUBLE) AS n_tok
        |  FROM documents),
        |med AS (
        |  SELECT source, percentile_cont(0.5) WITHIN GROUP (ORDER BY n_tok) AS med
        |  FROM t GROUP BY source)
        |SELECT t.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_tok >= med THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  ROUND(MIN(med), 1) AS median_tok
        |FROM t JOIN med ON t.source = med.source
        |GROUP BY t.source ORDER BY t.source""".stripMargin,

    "p06_length_histogram" ->
      """SELECT
        |  CAST(FLOOR(log2(greatest(
        |    CAST(len(regexp_extract_all(text, '\S+', 0)) AS DOUBLE), 1.0))) AS BIGINT)
        |    AS bucket,
        |  COUNT(*) AS n_docs,
        |  MIN(n_chars) AS min_chars,
        |  MAX(n_chars) AS max_chars
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,
    "p08_epoch_schedule" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+', 0)) AS BIGINT) AS n_tok,
        |    SUM(CAST(len(regexp_extract_all(text, '\S+', 0)) AS BIGINT)) OVER (
        |      PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents),
        |ps AS (SELECT source, COUNT(*) AS n_docs, SUM(n_tok) AS tokens
        |       FROM d GROUP BY source),
        |b AS (SELECT CAST(SUM(tokens) // COUNT(*) AS BIGINT) AS budget FROM ps),
        |sched AS (
        |  SELECT source, n_docs, CAST(tokens AS BIGINT) AS tokens,
        |    CAST(budget // tokens AS BIGINT) AS epochs_full,
        |    CAST(budget % tokens AS BIGINT) AS rem_tokens
        |  FROM ps, b),
        |fr AS (
        |  SELECT d.source,
        |    CAST(SUM(CASE WHEN d.cum <= s.rem_tokens THEN 1 ELSE 0 END) AS BIGINT)
        |      AS frac_docs,
        |    CAST(SUM(CASE WHEN d.cum <= s.rem_tokens THEN d.n_tok ELSE 0 END) AS BIGINT)
        |      AS frac_tokens
        |  FROM d JOIN sched s USING (source) GROUP BY d.source)
        |SELECT source, n_docs, tokens, epochs_full, rem_tokens, frac_docs, frac_tokens
        |FROM sched JOIN fr USING (source) ORDER BY source""".stripMargin,
    "p09_dsir_resample" -> {
      val evalIn = EvalSources.map(s => s"'$s'").mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, source, generate_subscripts(arr, 1) AS pos, unnest(arr) AS tok
         |  FROM (SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS arr
         |        FROM documents)),
         |big AS (
         |  SELECT a.doc_id, a.source,
         |    substr(md5(a.tok || ' ' || b.tok), 1, 2) AS bucket
         |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |bcnt AS (
         |  SELECT bucket,
         |    SUM(CASE WHEN source IN ($evalIn) THEN 1 ELSE 0 END) AS tc,
         |    SUM(CASE WHEN source NOT IN ($evalIn) THEN 1 ELSE 0 END) AS rc
         |  FROM big GROUP BY bucket),
         |tots AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM bcnt),
         |w AS (
         |  SELECT bucket,
         |    ((tc + 1) * (rt + 256) * 10000) // ((rc + 1) * (tt + 256)) AS w_bp
         |  FROM bcnt CROSS JOIN tots),
         |scored AS (
         |  SELECT doc_id, source, COUNT(*) AS n_big, SUM(w_bp) AS sw,
         |    SUM(w_bp) // COUNT(*) AS avg_w_bp
         |  FROM big JOIN w USING (bucket)
         |  WHERE source NOT IN ($evalIn)
         |  GROUP BY doc_id, source),
         |acc AS (
         |  SELECT source, avg_w_bp,
         |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |      < printf('%08x', CAST(least(
         |          least(avg_w_bp, 20000) * 4294967296 // 20000,
         |          4294967295) AS BIGINT))
         |    THEN 1 ELSE 0 END AS keep
         |  FROM scored)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(avg_w_bp) AS BIGINT) AS sum_avg_w_bp,
         |  CAST(SUM(keep) AS BIGINT) AS n_sampled
         |FROM acc GROUP BY source ORDER BY source""".stripMargin
    },
    "p11_dedup_discounted_mix" -> {
      val wCase = MixWeights.foldRight(s"${(DefaultWeight * 10000).toLong}") {
        case ((src, f), acc) =>
          s"CASE WHEN source = '$src' THEN ${(f * 10000).toLong} ELSE $acc END"
      }
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    len(regexp_extract_all(text, '\\S+', 0)) AS n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM documents),
         |a AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_tok) AS BIGINT) AS tokens_raw,
         |    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |    CAST(SUM(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_unique
         |  FROM t GROUP BY source)
         |SELECT source, n_docs, tokens_raw, n_unique, tokens_unique,
         |  CAST(($wCase) AS BIGINT) AS weight_bp,
         |  CAST(FLOOR(tokens_unique * ($wCase) / 10000.0) AS BIGINT) AS effective_tokens
         |FROM a ORDER BY source""".stripMargin
    },
    "p12_curriculum_phases" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS k FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY 1),
        |e AS (
        |  SELECT t.doc_id,
        |    ROUND((ln(t.n) - SUM(c.k * ln(c.k)) / t.n) / ln(2.0), 6) AS ent
        |  FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
        |  GROUP BY t.doc_id, t.n),
        |q AS (
        |  SELECT quantile_cont(ent, 0.25) AS q1, quantile_cont(ent, 0.5) AS q2,
        |         quantile_cont(ent, 0.75) AS q3 FROM e),
        |ph AS (
        |  SELECT d.source, d.n_chars, e.ent,
        |    CASE WHEN e.ent < q.q1 THEN 0 WHEN e.ent < q.q2 THEN 1
        |         WHEN e.ent < q.q3 THEN 2 ELSE 3 END AS phase
        |  FROM documents d JOIN e USING (doc_id) CROSS JOIN q)
        |SELECT CAST(phase AS BIGINT) AS phase, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(ent) AS min_ent, MAX(ent) AS max_ent
        |FROM ph GROUP BY phase, source ORDER BY phase, source""".stripMargin,
    "p14_leakage_safe_split" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) AS fp,
        |    CAST(len(regexp_extract_all(text, '\S+', 0)) AS BIGINT) AS n_tok,
        |    (substr(md5(text), 1, 2) < '1a') AS val_content,
        |    (substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a') AS val_id
        |  FROM documents),
        |lk AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN sc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaked_content,
        |    CAST(SUM(CASE WHEN si > 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaked_id
        |  FROM (SELECT fp, min_by(source, doc_id) AS source,
        |               COUNT(DISTINCT val_content) AS sc,
        |               COUNT(DISTINCT val_id) AS si
        |        FROM d GROUP BY fp)
        |  GROUP BY source),
        |b AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN val_content THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |    CAST(SUM(CASE WHEN val_content THEN n_tok ELSE 0 END) AS BIGINT) AS val_tokens,
        |    CAST(SUM(CASE WHEN NOT val_content THEN n_tok ELSE 0 END) AS BIGINT) AS train_tokens
        |  FROM d GROUP BY source)
        |SELECT b.source, b.n_docs, b.n_val, b.val_tokens, b.train_tokens,
        |  COALESCE(lk.leaked_content, 0) AS leaked_content,
        |  COALESCE(lk.leaked_id, 0) AS leaked_id
        |FROM b LEFT JOIN lk USING (source) ORDER BY source""".stripMargin,
    "p13_unimax_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text, '\S+', 0)) AS n_tok,
        |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents),
        |u AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN rn = 1 THEN n_tok ELSE 0 END) AS BIGINT) AS u_tokens
        |  FROM t GROUP BY source),
        |c AS (SELECT source, u_tokens, u_tokens * 4 AS capacity FROM u),
        |tot AS (SELECT CAST(SUM(capacity) AS BIGINT) AS cap_total,
        |               CAST(COUNT(*) AS BIGINT) AS n_src FROM c),
        |r AS (
        |  SELECT c.*, tot.n_src, tot.cap_total * 19 // 20 AS budget,
        |    CAST(ROW_NUMBER() OVER (ORDER BY capacity, source) AS BIGINT) AS i,
        |    COALESCE(SUM(capacity) OVER (ORDER BY capacity, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumc_prev
        |  FROM c CROSS JOIN tot),
        |flags AS (
        |  SELECT *,
        |    (capacity * (n_src - i + 1) <= budget - cumc_prev) AS saturated
        |  FROM r),
        |sa AS (
        |  SELECT CAST(SUM(CASE WHEN saturated THEN capacity ELSE 0 END) AS BIGINT) AS c_sat,
        |         CAST(SUM(CASE WHEN saturated THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM flags),
        |alloc AS (
        |  SELECT f.source, f.u_tokens, f.capacity,
        |    CAST(CASE WHEN f.saturated THEN 1 ELSE 0 END AS INT) AS saturated,
        |    CAST(CASE WHEN f.saturated THEN f.capacity
        |         ELSE (f.budget - sa.c_sat) // greatest(f.n_src - sa.k, 1)
        |         END AS BIGINT) AS alloc_tokens
        |  FROM flags f CROSS JOIN sa)
        |SELECT source, u_tokens, capacity, saturated, alloc_tokens,
        |  CAST(FLOOR(alloc_tokens * 10000.0 / u_tokens) AS BIGINT) AS epochs_bp
        |FROM alloc ORDER BY source""".stripMargin,
    "p15_shard_balance" ->
      """WITH cell AS (
        |  SELECT strpos('0123456789abcdef',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS shard,
        |         source, COUNT(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |st AS (SELECT shard, CAST(SUM(n) AS BIGINT) AS st FROM cell GROUP BY shard),
        |g AS (SELECT source, CAST(SUM(n) AS BIGINT) AS g FROM cell GROUP BY source),
        |tot AS (SELECT CAST(SUM(g) AS BIGINT) AS t FROM g),
        |grid AS (
        |  SELECT st.shard, g.source, st.st, g.g, tot.t,
        |         COALESCE(cell.n, 0) AS n
        |  FROM st CROSS JOIN g CROSS JOIN tot
        |  LEFT JOIN cell ON cell.shard = st.shard AND cell.source = g.source),
        |dev AS (
        |  SELECT shard, st,
        |    CAST(FLOOR(abs(n * t - g * st) * 10000.0 / (st * t)) AS BIGINT) AS dev_bp
        |  FROM grid)
        |SELECT CAST(shard AS BIGINT) AS shard, MAX(st) AS n_docs,
        |       MAX(dev_bp) AS max_dev_bp, CAST(SUM(dev_bp) AS BIGINT) AS l1_dev_bp
        |FROM dev GROUP BY shard ORDER BY shard""".stripMargin
  )
}
