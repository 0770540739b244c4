package graft

import org.apache.spark.sql.functions._

/** Invariants of the mixture-sampling and packing-plan operators
  * (PipelineOps p02/p03) at sf0.001. Value-exactness is the DuckDB
  * oracle's job; these pin the properties the oracle can't state:
  * determinism across runs and the packing arithmetic's internal
  * consistency. */
class PipelineOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("p02 source mixing is deterministic and weight-ordered") {
    val run1 = operators.PipelineOps.queries("p02_source_mixing")(spark, sf).collect()
    val run2 = operators.PipelineOps.queries("p02_source_mixing")(spark, sf).collect()
    assert(run1.toSeq == run2.toSeq, "hash-threshold sample must be reproducible")

    val bySrc = run1.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    bySrc.foreach { case (src, (n, sampled, _)) =>
      assert(sampled <= n, s"$src sampled more docs than exist")
    }
    // weight 1.0 keeps (essentially) everything; default 0.1 keeps a strict
    // minority — the mixture actually reweights.
    val (n0, s0, _) = bySrc("src0")
    assert(s0 == n0, "weight-1.0 source must keep all docs at this scale")
    val defaultBps = bySrc.filterKeys(k => !Set("src0", "src1", "src2")(k)).values.map(_._3)
    assert(defaultBps.forall(_ < 5000), s"default-weight sources should keep a minority: $defaultBps")
  }

  test("p03 packing plan arithmetic is internally consistent") {
    val rows = operators.PipelineOps.queries("p03_pack_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, nWin, split, utilBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nWin * 256 >= total, "windows must cover the token stream")
      assert((nWin - 1) * 256 < total, "no fully-empty trailing window")
      assert(split <= nDocs)
      assert(utilBp > 0 && utilBp <= 10000)
    }
    // cross-check against the independent per-source token totals (t03)
    val t03 = operators.TextOps.queries("t03_token_count")(spark, sf)
      .select(col("source"), col("ws_total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == t03(r.getString(0)),
        s"${r.getString(0)}: packing total_tokens must equal t03 ws_total")
    }
  }

  test("p04 shard plan covers the corpus with bounded, stable shards") {
    val run1 = operators.PipelineOps.queries("p04_shard_plan")(spark, sf).collect()
    val run2 = operators.PipelineOps.queries("p04_shard_plan")(spark, sf).collect()
    assert(run1.toSeq == run2.toSeq, "content-hash sharding must be reproducible")
    assert(run1.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 15))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(run1.map(_.getLong(1)).sum == total, "every doc lands in exactly one shard")
  }

  test("p07 temperature mix hits its target and is deterministic across reruns") {
    def run() = operators.PipelineOps.queries("p07_temperature_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = run()
    assert(a.sameElements(run()), "hash-threshold sampling must be rerun-stable")
    val sampled = a.map(_._4).sum
    val target = 200L
    // each source's hash-threshold draw is binomial around rate*n; the
    // total lands near the target (±30% covers the 20-source variance)
    assert(math.abs(sampled - target) <= target * 3 / 10,
      s"sampled $sampled docs, target $target")
    a.foreach { case (src, n, rateBp, k) =>
      assert(k <= n && rateBp <= 10000, s"$src: invalid rate/sample")
    }
  }

  test("p09 DSIR resample: rerun-stable, covers all raw docs, rate-monotone") {
    def run() = operators.PipelineOps.queries("p09_dsir_resample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val a = run()
    assert(a.sameElements(run()), "hash-threshold resample must be rerun-stable")
    assert(!a.exists(r => r._1 == "src0" || r._1 == "src1"),
      "target (eval) sources are never resampled")
    // every non-target doc has >= 1 bigram on this corpus, so per-source
    // doc counts must cover the raw corpus exactly
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("source NOT IN ('src0','src1')")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { case (src, n, sumBp, k) =>
      assert(n == docs(src), s"$src: scored $n of ${docs(src)} raw docs")
      assert(k <= n, s"$src: sampled more than scored")
      assert(sumBp >= n, s"$src: mean weight below 1bp is implausible")
    }
    // acceptance rate tracks the importance score: the mean over sampled
    // sources with above-median weight >= rate over below-median ones
    val byRate = a.map { case (_, n, sumBp, k) => (sumBp / n, k * 10000 / n) }
      .sortBy(_._1)
    val (lo, hi) = byRate.splitAt(byRate.length / 2)
    assert(hi.map(_._2).sum / hi.length >= lo.map(_._2).sum / lo.length,
      "higher importance weight must not lower the acceptance rate")
  }

  test("p11 dedup-discounted mix: unique census conserved, budget arithmetic exact") {
    val rows = operators.PipelineOps.queries("p11_dedup_discounted_mix")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "unique docs bounded by raw docs")
      assert(r.getLong(4) <= r.getLong(2), "unique tokens bounded by raw tokens")
      assert(r.getLong(6) ==
        math.floor(r.getLong(4) * r.getLong(5) / 10000.0).toLong,
        "effective = floor(unique_tokens * weight_bp / 10000)")
    }
    // every distinct fingerprint is charged to exactly one source
    import org.apache.spark.sql.functions._
    val distinctFp = Tables.documents(spark, sf)
      .select(md5(col("text"))).distinct().count()
    assert(rows.map(_.getLong(3)).sum == distinctFp)
  }

  test("p15 shard balance: 16 shards conserve the corpus, deviations bounded") {
    val rows = operators.PipelineOps.queries("p15_shard_balance")(spark, sf).collect()
    assert(rows.length == 16, "md5-nibble sharding yields 16 shards")
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count(),
      "shard doc counts conserve the corpus")
    rows.foreach { r =>
      val (mx, l1) = (r.getLong(2), r.getLong(3))
      assert(mx >= 0 && l1 >= mx, "L1 dominates the max single-source deviation")
      assert(l1 <= 20000, "L1 distance between two distributions is at most 2 (20000 bp)")
    }
  }

  test("p05 quantile gate keeps at least half of every source") {
    val rows = operators.PipelineOps.queries("p05_quantile_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= n)
      assert(kept * 2 >= n,
        s"${r.getString(0)}: >= interpolated median must keep at least half ($kept of $n)")
    }
  }
}
