package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim, pre-normalized).
  *
  * Three tiers, mirroring how a 100 TB vector pipeline escalates:
  *  - s01: brute-force cosine top-k — the exact baseline; a broadcast of
  *    the query vector + one codegen'd `aggregate(zip_with(...))` pass,
  *    embarrassingly parallel over the corpus.
  *  - s02: multi-table random-hyperplane LSH — one 384-bit SimHash
  *    signature per vector (graft.functions.RhpSignature) split into 64
  *    tables of 6 bits; candidates = union of the query's buckets across
  *    tables (an equi-join on (table, key)), pruned by a 384-bit Hamming
  *    radius on the same signature, then exact-cosine re-ranked.
  *    Measured on this corpus (s05 pins it): 86% recall@10 at ~7%
  *    candidates at sf0.01; 96% / ~7% at sf0.1.
  *  - s03: IVF — coarse quantization by the `label` cluster column:
  *    pick the nearest centroid (computed as per-dimension means via
  *    posexplode + groupBy, all distributed), then scan only that list.
  *
  * Dot products fold left-to-right in DOUBLE on both engines, and results
  * order by (rounded cosine, vec_id) so ties break identically under the
  * oracle.
  */
object SimilarityOps {

  private val QueryId = 0

  /** s16 diagnostic bound (the d05/d06 rule): the exact n² kNN graph is
    * an audit, so it runs on a fixed id-prefix; the scale path derives
    * the same edges from the s02/s03 candidate structures. */
  private val KnnGraphCap = 500
  private val KnnK = 5

  /** dot(a, b): native Catalyst expression (graft.functions.DotProduct) —
    * one fused codegen loop, same left-to-right double fold as the
    * composable `aggregate(zip_with(...))` form it replaced, so oracle
    * values are unchanged. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def withQuery(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === QueryId)
      .select(col("embedding").as("qv"))
    emb.crossJoin(broadcast(q))
  }

  private def cosCol: Column =
    round(dot(col("embedding"), col("qv")) /
      (norm(col("embedding")) * norm(col("qv"))), 6)

  /** 6 leading-dimension sign bits — the coarse sign bucket used by d08's
    * pairwise near-dup generator (s02's ANN index uses the full
    * random-hyperplane signature below instead). */
  private def bucketOf(e: Column): Column =
    concat((0 until 6).map(i =>
      when(element_at(e, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  import graft.functions.{LshFunctions, RhpPlanes}

  /** Signature index artifact: (vec_id, label, embedding, sig), built ONCE
    * per corpus and shared by s02/s05 — at 100 TB this is a prebuilt
    * signature table (32 bytes of bits per 256-byte vector) written
    * alongside the corpus, and the exploded (table, key) view below is a
    * bucketed index so a query touches 64 buckets, never the corpus. */
  private val sigCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private[graft] def lshSigs(s: SparkSession, d: String): DataFrame =
    sigCache.getOrElseUpdate(d, {
      Tables.embeddings(s, d)
        .withColumn("sig", LshFunctions.rhp_sig(col("embedding")))
        .localCheckpoint(true)
    })

  /** The signature split into NumTables consecutive keys: rows of
    * (vec_id, t, k) — the multi-table LSH index, equi-joinable on (t, k). */
  private def tableKeys(sigs: DataFrame, idCols: Column*): DataFrame =
    sigs.select(idCols :+ posexplode(expr(
      s"transform(sequence(0, ${RhpPlanes.NumTables - 1}), " +
        s"t -> substring(sig, t * ${RhpPlanes.BitsPerTable} + 1, ${RhpPlanes.BitsPerTable}))"))
      .as(Seq("t", "k")): _*)

  /** IVF coarse index: per-label centroids, materialized ONCE per corpus
    * and reused by every s03 lookup — at 100 TB the centroid table is a
    * batch-built artifact (like a Faiss index's coarse quantizer), never
    * per-query work. localCheckpoint pins |labels|×64 rows; the cache key
    * is the corpus dir. Numerically identical to computing them inline
    * (same avg over (label, pos)), so results are unchanged. */
  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private[graft] def ivfCentroids(s: SparkSession, d: String): DataFrame =
    centroidCache.getOrElseUpdate(d, {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
        .groupBy("label", "pos").agg(avg(col("v")).as("cv"))
        .localCheckpoint(true)
    })

  /** Per-vector cosine to its own label centroid — the (label, pos)
    * equi-join + grouped-sum reduction s07 introduced, shared with d15's
    * keep policy. Linear in corpus size (one row per (vector, dim), one
    * shuffle keyed by vec_id); round(6) so both engines agree bit-for-bit
    * on the comparisons built from it. */
  private def centroidCos(s: SparkSession, d: String): DataFrame = {
    val elems = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    elems.join(ivfCentroids(s, d), Seq("label", "pos"))
      .groupBy("label", "vec_id")
      .agg(round(sum(col("v") * col("cv")) /
        greatest(sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("cv") * col("cv"))),
          lit(1e-12)), 6)
        .as("ccos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k (exact baseline).
    "s01_cosine_topk" -> ((s, d) =>
      withQuery(s, d)
        .filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
        .select("vec_id", "cos")
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)),

    // Multi-table random-hyperplane LSH: candidates = vectors sharing >= 1
    // of 64 6-bit signature buckets with the query (equi-join on (t, k) —
    // the query side is 64 rows, broadcast), Hamming-pruned over the full
    // 384 bits, exact-cosine re-ranked. Three-stage funnel: bucket lookup
    // (sublinear at scale) → bit prune (32-byte sketches) → float re-rank
    // (survivors only).
    "s02_ann_signlsh" -> ((s, d) => {
      val sigs = lshSigs(s, d)
      val q = sigs.filter(col("vec_id") === QueryId)
        .select(col("sig").as("qsig"), col("embedding").as("qv"))
      val qKeys = tableKeys(
        sigs.filter(col("vec_id") === QueryId), col("vec_id").as("qid"))
        .select("t", "k")
      val candIds = tableKeys(sigs, col("vec_id"))
        .join(broadcast(qKeys), Seq("t", "k"))
        .select("vec_id").distinct()
      sigs.join(broadcast(candIds), Seq("vec_id"))
        .crossJoin(broadcast(q))
        .filter(col("vec_id") =!= QueryId)
        .filter(LshFunctions.rhp_hamming(col("sig"), col("qsig")) <= RhpPlanes.HamRadius)
        .withColumn("cos", cosCol)
        .select("vec_id", "cos")
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5)
    }),

    // IVF: nearest label-centroid from the PREBUILT centroid table (see
    // ivfCentroids — an index artifact, not a per-query corpus scan),
    // then scan only that inverted list. Only the query vector itself is
    // posexploded per lookup.
    "s03_ann_ivf" -> ((s, d) => {
      val centroids = ivfCentroids(s, d)
      val qElems = Tables.embeddings(s, d)
        .filter(col("vec_id") === QueryId)
        .select(posexplode(col("embedding")).as(Seq("qpos", "qv")))
        .withColumn("qv", col("qv").cast("double"))
      val bestLabel = centroids
        .join(broadcast(qElems), col("pos") === col("qpos"))
        .groupBy("label")
        .agg(round((sum(col("cv") * col("qv")) /
          (sqrt(sum(col("cv") * col("cv"))) * sqrt(sum(col("qv") * col("qv"))))), 6)
          .as("ccos"))
        .orderBy(col("ccos").desc, col("label").asc)
        .limit(1)
        .select(col("label").as("best_label"))
      withQuery(s, d)
        .join(broadcast(bestLabel), col("label") === col("best_label"))
        .filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
        .select("vec_id", "label", "cos")
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5)
    }),

    // Batched multi-query exact top-k: score the corpus against a
    // BROADCAST query set in one scan (the serving shape — k queries ×
    // corpus, one pass, per-query top-k via WindowGroupLimit so the
    // shuffle carries only partial top rows, never the full score
    // matrix). The broadcast nested-loop is intentional: q × corpus IS
    // the brute-force work; the plan just never materializes it.
    "s04_ann_multiquery" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      emb.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("qid", "vec_id", "cos", "rn")
        .orderBy("qid", "rn")
    }),

    // ANN quality gate: recall@10 AND candidate-set size of the s02
    // multi-table LSH funnel, per query — "measure, don't guess" for the
    // approximate path, with the floor the spec asserts (mean recall_bp
    // >= 7000, every cand_bp <= 1000; see CorpusOpsSpec). Candidates are
    // generated exactly as s02 does it (bucket union then Hamming prune);
    // hits counted via left join on the exact top-10 (tiny).
    "s05_ann_recall" -> ((s, d) => {
      val sigs = lshSigs(s, d)
      val qs = sigs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("sig").as("qsig"), col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      val exact = sigs.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("qid").as("x_qid"), col("vec_id").as("x_vid"))
      val qKeys = tableKeys(sigs.filter(col("vec_id") < 5), col("vec_id").as("qid"))
      val cands = tableKeys(sigs, col("vec_id"))
        .join(broadcast(qKeys), Seq("t", "k"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
        .join(sigs.select(col("vec_id"), col("sig")), Seq("vec_id"))
        .join(broadcast(qs.select(col("qid"), col("qsig"))), Seq("qid"))
        .filter(LshFunctions.rhp_hamming(col("sig"), col("qsig")) <= RhpPlanes.HamRadius)
        .select(col("qid").as("c_qid"), col("vec_id").as("c_vid"))
      val hits = exact.join(cands,
          col("x_qid") === col("c_qid") && col("x_vid") === col("c_vid"), "left")
        .groupBy(col("x_qid").as("qid"))
        .agg(count(lit(1)).as("n_exact"),
          sum(when(col("c_vid").isNotNull, 1).otherwise(0)).as("n_hits"))
        .withColumn("recall_bp",
          floor(col("n_hits") * 10000.0 / col("n_exact")).cast("long"))
      val candCounts = cands.groupBy(col("c_qid").as("qid"))
        .agg(count(lit(1)).as("n_cand"))
      val corpusN = sigs.agg(count(lit(1)).as("corpus_n"))
      hits.join(candCounts, Seq("qid"), "left")
        .withColumn("n_cand", coalesce(col("n_cand"), lit(0L)))
        .crossJoin(broadcast(corpusN))
        .withColumn("cand_bp",
          floor(col("n_cand") * 10000.0 / col("corpus_n")).cast("long"))
        .select("qid", "n_exact", "n_hits", "recall_bp", "n_cand", "cand_bp")
        .orderBy("qid")
    }),

    // IVF probe-depth sweep: recall@10 of the IVF path when scanning the
    // query's 1, 2, or 4 nearest inverted lists — the nprobe tuning table
    // every IVF deployment needs ("measure, don't guess": how much recall
    // does each extra probed list buy?). One exact top-10 pass + the
    // cached centroid table; each exact hit is scored by the RANK of its
    // own list for that query, so all three depths fall out of one join
    // (crank <= nprobe), not three candidate scans.
    // LSH table-count sweep — s06's tuning-table idea for the
    // random-hyperplane index: recall@10 and candidate volume when only
    // the first H of the 64 tables are consulted (H = 8/16/32/64). One
    // candidate pass serves every depth: a candidate's tmin (FIRST table
    // whose bucket matches) decides membership at each H (tmin < H), the
    // same one-join trick s06 plays with centroid rank. The Hamming prune
    // runs on the full signature at every depth, so r64 ≡ s05's recall —
    // the sweep prices each halving of the index's table count.
    "s09_lsh_table_sweep" -> ((s, d) => {
      val hs = Seq(8, 16, 32, 64)
      val sigs = lshSigs(s, d)
      val qs = sigs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("sig").as("qsig"), col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      val exact = sigs.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("qid").as("x_qid"), col("vec_id").as("x_vid"))
      val qKeys = tableKeys(sigs.filter(col("vec_id") < 5), col("vec_id").as("qid"))
      val tmin = tableKeys(sigs, col("vec_id"))
        .join(broadcast(qKeys), Seq("t", "k"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy("qid", "vec_id").agg(min(col("t")).as("tmin"))
        .join(sigs.select(col("vec_id"), col("sig")), Seq("vec_id"))
        .join(broadcast(qs.select(col("qid"), col("qsig"))), Seq("qid"))
        .filter(graft.functions.LshFunctions.rhp_hamming(col("sig"), col("qsig")) <=
          graft.functions.RhpPlanes.HamRadius)
        .select("qid", "vec_id", "tmin")
      val rCols = hs.map(h =>
        floor(sum(when(col("tmin") < h, 1).otherwise(0)) * 10000.0 / count(lit(1)))
          .cast("long").as(s"r${h}_bp"))
      val recalls = exact.join(tmin,
          col("x_qid") === col("qid") && col("x_vid") === col("vec_id"), "left")
        .groupBy(col("x_qid").as("qid"))
        .agg(rCols.head, rCols.tail: _*)
      val cCols = hs.map(h =>
        sum(when(col("tmin") < h, 1L).otherwise(0L)).as(s"c$h"))
      val candCounts = tmin.groupBy("qid").agg(cCols.head, cCols.tail: _*)
      recalls.join(candCounts, Seq("qid"), "left")
        .na.fill(0L, hs.map(h => s"c$h"))
        .orderBy("qid")
    }),

    // Hamming-prune radius sweep — the OTHER knob of the s02 funnel
    // (s09 prices the table count; this prices the bit-prune
    // tightness): recall@10 and surviving-candidate volume when the
    // full-signature Hamming gate runs at radius R ∈ {150, 165, 180,
    // 192} over 384 bits (165 is the production HamRadius; 192 is the
    // random-pair expectation, i.e. "prune off"). ONE candidate pass
    // computes each candidate's exact Hamming distance; every radius
    // falls out of the same join via `ham <= R` — the s09/s06
    // one-join-many-depths trick.
    "s10_hamming_sweep" -> ((s, d) => {
      val rs = Seq(150, 165, 180, 192)
      val sigs = lshSigs(s, d)
      val qs = sigs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("sig").as("qsig"), col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      val exact = sigs.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("qid").as("x_qid"), col("vec_id").as("x_vid"))
      val qKeys = tableKeys(sigs.filter(col("vec_id") < 5), col("vec_id").as("qid"))
      val ham = tableKeys(sigs, col("vec_id"))
        .join(broadcast(qKeys), Seq("t", "k"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
        .join(sigs.select(col("vec_id"), col("sig")), Seq("vec_id"))
        .join(broadcast(qs.select(col("qid"), col("qsig"))), Seq("qid"))
        .withColumn("ham",
          graft.functions.LshFunctions.rhp_hamming(col("sig"), col("qsig")))
        .select("qid", "vec_id", "ham")
      val rCols = rs.map(r =>
        floor(sum(when(col("ham") <= r, 1).otherwise(0)) * 10000.0 / count(lit(1)))
          .cast("long").as(s"r${r}_bp"))
      val recalls = exact.join(ham,
          col("x_qid") === col("qid") && col("x_vid") === col("vec_id"), "left")
        .groupBy(col("x_qid").as("qid"))
        .agg(rCols.head, rCols.tail: _*)
      val cCols = rs.map(r =>
        sum(when(col("ham") <= r, 1L).otherwise(0L)).as(s"c$r"))
      val candCounts = ham.groupBy("qid").agg(cCols.head, cCols.tail: _*)
      recalls.join(candCounts, Seq("qid"), "left")
        .na.fill(0L, rs.map(r => s"c$r"))
        .orderBy("qid")
    }),

    "s06_ivf_recall_sweep" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      val exact = emb.join(broadcast(qs), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("qid"), col("vec_id").as("x_vid"), col("label").as("x_label"))
      val qElems = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("cq_qid"),
          posexplode(col("embedding")).as(Seq("qpos", "qev")))
        .withColumn("qev", col("qev").cast("double"))
      val cw = org.apache.spark.sql.expressions.Window
        .partitionBy("cq_qid").orderBy(col("ccos").desc, col("label").asc)
      val crank = ivfCentroids(s, d)
        .join(broadcast(qElems), col("pos") === col("qpos"))
        .groupBy("cq_qid", "label")
        .agg(round(sum(col("cv") * col("qev")) /
          (sqrt(sum(col("cv") * col("cv"))) * sqrt(sum(col("qev") * col("qev")))), 6)
          .as("ccos"))
        .withColumn("crank", row_number().over(cw))
      def recallAt(n: Int): Column =
        floor(sum(when(col("crank") <= n, 1).otherwise(0)) * 10000.0
          / count(lit(1))).cast("long")
      exact.join(crank,
          col("qid") === col("cq_qid") && col("x_label") === col("label"))
        .groupBy("qid")
        .agg(count(lit(1)).as("n_exact"),
          recallAt(1).as("r1_bp"), recallAt(2).as("r2_bp"), recallAt(4).as("r4_bp"))
        .orderBy("qid")
    }),

    // Embedding-cosine near-dup pairs, generated from sign-LSH bucket
    // candidates WITHIN each cluster: an equi-join on (label, bucket),
    // never a cross join — each join key's fan-out is a cluster's bucket
    // occupancy (~1/64th of the cluster), the shape that survives a
    // 100× corpus. Recall trades exactly like any LSH near-dup pass:
    // high-cosine pairs agree on leading sign bits with high probability.
    "d08_embedding_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("bkt", bucketOf(col("embedding")))
      val l = emb.select(col("label"), col("bkt"),
        col("vec_id").as("v1"), col("embedding").as("e1"))
      val r = emb.select(col("label"), col("bkt"),
        col("vec_id").as("v2"), col("embedding").as("e2"))
      l.join(r, Seq("label", "bkt")).filter(col("v1") < col("v2"))
        .withColumn("cos", round(dot(col("e1"), col("e2")) /
          (norm(col("e1")) * norm(col("e2"))), 4))
        .filter(col("cos") >= 0.2)
        .select("v1", "v2", "cos")
        .orderBy("v1", "v2").limit(200)
    }),

    // Int8-quantization audit: per-vector symmetric quantization
    // (scale = 127/max|x|), then the cosine between each full-precision
    // vector and its dequantized self — the loss figure that prices a
    // vector-index compression (4× smaller, how much recall risk?)
    // BEFORE a 100 TB index rebuild commits to it. Scan-local transforms,
    // no joins, no shuffle beyond the final top-k. floor(x+0.5) rounding:
    // decimal-round at .5 differs between engines, floor doesn't.
    "s08_quantization_error" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("mx", greatest(expr(
          "aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"),
          lit(1e-12)))
        .withColumn("dq", expr(
          "transform(v, x -> floor(x * 127.0 / mx + 0.5) * mx / 127.0)"))
        // denominator guarded like mx: a zero-norm vector would yield
        // NULL here (non-ANSI divide) but NaN in DuckDB — divergent sorts
        .withColumn("cos_q", round(
          expr("aggregate(zip_with(v, dq, (a, b) -> a * b), 0D, (acc, x) -> acc + x)") /
            greatest(sqrt(expr("aggregate(zip_with(v, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")) *
              sqrt(expr("aggregate(zip_with(dq, dq, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")),
              lit(1e-12)), 6))
        .select("vec_id", "cos_q")
        .orderBy(col("cos_q").asc, col("vec_id").asc).limit(50)),

    // Cluster-outlier audit: each vector's cosine to ITS OWN label
    // centroid, bottom-3 per label — the "which examples don't belong to
    // their cluster" pass that catches mislabeled/junk embeddings before
    // training. Reuses the prebuilt IVF centroid artifact; the per-vector
    // reduction is a (label, pos) equi-join + grouped sum, one shuffle
    // keyed by vec_id — no pairwise work anywhere, so it scales linearly
    // in corpus size.
    "s07_centroid_outliers" -> ((s, d) => {
      // zero-norm guard inside centroidCos, as in s08: Spark yields NULL
      // but DuckDB NaN on 0/0, and the two sort differently
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy(col("cos").asc, col("vec_id").asc)
      centroidCos(s, d).withColumnRenamed("ccos", "cos")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("label", "vec_id", "cos", "rn")
        .orderBy("label", "rn")
    }),

    // Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    // within each cluster, embedding pairs above a cosine threshold are
    // semantic duplicates; from each pair the member CLOSER to the
    // cluster centroid is pruned (the paper's keep-low-centroid-similarity
    // policy — survivors are the diverse examples). Output: the per-label
    // prune summary a pipeline reviews before committing the prune.
    //
    // Scale shape, stage by stage: cluster assignment is a prebuilt
    // artifact (here the label column — at 100 TB a k-means/IVF
    // assignment, cf. ivfCentroids); candidate pairs come from the
    // (label, sign-bucket) equi-join — d08's generator, never per-cluster
    // all-pairs (SemDeDup's dense per-cluster pairwise doesn't survive
    // web-scale clusters; the bucket prefilter is the same recall trade
    // every LSH near-dup pass makes); the centroid-cosine keep policy is
    // linear (one grouped reduction per vector, shared with s07).
    "d15_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .withColumn("bkt", bucketOf(col("embedding")))
      val l = emb.select(col("label"), col("bkt"),
        col("vec_id").as("v1"), col("embedding").as("e1"))
      val r = emb.select(col("label"), col("bkt"),
        col("vec_id").as("v2"), col("embedding").as("e2"))
      val pairs = l.join(r, Seq("label", "bkt")).filter(col("v1") < col("v2"))
        .withColumn("cos", round(dot(col("e1"), col("e2")) /
          (norm(col("e1")) * norm(col("e2"))), 4))
        .filter(col("cos") >= 0.2)
        .select("label", "v1", "v2")
      val cc = centroidCos(s, d)
      val removed = pairs
        .join(cc.select(col("vec_id").as("v1"), col("ccos").as("c1")), "v1")
        .join(cc.select(col("vec_id").as("v2"), col("ccos").as("c2")), "v2")
        // prune the pair member nearer its centroid; rounded-6 cosines
        // (gate-proven identical cross-engine via s07) make the compare
        // deterministic, vec_id breaks exact ties
        .withColumn("rm",
          when(col("c1") > col("c2"), col("v1"))
            .when(col("c2") > col("c1"), col("v2"))
            .otherwise(greatest(col("v1"), col("v2"))))
        .select(col("label"), col("rm")).distinct()
        .groupBy("label").agg(count(lit(1)).as("n_removed"))
      Tables.embeddings(s, d)
        .groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .join(removed, Seq("label"), "left_outer")
        .select(col("label"), col("n_vecs"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          (col("n_vecs") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
        .orderBy("label")
    }),

    // Two-stage retrieval — the production shape cheap-scoring funnels
    // take at 100 TB (ScaNN/FAISS "IVF,SQ8 + refine"): stage 1 scores
    // EVERY vector with the int8-dequantized dot (s08's symmetric
    // quantizer — at scale the int8 table is a prebuilt artifact 4×
    // smaller than the float corpus, so the full scan reads a quarter
    // of the bytes) and keeps CoarseK; stage 2 re-ranks only those
    // CoarseK candidates at full float precision. Output: the re-ranked
    // top-10 with an `in_exact` flag against the true full-precision
    // top-10 — the oracle recomputes BOTH stages, so the funnel's
    // recall is gate-verified, not assumed. Deterministic: quantized
    // scores are identical double chains on both engines; ties break on
    // vec_id everywhere.
    "s11_two_stage" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = quantizedCorpus(s, d)
      val q = quantize(emb.filter(col("vec_id") === QueryId))
        .select(col("embedding").as("qv"), col("dq").as("qdq"))
      val coarse = corpus.filter(col("vec_id") =!= QueryId)
        .crossJoin(broadcast(q))
        .withColumn("coarse", expr(
          "aggregate(zip_with(dq, qdq, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
        .orderBy(col("coarse").desc, col("vec_id").asc).limit(CoarseK)
      val exact = withQuery(s, d)
        .filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id").as("x_vid"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id").asc)
      coarse.withColumn("cos", cosCol)
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .withColumn("rn", row_number().over(w))
        .join(exact, col("vec_id") === col("x_vid"), "left")
        .withColumn("in_exact", when(col("x_vid").isNotNull, 1L).otherwise(0L))
        .select("rn", "vec_id", "cos", "in_exact")
        .orderBy("rn")
    }),

    // CoarseK pricing sweep — s11's one funnel knob, priced the way
    // every other knob here is (s05 LSH recall, s06 nprobe, s09 table
    // count, s10 Hamming radius): recall@10 at K ∈ {10, 25, 50, 100}
    // from ONE coarse ranking pass. The coarse order is ranked once
    // (TakeOrdered to the largest K, then a 100-row window), the exact
    // top-10 joins against it, and each K is a conditional aggregate —
    // no per-K rescan. How to read it: the smallest K whose recall
    // clears the application's floor is the re-rank budget.
    "s12_coarsek_sweep" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = quantize(emb.filter(col("vec_id") === QueryId))
        .select(col("dq").as("qdq"))
      val ranked = quantizedCorpus(s, d).filter(col("vec_id") =!= QueryId)
        .crossJoin(broadcast(q))
        .withColumn("coarse", expr(
          "aggregate(zip_with(dq, qdq, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
        .orderBy(col("coarse").desc, col("vec_id").asc).limit(CoarseK)
        .withColumn("rnc", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("coarse").desc, col("vec_id").asc)))
        .select(col("vec_id").as("c_vid"), col("rnc"))
      val exact = withQuery(s, d)
        .filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .select("vec_id")
      val hits = exact.join(ranked, col("vec_id") === col("c_vid"), "left")
      Seq(10, 25, 50, 100).map { k =>
        hits.agg(sum(when(col("rnc") <= k, 1L).otherwise(0L)).as("n_hits"))
          .withColumn("k", lit(k.toLong))
      }.reduce(_.unionByName(_))
        .withColumn("recall_bp", floor(col("n_hits") * 10000.0 / 10).cast("long"))
        .select("k", "n_hits", "recall_bp")
        .orderBy("k")
    }),

    // One Lloyd refinement step over the prebuilt coarse quantizer — the
    // k-means iteration a 100 TB pipeline runs to keep its IVF/cluster
    // artifact honest as the corpus drifts (goose has no analog; this is
    // pipeline infrastructure around the s03 index). E-step: every vector
    // scores against every centroid (the canonical corpus×K assignment
    // cost — at scale the centroid table is broadcast and the argmax is
    // scan-local; here the posexplode-join form keeps the double chains
    // identical to the DuckDB restatement, the same trade s03 documents).
    // M-step: new centroids as per-assignment means. Output per cluster:
    // how many vectors it attracted, how many DEFECTED from their stored
    // label, and how far the centroid moved (L2) — the convergence /
    // staleness audit that decides whether the artifact needs a rebuild.
    // A cluster that attracts nothing reports NULL shift (its centroid is
    // undefined after the step), not a fabricated zero.
    "s13_kmeans_step" -> ((s, d) => {
      val elems = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").as("orig"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ivfCentroids(s, d)
        .select(col("label").as("clabel"), col("pos"), col("cv"))
      val scores = elems.join(cent, Seq("pos"))
        .groupBy("vec_id", "orig", "clabel")
        .agg(round(sum(col("v") * col("cv")) /
          greatest(sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("cv") * col("cv"))),
            lit(1e-12)), 6).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos").desc, col("clabel").asc)
      val assign = scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("vec_id", "orig", "clabel")
      val newc = assign
        .join(elems.select("vec_id", "pos", "v"), Seq("vec_id"))
        .groupBy("clabel", "pos").agg(avg("v").as("nv"))
      // nv is NULL for every pos of an empty cluster, so the sum (and the
      // rounded sqrt) propagate NULL without a special case
      val shift = cent.join(newc, Seq("clabel", "pos"), "left_outer")
        .groupBy("clabel")
        .agg(round(sqrt(sum((col("nv") - col("cv")) * (col("nv") - col("cv")))), 6)
          .as("shift"))
      val stats = assign.groupBy("clabel")
        .agg(count(lit(1)).as("n_assigned"),
          sum(when(col("orig") =!= col("clabel"), 1L).otherwise(0L)).as("n_moved"))
      shift.join(stats, Seq("clabel"), "left_outer")
        .select(col("clabel").as("label"),
          coalesce(col("n_assigned"), lit(0L)).as("n_assigned"),
          coalesce(col("n_moved"), lit(0L)).as("n_moved"),
          col("shift"))
        .orderBy("label")
    }),

    // Budgeted diversity-aware selection (the SSL-prototypes / SemDeDup-
    // survivor shape, Sorscher et al. 2022): spend a fixed example budget
    // across clusters ∝ sqrt(cluster size) (p07's temperature rule,
    // integer-quantized so both engines compute identical quotas), and
    // inside each cluster take the MOST DIVERSE examples first — lowest
    // cosine to the cluster centroid, the exact order d15 keeps. Output
    // per cluster: size, quota, taken, and the centroid-cosine cutoff of
    // the last example taken (the knob a curator inspects before
    // committing the prune). Linear: one centroid-cosine reduction per
    // vector (shared with s07/d15), one small window per cluster —
    // nothing pairwise anywhere.
    "p10_diverse_budget" -> ((s, d) => {
      val Budget = 200L
      val cc = centroidCos(s, d)
      val sizes = cc.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .withColumn("wq", floor(sqrt(col("n_vecs")) * 1e6).cast("long"))
      val totw = sizes.agg(sum("wq").as("totw"))
      val quotas = sizes.crossJoin(broadcast(totw))
        .withColumn("quota",
          least(floor(lit(Budget) * col("wq") / col("totw")).cast("long"),
            col("n_vecs")))
        .select("label", "n_vecs", "quota")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy(col("ccos").asc, col("vec_id").asc)
      val ranked = cc.withColumn("rn", row_number().over(w))
      ranked.join(broadcast(quotas), Seq("label"))
        .filter(col("rn") <= col("quota"))
        .groupBy("label")
        .agg(first("n_vecs").as("n_vecs"), first("quota").as("quota"),
          count(lit(1)).as("n_taken"), max(col("ccos")).as("cutoff_ccos"))
        .orderBy("label")
    }),

    // Dimensionality-reduction pricing sweep — the third index-
    // compression knob beside s08/s11's int8 (byte width) and s09/s10's
    // LSH (bit signatures): project 64-dim vectors onto a deterministic
    // ±1 Rademacher matrix (sign from md5(j_i) parity, so the oracle
    // rebuilds the SAME matrix) and price recall@10 at 16/32/48 kept
    // dims from ONE projection pass — nested prefixes of one matrix, so
    // no per-D re-projection. At 100 TB the projected table is a
    // prebuilt artifact (like the s02 signatures / s11 int8 corpus)
    // whose scan reads 16/64ths of the bytes at D=16; this sweep is the
    // evidence that picks D before that artifact is built. The
    // coefficient table is 48×64 rows — broadcast, never shuffled.
    "s15_dimred_sweep" -> ((s, d) => {
      val dims = Seq(16, 32, 48)
      val coef = s.range(48).select(col("id").cast("int").as("j"))
        .crossJoin(s.range(64).select(col("id").cast("int").as("i")))
        .withColumn("sgn", when(
          substring(md5(concat_ws("_", col("j"), col("i"))), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1.0).otherwise(-1.0))
      val elems = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("i", col("pos").cast("int"))
        .withColumn("v", col("v").cast("double"))
      val proj = elems.join(broadcast(coef), Seq("i"))
        .groupBy("vec_id", "j")
        .agg(sum(col("v") * col("sgn")).as("p"))
      val q = proj.filter(col("vec_id") === QueryId)
        .select(col("j").as("qj"), col("p").as("qp"))
      def prefixCos(dd: Int): Column =
        round(sum(when(col("j") < dd, col("p") * col("qp")).otherwise(0.0)) /
          greatest(
            sqrt(sum(when(col("j") < dd, col("p") * col("p")).otherwise(0.0))) *
              sqrt(sum(when(col("j") < dd, col("qp") * col("qp")).otherwise(0.0))),
            lit(1e-12)), 6).as(s"cos$dd")
      val aggCols = dims.map(prefixCos)
      val dots = proj.filter(col("vec_id") =!= QueryId)
        .join(broadcast(q), col("j") === col("qj"))
        .groupBy("vec_id")
        .agg(aggCols.head, aggCols.tail: _*)
        .localCheckpoint(true) // one projection pass prices every D
      val exact = withQuery(s, d).filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id").as("x_vid"))
      dims.map { dd =>
        dots.orderBy(col(s"cos$dd").desc, col("vec_id").asc).limit(10)
          .join(exact, col("vec_id") === col("x_vid"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
          .withColumn("dim", lit(dd.toLong))
      }.reduce(_.unionByName(_))
        .withColumn("recall_bp", floor(col("n_hits") * 10000.0 / 10).cast("long"))
        .select("dim", "n_hits", "recall_bp")
        .orderBy("dim")
    }),

    // The SQL surface, driven through the gate: s01's exact top-k
    // restated as PLAIN SQL TEXT over the graft.GraftExtensions-injected
    // native functions (registerAll on the driver's session — the
    // retrofit path a notebook or thriftserver user takes). Catalyst
    // compiles the text to the same vec_dot-codegen TakeOrdered plan the
    // DataFrame form produces (plan-checked), and the oracle is s01's —
    // so the gate proves the SQL and DataFrame surfaces agree on VALUES,
    // not just on parse.
    "s14_sql_surface" -> ((s, d) => {
      graft.GraftExtensions.registerAll(s)
      Tables.embeddings(s, d).createOrReplaceTempView("graft_s14_emb")
      s.sql(
        s"""WITH q AS (SELECT embedding AS qv FROM graft_s14_emb
           |           WHERE vec_id = $QueryId)
           |SELECT vec_id,
           |  ROUND(vec_dot(embedding, qv) /
           |    (SQRT(vec_dot(embedding, embedding)) * SQRT(vec_dot(qv, qv))),
           |    6) AS cos
           |FROM graft_s14_emb, q WHERE vec_id <> $QueryId
           |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin)
    }),

    // Product-quantization reconstruction audit — the FOURTH index-
    // compression knob priced before an index build (FAISS's PQ family),
    // beside int8 byte width (s08/s11), LSH bits (s09/s10) and kept
    // dims (s15): split each 64-dim vector into four contiguous 16-dim
    // subspaces and quantize each subvector to its L2-nearest per-label
    // sub-centroid — the codebook is the prebuilt ivfCentroids artifact
    // sliced by subspace (s03's coarse-quantizer trick, deterministic
    // and oracle-recomputable; a production PQ trains per-subspace
    // k-means, s13's E+M step, but the audit arithmetic is identical).
    // Output per label: integer-bp cosine of each vector to its
    // reconstruction (the s08 shape — floor(round(cos,6)·1e4), so the
    // bp is derived from an engine-identical rounded double) and how
    // often a subspace code keeps the vector's own label. Cost shape:
    // the corpus×K fan-out rides the (pos) equi-join with the broadcast
    // centroid table — s13's E-step, linear in the corpus.
    "s17_pq_error" -> ((s, d) => {
      val SubDim = 16
      val elems = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").as("orig"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ivfCentroids(s, d)
        .select(col("label").as("clabel"), col("pos"), col("cv"))
      val dists = elems.join(cent, Seq("pos"))
        .withColumn("sub", expr(s"pos div $SubDim"))
        .groupBy("vec_id", "orig", "sub", "clabel")
        .agg(round(sum((col("v") - col("cv")) * (col("v") - col("cv"))), 6).as("d2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id", "sub").orderBy(col("d2").asc, col("clabel").asc)
      val codes = dists.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("vec_id", "orig", "sub", "clabel")
      val recon = elems.withColumn("sub", expr(s"pos div $SubDim"))
        .join(codes, Seq("vec_id", "orig", "sub"))
        .join(cent, Seq("clabel", "pos"))
        .groupBy("vec_id", "orig")
        .agg(floor(round(sum(col("v") * col("cv")) /
          greatest(sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("cv") * col("cv"))),
            lit(1e-12)), 6) * 10000).cast("long").as("recon_bp"))
      val codeStats = codes.groupBy("vec_id", "orig")
        .agg(sum(when(col("clabel") === col("orig"), 1L).otherwise(0L)).as("own_codes"))
      recon.join(codeStats, Seq("vec_id", "orig"))
        .groupBy(col("orig").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          floor(sum("recon_bp") / count(lit(1))).cast("long").as("avg_recon_bp"),
          min("recon_bp").as("min_recon_bp"),
          floor(sum("own_codes") * 10000.0 / (count(lit(1)) * 4)).cast("long")
            .as("own_code_bp"))
        .orderBy("label")
    }),

    // Mutual-kNN-graph audit — the embedding-space health check run
    // before any graph-based curation (SemDeDup-style clustering,
    // label-propagation, graph dedup): per label, the reciprocity of the
    // exact k=5 neighbor graph (share of directed edges whose reverse is
    // also an edge — low reciprocity = hubness, the failure mode that
    // wrecks graph clustering in high dimensions) and its label purity
    // (share of neighbors sharing the anchor's label — the
    // embedding-vs-label agreement audit complementing s07's outliers).
    // DIAGNOSTIC-CAPPED like d05/d06: the exact n² graph runs on the
    // first KnnGraphCap vectors only (broadcast self-join, per-anchor
    // window top-k — never a global sort); the scale path builds the
    // same edges from s02's LSH buckets / s03's IVF lists, whose
    // candidate quality s05/s06 already price against exact truth.
    // Cosines round(6) before ranking, ties break on neighbor id, so
    // both engines rank identically.
    "s16_knn_graph" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val sub = Tables.embeddings(s, d).filter(col("vec_id") < KnnGraphCap)
      val a = sub.select(col("vec_id").as("a"), col("label").as("la"),
        col("embedding").as("ea"))
      val b = sub.select(col("vec_id").as("b"), col("label").as("lb"),
        col("embedding").as("eb"))
      val edges = a.join(broadcast(b), col("a") =!= col("b"))
        .withColumn("cos", round(dot(col("ea"), col("eb")) /
          (norm(col("ea")) * norm(col("eb"))), 6))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("a").orderBy(col("cos").desc, col("b").asc)))
        .filter(col("rnk") <= KnnK)
        .select("a", "la", "b", "lb")
        .localCheckpoint(true) // one n² pass feeds books AND reciprocity join
      val rev = edges.select(col("a").as("ra"), col("b").as("rb"))
      edges
        .join(rev.withColumn("has_rev", lit(1L)),
          col("a") === col("rb") && col("b") === col("ra"), "left_outer")
        .groupBy(col("la").as("label"))
        .agg(countDistinct("a").as("n_vecs"),
          count(lit(1)).as("n_edges"),
          floor(sum(coalesce(col("has_rev"), lit(0L))) * 10000.0 /
            count(lit(1))).cast("long").as("recip_bp"),
          floor(sum(when(col("lb") === col("la"), 1L).otherwise(0L)) * 10000.0 /
            count(lit(1))).cast("long").as("purity_bp"))
        .orderBy("label")
    }),

    // Range (radius) search — the FAISS `range_search` surface that
    // top-k (s01) can't express: ALL neighbors with cos >= Tau per
    // query, however many there are. Eight query vectors ride broadcast
    // (the query side is 8 rows — never a shuffle); the corpus is
    // scanned ONCE with the vec_dot codegen loop; per-query books are
    // neighbor count and the strongest/weakest in-radius cosine. At
    // 100 TB this is a single embarrassingly-parallel scan per query
    // batch — the EXACT contract the s02 bucket funnel approximates
    // when radius recall may be traded (priced by s05/s10); queries
    // with an empty radius set drop out in both engines identically.
    "s18_range_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < RangeNq)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .filter(col("cos") >= RangeTau)
        .groupBy("qid")
        .agg(count(lit(1)).as("n_in_radius"),
          max("cos").as("max_cos"), min("cos").as("min_cos"))
        .orderBy("qid")
    }),

    // IVF list-balance audit — the knob that prices s03's probe cost
    // BEFORE committing an index build: nearest-centroid assignment
    // (s13's E-step, one centroid-join reduction per vector), per-cell
    // list sizes, and the imbalance factor IF = K·Σsz²/n² of the IVF
    // literature (Jégou et al. 2011 §V; 1.0 = perfectly even lists). A
    // query load that mirrors the data distribution scans IF× the
    // even-split candidate count, so if_bp is a direct multiplier on
    // s03's per-probe latency; scan_bp (= Σsz²/n²) restates it as the
    // corpus share an nprobe=1 lookup touches. k_cells counts NONEMPTY
    // cells — an empty list costs nothing at query time. Linear: the
    // E-step fan-out is corpus×K (broadcastable centroid side), the
    // rollup is K rows; at 100 TB the assignment is the index build's
    // own persisted artifact and this audit is a grouped count over it.
    "s19_ivf_balance" -> ((s, d) => {
      val elems = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ivfCentroids(s, d)
        .select(col("label").as("clabel"), col("pos"), col("cv"))
      val scores = elems.join(cent, Seq("pos"))
        .groupBy("vec_id", "clabel")
        .agg(round(sum(col("v") * col("cv")) /
          greatest(sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("cv") * col("cv"))),
            lit(1e-12)), 6).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos").desc, col("clabel").asc)
      val sizes = scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("clabel").agg(count(lit(1)).as("sz"))
      sizes.agg(
        count(lit(1)).as("k_cells"),
        sum("sz").cast("long").as("n_vecs"),
        max("sz").as("max_list"),
        min("sz").as("min_list"),
        floor(count(lit(1)) * sum(col("sz") * col("sz")) * 10000.0 /
          (sum("sz") * sum("sz"))).cast("long").as("if_bp"),
        floor(sum(col("sz") * col("sz")) * 10000.0 /
          (sum("sz") * sum("sz"))).cast("long").as("scan_bp"))
    }),

    // Embedding-distribution drift between the existing corpus and a new
    // batch — t16's token-drift monitor restated in embedding space (the
    // signal that decides whether yesterday's ANN index / semantic-dedup
    // thresholds still apply to today's crawl). Same base/batch split
    // convention as d14 (first 80% of vec_ids = base). Per label: both
    // half-centroids (per-dim means), their cosine, and the centroid
    // norm ratio — a cosine near 1 with a norm ratio far from 1 flags
    // magnitude drift that cosine alone hides. Scale shape: one
    // corpus×dims explode into a (label, half, pos)-keyed partial-agg
    // rollup (map-side combined, centroids are labels×2×64 rows), then
    // label-sized joins — no pairwise term, no per-vector state.
    "s20_embedding_drift" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val bound = emb.agg(floor(max("vec_id") * 0.8).cast("long").as("bnd"))
      val halved = emb.crossJoin(broadcast(bound))
        .withColumn("half",
          when(col("vec_id") <= col("bnd"), "base").otherwise("batch"))
      val counts = halved.groupBy("label")
        .agg(count(when(col("half") === "base", 1)).as("n_base"),
          count(when(col("half") === "batch", 1)).as("n_batch"))
      val cent = halved
        .select(col("label"), col("half"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
        .groupBy("label", "half", "pos")
        .agg(avg("v").as("cv"))
      val base = cent.filter(col("half") === "base")
        .select(col("label"), col("pos"), col("cv").as("b"))
      val batch = cent.filter(col("half") === "batch")
        .select(col("label"), col("pos"), col("cv").as("t"))
      base.join(batch, Seq("label", "pos"))
        .groupBy("label")
        .agg(
          round(sum(col("b") * col("t")) /
            greatest(sqrt(sum(col("b") * col("b"))) * sqrt(sum(col("t") * col("t"))),
              lit(1e-12)), 6).as("centroid_cos"),
          round(sqrt(sum(col("t") * col("t"))) /
            greatest(sqrt(sum(col("b") * col("b"))), lit(1e-12)), 6).as("cnorm_ratio"))
        .join(counts, Seq("label"))
        .select("label", "n_base", "n_batch", "centroid_cos", "cnorm_ratio")
        .orderBy("label")
    }),

    // Hybrid retrieval with reciprocal-rank fusion (the production RAG /
    // retrieval-eval default: lexical and dense lists each miss docs the
    // other finds; RRF merges them with no score calibration). Query =
    // doc 0's text on the lexical side and vector 0 on the dense side
    // (doc_id ≡ vec_id by construction of these tables). Lexical score =
    // distinct-token overlap with the query's token set (the query side
    // is ONE doc's vocabulary — broadcast); dense score = exact cosine
    // (s01's scan). Both arms cut to a top-50 candidate list FIRST
    // (partial top-k — the only corpus-sized work), so the rank windows
    // and the full-outer fuse run on ≤50-row frames: rank-then-fuse
    // never touches the corpus. RRF k=60 (Cormack et al. 2009);
    // integer-rank inputs make the double arithmetic engine-exact.
    "s21_hybrid_search" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val toks = docs
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("tok"))
        .distinct()
      val qToks = toks.filter(col("doc_id") === QueryId).select("tok")
      val ov = toks.filter(col("doc_id") =!= QueryId)
        .join(broadcast(qToks), Seq("tok"))
        .groupBy("doc_id").agg(count(lit(1)).as("overlap"))
      val lex = ov.orderBy(col("overlap").desc, col("doc_id").asc).limit(HybridK)
        .withColumn("r_lex", row_number().over(
          Window.orderBy(col("overlap").desc, col("doc_id").asc)).cast("long"))
        .select("doc_id", "r_lex")
      val vec = withQuery(s, d).filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
        .select(col("vec_id").as("doc_id"), col("cos"))
        .orderBy(col("cos").desc, col("doc_id").asc).limit(HybridK)
        .withColumn("r_vec", row_number().over(
          Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
        .select("doc_id", "r_vec")
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0)))
        .select(col("doc_id"),
          coalesce(col("r_lex"), lit(0L)).as("lex_rank"),
          coalesce(col("r_vec"), lit(0L)).as("vec_rank"),
          floor(col("rrf") * 1000000).cast("long").as("rrf_ppm"))
        .orderBy(col("rrf_ppm").desc, col("doc_id").asc)
        .limit(10)
    }),

    // ADC (asymmetric-distance) top-k over the PQ codes — the query path
    // the s17 audit prices the compression for (FAISS IndexPQ: Jégou et
    // al. 2011 §III): the corpus is never decoded; each vector costs
    // 4 table lookups + 3 adds. The per-query distance table (subspace
    // inner products of the query against every centroid, K×4 entries)
    // is QUANTIZED to integer micro-units at build — sums of longs are
    // shuffle-order-exact, and an int table is what a cache-resident ADC
    // scan uses anyway. Scale shape: codes are the persisted index
    // artifact (corpus×4 rows); the scan is one broadcast-table
    // equi-join + a grouped integer sum + partial top-k. The exact-side
    // columns (true cosine, membership in the exact top-10) audit recall
    // in the same sheet.
    "s22_pq_adc_topk" -> ((s, d) => {
      val SubDim = 16
      val elems = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ivfCentroids(s, d)
        .select(col("label").as("clabel"), col("pos"), col("cv"))
      val dists = elems.join(cent, Seq("pos"))
        .withColumn("sub", expr(s"pos div $SubDim"))
        .groupBy("vec_id", "sub", "clabel")
        .agg(round(sum((col("v") - col("cv")) * (col("v") - col("cv"))), 6).as("d2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id", "sub").orderBy(col("d2").asc, col("clabel").asc)
      val codes = dists.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("vec_id", "sub", "clabel")
      val qe = elems.filter(col("vec_id") === QueryId)
        .select(col("pos"), col("v").as("qv"))
      // Quantize PER PRODUCT, not on the subspace sum: floor(round(sum)
      // *1e6) stacked two roundings, and the round(…,6) grid scaled by
      // 1e6 sits exactly on integers — one ulp of representation error
      // flips floor across engines (ADVICE r8). round-to-integer on the
      // raw product has no such systematic boundary (a double product
      // exactly on .5 micro-units is measure-zero), and the sum of
      // longs is shuffle-order-exact in both engines.
      val tab = cent.join(broadcast(qe), Seq("pos"))
        .withColumn("sub", expr(s"pos div $SubDim"))
        .groupBy("clabel", "sub")
        .agg(sum(round(col("qv") * col("cv") * 1000000, 0).cast("long")).as("t"))
      val adc = codes.filter(col("vec_id") =!= QueryId)
        .join(broadcast(tab), Seq("sub", "clabel"))
        .groupBy("vec_id").agg(sum("t").as("adc_ipm"))
        .orderBy(col("adc_ipm").desc, col("vec_id").asc).limit(10)
      val cos = withQuery(s, d).filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol).select("vec_id", "cos")
      val exact10 = cos.orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), lit(1).as("in_exact10"))
      adc.join(cos, Seq("vec_id"))
        .join(exact10, Seq("vec_id"), "left_outer")
        .na.fill(0, Seq("in_exact10"))
        .select("vec_id", "adc_ipm", "cos", "in_exact10")
        .orderBy(col("adc_ipm").desc, col("vec_id").asc)
    }),

    // Filtered vector search — pre- vs post-filter pricing (the design
    // decision every production vector store documents: Qdrant/pgvector
    // "filtered search"). Predicate = the query's own cluster label.
    // PRE-filter (ground truth): exact top-10 among predicate-passing
    // vectors — at scale this needs the predicate pushed into the index
    // (per-label lists, i.e. exactly the s03 IVF layout). POST-filter
    // (what a predicate-blind ANN index gives you): global top-50, THEN
    // the predicate, cut to 10 — cheap, but a selective predicate
    // starves the candidate list. `in_post` per pre-rank row IS the
    // measured recall loss. Both arms are one corpus scan ending in a
    // partial top-k; the label lookup rides broadcast.
    "s23_filtered_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val qLabel = Tables.embeddings(s, d).filter(col("vec_id") === QueryId)
        .select(col("label").as("qlabel"))
      val cos = withQuery(s, d).filter(col("vec_id") =!= QueryId)
        .withColumn("cos", cosCol)
      val pre = cos.join(broadcast(qLabel), col("label") === col("qlabel"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .withColumn("pre_rank", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
        .select("vec_id", "cos", "pre_rank")
      val post = cos.orderBy(col("cos").desc, col("vec_id").asc).limit(50)
        .join(broadcast(qLabel), col("label") === col("qlabel"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(10)
        .select(col("vec_id"), lit(1).as("hit"))
      pre.join(post, Seq("vec_id"), "left_outer")
        .withColumn("in_post",
          when(col("hit").isNotNull, lit(1)).otherwise(lit(0)).cast("int"))
        .select("vec_id", "cos", "pre_rank", "in_post")
        .orderBy("pre_rank")
    }),

    // Batched kNN as a cell co-partitioned JOIN — the bulk-retrieval
    // shape single-query probing (s03) doesn't cover: when MILLIONS of
    // queries arrive at once (kNN-graph builds for SemDeDup, batch eval
    // retrieval), per-query index probes serialize; the scale plan
    // assigns queries AND corpus to their nearest IVF cell and
    // equi-joins on the cell key, so every query touches ~1/K of the
    // corpus in ONE shuffle-stage pass. Here the 8-query side rides
    // broadcast (Catalyst's correct pick at this query count — the
    // equi-join degrades gracefully to shuffle co-partitioning when the
    // query side outgrows it). Per query: candidate-list size and
    // recall@10 vs the exact scan — nprobe=1's quality honestly priced,
    // same oracle-gated pattern as s05/s06.
    "s24_ivf_knn_join" -> ((s, d) => {
      val NQ = 8
      val elems = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ivfCentroids(s, d)
        .select(col("label").as("clabel"), col("pos"), col("cv"))
      val scores = elems.join(cent, Seq("pos"))
        .groupBy("vec_id", "clabel")
        .agg(round(sum(col("v") * col("cv")) /
          greatest(sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("cv") * col("cv"))),
            lit(1e-12)), 6).as("ccos"))
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("ccos").desc, col("clabel").asc)
      val assign = scores.withColumn("rn", row_number().over(w1))
        .filter(col("rn") === 1).select(col("vec_id"), col("clabel").as("cell"))
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
        .join(assign, Seq("vec_id"))
      val qs = emb.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("cell"))
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      val cands = emb.join(qs, Seq("cell")).filter(col("vec_id") =!= col("qid"))
      val approx = cands.withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 10)
        .select(col("qid").as("a_qid"), col("vec_id").as("a_vid"))
      val nCand = cands.groupBy("qid").agg(count(lit(1)).as("n_cand"))
      val qsb = Tables.embeddings(s, d).filter(col("vec_id") < NQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Tables.embeddings(s, d)
        .join(broadcast(qsb), col("vec_id") =!= col("qid"))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 10)
        .select(col("qid").as("e_qid"), col("vec_id").as("e_vid"))
      val hits = approx.join(exact,
          col("a_qid") === col("e_qid") && col("a_vid") === col("e_vid"))
        .groupBy(col("a_qid").as("qid")).agg(count(lit(1)).as("hits"))
      qsb.select("qid")
        .join(nCand, Seq("qid"), "left_outer")
        .join(hits, Seq("qid"), "left_outer")
        .na.fill(0L, Seq("n_cand", "hits"))
        .select(col("qid"), col("n_cand"),
          (col("hits") * 1000).cast("long").as("recall_bp"))
        .orderBy("qid")
    })
  )

  /** s18 radius-search knobs: 8 broadcast queries; τ=0.30 sits just
    * under this corpus's observed cosine ceiling (~0.37-0.49 per
    * query), so every query keeps a non-trivial in-radius set. */
  private val RangeNq = 8
  private val RangeTau = 0.30

  /** Stage-1 survivor count of the two-stage funnel (s11). */
  private val CoarseK = 100

  /** Per-arm candidate-list length of the hybrid RRF fuse (s21). */
  private val HybridK = 50

  /** s08's symmetric int8 round trip as columns: per-vector absmax
    * scale, quantize, dequantize — identical double chains to the
    * DuckDB restatement. */
  private def quantize(df: DataFrame): DataFrame = df
    .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    .withColumn("mx", greatest(expr(
      "aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"),
      lit(1e-12)))
    .withColumn("dq", expr(
      "transform(v, x -> floor(x * 127.0 / mx + 0.5) * mx / 127.0)"))

  /** Quantized-corpus artifact for the s11 coarse stage — built once per
    * corpus and reused, like the s02/s05 signature table and the s03
    * IVF centroids: at 100 TB the int8 table is written alongside the
    * float corpus (4× fewer bytes) and the coarse scan reads ONLY it. */
  private val dqCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def quantizedCorpus(s: SparkSession, d: String): DataFrame =
    dqCache.getOrElseUpdate(d,
      quantize(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"), col("dq"))
        .localCheckpoint(true))

  private val dotSql = "list_dot_product(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"
  private def cosSql(a: String, b: String, r: Int) =
    s"ROUND(${dotSql.format(a, b)} / (sqrt(${dotSql.format(a, a)}) * sqrt(${dotSql.format(b, b)})), $r)"

  val oracles: Map[String, String] = Map(
    "s01_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId)
         |SELECT vec_id, ${cosSql("embedding", "qv", 6)} AS cos
         |FROM embeddings, q WHERE vec_id <> $QueryId
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    // The oracle states the SEMANTICS of the LSH funnel (bucket-union via
    // EXISTS over the 64 key slices, Hamming via bit_count(xor)); the
    // Spark side implements the same predicate as the scalable
    // bucket-equi-join plan. Signatures are rebuilt bit-for-bit from the
    // generated plane literal (graft.functions.RhpPlanes).
    "s02_ann_signlsh" -> {
      import graft.functions.RhpPlanes.{BitsPerTable => B, HamRadius, NumTables}
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${graft.functions.RhpPlanes.duckdbSigExpr("embedding")} AS sig
         |  FROM embeddings),
         |q AS (SELECT sig AS qsig, embedding AS qv FROM sig WHERE vec_id = $QueryId)
         |SELECT s.vec_id, ${cosSql("s.embedding", "q.qv", 6)} AS cos
         |FROM sig s, q
         |WHERE s.vec_id <> $QueryId
         |  AND length(list_filter(range(0, $NumTables),
         |        t -> substr(s.sig, CAST(t * $B + 1 AS INT), $B)
         |           = substr(q.qsig, CAST(t * $B + 1 AS INT), $B))) > 0
         |  AND bit_count(xor(s.sig::BIT, q.qsig::BIT)) <= $HamRadius
         |ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin
    },
    "s03_ann_ivf" ->
      s"""WITH elems AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |centroids AS (SELECT label, pos, avg(v) AS cv FROM elems GROUP BY label, pos),
         |qe AS (SELECT pos AS qpos, v AS qv FROM elems WHERE vec_id = $QueryId),
         |best AS (
         |  SELECT label AS best_label FROM centroids JOIN qe ON pos = qpos
         |  GROUP BY label
         |  ORDER BY ROUND(sum(cv * qv) / (sqrt(sum(cv * cv)) * sqrt(sum(qv * qv))), 6) DESC,
         |           label ASC LIMIT 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId)
         |SELECT vec_id, label, ${cosSql("embedding", "qv", 6)} AS cos
         |FROM embeddings, q, best
         |WHERE label = best_label AND vec_id <> $QueryId
         |ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin,
    "s04_ann_multiquery" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM scored)
         |SELECT qid, vec_id, cos, rn FROM ranked WHERE rn <= 3
         |ORDER BY qid, rn""".stripMargin,
    "s05_ann_recall" -> {
      import graft.functions.RhpPlanes.{BitsPerTable => B, HamRadius, NumTables}
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${graft.functions.RhpPlanes.duckdbSigExpr("embedding")} AS sig
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, sig AS qsig, embedding AS qv FROM sig WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM scored) WHERE rn <= 10),
         |cands AS (
         |  SELECT q.qid, s.vec_id FROM sig s, q
         |  WHERE s.vec_id <> q.qid
         |    AND length(list_filter(range(0, $NumTables),
         |          t -> substr(s.sig, CAST(t * $B + 1 AS INT), $B)
         |             = substr(q.qsig, CAST(t * $B + 1 AS INT), $B))) > 0
         |    AND bit_count(xor(s.sig::BIT, q.qsig::BIT)) <= $HamRadius),
         |n AS (SELECT COUNT(*) AS corpus_n FROM embeddings),
         |hits AS (
         |  SELECT x.qid, COUNT(*) AS n_exact,
         |    CAST(SUM(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |    CAST(FLOOR(SUM(CASE WHEN c.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |      * 10000.0 / COUNT(*)) AS BIGINT) AS recall_bp
         |  FROM exact x LEFT JOIN cands c ON x.qid = c.qid AND x.vec_id = c.vec_id
         |  GROUP BY x.qid),
         |cc AS (SELECT qid, COUNT(*) AS n_cand FROM cands GROUP BY qid)
         |SELECT h.qid, h.n_exact, h.n_hits, h.recall_bp,
         |  COALESCE(cc.n_cand, 0) AS n_cand,
         |  CAST(FLOOR(COALESCE(cc.n_cand, 0) * 10000.0 / n.corpus_n) AS BIGINT) AS cand_bp
         |FROM hits h LEFT JOIN cc ON h.qid = cc.qid, n
         |ORDER BY h.qid""".stripMargin
    },
    "s09_lsh_table_sweep" -> {
      import graft.functions.RhpPlanes.{BitsPerTable => B, HamRadius, NumTables}
      def rbp(h: Int) =
        s"""CAST(FLOOR(SUM(CASE WHEN t.tmin < $h THEN 1 ELSE 0 END)
           |    * 10000.0 / COUNT(*)) AS BIGINT) AS r${h}_bp""".stripMargin
      def cnt(h: Int) =
        s"CAST(SUM(CASE WHEN tmin < $h THEN 1 ELSE 0 END) AS BIGINT) AS c$h"
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${graft.functions.RhpPlanes.duckdbSigExpr("embedding")} AS sig
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, sig AS qsig, embedding AS qv FROM sig WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM scored) WHERE rn <= 10),
         |tmin AS (
         |  SELECT q.qid, s.vec_id,
         |    list_min(list_filter(range(0, $NumTables),
         |      t -> substr(s.sig, CAST(t * $B + 1 AS INT), $B)
         |         = substr(q.qsig, CAST(t * $B + 1 AS INT), $B))) AS tmin
         |  FROM sig s, q
         |  WHERE s.vec_id <> q.qid
         |    AND length(list_filter(range(0, $NumTables),
         |          t -> substr(s.sig, CAST(t * $B + 1 AS INT), $B)
         |             = substr(q.qsig, CAST(t * $B + 1 AS INT), $B))) > 0
         |    AND bit_count(xor(s.sig::BIT, q.qsig::BIT)) <= $HamRadius),
         |recalls AS (
         |  SELECT x.qid,
         |    ${Seq(8, 16, 32, 64).map(rbp).mkString(",\n    ")}
         |  FROM exact x LEFT JOIN tmin t ON x.qid = t.qid AND x.vec_id = t.vec_id
         |  GROUP BY x.qid),
         |cc AS (
         |  SELECT qid, ${Seq(8, 16, 32, 64).map(cnt).mkString(", ")}
         |  FROM tmin GROUP BY qid)
         |SELECT r.qid, r.r8_bp, r.r16_bp, r.r32_bp, r.r64_bp,
         |  ${Seq(8, 16, 32, 64).map(h => s"COALESCE(cc.c$h, 0) AS c$h").mkString(", ")}
         |FROM recalls r LEFT JOIN cc ON r.qid = cc.qid
         |ORDER BY r.qid""".stripMargin
    },
    "s10_hamming_sweep" -> {
      import graft.functions.RhpPlanes.{BitsPerTable => B, NumTables}
      val rs = Seq(150, 165, 180, 192)
      def rbp(r: Int) =
        s"""CAST(FLOOR(SUM(CASE WHEN c.ham <= $r THEN 1 ELSE 0 END)
           |    * 10000.0 / COUNT(*)) AS BIGINT) AS r${r}_bp""".stripMargin
      def cnt(r: Int) =
        s"CAST(SUM(CASE WHEN ham <= $r THEN 1 ELSE 0 END) AS BIGINT) AS c$r"
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${graft.functions.RhpPlanes.duckdbSigExpr("embedding")} AS sig
         |  FROM embeddings),
         |q AS (SELECT vec_id AS qid, sig AS qsig, embedding AS qv FROM sig WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM scored) WHERE rn <= 10),
         |cand AS (
         |  SELECT q.qid, s.vec_id,
         |    bit_count(xor(s.sig::BIT, q.qsig::BIT)) AS ham
         |  FROM sig s, q
         |  WHERE s.vec_id <> q.qid
         |    AND length(list_filter(range(0, $NumTables),
         |          t -> substr(s.sig, CAST(t * $B + 1 AS INT), $B)
         |             = substr(q.qsig, CAST(t * $B + 1 AS INT), $B))) > 0),
         |recalls AS (
         |  SELECT x.qid,
         |    ${rs.map(rbp).mkString(",\n    ")}
         |  FROM exact x LEFT JOIN cand c ON x.qid = c.qid AND x.vec_id = c.vec_id
         |  GROUP BY x.qid),
         |cc AS (
         |  SELECT qid, ${rs.map(cnt).mkString(", ")}
         |  FROM cand GROUP BY qid)
         |SELECT r.qid, ${rs.map(r => s"r.r${r}_bp").mkString(", ")},
         |  ${rs.map(r => s"COALESCE(cc.c$r, 0) AS c$r").mkString(", ")}
         |FROM recalls r LEFT JOIN cc ON r.qid = cc.qid
         |ORDER BY r.qid""".stripMargin
    },
    "s06_ivf_recall_sweep" ->
      s"""WITH elems AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |centroids AS (SELECT label, pos, avg(v) AS cv FROM elems GROUP BY label, pos),
         |qe AS (SELECT vec_id AS qid, pos AS qpos, v AS qev FROM elems WHERE vec_id < 5),
         |cc AS (
         |  SELECT qe.qid, c.label,
         |    ROUND(SUM(c.cv * qe.qev) / (sqrt(SUM(c.cv * c.cv)) * sqrt(SUM(qe.qev * qe.qev))), 6) AS ccos
         |  FROM centroids c JOIN qe ON c.pos = qe.qpos
         |  GROUP BY qe.qid, c.label),
         |crank AS (
         |  SELECT qid, label,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ccos DESC, label ASC) AS crank
         |  FROM cc),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.qid, e.vec_id, e.label, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |exact AS (
         |  SELECT qid, vec_id, label FROM (
         |    SELECT qid, vec_id, label,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM scored) WHERE rn <= 10)
         |SELECT x.qid, COUNT(*) AS n_exact,
         |  CAST(FLOOR(SUM(CASE WHEN r.crank <= 1 THEN 1 ELSE 0 END) * 10000.0 / COUNT(*)) AS BIGINT) AS r1_bp,
         |  CAST(FLOOR(SUM(CASE WHEN r.crank <= 2 THEN 1 ELSE 0 END) * 10000.0 / COUNT(*)) AS BIGINT) AS r2_bp,
         |  CAST(FLOOR(SUM(CASE WHEN r.crank <= 4 THEN 1 ELSE 0 END) * 10000.0 / COUNT(*)) AS BIGINT) AS r4_bp
         |FROM exact x JOIN crank r ON x.qid = r.qid AND x.label = r.label
         |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "d08_embedding_neardup" -> {
      def b(e: String) = (0 until 6)
        .map(i => s"(CASE WHEN $e[${i + 1}] >= 0 THEN '1' ELSE '0' END)")
        .mkString("concat(", ", ", ")")
      s"""SELECT a.vec_id AS v1, b.vec_id AS v2,
         |  ${cosSql("a.embedding", "b.embedding", 4)} AS cos
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND ${b("a.embedding")} = ${b("b.embedding")}
         |  AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding", 4)} >= 0.2
         |ORDER BY v1, v2 LIMIT 200""".stripMargin
    },
    "s08_quantization_error" ->
      """WITH t AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    greatest(list_aggregate(
        |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'),
        |      1e-12) AS mx
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, v,
        |    list_transform(v, x -> FLOOR(x * 127.0 / mx + 0.5) * mx / 127.0) AS dq
        |  FROM t)
        |SELECT vec_id,
        |  ROUND(list_dot_product(v, dq)
        |    / greatest(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq)),
        |               1e-12), 6) AS cos_q
        |FROM q ORDER BY cos_q ASC, vec_id ASC LIMIT 50""".stripMargin,
    "s07_centroid_outliers" ->
      """WITH elems AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |centroids AS (SELECT label, pos, avg(v) AS cv FROM elems GROUP BY label, pos),
        |cos AS (
        |  SELECT e.label, e.vec_id,
        |    ROUND(SUM(e.v * c.cv) / greatest(sqrt(SUM(e.v * e.v)) * sqrt(SUM(c.cv * c.cv)), 1e-12), 6) AS cos
        |  FROM elems e JOIN centroids c ON e.label = c.label AND e.pos = c.pos
        |  GROUP BY e.label, e.vec_id)
        |SELECT label, vec_id, cos, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY label ORDER BY cos ASC, vec_id ASC) AS rn
        |  FROM cos)
        |WHERE rn <= 3 ORDER BY label, rn""".stripMargin,
    "d15_semantic_dedup" -> {
      def b(e: String) = (0 until 6)
        .map(i => s"(CASE WHEN $e[${i + 1}] >= 0 THEN '1' ELSE '0' END)")
        .mkString("concat(", ", ", ")")
      s"""WITH elems AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |centroids AS (SELECT label, pos, avg(v) AS cv FROM elems GROUP BY label, pos),
         |cc AS (
         |  SELECT e.label, e.vec_id,
         |    ROUND(SUM(e.v * c.cv) / greatest(sqrt(SUM(e.v * e.v)) * sqrt(SUM(c.cv * c.cv)), 1e-12), 6) AS ccos
         |  FROM elems e JOIN centroids c ON e.label = c.label AND e.pos = c.pos
         |  GROUP BY e.label, e.vec_id),
         |pairs AS (
         |  SELECT a.label, a.vec_id AS v1, b.vec_id AS v2
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND ${b("a.embedding")} = ${b("b.embedding")}
         |    AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding", 4)} >= 0.2),
         |removed AS (
         |  SELECT label, COUNT(*) AS n_removed FROM (
         |    SELECT DISTINCT p.label,
         |      CASE WHEN c1.ccos > c2.ccos THEN p.v1
         |           WHEN c2.ccos > c1.ccos THEN p.v2
         |           ELSE greatest(p.v1, p.v2) END AS rm
         |    FROM pairs p
         |    JOIN cc c1 ON p.v1 = c1.vec_id
         |    JOIN cc c2 ON p.v2 = c2.vec_id)
         |  GROUP BY label)
         |SELECT e.label, COUNT(*) AS n_vecs,
         |  COALESCE(MAX(r.n_removed), 0) AS n_removed,
         |  COUNT(*) - COALESCE(MAX(r.n_removed), 0) AS n_kept
         |FROM embeddings e LEFT JOIN removed r ON e.label = r.label
         |GROUP BY e.label ORDER BY e.label""".stripMargin
    },
    // both stages restated: int8-dequantized coarse scan → CoarseK cut →
    // full-precision re-rank, flagged against the true top-10
    "s11_two_stage" ->
      s"""WITH t AS (
         |  SELECT vec_id, embedding,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         |    greatest(list_aggregate(
         |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'),
         |      1e-12) AS mx
         |  FROM embeddings),
         |dqt AS (
         |  SELECT vec_id, embedding,
         |    list_transform(v, x -> FLOOR(x * 127.0 / mx + 0.5) * mx / 127.0) AS dq
         |  FROM t),
         |q AS (SELECT embedding AS qv, dq AS qdq FROM dqt WHERE vec_id = $QueryId),
         |coarse AS (
         |  SELECT d.vec_id, d.embedding, q.qv
         |  FROM dqt d, q WHERE d.vec_id <> $QueryId
         |  ORDER BY list_dot_product(d.dq, q.qdq) DESC, d.vec_id ASC
         |  LIMIT $CoarseK),
         |rer AS (
         |  SELECT vec_id, ${cosSql("embedding", "qv", 6)} AS cos
         |  FROM coarse
         |  ORDER BY cos DESC, vec_id ASC LIMIT 10),
         |ex AS (
         |  SELECT e.vec_id AS x_vid
         |  FROM embeddings e, (SELECT embedding AS qv FROM embeddings
         |                      WHERE vec_id = $QueryId) q
         |  WHERE e.vec_id <> $QueryId
         |  ORDER BY ${cosSql("e.embedding", "q.qv", 6)} DESC, e.vec_id ASC
         |  LIMIT 10)
         |SELECT ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS rn,
         |  vec_id, cos,
         |  CAST(CASE WHEN x_vid IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_exact
         |FROM rer LEFT JOIN ex ON vec_id = x_vid
         |ORDER BY rn""".stripMargin,
    // same quantizer, the coarse order ranked once, each K a conditional
    // count over the exact top-10's coarse ranks
    "s12_coarsek_sweep" ->
      s"""WITH t AS (
         |  SELECT vec_id, embedding,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         |    greatest(list_aggregate(
         |      list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'),
         |      1e-12) AS mx
         |  FROM embeddings),
         |dqt AS (
         |  SELECT vec_id, embedding,
         |    list_transform(v, x -> FLOOR(x * 127.0 / mx + 0.5) * mx / 127.0) AS dq
         |  FROM t),
         |q AS (SELECT embedding AS qv, dq AS qdq FROM dqt WHERE vec_id = $QueryId),
         |ranked AS (
         |  SELECT vec_id AS c_vid,
         |    ROW_NUMBER() OVER (ORDER BY list_dot_product(dq, (SELECT qdq FROM q)) DESC,
         |                       vec_id ASC) AS rnc
         |  FROM dqt WHERE vec_id <> $QueryId
         |  QUALIFY rnc <= $CoarseK),
         |ex AS (
         |  SELECT e.vec_id
         |  FROM embeddings e, q
         |  WHERE e.vec_id <> $QueryId
         |  ORDER BY ${cosSql("e.embedding", "q.qv", 6)} DESC, e.vec_id ASC
         |  LIMIT 10),
         |hits AS (SELECT ex.vec_id, r.rnc FROM ex LEFT JOIN ranked r ON ex.vec_id = r.c_vid)
         |SELECT CAST(p.k AS BIGINT) AS k,
         |  CAST(SUM(CASE WHEN rnc <= p.k THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
         |  CAST(FLOOR(SUM(CASE WHEN rnc <= p.k THEN 1 ELSE 0 END) * 10000.0 / 10)
         |    AS BIGINT) AS recall_bp
         |FROM (SELECT 10 AS k UNION ALL SELECT 25 UNION ALL SELECT 50
         |      UNION ALL SELECT 100) p
         |CROSS JOIN hits
         |GROUP BY p.k ORDER BY k""".stripMargin,
    "s13_kmeans_step" ->
      """WITH elems AS (
        |  SELECT vec_id, label AS orig, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |cent AS (SELECT orig AS clabel, pos, avg(v) AS cv FROM elems GROUP BY 1, 2),
        |scores AS (
        |  SELECT e.vec_id, e.orig, c.clabel,
        |    ROUND(sum(e.v * c.cv) /
        |      greatest(sqrt(sum(e.v * e.v)) * sqrt(sum(c.cv * c.cv)), 1e-12), 6) AS cos
        |  FROM elems e JOIN cent c ON e.pos = c.pos
        |  GROUP BY 1, 2, 3),
        |assign AS (
        |  SELECT vec_id, orig, clabel FROM (
        |    SELECT vec_id, orig, clabel,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel ASC) AS rn
        |    FROM scores) WHERE rn = 1),
        |newc AS (
        |  SELECT a.clabel, e.pos, avg(e.v) AS nv
        |  FROM assign a JOIN elems e ON e.vec_id = a.vec_id
        |  GROUP BY 1, 2),
        |shft AS (
        |  SELECT c.clabel, ROUND(sqrt(sum((n.nv - c.cv) * (n.nv - c.cv))), 6) AS shift
        |  FROM cent c LEFT JOIN newc n ON n.clabel = c.clabel AND n.pos = c.pos
        |  GROUP BY 1),
        |stats AS (
        |  SELECT clabel, CAST(COUNT(*) AS BIGINT) AS n_assigned,
        |    CAST(SUM(CASE WHEN orig <> clabel THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        |  FROM assign GROUP BY 1)
        |SELECT s.clabel AS label,
        |  COALESCE(st.n_assigned, 0) AS n_assigned,
        |  COALESCE(st.n_moved, 0) AS n_moved,
        |  s.shift
        |FROM shft s LEFT JOIN stats st ON st.clabel = s.clabel
        |ORDER BY label""".stripMargin,
    "p10_diverse_budget" ->
      s"""WITH elems AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |cent AS (SELECT label, pos, avg(v) AS cv FROM elems GROUP BY 1, 2),
         |cc AS (
         |  SELECT e.label, e.vec_id,
         |    ROUND(sum(e.v * c.cv) /
         |      greatest(sqrt(sum(e.v * e.v)) * sqrt(sum(c.cv * c.cv)), 1e-12), 6) AS ccos
         |  FROM elems e JOIN cent c ON e.label = c.label AND e.pos = c.pos
         |  GROUP BY 1, 2),
         |sizes AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(FLOOR(sqrt(COUNT(*)) * 1000000.0) AS BIGINT) AS wq
         |  FROM cc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS totw FROM sizes),
         |quotas AS (
         |  SELECT label, n_vecs,
         |    least(CAST(FLOOR(200 * wq / totw) AS BIGINT), n_vecs) AS quota
         |  FROM sizes, tot),
         |ranked AS (
         |  SELECT label, vec_id, ccos,
         |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY ccos ASC, vec_id ASC) AS rn
         |  FROM cc)
         |SELECT r.label, q.n_vecs, q.quota,
         |  CAST(COUNT(*) AS BIGINT) AS n_taken, max(r.ccos) AS cutoff_ccos
         |FROM ranked r JOIN quotas q ON r.label = q.label
         |WHERE r.rn <= q.quota
         |GROUP BY r.label, q.n_vecs, q.quota
         |ORDER BY r.label""".stripMargin,
    "s15_dimred_sweep" -> {
      def cosD(dd: Int) =
        s"""ROUND(SUM(CASE WHEN j < $dd THEN p * qp ELSE 0 END) /
           |      greatest(sqrt(SUM(CASE WHEN j < $dd THEN p * p ELSE 0 END)) *
           |               sqrt(SUM(CASE WHEN j < $dd THEN qp * qp ELSE 0 END)), 1e-12),
           |      6) AS cos$dd""".stripMargin
      def hits(dd: Int) =
        s"""h$dd AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
           |    SELECT vec_id FROM dots ORDER BY cos$dd DESC, vec_id ASC LIMIT 10) t
           |  JOIN exact USING (vec_id))""".stripMargin
      s"""WITH coef AS (
         |  SELECT j, i,
         |    CASE WHEN substr(md5(CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)
         |         IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END AS sgn
         |  FROM (SELECT unnest(generate_series(0, 47)) AS j),
         |       (SELECT unnest(generate_series(0, 63)) AS i)),
         |elems AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |proj AS (
         |  SELECT vec_id, j, SUM(v * sgn) AS p
         |  FROM elems JOIN coef USING (i) GROUP BY 1, 2),
         |q AS (SELECT j AS qj, p AS qp FROM proj WHERE vec_id = $QueryId),
         |dots AS (
         |  SELECT vec_id, ${cosD(16)}, ${cosD(32)}, ${cosD(48)}
         |  FROM proj JOIN q ON j = qj
         |  WHERE vec_id <> $QueryId GROUP BY vec_id),
         |exact AS (
         |  SELECT vec_id FROM (
         |    SELECT vec_id FROM embeddings, (SELECT embedding AS qv FROM embeddings
         |                                    WHERE vec_id = $QueryId) q
         |    WHERE vec_id <> $QueryId
         |    ORDER BY ${cosSql("embedding", "qv", 6)} DESC, vec_id ASC LIMIT 10)),
         |${hits(16)}, ${hits(32)}, ${hits(48)}
         |SELECT dim, n_hits,
         |  CAST(FLOOR(n_hits * 10000.0 / 10) AS BIGINT) AS recall_bp
         |FROM (SELECT 16 AS dim, c AS n_hits FROM h16
         |      UNION ALL SELECT 32, c FROM h32
         |      UNION ALL SELECT 48, c FROM h48)
         |ORDER BY dim""".stripMargin
    },
    // s14 IS s01 semantically; the oracle restates the same query so the
    // SQL-text path is value-gated independently
    "s14_sql_surface" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId)
         |SELECT vec_id, ${cosSql("embedding", "qv", 6)} AS cos
         |FROM embeddings, q WHERE vec_id <> $QueryId
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,
    // pos is 1-based here (generate_subscripts, the s03 convention) so
    // the subspace id is (pos-1)//16 where Spark's 0-based is pos div 16
    "s17_pq_error" ->
      s"""WITH elems AS (
         |  SELECT vec_id, label AS orig, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |cent AS (
         |  SELECT orig AS clabel, pos, avg(v) AS cv
         |  FROM elems GROUP BY orig, pos),
         |d AS (
         |  SELECT e.vec_id, e.orig, (e.pos - 1) // 16 AS sub, c.clabel,
         |    ROUND(SUM((e.v - c.cv) * (e.v - c.cv)), 6) AS d2
         |  FROM elems e JOIN cent c ON e.pos = c.pos
         |  GROUP BY 1, 2, 3, 4),
         |codes AS (
         |  SELECT vec_id, orig, sub, clabel FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |                                 ORDER BY d2 ASC, clabel ASC) AS rn
         |    FROM d)
         |  WHERE rn = 1),
         |rec AS (
         |  SELECT e.vec_id, e.orig,
         |    CAST(FLOOR(ROUND(SUM(e.v * c.cv)
         |      / greatest(sqrt(SUM(e.v * e.v)) * sqrt(SUM(c.cv * c.cv)), 1e-12), 6)
         |      * 10000) AS BIGINT) AS recon_bp
         |  FROM elems e
         |  JOIN codes k ON k.vec_id = e.vec_id AND k.sub = (e.pos - 1) // 16
         |  JOIN cent c ON c.clabel = k.clabel AND c.pos = e.pos
         |  GROUP BY 1, 2),
         |cs AS (
         |  SELECT vec_id, orig,
         |    CAST(SUM(CASE WHEN clabel = orig THEN 1 ELSE 0 END) AS BIGINT) AS own_codes
         |  FROM codes GROUP BY 1, 2)
         |SELECT orig AS label, COUNT(*) AS n_vecs,
         |  CAST(FLOOR(SUM(recon_bp) / COUNT(*)) AS BIGINT) AS avg_recon_bp,
         |  MIN(recon_bp) AS min_recon_bp,
         |  CAST(FLOOR(SUM(own_codes) * 10000.0 / (COUNT(*) * 4)) AS BIGINT) AS own_code_bp
         |FROM rec JOIN cs USING (vec_id, orig)
         |GROUP BY orig ORDER BY label""".stripMargin,
    "s16_knn_graph" ->
      s"""WITH sub AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  WHERE vec_id < $KnnGraphCap),
         |pairs AS (
         |  SELECT a.vec_id AS a, a.label AS la, b.vec_id AS b, b.label AS lb,
         |    ${cosSql("a.embedding", "b.embedding", 6)} AS cos
         |  FROM sub a JOIN sub b ON a.vec_id <> b.vec_id),
         |edges AS (
         |  SELECT a, la, b, lb FROM (
         |    SELECT a, la, b, lb,
         |      ROW_NUMBER() OVER (PARTITION BY a
         |                         ORDER BY cos DESC, b ASC) AS rnk
         |    FROM pairs)
         |  WHERE rnk <= $KnnK),
         |m AS (
         |  SELECT e.la, e.lb,
         |    CASE WHEN r.a IS NOT NULL THEN 1 ELSE 0 END AS has_rev
         |  FROM edges e LEFT JOIN edges r ON e.a = r.b AND e.b = r.a)
         |SELECT la AS label, n_vecs, n_edges, recip_bp, purity_bp FROM (
         |  SELECT la,
         |    (SELECT CAST(COUNT(DISTINCT a) AS BIGINT)
         |     FROM edges e2 WHERE e2.la = m.la) AS n_vecs,
         |    CAST(COUNT(*) AS BIGINT) AS n_edges,
         |    CAST(FLOOR(SUM(has_rev) * 10000.0 / COUNT(*)) AS BIGINT) AS recip_bp,
         |    CAST(FLOOR(SUM(CASE WHEN lb = la THEN 1 ELSE 0 END) * 10000.0
         |      / COUNT(*)) AS BIGINT) AS purity_bp
         |  FROM m GROUP BY la)
         |ORDER BY label""".stripMargin,

    "s18_range_search" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |           FROM embeddings WHERE vec_id < $RangeNq),
         |pairs AS (
         |  SELECT q.qid, ${cosSql("e.embedding", "q.qv", 6)} AS c
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid)
         |SELECT qid, COUNT(*) AS n_in_radius,
         |  max(c) AS max_cos, min(c) AS min_cos
         |FROM pairs WHERE c >= $RangeTau
         |GROUP BY qid ORDER BY qid""".stripMargin,

    "s19_ivf_balance" ->
      """WITH elems AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |lelems AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |cent AS (SELECT label AS clabel, pos, avg(v) AS cv FROM lelems GROUP BY 1, 2),
        |scores AS (
        |  SELECT e.vec_id, c.clabel,
        |    ROUND(sum(e.v * c.cv) /
        |      greatest(sqrt(sum(e.v * e.v)) * sqrt(sum(c.cv * c.cv)), 1e-12), 6) AS cos
        |  FROM elems e JOIN cent c ON e.pos = c.pos
        |  GROUP BY 1, 2),
        |assign AS (
        |  SELECT vec_id, clabel FROM (
        |    SELECT vec_id, clabel,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel ASC) AS rn
        |    FROM scores) WHERE rn = 1),
        |sizes AS (SELECT clabel, CAST(COUNT(*) AS BIGINT) AS sz FROM assign GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k_cells,
        |  CAST(SUM(sz) AS BIGINT) AS n_vecs,
        |  CAST(MAX(sz) AS BIGINT) AS max_list,
        |  CAST(MIN(sz) AS BIGINT) AS min_list,
        |  CAST(FLOOR(COUNT(*) * SUM(sz * sz) * 10000.0 / (SUM(sz) * SUM(sz))) AS BIGINT) AS if_bp,
        |  CAST(FLOOR(SUM(sz * sz) * 10000.0 / (SUM(sz) * SUM(sz))) AS BIGINT) AS scan_bp
        |FROM sizes""".stripMargin,

    "s20_embedding_drift" ->
      """WITH bnd AS (
        |  SELECT CAST(FLOOR(max(vec_id) * 0.8) AS BIGINT) AS b FROM embeddings),
        |halved AS (
        |  SELECT e.*, CASE WHEN e.vec_id <= bnd.b THEN 'base' ELSE 'batch' END AS half
        |  FROM embeddings e CROSS JOIN bnd),
        |counts AS (
        |  SELECT label,
        |    COUNT(CASE WHEN half = 'base' THEN 1 END) AS n_base,
        |    COUNT(CASE WHEN half = 'batch' THEN 1 END) AS n_batch
        |  FROM halved GROUP BY label),
        |elems AS (
        |  SELECT label, half, generate_subscripts(embedding, 1) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM halved),
        |cent AS (SELECT label, half, pos, avg(v) AS cv FROM elems GROUP BY 1, 2, 3),
        |paired AS (
        |  SELECT b.label, b.pos, b.cv AS bv, t.cv AS tv
        |  FROM (SELECT * FROM cent WHERE half = 'base') b
        |  JOIN (SELECT * FROM cent WHERE half = 'batch') t
        |    ON b.label = t.label AND b.pos = t.pos),
        |drift AS (
        |  SELECT label,
        |    ROUND(SUM(bv * tv) /
        |      greatest(sqrt(SUM(bv * bv)) * sqrt(SUM(tv * tv)), 1e-12), 6) AS centroid_cos,
        |    ROUND(sqrt(SUM(tv * tv)) / greatest(sqrt(SUM(bv * bv)), 1e-12), 6) AS cnorm_ratio
        |  FROM paired GROUP BY label)
        |SELECT d.label, c.n_base, c.n_batch, d.centroid_cos, d.cnorm_ratio
        |FROM drift d JOIN counts c ON d.label = c.label
        |ORDER BY d.label""".stripMargin,

    "s21_hybrid_search" ->
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
         |  FROM documents),
         |q AS (SELECT tok FROM toks WHERE doc_id = $QueryId),
         |ov AS (
         |  SELECT t.doc_id, COUNT(*) AS overlap
         |  FROM toks t JOIN q USING (tok) WHERE t.doc_id <> $QueryId
         |  GROUP BY t.doc_id),
         |lex AS (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY overlap DESC, doc_id) AS BIGINT) AS r_lex
         |  FROM (SELECT * FROM ov ORDER BY overlap DESC, doc_id LIMIT 50)),
         |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId),
         |cs AS (
         |  SELECT vec_id AS doc_id, ${cosSql("embedding", "qv", 6)} AS cos
         |  FROM embeddings CROSS JOIN qv WHERE vec_id <> $QueryId),
         |vec AS (
         |  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS r_vec
         |  FROM (SELECT * FROM cs ORDER BY cos DESC, doc_id LIMIT 50)),
         |f AS (
         |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
         |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.r_lex), CAST(0.0 AS DOUBLE))
         |      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.r_vec), CAST(0.0 AS DOUBLE)) AS rrf
         |  FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT doc_id, COALESCE(r_lex, 0) AS lex_rank, COALESCE(r_vec, 0) AS vec_rank,
         |  CAST(FLOOR(rrf * 1000000) AS BIGINT) AS rrf_ppm
         |FROM f ORDER BY rrf_ppm DESC, doc_id LIMIT 10""".stripMargin,

    "s22_pq_adc_topk" ->
      s"""WITH elems AS (
         |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |cent AS (
         |  SELECT label AS clabel, pos, avg(v) AS cv
         |  FROM elems GROUP BY 1, 2),
         |d AS (
         |  SELECT e.vec_id, (e.pos - 1) // 16 AS sub, c.clabel,
         |    ROUND(SUM((e.v - c.cv) * (e.v - c.cv)), 6) AS d2
         |  FROM elems e JOIN cent c ON e.pos = c.pos
         |  GROUP BY 1, 2, 3),
         |codes AS (
         |  SELECT vec_id, sub, clabel FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |                                 ORDER BY d2 ASC, clabel ASC) AS rn
         |    FROM d)
         |  WHERE rn = 1),
         |qe AS (SELECT pos, v AS qv FROM elems WHERE vec_id = $QueryId),
         |tab AS (
         |  SELECT c.clabel, (c.pos - 1) // 16 AS sub,
         |    CAST(SUM(CAST(ROUND(q.qv * c.cv * 1000000, 0) AS BIGINT)) AS BIGINT) AS t
         |  FROM cent c JOIN qe q ON q.pos = c.pos
         |  GROUP BY 1, 2),
         |adc AS (
         |  SELECT k.vec_id, CAST(SUM(t.t) AS BIGINT) AS adc_ipm
         |  FROM codes k JOIN tab t ON t.sub = k.sub AND t.clabel = k.clabel
         |  WHERE k.vec_id <> $QueryId
         |  GROUP BY 1),
         |top AS (SELECT * FROM adc ORDER BY adc_ipm DESC, vec_id LIMIT 10),
         |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = $QueryId),
         |cs AS (
         |  SELECT vec_id, ${cosSql("embedding", "qv", 6)} AS cos
         |  FROM embeddings CROSS JOIN qv WHERE vec_id <> $QueryId),
         |ex AS (SELECT vec_id FROM cs ORDER BY cos DESC, vec_id LIMIT 10)
         |SELECT t.vec_id, t.adc_ipm, c.cos,
         |  CAST(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_exact10
         |FROM top t JOIN cs c USING (vec_id) LEFT JOIN ex e USING (vec_id)
         |ORDER BY t.adc_ipm DESC, t.vec_id""".stripMargin,

    "s23_filtered_topk" ->
      s"""WITH q AS (
         |  SELECT embedding AS qv, label AS qlabel
         |  FROM embeddings WHERE vec_id = $QueryId),
         |cs AS (
         |  SELECT vec_id, label, qlabel, ${cosSql("embedding", "qv", 6)} AS cos
         |  FROM embeddings CROSS JOIN q WHERE vec_id <> $QueryId),
         |pre AS (
         |  SELECT vec_id, cos,
         |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS pre_rank
         |  FROM (SELECT * FROM cs WHERE label = qlabel
         |        ORDER BY cos DESC, vec_id LIMIT 10)),
         |post AS (
         |  SELECT vec_id FROM (SELECT * FROM cs ORDER BY cos DESC, vec_id LIMIT 50)
         |  WHERE label = qlabel ORDER BY cos DESC, vec_id LIMIT 10)
         |SELECT p.vec_id, p.cos, p.pre_rank,
         |  CAST(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_post
         |FROM pre p LEFT JOIN post t USING (vec_id)
         |ORDER BY p.pre_rank""".stripMargin,

    "s24_ivf_knn_join" ->
      s"""WITH elems AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |lelems AS (
         |  SELECT label, generate_subscripts(embedding, 1) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings),
         |cent AS (SELECT label AS clabel, pos, avg(v) AS cv FROM lelems GROUP BY 1, 2),
         |scores AS (
         |  SELECT e.vec_id, c.clabel,
         |    ROUND(sum(e.v * c.cv) /
         |      greatest(sqrt(sum(e.v * e.v)) * sqrt(sum(c.cv * c.cv)), 1e-12), 6) AS ccos
         |  FROM elems e JOIN cent c ON e.pos = c.pos
         |  GROUP BY 1, 2),
         |assign AS (
         |  SELECT vec_id, clabel AS cell FROM (
         |    SELECT vec_id, clabel,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, clabel ASC) AS rn
         |    FROM scores) WHERE rn = 1),
         |emb AS (
         |  SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN assign a USING (vec_id)),
         |qs AS (SELECT vec_id AS qid, embedding AS qv, cell FROM emb WHERE vec_id < 8),
         |cands AS (
         |  SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM emb e JOIN qs q USING (cell) WHERE e.vec_id <> q.qid),
         |approx AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM cands) WHERE rn <= 10),
         |ncand AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_cand FROM cands GROUP BY 1),
         |qsb AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
         |ecs AS (
         |  SELECT q.qid, e.vec_id, ${cosSql("e.embedding", "q.qv", 6)} AS cos
         |  FROM embeddings e CROSS JOIN qsb q WHERE e.vec_id <> q.qid),
         |exact AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
         |    FROM ecs) WHERE rn <= 10),
         |hits AS (
         |  SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS h
         |  FROM approx a JOIN exact x ON a.qid = x.qid AND a.vec_id = x.vec_id
         |  GROUP BY 1)
         |SELECT q.qid, COALESCE(n.n_cand, 0) AS n_cand,
         |  CAST(COALESCE(h.h, 0) * 1000 AS BIGINT) AS recall_bp
         |FROM qsb q LEFT JOIN ncand n USING (qid) LEFT JOIN hits h USING (qid)
         |ORDER BY q.qid""".stripMargin
  )
}
