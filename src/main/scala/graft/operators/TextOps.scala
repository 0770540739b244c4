package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.RegexpFunctions.regexp_count_fast

/** Text-analysis operators over `documents`: language-ID (stopword n-gram
  * heuristic), quality scoring, token counting (whitespace + BPE-ish
  * regex classes), and content fingerprinting. Everything is built from
  * codegen'd regexp/string built-ins — one scan per query, no UDFs — so
  * each runs unchanged over a partitioned 100 TB corpus.
  */
object TextOps {

  /** Tiny per-language stopword regexes (word-boundary alternations).
    * The heuristic is intentionally simple and fully SQL-expressible so
    * the DuckDB oracle verifies the operator exactly. */
  private val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|a)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein)\\b",
    "es" -> "\\b(el|la|los|de|que|es|un)\\b",
    "fr" -> "\\b(le|la|les|des|est|une|et)\\b")

  private def scoreCol(pat: String): Column =
    regexp_count_fast(lower(col("text")), pat)

  private def scoreSql(pat: String): String =
    s"len(regexp_extract_all(lower(text), '$pat', 1))"

  private val WsTok = "\\S+"
  // BPE-ish pre-tokenization classes: letter runs | digit runs | single
  // non-space symbol (the GPT-2 pre-tokenizer shape, simplified).
  private val BpeTok = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Offline BPE trainer (the [[BpeMerges]] artifact builder — run once
    * per tokenizer release, never in a gate's hot path): Sennrich et al.
    * 2016 iterated to `n` merges over whitespace words. Per rank, encode
    * every word with the merges learned so far (each merged symbol is
    * ONE private-use char, U+E000+rank, so encoding is a fold of literal
    * replaces and every adjacent symbol pair is a 2-char substring),
    * census all adjacent pairs (t19's kernel), and merge the most
    * frequent — ties broken by pair asc, so the table is deterministic
    * for a fixed corpus. The per-iteration census is one scan + one
    * rollup + a top-1 collect; at 100 TB production trainers update the
    * census incrementally instead of rescanning (t19's note) — this
    * exhaustive form is the spec of WHAT each iteration computes. */
  private[graft] def trainBpeMerges(docs: DataFrame, n: Int): Seq[(String, String)] = {
    val words = docs
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.size < n && !done) {
      val enc = merges.foldLeft(col("tok")) { case (c, (p, m)) =>
        replace(c, lit(p), lit(m))
      }
      val top = words.select(enc.as("e"))
        .filter(length(col("e")) >= 2)
        .withColumn("g", explode(sequence(lit(1), length(col("e")) - 1)))
        .select(col("e").substr(col("g"), lit(2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n_occ"))
        .orderBy(col("n_occ").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else merges :+= (top(0).getString(0) ->
        new String(Character.toChars(0xE000 + merges.size)))
    }
    merges
  }

  // trainBpeMerges(documents@sf0.01, 24) output, pair strings in rank
  // order ("\uE0xx" = the rank-xx merged symbol appearing inside a later
  // pair). Regenerate with the trainer if the corpus snapshot changes;
  // the CorpusOpsSpec pin will name the drift.
  private val BpeMergesTrained: Seq[String] = Seq("er", "in", "ow",
    "or", "st", "m\uE000", "at", "lu", "ar", "p\uE008", "jo",
    "\uE00A\uE001", "as", "h\uE00C", "\uE00Dh", "r\uE002", "b\uE006",
    "ch", "\uE010\uE011", "an", "c\uE013", "s\uE014", "co", "cu")

  /** The pinned t22 merge table: [[trainBpeMerges]] at sf0.01, 24 merges
    * (CorpusOpsSpec re-trains and asserts this pin, so the constant can
    * never drift from the recipe silently). Pairs may reference earlier
    * merge outputs (the U+E0xx chars) — rank-order application is the
    * BPE contract. */
  private[graft] val BpeMerges: Seq[(String, String)] =
    BpeMergesTrained.zipWithIndex.map { case (p, i) =>
      p -> new String(Character.toChars(0xE000 + i))
    }

  /** Driver-local twin of [[trainBpeMerges]] for LARGE merge counts
    * (r14): the Spark trainer re-plans an r-deep replace chain per
    * iteration — O(n²) expression nodes over a run, unusable past a few
    * dozen merges — while the census it computes depends only on the
    * distinct-word frequency table, which for any corpus is tiny next
    * to the corpus itself (31 types here; ~10⁷ even at web scale — the
    * one collect a 100 TB tokenizer build actually ships to a driver).
    * Same loop, same tie-break, same leftmost-non-overlapping replace:
    * the pin spec asserts it reproduces the Spark trainer's table. */
  private[graft] def trainBpeMergesLocal(
      wordCounts: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    val enc = wordCounts.map(_._1).toArray
    val cnt = wordCounts.map(_._2).toArray
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.size < n && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < enc.length) {
        val w = enc(i)
        var j = 0
        while (j < w.length - 1) {
          val p = w.substring(j, j + 2)
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + cnt(i))
          j += 1
        }
        i += 1
      }
      if (pairCounts.isEmpty) done = true
      else {
        // most frequent pair, ties by pair ascending (UTF-16 order ==
        // codepoint order here: no surrogates in ASCII + U+E0xx symbols)
        val pair = pairCounts.minBy { case (p, c) => (-c, p) }._1
        val m = new String(Character.toChars(0xE000 + merges.size))
        merges :+= (pair -> m)
        i = 0
        while (i < enc.length) { enc(i) = enc(i).replace(pair, m); i += 1 }
      }
    }
    merges
  }

  /** Deterministic synthetic vocabulary + trained merge table for the
    * table-size regime the real corpus cannot reach (its 31-word
    * vocabulary saturates at 89 merges): seeded LCG words through the
    * local trainer. One source of truth for the vocabulary-scale spec
    * (CorpusOpsSpec) and the ScaleProbe table-size row. */
  private[graft] def syntheticVocabMerges(nMerges: Int, nWords: Int = 4000)
      : (Seq[String], Seq[(String, String)]) = {
    val rng = new java.util.Random(0xB9E5EED)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val words = (0 until nWords).map { _ =>
      val len = 4 + rng.nextInt(10)
      (0 until len).map(_ => alpha(rng.nextInt(26))).mkString
    }.distinct
    val wc = words.map(w => w -> (1L + rng.nextInt(50)))
    (words, trainBpeMergesLocal(wc, nMerges))
  }

  /** Distinct-word frequency table of a corpus — the local trainer's
    * input, computed distributed (one scan + one rollup), collected
    * bounded (word TYPES, not occurrences). */
  private[graft] def wordCounts(docs: DataFrame): Seq[(String, Long)] =
    docs.select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy("tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  // trainBpeMerges*(documents@sf0.01) run to SATURATION: the corpus'
  // 31-word vocabulary exhausts at 89 merges (every distinct word
  // collapses to one symbol; the pair census then empties and the
  // trainer stops). Prefix-stable by construction — ranks are chosen
  // greedily in order — so BpeMergesTrained above IS rows 0-23 of this
  // table, and the pin spec re-derives the whole table. A production
  // 30-100k-merge vocabulary needs a corpus with real lexical diversity;
  // this synthetic corpus cannot train one, so vocabulary-SCALE behavior
  // is pinned on a deterministic synthetic vocabulary instead
  // (CorpusOpsSpec / ScaleProbe), priced there rather than faked here.
  private val BpeMergesSatTrained: Seq[String] = Seq(
    "er", "in", "ow", "or", "st", "m\ue000",
    "at", "lu", "ar", "p\ue008", "jo", "\ue00a\ue001",
    "as", "h\ue00c", "\ue00dh", "r\ue002", "b\ue006", "ch",
    "\ue010\ue011", "an", "c\ue013", "s\ue014", "co", "cu",
    "mn", "o\ue005", "\ue004\ue019", "\ue007\ue018", "\ue016\ue01b", "\ue017\ue01a",
    "fi", "lt", "\ue01e\ue01f", "\ue020\ue000", "al", "m\ue022",
    "s\ue023", "\ue024l", "ge", "l\ue002", "s\ue027", "\ue005\ue026",
    "ct", "d\ue000", "e\ue02a", "v\ue02c", "\ue003\ue02b", "\ue02d\ue003",
    "l\ue001", "\ue030e", "ab", "d\ue006", "le", "t\ue032",
    "\ue033a", "\ue035\ue034", "up", "ag", "\ue039g", "a\ue007",
    "v\ue03b", "\ue03ce", "ey", "k\ue03e", "am", "e\ue040",
    "r\ue041", "\ue004\ue042", "d\ue002", "w\ue001", "\ue045\ue044", "s\ue009",
    "\ue047k", "gr", "o\ue038", "\ue009t", "\ue049\ue04a", "bi",
    "\ue04dg", "s\ue003", "\ue04ft", "qu", "\ue000y", "\ue051\ue052",
    "a\ue004", "f\ue054", "he", "t\ue056", "d\ue038")

  private[graft] val BpeMergesSat: Seq[(String, String)] =
    BpeMergesSatTrained.zipWithIndex.map { case (p, i) =>
      p -> new String(Character.toChars(0xE000 + i))
    }

  /** The t23 gate table: 64 of the 89 saturation merges. At full
    * saturation every word encodes to ONE symbol, so token books stop
    * discriminating (any encoder that merges everything passes); at 64
    * the encoded forms still vary per word and the gate compares the
    * encoded STRINGS themselves cross-engine. */
  private[graft] val BpeMerges64: Seq[(String, String)] = BpeMergesSat.take(64)

  /** The t24 gate table: 1200 merges trained on the deterministic
    * synthetic vocabulary (the corpus' own 31 word types saturate at 89
    * merges — graft-domain constraint, documented on
    * [[syntheticVocabMerges]]). This is the REALISTIC table-size regime
    * for the native encoder: far past anything a replace chain could
    * compile as one expression, well under [[graft.functions.BpeTable]]'s
    * 6400 single-char merged-symbol cap. Lazy: the local trainer runs
    * once per JVM (~hundreds of ms), only when t24 is invoked. */
  private[graft] lazy val BpeMerges1200: Seq[(String, String)] =
    syntheticVocabMerges(1200)._2

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language-ID: argmax of stopword-hit counts; 'und' (undetermined)
    // when nothing matches. Reported as a confusion summary vs the lang
    // column.
    "t01_lang_id" -> ((s, d) => {
      val scored = langPatterns.foldLeft(Tables.documents(s, d)) {
        case (df, (l, p)) => df.withColumn(s"sc_$l", scoreCol(p))
      }
      val best = greatest(langPatterns.map(lp => col(s"sc_${lp._1}")): _*)
      val pred = when(best === 0, "und")
        .otherwise(langPatterns.foldRight(lit("und"): Column) {
          case ((l, _), acc) => when(col(s"sc_$l") === best, l).otherwise(acc)
        })
      scored.withColumn("predicted", pred)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // Quality score: length, punctuation-density and stopword-ratio
    // heuristics combined; the shape of a C4/Gopher-style quality filter.
    "t02_quality_score" -> ((s, d) => {
      val nTok = regexp_count_fast(col("text"), WsTok).cast("double")
      val nPunct = regexp_count_fast(col("text"), "[^a-zA-Z0-9\\s]").cast("double")
      val nStop = scoreCol(langPatterns.head._2).cast("double")
      // score in basis points via FLOOR: decimal ROUND at an exact .5
      // boundary differs between Spark (BigDecimal HALF_UP) and DuckDB
      // (binary-double rounding); floor of the bit-identical double is
      // engine-independent.
      Tables.documents(s, d)
        .withColumn("score_bp", floor(
          (least(col("n_chars") / 500.0, lit(1.0)) * 0.4
            + (lit(1.0) - least(nPunct / greatest(nTok, lit(1.0)), lit(1.0))) * 0.3
            + least(nStop / greatest(nTok, lit(1.0)) * 5.0, lit(1.0)) * 0.3) * 10000).cast("long"))
        .select("doc_id", "score_bp")
        .orderBy("doc_id").limit(200)
    }),

    // Token counting: whitespace tokens and BPE-ish pre-tokens, rolled up
    // per source — the budget accounting pass of a training pipeline.
    "t03_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("ws_tokens", regexp_count_fast(col("text"), WsTok))
        .withColumn("bpe_tokens", regexp_count_fast(col("text"), BpeTok))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws_tokens").as("ws_total"),
          sum("bpe_tokens").as("bpe_total"))
        .orderBy("source")),

    // Document fingerprint: md5 of the normalized text (the cheap
    // content-address used for cross-shard exact dedup and lineage).
    "t04_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("fp",
          substring(md5(regexp_replace(lower(col("text")), "\\s+", " ")), 1, 16))
        .select("doc_id", "fp")
        .orderBy("doc_id").limit(200)),

    // Corpus n-gram statistics: top word-bigrams by frequency — the
    // frequency table behind repetition/boilerplate filters (C4's "three-
    // sentence dedup", Gopher's repetition thresholds are built on
    // exactly this grouped count). explode → groupBy: one shuffle.
    "t05_top_bigrams" -> ((s, d) =>
      Tables.documents(s, d)
        .select(split(col("text"), "\\s+").as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc).limit(20)),

    // Per-doc repetition metrics — the Gopher-style repetition filter's
    // inputs (top-bigram frequency share, duplicate-word fraction), in
    // basis points via FLOOR for engine-exact verification. Two grouped
    // aggregations over one bigram explode; scales as t05 does.
    "t06_repetition" -> ((s, d) =>
      // scan-local like the t13 rewrite: the per-doc bigram census needs
      // no corpus context, so sorting the doc's own bigram array and
      // counting runs (distinct = run starts, top count = longest run)
      // replaces the (doc, bigram) exchange that once carried every
      // bigram of the corpus. The run-length fold threads a tiny struct
      // accumulator through `aggregate` — still whole-stage codegen.
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), "\\s+").as("w"))
        .filter(size(col("w")) >= 2)
        .withColumn("bg", expr(
          "array_sort(transform(sequence(1, size(w) - 1)," +
            " i -> concat(element_at(w, i), ' ', element_at(w, i + 1))))"))
        .withColumn("n_bigrams", size(col("bg")).cast("long"))
        .withColumn("n_distinct_bigrams", size(expr(
          "filter(sequence(0, size(bg) - 1), i -> i = 0 OR" +
            " element_at(bg, i) != element_at(bg, i + 1))")).cast("long"))
        .withColumn("top_c", expr(
          "aggregate(bg," +
            " named_struct('run', 0, 'best', 0, 'prev', CAST(NULL AS STRING))," +
            " (acc, x) -> named_struct(" +
            "   'run', IF(acc.prev IS NULL OR x != acc.prev, 1, acc.run + 1)," +
            "   'best', greatest(acc.best," +
            "     IF(acc.prev IS NULL OR x != acc.prev, 1, acc.run + 1))," +
            "   'prev', x)," +
            " acc -> acc.best)").cast("long"))
        .withColumn("top_share_bp",
          floor(col("top_c") * 10000.0 / col("n_bigrams")).cast("long"))
        .withColumn("dup_bigram_bp",
          floor((col("n_bigrams") - col("n_distinct_bigrams")) * 10000.0
            / col("n_bigrams")).cast("long"))
        .select("doc_id", "n_bigrams", "top_share_bp", "dup_bigram_bp")
        .orderBy("doc_id").limit(200)),

    // Per-doc top TF-IDF term — the keyword/topic signal a corpus triage
    // pass extracts. Two grouped aggs over one token explode (tf per
    // (doc, tok), df per tok) + a broadcast scalar N; idf = ln(N/df) in
    // IEEE double on both engines, ranked on the FLOORED basis points so
    // the tiebreak (tok asc) compares identical values everywhere.
    // r16 shape (guide §2.3): the per-doc top-1 is a grouped
    // min(struct(-bp, tok)) instead of a sort + row_number Window — the
    // doc exchange now carries ~one partially-aggregated row per doc
    // (SortAggregate partial, map-side) instead of every (doc, tok) row
    // with its token string through a full sort + WindowGroupLimit.
    // Equivalence: min over struct(-bp, tok) is lexicographic — highest
    // tfidf_bp first, then smallest tok — exactly the Window's
    // (bp DESC, tok ASC) rank-1 row; bp ≥ 0 (df ≤ n_docs ⇒ ln ≥ 0), so
    // the negation cannot overflow.
    "t07_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dfreq, "tok").crossJoin(broadcast(n))
        .withColumn("tfidf_bp",
          floor(col("c").cast("double")
            * log(col("n_docs").cast("double") / col("df")) * 10000).cast("long"))
        .groupBy(col("doc_id"))
        .agg(min(struct((-col("tfidf_bp")).as("nbp"), col("tok").as("tok"),
          col("tfidf_bp").as("bp"))).as("top"))
        .select(col("doc_id"), col("top.tok").as("tok"),
          col("top.bp").as("tfidf_bp"))
        .orderBy("doc_id").limit(200)
    }),

    // Per-doc average unigram log-probability — the cheap LM-fluency
    // proxy quality filters rank on (a corpus-trained unigram model in
    // place of a real LM; CCNet-style perplexity filtering, PAPERS.md).
    // Same shuffle shape as t07: corpus token counts, token stream
    // re-joined on the counts (vocab-sized side, broadcast-able), one
    // grouped avg. ln in IEEE double on both engines (as t07 does).
    "t08_unigram_logprob" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      val cnt = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val n = toks.agg(count(lit(1)).as("n_total"))
      toks.join(cnt, "tok").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(avg(log(col("c").cast("double") / col("n_total"))), 4).as("avg_logp"))
        .orderBy("doc_id").limit(200)
    }),

    // Bigram-LM fluency score — the step up from t08's unigram proxy
    // toward the n-gram-LM filtering CCNet/Gopher actually run (a KenLM
    // 5-gram in production; a corpus-trained additively-smoothed bigram
    // here, so the oracle can verify the arithmetic exactly). Per doc:
    // mean ln P(w_i | w_{i-1}) with P = (c12 + α) / (c1 + α·V), α=0.5,
    // V = corpus vocabulary. Bigram extraction is SCAN-LOCAL (zip_with
    // over two array slices — no per-token window/exchange, unlike the
    // lag() formulation); the LM tables are Zipf-bounded grouped counts;
    // scoring is two equi-joins keyed by the bigram/prefix. Every stage
    // shuffles by content keys, so the plan is corpus-parallel at 100 TB.
    "t11_bigram_logprob" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val big = docs.withColumn("arr", split(col("text"), "\\s+"))
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(arr, 1, size(arr)-1), slice(arr, 2, size(arr)-1)," +
            " (a, b) -> struct(a AS w1, b AS w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
        .localCheckpoint(true) // one extraction feeds LM build AND scoring
      val bcnt = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val w1cnt = bcnt.groupBy("w1").agg(sum("c12").as("c1"))
      val vocab = docs
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .agg(countDistinct("tok").as("v"))
      big.join(bcnt, Seq("w1", "w2")).join(w1cnt, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_big"),
          round(avg(log((col("c12") + lit(0.5)) / (col("c1") + lit(0.5) * col("v")))), 4)
            .as("avg_logp"))
        .orderBy("doc_id").limit(200)
    }),

    // Vocabulary coverage curve — what fraction of the token stream a
    // top-N vocabulary covers (the number a tokenizer budget is designed
    // against). One token-count agg; each coverage point is a top-k via
    // orderBy+limit — TakeOrderedAndProject, partial top-k below the
    // shuffle, never a global sort/window over the vocabulary. Ties break
    // on the token string, identically on both engines.
    "t09_vocab_coverage" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // one count pass feeds all three points
      val n = cnt.agg(sum("c").as("n_total"))
      Seq(10, 100, 1000).map { k =>
        cnt.orderBy(col("c").desc, col("tok").asc).limit(k)
          .agg(sum("c").as("covered"))
          .withColumn("vocab_size", lit(k.toLong))
      }.reduce(_.unionByName(_))
        .crossJoin(broadcast(n))
        .withColumn("coverage_bp",
          floor(col("covered") * 10000.0 / col("n_total")).cast("long"))
        .select("vocab_size", "covered", "coverage_bp")
        .orderBy("vocab_size")
    }),

    // PII scan + redaction audit — the privacy-scrub stage a released
    // training corpus runs last: count email / phone / IPv4 literals per
    // doc and measure the post-redaction length. One codegen'd scan
    // (regexp_count + nested regexp_replace), no shuffle before the
    // top-k. The synthetic corpus carries no PII, so the fixture LACES
    // deterministic PII into the text inside the query (as the
    // multimodal ops synthesize their PNG bytes) — both engines scan the
    // identical derived input, and the patterns stay in the
    // RE2-compatible subset (char classes, bounded repeats, \b) so Java
    // regex and DuckDB's RE2 count hit-for-hit.
    "t10_pii_scan" -> ((s, d) => {
      val did = col("doc_id").cast("string")
      val laced = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" reach me at user"), did, lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" call 555-123-4567")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".1")))
          .otherwise(lit("")))
      val redacted = regexp_replace(regexp_replace(regexp_replace(col("t"),
        PiiEmail, "[EMAIL]"), PiiPhone, "[PHONE]"), PiiIp, "[IP]")
      Tables.documents(s, d)
        .select(col("doc_id"), laced.as("t"))
        .select(col("doc_id"),
          regexp_count_fast(col("t"), PiiEmail).cast("long").as("n_email"),
          regexp_count_fast(col("t"), PiiPhone).cast("long").as("n_phone"),
          regexp_count_fast(col("t"), PiiIp).cast("long").as("n_ip"),
          length(redacted).cast("long").as("len_redacted"))
        .orderBy("doc_id").limit(200)
    }),

    // Gopher-style composite rule filter (Rae et al. 2021 §A1.1 shape):
    // five per-doc predicates — word count in range, mean token length in
    // range, symbol-to-word ratio, alpha-token ratio, minimum stopword
    // hits — rolled up per source as per-rule fail counts + survivors.
    // Every rule is INTEGER arithmetic (`10*n_sym <= n_tok`, not
    // `n_sym/n_tok <= 0.1`) so an exact-boundary doc can never land on
    // different sides of a float compare across engines. One codegen'd
    // scan, one groupBy(source) — corpus-parallel at 100 TB.
    "t12_gopher_rules" -> ((s, d) => {
      val nTok = regexp_count_fast(col("text"), WsTok).cast("long")
      val nChar = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
      val nSym = regexp_count_fast(col("text"), SymTok).cast("long")
      val nAlpha = regexp_count_fast(col("text"), AlphaRun).cast("long")
      val nStop = regexp_count_fast(lower(col("text")), langPatterns.head._2).cast("long")
      Tables.documents(s, d)
        .withColumn("nt", nTok).withColumn("nc", nChar)
        .withColumn("ns", nSym).withColumn("na", nAlpha)
        .withColumn("nst", nStop)
        .withColumn("r_wc", col("nt") >= 50 && col("nt") <= 100000L)
        .withColumn("r_mwl", col("nc") >= lit(3) * col("nt") && col("nc") <= lit(10) * col("nt"))
        .withColumn("r_sym", lit(10) * col("ns") <= col("nt"))
        .withColumn("r_alpha", lit(5) * col("na") >= lit(4) * col("nt"))
        .withColumn("r_stop", col("nst") >= 2)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("r_wc"), 1L).otherwise(0L)).as("f_wordcount"),
          sum(when(!col("r_mwl"), 1L).otherwise(0L)).as("f_meanlen"),
          sum(when(!col("r_sym"), 1L).otherwise(0L)).as("f_symbol"),
          sum(when(!col("r_alpha"), 1L).otherwise(0L)).as("f_alpha"),
          sum(when(!col("r_stop"), 1L).otherwise(0L)).as("f_stopword"),
          sum(when(col("r_wc") && col("r_mwl") && col("r_sym") &&
            col("r_alpha") && col("r_stop"), 1L).otherwise(0L)).as("n_pass"))
        .orderBy("source")
    }),

    // Lexical-diversity audit: per-doc type-token ratio and hapax share
    // (the MTLD-lite signals behind template/boilerplate detection — a
    // low-TTR doc is generated filler; a near-1 hapax doc is noise).
    // ENTIRELY scan-local: sort the token array per doc and count runs /
    // singleton runs by neighbor comparison — no (doc, token) explode,
    // no shuffle at all before the bounded top-k. The first cut shuffled
    // every token of the corpus to count per-doc; at 100 TB that
    // exchange carries the whole token stream for a per-doc-computable
    // statistic. Integer basis points via FLOOR as everywhere.
    "t13_ttr_diversity" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("sa", array_sort(
          regexp_extract_all(lower(col("text")), lit(WsTok), lit(0))))
        .withColumn("n_tok", size(col("sa")).cast("long"))
        // run start: first element or differs from its left neighbor
        .withColumn("n_types", when(col("n_tok") === 0, 0L).otherwise(size(expr(
          "filter(sequence(0, size(sa) - 1), i -> i = 0 OR" +
            " element_at(sa, i) != element_at(sa, i + 1))")).cast("long")))
        // singleton run: starts AND ends at the same position
        .withColumn("n_hapax", when(col("n_tok") === 0, 0L).otherwise(size(expr(
          "filter(sequence(0, size(sa) - 1), i ->" +
            " (i = 0 OR element_at(sa, i) != element_at(sa, i + 1)) AND" +
            " (i = size(sa) - 1 OR element_at(sa, i + 1) != element_at(sa, i + 2)))"))
          .cast("long")))
        .withColumn("ttr_bp",
          floor(col("n_types") * 10000.0 / greatest(col("n_tok"), lit(1L))).cast("long"))
        .withColumn("hapax_bp",
          floor(col("n_hapax") * 10000.0 / greatest(col("n_types"), lit(1L))).cast("long"))
        .select("doc_id", "n_tok", "n_types", "n_hapax", "ttr_bp", "hapax_bp")
        .orderBy("doc_id").limit(200)),

    // Content novelty per source — the curriculum/dedup-adjacent audit of
    // how much genuinely FIRST-SEEN content each source contributes (a
    // source whose shingles all appeared earlier is a mirror, not a
    // corpus extension). A shingle's canonical first sight is its min
    // doc_id corpus-wide; a doc's novelty is the share of its distinct
    // shingles it introduced. Shingles reduce to xxhash64 before any
    // exchange (d11's trick: 8-byte keys, not strings, through every
    // shuffle); the first-seen table is the same content-keyed rollup a
    // 100 TB pipeline would persist as an incremental artifact (d14's
    // batch-vs-base pattern extends it without a corpus rescan). All
    // integer output — no float can land differently across engines.
    //
    // Plan shape (r9, VERDICT r8 #4 — was 14.1× at 100×): the old form
    // joined the first-seen table BACK to every distinct (doc, shingle)
    // pair on the shingle hash — a second full-width exchange of the
    // biggest relation. But "novel per doc" never needed the pair-level
    // join: it is the row count of the first-seen table GROUPED BY its
    // min doc — one partially-aggregated rollup whose input is one row
    // per DISTINCT shingle (already h-partitioned by the min() rollup),
    // joined back at DOC granularity (n_docs rows, ~100-1000× smaller
    // than the pair join at any corpus size). Two more r9 erasures:
    // n_sh (distinct shingles per doc) never leaves the scan — a doc's
    // shingles all live in its own text, so the count is
    // size(array_distinct(transform(...))) per row, zero exchange (the
    // t13 trick) — and the min-doc rollup needs NO distinct stage at
    // all (min is duplicate-insensitive), so its exchange input is the
    // map-side partial-agg residue, not the raw or deduped pair stream.
    // (A checkpointed shared distinct was tried first: materializing
    // the pair set pinned gigabytes of the unified pool at 100× and
    // OOM'd the rollups; recomputing it doubled the heaviest shuffle.)
    "t14_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val perDoc = docs.select(col("doc_id"), col("source"),
        size(array_distinct(expr(
          s"transform(sequence(1, greatest(length(text) - ${DedupOps.ShingleLen - 1}, 1))," +
            s" g -> xxhash64(substring(text, g, ${DedupOps.ShingleLen})))")))
          .cast("long").as("n_sh"))
      val novelPerDoc = DedupOps.shingled(docs)
        .select(col("doc_id"), xxhash64(col("sh")).as("h"))
        .groupBy("h").agg(min("doc_id").as("mind"))
        .groupBy("mind").agg(count(lit(1)).as("novel"))
      perDoc.join(novelPerDoc, col("doc_id") === col("mind"), "left_outer")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_sh").as("n_shingles"),
          coalesce(sum("novel"), lit(0L)).as("n_novel"),
          floor(coalesce(sum("novel"), lit(0L)) * 10000.0 / sum("n_sh"))
            .cast("long").as("novelty_bp"))
        .orderBy("source")
    }),

    // Token-distribution drift per source — the data-quality monitor
    // that catches a source whose language shifted between crawls
    // (encoding break, template change, spam infusion) BEFORE it trains:
    // L1 distance, in basis points, between each source's token-share
    // vector and the corpus's, over the corpus top-50 tokens plus an
    // "other" bucket. Shares are FLOORED to integer bp on both engines,
    // and the other-bucket is derived as 10000 − Σshares from those same
    // floors, so the statistic is integer end-to-end. One (token) rollup
    // for the reference distribution (top-50 broadcast back), one
    // (source, token) rollup for the per-source counts — both
    // content-keyed shuffles that partition by vocabulary, the t05
    // shape. Drift_bp ∈ [0, 20000]: 0 = identical mix, 20000 = disjoint.
    "t16_token_drift" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .localCheckpoint(true) // one tokenize pass feeds all three rollups
      val ctot = toks.agg(count(lit(1)).as("ctot"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("ccnt"))
        .orderBy(col("ccnt").desc, col("tok").asc).limit(50)
        .crossJoin(broadcast(ctot)) // 1-row scalar attach (t08 pattern)
        .withColumn("c_bp", floor(col("ccnt") * 10000.0 / col("ctot")).cast("long"))
        .select(col("tok").as("ttok"), col("c_bp"))
      val srcTok = toks.groupBy("source", "tok").agg(count(lit(1)).as("scnt"))
      val srcTotal = toks.groupBy("source").agg(count(lit(1)).as("stot"))
      // sources × top-50 grid, so a top token a source NEVER emits still
      // contributes its full |0 − c_bp| to that source's drift
      val joined = srcTotal.crossJoin(broadcast(top))
        .join(srcTok,
          col("tok") === col("ttok") && srcTok("source") === srcTotal("source"),
          "left_outer")
        .withColumn("s_bp", floor(
          coalesce(col("scnt"), lit(0L)) * 10000.0 / col("stot")).cast("long"))
      joined.groupBy(srcTotal("source"))
        .agg(first("stot").as("n_tokens"),
          sum(expr("abs(s_bp - c_bp)")).as("top_l1"),
          sum("s_bp").as("s_top_sum"), sum("c_bp").as("c_top_sum"))
        .withColumn("drift_bp",
          col("top_l1") + expr("abs((10000 - s_top_sum) - (10000 - c_top_sum))"))
        .select(col("source"), col("n_tokens"), col("drift_bp"))
        .orderBy("source")
    }),

    // Character-entropy quality signal (gibberish / filler / binary-spill
    // detector): bits-per-char Shannon entropy via the native
    // graft.functions.CharEntropy expression — the whole histogram+fold
    // runs inside the scan's codegen stage, one pass, zero shuffle,
    // where the composable form would shuffle one row PER CHARACTER.
    "t15_char_entropy" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          round(graft.functions.EntropyFunctions.char_entropy(col("text")), 6)
            .as("entropy"))
        .orderBy("doc_id").limit(200)),

    // Zipf-alignment audit per source — natural language follows a
    // power-law token-frequency curve (slope ≈ −1 on log-log axes);
    // machine-generated filler, templated spam, and encoding breakage
    // flatten or steepen it. Fit: OLS slope of ln(count) ~ ln(rank) over
    // each source's top-100 tokens — the closed-form (nΣxy − ΣxΣy) /
    // (nΣx² − (Σx)²), so no iterative fit and both engines evaluate the
    // identical arithmetic. Ranks come from a PER-SOURCE window over the
    // (source, token) rollup — the partition key is the shard key at
    // scale and the windowed set is vocabulary-sized, never corpus-sized
    // (the t05/t09 shape). top1_bp (rank-1 token's share, integer floor)
    // rides along: a >2000 bp top-1 is a one-word template, whatever the
    // slope says. round(4) absorbs summation-order float noise in the
    // 100-term ln sums.
    // CCNet perplexity bucketing — the canonical head/middle/tail split
    // (Wenzek et al. 2020): score every doc with the corpus LM (t08's
    // unigram log-prob — the oracle-exact stand-in for KenLM), cut the
    // corpus at the EXACT interpolated score terciles, and report the
    // per (bucket, source) books a pipeline uses to keep head+middle
    // and drop tail. A threshold AMPLIFIES any float disagreement (one
    // doc whose round(4) mean lands differently drags every tied doc
    // across the cut — the first draft failed exactly this way at
    // sf0.1), so the score is ALL-INTEGER (the t12 rule): per token
    // TYPE, µlp = floor(1e6·ln(c/N)) on the vocabulary-sized LM table
    // (the only ln anywhere — one value per type, not per occurrence);
    // a doc's score is floor(Σµlp / n_tok), integer sum then one
    // IEEE-exact division — order-independent and bit-identical across
    // engines. The tercile thresholds interpolate over integers (again
    // exact) and come back as one 2-value broadcast row (the p05/p12
    // percentile pattern — never a global rank window).
    "t18_perplexity_buckets" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), "\\s+")).as("tok"))
      val n = toks.agg(count(lit(1)).as("n_total"))
      val lm = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(n))
        .withColumn("ulp",
          floor(log(col("c").cast("double") / col("n_total")) * 1e6).cast("long"))
        .select("tok", "ulp")
      val scored = toks.join(lm, "tok")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_tok"), sum("ulp").as("s_ulp"))
        .withColumn("score_ulp",
          floor(col("s_ulp").cast("double") / col("n_tok")).cast("long"))
      val qs = scored.agg(
        expr("percentile(score_ulp, 0.3333333333333333)").as("q1"),
        expr("percentile(score_ulp, 0.6666666666666666)").as("q2"))
      scored.crossJoin(broadcast(qs))
        .withColumn("bucket",
          when(col("score_ulp") < col("q1"), "tail")
            .when(col("score_ulp") < col("q2"), "middle")
            .otherwise("head"))
        .groupBy("bucket", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          min("score_ulp").as("min_ulp"),
          max("score_ulp").as("max_ulp"))
        .orderBy("bucket", "source")
    }),

    // BPE pair census — iteration 1 of tokenizer training (Sennrich et
    // al. 2016): the corpus-wide frequency of every adjacent character
    // pair inside words; the argmax row IS the first merge a BPE
    // tokenizer learns, and n_types says whether a pair's mass comes
    // from one hot word or spreads across the vocabulary. One
    // scan-local pair explode (the shingle kernel at length 2, inside
    // words only) + one content-keyed rollup + bounded top-k — at
    // 100 TB successive merge iterations reuse this census
    // incrementally instead of rescanning (only counts touching the
    // merged pair change), exactly how production BPE trainers work.
    "t19_bpe_pair_census" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= "" && length(col("tok")) >= 2)
        .withColumn("g", explode(sequence(lit(1), length(col("tok")) - 1)))
        .withColumn("pair", col("tok").substr(col("g"), lit(2)))
        .groupBy("pair")
        .agg(count(lit(1)).as("n_occ"), countDistinct("tok").as("n_types"))
        .orderBy(col("n_occ").desc, col("pair").asc)
        .limit(20)),

    // BPE APPLICATION — the tokenizer step every token-budget operator
    // (p02/p07/p11/p13) proxies with whitespace tokens (VERDICT r12 #5):
    // apply a FIXED, deterministic merge table to every word and book
    // per-source token totals + chars/token. The merge table is a build
    // artifact trained OFFLINE at sf0.01 by [[trainBpeMerges]] (t19's
    // pair census iterated to its fixpoint: per rank, re-encode with the
    // merges so far, take the most frequent adjacent symbol pair, ties
    // by pair asc — the Sennrich et al. 2016 loop) and pinned as the
    // [[BpeMerges]] constant; a spec re-trains and asserts the pin.
    // Each merged symbol is ONE private-use char (U+E000+rank), so rank-
    // order application is a fold of literal `replace` calls — leftmost
    // non-overlapping, identical semantics in Spark and DuckDB — and the
    // post-merge TOKEN COUNT is just the encoded string's length. Cost
    // shape at 100 TB: the encode is scan-local (a chain of codegen'd
    // replaces inside the scan's project — no shuffle, no UDF), followed
    // by ONE per-source rollup; the merge table rides the plan as
    // literals, the broadcast-a-constant degenerate case. All-integer
    // books: chars/token in floor basis points.
    "t22_bpe_apply" -> ((s, d) => {
      val enc = BpeMerges.foldLeft(col("tok")) { case (c, (p, m)) =>
        replace(c, lit(p), lit(m))
      }
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .select(col("source"), length(col("tok")).cast("long").as("nc"),
          length(enc).cast("long").as("nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"), sum("nc").as("n_chars"),
          sum("nt").as("n_tokens"))
        .withColumn("chars_per_token_bp",
          floor(col("n_chars") * 10000.0 /
            greatest(col("n_tokens"), lit(1L))).cast("long"))
        .select("source", "n_words", "n_chars", "n_tokens", "chars_per_token_bp")
        .orderBy("source")
    }),

    // NATIVE BPE ENCODE (VERDICT r13 #4): the same rank-order semantics
    // as t22's replace chain, but as ONE codegen'd expression holding
    // the whole merge table as a reference object
    // ([[graft.functions.BpeTable]]) — the form that survives a
    // 30-100k-merge production vocabulary, where the chain (one nested
    // expression per merge) cannot compile. The gate output is the
    // encoded-token census itself, so the encoded STRINGS are
    // value-compared against the oracle's replace chain in DuckDB —
    // native==chain equivalence is oracle-audited, not just
    // spec-asserted. 64 merges: past the t22 table, below the 89-merge
    // saturation where every word collapses to one symbol and the
    // census stops discriminating. Plan shape: scan-local encode inside
    // the scan's project, one partial-agg rollup — no shuffle of raw
    // text, no UDF.
    "t23_bpe_encode_native" -> ((s, d) => {
      val enc = graft.functions.BpeFunctions.bpe_encode(col("tok"), BpeMerges64)
      Tables.documents(s, d)
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .select(enc.as("enc_tok"))
        .groupBy("enc_tok")
        .agg(count(lit(1)).as("n_occ"))
        .orderBy(col("n_occ").desc, col("enc_tok").asc)
    }),

    // BPE PRE-TOKENIZED ENCODE AT VOCABULARY SCALE (VERDICT r14 #4):
    // t23 proves the native encoder at whitespace-word granularity, but
    // the corpus' 31-word vocabulary caps its table at 89 merges. This
    // is the realistic tokenizer shape: the GPT-2-style pre-token split
    // (letter runs | digit runs | single non-alnum — the same BpeTok
    // alternation t03 counts with) feeds the native encoder under the
    // 1200-merge synthetic-vocabulary table — a table size where the
    // replace-chain form cannot compile as one expression, which is
    // exactly what [[graft.functions.BpeTable]] exists for. The gate
    // output is the encoded-token census, so every encoded STRING is
    // value-compared against the chunked replace chain in DuckDB (the
    // t23 oracle pattern, 75 CTE stages × 16 replaces, applied to
    // DISTINCT pre-token types with occurrence counts — same census,
    // linear in types instead of occurrences). Plan shape: scan-local
    // pre-token split + encode inside the scan's project, one
    // partial-agg rollup — no shuffle of raw text, no UDF; the merge
    // table rides the plan as one reference object.
    "t24_bpe_pretoken" -> ((s, d) => {
      val enc = graft.functions.BpeFunctions.bpe_encode(col("tok"), BpeMerges1200)
      Tables.documents(s, d)
        .select(explode(regexp_extract_all(col("text"), lit(BpeTok), lit(0))).as("tok"))
        .filter(col("tok") =!= "")
        .select(enc.as("enc_tok"))
        .groupBy("enc_tok")
        .agg(count(lit(1)).as("n_occ"))
        .orderBy(col("n_occ").desc, col("enc_tok").asc)
    }),

    "t17_zipf_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
      val ranked = counts
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("cnt").desc, col("tok").asc)))
        .filter(col("rnk") <= 100)
        .withColumn("x", log(col("rnk").cast("double")))
        .withColumn("y", log(col("cnt").cast("double")))
      val stot = counts.groupBy("source").agg(sum("cnt").as("stot"))
      ranked.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_top"),
          max(when(col("rnk") === 1, col("cnt"))).as("top1_cnt"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .join(stot, "source")
        .withColumn("slope", round(
          (col("n_top") * col("sxy") - col("sx") * col("sy")) /
            (col("n_top") * col("sxx") - col("sx") * col("sx")), 4))
        .withColumn("top1_bp",
          floor(col("top1_cnt") * 10000.0 / col("stot")).cast("long"))
        .select(col("source"), col("n_top"), col("slope"), col("top1_bp"))
        .orderBy("source")
    }),

    // Encoding-quality audit per source (the CCNet/RefinedWeb ingest
    // hygiene pass): replacement chars (U+FFFD — a decoder already gave
    // up), raw C0 control chars (binary mixed into text), and the
    // printable-ASCII share in basis points. Corpora scraped at 100 TB
    // always carry a mojibake tail; this op localizes it per source so
    // the mix stage can discount or re-decode. One scan, three codegen'd
    // regexp counters, one partial-agg rollup — the t02 cost shape.
    "t20_encoding_audit" -> ((s, d) => {
      val nRepl = regexp_count_fast(col("text"), "�")
      val nCtrl = regexp_count_fast(col("text"), CtrlChar)
      val nAscii = regexp_count_fast(col("text"), "[\\x20-\\x7e]")
      Tables.documents(s, d)
        .select(col("source"), length(col("text")).cast("long").as("len"),
          nRepl.cast("long").as("nr"), nCtrl.cast("long").as("nc"),
          nAscii.cast("long").as("na"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("nr").as("n_replacement"),
          sum("nc").as("n_control"),
          floor(sum("na") * 10000.0 / greatest(sum("len"), lit(1L)))
            .cast("long").as("ascii_bp"),
          count(when(col("nr") > 0 || col("nc") > 0, 1)).as("n_docs_flagged"))
        .orderBy("source")
    }),

    // Readability audit (Flesch-Kincaid grade over the standard proxies:
    // words = alpha runs, sentences = terminal punctuation clamped ≥1,
    // syllables = vowel groups) — the classic curation signal between
    // t02's surface ratios and the t08/t11 LM scores: templated or
    // machine-generated sources drift to implausible words-per-sentence
    // long before an LM flags them. Grade = 0.39·W/S + 11.8·Y/W − 15.59
    // computed ONCE per source from the summed integer counts (one
    // double expression over three integer sums — IEEE-identical in both
    // engines), published ×10⁴ floor'd. Three codegen'd counters in the
    // same one-scan + one-rollup shape as t20.
    "t21_readability" -> ((s, d) => {
      val nW = regexp_count_fast(col("text"), AlphaRun)
      val nS = regexp_count_fast(col("text"), "[.!?]")
      val nY = regexp_count_fast(col("text"), "[aeiouyAEIOUY]+")
      Tables.documents(s, d)
        .select(col("source"),
          nW.cast("long").as("w"),
          greatest(nS.cast("long"), lit(1L)).as("st"),
          nY.cast("long").as("y"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("w").as("n_words"),
          sum("st").as("n_sentences"),
          floor(sum("w") * 10000.0 / sum("st")).cast("long").as("wps_bp"),
          floor(sum("y") * 10000.0 / greatest(sum("w"), lit(1L)))
            .cast("long").as("spw_bp"),
          floor((lit(0.39) * sum("w") / sum("st") +
            lit(11.8) * sum("y") / greatest(sum("w"), lit(1L)) -
            lit(15.59)) * 10000.0).cast("long").as("fk_grade_bp"))
        .orderBy("source")
    })
  )

  /** C0 control chars except tab/newline/CR (RE2- and JDK-safe class). */
  private val CtrlChar = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

  /** '#' or ASCII ellipsis — the Gopher symbol-ratio numerator. */
  private val SymTok = "#|\\.\\.\\."
  /** Maximal pure-alpha runs on word boundaries (RE2-safe, no lookahead). */
  private val AlphaRun = "\\b[A-Za-z]+\\b"

  private val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiPhone = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  private val PiiIp = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val oracles: Map[String, String] = Map(
    "t01_lang_id" -> {
      val scores = langPatterns.map { case (l, p) => s"${scoreSql(p)} AS sc_$l" }.mkString(", ")
      val best = langPatterns.map(lp => s"sc_${lp._1}").mkString("greatest(", ", ", ")")
      val pred = langPatterns.foldRight("'und'") {
        case ((l, _), acc) => s"CASE WHEN sc_$l = best THEN '$l' ELSE $acc END"
      }
      s"""WITH scored AS (SELECT lang, $scores FROM documents),
         |b AS (SELECT lang, $best AS best, * FROM scored)
         |SELECT lang, CASE WHEN best = 0 THEN 'und' ELSE $pred END AS predicted,
         |       COUNT(*) AS n
         |FROM b GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
    },
    "t02_quality_score" ->
      s"""SELECT doc_id, CAST(FLOOR((
         |  least(n_chars / 500.0, 1.0) * 0.4
         |  + (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]', 0)) AS DOUBLE)
         |      / greatest(CAST(len(regexp_extract_all(text, '$WsTok', 0)) AS DOUBLE), 1.0), 1.0)) * 0.3
         |  + least(CAST(${scoreSql(langPatterns.head._2)} AS DOUBLE)
         |      / greatest(CAST(len(regexp_extract_all(text, '$WsTok', 0)) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3
         |  ) * 10000) AS BIGINT) AS score_bp
         |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "t03_token_count" ->
      s"""SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, '$WsTok', 0))) AS BIGINT) AS ws_total,
         |  CAST(SUM(len(regexp_extract_all(text, '$BpeTok', 0))) AS BIGINT) AS bpe_total
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id, substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "t05_top_bigrams" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(text, '\s+') AS w FROM documents),
        |bi AS (
        |  SELECT w[g] || ' ' || w[g + 1] AS bigram
        |  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS g
        |        FROM toks WHERE len(w) >= 2))
        |SELECT bigram, COUNT(*) AS n FROM bi
        |GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,
    "t06_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS w FROM documents),
        |bi AS (
        |  SELECT doc_id, w[g] || ' ' || w[g + 1] AS bigram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS g
        |        FROM toks WHERE len(w) >= 2)),
        |cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_c,
        |         COUNT(*) AS n_distinct_bigrams
        |  FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  CAST(FLOOR(top_c * 10000.0 / n_bigrams) AS BIGINT) AS top_share_bp,
        |  CAST(FLOOR((n_bigrams - n_distinct_bigrams) * 10000.0 / n_bigrams) AS BIGINT)
        |    AS dup_bigram_bp
        |FROM agg ORDER BY doc_id LIMIT 200""".stripMargin,
    "t07_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok,
        |    CAST(FLOOR(CAST(tf.c AS DOUBLE)
        |      * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) * 10000) AS BIGINT) AS tfidf_bp
        |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n)
        |SELECT doc_id, tok, tfidf_bp FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf_bp DESC, tok ASC) AS rn
        |  FROM scored)
        |WHERE rn = 1 ORDER BY doc_id LIMIT 200""".stripMargin,
    "t08_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_total FROM toks)
        |SELECT doc_id, COUNT(*) AS n_tok,
        |  ROUND(AVG(ln(CAST(c AS DOUBLE) / n_total)), 4) AS avg_logp
        |FROM toks JOIN cnt USING (tok) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin,
    "t11_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS tok
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr FROM documents)),
        |big AS (
        |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |bcnt AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
        |w1cnt AS (SELECT w1, SUM(c12) AS c1 FROM bcnt GROUP BY w1),
        |vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks)
        |SELECT doc_id, COUNT(*) AS n_big,
        |  ROUND(AVG(ln((c12 + 0.5) / (c1 + 0.5 * v))), 4) AS avg_logp
        |FROM big JOIN bcnt USING (w1, w2) JOIN w1cnt USING (w1) CROSS JOIN vocab
        |GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin,
    "t09_vocab_coverage" ->
      """WITH cnt AS (
        |  SELECT tok, COUNT(*) AS c FROM (
        |    SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents)
        |  GROUP BY tok),
        |ranked AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS r,
        |    SUM(c) OVER (ORDER BY c DESC, tok ASC ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM cnt),
        |n AS (SELECT SUM(c) AS n_total FROM cnt)
        |SELECT CAST(p.v AS BIGINT) AS vocab_size, CAST(cum AS BIGINT) AS covered,
        |  CAST(FLOOR(cum * 10000.0 / n_total) AS BIGINT) AS coverage_bp
        |FROM (SELECT 10 AS v UNION ALL SELECT 100 UNION ALL SELECT 1000) p
        |JOIN ranked ON ranked.r = least(p.v, (SELECT MAX(r) FROM ranked))
        |CROSS JOIN n
        |ORDER BY vocab_size""".stripMargin,

    // same lacing, same RE2-subset patterns (DuckDB regexps ARE RE2;
    // backslashes are literal inside DuckDB standard strings)
    "t10_pii_scan" ->
      s"""WITH pii AS (
         |  SELECT doc_id,
         |    text
         |    || CASE WHEN doc_id % 3 = 0
         |         THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0
         |         THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$PiiEmail')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$PiiPhone')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(t, '$PiiIp')) AS BIGINT) AS n_ip,
         |  CAST(length(
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '$PiiEmail', '[EMAIL]', 'g'),
         |      '$PiiPhone', '[PHONE]', 'g'),
         |      '$PiiIp', '[IP]', 'g')) AS BIGINT) AS len_redacted
         |FROM pii ORDER BY doc_id LIMIT 200""".stripMargin,
    "t12_gopher_rules" ->
      s"""WITH m AS (
         |  SELECT source,
         |    CAST(len(regexp_extract_all(text, '$WsTok', 0)) AS BIGINT) AS nt,
         |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS nc,
         |    CAST(len(regexp_extract_all(text, '$SymTok', 0)) AS BIGINT) AS ns,
         |    CAST(len(regexp_extract_all(text, '$AlphaRun', 0)) AS BIGINT) AS na,
         |    CAST(len(regexp_extract_all(lower(text), '${langPatterns.head._2}', 1)) AS BIGINT) AS nst
         |  FROM documents),
         |r AS (
         |  SELECT source,
         |    (nt >= 50 AND nt <= 100000) AS r_wc,
         |    (nc >= 3 * nt AND nc <= 10 * nt) AS r_mwl,
         |    (10 * ns <= nt) AS r_sym,
         |    (5 * na >= 4 * nt) AS r_alpha,
         |    (nst >= 2) AS r_stop
         |  FROM m)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS f_wordcount,
         |  CAST(SUM(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS f_meanlen,
         |  CAST(SUM(CASE WHEN NOT r_sym THEN 1 ELSE 0 END) AS BIGINT) AS f_symbol,
         |  CAST(SUM(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS f_alpha,
         |  CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS f_stopword,
         |  CAST(SUM(CASE WHEN r_wc AND r_mwl AND r_sym AND r_alpha AND r_stop
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "t13_ttr_diversity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$WsTok', 0)) AS tok
         |  FROM documents),
         |cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok, COUNT(*) AS n_types,
         |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |  FROM cnt GROUP BY doc_id)
         |SELECT doc_id, n_tok, n_types, n_hapax,
         |  CAST(FLOOR(n_types * 10000.0 / greatest(n_tok, 1)) AS BIGINT) AS ttr_bp,
         |  CAST(FLOOR(n_hapax * 10000.0 / greatest(n_types, 1)) AS BIGINT) AS hapax_bp
         |FROM agg ORDER BY doc_id LIMIT 200""".stripMargin,
    "t14_novelty" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, source, s FROM (
        |    SELECT doc_id, source, substr(text, CAST(g AS INT), 8) AS s
        |    FROM (SELECT doc_id, source, text,
        |            unnest(generate_series(1, greatest(length(text) - 7, 1))) AS g
        |          FROM documents))),
        |first AS (SELECT s, min(doc_id) AS mind FROM sh GROUP BY s),
        |perdoc AS (
        |  SELECT sh.doc_id, sh.source, CAST(COUNT(*) AS BIGINT) AS n_sh,
        |    CAST(SUM(CASE WHEN sh.doc_id = f.mind THEN 1 ELSE 0 END) AS BIGINT) AS novel
        |  FROM sh JOIN first f ON sh.s = f.s
        |  GROUP BY sh.doc_id, sh.source)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
        |  CAST(SUM(novel) AS BIGINT) AS n_novel,
        |  CAST(FLOOR(SUM(novel) * 10000.0 / SUM(n_sh)) AS BIGINT) AS novelty_bp
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "t16_token_drift" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT source, tok FROM toks WHERE tok <> ''),
        |ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t2),
        |top AS (
        |  SELECT tok AS ttok,
        |    CAST(FLOOR(COUNT(*) * 10000.0 / MIN(ctot.n)) AS BIGINT) AS c_bp
        |  FROM t2, ctot GROUP BY tok
        |  ORDER BY COUNT(*) DESC, tok ASC LIMIT 50),
        |stot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS stot FROM t2 GROUP BY source),
        |stok AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS scnt
        |         FROM t2 GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, s.stot, t.ttok, t.c_bp,
        |    CAST(FLOOR(COALESCE(k.scnt, 0) * 10000.0 / s.stot) AS BIGINT) AS s_bp
        |  FROM stot s CROSS JOIN top t
        |  LEFT JOIN stok k ON k.source = s.source AND k.tok = t.ttok)
        |SELECT source, CAST(MIN(stot) AS BIGINT) AS n_tokens,
        |  CAST(SUM(ABS(s_bp - c_bp))
        |    + ABS((10000 - SUM(s_bp)) - (10000 - SUM(c_bp))) AS BIGINT) AS drift_bp
        |FROM grid GROUP BY source ORDER BY source""".stripMargin,
    "t15_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS k FROM ch GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(k) AS n FROM cnt GROUP BY 1)
        |SELECT t.doc_id,
        |  ROUND((ln(t.n) - SUM(c.k * ln(c.k)) / t.n) / ln(2.0), 6) AS entropy
        |FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
        |GROUP BY t.doc_id, t.n ORDER BY t.doc_id LIMIT 200""".stripMargin,
    "t18_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM toks),
        |lm AS (
        |  SELECT tok,
        |    CAST(FLOOR(ln(CAST(COUNT(*) AS DOUBLE) / MIN(n.n_total)) * 1e6)
        |      AS BIGINT) AS ulp
        |  FROM toks, n GROUP BY tok),
        |scored AS (
        |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |    CAST(FLOOR(CAST(SUM(ulp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS score_ulp
        |  FROM toks JOIN lm USING (tok)
        |  GROUP BY doc_id, source),
        |q AS (SELECT quantile_cont(score_ulp, 0.3333333333333333) AS q1,
        |             quantile_cont(score_ulp, 0.6666666666666666) AS q2 FROM scored)
        |SELECT CASE WHEN score_ulp < q1 THEN 'tail'
        |            WHEN score_ulp < q2 THEN 'middle' ELSE 'head' END AS bucket,
        |  source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(score_ulp) AS min_ulp, MAX(score_ulp) AS max_ulp
        |FROM scored CROSS JOIN q
        |GROUP BY bucket, source ORDER BY bucket, source""".stripMargin,
    "t19_bpe_pair_census" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT tok FROM toks WHERE tok <> '' AND length(tok) >= 2),
        |pairs AS (
        |  SELECT substr(tok, CAST(g AS INT), 2) AS pair, tok
        |  FROM (SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS g
        |        FROM t2))
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
        |FROM pairs GROUP BY pair
        |ORDER BY n_occ DESC, pair ASC LIMIT 20""".stripMargin,
    // t22: the SAME pinned merge table applied in rank order as a chain
    // of literal replaces (generated from the BpeMerges constant, quotes
    // SQL-escaped; merged symbols are the literal U+E0xx chars, single
    // characters in both engines, so token count == encoded length)
    "t22_bpe_apply" -> {
      val encSql = BpeMerges.foldLeft("tok") { case (e, (p, m)) =>
        s"replace($e, '${p.replace("'", "''")}', '$m')"
      }
      s"""WITH w AS (
         |  SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM documents),
         |f AS (SELECT source, tok FROM w WHERE tok <> ''),
         |enc AS (SELECT source, length(tok) AS nc, length($encSql) AS nt FROM f)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(nc) AS BIGINT) AS n_chars,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(FLOOR(SUM(nc) * 10000.0 / GREATEST(SUM(nt), 1)) AS BIGINT)
         |    AS chars_per_token_bp
         |FROM enc GROUP BY source ORDER BY source""".stripMargin
    },
    // t23: the oracle is the rank-order replace CHAIN over the same 64
    // merges — cross-engine proof that the native min-rank encoder
    // equals the chain on every encoded string. 64 nested replace()
    // calls would nest past comfortable parser depth, so the chain is
    // CHUNKED through CTE stages (16 replaces per stage, rank order
    // preserved across stages — stage k's output is exactly the chain
    // state after 16k merges).
    "t23_bpe_encode_native" -> {
      val chunks = BpeMerges64.grouped(16).toVector
      val stages = chunks.zipWithIndex.map { case (ms, i) =>
        val prev = if (i == 0) "f" else s"e$i"
        val encSql = ms.foldLeft("tok") { case (e, (p, m)) =>
          s"replace($e, '${p.replace("'", "''")}', '$m')"
        }
        s"e${i + 1} AS (SELECT $encSql AS tok FROM $prev)"
      }
      s"""WITH w AS (
         |  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
         |  FROM documents),
         |f AS (SELECT tok FROM w WHERE tok <> ''),
         |${stages.mkString(",\n")}
         |SELECT tok AS enc_tok, CAST(COUNT(*) AS BIGINT) AS n_occ
         |FROM e${chunks.size}
         |GROUP BY tok ORDER BY n_occ DESC, enc_tok ASC""".stripMargin
    },
    // t24: the chunked replace chain over all 1200 synthetic-vocabulary
    // merges, applied to DISTINCT pre-token types carrying their
    // occurrence counts (the census is identical and the chain cost
    // drops from occurrences to types — 1200 replaces over a few
    // thousand distinct tokens instead of every token instance).
    "t24_bpe_pretoken" -> {
      val chunks = BpeMerges1200.grouped(16).toVector
      val stages = chunks.zipWithIndex.map { case (ms, i) =>
        val prev = if (i == 0) "tc" else s"e$i"
        val encSql = ms.foldLeft("tok") { case (e, (p, m)) =>
          s"replace($e, '${p.replace("'", "''")}', '$m')"
        }
        s"e${i + 1} AS (SELECT $encSql AS tok, c FROM $prev)"
      }
      s"""WITH w AS (
         |  SELECT unnest(regexp_extract_all(text, '$BpeTok', 0)) AS tok
         |  FROM documents),
         |f AS (SELECT tok FROM w WHERE tok <> ''),
         |tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY tok),
         |${stages.mkString(",\n")}
         |SELECT tok AS enc_tok, CAST(SUM(c) AS BIGINT) AS n_occ
         |FROM e${chunks.size}
         |GROUP BY tok ORDER BY n_occ DESC, enc_tok ASC""".stripMargin
    },
    "t17_zipf_slope" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT source, tok FROM toks WHERE tok <> ''),
        |counts AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM t2 GROUP BY 1, 2),
        |ranked AS (
        |  SELECT source, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY cnt DESC, tok ASC) AS rnk
        |  FROM counts),
        |top AS (
        |  SELECT source, rnk, cnt,
        |    ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
        |  FROM ranked WHERE rnk <= 100),
        |stot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS stot
        |         FROM counts GROUP BY source),
        |fit AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_top,
        |    MAX(CASE WHEN rnk = 1 THEN cnt END) AS top1_cnt,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
        |  FROM top GROUP BY source)
        |SELECT f.source, f.n_top,
        |  ROUND((f.n_top * f.sxy - f.sx * f.sy)
        |      / (f.n_top * f.sxx - f.sx * f.sx), 4) AS slope,
        |  CAST(FLOOR(f.top1_cnt * 10000.0 / s.stot) AS BIGINT) AS top1_bp
        |FROM fit f JOIN stot s USING (source)
        |ORDER BY f.source""".stripMargin,

    "t20_encoding_audit" ->
      s"""WITH c AS (
         |  SELECT source, length(text) AS len,
         |    len(regexp_extract_all(text, '�', 0)) AS nr,
         |    len(regexp_extract_all(text, '$CtrlChar', 0)) AS nc,
         |    len(regexp_extract_all(text, '[\\x20-\\x7e]', 0)) AS na
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(nr) AS BIGINT) AS n_replacement,
         |  CAST(SUM(nc) AS BIGINT) AS n_control,
         |  CAST(FLOOR(SUM(na) * 10000.0 / greatest(SUM(len), 1)) AS BIGINT) AS ascii_bp,
         |  COUNT(CASE WHEN nr > 0 OR nc > 0 THEN 1 END) AS n_docs_flagged
         |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "t21_readability" ->
      s"""WITH c AS (
         |  SELECT source,
         |    len(regexp_extract_all(text, '$AlphaRun', 0)) AS w,
         |    greatest(len(regexp_extract_all(text, '[.!?]', 0)), 1) AS st,
         |    len(regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)) AS y
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(w) AS BIGINT) AS n_words,
         |  CAST(SUM(st) AS BIGINT) AS n_sentences,
         |  CAST(FLOOR(SUM(w) * 10000.0 / SUM(st)) AS BIGINT) AS wps_bp,
         |  CAST(FLOOR(SUM(y) * 10000.0 / greatest(SUM(w), 1)) AS BIGINT) AS spw_bp,
         |  CAST(FLOOR((0.39 * SUM(w) / SUM(st) +
         |    11.8 * SUM(y) / greatest(SUM(w), 1) - 15.59) * 10000.0) AS BIGINT)
         |    AS fk_grade_bp
         |FROM c GROUP BY source ORDER BY source""".stripMargin
  )
}
