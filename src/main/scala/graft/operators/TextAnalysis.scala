package graft.operators

import graft.{GQuery, Tables}
import graft.Ckpt.TruncOps
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline
  * (SURVEY.md §2.F): token metering, quality signals, language ID,
  * fingerprints. All single-pass narrow transforms — no shuffle at
  * all except the final verification ORDER BY, so they scale linearly
  * with input splits at 100 TB.
  */
object TextAnalysis {

  /** Corpus-wide tokenizer selector (ADVICE r9 #2): every txt_
    * operator that tokenizes via `Text.tokens` routes through this,
    * so setting the Spark conf `graft.tokenizer=unicode` swaps the
    * whole txt_ family onto the Unicode tokenizer in one place.
    * Default (`ascii`) is the reference-conformant split the oracles
    * pin; the `wc_*`/`dd_*` families and the native ShingleHashes/
    * NGrams expressions stay pinned ASCII by design.
    */
  private def docTokens(spark: SparkSession)(c: Column): Column =
    Text.tokensFor(spark.conf.get("graft.tokenizer", "ascii"))(c)

  /** Token counts: whitespace tokens and a BPE-ish proxy count. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Text.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        Text.bpeIshTokenCount(col("text")).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Unicode-tokenizer twin of `txt_token_count`: tokens are maximal
    * `\p{L}\p{N}` runs (Text.unicodeTokens), so a multilingual corpus
    * counts accented/CJK words as words — the reference-conformant
    * ASCII tokenizer stays pinned for the `wc_*`/`dd_*` families.
    * Cross-engine parity rides EXPLICIT Unicode category classes on
    * both regex engines (Java `\p{L}\p{N}` vs RE2 `\pL\pN` — same
    * category tables on this corpus, pinned by the oracle hash; the
    * non-ASCII semantics themselves are pinned by UnicodeTokensSpec,
    * where no cross-engine trust is needed).
    */
  def tokenCountUnicode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(Text.unicodeTokens(col("text"))).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[^\\p{L}\\p{N}]", ""))
          .cast("long").as("n_alnum_chars"))
      .orderBy("doc_id")

  val Stopwords = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  /** Flesch-style readability per document — the classic curation
    * signal (a corpus-mix knob next to `txt_quality`'s ratios).
    * Words are the shared tokenizer, sentences split on [.!?]+ runs,
    * and syllables use the standard vowel-GROUP proxy (runs of
    * [aeiouy] — both engines' regex engines agree on this class).
    * The score 206.835 − 1.015·W/S − 84.6·Y/W is published ×1000 as
    * an INTEGER, each division done by the §4 pure-integer HALF_UP
    * rule ((2p+q) div 2q), so no FP quotient can straddle an
    * engine-dependent rounding boundary. One narrow scan, zero
    * shuffles.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(docTokens(spark)(lower(col("text")))).cast("long").as("n_words"),
        size(filter(split(col("text"), "[.!?]+"), s => length(trim(s)) > 0))
          .cast("long").as("n_sentences"),
        size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .withColumn("flesch_e3",
        lit(206835L) -
          expr("(2*1015*n_words + greatest(n_sentences, 1)) div (2*greatest(n_sentences, 1))") -
          expr("(2*84600*n_syllables + greatest(n_words, 1)) div (2*greatest(n_words, 1))"))
      .orderBy("doc_id")

  /** Quality signals: lengths, punctuation ratio, stopword ratio,
    * vocabulary (distinct-token) ratio.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val toks = docTokens(spark)(lower(col("text")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("char_len"),
        size(toks).cast("long").as("n_tokens"),
        round(Text.punctRatio(col("text")), 6).as("punct_ratio"),
        round(when(size(toks) === 0, 0.0).otherwise(
          size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") /
            size(toks).cast("double")), 6).as("stopword_ratio"),
        round(when(size(toks) === 0, 0.0).otherwise(
          size(array_distinct(toks)).cast("double") /
            size(toks).cast("double")), 6).as("uniq_ratio"))
      .orderBy("doc_id")
  }

  /** Stopword-profile language ID: score each candidate language by
    * marker-token hits and predict the argmax; 'und' only when no
    * marker hits at all. The marker sets are tiny on purpose — this is
    * the shape of an n-gram language model (per-class token scoring +
    * argmax), not a real model. Ties break to the lexicographically
    * largest lang code (sort_array desc on (hits, lang_code)); the SQL
    * oracle mirrors that with an explicit CASE chain in zh→fr→es→en→de
    * order.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of", "is", "join", "query"),
      "de" -> Seq("der", "und", "das", "ist"),
      "es" -> Seq("el", "la", "de", "es"),
      "fr" -> Seq("le", "la", "et", "est"),
      "zh" -> Seq("de", "shi", "he"))
    val toks = docTokens(spark)(lower(col("text")))
    val scores = markers.toSeq.sortBy(_._1).map { case (langCode, ms) =>
      struct(
        size(filter(toks, t => t.isin(ms: _*))).as("hits"),
        lit(langCode).as("lang_code"))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang").as("true_lang"),
        sort_array(array(scores: _*), asc = false).getItem(0).as("best"))
      .select(col("doc_id"), col("true_lang"),
        when(col("best.hits") > 0, col("best.lang_code")).otherwise("und").as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Language-ID confusion matrix — the classifier-evaluation pass
    * over `txt_langid`'s per-doc predictions: one cell per
    * (true_lang, pred_lang) with its count and the row-share in ppm.
    * Composes the langId operator directly (one definition of the
    * heuristic, two consumers), adds one keyed agg over the tiny
    * (langs × preds) domain plus a broadcast join back to per-truth
    * totals; the share is the §4 integer HALF_UP division — no FP.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("true_lang").agg(sum(col("n")).as("tot"))
    cells.join(broadcast(totals), Seq("true_lang"))
      .withColumn("share_e6", expr("(2 * n * 1000000 + tot) div (2 * tot)"))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        col("tot").as("n_true"), col("share_e6"))
      .orderBy("true_lang", "pred_lang")
  }

  /** Document fingerprints: md5 of the normalized text (oracle-exact)
    * — the key used by exact dedup and incremental re-crawl dedup.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(Text.normalized(col("text")).cast("binary")).as("md5_hash"))
      .orderBy("doc_id")

  /** Rabin-Karp rolling-hash fingerprint over the normalized text
    * (base 131 mod 1e9+7). Oracle-checked: DuckDB reproduces the exact
    * character fold with list_reduce over per-char codepoints, seeded
    * by a prepended 0 accumulator.
    */
  def fingerprintFnv(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.rollingHash(Text.normalized(col("text"))).as("rolling_hash"))
      .orderBy("doc_id")

  /** Hashed linear text classifier — the fastText-style quality
    * filter every large-scale training pipeline runs (hash word
    * unigrams + bigrams into B buckets, sum the buckets' weights,
    * threshold the score; CCNet et al. filter web crawl exactly this
    * way). The scoring plan is the production one end to end: gram
    * extraction → rolling-hash → bucket → weight lookup → per-doc
    * sum, ONE corpus scan and zero shuffles before the per-doc
    * aggregate. The rolling-hash fold is the same interpreted
    * higher-order `aggregate` the fingerprint family rides (NOT the
    * native fused-loop path — if this scan ever turns hot, a
    * ShingleHashes-style native expression is the established
    * upgrade); the bucket/weight arithmetic around it stays in
    * codegen. The 4096-entry weight
    * table is a fixed affine mint W[b] = (b·2654435761) mod 1001 −
    * 500 instead of learned logistic-regression weights — swapping in
    * a learned table is a broadcast join or a `transform` lookup with
    * the same plan shape — which keeps every arithmetic step integer,
    * so DuckDB replays hash, bucketing, weights, score, and label
    * cell-for-cell (the dd_lsh_recall standard).
    */
  val ClassifierBuckets = 4096L
  def hashedClassifier(spark: SparkSession, dir: String): DataFrame = {
    val arr = Text.tokens(lower(col("text")))
    val bigrams = zip_with(
      slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
      slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
      (l, r) => concat_ws(" ", l, r))
    val weight = pmod(pmod(col("h"), lit(ClassifierBuckets)) *
      lit(2654435761L), lit(1001L)) - lit(500L)
    Tables.documents(spark, dir)
      .select(col("doc_id"), arr.as("t"))
      .select(col("doc_id"), explode(concat(col("t"), bigrams)).as("g"))
      .select(col("doc_id"), Text.rollingHash(col("g")).as("h"))
      .select(col("doc_id"), weight.as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("score"))
      .select(col("doc_id"), col("n_grams"), col("score"),
        when(col("score") > 0, lit(1L)).otherwise(lit(0L)).as("label"))
      .orderBy("doc_id")
  }

  /** Bigram language-model estimation — the classic MapReduce n-gram
    * LM job (count n-grams, normalize by context): P(w2 | w1) =
    * c(w1 w2) / Σ_w c(w1 w). The denominator is the bigram-context
    * total (a window sum partitioned by w1 over the already-reduced
    * bigram counts — tiny relative to the corpus), not the raw
    * unigram count, which sidesteps the last-token-per-doc edge on
    * both engines. Bigrams come from the one-pass native `NGrams`
    * expression, same as `wc_bigrams`.
    */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(explode(graft.functions.NGrams.ngrams(col("text"), 2)).as("bigram"))
      .select(split(col("bigram"), " ").as("p"))
      .groupBy(col("p").getItem(0).as("w1"), col("p").getItem(1).as("w2"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("ctx", sum(col("cnt")).over(Window.partitionBy("w1")))
      .select(col("w1"), col("w2"), col("cnt"),
        round(col("cnt").cast("double") / col("ctx").cast("double"), 6).as("cond_p"))
      .orderBy("w1", "w2")
  }

  // ASCII-only patterns with identical semantics in Java regex and
  // RE2 (the DuckDB engine) — no lookaround, no \b, no unicode classes
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val NumRe = "[0-9]+"

  /** PII scrubbing — the redaction pass a training pipeline runs
    * before anything else: replace email addresses then digit runs
    * with placeholder tokens, and report per-doc redaction counts plus
    * the md5 of the scrubbed text (so the oracle hash-checks the full
    * rewritten string without shipping it). Pure narrow per-row regex
    * work — codegen'd, zero shuffle, linear in input splits.
    * Order matters and is fixed: emails first (they contain digits),
    * then numbers over the email-scrubbed text.
    *
    * The synthetic corpus contains no digits or addresses at all, so
    * (planted-oracle pattern, as in Dedup) every 3rd doc gets a
    * deterministic PII suffix derived from its id — the scrub then
    * redacts real matches on 1/3 of the corpus and provably leaves
    * the rest byte-identical, and the DuckDB oracle hash-checks both.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val t = concat(lower(col("text")),
      when(pmod(col("doc_id"), lit(3L)) === 0L,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com ref "), (col("doc_id") * 37L).cast("string")))
        .otherwise(lit("")))
    val emailScrubbed = regexp_replace(t, EmailRe, "<EMAIL>")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(emailScrubbed, lit(NumRe)).cast("long").as("n_nums"),
        md5(regexp_replace(emailScrubbed, NumRe, "<NUM>").cast("binary")).as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** Per-document bigram-LM perplexity scoring — the CCNet-style
    * quality signal: train the bigram LM on the corpus (same
    * estimation as `txt_bigram_lm`), then score every document by the
    * average negative log-probability of its own bigrams. Two keyed
    * aggregations (bigram counts, context totals over the
    * already-reduced counts) and one equi-join of the doc bigram
    * stream against the LM — the corpus text is scanned once, the LM
    * join key is the bigram itself, and nothing materializes per-doc
    * arrays. Self-scoring means no OOV branch: every doc bigram is in
    * the LM by construction.
    */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docBigrams = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(graft.functions.NGrams.ngrams(col("text"), 2)).as("bigram"))
    val lm = docBigrams.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .withColumn("ctx",
        sum(col("cnt")).over(Window.partitionBy(split(col("bigram"), " ").getItem(0))))
      .select(col("bigram"), (col("cnt").cast("double") / col("ctx").cast("double")).as("p"))
    docBigrams.join(lm, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(log(col("p"))), 4).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** Repetition quality signals (the Gopher-rules family): fraction
    * of a doc's tokens taken by its single most frequent token, and
    * the same for bigrams — high values mark the repetitive
    * low-quality text a training pipeline filters out. Two keyed
    * aggregations over exploded token/bigram streams (map-side
    * partials, no per-doc arrays), then a broadcast-size join back to
    * doc ids.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tokTop = docs
      .select(col("doc_id"), explode(docTokens(spark)(lower(col("text")))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 6)
          .as("top_token_frac"))
    val bgTop = docs
      .select(col("doc_id"), explode(graft.functions.NGrams.ngrams(col("text"), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 6)
        .as("top_bigram_frac"))
    docs.select("doc_id")
      .join(tokTop, Seq("doc_id"), "left")
      .join(bgTop, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("top_token_frac"), lit(0.0)).as("top_token_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  /** Character-level Shannon entropy per doc — the classic
    * low-entropy / boilerplate quality gate. Two keyed aggregations
    * ((doc, char) counts, then per-doc fold); entropy computed as
    * log2(n) − Σc·log2(c)/n so both engines evaluate the identical
    * expression tree, rounded to 6 against summation-order ulps.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_chars"),
        sum(col("cnt").cast("double") * log2(col("cnt").cast("double"))).as("s"))
      .select(col("doc_id"), col("n_chars"),
        round(log2(col("n_chars").cast("double")) -
          col("s") / col("n_chars").cast("double"), 6).as("entropy"))
      .orderBy("doc_id")

  val CollocMinCount = 5L
  val CollocTopK = 100

  /** PMI-scored collocations — the classic MapReduce co-occurrence
    * statistic: pmi(w1,w2) = log2((c12/M) / ((c1/N)·(c2/N))) over
    * bigram counts c12 (one pass via the native `NGrams` expression)
    * and unigram counts c1/c2, with N = total tokens, M = total
    * bigrams. Two keyed aggregations + two vocabulary equi-joins —
    * the unigram table is NOT broadcast (at 100 TB the vocabulary is
    * itself large; AQE may still choose broadcast when it is small).
    * Both engines evaluate the identical double expression tree
    * (c12·N·N)/(M·c1·c2) before one log2, so ordering by the rounded
    * score is engine-stable; ties break on the bigram text.
    */
  def collocation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val uni = docs
      .select(explode(docTokens(spark)(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum(col("c")).as("n_tokens"))
    val bg = docs
      .select(explode(graft.functions.NGrams.ngrams(col("text"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
    val mBig = bg.agg(sum(col("c12")).as("m_bigrams"))
    bg.filter(col("c12") >= CollocMinCount)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uni.withColumnsRenamed(Map("w" -> "w1", "c" -> "c1")), Seq("w1"))
      .join(uni.withColumnsRenamed(Map("w" -> "w2", "c" -> "c2")), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(mBig))
      .withColumn("pmi", round(log2(
        (col("c12").cast("double") * col("n_tokens").cast("double") *
          col("n_tokens").cast("double")) /
          (col("m_bigrams").cast("double") * col("c1").cast("double") *
            col("c2").cast("double"))), 6))
      .select(col("bigram"), col("c12"), col("pmi"))
      .orderBy(desc("pmi"), asc("bigram"))
      .limit(CollocTopK)
  }

  /** Zipf power-law fit of the corpus token-frequency distribution —
    * the vocabulary-health diagnostic a data pipeline runs to spot
    * boilerplate contamination (slope far from −1) or truncated
    * crawls: OLS of ln(cnt) on ln(rank) via the built-in `regr_*`
    * aggregates over the DISTRIBUTED frequency rank
    * (`Pipeline.rankVocab` — bucket-offset decomposition, no global
    * window), so the fit costs one keyed agg + one reduce regardless
    * of vocabulary size. Fit stats rounded to 6 (§4 rule: the two
    * engines accumulate the regression sums in different orders;
    * ulp-scale differences cannot move the 6th decimal here).
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(docTokens(spark)(lower(col("text")))).as("w"))
    Pipeline.rankVocab(toks.groupBy("w").agg(count(lit(1)).as("cnt")))
      .select(col("cnt"), col("rank"))
      .agg(
        count(lit(1)).as("n_vocab"),
        sum(col("cnt")).as("n_tokens"),
        round(expr("regr_slope(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"),
          6).as("zipf_slope"),
        round(expr("regr_intercept(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"),
          6).as("zipf_intercept"),
        round(expr("regr_r2(ln(CAST(cnt AS DOUBLE)), ln(CAST(rank AS DOUBLE)))"),
          6).as("fit_r2"))
  }

  /** Explicit ASCII character classes shared with the DuckDB oracle.
    * Java `\s` and RE2 `[[:space:]]` are the same six chars but the
    * explicit class removes the cross-engine trust; `\p{Punct}` ==
    * `[[:punct:]]` is the established §4 identity.
    */
  private val SpaceClass = "[ \\t\\n\\x0B\\f\\r]"

  private def classCount(c: Column, regex: String): Column =
    (length(c) - length(regexp_replace(c, regex, ""))).cast("long")

  /** Per-language character-class composition census — the corpus-QA
    * signal that catches encoding mishaps, boilerplate floods (punct
    * or digit spikes), and case-collapsed crawls before they hit
    * training. Per-doc counts are length-diffs of `regexp_replace`
    * (codegen'd, no explode); the shuffle key is `lang` (tiny,
    * conf-free domain), so partial aggregation collapses each input
    * split to ≤|langs| rows — one narrow scan at any corpus size.
    * Ratios are ppm integers by the §4 pure-integer HALF_UP rule.
    */
  def charclassCensus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("lang"),
        length(col("text")).cast("long").as("n"),
        classCount(col("text"), "[a-z]").as("lo"),
        classCount(col("text"), "[A-Z]").as("up"),
        classCount(col("text"), "[0-9]").as("di"),
        classCount(col("text"), SpaceClass).as("sp"),
        classCount(col("text"), "\\p{Punct}").as("pu"))
    d.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_chars"),
        sum("lo").as("lo"), sum("up").as("up"), sum("di").as("di"),
        sum("sp").as("sp"), sum("pu").as("pu"))
      .withColumn("t", greatest(col("n_chars"), lit(1L)))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        expr("(2*1000000*lo + t) div (2*t)").as("lower_ppm"),
        expr("(2*1000000*up + t) div (2*t)").as("upper_ppm"),
        expr("(2*1000000*di + t) div (2*t)").as("digit_ppm"),
        expr("(2*1000000*sp + t) div (2*t)").as("space_ppm"),
        expr("(2*1000000*pu + t) div (2*t)").as("punct_ppm"),
        expr("(2*1000000*(n_chars - lo - up - di - sp - pu) + t) div (2*t)")
          .as("other_ppm"))
      .orderBy("lang")
  }

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * distributions — the corpus-drift / mixture-planning matrix (how
    * far apart two domains' vocabularies sit, symmetric and bounded
    * [0, 1] in bits). Scale shape: per-(source, word) counts (one
    * keyed partial-aggregable shuffle), per-word probability maps
    * gathered with `map_from_entries` — bounded by the SOURCE count,
    * never the vocabulary — then a broadcast source-pair grid whose
    * explode feeds a partial agg on the tiny pair domain in the same
    * stage. Zero-overlap words contribute exactly p/2 (log2(2) = 1 in
    * both engines); sums round to 6 (the txt_entropy log2 rule).
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.documents(spark, dir)
      .select(col("source"), explode(docTokens(spark)(lower(col("text")))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("source").agg(sum("c").as("t"))
    val probs = cnt.join(broadcast(tot), Seq("source"))
      .select(col("source"), col("w"),
        (col("c").cast("double") / col("t").cast("double")).as("p"))
    val perWord = probs.groupBy("w")
      .agg(map_from_entries(collect_list(struct(col("source"), col("p")))).as("m"))
    val pairs = tot.select(col("source").as("s1"))
      .crossJoin(broadcast(tot.select(col("source").as("s2"))))
      .filter(col("s1") < col("s2"))
    perWord.crossJoin(broadcast(pairs))
      .select(col("s1"), col("s2"),
        // try_element_at: a word absent from one source is the point
        // of the computation (NULL → 0 mass); plain element_at would
        // throw on the missing key under ANSI mode
        try_element_at(col("m"), col("s1")).as("p"),
        try_element_at(col("m"), col("s2")).as("q"))
      .filter(col("p").isNotNull || col("q").isNotNull)
      .withColumn("t", coalesce(col("p"), lit(0.0)) + coalesce(col("q"), lit(0.0)))
      .withColumn("term",
        when(col("p").isNotNull,
          col("p") * log2(lit(2.0) * col("p") / col("t")) * 0.5).otherwise(0.0) +
          when(col("q").isNotNull,
            col("q") * log2(lit(2.0) * col("q") / col("t")) * 0.5).otherwise(0.0))
      .groupBy("s1", "s2")
      .agg(round(sum(col("term")), 6).as("jsd"),
        count(lit(1)).as("n_words"))
      .orderBy("s1", "s2")
  }

  /** Per-language vocabulary richness census — hapax legomena and
    * type/token ratio, the classic corpus-linguistics health signal
    * (a spike in hapax share flags OCR noise or boilerplate
    * injection; TTR collapse flags template spam). One
    * (lang, word) keyed agg — the wordcount shuffle, partial-agged
    * map-side — then a languages-sized rollup; ratios are §4 HALF_UP
    * ppm integers so no FP division exists on either engine.
    */
  def hapaxCensus(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(docTokens(spark)(lower(col("text")))).as("w"))
      .groupBy("lang", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        count(when(col("c") === 1, 1)).as("n_hapax"))
      .select(col("lang"), col("n_types"), col("n_tokens"), col("n_hapax"),
        expr("(2*n_types*1000000 + n_tokens) div (2*n_tokens)").as("ttr_ppm"),
        expr("(2*n_hapax*1000000 + n_types) div (2*n_types)").as("hapax_ppm"))
      .orderBy("lang")

  /** Per-source Simpson concentration of the unigram distribution —
    * the repeated-text / template-spam detector dual to
    * `txt_hapax_census` (hapax looks at the distribution's tail,
    * Simpson at its head): λ = Σc(c−1) / n(n−1), the EXACT
    * probability two sampled tokens match, as a HALF_UP ppm integer
    * — both numerator and denominator are plain BIGINT products, so
    * zero FP exists end to end. Same wordcount-shaped keyed agg +
    * source-sized rollup as the hapax census. Headroom: 2·Σc(c−1)·10⁶
    * stays in BIGINT while Σc² < 4.6·10¹²; past that (a source with
    * trillions of near-identical tokens) move the fraction to
    * DECIMAL(38).
    */
  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(docTokens(spark)(lower(col("text")))).as("w"))
      .groupBy("source", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(col("c") * (col("c") - 1)).as("coll"))
      .select(col("source"), col("n_types"), col("n_tokens"),
        expr("(2*coll*1000000 + n_tokens*(n_tokens-1)) div (2*n_tokens*(n_tokens-1))")
          .as("simpson_ppm"))
      .orderBy("source")

  /** Per-document trigram novelty — the dedup-adjacent curation
    * curve ("how much of this doc's phrasing is new to the corpus in
    * doc_id order"): a doc's DISTINCT trigrams that first occur in
    * it, over its distinct trigrams, as HALF_UP ppm. First
    * occurrence is a keyed min-agg on the trigram (the wordcount
    * shuffle shape — the trigram domain scales with the corpus and is
    * NEVER broadcast or windowed), joined back per (doc, gram) and
    * rolled up per doc. Trigrams come from the native `NGrams`
    * codegen expression; docs under 3 tokens have no trigrams and are
    * absent on both engines by inner-join semantics.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.NGrams.ngrams(col("text"), 3))).as("g"))
    val first = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("(2*n_novel*1000000 + n_grams) div (2*n_grams)").as("novelty_ppm"))
      .orderBy("doc_id")
  }

  /** Long-consonant-run detector regex — 5+ consecutive ASCII
    * consonants flags OCR garbage, mojibake, and key-mash tokens
    * while sparing real English (strengths/lengths hold the record
    * at 5 but sit in the long tail). Java and RE2 agree on this
    * explicit class.
    */
  val GarbageRunRegex = "[bcdfghjklmnpqrstvwxz]{5}"

  /** Per-source OCR-garbage census — the scanner-noise health check
    * a crawl pipeline runs before spending GPU time on a source:
    * tokens containing a 5+ consonant run, rolled up per source with
    * the share of affected documents. One codegen'd scan (the
    * filter runs inside the HOF lambda — no explode, no per-token
    * shuffle) + a source-sized agg; ratios HALF_UP ppm.
    */
  def garbageTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = docTokens(spark)(lower(col("text")))
    Tables.documents(spark, dir)
      .select(col("source"),
        size(toks).cast("long").as("n_tok"),
        size(filter(toks, t => t.rlike(GarbageRunRegex))).cast("long").as("n_bad"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_bad")).as("n_garbage"),
        count(when(col("n_bad") > 0, 1)).as("n_docs_hit"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_garbage"),
        col("n_docs_hit"),
        expr("(2*n_garbage*1000000 + n_tokens) div (2*n_tokens)").as("garbage_ppm"),
        expr("(2*n_docs_hit*1000000 + n_docs) div (2*n_docs)").as("docs_hit_ppm"))
      .orderBy("source")
  }

  /** Top templates for `txt_template_prefixes`. */
  val TemplateTopK = 50

  /** Boilerplate-template mining — the "mined from a CMS" detector
    * that catches what exact dedup misses (same page skeleton,
    * different fill): documents grouped by their first-5-token
    * prefix, the TemplateTopK most common prefixes with doc counts
    * and distinct sources. One codegen'd prefix projection + a keyed
    * agg on the prefix domain (corpus-scaled, partial-agged, never
    * broadcast) + TakeOrdered with a full deterministic tie-break.
    */
  def templatePrefixes(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        array_join(slice(docTokens(spark)(lower(col("text"))), 1, 5), " ").as("prefix"))
      .filter(length(col("prefix")) > 0)
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(desc("n_docs"), desc("n_sources"), asc("prefix"))
      .limit(TemplateTopK)

  /** Church–Gale burstiness census — cf/df per collection-frequency
    * band (a bursty word concentrates its occurrences in few docs;
    * content words are bursty, function words are not — the signal
    * behind IDF variants and stopword induction): per word the
    * collection frequency cf and document frequency df from ONE
    * (word, doc) partial-agged stream, rolled into log2(cf) bands
    * with the ratio-of-sums mean cf/df ×100 as a HALF_UP integer.
    * Two keyed aggs over the corpus-scaled word domain + a ≤64-row
    * band rollup; zero FP.
    */
  def burstiness(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(docTokens(spark)(lower(col("text")))).as("w"))
      .groupBy("w", "doc_id")
      .agg(count(lit(1)).as("c"))
      .groupBy("w")
      .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"))
      .groupBy(length(bin(col("cf"))).cast("long").as("cf_band"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("cf")).as("sum_cf"),
        sum(col("df")).as("sum_df"))
      .withColumn("burst_x100", expr("(2*sum_cf*100 + sum_df) div (2*sum_df)"))
      .orderBy("cf_band")

  /** Phrases reported by `txt_rake_keyphrases`. */
  val RakeTopK = 20

  /** RAKE keyphrase extraction (Rose et al.) — the classic
    * unsupervised keyword miner: candidate phrases are maximal runs
    * of non-stopword tokens (stopwords and punctuation delimit),
    * each word scores deg/freq over the phrase corpus (deg = Σ phrase
    * length over the word's occurrences — co-membership counts;
    * freq = occurrence count), and a phrase scores the sum of its
    * members' scores. Every statistic is an exact integer and the
    * deg/freq ratio rides the §4 HALF_UP ppm identity, so phrase
    * scores are order-free integer sums — no FP anywhere. Runs are
    * found by the gaps-and-islands lag/cumsum under per-DOC windows
    * (bounded by the doc's own length); phrase text reassembles via
    * sort-by-position array_join, identical to the oracle's ordered
    * string_agg. Deterministic top-K by (score, phrase).
    */
  def rakeKeyphrases(spark: SparkSession, dir: String): DataFrame = {
    // Islands (maximal non-stopword runs), their phrase text, and the
    // per-occurrence (word, phrase length) tags all come from ONE
    // native pass per document (functions/RakeCandidates) — the
    // composed form paid a per-doc lag/cumsum window exchange over
    // the posexploded token stream plus two island⋈phrase joins to
    // derive the same rows. The corpus-scaled scoring stays
    // declarative, and the DuckDB oracle still replays the composed
    // construction, so the hash match certifies the fused walk.
    val occ = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.RakeCandidates.rake_candidates(
          col("text"), Stopwords.toSet)).as("o"))
      .select(col("doc_id"), col("o.island").as("island"),
        col("o.phrase").as("phrase"), col("o.w").as("w"),
        col("o.len").as("len"))
    val wordScore = occ
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .select(col("w"), expr("(2*deg*1000000 + freq) div (2*freq)").as("wscore"))
    val perOcc = occ
      .join(wordScore, Seq("w"))
      .groupBy("doc_id", "island", "phrase", "len")
      .agg(sum(col("wscore")).as("score"))
    perOcc.groupBy("phrase")
      .agg(max(col("len")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score")).as("score_ppm"))
      .orderBy(desc("score_ppm"), asc("phrase"))
      .limit(RakeTopK)
  }

  /** Corpus-prefix deciles for `txt_vocab_growth`. */
  val VocabDeciles = 10L

  /** Heaps-law vocabulary growth curve — the "is more data still
    * buying new vocabulary?" curation diagnostic: the corpus is cut
    * into ten prefix deciles by doc id (the ingest order of this
    * corpus), and each decile reports its doc/token mass plus how many
    * distinct token TYPES appear there for the FIRST time; cumulative
    * columns give the Heaps curve V(n) directly. First-appearance is a
    * single min(doc_id) per type (wordcount-shaped shuffle — the only
    * corpus-scaled exchange); the decile index is the pure-integer
    * equi-width formula over the broadcast id range; cumulatives ride
    * the broadcast theta-join over the 10-row grid, so no window over
    * any corpus-scaled input exists. The DuckDB oracle may use native
    * windows over its own 10-row aggregate — the decomposition is
    * what the hash match proves.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // bounds is referenced by three broadcasts and grid by both sides
    // of the cumulative theta-join: materialized once each (1-row and
    // 10-row frames) instead of re-aggregating the corpus per
    // reference. The token stream itself is deliberately NOT
    // checkpointed: re-scanning the corpus twice beats materializing
    // an exploded token relation at scale.
    val bounds = graft.Ckpt.truncate(
      docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi")))
    def decile(c: Column): Column =
      expr(s"((${c.toString} - lo) * $VocabDeciles) div (hi - lo + 1)")
    val tok = docs
      .select(col("doc_id"), explode(docTokens(spark)(lower(col("text")))).as("term"))
    val nDocs = docs.crossJoin(broadcast(bounds))
      .groupBy(decile(col("doc_id")).as("decile"))
      .agg(count(lit(1)).as("n_docs"))
    val nToks = tok.crossJoin(broadcast(bounds))
      .groupBy(decile(col("doc_id")).as("decile"))
      .agg(count(lit(1)).as("n_tokens"))
    val newTypes = tok.groupBy("term").agg(min(col("doc_id")).as("fdoc"))
      .crossJoin(broadcast(bounds))
      .groupBy(decile(col("fdoc")).as("decile"))
      .agg(count(lit(1)).as("new_types"))
    val grid = graft.Ckpt.truncate(nDocs
      .join(nToks, Seq("decile"), "full_outer")
      .join(newTypes, Seq("decile"), "full_outer")
      .select(col("decile"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types")))
    grid.as("a")
      .join(broadcast(grid.as("b")), col("b.decile") <= col("a.decile"))
      .groupBy(col("a.decile").as("decile"), col("a.n_docs").as("n_docs"),
        col("a.n_tokens").as("n_tokens"), col("a.new_types").as("new_types"))
      .agg(sum(col("b.n_tokens")).as("cum_tokens"),
        sum(col("b.new_types")).as("cum_types"))
      .orderBy("decile")
  }

  /** Code-vs-prose routing — the corpus-mix classifier an LLM data
    * pipeline runs before weighting code and natural language
    * differently. Signal: the code-symbol density `[{};=()]` per
    * char in HALF_UP ppm; docs at or above `CodeSymbolPpm` route as
    * code. The natural corpus is prose (density 0), so the detector
    * is exercised the `withPlanted` way: every 8th doc gets a
    * code-ified twin (tokens joined with `;`, wrapped in braces) at
    * doc_id + 2,000,000, and the oracle-hashed census proves the
    * detector separates the two populations exactly — planted docs
    * all route code, naturals all route prose. One scan, two
    * codegen'd regexp lengths per doc, a (source × route)-sized agg.
    */
  val CodeSymbolPpm = 20000L
  val CodePlantOffset = 2000000L
  def codeDetect(spark: SparkSession, dir: String): DataFrame = {
    // Loud collision guard (ADVICE r9 #4, the minhashErrorCensus
    // precedent): a corpus with doc_id >= the plant offset would
    // silently overlap planted and natural ids in BOTH engines, so
    // the oracle hash could stay green on corrupted ground truth.
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .filter(assert_true(col("doc_id") < CodePlantOffset,
        lit(s"codeDetect: doc_id >= $CodePlantOffset collides with planted ids — raise CodePlantOffset")).isNull)
    val planted = docs.filter(col("doc_id") % 8 === 0)
      .select((col("doc_id") + lit(CodePlantOffset)).as("doc_id"), col("source"),
        concat(lit("{"), regexp_replace(col("text"), " ", "; "), lit(";}"))
          .as("text"))
    docs.unionByName(planted)
      .select(col("source"), col("doc_id"),
        length(col("text")).cast("long").as("len"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[{};=()]", "")))
          .cast("long").as("n_sym"))
      .withColumn("symbol_ppm",
        expr("CASE WHEN len = 0 THEN 0 ELSE (2*n_sym*1000000 + len) div (2*len) END"))
      .withColumn("route",
        when(col("symbol_ppm") >= CodeSymbolPpm, "code").otherwise("prose"))
      .groupBy("source", "route")
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_chars"),
        sum(col("symbol_ppm")).as("sum_ppm"))
      .withColumn("avg_ppm", expr("(2*sum_ppm + n_docs) div (2*n_docs)"))
      .drop("sum_ppm")
      .orderBy("source", "route")
  }

  /** Planted boilerplate footer (8 tokens → 6 internal trigrams),
    * appended to every 3rd doc — the natural corpus is word salad
    * with no shared templates, so the detector is exercised the
    * planted-twin way (same discipline as `txt_code_detect`).
    */
  val BoilerplateFooter =
    "subscribe to our newsletter terms of service apply"

  /** A span is boilerplate within a source when ≥ 10% of the
    * source's docs contain it (and at least 2 do — the ratio alone
    * degenerates at tiny sources).
    */
  val BoilerplateDfPct = 10L

  /** Cross-document boilerplate detection — the C4/RefinedWeb
    * cleaning step `dd_span_dedup` does NOT cover: span_dedup charges
    * every re-occurrence of a span anywhere in the corpus, while
    * boilerplate is about DOCUMENT FREQUENCY inside a source (site
    * footers, navigation, license headers — spans that many documents
    * of one crawl share). Pipeline: per-(source, doc) distinct
    * trigrams (presence, not multiplicity) → per-(source, span)
    * document frequency → spans over the DF threshold are templates →
    * per-source census (template spans, Σ df, affected docs,
    * affected-coverage ppm). Scale shape: two keyed shuffles (span
    * df, affected-doc distinct), a broadcast of the tiny per-source
    * doc-count table, and a semi-join back on the span key; nothing
    * holds state beyond one source's span domain, and the census
    * output is sources-sized.
    */
  def boilerplateCensus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" " + BoilerplateFooter)))
          .otherwise(col("text")).as("text"))
    val srcDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    // spans feeds THREE subtrees (df counts, template hits, affected
    // docs) with different downstream exchanges — materialize the
    // corpus-scaled distinct once instead of re-running the trigram
    // explode per branch (measured: 6 parquet scans → 2, 1.9 → 1.3 s)
    val spans = docs
      .select(col("source"), col("doc_id"),
        explode(graft.functions.NGrams.ngrams(col("text"), 3)).as("span"))
      .distinct()
      .truncated
    val dfreq = spans.groupBy("source", "span")
      .agg(count(lit(1)).as("df"))
    val templates = dfreq.join(broadcast(srcDocs), "source")
      .filter(col("df") >= 2 &&
        col("df") * lit(BoilerplateDfPct) >= col("n_docs"))
    val affected = spans
      .join(templates.select("source", "span"), Seq("source", "span"), "left_semi")
      .select("source", "doc_id").distinct()
      .groupBy("source").agg(count(lit(1)).as("affected_docs"))
    templates.groupBy("source")
      .agg(count(lit(1)).as("n_template_spans"), sum(col("df")).as("template_hits"))
      .join(broadcast(srcDocs), "source")
      .join(broadcast(affected), "source")
      .select(col("source"), col("n_docs"), col("n_template_spans"),
        col("template_hits"), col("affected_docs"),
        expr("(2*affected_docs*1000000 + n_docs) div (2*n_docs)")
          .as("affected_ppm"))
      .orderBy("source")
  }

  /** Vocabulary-membership threshold: a token is in-vocabulary when
    * its global count clears `OovVocabPpm` parts-per-million of the
    * corpus token mass. The threshold itself BOUNDS the vocabulary:
    * at most 1e6/OovVocabPpm = 1000 tokens can each hold ≥ 0.1% of
    * the mass, so the vocab side of the membership join is provably
    * broadcastable at ANY corpus size — no top-k (no sort+limit
    * feeding a join), no conf-tuned size guess.
    */
  val OovVocabPpm = 1000L

  /** Tokenizer-coverage census — the pre-training question "what
    * fraction of each source's token stream falls outside the
    * vocabulary we'd actually keep". Every doc gets one planted
    * doc-unique token (`zq<doc_id>`, count 1, structurally OOV), so
    * the census has exact known ground truth in an otherwise
    * tiny-vocab corpus: per source, n_oov == n_docs. Shape: one
    * token-keyed agg for global counts, a scalar total, the
    * ppm-threshold filter (vocab ≤ 1000 rows by construction,
    * broadcast), then a per-source agg over the token stream with an
    * anti-join membership flag. The corpus text is scanned twice
    * (count build + membership pass) — the price of an exact global
    * vocabulary; a 100 TB run would reuse the first pass's
    * materialized counts for both.
    */
  def oovCensus(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"),
        explode(docTokens(spark)(lower(concat(col("text"),
          concat(lit(" zq"), col("doc_id")))))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("total"))
    val vocab = counts.crossJoin(broadcast(total))
      .filter(col("c") * lit(1000000L) >= lit(OovVocabPpm) * col("total"))
      .select("tok")
    toks.join(broadcast(vocab), Seq("tok"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_oov"))
      .join(toks.groupBy("source").agg(count(lit(1)).as("n_tokens")), "source")
      .select(col("source"), col("n_tokens"), col("n_oov"),
        expr("(2*n_oov*1000000 + n_tokens) div (2*n_tokens)").as("oov_ppm"))
      .orderBy("source")
  }

  val queries: Map[String, GQuery] = Map(
    "txt_boilerplate_census" -> GQuery.sql(boilerplateCensus,
      s"""WITH docs AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN text || ' $BoilerplateFooter' ELSE text END AS text
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, source,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM docs),
        |spans AS (
        |  SELECT DISTINCT source, doc_id,
        |    unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
        |      i -> array_to_string(t[i:i+2], ' '))) AS span
        |  FROM toks),
        |sd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM docs GROUP BY source),
        |dfreq AS (SELECT source, span, count(*) AS df FROM spans GROUP BY 1, 2),
        |templ AS (
        |  SELECT dfreq.source, span, df FROM dfreq JOIN sd USING (source)
        |  WHERE df >= 2 AND df * $BoilerplateDfPct >= n_docs),
        |aff AS (
        |  SELECT source, count(DISTINCT doc_id) AS affected_docs FROM spans s
        |  WHERE EXISTS (SELECT 1 FROM templ t
        |                WHERE t.source = s.source AND t.span = s.span)
        |  GROUP BY source),
        |agg AS (
        |  SELECT source, count(*) AS n_template_spans,
        |    CAST(sum(df) AS BIGINT) AS template_hits
        |  FROM templ GROUP BY source)
        |SELECT agg.source, n_docs, n_template_spans, template_hits,
        |  affected_docs,
        |  (2*affected_docs*1000000 + n_docs) // (2*n_docs) AS affected_ppm
        |FROM agg JOIN sd USING (source) JOIN aff USING (source)
        |ORDER BY agg.source""".stripMargin),
    "txt_oov_census" -> GQuery.sql(oovCensus,
      s"""WITH toks AS (
        |  SELECT source, unnest(list_filter(
        |    regexp_split_to_array(lower(text || ' zq' || doc_id),
        |      '[[:punct:][:space:]]+'), x -> len(x) > 0)) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
        |vocab AS (
        |  SELECT tok FROM counts, tot WHERE c * 1000000 >= $OovVocabPpm * total),
        |o AS (
        |  SELECT source, count(*) AS n_oov FROM toks
        |  WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY source),
        |n AS (SELECT source, count(*) AS n_tokens FROM toks GROUP BY source)
        |SELECT n.source, n_tokens, n_oov,
        |  (2*n_oov*1000000 + n_tokens) // (2*n_tokens) AS oov_ppm
        |FROM n JOIN o USING (source)
        |ORDER BY n.source""".stripMargin),
    "txt_code_detect" -> GQuery.sql(codeDetect,
      s"""WITH all_docs AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, source,
        |    '{' || replace(text, ' ', '; ') || ';}'
        |  FROM documents WHERE doc_id % 8 = 0),
        |m AS (
        |  SELECT source, doc_id,
        |    CAST(length(text) AS BIGINT) AS len,
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[{};=()]', '', 'g')) AS BIGINT)
        |      AS n_sym
        |  FROM all_docs),
        |p AS (
        |  SELECT source, len,
        |    CASE WHEN len = 0 THEN 0
        |         ELSE (2*n_sym*1000000 + len) // (2*len) END AS symbol_ppm
        |  FROM m),
        |r AS (
        |  SELECT source,
        |    CASE WHEN symbol_ppm >= $CodeSymbolPpm THEN 'code'
        |         ELSE 'prose' END AS route,
        |    len, symbol_ppm
        |  FROM p)
        |SELECT source, route, count(*) AS n_docs,
        |  CAST(sum(len) AS BIGINT) AS sum_chars,
        |  (2*CAST(sum(symbol_ppm) AS BIGINT) + count(*)) // (2*count(*))
        |    AS avg_ppm
        |FROM r GROUP BY 1, 2 ORDER BY source, route""".stripMargin),
    "txt_rake_keyphrases" -> GQuery.sql(rakeKeyphrases,
      s"""WITH arr AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text),
        |      '[[:punct:][:space:]]+'), x -> len(x) > 0) AS a
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(a) AS w,
        |    generate_subscripts(a, 1) - 1 AS pos
        |  FROM arr),
        |ns AS (
        |  SELECT * FROM toks
        |  WHERE w NOT IN (${Stopwords.map(w => s"'$w'").mkString(", ")})),
        |isl AS (
        |  SELECT doc_id, pos, w,
        |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |           = pos - 1 THEN 0 ELSE 1 END AS brk
        |  FROM ns),
        |isl2 AS (
        |  SELECT doc_id, pos, w,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |ph AS (
        |  SELECT doc_id, island,
        |    string_agg(w, ' ' ORDER BY pos) AS phrase, count(*) AS len
        |  FROM isl2 GROUP BY 1, 2),
        |ws AS (
        |  SELECT w, count(*) AS freq, CAST(sum(len) AS BIGINT) AS deg
        |  FROM isl2 i JOIN ph USING (doc_id, island) GROUP BY w),
        |sc AS (
        |  SELECT w, (2*deg*1000000 + freq) // (2*freq) AS wscore FROM ws),
        |po AS (
        |  SELECT i.doc_id, i.island, ph.phrase, ph.len,
        |    CAST(sum(sc.wscore) AS BIGINT) AS score
        |  FROM isl2 i JOIN ph USING (doc_id, island) JOIN sc USING (w)
        |  GROUP BY 1, 2, 3, 4)
        |SELECT phrase, max(len) AS n_words, count(*) AS n_occurrences,
        |  max(score) AS score_ppm
        |FROM po GROUP BY phrase
        |ORDER BY score_ppm DESC, phrase LIMIT $RakeTopK""".stripMargin),
    "txt_vocab_growth" -> GQuery.sql(vocabGrowth,
      s"""WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        |tok AS (
        |  SELECT d.doc_id, t.term
        |  FROM documents d,
        |    unnest(list_filter(regexp_split_to_array(lower(d.text),
        |      '[[:punct:][:space:]]+'), x -> len(x) > 0)) AS t(term)),
        |nd AS (
        |  SELECT ((doc_id - lo) * $VocabDeciles) // (hi - lo + 1) AS decile,
        |    count(*) AS n_docs
        |  FROM documents, b GROUP BY 1),
        |nt AS (
        |  SELECT ((doc_id - lo) * $VocabDeciles) // (hi - lo + 1) AS decile,
        |    count(*) AS n_tokens
        |  FROM tok, b GROUP BY 1),
        |fd AS (SELECT term, min(doc_id) AS fdoc FROM tok GROUP BY term),
        |nv AS (
        |  SELECT ((fdoc - lo) * $VocabDeciles) // (hi - lo + 1) AS decile,
        |    count(*) AS new_types
        |  FROM fd, b GROUP BY 1),
        |grid AS (
        |  SELECT coalesce(nd.decile, nt.decile, nv.decile) AS decile,
        |    coalesce(n_docs, 0) AS n_docs,
        |    coalesce(n_tokens, 0) AS n_tokens,
        |    coalesce(new_types, 0) AS new_types
        |  FROM nd
        |  FULL OUTER JOIN nt ON nd.decile = nt.decile
        |  FULL OUTER JOIN nv ON coalesce(nd.decile, nt.decile) = nv.decile)
        |SELECT decile, n_docs, n_tokens, new_types,
        |  CAST(sum(n_tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens,
        |  CAST(sum(new_types) OVER (ORDER BY decile) AS BIGINT) AS cum_types
        |FROM grid ORDER BY decile""".stripMargin),
    "txt_burstiness" -> GQuery.sql(burstiness,
      """WITH wd AS (
        |  SELECT w, doc_id, count(*) AS c
        |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
        |          lower(text), '[[:punct:][:space:]]+'), x -> len(x) > 0)) AS w
        |        FROM documents)
        |  GROUP BY w, doc_id),
        |wf AS (
        |  SELECT w, CAST(sum(c) AS BIGINT) AS cf, count(*) AS df
        |  FROM wd GROUP BY w)
        |SELECT CAST(length(bin(cf)) AS BIGINT) AS cf_band,
        |  count(*) AS n_words,
        |  CAST(sum(cf) AS BIGINT) AS sum_cf,
        |  CAST(sum(df) AS BIGINT) AS sum_df,
        |  (2*CAST(sum(cf) AS BIGINT)*100 + CAST(sum(df) AS BIGINT))
        |    // (2*CAST(sum(df) AS BIGINT)) AS burst_x100
        |FROM wf GROUP BY cf_band ORDER BY cf_band""".stripMargin),
    "txt_template_prefixes" -> GQuery.sql(templatePrefixes,
      s"""WITH p AS (
        |  SELECT source,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[[:punct:][:space:]]+'), x -> len(x) > 0)[1:5], ' ') AS prefix
        |  FROM documents),
        |c AS (
        |  SELECT prefix, count(*) AS n_docs,
        |    count(DISTINCT source) AS n_sources
        |  FROM p WHERE len(prefix) > 0 GROUP BY prefix)
        |SELECT prefix, n_docs, n_sources
        |FROM c ORDER BY n_docs DESC, n_sources DESC, prefix
        |LIMIT $TemplateTopK""".stripMargin),
    "txt_garbage_tokens" -> GQuery.sql(garbageTokens,
      s"""WITH d AS (
        |  SELECT source,
        |    list_filter(regexp_split_to_array(lower(text),
        |      '[[:punct:][:space:]]+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |c AS (
        |  SELECT source, len(tk) AS n_tok,
        |    len(list_filter(tk, x -> regexp_matches(x, '$GarbageRunRegex')))
        |      AS n_bad
        |  FROM d),
        |r AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_bad) AS BIGINT) AS n_garbage,
        |    CAST(count(*) FILTER (WHERE n_bad > 0) AS BIGINT) AS n_docs_hit
        |  FROM c GROUP BY source)
        |SELECT source, n_docs, n_tokens, n_garbage, n_docs_hit,
        |  (2*n_garbage*1000000 + n_tokens) // (2*n_tokens) AS garbage_ppm,
        |  (2*n_docs_hit*1000000 + n_docs) // (2*n_docs) AS docs_hit_ppm
        |FROM r ORDER BY source""".stripMargin),
    "txt_simpson_diversity" -> GQuery.sql(simpsonDiversity,
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(regexp_split_to_array(lower(text),
        |    '[[:punct:][:space:]]+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |cnt AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
        |r AS (
        |  SELECT source, count(*) AS n_types,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(sum(c*(c-1)) AS BIGINT) AS coll
        |  FROM cnt GROUP BY source)
        |SELECT source, n_types, n_tokens,
        |  (2*coll*1000000 + n_tokens*(n_tokens-1)) // (2*n_tokens*(n_tokens-1))
        |    AS simpson_ppm
        |FROM r ORDER BY source""".stripMargin),
    "txt_ngram_novelty" -> GQuery.sql(ngramNovelty,
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text),
        |      '[[:punct:][:space:]]+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))
        |    AS g
        |  FROM t WHERE len(tk) >= 3),
        |f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g),
        |j AS (SELECT g.doc_id, f.first_doc FROM g JOIN f USING (g)),
        |r AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    CAST(count(*) FILTER (WHERE first_doc = doc_id) AS BIGINT) AS n_novel
        |  FROM j GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_novel,
        |  (2*n_novel*1000000 + n_grams) // (2*n_grams) AS novelty_ppm
        |FROM r ORDER BY doc_id""".stripMargin),
    "txt_hapax_census" -> GQuery.sql(hapaxCensus,
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text),
        |    '[[:punct:][:space:]]+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |cnt AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY lang, w),
        |r AS (
        |  SELECT lang, count(*) AS n_types,
        |    CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
        |  FROM cnt GROUP BY lang)
        |SELECT lang, n_types, n_tokens, n_hapax,
        |  (2*n_types*1000000 + n_tokens) // (2*n_tokens) AS ttr_ppm,
        |  (2*n_hapax*1000000 + n_types) // (2*n_types) AS hapax_ppm
        |FROM r ORDER BY lang""".stripMargin),
    "txt_js_divergence" -> GQuery.sql(jsDivergence,
      """WITH toks AS (
        |  SELECT source, unnest(list_filter(regexp_split_to_array(lower(text),
        |    '[[:punct:][:space:]]+'), x -> len(x) > 0)) AS w
        |  FROM documents),
        |cnt AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY source),
        |probs AS (
        |  SELECT c.source, c.w, c.c::DOUBLE / t.t::DOUBLE AS p
        |  FROM cnt c JOIN tot t USING (source)),
        |pairs AS (
        |  SELECT a.source AS s1, b.source AS s2
        |  FROM tot a CROSS JOIN tot b WHERE a.source < b.source),
        |words AS (SELECT DISTINCT w FROM cnt),
        |grid AS (SELECT s1, s2, w FROM pairs CROSS JOIN words),
        |pq AS (
        |  SELECT g.s1, g.s2, p1.p AS p, p2.p AS q,
        |    coalesce(p1.p, 0) + coalesce(p2.p, 0) AS t
        |  FROM grid g
        |  LEFT JOIN probs p1 ON p1.source = g.s1 AND p1.w = g.w
        |  LEFT JOIN probs p2 ON p2.source = g.s2 AND p2.w = g.w
        |  WHERE p1.p IS NOT NULL OR p2.p IS NOT NULL)
        |SELECT s1, s2,
        |  round(sum(
        |    CASE WHEN p IS NOT NULL THEN p * log2(2 * p / t) * 0.5 ELSE 0 END +
        |    CASE WHEN q IS NOT NULL THEN q * log2(2 * q / t) * 0.5 ELSE 0 END), 6)
        |    AS jsd,
        |  count(*) AS n_words
        |FROM pq GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin),
    "txt_charclass_census" -> GQuery.sql(charclassCensus,
      """WITH d AS (
        |  SELECT lang, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS lo,
        |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS up,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS di,
        |    length(text) - length(regexp_replace(text, '[ \t\n\x0B\f\r]', '', 'g')) AS sp,
        |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS pu
        |  FROM documents),
        |g AS (
        |  SELECT lang, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_chars,
        |    CAST(sum(lo) AS BIGINT) AS lo, CAST(sum(up) AS BIGINT) AS up,
        |    CAST(sum(di) AS BIGINT) AS di, CAST(sum(sp) AS BIGINT) AS sp,
        |    CAST(sum(pu) AS BIGINT) AS pu,
        |    greatest(CAST(sum(n) AS BIGINT), 1) AS t
        |  FROM d GROUP BY lang)
        |SELECT lang, n_docs, n_chars,
        |  (2*1000000*lo + t) // (2*t) AS lower_ppm,
        |  (2*1000000*up + t) // (2*t) AS upper_ppm,
        |  (2*1000000*di + t) // (2*t) AS digit_ppm,
        |  (2*1000000*sp + t) // (2*t) AS space_ppm,
        |  (2*1000000*pu + t) // (2*t) AS punct_ppm,
        |  (2*1000000*(n_chars - lo - up - di - sp - pu) + t) // (2*t) AS other_ppm
        |FROM g ORDER BY lang""".stripMargin),
    "txt_zipf_fit" -> GQuery.sql(zipfFit,
      """WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text),
        |    '[[:punct:][:space:]]+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |pt AS (SELECT unnest(t) AS w FROM toks),
        |vocab AS (SELECT w, count(*) AS cnt FROM pt GROUP BY w),
        |vid AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank
        |  FROM vocab)
        |SELECT count(*) AS n_vocab, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  round(regr_slope(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 6) AS zipf_slope,
        |  round(regr_intercept(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 6) AS zipf_intercept,
        |  round(regr_r2(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 6) AS fit_r2
        |FROM vid""".stripMargin),
    "txt_collocation" -> GQuery.sql(collocation,
      s"""WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text),
        |    '[[:punct:][:space:]]+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |uni AS (
        |  SELECT unnest(t) AS w FROM toks),
        |u AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        |bgs AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
        |    i -> t[i] || ' ' || t[i+1])) AS bigram
        |  FROM toks WHERE len(t) >= 2),
        |bg AS (SELECT bigram, count(*) AS c12 FROM bgs GROUP BY bigram),
        |tot AS (SELECT (SELECT sum(c) FROM u) AS n_tokens,
        |               (SELECT sum(c12) FROM bg) AS m_bigrams)
        |SELECT bigram, c12,
        |  round(log2((c12::DOUBLE * n_tokens::DOUBLE * n_tokens::DOUBLE) /
        |    (m_bigrams::DOUBLE * u1.c::DOUBLE * u2.c::DOUBLE)), 6) AS pmi
        |FROM bg CROSS JOIN tot
        |JOIN u u1 ON u1.w = split_part(bigram, ' ', 1)
        |JOIN u u2 ON u2.w = split_part(bigram, ' ', 2)
        |WHERE c12 >= $CollocMinCount
        |ORDER BY pmi DESC, bigram LIMIT $CollocTopK""".stripMargin),
    "txt_entropy" -> GQuery.sql(charEntropy,
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
        |  FROM documents),
        |c AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
        |  round(log2(CAST(sum(cnt) AS DOUBLE)) -
        |        sum(CAST(cnt AS DOUBLE) * log2(CAST(cnt AS DOUBLE))) /
        |        CAST(sum(cnt) AS DOUBLE), 6) AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "txt_pii_scrub" -> GQuery.sql(piiScrub,
      """WITH s AS (
        |  SELECT doc_id,
        |    lower(text) || CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || doc_id || '@example.com ref ' || (doc_id * 37)
        |      ELSE '' END AS t
        |  FROM documents),
        |e AS (SELECT doc_id, t,
        |        regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
        |                       '<EMAIL>', 'g') AS t1
        |      FROM s)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t1, '[0-9]+')) AS n_nums,
        |  md5(regexp_replace(t1, '[0-9]+', '<NUM>', 'g')) AS scrubbed_md5
        |FROM e ORDER BY doc_id""".stripMargin),
    "txt_perplexity" -> GQuery.sql(perplexity,
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
        |    i -> t[i] || ' ' || t[i+1])) AS bigram
        |  FROM toks WHERE len(t) >= 2),
        |counts AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1),
        |lm AS (
        |  SELECT bigram, cnt::DOUBLE /
        |    CAST(sum(cnt) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS BIGINT) AS p
        |  FROM counts)
        |SELECT doc_id, count(*) AS n_bigrams, round(-avg(ln(p)), 4) AS avg_nll
        |FROM bg JOIN lm USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "txt_repetition" -> GQuery.sql(repetition,
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         round(max(c)::DOUBLE / sum(c), 6) AS top_token_frac
        |       FROM tc GROUP BY 1),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
        |         i -> t[i] || ' ' || t[i+1])) AS b
        |       FROM toks WHERE len(t) >= 2),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
        |       FROM bc GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(ts.n_tokens, 0) AS n_tokens,
        |  coalesce(ts.top_token_frac, 0.0) AS top_token_frac,
        |  coalesce(bs.top_bigram_frac, 0.0) AS top_bigram_frac
        |FROM documents d LEFT JOIN ts USING (doc_id) LEFT JOIN bs USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    "txt_bigram_lm" -> GQuery.sql(bigramLm,
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
        |    i -> [t[i], t[i+1]])) AS p
        |  FROM toks WHERE len(t) >= 2),
        |counts AS (
        |  SELECT p[1] AS w1, p[2] AS w2, count(*) AS cnt
        |  FROM bg GROUP BY 1, 2)
        |SELECT w1, w2, cnt,
        |  round(cnt::DOUBLE / CAST(sum(cnt) OVER (PARTITION BY w1) AS BIGINT), 6) AS cond_p
        |FROM counts ORDER BY w1, w2""".stripMargin),
    "txt_token_count" -> GQuery.sql(tokenCount,
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),
    "txt_token_count_unicode" -> GQuery.sql(tokenCountUnicode,
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[\pL\pN]+')) AS n_tokens,
        |  CAST(length(regexp_replace(text, '[^\pL\pN]', '', 'g')) AS BIGINT)
        |    AS n_alnum_chars
        |FROM documents ORDER BY doc_id""".stripMargin),
    "txt_readability" -> GQuery.sql(readability,
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(
        |      regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |      x -> len(x) > 0)) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |      x -> len(trim(x)) > 0)) AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |      AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  206835
        |    - (2*1015*n_words + greatest(n_sentences, 1))
        |        // (2*greatest(n_sentences, 1))
        |    - (2*84600*n_syllables + greatest(n_words, 1))
        |        // (2*greatest(n_words, 1)) AS flesch_e3
        |FROM t ORDER BY doc_id""".stripMargin),
    "txt_quality" -> GQuery.sql(quality,
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  length(text) AS char_len,
        |  len(t) AS n_tokens,
        |  round(CASE WHEN length(text) = 0 THEN 0 ELSE
        |    (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
        |    / length(text) END, 6) AS punct_ratio,
        |  round(CASE WHEN len(t) = 0 THEN 0 ELSE
        |    len(list_filter(t, x -> x IN ('the','a','an','and','of','to','in','is')))::DOUBLE
        |    / len(t) END, 6) AS stopword_ratio,
        |  round(CASE WHEN len(t) = 0 THEN 0 ELSE
        |    len(list_distinct(t))::DOUBLE / len(t) END, 6) AS uniq_ratio
        |FROM toks ORDER BY doc_id""".stripMargin),
    "txt_lang_confusion" -> GQuery.sql(langConfusion,
      """WITH t AS (
        |  SELECT doc_id, lang AS true_lang,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, true_lang,
        |    len(list_filter(toks, x -> x IN ('the','and','of','is','join','query'))) AS h_en,
        |    len(list_filter(toks, x -> x IN ('der','und','das','ist'))) AS h_de,
        |    len(list_filter(toks, x -> x IN ('el','la','de','es'))) AS h_es,
        |    len(list_filter(toks, x -> x IN ('le','la','et','est'))) AS h_fr,
        |    len(list_filter(toks, x -> x IN ('de','shi','he'))) AS h_zh
        |  FROM t),
        |p AS (
        |  SELECT true_lang,
        |    CASE WHEN greatest(h_en, h_de, h_es, h_fr, h_zh) = 0 THEN 'und'
        |         WHEN h_zh >= greatest(h_en, h_de, h_es, h_fr) THEN 'zh'
        |         WHEN h_fr >= greatest(h_en, h_de, h_es) THEN 'fr'
        |         WHEN h_es >= greatest(h_en, h_de) THEN 'es'
        |         WHEN h_en >= h_de THEN 'en'
        |         ELSE 'de' END AS pred_lang
        |  FROM h),
        |cells AS (
        |  SELECT true_lang, pred_lang, count(*) AS n
        |  FROM p GROUP BY 1, 2),
        |tots AS (
        |  SELECT true_lang, CAST(sum(n) AS BIGINT) AS tot
        |  FROM cells GROUP BY 1)
        |SELECT c.true_lang, c.pred_lang, c.n, t.tot AS n_true,
        |  (2 * c.n * 1000000 + t.tot) // (2 * t.tot) AS share_e6
        |FROM cells c JOIN tots t ON c.true_lang = t.true_lang
        |ORDER BY c.true_lang, c.pred_lang""".stripMargin),
    "txt_langid" -> GQuery.sql(langId,
      """WITH t AS (
        |  SELECT doc_id, lang AS true_lang,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, true_lang,
        |    len(list_filter(toks, x -> x IN ('the','and','of','is','join','query'))) AS h_en,
        |    len(list_filter(toks, x -> x IN ('der','und','das','ist'))) AS h_de,
        |    len(list_filter(toks, x -> x IN ('el','la','de','es'))) AS h_es,
        |    len(list_filter(toks, x -> x IN ('le','la','et','est'))) AS h_fr,
        |    len(list_filter(toks, x -> x IN ('de','shi','he'))) AS h_zh
        |  FROM t)
        |SELECT doc_id, true_lang,
        |  CASE WHEN greatest(h_en, h_de, h_es, h_fr, h_zh) = 0 THEN 'und'
        |       WHEN h_zh >= greatest(h_en, h_de, h_es, h_fr) THEN 'zh'
        |       WHEN h_fr >= greatest(h_en, h_de, h_es) THEN 'fr'
        |       WHEN h_es >= greatest(h_en, h_de) THEN 'es'
        |       WHEN h_en >= h_de THEN 'en'
        |       ELSE 'de' END AS pred_lang
        |FROM h ORDER BY doc_id""".stripMargin),
    "txt_fingerprint" -> GQuery.sql(fingerprint,
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS md5_hash
        |FROM documents ORDER BY doc_id""".stripMargin),
    "txt_hashed_classifier" -> GQuery.sql(hashedClassifier,
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[[:punct:][:space:]]+'),
        |                x -> len(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, g FROM toks, unnest(t) AS u(g)
        |  UNION ALL
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        |  FROM toks, unnest(range(1, len(t))) AS r(i)),
        |scored AS (
        |  SELECT doc_id,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(range(1, length(g) + 1),
        |         i -> CAST(ascii(g[i]) AS BIGINT))),
        |       (acc, x) -> (acc * 131 + x) % 1000000007)
        |     % 4096) * 2654435761 % 1001 - 500 AS w
        |  FROM grams)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(w) AS BIGINT) AS score,
        |  CAST(CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS BIGINT) AS label
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "txt_fingerprint_fnv" -> GQuery.sql(fingerprintFnv,
      """WITH n AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(s) + 1), i -> CAST(ascii(s[i]) AS BIGINT))),
        |    (acc, x) -> (acc * 131 + x) % 1000000007) AS BIGINT) AS rolling_hash
        |FROM n ORDER BY doc_id""".stripMargin),
  )
}
