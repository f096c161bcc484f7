package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftCaches.Persistable

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document fingerprinting.
  * All per-row column arithmetic (no UDFs, no shuffles) — at 100 TB these
  * run map-side at scan speed, and every expression stays inside
  * WholeStageCodegen.
  */
object TextAnalysis {

  /** Whitespace token count: number of maximal non-whitespace runs.
    * `regexp_count`-style via extract_all so empty strings count 0. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")

  /** BPE-ish word/sub-token count: alphabetic runs, digit runs, and single
    * other non-space symbols — a cheap proxy for tokenizer token counts. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[!-/:-@\\[-`{-~]"), lit(0))).cast("long")

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = regexp_extract_all(text, lit("\\S+"), lit(0))
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  private val StopWords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Fraction of whitespace tokens that are (lowercased) English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    val stops = filter(toks, t => t.isInCollection(StopWords))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks))
  }

  /** Heuristic document quality score in [0,1] — the length/punctuation/
    * stopword shape used by pretraining-data filters (Gopher/C4-style
    * rules, re-expressed as smooth ratios):
    *   0.4·min(n_tokens/100, 1)            (enough content)
    * + 0.3·(1 − min(punct_ratio·5, 1))     (not symbol soup)
    * + 0.3·min(stopword_ratio·4, 1)        (natural-language-like)
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val punctRatio = when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text))
    least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.3 +
      least(stopwordRatio(text) * 4.0, lit(1.0)) * 0.3
  }

  /** Canonical normalization for fingerprinting/dedup: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace, trim.
    *
    * ONE regex pass: a maximal run of non-alphanumerics (junk, whitespace,
    * or any mix) collapses to a single space — provably identical to the
    * two-pass strip-then-collapse form (each junk char became a space,
    * then the space run collapsed), and it scans every document once
    * instead of twice. DedupTextSpec pins the equivalence.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** UNICODE-PRESERVING normalization — lowercase, strip everything that is
    * not a letter, combining mark, digit, or whitespace in ANY script
    * (`\p{L}\p{M}\p{N}`), collapse whitespace, trim. This is the
    * normalization for the char-shingle dedup path on text whitespace
    * tokenization cannot segment (CJK, Thai) and for accented scripts,
    * where [[normalizeText]]'s ASCII class would blank the document
    * entirely. `\p{M}` keeps Thai/Indic vowel and tone marks attached to
    * their base letters. Both Spark (java.util.regex) and DuckDB (RE2)
    * support these category classes with identical BMP semantics, so the
    * gate compares like for like. */
  def normalizeTextUnicode(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L}\\p{M}\\p{N}\\s]", " "), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text — stable across
    * engines (DuckDB md5 == Spark md5), used as the exact-dedup key. */
  def fingerprint(text: Column): Column = fingerprintFromNormalized(normalizeText(text))

  def fingerprintFromNormalized(norm: Column): Column = md5(norm.cast("binary"))

  /** Rolling polynomial fingerprint (Rabin-Karp shape) over normalized
    * text, as a codegen'd expression: fold chars with h = h*31 + c mod
    * 2^57−13 (prime; (M−1)·31+255 < 2^63 so the Long arithmetic is EXACT —
    * a 2^61-scale modulus would silently overflow `acc*31`).
    * Distinct from md5: locality-free but cheap and order-sensitive.
    */
  val RollingHashModulus: Long = 144115188075855859L // 2^57 - 13, prime

  /** Portable form (no function registration needed) — the HoF fold.
    * Hot paths ([[analyze]]) use the codegen [[rollingHashFromNormalized]]. */
  def rollingHash(text: Column): Column =
    rollingHashHofFromNormalized(normalizeText(text))

  /** Native codegen form ([[graft.plans.RollingHash64]]): walks the
    * UTF8String bytes in place — the HoF fold materializes a one-char-
    * string array per character of every document. Callers must register
    * the graft functions on the session ([[analyze]] does). Defined on
    * the ASCII output of [[normalizeText]]. */
  def rollingHashFromNormalized(norm: Column): Column =
    call_function("graft_rolling_hash", norm)

  /** The HoF fold (pre-codegen formulation; cross-check reference —
    * bit-identical on ASCII input, DedupTextSpec pins it). */
  def rollingHashHofFromNormalized(norm: Column): Column =
    aggregate(
      split(norm, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)),
        lit(RollingHashModulus)))

  /** Language ID via stopword-profile voting: per language, count hits of
    * its most-frequent function words among the doc's tokens; argmax wins,
    * 'und' when nothing matches. N-gram-free heuristic (fastText-style
    * profiles need model files; function-word voting is the classic
    * lightweight approach and is pure column algebra).
    */
  private val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "des"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"))

  def langIdScores(text: Column): Column = {
    val toks = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    map(LangProfiles.toSeq.sortBy(_._1).flatMap { case (lang, words) =>
      Seq(lit(lang), size(filter(toks, t => t.isInCollection(words))).cast("double"))
    }: _*)
  }

  /** Deterministic argmax over a precomputed score map: first lang (sorted
    * keys) achieving the max; all-zero scores → 'und'. */
  def langPredFromScores(scores: Column): Column = {
    val best = array_max(map_values(scores))
    when(best <= 0, lit("und")).otherwise(
      element_at(
        filter(map_keys(scores), k => element_at(scores, k) === best), 1))
  }

  def langIdScoresFromTokens(toks: Column): Column =
    map(LangProfiles.toSeq.sortBy(_._1).flatMap { case (lang, words) =>
      Seq(lit(lang), size(filter(toks, t => t.isInCollection(words))).cast("double"))
    }: _*)

  /** Single-column convenience form. NOTE: as one expression tree the score
    * map is referenced three times, each re-running the tokenization — fine
    * for one-off use; hot paths should use [[withLangId]], which stages
    * tokens and scores as real columns (projection boundaries Catalyst's
    * CollapseProject keeps, since the references are non-cheap and
    * multiply-used) so each evaluates once per row.
    */
  def langId(text: Column): Column =
    langPredFromScores(langIdScoresFromTokens(
      regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))))

  /** Staged language-ID: adds `out` to `docs` with one tokenization and one
    * score-map evaluation per row. */
  def withLangId(docs: DataFrame, text: Column, out: String = "lang_pred"): DataFrame =
    docs
      .withColumn("__lang_toks", regexp_extract_all(lower(text), lit("[a-z]+"), lit(0)))
      .withColumn("__lang_scores", langIdScoresFromTokens(col("__lang_toks")))
      .withColumn(out, langPredFromScores(col("__lang_scores")))
      .drop("__lang_toks", "__lang_scores")

  /** Deterministic train/validation/test assignment — ENGINE-REPRODUCIBLE
    * sampling for data mixes: the bucket is the rolling-hash fold of the
    * id rendered as a string (content-independent, so exact duplicates can
    * land in different splits and leak detection stays meaningful), mod
    * 100. Unlike `rand()`/`sampleBy`, the same row maps to the same split
    * on any engine, any partitioning, any run — the property a
    * reproducible holdout needs. Requires `graft_rolling_hash` registered
    * (callers via [[graft.plans.GraftFunctions.register]]).
    */
  def splitAssign(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val bucket = pmod(rollingHashFromNormalized(id.cast("string")), lit(100L))
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("validation"))
      .otherwise(lit("test"))
  }

  /** Normalized whitespace terms of a document, as an array column.
    *
    * [[normalizeText]] guarantees single-space separation, so the
    * tokenizer is a plain `split` — a byte scan — instead of a `\S+`
    * regex matcher over every document (the regex engine was the
    * dominant cost of every terms()-based pipeline at sf0.1). The empty
    * document splits to [""], which `array_remove` drops, matching the
    * regex form's empty array.
    */
  def terms(text: Column): Column =
    array_remove(split(normalizeText(text), " ", -1), "")

  /** VOCABULARY COVERAGE / OOV-RATE AUDIT — how well a fixed top-N
    * vocabulary covers each document: `(n_tokens, n_oov, oov_permille)`
    * per doc. The tokenizer-coverage check a corpus runs before training
    * (a high OOV tail flags encoding damage, boilerplate languages the
    * vocab missed, or gibberish the quality filters should have caught).
    *
    * Shape at scale: the vocabulary is `count DESC, term ASC` top-N —
    * a partial-aggregated term rollup into TakeOrderedAndProject (ties at
    * the cut break deterministically on the term, so the same vocab comes
    * out on any engine or partitioning); it then BROADCASTS into the
    * token stream (a vocab is ≤ a few hundred thousand rows — never worth
    * a shuffle of the corpus), and the per-doc rollup partial-aggregates
    * map-side into the one `doc_id` exchange. `oov_permille` is exact
    * integer division — no float crosses a gate.
    */
  def vocabCoverage(docs: DataFrame, id: Column, text: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    // explode_outer: empty documents keep a null-term row so they emit
    // (n_tokens = 0, n_oov = 0) instead of vanishing
    val tok = docs.select(id.as("doc_id"), explode_outer(terms(text)).as("term"))
    val vocab = tok.filter(col("term").isNotNull)
      .groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("__in"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("term")).as("n_tokens"),
        sum(when(col("term").isNotNull && col("__in").isNull, 1L)
          .otherwise(0L)).as("n_oov"))
      .withColumn("oov_permille",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("(n_oov * 1000) div n_tokens")))
  }

  /** TF-IDF TOP-K TERMS per document — the classic corpus-characterization
    * query (keyword extraction, topic labeling at ingest time).
    *
    * Shape at scale: explode → `(doc, term)` tf aggregate (ONE shuffle on
    * `(doc_id, term)`, map-side combined); document frequency is a second
    * partial-aggregated rollup of the tf frame (never re-reads the corpus);
    * the tf⋈df join is keyed on `term` so AQE broadcasts the vocabulary
    * when it is small and shuffles when it is web-scale. The per-doc top-k
    * plans through the custom [[graft.plans.TopKPerKey]] operator — at
    * most k rows per (doc, partition) reach the exchange, where a window
    * rank would shuffle every `(doc, term)` row.
    *
    * Ranking is on `(tf DESC, df ASC, term ASC)` — all integer/string, so
    * the selected rows are exactly reproducible on any engine; the
    * floating `tfidf = tf · ln(N/df)` is a reported VALUE, never a sort
    * key. Requires [[graft.plans.GraftFunctions.register]] (planner
    * strategy injection).
    */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(terms(text)).as("term"))
    // tf feeds BOTH the df rollup and the scoring join — persist so the
    // corpus is tokenized once, not once per branch. Cache contract: lives
    // until the session's next clearCache (Verify/Bench clear per query).
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persistTracked()
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(docFreq, "term").crossJoin(broadcast(n))
    graft.plans.TopKPerKey.topKPerKey(scored,
        keyCols = Seq("doc_id"),
        orderBy = Seq(("tf", false), ("df_docs", true), ("term", true)), k = k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df_docs"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df_docs")), 6)
          .as("tfidf"))
  }

  /** UNIGRAM SURPRISAL quality signal: per-document mean negative log
    * probability of its terms under the corpus unigram distribution — the
    * cheap "perplexity-ish" filter pretraining pipelines run before a real
    * LM scores anything (gibberish and boilerplate sit at the two extremes).
    *
    * Everything downstream of the one explode works on the per-doc term
    * counts `(doc, term, tf)` — orders of magnitude smaller than the raw
    * token stream, and the token-level sum is recovered exactly as
    * `Σ tf·ln(total/cnt)`. That compact frame is persisted and feeds both
    * the model rollup and the scoring join (the corpus is scanned and
    * tokenized ONCE); the `(term, cnt)` model joins on `term` — AQE
    * broadcasts it for natural-language vocabularies. Cache contract as
    * [[tfidfTopTerms]].
    */
  def unigramSurprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(terms(text)).as("term"))
    // ONE exchange keyed on the MODEL key: hash(term) satisfies the
    // clustered distribution of every downstream consumer — the
    // (doc_id, term) tf aggregate (term ⊆ its keys), the model rollup,
    // AND the tf⋈model scoring join — so none of them re-shuffles. The
    // naive groupBy(doc, term) layout partitions by the pair and pays a
    // second full exchange to get back to term for the model/join.
    val tf = toks.repartition(col("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persistTracked()
    val model = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = model.agg(sum(col("cnt")).as("total"))
    tf.join(model, "term").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_terms"),
        // Each term's −ln p is quantized to integer nano-nats BEFORE the
        // sum, so the aggregate is exact 64-bit arithmetic — the merged
        // value is identical whatever order partial aggregates combine in
        // (a raw double Σ is partition-order-sensitive at the last ulp,
        // which can flip a 6-decimal round between runs/engines). A 1-unit
        // quantization flip shifts the average by 1e-9/n — invisible at
        // the emitted 6-decimal resolution.
        sum(col("tf") *
          round(log(col("total").cast("double") / col("cnt")) * 1e9).cast("long"))
          .as("__nll_e9"))
      .select(col("doc_id"), col("n_terms"),
        round(col("__nll_e9") / 1e9 / col("n_terms"), 6).as("avg_nll"))
  }

  /** DETERMINISTIC STRATIFIED SAMPLE — `DataFrameStatFunctions.sampleBy`
    * semantics (per-stratum fractions) but ENGINE-REPRODUCIBLE: membership
    * is `mix(rolling_hash(id)) mod 1000 < fraction·1000`, not `rand()`, so
    * the same row is kept on any engine, partitioning, or run — the
    * property a data-mix recipe needs (rerunning the pipeline must not
    * resample). Pure map-side filter: no shuffle, pushes behind whatever
    * follows. Fraction resolution is 1/1000. Requires
    * [[graft.plans.GraftFunctions.register]] (`graft_rolling_hash`).
    *
    * The raw polynomial fold does NOT avalanche on short keys (a few-digit
    * numeric id covers only a sliver of the modulus, and `mod 1000` of
    * base-31 digit polynomials is visibly banded — measured 5.7% kept at a
    * 20% target rate). Mixing is a SECOND application of the same fold,
    * over the decimal rendering of the first hash: the inner hash is
    * near-uniform in [0, 2^57), so its ~17-digit string drives the outer
    * polynomial through enough state to avalanche (measured 49.8 / 25.5 /
    * 10.5% kept at 50 / 25 / 10% targets over 10k short ids). Using ONLY
    * the fold keeps the membership rule expressible with the one hash
    * primitive every gate already shares with the oracle — no auxiliary
    * modular-mix constants an engine could evaluate differently.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit((default * 1000).round): Column) { case (acc, (k, f)) =>
        when(stratum === lit(k), lit((f * 1000).round)).otherwise(acc)
      }
    val h = rollingHashFromNormalized(id.cast("string"))
    val bucket = pmod(rollingHashFromNormalized(h.cast("string")), lit(1000L))
    df.filter(bucket < threshold)
  }

  /** GOPHER-STYLE REPETITION SIGNALS — the repetition filters pretraining
    * pipelines run before anything model-based (Rae et al. 2021 §A1.1
    * style): per document, the duplicate-token fraction, the most-frequent
    * unigram with its token fraction, and the most-frequent word bigram
    * with its CHARACTER fraction (repeated boilerplate shows up in the
    * char mass of the top n-gram long before it dominates token counts).
    *
    * Selection tie-breaks are (count DESC, gram ASC) encoded as
    * `min(struct(-count, gram))` — a partial-aggregating argmin, so the
    * chosen gram is engine-exact and no per-doc gram list ever
    * materializes. Shape at scale: one corpus scan stages tokens AND
    * bigrams in a single projection (persisted — the alternative is
    * re-running the tokenizer per branch); each branch is
    * explode → (doc, gram) count (ONE shuffle, map-side combined) →
    * per-doc argmin rollup. Docs with zero tokens produce no row (no
    * signal to report), matching the oracle's unnest semantics.
    *
    * The fraction columns emit as micro-unit BIGINTs (`*_e6` =
    * round-half-up(1e6·num/den), computed with 64-bit `div` — no double
    * ever forms), so the gated values are exact integer arithmetic on
    * both engines rather than a ROUND(double) whose tie behavior is
    * engine/version-sensitive.
    *
    * Cache contract as [[tfidfTopTerms]].
    */
  def repetitionSignals(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val d = docs.select(id.as("doc_id"), terms(text).as("__toks"))
      .withColumn("__bigrams",
        when(size(col("__toks")) < 2, array().cast("array<string>"))
          .otherwise(zip_with(
            slice(col("__toks"), lit(1), size(col("__toks")) - 1),
            slice(col("__toks"), lit(2), size(col("__toks")) - 1),
            (a, b) => concat(a, lit(" "), b))))
      .persistTracked()
    val tf = d.select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    val uni = tf.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_terms"),
      count(lit(1)).as("__n_distinct"),
      sum(col("c") * length(col("term"))).as("__term_chars"),
      min(struct((-col("c")).as("nc"), col("term").as("t"))).as("__top"))
    val topb = d.select(col("doc_id"), explode(col("__bigrams")).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        min(struct((-col("c")).as("nc"), col("gram").as("g"))).as("__topb"))
    uni.join(topb, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_terms"),
        col("__n_distinct"),
        col("__term_chars"),
        (-col("__top.nc")).as("__top_c"),
        col("__top.t").as("top_word"),
        coalesce(col("__topb.g"), lit("")).as("top_bigram"),
        coalesce(-col("__topb.nc"), lit(0L)).as("__topb_c"))
      .select(
        col("doc_id"),
        col("n_terms"),
        expr("(2 * (n_terms - __n_distinct) * 1000000 + n_terms) div (2 * n_terms)")
          .as("dup_word_frac_e6"),
        col("top_word"),
        expr("(2 * __top_c * 1000000 + n_terms) div (2 * n_terms)")
          .as("top_word_frac_e6"),
        col("top_bigram"),
        // no bigram → __topb_c = 0 → numerator is the bare half-den → 0
        expr("(2 * __topb_c * (length(top_bigram) - 1) * 1000000 + __term_chars)" +
          " div (2 * __term_chars)").as("top_bigram_char_frac_e6"))
  }

  /** BENCHMARK DECONTAMINATION — flag training documents that share any
    * word n-gram with a held-out evaluation set (the n-gram-overlap
    * protocol of GPT-2/GPT-3-era data work; n=8 is the conventional
    * window). Returns `(doc_id, n_hits)` for contaminated non-benchmark
    * docs, where n_hits counts the DISTINCT benchmark shingles the doc
    * contains.
    *
    * Shape at scale: shingles are deduped per-doc map-side
    * (`array_distinct` before the explode — never a global distinct over
    * the token stream); the benchmark side is one `distinct` shuffle over
    * the (small) eval slice; the containment test is a single equi-join
    * keyed on the shingle — AQE broadcasts the benchmark set when it fits,
    * and degrades to a hash join (never a corpus broadcast) when it
    * doesn't. The corpus is scanned once.
    */
  def decontaminationHits(docs: DataFrame, id: Column, text: Column,
      isBench: Column, n: Int = 8): DataFrame = {
    require(n >= 2, s"shingle width must be >= 2, got $n")
    val sh = docs
      .select(id.as("doc_id"), isBench.as("__is_bench"), terms(text).as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), col("__is_bench"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("__toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))).as("g"))
    val bench = sh.filter(col("__is_bench")).select(col("g")).distinct()
    sh.filter(!col("__is_bench"))
      .join(bench, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** BLOOM-ACCELERATED DECONTAMINATION — [[decontaminationHits]] semantics
    * (identical output), with a broadcast Bloom filter over the benchmark
    * shingles pruning the corpus side BEFORE the confirm join. The sketch
    * admits false positives but never false negatives, so the exact equi-
    * join over the surviving candidates returns precisely the true hits —
    * the result is sketch-independent; `fpp` only sizes the candidate set.
    *
    * Shape at scale: this is the pattern that makes decontamination viable
    * at 100 TB — the plain form shuffles EVERY corpus shingle into the
    * containment join, while here a few-MB sketch (1.2 bytes/element/
    * ln(1/fpp) — ~12 MB for 10M benchmark shingles at 1%) broadcasts once
    * and the exchange carries only true hits + fpp·|corpus shingles|. The
    * probe is a deliberate exception to the no-UDF rule: two hash calls
    * against broadcast bytes, applied map-side where no codegen fusion is
    * lost (the filter sits directly above the shingle explode). The
    * benchmark shingle set persists (tracked) because it feeds both the
    * sketch build and the confirm join.
    */
  def bloomDecontaminationHits(docs: DataFrame, id: Column, text: Column,
      isBench: Column, n: Int = 8, fpp: Double = 0.01): DataFrame = {
    require(n >= 2, s"shingle width must be >= 2, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val sh = docs
      .select(id.as("doc_id"), isBench.as("__is_bench"), terms(text).as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"), col("__is_bench"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("__toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))).as("g"))
    val bench = sh.filter(col("__is_bench")).select(col("g")).distinct()
      .persistTracked()
    val nBench = bench.count()
    val sketch = bench.stat.bloomFilter("g", math.max(nBench, 1L), fpp)
    val bcast = docs.sparkSession.sparkContext.broadcast(sketch)
    val mightContain = udf((g: String) => bcast.value.mightContainString(g))
    sh.filter(!col("__is_bench"))
      .filter(mightContain(col("g")))
      .join(bench, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** BIGRAM SURPRISAL — the conditional-bigram upgrade of
    * [[unigramSurprisal]]: per document, the mean negative log conditional
    * probability −ln P(w₂|w₁) of its bigrams under the corpus bigram model
    * (P = c(w₁w₂)/c(w₁·), counts over bigram positions). No smoothing is
    * needed: every scored bigram is in the model by construction (the
    * corpus includes the document). Gibberish scores high (unseen-ish
    * transitions), templated boilerplate scores near zero.
    *
    * Shape at scale: mirror of [[unigramSurprisal]] one level up — bigrams
    * come out of one `zip_with` projection (no positional self-join of the
    * token stream), the per-doc bigram counts `(doc, gram, w1, tf)` frame
    * is persisted and feeds BOTH model rollups and the scoring join, and
    * the token-level sum is recovered exactly as Σ tf·ln(c₁/c₁₂). Joins
    * are keyed on gram/w1 — AQE broadcasts small vocabularies. Docs with
    * fewer than 2 tokens have no bigrams and produce no row. Cache
    * contract as [[tfidfTopTerms]].
    */
  def bigramSurprisal(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // the bigram keys on (w1, w2) — a concat'd "w1 w2" gram string would
    // carry w1 through every exchange twice
    val bg = docs.select(id.as("doc_id"), terms(text).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // ONE exchange keyed on the model key (w1, w2): it satisfies the
    // clustered distribution of the per-doc tf aggregate, the c12 rollup,
    // and the bf⋈m12 join — none re-shuffles (same layout rationale as
    // [[unigramSurprisal]]). c1 then rolls up from m12 (Σ_w2 c12 ≡ Σ tf,
    // exact integers), a frame one aggregation SMALLER than bf — and the
    // w1-keyed model is the only remaining pre-scoring exchange.
    val bf = bg.repartition(col("w1"), col("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      .persistTracked()
    val m12 = bf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
    val m1 = m12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    bf.join(m12, Seq("w1", "w2")).join(m1, "w1")
      .groupBy(col("doc_id"))
      // integer nano-nat quantization before the sum — order-insensitive
      // exact aggregation, same rationale as [[unigramSurprisal]]
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") *
          round(log(col("c1").cast("double") / col("c12")) * 1e9).cast("long"))
          .as("__nll_e9"))
      // micro-nat BIGINT emission: avg_nll_e6 = round-half-up of
      // __nll_e9 / (1000·n) in pure 64-bit arithmetic — the mean reaches
      // the gate without any double division or engine ROUND in the loop
      .select(col("doc_id"), col("n_bigrams"),
        expr("(2 * __nll_e9 + 1000 * n_bigrams) div (2000 * n_bigrams)")
          .as("avg_nll_e6"))
  }

  /** UNIGRAM DISTRIBUTION DRIFT between two corpus slices — the monitoring
    * pass run between corpus snapshots / data mixes: add-one-smoothed
    * per-term KL contributions (both directions) over the union
    * vocabulary, from which KL(A‖B), KL(B‖A) and JSD are plain sums.
    * Per-term output (not just the scalar) so the gate pins every term's
    * probability mass and the report doubles as a "what drifted" list.
    *
    * Shape at scale: one corpus scan, one shuffle keyed on term (the
    * conditional counts partial-aggregate map-side into a single rollup —
    * never one pass per slice), totals ride a broadcast one-row frame.
    */
  def unigramDrift(docs: DataFrame, text: Column, inA: Column): DataFrame = {
    val tf = docs.select(inA.as("__is_a"), explode(terms(text)).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("__is_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("__is_a"), 1L).otherwise(0L)).as("c_b"))
    val tot = tf.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("v"))
    val pa = (col("c_a") + 1.0) / (col("n_a") + col("v"))
    val pb = (col("c_b") + 1.0) / (col("n_b") + col("v"))
    tf.crossJoin(broadcast(tot))
      .select(col("term"), col("c_a"), col("c_b"),
        round(pa * log(pa / pb), 9).as("kl_term_ab"),
        round(pb * log(pb / pa), 9).as("kl_term_ba"))
  }

  /** SEQUENCE PACKING — assign documents to fixed-token-budget training
    * sequences (the packing step every pretraining dataloader runs:
    * concatenate docs until the next one would overflow `maxLen`, then
    * start a new sequence). Greedy next-fit in doc-id order; a document
    * longer than `maxLen` gets a bin of its own.
    *
    * Packing is inherently SEQUENTIAL (each bin decision depends on the
    * running fill), so it cannot be a window prefix-sum. The distributed
    * form shards the corpus (`id mod shards`) and packs each shard
    * independently — exactly how a multi-worker dataloader shards — via
    * the secondary-sort pattern: repartition on the shard key,
    * `sortWithinPartitions(shard, id)`, then ONE streaming pass per
    * partition that resets its fill state at shard boundaries. This is
    * the (d)-tier `mapPartitions` escape hatch of SURVEY §7.1, used here
    * because the semantics are genuinely order-carrying; state per
    * partition is three longs, nothing buffers. The result is independent
    * of partition count and input partitioning: a shard's rows are always
    * contiguous and id-sorted when walked.
    *
    * Returns `(doc_id, shard, seq_idx, n_tokens)`, seq_idx 1-based per
    * shard.
    */
  def packSequences(docs: DataFrame, id: Column, nTokens: Column,
      maxLen: Int, shards: Int): DataFrame = {
    require(maxLen > 0 && shards > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(id.cast("long").as("doc_id"),
        pmod(id.cast("long"), lit(shards.toLong)).as("shard"),
        nTokens.cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var fill = 0L
        var seq = 0L
        it.map { case (docId, shard, n) =>
          if (shard != curShard) { curShard = shard; seq = 1L; fill = n }
          else if (fill + n > maxLen) { seq += 1L; fill = n }
          else fill += n
          (docId, shard, seq, n)
        }
      }
      .toDF("doc_id", "shard", "seq_idx", "n_tokens")
  }

  /** TOKEN-WINDOW CHUNKING — split each document into fixed-size token
    * windows with overlap stride (the context-window preparation step of
    * every pretraining / RAG pipeline: HuggingFace
    * `return_overflowing_tokens` semantics). Window k covers tokens
    * `[k·stride, k·stride + chunkLen)`; windows start while `k·stride < n`,
    * so every token lands in ≥1 chunk and trailing chunks may be short.
    *
    * Returns `(doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_text,
    * chunk_hash)` — chunk_idx/chunk_start 0-based, chunk_hash the rolling
    * polynomial fingerprint of the chunk text (the chunk-granularity dedup
    * key: identical windows collide exactly, cross-engine reproducible).
    *
    * Shape at scale: pure map-side column algebra — one `transform` over a
    * `sequence` of window indices, exploded in place; NO shuffle, no UDF,
    * the whole derivation stays inside WholeStageCodegen at scan speed.
    * Downstream chunk-keyed aggregations shuffle the (already much
    * smaller) chunk rows, never the corpus. Registers the graft functions
    * (codegen rolling hash) on the session.
    */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
      chunkLen: Int = 128, stride: Int = 64): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    require(stride > 0 && stride <= chunkLen,
      s"stride must be in [1, chunkLen], got $stride")
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs.select(id.as("doc_id"), terms(text).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("__n"),
        explode(expr(
          s"transform(sequence(0L, (__n - 1) div $stride), k -> struct(" +
            s"k AS chunk_idx, k * $stride AS chunk_start, " +
            s"concat_ws(' ', slice(__toks, CAST(k * $stride + 1 AS INT), $chunkLen))" +
            " AS chunk_text))")).as("c"))
      .select(col("doc_id"),
        col("c.chunk_idx").as("chunk_idx"),
        col("c.chunk_start").as("chunk_start"),
        least(lit(chunkLen.toLong), col("__n") - col("c.chunk_start"))
          .as("n_chunk_tokens"),
        col("c.chunk_text"),
        call_function("graft_rolling_hash", col("c.chunk_text")).as("chunk_hash"))
  }

  /** Per-document text-analysis projection over a documents table. Staged
    * through intermediate columns so each tokenization runs once per row
    * (the naive single-projection form re-extracts tokens per metric). */
  def analyze(docs: DataFrame, id: Column, text: Column): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession) // graft_rolling_hash
    val staged = docs
      .select(id.as("doc_id"), text.as("__text"))
      .withColumn("__t", regexp_extract_all(col("__text"), lit("\\S+"), lit(0)))
      // lowercased tokens derive from __t (lowercasing never introduces
      // whitespace, so token boundaries are identical) — ONE regex scan of
      // each document instead of two; the second regexp_extract_all over
      // lower(text) measured 2.6× on the whole analyze pass at sf0.1
      .withColumn("__tl", transform(col("__t"), t => lower(t)))
      .withColumn("__np", punctCount(col("__text")))
      .withColumn("__norm", normalizeText(col("__text")))
      .withColumn("__sr",
        when(size(col("__tl")) === 0, lit(0.0))
          .otherwise(size(filter(col("__tl"), t => t.isInCollection(StopWords)))
            .cast("double") / size(col("__tl"))))
    val nTok = size(col("__t")).cast("long")
    val punctRatio = when(length(col("__text")) === 0, lit(0.0))
      .otherwise(col("__np").cast("double") / length(col("__text")))
    val quality =
      least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.3 +
        least(col("__sr") * 4.0, lit(1.0)) * 0.3
    withLangId(staged, col("__text"))
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        bpeishTokenCount(col("__text")).as("n_bpeish_tokens"),
        col("__np").as("n_punct"),
        round(when(size(col("__t")) === 0, lit(0.0))
          .otherwise(aggregate(col("__t"), lit(0L), (acc, t) => acc + length(t))
            .cast("double") / size(col("__t"))), 6).as("mean_token_len"),
        round(col("__sr"), 6).as("stopword_ratio"),
        round(quality, 6).as("quality"),
        fingerprintFromNormalized(col("__norm")).as("fp"),
        rollingHashFromNormalized(col("__norm")).as("rolling_fp"),
        col("lang_pred"))
  }

  // ------------------------------------------------------------ C4 filters
  /** C4-STYLE HEURISTIC DROP RULES (per doc, pure column algebra — runs
    * map-side at scan speed): each rule a named boolean, plus the composite
    * `keep`. The classic pretraining-corpus cleanup pass
    * (C4: Raffel et al. 2020 §2.2; rules re-expressed per document since
    * our docs are single-line):
    *   - `too_short`      — fewer than `minWords` whitespace words
    *   - `no_terminal_punct` — doc does not end in . ! ? or closing quote
    *   - `has_lorem`      — placeholder text survived scraping
    *   - `has_curly`      — `{` (code/templating leak into prose corpora)
    *   - `too_long_words` — mean word length > 10 (minified/hash soup)
    * Rules are INDEPENDENT columns so a curation pipeline can report
    * per-rule drop rates (the dq_checks shape) before enforcing `keep`.
    */
  def c4Filters(docs: DataFrame, id: Column, text: Column,
      minWords: Int = 5): DataFrame = {
    val staged = docs.select(id.as("doc_id"), text.as("__text"))
      .withColumn("__t", regexp_extract_all(col("__text"), lit("\\S+"), lit(0)))
    val nTok = size(col("__t")).cast("long")
    val meanLen = when(nTok === 0, lit(0.0))
      .otherwise(aggregate(col("__t"), lit(0L), (acc, t) => acc + length(t))
        .cast("double") / nTok)
    staged.select(
      col("doc_id"),
      (nTok < minWords).as("too_short"),
      (!trim(col("__text")).rlike("[.!?][\"')\\]]*$")).as("no_terminal_punct"),
      lower(col("__text")).contains("lorem ipsum").as("has_lorem"),
      col("__text").contains("{").as("has_curly"),
      (meanLen > 10.0).as("too_long_words"))
      .withColumn("keep",
        !col("too_short") && !col("no_terminal_punct") && !col("has_lorem") &&
          !col("has_curly") && !col("too_long_words"))
  }

  // ------------------------------------------------------------ PII
  /** Redaction patterns — intersection of java.util.regex and RE2 syntax
    * (character classes, bounded repeats, `\b`; no lookarounds or
    * backrefs) so the DuckDB oracle runs the LITERAL same patterns. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"
  val Ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII REDACTION for training corpora: replace emails / phone numbers /
    * IPv4 addresses with typed placeholders. Order matters — emails first
    * (an email must not first lose its user-part digits to the phone
    * pass), then phones, then IPs (IP last so `1.2.3.4` inside an already-
    * redacted token cannot double-fire). Map-side scan-speed column
    * algebra; pair with [[piiCounts]] to report redaction volumes.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    regexp_replace(p, Ipv4Pattern, "<IP>")
  }

  /** Per-category PII match counts (pre-redaction), for audit reports. */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long"))

  // ------------------------------------------------------------ scripts
  /** UNICODE SCRIPT PROFILE — per-script character counts and the dominant
    * script, the routing signal multilingual corpus pipelines branch on
    * (which tokenizer, which language-ID model, CJK vs whitespace
    * segmentation). Pure map-side column algebra via `\p{script}` classes;
    * java.util.regex spells them `\p{IsHan}`, RE2 (the DuckDB oracle)
    * `\p{Han}` — different spelling, same Unicode script property, so the
    * gate compares like for like. Kana counts Hiragana+Katakana together
    * (they interleave in Japanese text).
    */
  val ScriptPatterns: Seq[(String, String)] = Seq(
    "latin" -> "\\p{IsLatin}",
    "han" -> "\\p{IsHan}",
    "kana" -> "\\p{IsHiragana}|\\p{IsKatakana}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "thai" -> "\\p{IsThai}")

  /** Adds `n_<script>` counts plus `dominant_script` (max count; ties
    * resolve in [[ScriptPatterns]] order; all-zero → 'none'). */
  def withScriptProfile(docs: DataFrame, text: Column): DataFrame = {
    val counted = ScriptPatterns.foldLeft(docs) { case (d, (name, pat)) =>
      d.withColumn(s"n_$name",
        size(regexp_extract_all(text, lit(pat), lit(0))).cast("long"))
    }
    val mx = greatest(ScriptPatterns.map { case (n, _) => col(s"n_$n") }: _*)
    val dominant = ScriptPatterns.foldRight(lit("none"): Column) {
      case ((name, _), els) => when(col(s"n_$name") === mx, lit(name)).otherwise(els)
    }
    counted.withColumn("dominant_script",
      when(mx === 0, lit("none")).otherwise(dominant))
  }

  // ------------------------------------------------------------ BM25
  /** BM25 RANKED RETRIEVAL over the corpus for a fixed query-term set —
    * the scoring the inverted-index query serves, end to end (Robertson's
    * idf with Lucene's +1 floor: `ln((N − df + ½)/(df + ½) + 1)`).
    *
    * Shape at scale: ONE tokenization of the corpus, persisted staged
    * (`(doc_id, dl, tokens)`) because two consumers need it — the tiny
    * `(N, avgdl)` all-reduce and the tf aggregation (for a corpus where
    * caching tokens is too big, precompute `dl` as a stored column and
    * this becomes single-pass). The query-term filter runs map-side ON
    * THE EXPLODE OUTPUT (before any shuffle), so the tf aggregate only
    * ever sees |queryTerms| terms per doc; df and corpus stats are
    * broadcast to the scoring join; final top-k is
    * TakeOrderedAndProject, never a global sort.
    *
    * Per-term contributions are QUANTIZED to integer micro-units before
    * the per-doc sum, so the merged score is exact 64-bit arithmetic —
    * partition-order-proof (the a77c610 surprisal pattern) — and the
    * emitted `bm25_micro` BIGINT never exposes a float to the gate.
    */
  def bm25TopDocs(docs: DataFrame, id: Column, text: Column,
      queryTerms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(id.as("doc_id"), terms(text).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"), col("__t"))
      .persistTracked()
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__t")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1.0))
      .withColumn("__contrib_micro",
        round(col("__idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
          * 1e6).cast("long"))
      .groupBy(col("doc_id")).agg(sum(col("__contrib_micro")).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(k)
  }

  // ------------------------------------------------------------ Zipf fit
  /** ZIPF-LAW FIT over the corpus vocabulary: least-squares slope of
    * `ln(count)` on `ln(rank)` for the top-N tokens — the standard corpus
    * health check (natural language sits near slope −1; machine-generated
    * or template-heavy corpora deviate sharply, so the slope is a cheap
    * corpus-level quality gate).
    *
    * Shape at scale: ONE tokenization + one `(term)`-keyed partial-
    * aggregated count (the vocabulary aggregate every corpus profile
    * already runs), then `TakeOrderedAndProject` brings exactly topN rows
    * through the ordering — never a global sort of the vocabulary. The
    * regression itself runs over those ≤ topN rows: the `row_number`
    * window is k-BOUNDED (post-limit), which is the one place a window
    * rank is acceptable.
    *
    * Determinism contract (the a77c610 pattern): `ln` terms are quantized
    * to integer MICRO-nats per row, the regression sums (Σx, Σy, Σxy, Σx²)
    * are exact 64-bit integers (lx ≤ ln(topN)·1e6 ≈ 7e6 → lx² ≤ 5e13,
    * ×topN = 5e16 < 2^63), and the closed-form slope/intercept are then
    * IEEE double expressions over those identical integers — so both
    * engines compute bit-equal doubles and the 6-decimal round can never
    * flip. Partition merge order cannot matter: integer addition is
    * associative.
    */
  def zipfFit(docs: DataFrame, text: Column, topN: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = docs
      .select(explode(regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(topN)
    val ranked = top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
      .select(
        round(log(col("rank").cast("double")) * 1e6).cast("long").as("lx"),
        round(log(col("cnt").cast("double")) * 1e6).cast("long").as("ly"))
    val s = ranked.agg(
      count(lit(1)).as("n_terms"),
      sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
      sum(col("lx") * col("ly")).as("sxy"), sum(col("lx") * col("lx")).as("sxx"))
    // Closed-form OLS on the exact integer sums; every double op below is
    // IEEE-specified, so identical integer inputs give identical doubles.
    val n = col("n_terms").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double"); val sxx = col("sxx").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    s.select(
      col("n_terms"), col("sx"), col("sy"),
      round(slope, 6).as("zipf_slope"),
      round((sy / 1e6 - slope * (sx / 1e6)) / n, 6).as("zipf_intercept_ln"))
  }

  // ------------------------------------------------------------ Data mixing
  /** TEMPERATURE-SCALED MIXTURE WEIGHTS per source — the data-mixing step
    * of multilingual / multi-source training pipelines (sample source s
    * with probability ∝ tokens_s^α, α < 1 upweights small sources;
    * Conneau & Lample's exponentiated-count sampling). α is fixed at ½
    * deliberately: `sqrt` is EXACTLY rounded under IEEE 754 on every
    * engine, so the quantized weight is reproducible bit-for-bit, where a
    * general `pow(x, 0.3)` is only faithfully rounded and could flip a
    * 1-ulp boundary between libm implementations.
    *
    * Shape at scale: one scan → per-source token totals (map-side
    * combined, |sources| rows out), then the normalization constant is a
    * SUM over that bounded per-source frame — quantized to integer
    * micro-units first so the total is exact whatever the merge order.
    */
  def mixtureWeights(docs: DataFrame, source: Column, text: Column): DataFrame = {
    val perSource = docs
      .groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long"))
          .as("total_tokens"))
      .withColumn("w_micro",
        round(sqrt(col("total_tokens").cast("double")) * 1e6).cast("long"))
    val total = perSource.agg(sum(col("w_micro")).as("w_total_micro"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("w_micro"),
        round(col("w_micro").cast("double") / col("w_total_micro").cast("double"), 6)
          .as("mix_weight"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------ Readability
  /** FLESCH-STYLE READABILITY per document — the classic reading-ease
    * heuristic as a scan-speed quality signal: `206.835 − 1.015·(W/S)
    * − 84.6·(Y/W)` with W = alphabetic words, S = sentence-terminator runs
    * (floored at 1 when words exist), Y = vowel-group count (the standard
    * syllable proxy; a vowel-less token like "tv" contributes 0 — the
    * documented approximation, identical on both engines).
    *
    * All three counts are exact integers from single regex passes; the
    * formula is one fixed IEEE double expression — engine-exact.
    */
  def readability(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        size(regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))).cast("long")
          .as("n_words"),
        size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long")
          .as("n_sentence_marks"),
        size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))).cast("long")
          .as("n_vowel_groups"))
      .withColumn("flesch",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(round(
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double")
                / greatest(col("n_sentence_marks"), lit(1L)).cast("double"))
              - lit(84.6) * (col("n_vowel_groups").cast("double")
                / col("n_words").cast("double")), 6)))

  /** CHARACTER-DISTRIBUTION ENTROPY per document — the gibberish /
    * compression-proxy signal (natural English sits near 2.6–3.0 nats over
    * [a-z0-9]; key-mash and base64 blobs run higher, template spam lower).
    * One regex pass extracts the alphanumeric char stream; the entropy
    * folds over the SORTED distinct-char list so both engines evaluate
    * the identical IEEE term sequence. Map-side only.
    */
  def charEntropy(docs: DataFrame, id: Column, text: Column): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    // ONE byte walk per document builds the 36-bucket [0-9a-z] histogram
    // (codegen expression [[graft.plans.CharCounts36]]); everything after
    // is O(36) column algebra. The histogram indexes in SORTED character
    // order (digits before letters — exactly `array_sort`'s order on the
    // char list), so the entropy fold visits counts in the identical
    // sequence the per-character formulation did: same IEEE addition
    // order, value bit-identical to the oracle's sorted-distinct fold.
    // (The previous per-char HoF fold was 2.7 s at sf0.1; the naive
    // per-distinct filter scan before it, 8.9 s.)
    def term(run: Column, n: Column): Column = {
      val p = run.cast("double") / n.cast("double")
      -p * log(p)
    }
    docs.select(id.as("doc_id"),
        call_function("graft_char_counts", lower(text)).as("__c"))
      .select(col("doc_id"),
        aggregate(col("__c"), lit(0L), (acc, k) => acc + k).as("n_chars"),
        size(filter(col("__c"), k => k > 0)).cast("long").as("n_distinct"),
        col("__c"))
      .withColumn("char_entropy",
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(round(aggregate(
            filter(col("__c"), k => k > 0), lit(0.0),
            (acc, k) => acc + term(k, col("n_chars"))), 6)))
      .drop("__c")
  }

  // ------------------------------------------------------------ Entropy
  /** LANGUAGE-VOTE ENTROPY per document — the code-switching / mixed-
    * language signal: entropy over the per-language stopword-profile vote
    * distribution. A clean monolingual page concentrates its votes (H≈0);
    * machine-translated mashups, boilerplate chrome in one language
    * wrapping content in another, and crawl glue pages spread them.
    * Purely map-side column algebra (one tokenization, |langs| filtered
    * counts per row) — scan speed, no exchange before a gate's sort.
    *
    * Determinism: votes are exact integers; the entropy expression sums
    * its per-language terms in FIXED (sorted-language) order, so both
    * engines evaluate the identical IEEE expression tree.
    */
  def langEntropy(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val langs = LangProfiles.keys.toSeq.sorted
    val voted = LangProfiles.toSeq.sortBy(_._1).foldLeft(
      docs.select(id.as("doc_id"),
        regexp_extract_all(lower(text), lit("[a-z]+"), lit(0)).as("__t"))) {
      case (d, (lang, words)) =>
        d.withColumn(s"v_$lang",
          size(filter(col("__t"), t => t.isInCollection(words))).cast("long"))
    }
    val vt = langs.map(l => col(s"v_$l")).reduce(_ + _)
    val entropy = langs.map { l =>
      val p = col(s"v_$l").cast("double") / col("n_votes").cast("double")
      when(col(s"v_$l") > 0, -p * log(p)).otherwise(lit(0.0))
    }.reduce(_ + _)
    voted
      .withColumn("n_votes", vt)
      .withColumn("n_langs",
        langs.map(l => when(col(s"v_$l") > 0, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("lang_entropy",
        when(col("n_votes") === 0, lit(0.0)).otherwise(round(entropy, 6)))
      .withColumn("dominant_frac",
        when(col("n_votes") === 0, lit(0.0))
          .otherwise(round(greatest(langs.map(l => col(s"v_$l")): _*).cast("double")
            / col("n_votes").cast("double"), 6)))
      .select(col("doc_id"), col("n_votes"), col("n_langs"),
        col("lang_entropy"), col("dominant_frac"))
  }

  /** The language-profile word lists in gate-stable sorted order — exposed
    * so oracle SQL can inline the LITERAL same lists. */
  def langProfileList: Seq[(String, Seq[String])] = LangProfiles.toSeq.sortBy(_._1)

  // ------------------------------------------------------------ Classifier
  /** HASHED LINEAR QUALITY CLASSIFIER — fastText-style model inference at
    * scan speed: each token hashes into a `dims`-bucket feature space
    * (hashing trick, Weinberger 2009), the bucket's weight is looked up,
    * and the document score is the mean weight. Here the weight table is
    * a deterministic pseudo-random projection (Knuth multiplicative hash
    * of the bucket index, centered) — the Spark-side PLUMBING (map-side
    * fold, integer weights, zero exchanges) is exactly what a trained
    * weight vector would use; swapping in learned weights is a broadcast
    * lookup with the same shape.
    *
    * Determinism contract: weights are INTEGERS in units of 1/1,000,003
    * (wq ∈ [−501001, 501001]), the per-doc sum folds in array order as
    * exact 64-bit arithmetic (|sum| ≤ n_toks·5e5 — a 3×10¹² token doc
    * would be needed to overflow), and the emitted score divides the two
    * integers in one IEEE double op. No float ever enters an
    * order-sensitive aggregate.
    *
    * Scale: purely map-side per document (tokenize → fold); the only
    * exchange in a gated query is its final ORDER BY. Requires
    * `graft_rolling_hash` registered ([[graft.plans.GraftFunctions]]).
    */
  def hashedLinearScore(docs: DataFrame, id: Column, text: Column,
      dims: Int = 4096): DataFrame = {
    val toks = regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))
    docs
      .select(id.as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("n_toks"),
        aggregate(col("__t"), lit(0L), (acc, t) =>
          acc + ((pmod(call_function("graft_rolling_hash", t), lit(dims.toLong))
            * lit(2654435761L)) % lit(1000003L) - lit(501001L))).as("sum_wq"))
      .withColumn("score",
        when(col("n_toks") === 0, lit(0.0))
          .otherwise(round(col("sum_wq").cast("double")
            / (lit(1000003.0) * col("n_toks").cast("double")), 6)))
      .withColumn("keep", col("n_toks") > 0 && col("sum_wq") > 0)
  }
}
