package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.Tables
import graft.util.OperatorCaches

/** Text-analysis operators over `documents`: quality stats, heuristic
  * language ID, regex tokenization, and content fingerprinting — all
  * narrow projections (per-row, no shuffle), which is exactly what keeps
  * them viable as a map stage over 100 TB of text.
  */
object TextAnalysis {

  private val stopSql = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-document scan via [[graft.queries.Tables.documentsParallel]]
    * (conditional local parallelism, no-op at scale). */
  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsParallel(spark, sfDir)

  /** Per-document quality statistics: token counts, uniqueness, average
    * token length, stopword ratio — the standard quality-filter features. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        length(col("text")).cast("long").as("n_chars_actual"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq_tokens"),
        (expr("aggregate(toks, 0L, (acc, w) -> acc + length(w))")
          .cast("double") / size(col("toks")).cast("double"))
          .as("avg_token_len"),
        (expr(s"size(filter(toks, w -> w in ($stopSql)))").cast("double") /
          size(col("toks")).cast("double")).as("stopword_ratio"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("uniq_ratio"))
      .orderBy("doc_id")

  /** Heuristic language ID: marker-word hit counts per language with a
    * fixed priority order on ties (deterministic, SQL-expressible — the
    * point is the operator shape: a scored CASE over token-set membership,
    * evaluable as one map stage). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val markers = Seq(
      "en" -> Seq("the", "is", "and", "of"),
      "de" -> Seq("der", "die", "das", "und"),
      "es" -> Seq("el", "la", "los", "y"),
      "fr" -> Seq("le", "les", "et", "un"))
    val scoreCols = markers.map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(toks, w -> w in ($lst)))").cast("long")
        .as(s"score_$l")
    }
    val pred =
      when(col("score_en") >= col("score_de") &&
           col("score_en") >= col("score_es") &&
           col("score_en") >= col("score_fr"), "en")
      .when(col("score_de") >= col("score_es") &&
            col("score_de") >= col("score_fr"), "de")
      .when(col("score_es") >= col("score_fr"), "es")
      .otherwise("fr")
    docs(spark, sfDir)
      .withColumn("toks", tokens(col("text")))
      .select(Seq(col("doc_id"), col("lang")) ++ scoreCols: _*)
      .withColumn("pred_lang", pred)
      .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
      .orderBy("doc_id")
  }

  /** Regex ("BPE-ish") tokenization stats: alpha runs, digit runs, long
    * tokens — the token-counting pass of a data pipeline. */
  def tokenRegex(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("rtoks",
        regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
      .select(
        col("doc_id"),
        size(col("rtoks")).cast("long").as("n_regex_tokens"),
        size(array_distinct(col("rtoks"))).cast("long").as("n_uniq_regex"),
        expr("size(filter(rtoks, t -> length(t) > 5))").cast("long")
          .as("n_long_tokens"),
        expr("aggregate(transform(rtoks, t -> length(t)), 0L, (a, x) -> a + x)")
          .as("total_token_chars"))
      .orderBy("doc_id")

  /** x25: Gopher-style repetition statistics — the standard quality
    * signal for machine-generated/boilerplate text: the fraction of
    * word 2-/3-grams that are duplicates within the document, and the
    * most-frequent-token share. N-gram lists keep MULTIPLICITY (an
    * `array_distinct` would hide exactly the repetition being measured).
    *
    * Shape for scale: the n-gram legs are narrow per-row projections;
    * the top-token leg is explode → two partial-aggregated groupBys on
    * (doc_id, w) then (doc_id) — the shuffle key is the doc, so a
    * billion-doc corpus spreads evenly (token skew inside one doc stays
    * inside one group and is bounded by document length). */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionFrom(docs(spark, sfDir))

  /** [[repetition]] over an arbitrary (doc_id, text) relation. */
  private[graft] def repetitionFrom(docsDf: DataFrame): DataFrame = {
    val d = docsDf.withColumn("toks", tokens(col("text")))
    // The n-gram projection persists BEFORE its consumers for the same
    // reason as Dedup's shingle table: the builders are interpreted HOFs
    // and project-collapse would otherwise inline each into both its
    // size() and its array_distinct() consumer — double evaluation per
    // document per n.
    val gramTable = graft.util.OperatorCaches.persist(
      d.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        ngramsFromTokens(col("toks"), 2).as("g2"),
        ngramsFromTokens(col("toks"), 3).as("g3")))
    val base = gramTable
      .select(col("doc_id"), col("n_tokens"),
        size(col("g2")).cast("long").as("n_2grams"),
        size(array_distinct(col("g2"))).cast("long").as("uniq_2grams"),
        size(col("g3")).cast("long").as("n_3grams"),
        size(array_distinct(col("g3"))).cast("long").as("uniq_3grams"))
    val top = d.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_c"))
    def dupFrac(n: Column, uniq: Column) =
      when(n === 0, 0.0)
        .otherwise((n - uniq).cast("double") / n.cast("double"))
    base.join(top, "doc_id")
      .withColumn("dup_2gram_frac", dupFrac(col("n_2grams"), col("uniq_2grams")))
      .withColumn("dup_3gram_frac", dupFrac(col("n_3grams"), col("uniq_3grams")))
      .withColumn("top_token_frac",
        col("top_c").cast("double") / col("n_tokens").cast("double"))
      .withColumn("keep",
        col("dup_2gram_frac") < 0.20 && col("dup_3gram_frac") < 0.15 &&
          col("top_token_frac") < 0.20)
      .select(col("doc_id"), col("n_tokens"), col("n_2grams"),
        col("uniq_2grams"), col("dup_2gram_frac"), col("n_3grams"),
        col("uniq_3grams"), col("dup_3gram_frac"),
        col("top_c").as("top_token_count"), col("top_token_frac"),
        col("keep"))
      .orderBy("doc_id")
  }

  /** Content fingerprints: rolling polynomial hash of the raw and the
    * whitespace-normalized text, plus the first MinHash — three sharding/
    * dedup keys.
    *
    * The MinHash leg is the one-pass [[graft.expressions.MinHashSig]]
    * projection (seed 0 only) — value-identical to the per-row
    * `array_min(transform(sh, md5))` HOF and to the explode →
    * `min(md5)` groupBy it previously ran, but with no explode and no
    * aggregation exchange at all: the whole operator is ONE narrow
    * projection over the scan. A shingle-less doc gets a null signature
    * array, whose element access is null — exactly the null fingerprint
    * the old left-join gave. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    d.select(
        col("doc_id"),
        polyHash(col("text")).as("fp"),
        polyHash(concat_ws(" ", split(col("text"), " +"))).as("fp_norm"),
        minhashSig(shingles(col("text")), 1)(0).as("fp_minhash"))
      .orderBy("doc_id")
  }

  /** Terms kept per document by [[tfidfTerms]]. */
  val TfidfTopK = 5

  /** Fixed-point scale for [[tfidfTerms]]' idf: the only transcendental
    * in the battery is `ln(N/df)`, whose last 1-2 ulps are engine-specific
    * (Java's `Math.log` intrinsic vs the oracle's libm); quantizing to
    * 1e-6 with the engine-portable `floor(x*1e6 + 0.5)` (the same move as
    * x27/x33) makes every downstream value integer-exact. */
  val IdfScale = 1000000L

  /** x35: TF-IDF top-term extraction — the standard relevance/keyword
    * signal a data pipeline derives per document (domain tagging, topic
    * bucketing, relevance-weighted sampling all start here): for each
    * doc, the [[TfidfTopK]] terms ranked by tf·idf with idf = ln(N/df).
    *
    * Scale shape, in order:
    *  - (doc, term) term frequencies: ONE corpus-sized partial-aggregated
    *    groupBy whose shuffle key is (doc_id, term) — a hot term spreads
    *    over all docs that contain it, so there is no skewed reduce key;
    *  - document frequencies derive from the tf relation (vocab-sized
    *    output) and join back ON THE TERM unhinted — vocabulary size is
    *    corpus-dependent, so only AQE may choose broadcast;
    *  - N is a 1-row aggregate broadcast back (the legitimate hint);
    *  - the top-k rank window partitions BY DOC — its group is bounded by
    *    per-document vocabulary (≤ doc length), never corpus-sized.
    *
    * Ranking compares the scaled-INTEGER score (tf · idf_scaled) with the
    * term as tiebreak, so result order is deterministic and the oracle
    * compare is exact; the exposed `tfidf` double is derived from the
    * same integers by one correctly-rounded division. The tf relation is
    * persisted: both the df aggregation and the final join read it, and
    * without the barrier the explode+groupBy would run once per consumer
    * (same judgment as Dedup's signature tables).
    *
    * Cross-engine exactness caveat (applies to x43's log-prob scaling
    * too): `floor(ln(x)·1e6 + 0.5)` is integer-exact only if Java's
    * `Math.log` and the oracle's libm `ln` agree to the last ulp at every
    * evaluated point. Both are correctly-rounded in practice for these
    * inputs, but the guarantee is probabilistic — an ln value landing
    * within an ulp of a `.5` quantization boundary could floor
    * differently and flip a rank. If a new corpus ever trips this, the
    * correct response is a ±1 tolerance on the scaled integer (or a
    * rows-only gate), not a code change here. */
  def tfidfTerms(spark: SparkSession, sfDir: String): DataFrame =
    tfidfTermsFrom(docs(spark, sfDir))

  /** [[tfidfTerms]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures with planted rare terms check the ranking). */
  private[graft] def tfidfTermsFrom(docsDf: DataFrame): DataFrame = {
    val d = docsDf.filter(col("text").isNotNull)
    val tf = OperatorCaches.persist(
      d.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfT, "term")
      .join(broadcast(nDocs))
      .withColumn("idf_scaled",
        floor(log(col("n_docs").cast("double") / col("df").cast("double"))
          * IdfScale + lit(0.5)))
      .withColumn("tfidf_scaled", col("tf") * col("idf_scaled"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf_scaled").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TfidfTopK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tfidf_scaled").cast("double") / IdfScale).as("tfidf"),
        col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** Minimum corpus frequency for a term to enter [[vocabBuild]]'s
    * vocabulary (absolute here; production sets it per-corpus). */
  val VocabMinCount = 30L

  /** x37: frequency-ranked VOCABULARY build — the id-assignment pass at
    * the front of every tokenizer/embedding pipeline: corpus term counts,
    * document frequencies, a min-count cut, dense ids by descending
    * frequency, and the running coverage fraction (what share of all
    * token occurrences the vocabulary up to this id explains — the
    * number that picks the vocab size).
    *
    * Scale shape: term stats are one partial-aggregated groupBy on the
    * term (the distinct doc count is Spark's standard two-phase distinct
    * aggregate — partials dedupe map-side). The id/coverage windows are
    * GLOBAL but run over the post-aggregation VOCABULARY relation —
    * bounded by distinct-term count (~10^6-10^7 real-world), not corpus
    * size: the same bounded-small-side judgment as broadcasting a
    * dimension table, and the reason this is fine while a corpus-keyed
    * global window never is. Coverage divides exact integer running sums,
    * so the doubles are bit-identical across engines.
    *
    * The grand total (coverage's denominator, over ALL terms including
    * the min-count casualties) derives from the vocab-sized `stats`
    * relation, NOT a second corpus pass — Σ total_count is the token
    * count. `stats` is persisted: it feeds both that 1-row aggregate and
    * the windowed output, and the corpus explode+groupBy would otherwise
    * run once per consumer. */
  def vocabBuild(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = docs(spark, sfDir).filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val stats = OperatorCaches.persist(ex.groupBy("term").agg(
      count(lit(1)).as("total_count"),
      count_distinct(col("doc_id")).as("doc_freq")))
    val grand = stats.agg(sum(col("total_count")).as("grand_total"))
    val idW = Window.orderBy(col("total_count").desc, col("term").asc)
    val covW = idW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stats.filter(col("total_count") >= VocabMinCount)
      .join(broadcast(grand))
      .withColumn("vocab_id", row_number().over(idW).cast("long"))
      .withColumn("cum_count", sum(col("total_count")).over(covW))
      .withColumn("coverage",
        col("cum_count").cast("double") / col("grand_total").cast("double"))
      .select("term", "total_count", "doc_freq", "vocab_id", "cum_count",
        "coverage")
      .orderBy("vocab_id")
  }

  /** OOV id for [[encodeDocs]] — tokens cut from the vocabulary by
    * [[VocabMinCount]] encode as this (the `<unk>` convention). */
  val OovId = 0L

  /** x39: tokenizer APPLICATION — encode every document as its sequence
    * of [[vocabBuild]] ids (OOV → [[OovId]]), the pass that turns a
    * curated text corpus into the integer rows a trainer consumes, plus
    * the per-doc OOV rate the vocab-size decision reads.
    *
    * Scale shape: tokens explode to (doc, pos, term) — corpus-sized but
    * map-only — and join the VOCABULARY on the term: the vocab relation
    * is bounded ([[vocabBuild]]'s post-agg output), so this is the
    * classic fact×dim broadcast join, hinted explicitly. Reassembly is
    * one groupBy(doc) whose `array_agg` collects (pos, id) structs and
    * sorts WITHIN the row (`array_sort` of a doc-length array) — order
    * is deterministic regardless of partitioning, and the per-group
    * state is bounded by document length. One shuffle total (the
    * doc-keyed reassembly). */
  def encodeDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = vocabBuild(spark, sfDir).select("term", "vocab_id")
    val ex = docs(spark, sfDir).filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    ex.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("id", coalesce(col("vocab_id"), lit(OovId)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("vocab_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        array_sort(collect_list(struct(col("pos"), col("id")))).as("pi"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"),
        expr("transform(pi, x -> x.id)").as("ids"))
      .orderBy("doc_id")
  }

  /** x43: unigram LM LOG-PROBABILITY scoring — the CCNet-style
    * perplexity-proxy quality filter: train a unigram language model on
    * the corpus's own term counts, then score every document by its mean
    * token log-probability (low = surprising/junky relative to the
    * corpus; the classic rank-and-cut quality signal).
    *
    * Scale shape: term counts are ONE partial-aggregated groupBy
    * (persisted — the LM table is read by its own normalizer and the
    * scoring join); the per-term log-prob is quantized ONCE per term
    * (`floor(ln(c/total)·1e6 + 0.5)` — the [[IdfScale]] move), so the
    * per-document aggregation sums exact LONGS and the exposed mean is
    * two fixed-order divisions. Scoring is a corpus explode × BROADCAST
    * LM join (vocab-sized dim) + one doc-keyed groupBy — x39's shape. */
  def unigramLogProb(spark: SparkSession, sfDir: String): DataFrame =
    unigramScores(spark, sfDir)
      .select("doc_id", "n_tokens", "avg_logprob")
      .orderBy("doc_id")

  /** The x43 core, carrying `lang` through the per-doc aggregation (a
    * key extension, not an extra shuffle — lang is functionally
    * dependent on doc_id) so [[pplBuckets]] can stratify per language
    * without a second doc-keyed join. */
  private def unigramScores(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = docs(spark, sfDir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("term"))
    val counts = OperatorCaches.persist(
      ex.groupBy("term").agg(count(lit(1)).as("c")))
    val total = counts.agg(sum(col("c")).as("total"))
    val lm = counts.join(broadcast(total))
      .select(col("term"),
        floor(log(col("c").cast("double") / col("total").cast("double"))
          * IdfScale + lit(0.5)).as("lp_scaled"))
    ex.join(broadcast(lm), "term")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp_scaled")).as("sum_scaled"))
      .withColumn("avg_logprob",
        col("sum_scaled").cast("double") / IdfScale / col("n_tokens").cast("double"))
  }

  /** x53: CCNet-style per-language PERPLEXITY BUCKETS — split every
    * language's documents into head / middle / tail by unigram mean
    * log-probability RANK terciles (the CCNet curation scheme: "head"
    * is the most fluent third relative to its own language, and
    * downstream mixes sample the buckets at different rates).
    * Per-LANGUAGE cuts matter: absolute log-prob is not comparable
    * across languages, so a global cut would put all of a rare
    * language in one bucket.
    *
    * Bucketing is RANK-based in exact integer arithmetic: with n docs
    * in a language and c_le(s) = how many of them score ≤ s, a doc is
    * tail iff 3·c_le ≤ n, middle iff 3·c_le ≤ 2n, else head (a tied
    * score cluster moves as one unit). The first formulation compared
    * the double score against an interpolated `percentile` cut and was
    * a knife-edge by construction — Spark's `percentile` and DuckDB's
    * `quantile_cont` interpolate with ~1-ulp differences, and the sf1
    * gate caught exactly one boundary doc flipping buckets. Integer
    * comparisons cannot tie-break differently across engines, and the
    * join keys (lang, avg_logprob) are x43's bit-exact doubles.
    *
    * Scale shape: scoring is x43's (vocab broadcast + one doc-keyed
    * groupBy). The rank cuts compress docs to per-(lang, score) VALUE
    * GROUPS first (partial-aggregated count), then take one running
    * sum over that compressed relation — the window's input is bounded
    * by distinct score values per language, the same state bound the
    * `percentile` aggregate had in its single reducer, with the
    * compression done map-side before the exchange. Assignment joins
    * back on (lang, score) — an unhinted equi-join against a
    * distinct-values-sized build side. No per-DOC window anywhere (an
    * ntile over the doc relation would funnel the largest language's
    * every row through one task). */
  def pplBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val d = unigramScores(spark, sfDir)
    val n = d.groupBy(col("lang").as("n_lang")).agg(count(lit(1)).as("n"))
    val valueCounts = d.groupBy("lang", "avg_logprob")
      .agg(count(lit(1)).as("vc"))
    val cum = valueCounts.withColumn("c_le",
      sum(col("vc")).over(
        Window.partitionBy("lang").orderBy("avg_logprob")))
    // langs are a bounded dim — the broadcast of n is the legitimate
    // hint; the value-group relation stays unhinted (data-dependent).
    val buckets = cum.join(broadcast(n), col("lang") === col("n_lang"))
      .withColumn("bucket",
        when(col("c_le") * 3 <= col("n"), "tail")
          .when(col("c_le") * 3 <= col("n") * 2, "middle")
          .otherwise("head"))
      .select(col("lang").as("b_lang"), col("avg_logprob").as("b_score"),
        col("bucket"))
    d.join(buckets,
        col("lang") === col("b_lang") && col("avg_logprob") === col("b_score"))
      .select("doc_id", "lang", "n_tokens", "avg_logprob", "bucket")
      .orderBy("doc_id")
  }

  /** x54: first-occurrence NOVELTY scoring — for each document, the
    * fraction of its word 3-gram shingles whose FIRST corpus occurrence
    * (by doc_id order, the ingestion order) is this document. The
    * incremental-crawl signal: a fetch whose shingles all appeared in
    * earlier documents adds nothing even if no single earlier document
    * duplicates it (cross-document patchwork that pairwise dedup — x2,
    * x3 — structurally misses).
    *
    * Scale shape: first occurrences are ONE partial-aggregated
    * `groupBy(shingle).agg(min(doc_id))` over the exploded shingle
    * stream — min combines map-side, so a boilerplate shingle in every
    * document costs one row per partition, not per document; the
    * join-back is the same unhinted vocabulary-keyed equi-join as x41's
    * DF join (AQE picks the build side); the per-doc count is one
    * doc-keyed groupBy. No window over a doc_id ordering — the naive
    * "running set of seen shingles" is inherently sequential, while
    * min-per-shingle is the same answer as an embarrassingly parallel
    * aggregate. */
  def novelty(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = graft.operators.Dedup.shingleTableFrom(docs(spark, sfDir))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val firstSeen = ex.groupBy("s").agg(min(col("doc_id")).as("first_doc"))
    ex.join(firstSeen, "s")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_frac",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
      .select("doc_id", "n_shingles", "n_novel", "novelty_frac")
      .orderBy("doc_id")
  }

  /** Minimum bigram occurrences for a [[pmiCollocations]] candidate —
    * PMI is notoriously unstable on rare pairs (one co-occurrence of two
    * hapaxes maximizes it), so every serious collocation extraction
    * floors the pair count. */
  val MinPairCount = 5L
  /** Result size for [[pmiCollocations]]. */
  val TopCollocations = 50

  /** x55: PMI COLLOCATIONS — the top word pairs by pointwise mutual
    * information over ADJACENT token bigrams, the classic corpus-
    * analysis step behind phrase vocabularies ("new york" should be one
    * token) and tokenizer pre-merge candidates.
    * pmi(a,b) = ln(c_ab · T / (c_a · c_b)).
    *
    * Scale shape: bigrams come from a narrow per-row `zip_with` of the
    * token array with its own tail — NO self-join on position (the
    * (doc, pos) ⋈ (doc, pos+1) formulation shuffles the corpus twice to
    * compute what is a per-row adjacency); both count relations are
    * partial-aggregated groupBys (vocab- and bigram-vocab-sized). The
    * unigram side joins back BROADCAST (vocab-sized dim — x43's lm
    * precedent), T is a 1-row cross join, and the final top-k is
    * orderBy+limit — Spark plans `TakeOrderedAndProject`, per-partition
    * heaps + one k-row merge, never a global sort.
    *
    * Cross-engine: counts are exact longs; the PMI goes through x43's
    * scaled-integer bridge — `floor(ln(·)·IdfScale + 0.5)` as a LONG,
    * exposed as the scaled-back double — because a raw `ln` double is
    * NOT cross-engine stable here (measured: 1-ulp divergence between
    * Spark's and DuckDB's log on a near-1 argument at sf0.01; x43's
    * single-ratio arguments happened to agree, these don't). The ORDER
    * BY is total (scaled pmi DESC, then the pair), so the k-boundary
    * cut is deterministic and mirrored. */
  def pmiCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = OperatorCaches.persist(
      docs(spark, sfDir).filter(col("text").isNotNull)
        .select(tokens(col("text")).as("t")))
    val bg = toks.filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val uni = OperatorCaches.persist(
      toks.select(explode(col("t")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c")))
    val total = uni.agg(sum(col("c")).as("total"))
    val ua = uni.select(col("term").as("w1"), col("c").as("c_a"))
    val ub = uni.select(col("term").as("w2"), col("c").as("c_b"))
    cb.filter(col("c_ab") >= MinPairCount)
      .join(broadcast(ua), "w1")
      .join(broadcast(ub), "w2")
      .crossJoin(broadcast(total))
      .withColumn("pmi_scaled",
        floor(log(col("c_ab").cast("double") * col("total").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")))
          * IdfScale + lit(0.5)).cast("long"))
      .withColumn("pmi", col("pmi_scaled").cast("double") / IdfScale)
      .select("w1", "w2", "c_ab", "pmi")
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(TopCollocations)
  }

  /** x56: one BPE MERGE ROUND — the hot loop of byte-pair-encoding
    * tokenizer training as a single declarative plan: count adjacent
    * SYMBOL pairs across the word vocabulary weighted by word frequency,
    * pick the most frequent pair (deterministic tie-break: count desc,
    * then the pair), and apply the merge to every word's symbol
    * sequence. Output: per word, its pre- and post-merge segmentation
    * plus the chosen pair — exactly the state a trainer would carry
    * into the next round.
    *
    * Scale shape: the only corpus-sized stage is the word-count groupBy
    * (partial-aggregated; everything after runs on the VOCABULARY —
    * pair counting is a per-row zip over ≤|word| symbols, argmax is
    * `TakeOrderedAndProject` with k=1, and the merge application is a
    * narrow projection against the 1-row broadcast winner). A training
    * loop iterates this plan with the merged sequences as input — the
    * same plan-only-loop shape as x33's Lloyd iterations.
    *
    * Merge semantics, mirrored cross-engine: the symbol sequence is a
    * space-joined string; gaps are doubled before the substitution so
    * one `replace` pass merges ALL disjoint occurrences leftmost-first
    * ('e r e r' → 'er er'; with single gaps the consumed boundary space
    * would hide every second occurrence), then gaps collapse back.
    * Both engines' `replace` scan left-to-right non-overlapping, so the
    * outputs are identical by construction. */
  def bpeMergeStep(spark: SparkSession, sfDir: String): DataFrame =
    bpeMergeFrom(OperatorCaches.persist(
      docs(spark, sfDir).filter(col("text").isNotNull)
        .select(explode(tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("c"))))

  /** [[bpeMergeStep]] over an arbitrary (term, c) word-count relation —
    * the testable core (the spec plants symbol runs like `erer` to pin
    * the all-disjoint-leftmost merge semantics). */
  private[graft] def bpeMergeFrom(w: DataFrame): DataFrame = {
    val seq = w.select(col("term"), col("c"),
      concat_ws(" ", split(col("term"), "")).as("s"))
    val chars = seq.select(col("c"), split(col("s"), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val pairs = chars.select(col("c"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("p1"), b.as("p2")))).as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum(col("c")).as("pc"))
    val best = pairs.orderBy(desc("pc"), col("p1"), col("p2")).limit(1)
    seq.crossJoin(broadcast(best))
      .withColumn("merged", expr(
        """trim(replace(replace(
          |  ' ' || replace(s, ' ', '  ') || ' ',
          |  ' ' || p1 || '  ' || p2 || ' ',
          |  ' ' || p1 || p2 || ' '), '  ', ' '))""".stripMargin))
      .select("term", "c", "s", "merged", "p1", "p2", "pc")
      .orderBy("term")
  }

  /** Document-frequency threshold for [[boilerplate]]: a shingle in more
    * than this many documents counts as boilerplate. */
  val BoilerplateDf = 3L

  /** x41: BOILERPLATE span statistics — the span-level quality signal
    * (RefinedWeb/CCNet-style): for each document, how many of its word
    * 3-gram shingles occur in more than [[BoilerplateDf]] documents
    * corpus-wide, and the resulting boilerplate fraction + keep flag.
    * Catches template/navigation text that document-level dedup misses
    * (the doc is unique; its spans are everywhere).
    *
    * Scale shape — the same two partial-aggregated passes as the x3
    * stop-shingle cut: (1) shingle document frequencies via
    * groupBy(shingle) over the exploded DISTINCT (doc, shingle) stream
    * (explode of the persisted shingle table — map-side combine shrinks
    * hot shingles before the shuffle); (2) the per-doc boilerplate count
    * via groupBy(doc_id) after joining the DF relation back ON THE
    * SHINGLE (unhinted — vocabulary-sized, AQE decides). No window, no
    * self-join, no corpus-sized broadcast. */
  def boilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.shingleTableFrom(
      Tables.documentsParallel(spark, sfDir))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfCounts = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val perDoc = ex.join(dfCounts.filter(col("df") > BoilerplateDf), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
    sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_boiler", coalesce(col("n_boiler"), lit(0L)))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_shingles").cast("double"))
      .withColumn("keep", col("boiler_frac") < 0.5)
      .select("doc_id", "n_shingles", "n_boiler", "boiler_frac", "keep")
      .orderBy("doc_id")
  }

  /** Feature-hash bucket count for [[qualityClassifier]] (the hashing
    * trick's dimensionality; fastText-family quality models run 1e5-1e7,
    * small here so bucket collisions are actually exercised). */
  val ClassifierBuckets = 4096L

  /** Modulus of the deterministic per-bucket weight derivation (prime, so
    * the multiplicative scramble cycles through all residues). */
  private[graft] val WeightMod = 2003L

  /** Knuth's multiplicative-hash constant — scrambles bucket ids into
    * pseudo-independent weights. */
  private[graft] val WeightMul = 2654435761L

  /** Fixed-point scale between the integer score sum and the exposed
    * double score. */
  val ClassifierScale = 1000.0

  /** x50: LINEAR quality-classifier scoring — the fastText-shaped model
    * every large pipeline runs to rank documents by "looks like good
    * text" (CCNet, GPT-3's WebText classifier, LLaMA's quality filter):
    * hash each token into [[ClassifierBuckets]] feature buckets (the
    * hashing trick — no vocabulary table exists AT ALL), look up the
    * bucket's weight, and score the document by its mean token weight;
    * the keep decision thresholds the score.
    *
    * The weights here are derived arithmetically from the bucket id (a
    * multiplicative scramble into [−1001, 1001]) instead of loaded from
    * a trained model file — deterministic, so the oracle compare stays
    * integer-exact; swapping in trained weights changes ONE expression
    * (or a [[ClassifierBuckets]]-bounded broadcast array lookup) and no
    * plan shape.
    *
    * Scale shape: hash + weight are a narrow codegen projection on the
    * exploded token stream (the rolling [[graft.functions.TextFunctions.polyHash]]
    * — no UDF, no dim join: that absence is the hashing trick's point);
    * the only shuffle is the doc-keyed partial-aggregated sum, exactly
    * x43's shape minus its vocabulary broadcast. Integer until the final
    * two fixed-order divisions → hash-exact across engines. */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame =
    qualityClassifierFrom(docs(spark, sfDir))

  /** [[qualityClassifier]] over an arbitrary (doc_id, text) relation —
    * the testable core (fixtures pin the bucket→weight derivation and a
    * known-score document). */
  private[graft] def qualityClassifierFrom(d: DataFrame): DataFrame =
    d.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .withColumn("bucket", polyHash(col("w")) % lit(ClassifierBuckets))
      .withColumn("wgt",
        (col("bucket") * lit(WeightMul)) % lit(WeightMod)
          - lit((WeightMod - 1) / 2))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("wgt")).as("score_sum"))
      .withColumn("score",
        col("score_sum").cast("double") / col("n_tokens").cast("double")
          / lit(ClassifierScale))
      .withColumn("keep", col("score") > 0.0)
      .select("doc_id", "n_tokens", "score_sum", "score", "keep")
      .orderBy("doc_id")

  /** PII patterns for [[piiScrub]]. Deliberately conservative and
    * engine-portable: character classes, bounded repetition, and groups
    * only — the subset RE2 (DuckDB) and java.util.regex (Spark codegen)
    * evaluate identically, so the oracle compare is exact. No
    * lookarounds, no backrefs, no \\b (word-boundary semantics differ
    * across engines on unicode). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val DigitRunRe = "[0-9]{10,}"

  /** x32: PII detection + scrubbing — per-doc counts of email / IPv4 /
    * long-digit-run matches and the text with each class replaced by a
    * typed placeholder. Replacement ORDER is part of the contract
    * (emails first — they contain dots and digits that the later
    * patterns would otherwise bite into; then IPs; then bare digit
    * runs) and is identical in the oracle. A narrow codegen projection:
    * no shuffle, no UDF — at 100 TB this runs at scan speed. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    piiScrubFrom(docs(spark, sfDir))

  /** [[piiScrub]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures with known PII exercise each pattern). */
  private[graft] def piiScrubFrom(d: DataFrame): DataFrame =
    d.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ipv4"),
        size(regexp_extract_all(col("text"), lit(DigitRunRe), lit(0)))
          .cast("long").as("n_digit_runs"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
            lit(Ipv4Re), lit("<IP>")),
          lit(DigitRunRe), lit("<NUM>")).as("scrubbed"))
      .orderBy("doc_id")

  /** Percent of each source's docs dropped by [[quantileCalibrate]]
    * (the bottom length quartile). */
  val CalibratePct = 25L

  /** x79: PER-SOURCE QUANTILE CALIBRATION — each source's own P25
    * token-count threshold, computed EXACTLY via a histogram cumulative
    * (not a value sort and not a sketch): a per-source quality gate
    * must be calibrated against that source's distribution (a fixed
    * global cutoff over-prunes terse sources and under-prunes verbose
    * ones — the x21 global-percentile complement).
    *
    * Scale shape — the third exact-quantile mechanism in the battery,
    * the one that works at 100 TB because the VALUE is a small integer:
    * the corpus collapses to a (source × distinct-length) HISTOGRAM
    * (bounded by max doc length, not corpus size) in one partial
    * aggregate; the cumulative window runs over that tiny table; the
    * threshold per source is the smallest length whose cumulative count
    * reaches ⌈pct·n_s⌉ (pure integer arithmetic); and the verdict pass
    * is a map stage against the source-bounded broadcast. Compare q18
    * (exact percentile, collects each group's values — small groups
    * only) and q22 (GK sketch — approximate): histogram-cumsum is exact
    * AND fixed-state, the right tool when the domain is small integers. */
  def quantileCalibrate(spark: SparkSession, sfDir: String): DataFrame =
    quantileCalibrateFrom(docs(spark, sfDir))

  /** [[quantileCalibrate]] over an arbitrary (doc_id, source, text)
    * relation — the testable core. */
  private[graft] def quantileCalibrateFrom(docsDf: DataFrame): DataFrame = {
    val d = docsDf
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val hist = d.groupBy("source", "n_tokens").agg(count(lit(1)).as("c"))
    val thr = hist
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("source").orderBy("n_tokens")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_s", sum(col("c")).over(Window.partitionBy("source")))
      // k = ⌈pct·n_s/100⌉ in pure integer math
      .withColumn("k", expr(s"(n_s * $CalibratePct + 99) DIV 100"))
      .filter(col("cum") >= col("k"))
      .groupBy("source").agg(min(col("n_tokens")).as("threshold"))
    d.join(broadcast(thr), "source")
      .withColumn("keep", col("n_tokens") >= col("threshold"))
      .select("doc_id", "source", "n_tokens", "threshold", "keep")
      .orderBy("doc_id")
  }

  /** Target language for [[importanceSelect]] — the "domain we want
    * more of" whose unigram distribution defines the numerator LM. */
  val ImportanceTargetLang = "en"

  /** x81: IMPORTANCE-WEIGHTED data selection (DSIR-style) — score every
    * document by the mean per-token LOG-LIKELIHOOD RATIO between a
    * target-domain unigram LM (docs whose lang is
    * [[ImportanceTargetLang]]) and the full-corpus background LM, both
    * add-1 smoothed over the joint vocabulary. Positive mean ratio =
    * "looks more like the target domain than like the average of the
    * corpus" — the contrastive complement of x43's single-LM scoring
    * (a doc can be high-probability under BOTH models; only the ratio
    * says which way it leans), and the standard cheap importance
    * sampler for domain up-weighting.
    *
    * Scale shape: both LMs come out of ONE term-keyed partial aggregate
    * (the target count is a conditional sum inside the same groupBy —
    * no second corpus pass); each term's ratio quantizes ONCE to an
    * integer difference of [[IdfScale]]d lns, so per-doc scoring is an
    * exact LONG sum over a corpus explode × broadcast vocab join —
    * x43's shape exactly. */
  def importanceSelect(spark: SparkSession, sfDir: String): DataFrame =
    importanceSelectFrom(docs(spark, sfDir))

  /** [[importanceSelect]] over an arbitrary (doc_id, lang, text)
    * relation — the testable core (fixtures give target and background
    * disjoint vocabularies and check the sign separates them). */
  private[graft] def importanceSelectFrom(docsDf: DataFrame): DataFrame = {
    val ex = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("term"))
    val counts = OperatorCaches.persist(
      ex.groupBy("term").agg(
        count(lit(1)).as("cb"),
        sum(when(col("lang") === ImportanceTargetLang, 1L).otherwise(0L))
          .as("ct")))
    val tot = counts.agg(
      sum(col("cb")).as("tb"), sum(col("ct")).as("tt"),
      count(lit(1)).as("v"))
    // quantize EACH ln separately, difference in exact integers — no
    // cross-engine double-subtraction drift
    val lm = counts.join(broadcast(tot))
      .select(col("term"),
        (floor(log((col("ct") + 1).cast("double") /
            (col("tt") + col("v")).cast("double")) * IdfScale + lit(0.5))
          .cast("long") -
         floor(log((col("cb") + 1).cast("double") /
            (col("tb") + col("v")).cast("double")) * IdfScale + lit(0.5))
          .cast("long")).as("lw_scaled"))
    ex.join(broadcast(lm), "term")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lw_scaled")).as("s"))
      .withColumn("importance",
        col("s").cast("double") / IdfScale / col("n_tokens").cast("double"))
      .withColumn("selected", col("importance") > 0.0)
      .select("doc_id", "lang", "n_tokens", "importance", "selected")
      .orderBy("doc_id")
  }

  /** Window size (tokens, non-overlapping) for [[langMixture]]. */
  val MixWindow = 8

  /** x83: SUB-DOCUMENT LANGUAGE MIXTURE — x10's marker-score language
    * ID re-run per non-overlapping [[MixWindow]]-token window, then
    * folded per document into (window count, distinct identified
    * languages, dominant language, mixed flag). Doc-level language ID
    * averages a code-switching document into whichever language has
    * more mass; the window decomposition is the standard detector for
    * mixed-language web text (embedded quotes, boilerplate in a second
    * language) that a monolingual filter should not see as one clean
    * doc.
    *
    * Scale shape: window explode (≤⌈len/[[MixWindow]]⌉ per doc) with
    * per-window scores computed in the SAME map stage (codegen'd array
    * filters, no join); the per-doc fold is one doc-keyed aggregate
    * over (doc × ≤5 langs) rows. Dominant-language ties break by
    * (count DESC, lang ASC) via a min-of-struct — commutative partial
    * aggregation, not a window. */
  def langMixture(spark: SparkSession, sfDir: String): DataFrame =
    langMixtureFrom(docs(spark, sfDir))

  /** [[langMixture]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures splice marker-heavy windows of two
    * languages into one doc). */
  private[graft] def langMixtureFrom(d: DataFrame): DataFrame = {
    val markerSql = Map(
      "en" -> Seq("the", "is", "and", "of"),
      "de" -> Seq("der", "die", "das", "und"),
      "es" -> Seq("el", "la", "los", "y"),
      "fr" -> Seq("le", "les", "et", "un"))
      .map { case (l, ws) =>
        l -> ws.map(w => s"'$w'").mkString(", ")
      }
    val w = d.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("start", explode(
        sequence(lit(1L), size(col("toks")).cast("long"),
          lit(MixWindow.toLong))))
      .withColumn("wt", slice(col("toks"), col("start"), lit(MixWindow)))
    val scored = markerSql.foldLeft(w) { case (df, (l, lst)) =>
      df.withColumn(s"s_$l",
        expr(s"size(filter(wt, x -> x in ($lst)))").cast("long"))
    }
    val wlang = scored.withColumn("wlang",
      when(col("s_en") + col("s_de") + col("s_es") + col("s_fr") === 0L,
        "und")
        .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr"))
      .select("doc_id", "wlang")
    wlang.groupBy("doc_id", "wlang").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_windows"),
        count(when(col("wlang") =!= "und", col("wlang"))).as("n_langs"),
        min(when(col("wlang") =!= "und",
          struct((-col("cnt")).as("negc"), col("wlang").as("l"))))
          .as("dom"))
      .select(col("doc_id"), col("n_windows"), col("n_langs"),
        coalesce(col("dom.l"), lit("und")).as("dominant_lang"),
        (col("n_langs") >= 2L).as("mixed"))
      .orderBy("doc_id")
  }

  /** x88: LUHN-VALIDATED PAN DETECTION — find 13–19-digit runs and
    * validate each with the Luhn checksum (double every second digit
    * from the right, fold digit sums, total ≡ 0 mod 10): the standard
    * second gate that separates card-number-shaped PII from phone
    * numbers, order ids, and timestamps that a bare digit-run regex
    * (x32's `<NUM>` scrub) cannot tell apart. A checksum, not a regex —
    * a different detection mechanism from every other PII pass.
    *
    * Scale shape: a narrow per-row projection (regex extraction + an
    * in-row fold per candidate run) — scan speed at 100 TB like x32;
    * zero shuffles before the presentation sort. The corpus is
    * digit-free, so the oracle gate pins the all-zero baseline; the
    * checksum arithmetic itself is pinned by fixtures with real
    * Luhn-valid/invalid numbers. */
  def luhnPan(spark: SparkSession, sfDir: String): DataFrame =
    luhnPanFrom(docs(spark, sfDir))

  /** The Luhn fold as a SQL lambda over one digit-run string `r`:
    * position p counts from the RIGHT. Shared verbatim by the operator,
    * x94's composed gate, and (dialect-adjusted) the oracle. */
  private[graft] def luhnOk(r: String): String =
    s"""aggregate(sequence(1, length($r)), 0L, (acc, p) -> acc +
       |  (CASE WHEN p % 2 = 0 THEN
       |     (CASE WHEN 2 * (ascii(substring($r, length($r) - p + 1, 1)) - 48) > 9
       |           THEN 2 * (ascii(substring($r, length($r) - p + 1, 1)) - 48) - 9
       |           ELSE 2 * (ascii(substring($r, length($r) - p + 1, 1)) - 48) END)
       |   ELSE ascii(substring($r, length($r) - p + 1, 1)) - 48 END),
       |  acc -> acc % 10 = 0)""".stripMargin

  /** [[luhnPan]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures plant valid and checksum-broken PANs). */
  private[graft] def luhnPanFrom(d: DataFrame): DataFrame =
    d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '[0-9]{13,19}', 0)").as("runs"))
      .select(col("doc_id"),
        size(col("runs")).cast("long").as("n_digit_runs"),
        size(expr(s"filter(runs, r -> ${luhnOk("r")})"))
          .cast("long").as("n_luhn_valid"))
      .withColumn("has_pan", col("n_luhn_valid") > 0L)
      .orderBy("doc_id")

  /** Candidate vocabulary sizes for [[vocabCoverage]]. */
  val CoverageSizes = Seq(256L, 1024L, 4096L, 16384L)

  /** x89: VOCABULARY COVERAGE CURVE — for each candidate vocabulary
    * size K (top-K terms by count), the fraction of all corpus token
    * OCCURRENCES those K types cover: the sizing curve a tokenizer
    * build (x37/x56) reads to pick its vocabulary budget (coverage
    * knees sharply thanks to Zipf — x76's exponent predicts where).
    *
    * Scale shape: the corpus collapses to term counts in one partial
    * aggregate (Heaps-bounded vocab); the rank window and the ×|K|
    * explode run over VOCAB rows only, and the curve is a 4-row
    * aggregate. Coverage = one double division of exact longs per K —
    * hash-exact by construction. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame =
    vocabCoverageFrom(docs(spark, sfDir))

  /** [[vocabCoverage]] over an arbitrary (text) relation — the testable
    * core (fixtures pin the curve on a constructed count profile). */
  private[graft] def vocabCoverageFrom(d: DataFrame): DataFrame = {
    val counts = OperatorCaches.persist(
      d.filter(col("text").isNotNull)
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt")))
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("cnt"), col("term"))).cast("long"))
      .withColumn("vocab_size",
        explode(array(CoverageSizes.map(lit): _*)))
      .groupBy("vocab_size")
      .agg(sum(when(col("rank") <= col("vocab_size"), col("cnt"))
        .otherwise(0L)).as("covered_tokens"))
      .join(broadcast(total))
      .withColumn("coverage",
        col("covered_tokens").cast("double") /
          col("total_tokens").cast("double"))
      .select("vocab_size", "covered_tokens", "total_tokens", "coverage")
      .orderBy("vocab_size")
  }

  /** Bigram-table budget for [[bigramLm]] — the LM ships only its top-
    * count bigrams; everything past the budget scores through backoff.
    * The budget is what keeps the broadcast table bounded at 100 TB
    * (a raw bigram table grows with the corpus; the budgeted head does
    * not). */
  val BigramBudget = 65536
  /** Stupid-backoff discount: score(w2|w1) falls back to 0.4·P(w2). */
  val BackoffLnScaled: Long =
    math.floor(math.log(0.4) * IdfScale + 0.5).toLong

  /** x84: BIGRAM LM scoring with STUPID BACKOFF — per-document mean
    * log-score under a bigram model whose table is capped at
    * [[BigramBudget]] entries by count (ties (count DESC, w1, w2));
    * bigrams outside the table score as ln(0.4) + unigram log-prob.
    * The CCNet-style quality signal one order above x43: repetitive or
    * scrambled text that a unigram LM cannot distinguish from prose
    * scores distinctly under transition probabilities.
    *
    * Scale shape: bigram counts are one partial-aggregated groupBy
    * (vocabulary-pair-bounded, NOT corpus-bounded after aggregation);
    * the budget cut is top-k via orderBy+limit (per-partition heaps),
    * which is the whole point — the shipped LM is a fixed-size
    * broadcast no matter the corpus. Scoring is the x43 shape twice:
    * corpus bigram explode × broadcast bigram table (left) × broadcast
    * unigram table (backoff), all lns quantized once per LM entry, doc
    * sums exact LONGs. */
  def bigramLm(spark: SparkSession, sfDir: String): DataFrame =
    bigramLmFrom(docs(spark, sfDir))

  /** [[bigramLm]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures check an in-table bigram scores
    * ln(c12/c1) and an out-of-table one backs off). */
  private[graft] def bigramLmFrom(d: DataFrame): DataFrame = {
    val toks = d.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bg = OperatorCaches.persist(
      toks
        .withColumn("i", explode(
          sequence(lit(1L), size(col("toks")).cast("long") - 1L)))
        .select(col("doc_id"),
          element_at(col("toks"), col("i").cast("int")).as("w1"),
          element_at(col("toks"), col("i").cast("int") + 1).as("w2")))
    val uni = OperatorCaches.persist(
      bg.select(col("doc_id"), col("w1").as("term"))
        .union(toks.select(col("doc_id"),
          element_at(col("toks"), size(col("toks"))).as("term")))
        .groupBy("term").agg(count(lit(1)).as("c1")))
    val total = uni.agg(sum(col("c1")).as("t"))
    val lm1 = uni.join(broadcast(total))
      .select(col("term"),
        floor(log(col("c1").cast("double") / col("t").cast("double"))
          * IdfScale + lit(0.5)).cast("long").as("lp1_scaled"))
    val lm2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .orderBy(desc("c12"), col("w1"), col("w2")).limit(BigramBudget)
      .join(uni.withColumnRenamed("term", "w1"), "w1")
      .select(col("w1"), col("w2"),
        floor(log(col("c12").cast("double") / col("c1").cast("double"))
          * IdfScale + lit(0.5)).cast("long").as("lp2_scaled"))
    bg.join(broadcast(lm2), Seq("w1", "w2"), "left")
      .join(broadcast(lm1.withColumnRenamed("term", "w2")), "w2")
      .select(col("doc_id"),
        coalesce(col("lp2_scaled"),
          lit(BackoffLnScaled) + col("lp1_scaled")).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("s"))
      .withColumn("avg_logprob",
        col("s").cast("double") / IdfScale / col("n_bigrams").cast("double"))
      .select("doc_id", "n_bigrams", "avg_logprob")
      .orderBy("doc_id")
  }

  /** x100: NAIVE-BAYES QUALITY-CLASSIFIER DISTILLATION — x50 scores with
    * a stand-in weight table and says "swapping in trained weights
    * changes one expression"; this operator TRAINS those weights, the
    * CCNet/fastText practice of distilling an expensive heuristic into a
    * cheap linear model that then filters the other 99% of the corpus.
    * Teacher labels come from an in-plan heuristic (good ⟺ stopword
    * ratio ≥ 1/10 — exact integer compare `10·n_stop ≥ n_tokens`);
    * training is one pass of per-bucket class counts over x50's hashed
    * feature space ([[ClassifierBuckets]]); the student weight is the
    * add-one-smoothed NB log-odds per bucket, quantized through the
    * [[IdfScale]] fixed-point ln (the x35/x43 device) so the weight
    * table is integer-exact cross-engine; applying it is one broadcast
    * join + a doc-keyed integer sum. Emits per doc: token count, the
    * teacher's label, the student's integer score, and the student keep
    * decision (score > 0) — so the eval (student-vs-teacher agreement)
    * falls out of the output with one aggregation.
    *
    * Scale shape: the corpus is scanned ONCE into a persisted
    * (doc_id, bucket, cnt, n_stop) relation (partial-aggregated,
    * ≤ distinct-buckets-per-doc rows ≪ token rows); the teacher and the
    * score are doc-keyed aggregates of it, the class counts a
    * bucket-keyed aggregate (≤ [[ClassifierBuckets]] rows), the totals a
    * 1-row broadcast, and the trained table rides a broadcast join back
    * — at 100 TB the weight table is still 4096 rows. The doc-keyed
    * teacher join reuses the same hash layout as the score aggregate. */
  def nbDistill(spark: SparkSession, sfDir: String): DataFrame =
    nbDistillFrom(docs(spark, sfDir))

  /** [[nbDistill]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures plant a stopword-free doc, a stopword-rich
    * doc, and check the trained log-odds against a driver-side model). */
  private[graft] def nbDistillFrom(d: DataFrame): DataFrame =
    nbDistillCore(d).orderBy("doc_id")

  /** [[nbDistillFrom]] WITHOUT the final determinism sort — the
    * composition seam x113 persists (caching through the corpus-wide
    * orderBy would materialize a sort nobody downstream needs). */
  private[graft] def nbDistillCore(d: DataFrame): DataFrame = {
    val qln = (x: Column) =>
      floor(log(x) * IdfScale + lit(0.5)).cast("long")
    val tok = OperatorCaches.persist(
      d.filter(col("text").isNotNull)
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .select(col("doc_id"),
          (polyHash(col("w")) % lit(ClassifierBuckets)).as("bucket"),
          col("w").isin(Stopwords: _*).cast("int").as("is_stop"))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"), sum(col("is_stop")).as("n_stop")))
    val lab = tok.groupBy("doc_id").agg(
      sum(col("cnt")).as("n_tokens"), sum(col("n_stop")).as("stop_cnt"))
      .withColumn("teacher_good", col("stop_cnt") * 10 >= col("n_tokens"))
    val train = tok.join(lab.select("doc_id", "teacher_good"), Seq("doc_id"))
      .groupBy("bucket").agg(
        sum(when(col("teacher_good"), col("cnt")).otherwise(lit(0L)))
          .as("c1"),
        sum(when(!col("teacher_good"), col("cnt")).otherwise(lit(0L)))
          .as("c0"))
    val tot = train.agg(sum(col("c1")).as("t1"), sum(col("c0")).as("t0"))
    val weights = train.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (qln((col("c1") + 1L).cast("double") /
            (col("t1") + lit(ClassifierBuckets)).cast("double")) -
          qln((col("c0") + 1L).cast("double") /
            (col("t0") + lit(ClassifierBuckets)).cast("double"))).as("w_q"))
    val scored = tok.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id").agg(sum(col("cnt") * col("w_q")).as("score_q"))
    lab.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("teacher_good"),
        coalesce(col("score_q"), lit(0L)).as("score_q"),
        (coalesce(col("score_q"), lit(0L)) > 0L).as("student_keep"))
  }

  /** x113: reliability-table bin count. */
  val CalibrationBins = 10

  /** x113: DISTILLATION CALIBRATION EVAL — the reliability table for
    * x100's distilled student: documents are binned into
    * [[CalibrationBins]] equal-width score bands (edges derived from
    * the corpus's own min/max score, so the table is a pure function
    * of the corpus), and each band reports how often the TEACHER said
    * good — the monotone-rate check that tells a deployment whether
    * the student's score orders documents the way the teacher would,
    * and where to put the keep threshold (x100 hard-codes score > 0;
    * this table is the evidence for moving it). Completes the
    * every-model-ships-with-an-eval pattern: x58 evaluates x6/x7,
    * x99 evaluates x2, x106 evaluates x105, x90 evaluates x33 — x100
    * was the one trained artifact without its eval.
    *
    * Scale shape: inherits x100's (one corpus scan into the persisted
    * doc×bucket relation, a 4096-row broadcast weight table); the eval
    * layer adds a 1-row min/max broadcast and a ≤ [[CalibrationBins]]-
    * row aggregate. Binning is exact integer arithmetic —
    * `(score−mn)·bins div (mx−mn+1)`, numerator non-negative by
    * construction, so truncation ≡ floor on both engines; the only
    * double is good_rate's single division. The top score lands in bin
    * bins−1 whenever the score spread mx−mn ≥ bins−1 (any real corpus:
    * the quantized scores span thousands of units). On a DEGENERATE
    * corpus with spread r < bins−1 the max lands in bin
    * r·bins div (r+1) < bins−1 and the upper bins are structurally
    * empty — the table honestly reports a near-constant score column
    * rather than stretching r+1 distinct values across 10 bands; both
    * engines compute the same arithmetic, so oracle parity is
    * unaffected either way. (The OperatorsSpec bin-0/bin-9 assertions
    * rely on the fixture's spread being ≥ 9, which its planted
    * good/bad vocabulary guarantees.) */
  def distillCalibration(spark: SparkSession, sfDir: String): DataFrame =
    distillCalibrationFrom(docs(spark, sfDir))

  /** [[distillCalibration]] over an arbitrary (doc_id, text) relation —
    * the testable core (fixtures pin bin edges and rates against a
    * driver-side model). */
  private[graft] def distillCalibrationFrom(d: DataFrame): DataFrame = {
    // Persisted: the scored relation is consumed TWICE (the min/max edge
    // aggregate and the binning pass), and without the materialization
    // the whole x100 train+score pipeline re-ran for each — measured
    // x113 ≈ 2× x100 before this (optimization round 14, guide §5). The
    // cache is one narrow row per doc.
    val scored = OperatorCaches.persist(nbDistillCore(d))
    val rng = scored.agg(min(col("score_q")).as("mn"),
      max(col("score_q")).as("mx"))
    scored.crossJoin(broadcast(rng))
      .withColumn("bin",
        expr(s"((score_q - mn) * $CalibrationBins) div (mx - mn + 1)"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("teacher_good"), 1L).otherwise(0L)).as("n_good"),
        sum(when(col("student_keep"), 1L).otherwise(0L)).as("n_keep"),
        min(col("score_q")).as("score_lo"),
        max(col("score_q")).as("score_hi"))
      .withColumn("good_rate",
        col("n_good").cast("double") / col("n_docs").cast("double"))
      .orderBy("bin")
  }

  /** The Gopher rule stopword set (Rae et al. 2021, appendix A1.1) —
    * deliberately distinct from [[graft.functions.TextFunctions.Stopwords]]
    * (the scoring list): the Gopher rule asks for ≥ 2 hits from exactly
    * these eight words. */
  private[graft] val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** x107: the Gopher document-quality rule bundle (Rae et al. 2021,
    * appendix A1.1) — the de-facto standard heuristic filter most
    * production LLM corpora run before any model-based scoring:
    * word-count bounds, mean-word-length bounds, symbol-to-word caps
    * (hash and ellipsis separately), bullet-/ellipsis-line caps,
    * minimum alphabetic-word fraction, and a minimum stop-word hit
    * count. x25 (repetition) and x41 (boilerplate) cover Gopher's other
    * two rule families; this operator completes the set.
    *
    * Shape for scale: ONE narrow map projection over the scan — every
    * signal is an in-row fold over the token/line arrays — so the
    * operator runs at scan speed at 100 TB (the x9/x32 class; the only
    * exchange is the gate's output sort).
    *
    * Every RULE decision is integer-exact (cross-multiplied counts, no
    * float ratios), so the keep column is engine-identical by
    * construction; the two exposed ratio columns are single
    * correctly-rounded divisions (the x9 house rule). Character counts
    * are code points on both engines (equal on the BMP corpus; the
    * non-ASCII sf1 gate covers this). */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame =
    gopherRulesFrom(docs(spark, sfDir))

  private[graft] def gopherRulesFrom(docsDf: DataFrame): DataFrame = {
    val gopherSql = GopherStops.map(w => s"'$w'").mkString(", ")
    docsDf
      .withColumn("toks", tokens(col("text")))
      .withColumn("lns", split(col("text"), "\n"))
      .select(
        col("doc_id"), col("lang"), col("source"),
        size(col("toks")).cast("long").as("n_words"),
        expr("aggregate(toks, 0L, (a, w) -> a + length(w))")
          .as("n_word_chars"),
        (length(col("text")) -
          length(replace(col("text"), lit("#")))).cast("long").as("n_hash"),
        ((length(col("text")) -
          length(replace(col("text"), lit("...")))) / lit(3))
          .cast("long").as("n_ellipsis"),
        expr("size(filter(toks, w -> w rlike '[a-zA-Z]'))").cast("long")
          .as("n_alpha_words"),
        expr(s"size(filter(toks, w -> w in ($gopherSql)))").cast("long")
          .as("n_stop_hits"),
        size(col("lns")).cast("long").as("n_lines"),
        expr("size(filter(lns, l -> startswith(l, '- ') or " +
          "startswith(l, '* ')))").cast("long").as("n_bullet_lines"),
        expr("size(filter(lns, l -> endswith(l, '...')))").cast("long")
          .as("n_ellipsis_lines"))
      .withColumn("mean_word_len",
        col("n_word_chars").cast("double") / col("n_words").cast("double"))
      .withColumn("alpha_frac",
        col("n_alpha_words").cast("double") / col("n_words").cast("double"))
      .withColumn("r_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("r_word_len",
        lit(3L) * col("n_words") <= col("n_word_chars") &&
          col("n_word_chars") <= lit(10L) * col("n_words"))
      .withColumn("r_symbol",
        lit(10L) * col("n_hash") <= col("n_words") &&
          lit(10L) * col("n_ellipsis") <= col("n_words"))
      .withColumn("r_bullet",
        lit(10L) * col("n_bullet_lines") <= col("n_lines"))
      .withColumn("r_ellipsis_lines",
        lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
      .withColumn("r_alpha",
        lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("r_stop", col("n_stop_hits") >= 2L)
      .withColumn("gopher_keep",
        col("r_word_count") && col("r_word_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis_lines") && col("r_alpha") &&
          col("r_stop"))
      .orderBy("doc_id")
  }
}
