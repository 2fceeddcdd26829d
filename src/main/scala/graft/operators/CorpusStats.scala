package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.Tables

/** Cross-source corpus statistics: distribution divergence between
  * sources, n-gram overlap (leakage) between source pairs, and windowed
  * skip-gram co-occurrence — the diagnostics a mixture designer runs
  * before weighting domains.
  *
  * All three reduce corpus-sized relations to vocabulary- or
  * source-pair-bounded aggregates before any join, so the expensive
  * stages are partial aggregations over the scan and the joins move
  * bounded relations only. Transcendentals are ln-quantized to scaled
  * integers ([[TextAnalysis.IdfScale]]) so every cross-row reduction is
  * exact integer arithmetic (the x35/x43/x66 house rule).
  */
object CorpusStats {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsParallel(spark, sfDir)

  /** ln(2) at [[TextAnalysis.IdfScale]] quantization — the closed-form
    * contribution of a term absent from the other source's support. */
  private[graft] val Ln2Scaled: Long =
    math.floor(math.log(2.0) * TextAnalysis.IdfScale + 0.5).toLong

  /** x69: Jensen–Shannon divergence (nats) between every pair of
    * sources' unigram distributions. JS is finite off-support (unlike
    * KL), and splits into a common-support sum plus a closed-form
    * `ln 2 · (1 − common mass)` remainder, so only the INNER join on
    * terms is ever computed:
    *
    *   JS(a,b) = ½·[Σ_common p·ln(2p/(p+q)) + ln2·(1−Σ_common p)] + ½·[…b…]
    *
    * with 2p/(p+q) = 2·c_a·T_b / (c_a·T_b + c_b·T_a) — an exact integer
    * ratio (longs are exact to 2^53; beyond that swap the products to
    * DECIMAL, the x27 move). The per-term ln is quantized once and
    * multiplied by integer counts, so the per-pair reduction is exact.
    * Scale shape: one vocab×sources-bounded aggregate over the scan,
    * then a term-keyed self-join whose output is ≤ |vocab|·|sources|²
    * rows — no corpus-sized relation ever joins. */
  def sourceDivergence(spark: SparkSession, sfDir: String): DataFrame =
    sourceDivergenceFrom(docs(spark, sfDir))

  /** [[sourceDivergence]] over an arbitrary (source, text) relation. */
  private[graft] def sourceDivergenceFrom(d: DataFrame): DataFrame = {
    val sc = TextAnalysis.IdfScale
    val counts = graft.util.OperatorCaches.persist(
      d
        .filter(col("text").isNotNull)
        .select(col("source"), explode(tokens(col("text"))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c")))
    val totals = counts.groupBy("source").agg(sum(col("c")).as("t"))
    val side = counts.join(broadcast(totals), "source")
    val a = side.select(col("source").as("source_a"), col("term"),
      col("c").as("c_a"), col("t").as("t_a"))
    val b = side.select(col("source").as("source_b"), col("term"),
      col("c").as("c_b"), col("t").as("t_b"))
    a.join(b, Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .withColumn("u", col("c_a") * col("t_b"))
      .withColumn("v", col("c_b") * col("t_a"))
      .withColumn("l_a", floor(log(lit(2.0) * col("u").cast("double") /
        (col("u") + col("v")).cast("double")) * sc + lit(0.5)).cast("long"))
      .withColumn("l_b", floor(log(lit(2.0) * col("v").cast("double") /
        (col("u") + col("v")).cast("double")) * sc + lit(0.5)).cast("long"))
      .groupBy("source_a", "source_b")
      .agg(
        count(lit(1)).as("n_common_terms"),
        sum(col("c_a") * col("l_a")).as("sa_scaled"),
        sum(col("c_b") * col("l_b")).as("sb_scaled"),
        sum(col("c_a")).as("ca_common"),
        sum(col("c_b")).as("cb_common"),
        max(col("t_a")).as("t_a"), max(col("t_b")).as("t_b"))
      .withColumn("js_nats",
        (lit(0.5) * ((col("sa_scaled").cast("double") /
            (lit(sc.toDouble) * col("t_a").cast("double"))) +
          lit(Ln2Scaled.toDouble / TextAnalysis.IdfScale) *
            (lit(1.0) - col("ca_common").cast("double") /
              col("t_a").cast("double")))) +
        (lit(0.5) * ((col("sb_scaled").cast("double") /
            (lit(sc.toDouble) * col("t_b").cast("double"))) +
          lit(Ln2Scaled.toDouble / TextAnalysis.IdfScale) *
            (lit(1.0) - col("cb_common").cast("double") /
              col("t_b").cast("double")))))
      .select("source_a", "source_b", "n_common_terms", "js_nats")
      .orderBy("source_a", "source_b")
  }

  /** Shingle width for [[sourceOverlap]] (word 8-grams — the
    * decontamination-standard contamination unit). */
  val OverlapNgram = 8

  /** x70: cross-source n-gram leakage — for every source pair, the
    * count of distinct word-8-grams both emit, plus the Jaccard over
    * their 8-gram sets. The corpus-sized stage is the distinct
    * (source, ngram) projection (one partial-agg shuffle); the join is
    * an ngram-keyed self-join whose per-key fanout is bounded by the
    * SOURCE count (≤ |sources| rows per ngram, each ngram contributing
    * ≤ |sources|²/2 pair rows) — the skew profile of x3's inverted
    * index without needing its DF cap. */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame =
    sourceOverlapFrom(docs(spark, sfDir))

  /** [[sourceOverlap]] over an arbitrary (source, text) relation. */
  private[graft] def sourceOverlapFrom(d: DataFrame): DataFrame = {
    val grams = graft.util.OperatorCaches.persist(
      d
        .filter(col("text").isNotNull)
        .select(col("source"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= OverlapNgram)
        .select(col("source"), explode(expr(
          s"""transform(sequence(1, size(t) - ${OverlapNgram - 1}),
             |  i -> array_join(slice(t, i, $OverlapNgram), ' '))""".stripMargin))
          .as("g"))
        .distinct())
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val a = grams.select(col("source").as("source_a"), col("g"))
    val b = grams.select(col("source").as("source_b"), col("g"))
    a.join(b, Seq("g"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("n_b"))), "source_b")
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
      .select("source_a", "source_b", "n_shared", "n_a", "n_b", "jaccard")
      .orderBy("source_a", "source_b")
  }

  /** Context window for [[skipgramCooc]] and its count floor. */
  val CoocWindow = 3
  val MinCooc = 10L

  /** x71: windowed skip-gram co-occurrence — ordered (center, context)
    * pairs within [[CoocWindow]] tokens, the word2vec/GloVe
    * preprocessing pass. The pair explosion is a narrow per-row nested
    * transform (≤ window·len pairs per doc, no shuffle), and the count
    * aggregation is vocab²-bounded with map-side combine. */
  def skipgramCooc(spark: SparkSession, sfDir: String): DataFrame =
    skipgramCoocFrom(docs(spark, sfDir))

  /** [[skipgramCooc]] over an arbitrary (text) relation. */
  private[graft] def skipgramCoocFrom(d: DataFrame): DataFrame =
    d
      .filter(col("text").isNotNull)
      .select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(sequence(1, size(t) - 1),
           |  i -> transform(sequence(i + 1, least(i + $CoocWindow, size(t))),
           |    j -> named_struct('w1', element_at(t, i),
           |                      'w2', element_at(t, j)))))""".stripMargin))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= MinCooc)
      .orderBy(desc("cnt"), col("w1"), col("w2"))

  /** x93: per-source BIGRAM CONDITIONAL ENTROPY — H(w₂|w₁) =
    * −Σ p(w₁,w₂)·ln p(w₂|w₁) in nats, the sequence-level predictability
    * fingerprint that completes the corpus-statistics family: x66
    * measures character disorder, x76 the unigram frequency SHAPE, this
    * the transition uncertainty (templated/boilerplate sources sit near
    * 0 — the next token is determined; natural text sits high). A
    * drifting conditional entropy between crawls flags template
    * injection that unigram statistics cannot see.
    *
    * Scale shape: the corpus reduces to (source × bigram) counts in ONE
    * partial aggregate; the w₁-marginal is derived FROM that aggregate
    * (a source×vocab-bounded second groupBy — never a second corpus
    * pass), and each bigram's ln(c₁₂/c₁) quantizes once so the entropy
    * sum is exact DECIMAL arithmetic over c₁₂·lnq products (the x76
    * moment pattern; products reach c·2×10⁷, so the accumulator is
    * DECIMAL(38,0)). */
  def bigramEntropy(spark: SparkSession, sfDir: String): DataFrame =
    bigramEntropyFrom(docs(spark, sfDir))

  /** [[bigramEntropy]] over an arbitrary (source, text) relation — the
    * testable core (fixtures pin a deterministic-transition source at
    * exactly 0 and a fair-coin source at ln 2). */
  private[graft] def bigramEntropyFrom(docsDf: DataFrame): DataFrame = {
    val sc = TextAnalysis.IdfScale
    val c12 = docsDf.filter(col("text").isNotNull)
      .select(col("source"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("i", explode(
        sequence(lit(1L), size(col("toks")).cast("long") - 1L)))
      .select(col("source"),
        element_at(col("toks"), col("i").cast("int")).as("w1"),
        element_at(col("toks"), col("i").cast("int") + 1).as("w2"))
      .groupBy("source", "w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("source", "w1").agg(sum(col("c12")).as("c1"))
    c12.join(c1, Seq("source", "w1"))
      .withColumn("lnq",
        floor(log(col("c12").cast("double") / col("c1").cast("double"))
          * sc + lit(0.5)).cast("long"))
      .groupBy("source")
      .agg(
        sum(col("c12")).as("n_bigrams"),
        sum((col("c12") * col("lnq")).cast("decimal(38,0)")).as("s"))
      .withColumn("cond_entropy",
        -(col("s").cast("double") / sc / col("n_bigrams").cast("double")))
      .select("source", "n_bigrams", "cond_entropy")
      .orderBy("source")
  }

  /** x109: per-source length-distribution drift — the exact two-sample
    * Kolmogorov–Smirnov statistic between each source's `n_chars`
    * distribution and the whole corpus's, the drift alarm a mixture
    * pipeline runs per ingest batch (a source whose length profile
    * shifts is re-crawling, truncating, or changed its extractor —
    * catches what per-source means miss). Completes the per-source
    * fingerprint family: x69 (vocabulary JS), x76 (Zipf slope), x93
    * (bigram entropy) — this is the LENGTH marginal.
    *
    * Shape for scale: the corpus reduces to (source × n_chars) and
    * (n_chars) count aggregates FIRST (both partial-aggregated; the
    * relations are bounded by |sources| × |distinct lengths|, and doc
    * lengths are generator/extractor-bounded small integers — the x79
    * histogram judgment), so every window below runs over bounded
    * relations, never the corpus: the CDF grid is sources × global
    * lengths via a broadcast of the source-count aggregate, cumulated
    * per source. KS is computed in EXACT integers — the scaled gap
    * |cum_src·N − cum_all·n_src| (≤ n_src·N < 2⁶³ at any realistic
    * corpus) maxed via one `max(struct)` argmax per source — and the
    * exposed statistic is that integer over one double division, so the
    * gate stays hash-exact with the argmax length pinned (ties → larger
    * length). Evaluating both step functions at every GLOBAL distinct
    * length is sufficient: the sup of |F_s − F| over ℝ is attained at a
    * jump point of either CDF, and every jump of either is a global
    * length. */
  def lengthDrift(spark: SparkSession, sfDir: String): DataFrame =
    lengthDriftFrom(docs(spark, sfDir))

  private[graft] def lengthDriftFrom(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLen = d.groupBy("n_chars").agg(count(lit(1)).as("c_all"))
    val perSrcLen =
      d.groupBy("source", "n_chars").agg(count(lit(1)).as("c_src"))
    val srcTotals = d.groupBy("source").agg(count(lit(1)).as("n_src"))
    val totals = d.agg(count(lit(1)).as("n_all"))
    // global CDF over the bounded length histogram (the x37 bounded-
    // relation window judgment: |distinct lengths| rows, never corpus)
    val cumAll = perLen.withColumn("cum_all",
      sum(col("c_all")).over(Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // grid = every (source, global length): broadcast the |sources|-row
    // aggregate across the |lengths|-row one (bounded × bounded)
    val grid = cumAll.crossJoin(broadcast(srcTotals))
      .join(perSrcLen, Seq("source", "n_chars"), "left_outer")
      .withColumn("c_src", coalesce(col("c_src"), lit(0L)))
      .withColumn("cum_src",
        sum(col("c_src")).over(Window.partitionBy("source")
          .orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grid.crossJoin(broadcast(totals))
      .withColumn("gap_scaled",
        abs(col("cum_src") * col("n_all") - col("cum_all") * col("n_src")))
      .groupBy("source")
      .agg(first(col("n_src")).as("n_src"),
        first(col("n_all")).as("n_all"),
        max(struct(col("gap_scaled"), col("n_chars"))).as("m"))
      .select(col("source"), col("n_src"),
        col("m.gap_scaled").as("ks_scaled"),
        col("m.n_chars").as("ks_at_len"),
        (col("m.gap_scaled").cast("double") /
          (col("n_src") * col("n_all")).cast("double")).as("ks_stat"))
      .orderBy("source")
  }
}
