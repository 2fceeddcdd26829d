package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.functions._
import graft.expressions.PolyHash

/** Text-analysis primitives for the LLM-data-pipeline extensions, built
  * exclusively from codegen'd built-ins / higher-order functions — no UDFs,
  * so every operator scales as a narrow projection.
  *
  * Cross-engine determinism: the rolling polynomial hash and the md5-based
  * MinHash are defined so the identical computation is expressible in ANSI
  * SQL (DuckDB oracle) — integer arithmetic and lexicographic min over hex
  * digests only.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Rolling polynomial hash over characters:
    * h_0 = 0; h_{i+1} = (31·h_i + ascii(c_i)) mod 1e9+7.
    * A document fingerprint usable for grouping/sharding; stays in a long.
    * Codegen'd ([[graft.expressions.PolyHash]]); [[polyHashHof]] is the
    * reference fold it must match bit-for-bit. */
  def polyHash(text: Column): Column =
    GraftSql.column(PolyHash(GraftSql.expression(text)))

  /** Reference interpreted fold for [[polyHash]] (kept for the identity
    * spec; do not use on hot paths — it evaluates a boxed lambda per
    * character). */
  def polyHashHof(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c).cast("long")) % lit(1000000007L))

  /** Content-defined chunk lengths (stateless gear-style cut rule):
    * boundary after position j iff the trailing 8-char window's
    * [[polyHash]] has its low 5 bits zero. Codegen'd one-pass loop
    * ([[graft.expressions.CdcChunks]]); `GraftProperties` pins it
    * against the driver-side model on arbitrary strings. */
  def cdcChunks(text: Column): Column =
    GraftSql.column(graft.expressions.CdcChunks(GraftSql.expression(text)))

  /** Word n-gram shingles (default 3): the unit set for Jaccard/MinHash
    * near-dup detection. Distinct, so shingle multiplicity doesn't bias
    * similarity. Codegen'd ([[graft.expressions.WordShingles]]);
    * [[shinglesHof]] is the reference HOF pipeline it must match. */
  def shingles(text: Column, n: Int = 3): Column =
    GraftSql.column(graft.expressions.WordShingles(
      GraftSql.expression(text), n))

  /** Word n-grams WITH multiplicity over a token-array column — the
    * building block shared by [[shinglesHof]] (which distincts it) and
    * repetition analysis (which must NOT: multiplicity is the signal). */
  def ngramsFromTokens(t: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(t) - lit(n - 1)),
      i => concat_ws(" ",
        (0 until n).map(j => element_at(t, (i + lit(j)).cast("int"))): _*))
    // sequence(1, k) is descending for k < 1, so short docs need the guard.
    when(size(t) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Reference higher-order-function form of [[shingles]] (kept for the
    * identity spec; evaluates an interpreted lambda per shingle — do not
    * use on corpus-scale paths). */
  def shinglesHof(text: Column, n: Int = 3): Column =
    array_distinct(ngramsFromTokens(tokens(text), n))

  /** One MinHash value: lexicographic min of seeded md5 digests of the
    * shingle set. Hex-string min is engine-portable (no 64-bit unsigned
    * arithmetic needed); seeding by prefix gives independent permutations. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr,
      s => md5(concat(lit(s"s$seed:"), s))))

  /** The FULL MinHash signature (seeds 0..numHashes-1) in one pass over
    * the shingle array ([[graft.expressions.MinHashSig]]) — element b is
    * value-identical to [[minhash]](sh, b), the interpreted reference
    * the identity spec pins it against. A narrow projection: unlike the
    * explode → `min(md5)` groupBy it replaces in the LSH pipeline, no
    * row per shingle ever crosses an exchange. Null for empty/all-null
    * arrays (matching the exploded doc vanishing from a groupBy). */
  def minhashSig(shingleArr: Column, numHashes: Int): Column =
    GraftSql.column(
      graft.expressions.MinHashSig(GraftSql.expression(shingleArr), numHashes))

  /** 64-bit SimHash: four seeded 16-bit simhashes concatenated (seed
    * char `'0'+s` prepended to each token feeds bits 16s..16s+15 —
    * see [[graft.expressions.SimHash64]]). */
  val SimhashBits = 64

  /** Bits contributed per seeded hash ([[SimhashBits]] / [[SimhashSeeds]]). */
  val SimhashBitsPerSeed = 16

  /** Number of seeded polynomial hashes feeding the signature. */
  val SimhashSeeds = 4

  /** One-pass codegen'd SimHash ([[graft.expressions.SimHash64]]) —
    * value-identical to exploding tokens and sign-summing seeded
    * [[polyHash]] bits in a groupBy (`Dedup.simhashViaAgg`, the
    * identity-spec reference), but a narrow projection: no explode, no
    * shuffle. */
  def simhash64(text: Column): Column =
    GraftSql.column(graft.expressions.SimHash64(GraftSql.expression(text)))

  /** 64-bit average-hash perceptual fingerprint over the stub-decoded
    * byte stream ([[graft.expressions.AHash64]]): 64 index buckets, bit k
    * set iff bucket k's mean exceeds the global mean (exact integer
    * comparison). The media analogue of [[simhash64]] — consumed by
    * [[graft.operators.Multimodal.mediaDups]]'s banded Hamming join;
    * `GraftProperties` pins it against a driver-side model. */
  def ahash64(text: Column): Column =
    GraftSql.column(graft.expressions.AHash64(GraftSql.expression(text)))

  /** ClickHouse-free stopword list used by quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
}
