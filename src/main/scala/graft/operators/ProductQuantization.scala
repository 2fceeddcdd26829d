package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.functions.{Neighbor, TopKByScore}
import graft.functions.VectorFunctions.{dot, l2sq}
import graft.util.OperatorCaches

/** Product quantization (PQ) over the `embeddings` table — the compression
  * that makes a 100 TB vector corpus SCANNABLE, not just storable: each
  * unit vector is cut into [[NumSubspaces]] contiguous subvectors and every
  * subvector is replaced by the id of its nearest codebook entry, so the
  * corpus representation drops from 64 doubles (512 B) to 8 small codes
  * (8 B with byte packing — a 64× scan-bandwidth cut). Search then runs
  * against the CODES via asymmetric distance computation (ADC): the query
  * stays exact, each corpus vector is approximated by its per-subspace
  * codebook entries, and a query's similarity to ANY vector reduces to
  * [[NumSubspaces]] lookups in a per-query table of
  * [[NumSubspaces]]·[[CodebookSize]] precomputed dot products
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — the IVFADC scan minus the IVF cell routing,
  * which [[Similarity.ivfTopK]] demonstrates separately and composes
  * orthogonally).
  *
  * Scale shape:
  *  - the codebook is [[NumSubspaces]]·[[CodebookSize]] = 128 rows — a
  *    legitimately bounded broadcast (same stand-in-centroid convention
  *    as [[Similarity.ivfTopK]]: the first [[CodebookSize]] vectors'
  *    subvectors; [[Similarity.kmeansTrain]] demonstrates the Lloyd
  *    training that would replace it per subspace, and the swap is one
  *    relation);
  *  - encoding is ONE corpus pass: explode into N·M subvector rows, join
  *    the broadcast codebook, argmin via a partial-aggregated
  *    `min(struct(d2, code))` — map-side combine collapses each partition
  *    to one row per (vec_id, sub) BEFORE the shuffle, and no window ever
  *    sees more than the K codebook candidates of one subvector. The
  *    distance is the codegen'd [[graft.expressions.VecL2Sq]] tight loop;
  *  - the ADC scan is the broadcast pattern of
  *    [[Similarity.bruteForceTopK]]: per-query LUTs (M·K dots each) are
  *    built against the bounded codebook, broadcast, and ONE pass over
  *    the codes relation scores every (query, vector) pair with M array
  *    lookups — no float vector is touched after encoding. Top-k is the
  *    bounded-heap [[TopKByScore]] partial aggregate (shuffle carries
  *    ≤ k rows per partition per query), never a corpus-wide rank window.
  *
  * Numerical determinism (the oracle contract): distances and LUT entries
  * are sequential left folds in array order ([[graft.expressions.VecL2Sq]]
  * / [[graft.expressions.VecDot]] = DuckDB `list_reduce`), the ADC sum is
  * a sequential fold over subspaces in subspace order, and argmin ties
  * break on the lower code id — so codes, errors, ADC scores and ranks
  * are all bit-identical across engines with no tolerance.
  */
object ProductQuantization {

  /** Number of contiguous subspaces the vector is cut into. */
  val NumSubspaces = 8

  /** Dimensions per subspace. */
  val SubDim: Int = Similarity.Dim / NumSubspaces

  /** Codebook entries per subspace (PQ codes are then
    * log2(16) = 4 bits each — a production encoder packs all 8 into
    * one 32-bit word; kept as an int column here for readability). */
  val CodebookSize = 16

  /** Neighbors returned per query by [[adcTopK]]. */
  val TopK = 5

  /** (vec_id, sub, svec): each vector exploded into its [[NumSubspaces]]
    * contiguous subvectors. A narrow per-row fan-out — no shuffle. */
  private def subspaces(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
        explode(sequence(lit(0), lit(NumSubspaces - 1))).as("sub"),
        col("u"))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(u, sub * $SubDim + 1, $SubDim)").as("svec"))

  /** The stand-in codebook: subspace m's entries are the m-th subvectors
    * of the first [[CodebookSize]] corpus vectors (the [[Similarity]]
    * stand-in-centroid convention — the plan shape is the point; a
    * trained codebook is a drop-in replacement for this relation). */
  private def codebook(e: DataFrame): DataFrame =
    subspaces(e.filter(col("vec_id") < CodebookSize))
      .select(col("sub"), col("vec_id").as("code"), col("svec").as("cvec"))

  /** Encoder core over a (vec_id, u) relation: nearest codebook entry per
    * (vector, subspace) by squared L2, ties to the lower code id.
    * `min(struct(d2, code))` IS that argmin (struct comparison is
    * field-lexicographic) and partial-aggregates, so each map partition
    * emits one row per (vec_id, sub) before the shuffle. */
  private[graft] def encodeFrom(e: DataFrame): DataFrame =
    subspaces(e)
      .join(broadcast(codebook(e)), "sub")
      .withColumn("d2", l2sq(col("svec"), col("cvec")))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("best.code").as("code"), col("best.d2").as("qerr"))

  /** x46: the PQ encoding table — (vec_id, sub, code, qerr) with qerr the
    * squared L2 quantization error of that subvector. At scale this IS
    * the stored index artifact (plus the 128-row codebook). */
  def pqEncode(spark: SparkSession, sfDir: String): DataFrame =
    encodeFrom(Similarity.normalized(spark, sfDir))
      .orderBy("vec_id", "sub")

  /** x47: ADC top-k. See the object doc for the scan shape. */
  def adcTopK(spark: SparkSession, sfDir: String): DataFrame =
    adcTopK(spark, sfDir, None)

  def adcTopK(spark: SparkSession, sfDir: String,
              querySet: Option[DataFrame]): DataFrame = {
    val e = Similarity.normalized(spark, sfDir)
    // per-vector code word: (vec_id, codes[M]) ordered by subspace.
    // Persisted: at scale this relation is read from the stored index;
    // here both the build and any re-read share one materialization.
    val codes = OperatorCaches.persist(encodeFrom(e)
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code").cast("int")).as("codes")))
    // per-query LUT: lut[sub*K + code + 1] = <query subvector, codebook
    // entry> — M·K bounded rows per query, assembled in (sub, code) order
    val q = Similarity.queryRows(e, querySet)
    val lut = subspaces(q)
      .select(col("vec_id").as("query_id"), col("sub"), col("svec"))
      .join(broadcast(codebook(e)), "sub")
      .withColumn("lv", dot(col("svec"), col("cvec")))
      .groupBy("query_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("lv")))),
        x => x.getField("lv")).as("lut"))
    // ADC scan: one pass over the codes relation, M lookups per pair,
    // sequential fold over subspaces (bit-identical to the oracle's)
    val topk = udaf(new TopKByScore(TopK), ExpressionEncoder[Neighbor]())
    broadcast(lut).join(codes, col("query_id") =!= col("vec_id"))
      .withColumn("adc", expr(
        s"aggregate(sequence(0, ${NumSubspaces - 1}), cast(0 as double), " +
        s"(acc, m) -> acc + element_at(lut, " +
        s"m * $CodebookSize + element_at(codes, m + 1) + 1))"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc"))
      .groupBy("query_id")
      .agg(topk(col("adc"), col("neighbor_id"), lit(0)).as("nbs"))
      .select(col("query_id"), posexplode(col("nbs")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.neighbor_id").as("neighbor_id"),
        col("nb.cos").as("adc"), (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }
}
