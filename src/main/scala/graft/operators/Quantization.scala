package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.util.OperatorCaches

/** Embedding quantization over the `embeddings` table — the compression
  * step a 100 TB vector corpus runs before indexing/serving (float32 →
  * int8 is a 4× storage and bandwidth cut).
  *
  * Symmetric max-abs int8: per-vector `scale = max|x| / 127`, code
  * `q_i = ⌊x_i/scale + 0.5⌋`. The rounding is written as `floor(x + 0.5)`
  * rather than `round(x)` deliberately: IEEE `floor` is bit-identical
  * across engines, while half-even/half-up `round` conventions differ —
  * the same determinism rule the rest of the oracle suite follows.
  *
  * Everything is a narrow per-row projection (no shuffle, no UDF): the
  * per-element work runs as Spark HOFs over the array column, so the
  * operator is a pure map stage at any corpus size.
  */
object Quantization {

  /** Embedding dimensionality (shared with [[Similarity]]). */
  val Dim: Int = Similarity.Dim

  /** x27: per-vector int8 quantization statistics: the scale, the worst
    * and mean absolute reconstruction error, and a clipped-code count
    * (always 0 for max-abs scaling — the column is the invariant). */
  def int8Stats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"))
      .withColumn("max_abs",
        expr("array_max(transform(embedding, x -> abs(cast(x as double))))"))
      .withColumn("scale",
        when(col("max_abs") === 0.0, lit(1.0))
          .otherwise(col("max_abs") / lit(127.0)))
      .withColumn("q",
        expr("transform(embedding, x -> floor(cast(x as double) / scale + 0.5d))"))
      .withColumn("err",
        expr("zip_with(embedding, q, (x, qi) -> " +
          "abs(cast(x as double) - qi * scale))"))
      .select(col("vec_id"), col("max_abs"), col("scale"),
        expr("array_max(err)").as("max_err"),
        expr(s"aggregate(err, cast(0 as double), (a, x) -> a + x) / ${Dim}.0d")
          .as("mean_err"),
        expr("size(filter(q, v -> abs(v) > 127))").cast("long").as("n_clipped"))
      .orderBy("vec_id")

  /** Fixed-point scale for [[covarianceStats]]: elements quantize to
    * `floor(v·1e6 + 0.5)` longs (the x27/x33 engine-portable rounding),
    * so every sum below is exact integer arithmetic and the exposed
    * doubles are correctly-rounded divisions of identical integers. */
  val CovScale = 1000000L

  /** The persisted (vec_id, sarr) relation shared by [[covarianceStats]]
    * and [[standardize]]: each embedding quantized to [[CovScale]]-scaled
    * longs. Persisted before its consumers — the transform is an
    * interpreted HOF and project-collapse would otherwise inline it into
    * every posexplode leg (the [[Dedup]] shingle-table judgment). */
  private def scaledVectors(spark: SparkSession, sfDir: String): DataFrame =
    OperatorCaches.persist(
      Tables.embeddings(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"), expr(
          s"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * $CovScale + 0.5d) AS BIGINT))")
          .as("sarr")))

  /** x38: embedding MOMENT/COVARIANCE statistics — the corpus pass at the
    * front of PCA / whitening / mean-centering (dimension reduction is
    * how a 100 TB embedding store becomes servable): per-dimension means
    * and the upper-triangle covariance matrix E[ij] − E[i]E[j].
    *
    * Scale shape: the (i, j) element pairs come from re-exploding each
    * row's OWN scaled array (fan-out Dim²/2 per vector, one pass, ZERO
    * joins — the corpus-sized self-join on vec_id this replaces would
    * shuffle the element table twice), then ONE partial-aggregated
    * groupBy(i, j): map-side combine collapses every partition to ≤
    * Dim²/2 partial rows, so the only shuffle moves ~2080 rows per
    * partition regardless of corpus size. Sums accumulate as
    * DECIMAL(25,0) over the scaled-integer products — exact at 1e9+
    * vectors where a long would overflow and a double sum would be
    * partition-order-dependent. The per-dim sums and N are bounded dims
    * broadcast back (64 rows / 1 row — the legitimate hints). Reads the
    * persisted [[scaledVectors]] relation. */
  def covarianceStats(spark: SparkSession, sfDir: String): DataFrame = {
    val scaled = scaledVectors(spark, sfDir)
    val once = scaled.select(col("vec_id"), col("sarr"),
      posexplode(col("sarr")).as(Seq("i", "svi")))
    val pairs = once
      .select(col("i"), col("svi"), posexplode(col("sarr")).as(Seq("j", "svj")))
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(sum((col("svi") * col("svj")).cast("decimal(25,0)")).as("spp"))
    val dimSums = once.groupBy("i")
      .agg(sum(col("svi").cast("decimal(25,0)")).as("sum_i"))
    val n = scaled.agg(count(lit(1)).as("n_vecs"))
    // mean/moment/cov derive from the exact integers by fixed-order
    // correctly-rounded double ops — bit-identical to the oracle
    def meanOf(s: Column) =
      s.cast("double") / lit(CovScale.toDouble) / col("n_vecs").cast("double")
    pairs
      .join(broadcast(dimSums), "i")
      .join(broadcast(dimSums.select(col("i").as("j"), col("sum_i").as("sum_j"))), "j")
      .join(broadcast(n))
      .withColumn("mean_i", meanOf(col("sum_i")))
      .withColumn("mean_j", meanOf(col("sum_j")))
      .withColumn("m2",
        col("spp").cast("double") / lit(CovScale.toDouble * CovScale.toDouble)
          / col("n_vecs").cast("double"))
      .withColumn("cov", col("m2") - col("mean_i") * col("mean_j"))
      .select(col("i").cast("long").as("dim_i"),
        col("j").cast("long").as("dim_j"),
        col("n_vecs"), col("mean_i"), col("mean_j"), col("m2"), col("cov"))
      .orderBy("dim_i", "dim_j")
  }

  /** x45: per-dimension STANDARDIZATION (z-scoring) — the feature
    * normalization applied before training/indexing: z = (v − μᵢ)/σᵢ
    * from the corpus's own per-dimension moments. Fully oracle-exact:
    * means/variances come from the same scaled-integer DECIMAL sums as
    * [[covarianceStats]], and every derived double — including the
    * σ = sqrt(var) — is a correctly-rounded IEEE op (sqrt is exact to
    * the rounding rule in both engines, unlike ln).
    *
    * Scale shape: one explode + one partial-aggregated groupBy(dim)
    * builds the 64-row moment table, which joins back BROADCAST over
    * the re-exploded corpus (the fact×dim judgment); the z computation
    * is a narrow projection. A constant dimension (σ = 0) z-scores to
    * 0 by convention — guarded identically in the oracle. */
  def standardize(spark: SparkSession, sfDir: String): DataFrame = {
    val scaled = scaledVectors(spark, sfDir)
    val once = scaled.select(col("vec_id"),
      posexplode(col("sarr")).as(Seq("i", "sv")))
    val stats = once.groupBy("i").agg(
      sum(col("sv").cast("decimal(25,0)")).as("sum_i"),
      sum((col("sv") * col("sv")).cast("decimal(25,0)")).as("sumsq_i"))
    val n = scaled.agg(count(lit(1)).as("n_vecs"))
    val sc = CovScale.toDouble
    once.join(broadcast(stats), "i").join(broadcast(n))
      .withColumn("v_q", col("sv").cast("double") / lit(sc))
      .withColumn("mean_i",
        col("sum_i").cast("double") / lit(sc) / col("n_vecs").cast("double"))
      .withColumn("var_i",
        col("sumsq_i").cast("double") / lit(sc * sc)
          / col("n_vecs").cast("double")
          - col("mean_i") * col("mean_i"))
      .withColumn("z",
        when(col("var_i") <= 0.0, lit(0.0))
          .otherwise((col("v_q") - col("mean_i")) / sqrt(col("var_i"))))
      .select(col("vec_id"), col("i").cast("long").as("dim"),
        col("v_q"), col("mean_i"), col("var_i"), col("z"))
      .orderBy("vec_id", "dim")
  }
}
