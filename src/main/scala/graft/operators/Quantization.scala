package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    Tables.embeddingsParallel(spark, sfDir)
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
    scaledVectorsFrom(Tables.embeddingsParallel(spark, sfDir))

  private[graft] def scaledVectorsFrom(emb: DataFrame): DataFrame =
    OperatorCaches.persist(
      emb.select(col("vec_id"), expr(
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
  /** The one corpus-scale stage behind x38/x73/x74, computed exactly
    * once per operator call: upper-triangle pair products Σ svᵢ·svⱼ
    * (`pairs`), per-dimension sums Σ svᵢ (`dimSums`), and the row count
    * (`n`) — all exact DECIMAL(25,0) integer sums over the persisted
    * [[scaledVectors]] relation. Everything downstream of this pass is
    * bounded-size (≤Dim²) algebra. */
  private case class MomentPass(pairs: DataFrame, dimSums: DataFrame,
                                n: DataFrame)

  private def momentPass(spark: SparkSession, sfDir: String): MomentPass = {
    val scaled = scaledVectors(spark, sfDir)
    val once = scaled.select(col("vec_id"), col("sarr"),
      posexplode(col("sarr")).as(Seq("i", "svi")))
    // The three outputs are BOUNDED (≤Dim²/2, Dim, 1 rows) but each costs
    // a corpus-scale aggregation — and their consumers reference them
    // more than once ([[eigenRelation]] mirrors `pairs` through a union
    // and broadcasts `dimSums` twice; x74 runs a second momentPass for
    // the mean array). Persisting the bounded results makes every
    // re-reference a ≤2080-row cache read instead of a repeated corpus
    // pass (measured: x73/x74 ran the Dim²/2 decimal aggregation twice
    // before this — optimization round 14, guide §1.2/§5).
    val pairs = OperatorCaches.persist(once
      .select(col("i"), col("svi"), posexplode(col("sarr")).as(Seq("j", "svj")))
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(sum((col("svi") * col("svj")).cast("decimal(25,0)")).as("spp")))
    val dimSums = OperatorCaches.persist(once.groupBy("i")
      .agg(sum(col("svi").cast("decimal(25,0)")).as("sum_i")))
    val n = OperatorCaches.persist(scaled.agg(count(lit(1)).as("n_vecs")))
    MomentPass(pairs, dimSums, n)
  }

  def covarianceStats(spark: SparkSession, sfDir: String): DataFrame = {
    val MomentPass(pairs, dimSums, n) = momentPass(spark, sfDir)
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

  /** Power-iteration step count shared by the Spark plan and the DuckDB
    * oracle. The gate is hash-exact at ANY count (both engines run the
    * identical unrolled steps); 8 is enough for a stable leading
    * direction on this corpus. PcaSpec guards the MATH independently of
    * the oracle (which runs the same algorithm and so proves only engine
    * parity): unit norm, relative eigen-residual < 0.1 (measured
    * 0.048–0.067 on these near-isotropic corpora, λ1/λ2 = 1.01–1.07;
    * algebra bugs are O(1)), and Rayleigh capture ≥ 85% of the true λ1
    * from a driver-side eigensolve of the collected 64×64 matrix. */
  val PcaIters = 8

  /** The 1-row (n_vecs, m, u, eigenvalue) relation behind [[pcaPower]] /
    * [[pcaProject]]: the exact-integer covariance surrogate matrix
    * `A = n·Spp − Sᵢ·Sⱼ` (∝ covariance — the direction is scale-free),
    * assembled dense (Dim² doubles in ONE row), then [[PcaIters]]
    * max-abs-normalized power steps as a single narrow projection.
    *
    * Scale shape: the ONLY corpus-scale work is the x38 moment pass
    * (Dim²/2 re-explode, partial-agg groupBy — ≤2080 partial rows per
    * partition cross the wire); matrix assembly and the iteration run
    * on ≤Dim² rows collapsing to 1, and every fold is a fixed-order
    * left fold (`aggregate` over index-ordered `zip_with` products), so
    * the result is bit-identical to the oracle's `list_reduce` at any
    * partitioning. The eigenvalue converts back to covariance units by
    * the exact factor n²·CovScale². */
  private def eigenRelation(spark: SparkSession, sfDir: String): DataFrame = {
    val MomentPass(pairs, dimSums, n) = momentPass(spark, sfDir)
    // A_ij as an exact integer (DECIMAL(38,0) here, HUGEINT in the
    // oracle — both exact far past 1e9 vectors), surfaced as the
    // correctly-rounded double both engines agree on.
    val upper = pairs
      .join(broadcast(dimSums), "i")
      .join(broadcast(dimSums.select(col("i").as("j"), col("sum_i").as("sum_j"))), "j")
      .join(broadcast(n))
      .select(col("i"), col("j"), col("n_vecs"),
        (col("spp").cast("decimal(38,0)") * col("n_vecs")
          - col("sum_i").cast("decimal(38,0)") * col("sum_j"))
          .cast("double").as("a"))
    val full = upper
      .unionByName(upper.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("n_vecs"), col("a")))
    val rows = full.groupBy("i", "n_vecs")
      .agg(expr("transform(sort_array(collect_list(struct(j, a))), s -> s.a)")
        .as("rowv"))
    val mat = rows.groupBy("n_vecs")
      .agg(expr("transform(sort_array(collect_list(struct(i, rowv))), s -> s.rowv)")
        .as("m"))
    // The whole [[PcaIters]]-step iteration runs inside ONE expression
    // over the 1-row dense matrix ([[graft.expressions.PowerIter]] —
    // bit-parity with the unrolled HOF formulation it replaces, see its
    // scaladoc). The unrolled form needed one persist boundary per step
    // (project-collapse otherwise grows the tree 3^PcaIters-fold): 8
    // cache materializations and 8 interpreted HOF towers for 8·Dim²
    // fused multiply-adds on one row (optimization round 14, guide §1.2).
    val pw = org.apache.spark.sql.GraftSql.column(
      graft.expressions.PowerIter(
        org.apache.spark.sql.GraftSql.expression(col("m")), PcaIters))
    mat
      .withColumn("pw", pw)
      .select(col("n_vecs"), col("m"), col("pw.u").as("u"),
        (col("pw.ray")
          / (col("n_vecs").cast("double") * col("n_vecs").cast("double"))
          / lit(CovScale.toDouble * CovScale.toDouble)).as("eigenvalue"))
  }

  /** x73: TOP PRINCIPAL COMPONENT via power iteration — the dimension-
    * reduction direction a 100 TB embedding store computes after the x38
    * covariance pass (PCA whitening, variance-explained triage, 1-D
    * curriculum ordering all start here). One corpus pass builds the
    * exact integer moment matrix; [[PcaIters]] unrolled matvec steps on
    * the 1-row dense matrix — no driver loop, no collect — yield the
    * unit leading eigenvector and its Rayleigh eigenvalue, hash-exact
    * against the oracle's identical unrolled recursion. */
  def pcaPower(spark: SparkSession, sfDir: String): DataFrame =
    eigenRelation(spark, sfDir)
      .select(col("n_vecs"), col("eigenvalue"),
        posexplode(col("u")).as(Seq("dim", "u_comp")))
      .select(col("dim").cast("long").as("dim"), col("u_comp"),
        col("eigenvalue"), col("n_vecs"))
      .orderBy("dim")

  /** x74: PRINCIPAL-COMPONENT PROJECTION — every embedding's coordinate
    * along the [[pcaPower]] direction, mean-centered: the 1-D corpus map
    * (outlier triage, curriculum buckets, balanced sharding) and the
    * first step of any rank-k reduction.
    *
    * Scale shape: the eigenvector and the 64-entry mean array are 1-row
    * broadcasts cross-joined into a narrow per-row projection over the
    * corpus scan; the dot product is a fixed-order left fold, so the
    * coordinates are bit-identical to the oracle at any partitioning. */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    val eig = eigenRelation(spark, sfDir).select(col("u"))
    val MomentPass(_, dimSums, n) = momentPass(spark, sfDir)
    val means = dimSums.join(broadcast(n))
      .withColumn("mean_i",
        col("sum_i").cast("double") / lit(CovScale.toDouble)
          / col("n_vecs").cast("double"))
      .groupBy()
      .agg(expr("transform(sort_array(collect_list(struct(i, mean_i))), s -> s.mean_i)")
        .as("means"))
    Tables.embeddingsParallel(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(eig))
      .crossJoin(broadcast(means))
      // x is the RAW embedding, while means/u derive from the CovScale-
      // quantized moment pass (means are up to 5e-7/dim off the true
      // mean) — deliberate mixed precision: the quantized pass is what
      // makes the moments exact-integer and both engines bit-identical
      // (the determinism contract), and the oracle centers identically.
      .withColumn("coord",
        expr("aggregate(zip_with(zip_with(transform(embedding, x -> cast(x as double)), " +
          "means, (x, mn) -> x - mn), u, (c, ui) -> c * ui), " +
          "cast(0.0 as double), (acc, x) -> acc + x)"))
      .select(col("vec_id"), col("coord"))
      .orderBy("vec_id")
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
  /** Result size for [[embeddingOutliers]]. */
  val OutlierTopK = 50

  /** x77: EMBEDDING OUTLIERS by diagonal Mahalanobis distance — the
    * top-[[OutlierTopK]] vectors by Σᵢ zᵢ² under the corpus's own
    * per-dimension moments (x45's z-scores, folded per vector): the
    * triage pass that surfaces corrupt encodes, wrong-modality rows,
    * and distribution-breaking vectors before they poison ANN training
    * or k-means seeding.
    *
    * Scale shape: the per-dimension moment table (Dim rows) collapses
    * to ONE row of sorted mean/var arrays broadcast into a pure map
    * stage (the x74 means pattern); the per-vector score is a
    * fixed-order fold over the array — order-free by construction, not
    * by commutativity — and the top-k is `orderBy+limit` →
    * TakeOrderedAndProject (per-partition heaps; no corpus-wide rank
    * window). σ² = 0 dimensions contribute 0, like x45. Ties break by
    * vec_id; every input double (z via the [[CovScale]]-quantized
    * moments) is bit-identical to the oracle's, so the ranking is too. */
  def embeddingOutliers(spark: SparkSession, sfDir: String): DataFrame =
    embeddingOutliersFrom(
      Tables.embeddingsParallel(spark, sfDir))

  /** [[embeddingOutliers]] over an arbitrary (vec_id, embedding)
    * relation — the testable core (fixtures plant one distribution-
    * breaking vector and check it ranks first). */
  private[graft] def embeddingOutliersFrom(emb: DataFrame): DataFrame = {
    val scaled = scaledVectorsFrom(emb)
    val once = scaled.select(col("vec_id"),
      posexplode(col("sarr")).as(Seq("i", "sv")))
    val n = scaled.agg(count(lit(1)).as("n_vecs"))
    val sc = CovScale.toDouble
    val moments = once.groupBy("i").agg(
        sum(col("sv").cast("decimal(25,0)")).as("sum_i"),
        sum((col("sv") * col("sv")).cast("decimal(25,0)")).as("sumsq_i"))
      .join(broadcast(n))
      .withColumn("mean_i",
        col("sum_i").cast("double") / lit(sc) / col("n_vecs").cast("double"))
      .withColumn("var_i",
        col("sumsq_i").cast("double") / lit(sc * sc)
          / col("n_vecs").cast("double")
          - col("mean_i") * col("mean_i"))
      .groupBy()
      .agg(
        expr("transform(sort_array(collect_list(struct(i, mean_i))), s -> s.mean_i)")
          .as("means"),
        expr("transform(sort_array(collect_list(struct(i, var_i))), s -> s.var_i)")
          .as("vars"))
    val top = scaled
      .crossJoin(broadcast(moments))
      .withColumn("score", expr(
        s"""aggregate(
           |  zip_with(zip_with(transform(sarr, s -> CAST(s AS DOUBLE) / ${sc}d),
           |                    means, (v, mn) -> v - mn),
           |           vars, (c, vr) -> if(vr <= 0.0d, 0.0d, c * c / vr)),
           |  cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin))
      .select(col("vec_id"), col("score"))
      .orderBy(desc("score"), col("vec_id")).limit(OutlierTopK)
    top
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), col("vec_id"))).cast("long"))
      .select("rank", "vec_id", "score")
      .orderBy("rank")
  }

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
