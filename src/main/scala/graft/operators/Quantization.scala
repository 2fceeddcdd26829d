package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables

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
}
