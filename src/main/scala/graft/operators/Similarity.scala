package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.queries.Tables

/** Similarity search over the `embeddings` table (`array<float>`, dim 64).
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path is
  * random-hyperplane LSH, where the signature becomes the shuffle key and
  * each query only scans its bucket. Both are pure higher-order-function
  * expressions — vectors never leave Tungsten rows, no UDF, no collect.
  */
object Similarity {

  val Dim = 64
  private val Planes = 4
  private val TopK = 5

  private def queriesAndCorpus(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"), col("label"))
    (q, c)
  }

  /** Brute-force cosine top-k for a small query set: broadcast the queries
    * against the corpus scan (at 100 TB: broadcast-join, one corpus pass
    * for ALL queries, partial top-k per partition via the rank window). */
  def bruteForceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (q, c) = queriesAndCorpus(spark, sfDir)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "label", "cos", "rank")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN: 4 deterministic hyperplanes → 16 buckets; a query
    * compares only against its own bucket. Recall trades against the
    * number of planes; at scale, buckets are the partition key so each
    * executor handles a bucket slice without a cross join. */
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val (q, c) = queriesAndCorpus(spark, sfDir)
    val qs = q.withColumn("sig", lshSignature(col("qv"), Planes, Dim))
    val cs = c.withColumn("sig", lshSignature(col("nv"), Planes, Dim))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(qs).join(cs, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("sig", "query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs. Correctness baseline is the
    * triangular all-pairs compare (fine at unit scale); the LSH variant
    * above is the 100 TB shape — see SURVEY.md §7.2 step 5. */
  def embeddingDups(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") > 0.35)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }
}
