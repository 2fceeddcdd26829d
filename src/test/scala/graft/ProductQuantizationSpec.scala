package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuantization
import graft.operators.ProductQuantization.{CodebookSize, NumSubspaces, SubDim}
import graft.functions.VectorFunctions.{dotHof, l2sq, l2sqHof}
import graft.util.OperatorCaches

/** Product quantization: encoder invariants, the codegen'd L2² expression
  * against its interpreted reference fold, and ADC's defining property —
  * the ADC score of (query, vector) equals the exact dot of the query
  * with the vector's codebook RECONSTRUCTION (same terms, different
  * summation grouping, so compared under a tolerance; the oracle compare
  * is exact because both engines use the per-subspace grouping). */
class ProductQuantizationSpec extends SparkSpec {

  test("VecL2Sq matches the interpreted HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, -3.5f), Array(0.5f, -2.0f, 3.25f)),
      (Array(0.0f, 0.0f, 0.0f), Array(0.0f, 0.0f, 0.0f)),
      (Array(1e-7f, 2e7f, -1e-3f), Array(3.7f, -0.1f, 9.9f))
    ).toDF("a", "b")
    val rows = df.select(
      l2sq(col("a"), col("b")).as("fast"),
      l2sqHof(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("pq encode: one code per (vector, subspace), codes in range, " +
    "codebook vectors self-encode with zero error") {
    val enc = ProductQuantization.pqEncode(spark, Sf)
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    val rows = enc.collect()
    assert(rows.length === n * NumSubspaces)
    assert(rows.forall(r => r.getLong(2) >= 0 &&
      r.getLong(2) < math.min(CodebookSize.toLong, n)))
    assert(rows.forall(_.getDouble(3) >= 0.0))
    // a codebook vector's own subvector is at distance 0; with random
    // corpora no other entry ties, so it encodes to itself exactly
    rows.filter(_.getLong(0) < CodebookSize).foreach { r =>
      assert(r.getLong(2) === r.getLong(0), s"self-encode: $r")
      assert(r.getDouble(3) === 0.0)
    }
    OperatorCaches.release(spark)
  }

  test("adc equals dot(query, reconstruction) to fp-regrouping tolerance") {
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
    // reconstruction: concat of each subspace's chosen codebook subvector
    val unit = e
      .withColumn("u", expr(
        "transform(embedding, x -> cast(x as double) / " +
        "sqrt(aggregate(zip_with(embedding, embedding, (a, b) -> " +
        "cast(a as double) * cast(b as double)), cast(0 as double), " +
        "(acc, v) -> acc + v)))"))
      .select(col("vec_id"), col("u"))
    val enc = ProductQuantization.encodeFrom(unit)
    val cb = unit.filter(col("vec_id") < CodebookSize)
      .select(explode(sequence(lit(0), lit(NumSubspaces - 1))).as("sub"),
        col("vec_id").as("code"),
        col("u").as("cu"))
      .select(col("sub").cast("long").as("sub"), col("code"),
        expr(s"slice(cu, sub * $SubDim + 1, $SubDim)").as("cvec"))
    val recon = enc.join(cb, Seq("sub", "code"))
      .groupBy("vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cvec")))),
        x => x.getField("cvec"))).as("recon"))
    val adc = ProductQuantization.adcTopK(spark, Sf)
    val qs = unit.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val joined = adc.join(qs, "query_id")
      .join(recon.select(col("vec_id").as("neighbor_id"), col("recon")),
        "neighbor_id")
      .withColumn("exact", dotHof(col("qu"), col("recon")))
      .select(col("adc"), col("exact")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"adc=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
    OperatorCaches.release(spark)
  }

  test("adc top-k honors a non-prefix query set") {
    import spark.implicits._
    val ids = Seq(3L, 17L, 23L)
    val custom = ProductQuantization.adcTopK(spark, Sf, Some(ids.toDF("vec_id")))
    val default = ProductQuantization.adcTopK(spark, Sf)
    val got = custom.select("query_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got === ids)
    assert(custom.filter(col("query_id") === 3L).collect().toSeq ===
      default.filter(col("query_id") === 3L).collect().toSeq)
    OperatorCaches.release(spark)
  }
}
