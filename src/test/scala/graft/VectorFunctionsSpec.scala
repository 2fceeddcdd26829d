package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {

  private def df2 = {
    import spark.implicits._
    Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
    ).toDF("a", "b")
  }

  test("dot/norm/cosine basics") {
    val r = df2.select(dot(col("a"), col("b")), cosine(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) === 0.0)
    assert(r(0).getDouble(1) === 0.0)
    assert(r(1).getDouble(0) === 14.0)
    assert(math.abs(r(1).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r(2).getDouble(1) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("codegen'd VecDot is bit-identical to the interpreted HOF fold") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = (0 until 200).map(_ =>
      (Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
      .select(dot(col("a"), col("b")).as("fast"), dotHof(col("a"), col("b")).as("ref"))
    // exact equality: same left-to-right IEEE accumulation order
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("lshSignature: same vector → same bucket; opposite vectors differ") {
    import spark.implicits._
    val v = (0 until 64).map(i => (i % 7 - 3).toFloat).toArray
    val neg = v.map(x => -x)
    val df = Seq(v, v, neg).toDF("v")
      .select(lshSignature(col("v"), 4, 64).as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) === sigs(1))
    // every plane flips sign (no zero dot products for this vector)
    assert(sigs(0) === (~sigs(2) & 0xfL))
    assert(sigs.forall(s => s >= 0 && s < 16))
  }
}
