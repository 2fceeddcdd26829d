package graft

import org.apache.spark.sql.{DataFrame, Row}
import graft.operators.Similarity
import graft.util.OperatorCaches

/** The ANN entry points take a caller-supplied query relation (VERDICT r7
  * #6 — the harness's `vec_id < 10` is a bench contract, not a semantic).
  * Runs a NON-PREFIX query set through every search path and checks (a)
  * exactly the requested queries come back, (b) for a query that is also
  * in the harness default set, the custom-set result is row-identical to
  * the default-set result — the query relation changes WHICH queries run,
  * never what any one query returns.
  */
class QuerySetSpec extends SparkSpec {

  private val Ids = Seq(3L, 17L, 23L)

  private def idsDf: DataFrame = {
    import spark.implicits._
    Ids.toDF("vec_id")
  }

  private def rowsFor(df: DataFrame, qid: Long): Seq[Row] =
    df.filter(df("query_id") === qid).collect().toSeq

  private def check(custom: DataFrame, default: DataFrame): Unit = {
    val got = custom.select("query_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got === Ids, "exactly the requested query ids")
    // query 3 is in both sets: identical rows either way
    assert(rowsFor(custom, 3L) === rowsFor(default, 3L))
    OperatorCaches.release(spark)
  }

  test("brute-force cosine top-k honors a non-prefix query set") {
    check(Similarity.bruteForceTopK(spark, Sf, Some(idsDf)),
      Similarity.bruteForceTopK(spark, Sf))
  }

  test("LSH top-k honors a non-prefix query set") {
    val custom = Similarity.lshTopK(spark, Sf, Some(idsDf))
    // LSH keys results by (sig, query_id); project to the shared shape
    val got = custom.select("query_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got === Ids)
    assert(rowsFor(custom, 3L) ===
      rowsFor(Similarity.lshTopK(spark, Sf), 3L))
    OperatorCaches.release(spark)
  }

  test("IVF top-k (stand-in centroids) honors a non-prefix query set") {
    check(Similarity.ivfTopK(spark, Sf, Some(idsDf)),
      Similarity.ivfTopK(spark, Sf))
  }

  test("IVF top-k (trained centroids) honors a non-prefix query set") {
    check(Similarity.ivfTopKTrained(spark, Sf, Some(idsDf)),
      Similarity.ivfTopKTrained(spark, Sf))
  }
}
