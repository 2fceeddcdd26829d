package graft

import org.apache.spark.sql.types._
import graft.queries.Tables

/** Pins the ENVIRONMENT assumption: every driver-generated parquet table
  * loads through [[Tables]] with exactly the Spark schema the 77-query
  * battery was written against. Round 7 lost 15 queries when the corpus
  * silently changed `events.ts`'s physical type between rounds — this
  * spec turns the next silent testdata/Spark shift into a named failure.
  */
class TablesSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, Sf)
      case other    => Tables.table(spark, Sf, other)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  test("events loads with ts canonicalized to TIMESTAMP (instant)") {
    assert(fields("events") === Map(
      "event_id" -> LongType,
      "ts" -> TimestampType, // Tables.events dispatch, whatever the file has
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType))
  }

  test("events.ts dispatch yields live values, all three corpus SFs") {
    // not just sf0.001: the generation shift must be caught wherever the
    // bench (sf0.1) and verify (sf0.01) runs read
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                  "/root/testdata/sf0.1")) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType === TimestampType, d)
      assert(ev.filter(ev("ts").isNotNull).limit(1).count() === 1L, d)
    }
  }

  test("relational tables load with the expected schema") {
    assert(fields("region") === Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields("nation") === Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields("customer") === Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields("supplier") === Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields("part") === Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assert(fields("orders") === Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 loads
      // NTZ; the battery + oracle both treat these as naive-UTC
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
    assert(fields("lineitem") === Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("document/embedding tables load with the expected schema") {
    assert(fields("documents") === Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields("embeddings") === Map(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }
}
