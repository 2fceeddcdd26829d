package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins
import graft.queries.{Relational, Tables}

class TemporalJoinsSpec extends SparkSpec {

  test("asof join: every click row present; matched view is at or before the click") {
    val clicks = Tables.events(spark, Sf)
      .filter(col("event_type") === "click").count()
    val r = TemporalJoins.asofJoin(spark, Sf).cache()
    assert(r.count() === clicks)
    // matched rows: view ts <= click ts; misses are the epoch-0 sentinel
    assert(r.filter(col("asof_view_id") =!= -1L &&
      col("asof_view_ts") > col("ts")).count() === 0)
    assert(r.filter(col("asof_view_id") === -1L &&
      col("asof_view_ts") =!= timestamp_seconds(lit(0))).count() === 0)
    // the as-of match must be the MOST RECENT prior view: no other view
    // for the same user may sit strictly between the match and the click
    val views = Tables.events(spark, Sf).filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val gaps = r.filter(col("asof_view_id") =!= -1L)
      .join(views, Seq("user_id"))
      .filter(col("vts") > col("asof_view_ts") && col("vts") <= col("ts"))
    assert(gaps.count() === 0)
  }

  test("range join counts views in (ts-1h, ts] exactly") {
    val r = TemporalJoins.rangeJoin(spark, Sf).cache()
    val clicks = Tables.events(spark, Sf)
      .filter(col("event_type") === "click").count()
    assert(r.count() === clicks)
    // brute-force recompute on the small corpus
    val views = Tables.events(spark, Sf).filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val brute = Tables.events(spark, Sf).filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
      .join(views, Seq("user_id"), "left")
      .withColumn("hit",
        col("vts").isNotNull &&
        unix_micros(col("vts")) > unix_micros(col("ts")) - 3600000000L &&
        unix_micros(col("vts")) <= unix_micros(col("ts")))
      .groupBy("user_id", "event_id")
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_brute"))
    val joined = r.join(brute, Seq("user_id", "event_id"))
    assert(joined.count() === clicks)
    assert(joined.filter(col("n_views_1h") =!= col("n_brute")).count() === 0)
  }

  test("weighted-avg UDAF matches the decimal-exact column formulation") {
    val got = Relational.udafWeightedAvg(spark, Sf)
      .select("l_returnflag", "wavg_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Tables.lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg((sum((col("l_extendedprice") * col("l_quantity")).cast("decimal(25,6)"))
        .cast("double") /
        sum(col("l_quantity").cast("decimal(25,6)")).cast("double")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) => assert(v === want(k), s"flag=$k") }
  }

  test("weighted-avg UDAF is partitioning-independent") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i * 0.5, (i % 7).toDouble)).toDF("v", "w")
    val wavg = org.apache.spark.sql.functions.udaf(graft.functions.WeightedAvg,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble))
    val a = df.coalesce(1).agg(wavg(col("v"), col("w"))).head.getDouble(0)
    val b = df.repartition(13).agg(wavg(col("v"), col("w"))).head.getDouble(0)
    assert(a === b)
  }
}
