package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.pipeline.{Ingest, Views}

/** Ingest (P1–P4) + the MV cascade (Q2–Q4) on fixture envelopes. */
class PipelineSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def envelopes: DataFrame = {
    import spark.implicits._
    Seq(
      ("globex.supprt.u1.chat9.bot.user.view.ctx1",
        """{"text":"hi","meta":"view","id":"m1","timestamp":1704067200}""",
        ts("2024-01-15 10:30:45.123"), 1L),
      ("globex.supprt.u2",
        """{"no":"keys"}""", ts("2024-02-01 00:00:00"), 2L),
      ("globex.crmabc.u3.chat7",
        "not json at all", ts("2024-02-29 23:59:59.999"), 3L)
    ).toDF("subject", "data", "metaTimestamp", "streamSeq")
  }

  test("envelopeToRaw produces the raw schema with second-truncated timestamps") {
    val raw = Ingest.envelopeToRaw(envelopes)
    assert(raw.schema.fieldNames.toSeq === Schemas.raw.fieldNames.toSeq)
    val rows = raw.orderBy("sequence").collect()
    assert(rows(0).getAs[Timestamp]("timestamp") === ts("2024-01-15 10:30:45"))
    assert(rows(0).getAs[String]("chat_id") === "chat9")
    assert(rows(1).getAs[String]("chat_id") === "")
    assert(rows(2).getAs[String]("chat_id") === "chat7")
    // metadata JSON mirrors json.Marshal(msg.Metadata()) shape
    val meta = rows(0).getAs[String]("metadata")
    assert(meta.contains(""""Stream":1""") && meta.contains(""""NumDelivered":1"""))
  }

  test("subjectFilter matches only the configured prefix (S2)") {
    val raw = Ingest.envelopeToRaw(envelopes)
    assert(Ingest.subjectFilter(raw, "globex.supprt").count() === 2)
    assert(Ingest.subjectFilter(raw, "globex.crmabc").count() === 1)
    assert(Ingest.subjectFilter(raw, "globex.supprt.u1").count() === 1)
  }

  test("deriveAnalytics: 17 columns, CH defaults, chat_id==session_id quirk") {
    val a = Views.deriveAnalytics(Ingest.envelopeToRaw(envelopes))
    assert(a.schema.fieldNames.toSeq === Schemas.analytics.fieldNames.toSeq)
    val rows = a.orderBy("subject").collect()
    val full = rows.find(_.getAs[String]("subject").endsWith("ctx1")).get
    assert(full.getAs[String]("message_text") === "hi")
    assert(full.getAs[String]("client_code") === "globex")
    assert(full.getAs[String]("project_code") === "supprt")
    assert(full.getAs[String]("user_id") === "u1")
    assert(full.getAs[String]("session_id") === "chat9")
    assert(full.getAs[String]("session_id") === full.getAs[String]("chat_id"))
    assert(full.getAs[Timestamp]("message_timestamp") === ts("2024-01-01 00:00:00"))
    val short = rows.find(_.getAs[String]("subject") === "globex.supprt.u2").get
    assert(short.getAs[String]("message_text") === "")
    assert(short.getAs[String]("session_id") === "")
    assert(short.getAs[Timestamp]("message_timestamp") === ts("1970-01-01 00:00:00"))
  }

  test("union of per-stream views covers all rows exactly once (Q3)") {
    val raw = Ingest.envelopeToRaw(envelopes)
    val u = Views.allStreams(Seq(
      Ingest.subjectFilter(raw, "globex.supprt"),
      Ingest.subjectFilter(raw, "globex.crmabc")))
    assert(u.count() === 3)
    assert(u.select("sequence").distinct().count() === 3)
  }

  test("writePartitioned lays out month partitions (Q1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    Views.writePartitioned(Ingest.envelopeToRaw(envelopes), s"$dir/raw",
      Seq("timestamp", "chat_id", "sequence"))
    val back = spark.read.parquet(s"$dir/raw")
    assert(back.count() === 3)
    // partition-column type inference reads "202401" back as int
    assert(back.select(col("month").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted === Array("202401", "202402"))
    // partition pruning: a month filter reads a single partition directory
    val pruned = back.filter(col("month") === "202401")
    assert(pruned.count() === 1)
  }

  test("Q9 idempotent DDL: bootstrap re-runs safely; catalog writes round-trip") {
    import graft.pipeline.Ddl
    // the quote in the warehouse name exercises the LOCATION literal
    // escaping (a raw interpolation would fail the bootstrap parse)
    val wh = java.nio.file.Files.createTempDirectory("graft_ddl'wh").toString
    Ddl.ensureTables(spark, wh)
    Ddl.ensureTables(spark, wh) // init.sql re-run: IF NOT EXISTS, no error
    assert(Ddl.tables.forall { case (name, _, _) =>
      spark.catalog.tableExists(name) })
    val raw = Ingest.envelopeToRaw(envelopes)
    Ddl.insertPartitioned(raw, Ddl.AllStreams, Seq("timestamp", "sequence"))
    val got = spark.table(Ddl.AllStreams)
    assert(got.count() === 3)
    assert(got.select("month").distinct().collect().map(_.getString(0)).sorted
      === Array("202401", "202402"))
    // bootstrap again AFTER data: same table, data still served
    Ddl.ensureTables(spark, wh)
    assert(spark.table(Ddl.AllStreams).count() === 3)
    // dynamic partition overwrite: reloading only January leaves February
    val jan = raw.filter(col("timestamp") < lit(ts("2024-02-01 00:00:00")))
    assert(jan.count() === 1)
    Ddl.insertPartitioned(jan, Ddl.AllStreams, Seq("timestamp", "sequence"))
    assert(spark.table(Ddl.AllStreams).count() === 3)
    // the analytics table takes the derived MV through the catalog too
    Ddl.insertPartitioned(Views.deriveAnalytics(raw), Ddl.Analytics,
      Seq("timestamp"))
    assert(spark.table(Ddl.Analytics).count() === 3)
    assert(spark.table(Ddl.Analytics).schema.fieldNames.init.toSeq ===
      Schemas.analytics.fieldNames.toSeq)
  }

  test("ensureViews: SQL MV cascade resolves and matches Views.* (Q2-Q4)") {
    import graft.pipeline.Ddl
    val wh = java.nio.file.Files.createTempDirectory("graft_mv_wh").toString
    Ddl.ensureTables(spark, wh)
    val raw = Ingest.envelopeToRaw(envelopes)
    val supprt = Ingest.subjectFilter(raw, "globex.supprt")
    val crmabc = Ingest.subjectFilter(raw, "globex.crmabc")
    Ddl.insertPartitioned(supprt, Ddl.StreamSupprt, Seq("timestamp", "sequence"))
    Ddl.insertPartitioned(crmabc, Ddl.StreamCrmabc, Seq("timestamp", "sequence"))
    Ddl.ensureViews(spark)
    Ddl.ensureViews(spark) // CREATE OR REPLACE: idempotent re-bootstrap
    // Q2: pass-through views project exactly the raw columns
    assert(spark.table(Ddl.SupprtMv).schema.fieldNames.toSeq ===
      Schemas.raw.fieldNames.toSeq)
    assert(spark.table(Ddl.SupprtMv).count() === 2)
    assert(spark.table(Ddl.CrmabcMv).count() === 1)
    // Q3: the union view serves every stream row exactly once
    val uv = spark.table(Ddl.AllStreamsMv)
    assert(uv.schema.fieldNames.toSeq === Schemas.raw.fieldNames.toSeq)
    val expectUnion = Views.allStreams(Seq(supprt, crmabc))
    assert(uv.orderBy("sequence").collect().toSeq ===
      expectUnion.orderBy("sequence").collect().toSeq)
    // Q4: the SQL analytics view row-for-row equals the Scala derivation
    val av = spark.table(Ddl.AnalyticsMv)
    assert(av.schema.fieldNames.toSeq === Schemas.analytics.fieldNames.toSeq)
    assert(av.orderBy("subject").collect().toSeq ===
      Views.deriveAnalytics(expectUnion).orderBy("subject").collect().toSeq)
  }

  test("bucketed tables co-locate joins: no shuffle on either join side") {
    import graft.pipeline.Ddl
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schemaA = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val schemaB = StructType(Seq(StructField("k", LongType),
      StructField("w", LongType)))
    // clean slate: managed-table locations survive failed runs
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Ddl.ensureBucketed(spark, "bkt_a", schemaA, "k", 4)
    Ddl.ensureBucketed(spark, "bkt_a", schemaA, "k", 4) // idempotent
    Ddl.ensureBucketed(spark, "bkt_b", schemaB, "k", 4)
    (0L until 64L).map(i => (i, s"a$i")).toDF("k", "v")
      .write.mode("overwrite").insertInto("bkt_a")
    (0L until 64L).map(i => (i, i * 10)).toDF("k", "w")
      .write.mode("overwrite").insertInto("bkt_b")
    // disable broadcast for this assertion: the point is the bucket-aligned
    // sort-merge path two LARGE tables would take (a tiny test table would
    // otherwise broadcast and prove nothing about co-location)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      assert(joined.count() === 64)
      // the assertion reads the static plan (bucketed scans are decided
      // at planning time, before any adaptive re-optimization)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
