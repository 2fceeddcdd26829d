package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}
import graft.queries.Relational

/** Round-8 additions: CDC last-write-wins compaction (x59), winsorized
  * re-aggregation (x60), deterministic epoch shuffle-sharding (x61) and
  * the ANN recall self-eval (x58). Value-exactness is gated by the DuckDB
  * oracles; these pin the fixture-level semantics the oracle corpus
  * cannot isolate (ties, clip boundaries, permutation laws). */
class StateAndSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("latestState: lexicographic (ts, event_id) max; ties broken by event_id; out-of-order input") {
    val ev = Seq(
      // user 1 "view": event 3 is oldest, events 1/2 tie on ts —
      // event_id 2 must win regardless of row order or its value
      (2L, 10L, 1L, "view", 2.0),
      (3L, 5L, 1L, "view", 9.0),
      (1L, 10L, 1L, "view", 1.0),
      (4L, 7L, 2L, "click", 4.0)
    ).toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Relational.latestStateFrom(ev).collect()
    assert(out.length === 2)
    val u1 = out(0)
    assert(u1.getLong(0) === 1L && u1.getString(1) === "view")
    assert(u1.getLong(3) === 2L, "ts tie must resolve to the higher event_id")
    assert(u1.getDouble(4) === 2.0)
    assert(u1.getLong(5) === 3L)
    val u2 = out(1)
    assert(u2.getLong(3) === 4L && u2.getLong(5) === 1L)
  }

  test("winsorize: values AT the clip bound are not clipped; sums reflect clipped values") {
    // 21 values 0..20 → interpolated p05 = 1.0, p95 = 19.0 exactly:
    // only 0 and 20 clip; 1.0 and 19.0 sit ON the bounds and stay
    val ev = (0 to 20).map(v => ("a", v.toDouble)).toDF("event_type", "value")
    val out = Relational.winsorizeFrom(ev).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 21L)                  // n_rows
    assert(r.getLong(2) === 1L, "only 0 clips low")
    assert(r.getLong(3) === 1L, "only 20 clips high")
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 19.0)
    // clipped sum: 0→1, 1..19 unchanged, 20→19
    assert(r.getDouble(6) === 210.0)
    assert(r.getDouble(7) === 10.0)
  }

  test("shuffleShards: a reproducible permutation; epochs decorrelate; positions are contiguous per shard") {
    val d = graft.queries.Tables.documents(spark, Sf).select("doc_id")
    val e1 = Curation.shuffleShardsFrom(d, 1).cache()
    // permutation: every doc exactly once, shards within range
    assert(e1.count() === 500)
    assert(e1.select("doc_id").distinct().count() === 500)
    assert(e1.filter(col("shard") < 0 || col("shard") >= Curation.NumShards)
      .count() === 0)
    // contiguous in-shard positions: max(pos) == shard size, min == 1
    val byShard = e1.groupBy("shard").agg(
      count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
    assert(byShard.filter(col("mn") =!= 1L || col("mx") =!= col("n"))
      .count() === 0)
    // determinism: same epoch → identical assignment
    val e1b = Curation.shuffleShardsFrom(d, 1)
    assert(e1.except(e1b).count() === 0)
    // a different epoch is a different permutation (most docs move)
    val e2 = Curation.shuffleShardsFrom(d, 2)
    val moved = e1.select(col("doc_id"), col("shard").as("s1"))
      .join(e2.select(col("doc_id"), col("shard").as("s2")), "doc_id")
      .filter(col("s1") =!= col("s2")).count()
    assert(moved > 300, s"epoch change must reshuffle; only $moved of 500 moved")
    e1.unpersist()
  }

  test("annRecall: one row per query; hits bounded by k; ppm is exact integer arithmetic") {
    val r = Similarity.annRecall(spark, Sf).collect()
    assert(r.length === 10)
    r.foreach { row =>
      assert(row.getLong(1) === Similarity.RecallK.toLong)
      val hits = row.getLong(2)
      assert(hits >= 0L && hits <= Similarity.RecallK)
      assert(row.getLong(3) === hits * 1000000L / Similarity.RecallK)
    }
    // the index must be better than useless on this corpus: some query
    // recovers at least one exact neighbor through the probed cells
    assert(r.map(_.getLong(2)).sum > 0L)
    graft.util.OperatorCaches.release(spark)
  }
}
