package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.operators.{Dedup, Similarity}

/** Plan-shape regression guards: the scale contracts the operators claim
  * (PLANS.md) asserted against the actual plans, so a future edit cannot
  * silently reintroduce a forced broadcast of an unbounded intermediate,
  * a per-query rank window, or an all-pairs nested-loop join. */
class PlanShapeSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    // other suites cache() these operators' DataFrames on the shared
    // session; a lingering cache substitutes InMemoryRelation into the
    // plans under inspection and hides the join shapes
    spark.catalog.clearCache()
  }

  private def logicalHints(df: DataFrame): Seq[ResolvedHint] =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withoutAqe[T](body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  test("dedup joins carry NO broadcast hints (AQE decides from runtime stats)") {
    // x2/x3: the candidate/index relations are data-dependent and unbounded
    // at scale; only the optimizer may choose broadcast, never a hint
    assert(logicalHints(Dedup.minhashLsh(spark, Sf)).isEmpty)
    assert(logicalHints(Dedup.ngramJaccardFrom(
      graft.queries.Tables.documents(spark, Sf))).isEmpty)
    assert(logicalHints(Dedup.simhashPairs(spark, Sf)).isEmpty)
  }

  test("ANN top-k has no rank window and no single-partition exchange") {
    Seq(
      Similarity.bruteForceTopK(spark, Sf),
      Similarity.lshTopK(spark, Sf),
      Similarity.ivfTopK(spark, Sf)
    ).foreach { df =>
      val p = physical(df)
      // partial-aggregated bounded heap, not a per-query window rank over
      // the candidate set (ivfTopK's window is the 16-row-per-vector
      // centroid ranking, which is bounded — the TOP-K stage must not
      // window). The top-k ObjectHashAggregate must be present...
      assert(p.contains("ObjectHashAggregate"), s"no partial top-k in:\n$p")
      // ...and nothing may funnel through a single partition
      assert(!p.contains("SinglePartition"), s"single-partition stage in:\n$p")
    }
  }

  test("round-3 operators: no corpus hints, sharded packing window, map-only quant") {
    import graft.operators.{Curation, Quantization, TextAnalysis}
    // x25/x29: doc-keyed joins stay unhinted — the per-doc stats / overlap
    // relations are corpus-sized; only AQE may choose broadcast
    assert(logicalHints(TextAnalysis.repetition(spark, Sf)).isEmpty)
    assert(logicalHints(Curation.decontaminate(spark, Sf)).isEmpty)
    // x26: the running-sum window partitions by the hash shard — a global
    // (unpartitioned) window would serialize the corpus into one task.
    // Assert on the WindowExec's actual partitionSpec, not a string match.
    val winSpecs = withoutAqe {
      Curation.packSequences(spark, Sf).queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec
      }
    }
    assert(winSpecs.nonEmpty, "no WindowExec in the packing plan")
    winSpecs.foreach { spec =>
      assert(spec.exists(_.toString.contains("shard")),
        s"window not shard-partitioned: $spec")
    }
    assert(!physical(Curation.packSequences(spark, Sf))
      .contains("SinglePartition"), "single-partition stage in packing plan")
    // x27: pure map stage — the only exchange is the output ordering
    val quantPlan = withoutAqe {
      Quantization.int8Stats(spark, Sf).queryExecution.executedPlan
    }
    val exchanges = quantPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // repartition crutch + final sort, nothing else (no groupBy/join)
    assert(exchanges.size <= 2, s"unexpected exchanges in:\n$quantPlan")
    assert(!quantPlan.toString.contains("HashAggregate"),
      s"aggregation crept into the map stage:\n$quantPlan")
  }

  test("round-5 batch ops: tfidf rank-limits before the shuffle, chunk/fim are map-only, " +
      "encode joins the vocab broadcast") {
    import graft.operators.{Curation, TextAnalysis}
    // x35: Spark's WindowGroupLimit must prune to top-k per partition
    // BEFORE the window exchange (the partial-top-k analogue of a partial
    // agg), and the rank window must partition by doc — never global
    val tfidf = withoutAqe {
      TextAnalysis.tfidfTerms(spark, Sf).queryExecution.executedPlan
    }
    assert(tfidf.toString.contains("WindowGroupLimit"),
      s"no pre-shuffle rank limit in tfidf plan:\n$tfidf")
    tfidf.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      assert(w.partitionSpec.exists(_.toString.contains("doc_id")),
        s"tfidf window not doc-partitioned: ${w.partitionSpec}")
    }
    // x36/x40: pure map stages — no join, no aggregation; only the
    // repartition fan-out and the output sort may exchange
    Seq(Curation.chunkOverlap(spark, Sf), Curation.fimSplit(spark, Sf))
      .foreach { df =>
        val p = withoutAqe { df.queryExecution.executedPlan }
        assert(p.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }.isEmpty, s"join crept into map-only plan:\n$p")
        assert(!p.toString.contains("HashAggregate"),
          s"aggregation crept into map-only plan:\n$p")
      }
    // x39: the vocab side is bounded post-agg output — the per-token join
    // must resolve broadcast, never a corpus-sized shuffled join
    val enc = withoutAqe {
      TextAnalysis.encodeDocs(spark, Sf).queryExecution.executedPlan
    }
    val joins = enc.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      assert(j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]
        || j.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec],
        s"non-broadcast join in encode plan: ${j.getClass.getSimpleName}")
    }
  }

  test("embedding near-dup is candidate-join shaped: pairs join on cell, " +
      "nested loops only against the bounded centroid table") {
    val df = Similarity.embeddingDups(spark, Sf)
    val p = physical(df)
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the pair-generation stage is an EQUI-join whose key is the cell id
    assert(p.contains("Join [cell#"), s"no cell equi-join in:\n$p")
    // any nested-loop join must be the deliberate vector×centroid cross,
    // whose broadcast side is bounded by the NumCells centroid filter —
    // never a corpus×corpus pair product
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    // AQE's wrapper hides the join nodes from collect(); the static plan
    // is the shape under guard here
    val nljs = withoutAqe {
      Similarity.embeddingDups(spark, Sf)
        .queryExecution.executedPlan.collect {
          case j: BroadcastNestedLoopJoinExec => j
        }
    }
    assert(nljs.nonEmpty) // the assignment stage exists
    nljs.foreach { j =>
      val build = j.buildSide match {
        case BuildRight => j.right
        case BuildLeft => j.left
      }
      val s = build.toString
      assert(s.contains(s"< ${Similarity.NumCells}"),
        s"nested-loop build side is not the bounded centroid table:\n$s")
    }
  }

  test("round-5 operators: rebalance has no rank window, scrub is a pure projection") {
    import graft.operators.{Curation, TextAnalysis}
    // x31: the keep decision must stay a threshold test — the exact-count
    // alternative (rank per language, keep first N) funnels the largest
    // language through one task; no WindowExec may appear
    val rebalance = withoutAqe {
      Curation.langRebalance(spark, Sf).queryExecution.executedPlan
    }
    assert(rebalance.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"rank window crept into rebalance:\n$rebalance")
    // the per-lang dims are the only joins and they are bounded;
    // corpus×corpus pairing must never appear
    assert(!rebalance.toString.contains("CartesianProduct"),
      s"cartesian in rebalance:\n$rebalance")
    // x32: narrow projection — no join, no aggregation; only the
    // repartition fan-out and the output sort may exchange
    val scrub = withoutAqe {
      TextAnalysis.piiScrub(spark, Sf).queryExecution.executedPlan
    }
    assert(scrub.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"join crept into pii scrub:\n$scrub")
    assert(!scrub.toString.contains("HashAggregate"),
      s"aggregation crept into pii scrub:\n$scrub")
  }
}
