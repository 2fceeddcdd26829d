package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Frequency}

/** Fixture-level semantics for the frequency battery (x65–x68). The
  * oracle gates value-exactness at corpus scale; these pin the
  * algorithmic guarantees the corpus cannot isolate: the Misra–Gries
  * superset property under adversarial partitioning and tiny
  * capacities, entropy closed forms, BM25 monotonicity, and the
  * asymmetric-containment-vs-jaccard distinction. */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("heavyHitters: exact equality with the naive groupBy under tiny capacity and hostile partitioning") {
    // 60% a, 25% b, rest long tail — with k=4 the MG summaries trim
    // constantly; exactness must survive any partition assignment
    val terms = (Seq.fill(600)("a") ++ Seq.fill(250)("b") ++
      (1 to 150).map(i => s"t$i")).zipWithIndex
    for (parts <- Seq(1, 3, 8)) {
      // sort by index hash so each partitioning interleaves differently
      val df = terms.sortBy { case (_, i) => (i * 2654435761L) % 997 }
        .map(_._1).toDF("term").repartition(parts)
      val k = 4
      val got = Frequency.heavyHittersFrom(df, k)
        .select("term", "cnt").as[(String, Long)].collect().toSeq
      val n = terms.size
      val want = terms.groupBy(_._1).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * (k + 1) > n }
        .toSeq.sortBy { case (t, c) => (-c, t) }
      assert(got === want, s"parts=$parts")
    }
  }

  test("heavyHitters: mgSurvivors per-partition guarantee — every local heavy term survives") {
    val stream = Seq.fill(50)("x") ++ (1 to 40).map(i => s"u$i") ++
      Seq.fill(30)("y")
    val out = Frequency.mgSurvivors(3)(stream.iterator).toSet
    // n=120, k=3 → anything with count > 30 must survive: x (50). y is
    // at the 30 boundary (not guaranteed); no term may crash or dup.
    assert(out.contains("x"))
    assert(out.size <= 3)
  }

  test("charEntropy: bounded by [0, ln k]; matches an independent Scala recompute within quantization error") {
    val rows = Frequency.charEntropy(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = graft.queries.Tables.documents(spark, Sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val k = r.getAs[Long]("n_distinct_chars").toDouble
      val h = r.getAs[Double]("entropy_nats")
      assert(h >= -1e-9 && h <= math.log(k) + 1e-6, s"doc $id out of [0, ln k]")
      // independent unquantized recompute (plain Shannon entropy)
      val cs = texts(id).groupBy(identity).values.map(_.length.toDouble)
      val n = cs.sum
      val exact = math.log(n) - cs.map(c => c * math.log(c)).sum / n
      assert(math.abs(h - exact) < 1e-4, s"doc $id: quantized $h vs exact $exact")
    }
  }

  test("bm25: more query-term mass ranks higher; scores positive; rank dense from 1") {
    val out = Frequency.bm25(spark, Sf).collect()
    assert(out.length === Frequency.Bm25TopK)
    val ranks = out.map(_.getAs[Long]("rank")).toSeq
    assert(ranks === (1L to Frequency.Bm25TopK.toLong))
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse, "scores non-increasing in rank")
    assert(scores.forall(_ > 0.0))
    assert(out.forall(_.getAs[Long]("n_terms_hit") <= Frequency.QueryTerms.size))
  }

  test("containment: a sub-document scores ~1 against its host while jaccard stays low") {
    val host = (1 to 60).map(i => s"w$i").mkString(" ")
    val sub = (1 to 12).map(i => s"w$i").mkString(" ")  // strict prefix
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, host), (2L, sub), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentFrom(docs)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect()
    assert(cont.toSeq === Seq((1L, 2L, 1.0)), "sub fully contained in host")
    val jac = Dedup.ngramJaccardFrom(docs)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    // same pair passes the loose 0.03 jaccard floor but with a LOW score:
    // 10 shared shingles / 58 union ≈ 0.17 — the asymmetric signal is
    // the containment=1.0, which symmetric jaccard cannot express
    assert(jac.forall { case (_, _, j) => j < 0.2 })
  }
}
