package graft

import graft.operators.Dedup

/** Focused guard for the round-15 x101 convergence rewrite: the star
  * loop now stops on a STRUCTURAL test of the just-materialized round
  * (disjoint min-rooted stars) instead of `count() + except()` equality
  * with the previous round. The fixture specs in OperatorsSpec prove the
  * labels; this spec pins the structural test itself and the
  * early-exit path (an input that is already a star forest). */
class CcConvergenceSpec extends SparkSpec {

  import spark.implicits._

  private def edges(es: Seq[(Long, Long)]) = es.toDF("u", "v")

  test("isStarFixpoint: star forests and the empty set are fixpoints") {
    assert(Dedup.isStarFixpoint(edges(Seq.empty)))
    assert(Dedup.isStarFixpoint(edges(Seq((3L, 1L), (2L, 1L), (7L, 5L)))))
    assert(Dedup.isStarFixpoint(edges(Seq((2L, 1L))))) // single edge
  }

  test("isStarFixpoint: chains, double parents and root-as-child are not") {
    // 2 is both a child (of 1) and a parent (of 3): a chain, not a star
    assert(!Dedup.isStarFixpoint(edges(Seq((2L, 1L), (3L, 2L)))))
    // 3 has two parents
    assert(!Dedup.isStarFixpoint(edges(Seq((3L, 1L), (3L, 2L)))))
    // clique fragment: 3 appears as child twice and 2 as child and parent
    assert(!Dedup.isStarFixpoint(
      edges(Seq((2L, 1L), (3L, 1L), (3L, 2L)))))
  }

  test("ccFrom on an already-star-forest input exits on the pre-loop " +
      "check with correct labels") {
    val ids = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val out = Dedup.ccFrom(ids, edges(Seq((3L, 1L), (2L, 1L), (7L, 5L))))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    graft.util.OperatorCaches.release(spark)
    assert(out === Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      5L -> ((5L, 2L)), 7L -> ((5L, 2L)),
      9L -> ((9L, 1L))))
  }
}
