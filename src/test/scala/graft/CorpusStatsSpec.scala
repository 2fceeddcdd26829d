package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

/** Fixture-level semantics for the cross-source statistics battery
  * (x69–x71): JS closed forms at the distribution extremes, 8-gram
  * overlap bookkeeping, and skip-gram window pair enumeration. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("sourceDivergence: identical distributions → JS ≈ 0; disjoint vocabularies → JS = ln 2") {
    val d = Seq(
      ("s1", "a b c a"), ("s2", "a b c a"),    // identical
      ("s3", "x y x y")                        // disjoint from both
    ).toDF("source", "text")
    val out = CorpusStats.sourceDivergenceFrom(d)
      .select("source_a", "source_b", "n_common_terms", "js_nats")
      .as[(String, String, Long, Double)].collect().toSeq
    val byPair = out.map { case (a, b, n, j) => ((a, b), (n, j)) }.toMap
    val (n12, js12) = byPair(("s1", "s2"))
    assert(n12 === 3L)
    assert(math.abs(js12) < 1e-5, s"identical sources JS=$js12")
    // disjoint pairs share no terms → no inner-join row → absent from
    // the output (the closed-form would be exactly ln 2); the operator
    // reports COMMON-support pairs only, and the spec pins that contract
    assert(!byPair.contains(("s1", "s3")) && !byPair.contains(("s2", "s3")),
      "disjoint-vocabulary pairs must not fabricate a common-support row")
  }

  test("sourceDivergence: JS is positive, symmetric in construction, and bounded by ln 2") {
    val d = Seq(
      ("sa", "a a a b"), ("sb", "a b b b"), ("sc", "a b c d")
    ).toDF("source", "text")
    val out = CorpusStats.sourceDivergenceFrom(d)
      .select("source_a", "source_b", "js_nats").as[(String, String, Double)]
      .collect()
    assert(out.length === 3)
    out.foreach { case (a, b, js) =>
      assert(js > 0.0 && js < math.log(2.0) + 1e-9, s"($a,$b) js=$js")
      assert(a < b, "pairs canonically ordered")
    }
  }

  test("sourceOverlap: shared 8-grams counted once per source; jaccard over distinct sets") {
    val eight = (1 to 8).map(i => s"w$i").mkString(" ")     // one 8-gram
    val nine = (1 to 9).map(i => s"w$i").mkString(" ")      // two 8-grams
    val other = (11 to 18).map(i => s"v$i").mkString(" ")
    val d = Seq(
      ("s1", nine),            // grams: [w1..w8], [w2..w9]
      ("s1", eight),           // duplicate gram within s1 → distinct once
      ("s2", eight),           // shares [w1..w8]
      ("s2", other),           // plus one private gram
      ("s3", "too short")
    ).toDF("source", "text")
    val out = CorpusStats.sourceOverlapFrom(d)
      .select("source_a", "source_b", "n_shared", "n_a", "n_b", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("s1", "s2", 1L, 2L, 2L, 1.0 / 3.0)))
  }

  test("skipgramCooc: window-3 ordered pairs enumerated exactly") {
    // "a b c d": pairs (a,b)(a,c)(a,d)(b,c)(b,d)(c,d) — all within w=3;
    // repeat the doc 10× so every pair clears the MinCooc floor, and
    // append one doc whose extra (a,b) pushes that pair to 11
    val d = (Seq.fill(10)("a b c d") :+ "a b").toDF("text")
    val out = CorpusStats.skipgramCoocFrom(d)
      .select("w1", "w2", "cnt").as[(String, String, Long)].collect().toSeq
    val expected = Seq(
      ("a", "b", 11L), ("a", "c", 10L), ("a", "d", 10L),
      ("b", "c", 10L), ("b", "d", 10L), ("c", "d", 10L))
      .sortBy { case (w1, w2, c) => (-c, w1, w2) }
    assert(out === expected)
  }

  test("skipgramCooc: pairs beyond the window are not emitted") {
    // distance 4 between a and e in "a b c d e": (a,e) must be absent
    val d = Seq.fill(20)("a b c d e").toDF("text")
    val pairs = CorpusStats.skipgramCoocFrom(d)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(!pairs.contains(("a", "e")))
    assert(pairs.contains(("a", "d")) && pairs.contains(("b", "e")))
  }

  test("lengthDrift: exact two-sample KS against the corpus, integer-scaled") {
    // srcA lengths {1,1,2,2}, srcB {3,3,4,4}; corpus = all 8.
    // At len 2: F_A = 1, F = 1/2 → |4·8 − 4·4| = 16, ks = 16/32 = 0.5.
    // By symmetry srcB peaks at len 2 as well (F_B = 0, F = 1/2).
    val d = Seq(
      ("A", 1L), ("A", 1L), ("A", 2L), ("A", 2L),
      ("B", 3L), ("B", 3L), ("B", 4L), ("B", 4L)
    ).toDF("source", "n_chars")
    val out = CorpusStats.lengthDriftFrom(d)
      .select("source", "n_src", "ks_scaled", "ks_at_len", "ks_stat")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    Seq("A", "B").foreach { s =>
      val (n, ks, at, stat) = out(s)
      assert(n === 4L)
      assert(ks === 16L, s"$s ks_scaled=$ks")
      assert(at === 2L, s"$s ks_at_len=$at")
      assert(stat === 0.5)
    }
  }

  test("lengthDrift: identical per-source distributions → KS exactly 0") {
    val d = Seq("A", "B", "C").flatMap(s =>
      Seq((s, 5L), (s, 7L), (s, 7L), (s, 11L))).toDF("source", "n_chars")
    val out = CorpusStats.lengthDriftFrom(d).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("ks_scaled") === 0L)
      assert(r.getAs[Double]("ks_stat") === 0.0)
    }
  }
}
