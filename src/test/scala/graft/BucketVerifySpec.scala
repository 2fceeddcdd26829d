package graft

import org.apache.spark.sql.{GraftSql, Row}
import org.apache.spark.sql.functions._

/** The inverted-index bucket-verify expressions
  * ([[graft.expressions.SelfBucketPairs]] /
  * [[graft.expressions.BuildBucketIndex]] /
  * [[graft.expressions.ProbeBucketIndex]]) and the one-pass entropy
  * statistics ([[graft.expressions.CharEntropyStats]]) are IDENTITY
  * rewrites of higher-order-function / join formulations that x2, x103,
  * x104 and x66 previously executed — each spec here pins the new
  * expression against the exact Spark formulation it replaced, on
  * fixtures that exercise the boundary semantics (τ filter, self-pairs,
  * duplicate fingerprint elements, ordering, zero-overlap pairs,
  * multi-byte and astral-plane code points). The end-to-end operator
  * values are separately oracle-gated; these specs localize any future
  * drift to the expression itself. */
class BucketVerifySpec extends SparkSpec {
  import graft.expressions.{BuildBucketIndex, CharEntropyStats, ProbeBucketIndex, SelfBucketPairs}

  private val Tau = 0.2

  test("SelfBucketPairs == double-explode + array_intersect pairwise verify " +
      "(cross pairs, self-pairs, tau filter, dup-fp dedup, gk ordering)") {
    import spark.implicits._
    // g1/g2: strong overlap (in); g2: gsz=2 self-pair (in, jaccard 1);
    // g3: zero overlap with everything (enumerated by neither form);
    // g4: duplicate fp element (array_intersect dedups — so must we);
    // g5: 1-element overlap with g1 -> jaccard 1/12 < tau (pairwise
    // enumerates then filters; inverted enumerates then filters — both
    // must drop it).
    val members = Seq(
      ("g1", 1L, Seq(1L, 2L, 3L), 3L),
      ("g2", 2L, Seq(2L, 3L, 4L), 3L),
      ("g3", 1L, Seq(9L, 10L), 2L),
      ("g4", 1L, Seq(1L, 2L, 3L, 3L), 4L),
      ("g5", 1L, Seq(3L, 50L, 51L, 52L, 53L, 54L, 55L, 56L, 57L), 9L))
      .toDF("gk", "gsz", "fpa", "n")
    val ms = members.agg(collect_list(
      struct(col("gk"), col("gsz"), col("fpa"), col("n"))).as("ms"))
    val got = ms.select(explode(GraftSql.column(SelfBucketPairs(
        GraftSql.expression(col("ms")), Tau))).as("p"))
      .select("p.gk_a", "p.gk_b", "p.inter", "p.jaccard")
      .collect().toSet
    val ref = ms
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.gk") < col("b.gk") ||
        (col("a.gk") === col("b.gk") && col("a.gsz") >= 2))
      .withColumn("inter",
        size(array_intersect(col("a.fpa"), col("b.fpa"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("a.n") + col("b.n") - col("inter")).cast("double"))
      .filter(col("jaccard") >= Tau)
      .select(col("a.gk"), col("b.gk"), col("inter"), col("jaccard"))
      .collect().toSet
    assert(got === ref)
    // the fixture exercised every branch: a kept cross pair, the kept
    // self-pair, and nothing from the zero-overlap / sub-tau groups
    assert(got.map(r => (r.getString(0), r.getString(1))) ===
      Set(("g1", "g2"), ("g1", "g4"), ("g2", "g2"), ("g2", "g4")))
  }

  test("BuildBucketIndex + ProbeBucketIndex == per-candidate array_intersect " +
      "(tau filter, dup-fp dedup on both sides, zero-overlap member absent)") {
    import spark.implicits._
    val base = Seq(
      (10L, Seq(1L, 2L, 3L), 3L),
      (11L, Seq(7L, 8L), 2L),                 // zero overlap with the probe
      (12L, Seq(1L, 2L, 3L, 3L), 4L),         // dup fp element on the base side
      (13L, Seq(2L, 60L, 61L, 62L, 63L, 64L, 65L, 66L, 67L), 9L)) // sub-tau
      .toDF("base_id", "fp", "n")
    val probeFp = Seq(2L, 3L, 4L, 2L)          // dup fp element on the probe side
    val probeN = 4L
    val idx = base.agg(collect_list(
        struct(col("base_id"), col("fp"), col("n"))).as("ms"))
      .select(GraftSql.column(BuildBucketIndex(
        GraftSql.expression(col("ms")))).as("idx"))
    val got = idx.select(explode(GraftSql.column(ProbeBucketIndex(
        GraftSql.expression(typedLit(probeFp)),
        GraftSql.expression(lit(probeN)),
        GraftSql.expression(col("idx")), Tau))).as("m"))
      .select("m.base_id", "m.inter", "m.nb", "m.jaccard")
      .collect().toSet
    val ref = base
      .withColumn("inter",
        size(array_intersect(typedLit(probeFp), col("fp"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (lit(probeN) + col("n") - col("inter")).cast("double"))
      .filter(col("jaccard") >= Tau)
      .select(col("base_id"), col("inter"), col("n"), col("jaccard"))
      .collect().toSet
    assert(got === ref)
    assert(got.map(_.getLong(0)) === Set(10L, 12L))
  }

  test("ProbeBucketIndex null index (no kept bucket) propagates null through " +
      "explode_outer — the x104 no-candidate verdict row") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L))).toDF("doc_id", "fp_d")
      .withColumn("idx", lit(null).cast(
        graft.expressions.BucketVerify.IndexType))
      .select(col("doc_id"),
        explode_outer(GraftSql.column(ProbeBucketIndex(
          GraftSql.expression(col("fp_d")),
          GraftSql.expression(lit(2L)),
          GraftSql.expression(col("idx")), Tau))).as("m"))
    val rows = df.collect()
    assert(rows.length === 1 && rows(0).getLong(0) === 1L &&
      rows(0).isNullAt(1))
  }

  test("CharEntropyStats == the HOF formulation it replaced, including " +
      "multi-byte and astral-plane code points") {
    import spark.implicits._
    val sc = graft.operators.TextAnalysis.IdfScale
    val texts = Seq(
      "hello world",
      "æøå ÆØÅ æøå",
      "aaaa",
      "𝄞 music 𝄞𝄞", // U+1D11E musical clef
      "мир мир abc",
      "x",
      "", // split('','') = [''] — the identity must hold on empties too
      "   ")
    val d = texts.toDF("text")
    val oldForm = d
      .withColumn("chars", split(col("text"), ""))
      .withColumn("n", size(col("chars")).cast("long"))
      .withColumn("cnts", expr(
        "transform(array_distinct(chars), c -> CAST(size(filter(chars, x -> x = c)) AS BIGINT))"))
      .withColumn("s_scaled", expr(
        s"""aggregate(cnts, 0L, (a, c) ->
           |  a + c * CAST(floor(ln(CAST(c AS DOUBLE)) * $sc.0 + 0.5) AS BIGINT))""".stripMargin))
      .select(col("text"), col("n"),
        size(col("cnts")).cast("long").as("n_distinct"), col("s_scaled"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val newForm = d
      .withColumn("st", GraftSql.column(CharEntropyStats(
        GraftSql.expression(col("text")), sc)))
      .select(col("text"), col("st.n"), col("st.n_distinct"), col("st.s_scaled"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(newForm === oldForm)
    // astral char counts as ONE code point in both forms
    assert(newForm("𝄞 music 𝄞𝄞")._1 === 10L)
  }
}
