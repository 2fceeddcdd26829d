package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-pipeline operators over the sf0.001 corpus (500 docs / 500 vecs) —
  * invariant checks; value-exactness is covered by the DuckDB oracles. */
class OperatorsSpec extends SparkSpec {

  test("exact dedup: groups partition the corpus; reps are minimal ids") {
    val d = Dedup.exact(spark, Sf).cache()
    val n = d.count()
    assert(n === 500)
    assert(d.filter(col("exact_rep") > col("doc_id")).count() === 0)
    assert(d.filter(col("exact_group_size") < 1).count() === 0)
  }

  test("minhash LSH pairs at >=0.03 jaccard agree with the exact ngram-jaccard pairs") {
    // LSH output is thresholded at 0.02, ngramJaccard at 0.03 — compare on
    // the common >=0.03 region, where LSH survivors must be exact pairs.
    val lsh03 = Dedup.minhashLsh(spark, Sf)
      .filter(col("jaccard") >= 0.03)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(spark, Sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh03.nonEmpty)
    assert(lsh03.subsetOf(exact))
  }

  test("simhash: 16-bit signatures; banded pairs have hamming <= 3") {
    val sig = Dedup.simhash(spark, Sf)
    assert(sig.filter(col("simhash") < 0 || col("simhash") > 0xffffL).count() === 0)
    val pairs = Dedup.simhashPairs(spark, Sf)
    assert(pairs.filter(col("hamming") > 3).count() === 0)
  }

  test("brute-force ANN: k results per query, cosine within [-1,1], ranked") {
    val r = Similarity.bruteForceTopK(spark, Sf).cache()
    assert(r.groupBy("query_id").count().filter(col("count") =!= 5).count() === 0)
    assert(r.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count() === 0)
    // rank 1 has the max cosine per query
    val top = r.filter(col("rank") === 1).select("query_id", "cos")
      .withColumnRenamed("cos", "top_cos")
    val joined = r.join(top, "query_id")
    assert(joined.filter(col("cos") > col("top_cos") + 1e-15).count() === 0)
  }

  test("LSH ANN only pairs vectors in the same bucket") {
    val r = Similarity.lshTopK(spark, Sf)
    assert(r.count() > 0)
    assert(r.filter(col("sig") < 0 || col("sig") > 15).count() === 0)
  }

  test("text stats: ratios in [0,1], token counts consistent") {
    val t = TextAnalysis.textStats(spark, Sf).cache()
    assert(t.count() === 500)
    assert(t.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(t.filter(col("uniq_ratio") <= 0 || col("uniq_ratio") > 1).count() === 0)
    assert(t.filter(col("n_uniq_tokens") > col("n_tokens")).count() === 0)
    assert(t.filter(col("n_chars_actual") =!= col("n_chars")).count() === 0)
  }

  test("langId predicts a language for every doc") {
    val l = TextAnalysis.langId(spark, Sf)
    assert(l.filter(col("pred_lang").isin("en", "de", "es", "fr")).count() === 500)
  }

  test("fingerprints are stable across runs") {
    val a = TextAnalysis.fingerprint(spark, Sf).collect()
    val b = TextAnalysis.fingerprint(spark, Sf).collect()
    assert(a.map(_.toSeq.toList).toSeq === b.map(_.toSeq.toList).toSeq)
  }

  test("multimodal: meta matches decode stage on byte counts; decode is deterministic") {
    val meta = Multimodal.mediaMeta(spark, Sf).select("doc_id", "n_bytes", "media_type")
    val dec = Multimodal.decodeFeatures(spark, Sf)
      .select(col("doc_id"), col("n_bytes").as("dec_bytes"), col("media_type").as("dec_type"),
        col("width"), col("height"), col("n_frames"))
    val j = meta.join(dec, "doc_id").cache()
    assert(j.count() === 500)
    assert(j.filter(col("n_bytes") =!= col("dec_bytes")).count() === 0)
    assert(j.filter(col("media_type") =!= col("dec_type")).count() === 0)
    assert(j.filter(col("width") < 16 || col("height") < 16).count() === 0)
    assert(j.filter(col("media_type") =!= "video" && col("n_frames") =!= 1).count() === 0)
  }
}
