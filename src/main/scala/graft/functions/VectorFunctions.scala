package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, using
  * higher-order functions (zip_with/aggregate) — codegen-friendly, no UDFs.
  *
  * Numerical determinism: every reduction is a *sequential left fold in
  * array order over doubles*, so the identical expression in another
  * engine (the DuckDB oracle) produces bit-identical IEEE results — no
  * tolerance needed in compares.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. Random-plane LSH and brute-force top-k both build
    * on this single expression. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component r(p, i) — a Lehmer
    * LCG step on the flattened index, mapped to [-0.5, 0.5). Integer
    * arithmetic + one double division, so any engine reproduces it.
    * dim: vector dimensionality; p: plane index. */
  def hyperplaneSql(p: Int, dim: Int): String =
    s"transform(sequence(0, ${dim - 1}), i -> " +
    s"cast((1103515245 * (cast($p as bigint) * $dim + i) + 12345) % 2147483647 as double)" +
    s" / 2147483647.0 - 0.5)"

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: one sign bit
    * per plane, packed into a long. At 100 TB scale this is the shuffle
    * key that turns O(N²) similarity into per-bucket work. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = expr(hyperplaneSql(p, dim))
      when(dot(vec, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
