package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

import graft.expressions.{PolyHash, SimHash64, VecDot, WordShingles}

/** SQL surface for graft's custom Catalyst expressions.
  *
  * Two registration paths, same function list:
  *
  *  - cluster deployment: `spark.sql.extensions=graft.GraftExtensions`
  *    (the standard [[SparkSessionExtensions]] plug-in point — functions
  *    exist in every session of the application, including Thrift/Connect
  *    ones the library never sees);
  *  - embedded/library use: `GraftFunctions.register(spark)` on an
  *    already-running session (idempotent; [[graft.Service]] does this at
  *    bootstrap so catalog-table users can call them from plain SQL).
  *
  * All six functions are codegen'd expressions, so a SQL user pays the
  * same tight-loop cost as the Column DSL ([[graft.functions]]):
  *
  *  - `graft_polyhash(text)` — rolling polynomial content hash (LONG);
  *  - `graft_shingles(text[, n])` — distinct word n-gram set (default 3;
  *    n must be a positive integer literal — it shapes codegen);
  *  - `graft_vec_dot(a, b)` — Σaᵢbᵢ over two float/double arrays;
  *  - `graft_simhash64(text)` — one-pass 64-bit SimHash signature
  *    (4 seeded 16-bit simhashes concatenated);
  *  - `graft_cdc_chunks(text)` — content-defined chunk lengths
  *    (gear-style stateless cut rule);
  *  - `graft_ahash64(text)` — 64-bit average-hash perceptual fingerprint
  *    (64 index buckets thresholded against the global mean).
  */
object GraftFunctions {

  /** (identifier, info, builder) triples in the shape both
    * `FunctionRegistry.registerFunction` and
    * `SparkSessionExtensions.injectFunction` accept. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_polyhash"),
      info(classOf[PolyHash].getName, "graft_polyhash",
        "rolling polynomial hash of a string (mod 1e9+7)"),
      { case Seq(t) => PolyHash(t)
        case args => throw badArgs("graft_polyhash", "1 argument", args) }),
    (FunctionIdentifier("graft_shingles"),
      info(classOf[WordShingles].getName, "graft_shingles",
        "distinct word n-gram shingle set (n literal, default 3)"),
      { case Seq(t) => WordShingles(t, 3)
        case Seq(t, IntegerLiteral(n)) if n > 0 => WordShingles(t, n)
        case args => throw badArgs("graft_shingles",
          "(text) or (text, positive int literal)", args) }),
    (FunctionIdentifier("graft_vec_dot"),
      info(classOf[VecDot].getName, "graft_vec_dot",
        "dot product of two numeric arrays"),
      { // same float→double widening the Column DSL helper applies
        case Seq(a, b) => VecDot(toDoubleArray(a), toDoubleArray(b))
        case args => throw badArgs("graft_vec_dot", "2 arguments", args) }),
    (FunctionIdentifier("graft_simhash64"),
      info(classOf[SimHash64].getName, "graft_simhash64",
        "one-pass 64-bit SimHash of a string (4 seeded 16-bit packs)"),
      { case Seq(t) => SimHash64(t)
        case args => throw badArgs("graft_simhash64", "1 argument", args) }),
    (FunctionIdentifier("graft_cdc_chunks"),
      info(classOf[graft.expressions.CdcChunks].getName, "graft_cdc_chunks",
        "content-defined chunk lengths (gear-style stateless cut rule)"),
      { case Seq(t) => graft.expressions.CdcChunks(t)
        case args => throw badArgs("graft_cdc_chunks", "1 argument", args) }),
    (FunctionIdentifier("graft_ahash64"),
      info(classOf[graft.expressions.AHash64].getName, "graft_ahash64",
        "64-bit average-hash perceptual fingerprint (64 index buckets vs global mean)"),
      { case Seq(t) => graft.expressions.AHash64(t)
        case args => throw badArgs("graft_ahash64", "1 argument", args) }))

  private def toDoubleArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))

  private def info(className: String, name: String, usage: String) =
    new ExpressionInfo(className, null, name, usage, "")

  private def badArgs(name: String, want: String, got: Seq[Expression]) =
    new IllegalArgumentException(
      s"$name expects $want, got (${got.map(_.sql).mkString(", ")})")

  /** Register the functions into a live session's registry (idempotent —
    * re-registration replaces the same entries). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
    }
}

/** The `spark.sql.extensions` entry point (must be a class with a no-arg
  * constructor per the Spark contract). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(extensions.injectFunction)
}
