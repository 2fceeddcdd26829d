package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature of a shingle set in ONE pass over the
  * array: element b (0-based) is `min over shingles s of md5('s<b>:' ‖ s)`
  * as a lowercase hex string — bit-for-bit the value of
  * `min(md5(concat('s<b>:', s)))` over the exploded shingle rows, which
  * remains the oracle formulation (DuckDB `min(md5(...))` over
  * `unnest`).
  *
  * Why an expression and not explode→groupBy: the signature is a per-ROW
  * reduction, not a cross-row one. The explode formulation shuffles one
  * row per corpus SHINGLE through the aggregation's exchange (24M rows /
  * 1.4e8 md5s at 500 k docs — the sf10 spot-run measured this stage
  * spilling, BASELINE.md round-8 table: x2 at 16.4×/decade from exactly
  * this memory constant). Here the same md5s run inside a narrow
  * projection, one output row per document, NO exchange — the hash work
  * is unchanged (it is the definition) but the shuffle volume drops from
  * Θ(corpus shingles) to zero.
  *
  * Equality with the explode form, piecewise: Spark's `md5` is the
  * lowercase hex of MD5 over the UTF-8 bytes; `min` on StringType is
  * UTF8String binary order, which on lowercase-hex ASCII is exactly
  * unsigned-lexicographic order of the 16 digest bytes (hex encoding is
  * order-preserving byte→2 chars). So the loop compares raw digests
  * unsigned and hex-encodes only the per-seed winner. Null shingle
  * elements are skipped (SQL `min` ignores nulls); an empty / all-null
  * array yields a null signature (the exploded doc vanishes from the
  * groupBy — no row, which its consumers treat identically to null here
  * because [[graft.operators.Dedup.shingleTableFrom]] filters empties
  * first).
  *
  * Codegen: one static call per row ([[MinHashSig.compute]]) so the
  * surrounding projection stays inside whole-stage codegen; the MD5 work
  * dominates and gains nothing from inlining.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.MinHashSig.compute($c, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Unsigned-lexicographic digest comparison: a < b. Both length 16. */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Per-row kernel (shared by eval and codegen). Returns null for an
    * empty or all-null shingle array. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numHashes)
    val prefixes = new Array[Array[Byte]](numHashes)
    var b = 0
    while (b < numHashes) {
      prefixes(b) = s"s$b:".getBytes("UTF-8")
      b += 1
    }
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val sBytes = shingles.getUTF8String(i).getBytes
        b = 0
        while (b < numHashes) {
          md.reset()
          md.update(prefixes(b))
          md.update(sBytes)
          val d = md.digest()
          if (mins(b) == null || lessThan(d, mins(b))) mins(b) = d
          b += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null
    val out = new Array[AnyRef](numHashes)
    b = 0
    while (b < numHashes) {
      val d = mins(b)
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HexDigits((d(j) & 0xff) >>> 4)
        hex(2 * j + 1) = HexDigits(d(j) & 0x0f)
        j += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }
}
