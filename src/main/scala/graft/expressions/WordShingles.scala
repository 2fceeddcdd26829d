package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column as one compiled pass —
  * the codegen replacement for the higher-order-function pipeline
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * element_at...)))`, which evaluates an interpreted lambda per shingle
  * with three `element_at` tree-walks each. Shingling is the entry stage
  * of every dedup operator, i.e. a per-document map over the whole corpus
  * at 100 TB — exactly the place an interpreted expression hurts most.
  *
  * Semantics are identical to the HOF form (the bit-identity spec checks
  * it on the real corpora):
  *  - tokens are `split(text, " ")` with Java regex limit -1 (consecutive
  *    spaces yield empty tokens, trailing empties kept — matching Spark's
  *    `StringSplit`);
  *  - fewer than n tokens → empty array;
  *  - shingle i = tokens[i..i+n) joined by single spaces;
  *  - distinct keeps FIRST occurrence order (like `array_distinct`).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.build(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.WordShingles.build($c.toString(), $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Shared by the interpreted and generated paths (one tight JVM loop;
    * codegen's win over the HOF is skipping the per-element interpreted
    * lambda machinery, not this arithmetic). */
  def build(text: String, n: Int): ArrayData = {
    val toks = text.split(" ", -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }
}
