package graft.queries

/** Macro layer for the DuckDB oracle SQL in [[graft.SparkEntry.oracleSql]].
  *
  * The oracle battery needs one numeric bridge applied consistently: Spark
  * aggregates DOUBLE columns through exact `DECIMAL(25,6)` sums and then
  * surfaces the result as a correctly-rounded DOUBLE
  * (`Decimal.toDouble` → `BigDecimal.doubleValue`, correctly rounded).
  * DuckDB's direct `CAST(DECIMAL AS DOUBLE)` divides the int128 payload by
  * the scale power in double arithmetic — up to a couple of ulp off once
  * the sum exceeds 2^53 — so every decimal-valued aggregate must instead
  * round-trip through VARCHAR (`CAST(CAST(x AS VARCHAR) AS DOUBLE)`: the
  * decimal→text conversion is exact and text→double is correctly rounded,
  * matching Spark bit-for-bit).
  *
  * Round 6 applied that bridge by hand at ~35 call sites
  * (commit `6c6e3da`); VERDICT r6 #7 asked for it to live in ONE place.
  * Oracle SQL now writes three macros and [[expand]] lowers them:
  *
  *   - `V2D(expr)`  → `CAST(CAST(expr AS VARCHAR) AS DOUBLE)` —
  *     exact-value-to-text-to-correctly-rounded-double. `expr` is copied
  *     verbatim (it may span lines and carry an `OVER` clause).
  *   - `DEC6(expr)` → `CAST(expr AS DECIMAL(25,6))` — the exact-sum
  *     accumulator type for DOUBLE-valued measures.
  *   - `DEC0(expr)` → `CAST(expr AS DECIMAL(25,0))` — the exact-sum
  *     accumulator for pre-scaled integer measures (quantized embeddings).
  *
  * The canonical decimal-sum-to-double shape is therefore
  * `V2D(SUM(DEC6(x)))`, windowed as `V2D(SUM(DEC6(x)) OVER (...))`.
  * `OracleDialectSpec` pins the lowering golden-for-golden against the
  * round-6 hand-written text and lints `SparkEntry.scala` so no inline
  * bridge or precision literal can creep back in.
  */
object OracleDialect {

  private val Macros: Seq[(String, String => String)] = Seq(
    "V2D("  -> (b => s"CAST(CAST($b AS VARCHAR) AS DOUBLE)"),
    "DEC6(" -> (b => s"CAST($b AS DECIMAL(25,6))"),
    "DEC0(" -> (b => s"CAST($b AS DECIMAL(25,0))")
  )

  /** Lower every macro in `sql` to its DuckDB form. Macros nest
    * (`V2D(SUM(DEC6(x)))`); lowering is outermost-first and loops until
    * no macro remains, which terminates because each step removes one
    * macro head and the expansions contain none.
    */
  def expand(sql: String): String = {
    var out = sql
    var again = true
    while (again) {
      again = false
      Macros.foreach { case (head, lower) =>
        var idx = out.indexOf(head)
        while (idx >= 0) {
          val bodyStart = idx + head.length
          val bodyEnd = closingParen(out, bodyStart, head, idx)
          out = out.substring(0, idx) +
            lower(out.substring(bodyStart, bodyEnd)) +
            out.substring(bodyEnd + 1)
          again = true
          idx = out.indexOf(head)
        }
      }
    }
    out
  }

  /** Expand every value of an oracle map (identity on macro-free SQL). */
  def expandAll(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k -> expand(v) }

  /** Index of the `)` closing the macro argument that starts at `from`. */
  private def closingParen(s: String, from: Int, head: String, at: Int): Int = {
    var depth = 1
    var i = from
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _   =>
      }
      i += 1
    }
    require(depth == 0,
      s"unbalanced $head macro at offset $at: ${s.substring(at, math.min(s.length, at + 80))}")
    i - 1
  }
}
