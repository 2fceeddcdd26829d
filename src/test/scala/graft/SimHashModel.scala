package graft

/** Shared reference model for [[graft.expressions.SimHash16]]: split on
  * single spaces with empty tokens kept, per-token rolling polynomial
  * hash, ±1 sign sums per bit, sign-bit pack. Both the unit spec and the
  * ScalaCheck property validate the expression against THIS one model so
  * the convention can't drift between suites. */
object SimHashModel {

  def poly(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 1000000007L)

  def simhash(t: String): Long = {
    val cnt = new Array[Int](16)
    t.split(" ", -1).foreach { w =>
      val h = poly(w)
      (0 until 16).foreach(b => cnt(b) += (((h >> b) & 1L) * 2 - 1).toInt)
    }
    (0 until 16).filter(cnt(_) > 0).map(1L << _).sum
  }
}
