package graft.core

/** Unsigned byte-wise UTF-8 string comparison — Spark SQL's string
  * ordering (UTF8String.compareTo). Every driver-local replay that
  * breaks ties on a string (LPA labels, Louvain communities, triangle
  * orientation) must use THIS order, not Java's UTF-16 compareTo, or the
  * replay diverges from the distributed min-struct/least-greatest
  * expressions on non-ASCII ids (they agree on ASCII; supplementary
  * characters differ).
  */
object Utf8Order {

  def compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  def lt(a: String, b: String): Boolean = compare(a, b) < 0

  implicit val ordering: Ordering[String] =
    (a: String, b: String) => compare(a, b)
}
