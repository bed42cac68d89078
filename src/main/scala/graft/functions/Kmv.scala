package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values (KMV) distinct-count sketch over 64-bit hashes
  * (Bar-Yossef et al. 2002; the "bottom-k" estimator). The aggregate
  * keeps the k smallest DISTINCT hash values in UNSIGNED order; the
  * k-th smallest value U_k estimates the distinct count as
  * (k-1) / (U_k / 2^64).
  *
  * This is the 100-TB distinct-count path: the buffer is a bounded
  * sorted array of ≤ k longs, so partial aggregation combines map-side
  * and only k longs per (group × partition) ever enter the exchange —
  * unlike countDistinct, which shuffles the full distinct value set.
  * The sketch is a semilattice (merge = union + truncate), so it is
  * insensitive to partitioning and input order; exact-replayable in
  * SQL as `row_number() OVER (ORDER BY hash) = k` over the distinct
  * hashes, which is how the DuckDB oracle checks it bit-for-bit.
  *
  * Hashes are SIGNED longs ([[Hash64.md5_64]]); ordering is unsigned
  * (java.lang.Long.compareUnsigned) so the estimator's [0, 2^64)
  * uniformity assumption holds.
  */
object Kmv {

  /** Sorted (unsigned order) distinct hashes, length ≤ k. */
  final case class Buf(hs: Array[Long])

  /** Insert h into the bounded sorted buffer; no-op if already present
    * or not among the k smallest seen so far. */
  private def insert(k: Int, b: Buf, h: Long): Buf = {
    val a = b.hs
    val n = a.length
    // reject fast: buffer full and h >= current max (unsigned)
    if (n == k && java.lang.Long.compareUnsigned(h, a(n - 1)) >= 0) return b
    // unsigned binary search for the insertion point
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(a(mid), h)
      if (c == 0) return b // already present
      else if (c < 0) lo = mid + 1
      else hi = mid
    }
    val m = math.min(n + 1, k)
    val out = new Array[Long](m)
    System.arraycopy(a, 0, out, 0, lo)
    out(lo) = h
    System.arraycopy(a, lo, out, lo + 1, m - lo - 1)
    Buf(out)
  }

  /** Typed Aggregator: Long hash in, sorted ≤k-long sketch array out. */
  def aggregator(k: Int): Aggregator[Long, Buf, Array[Long]] =
    new Aggregator[Long, Buf, Array[Long]] {
      def zero: Buf = Buf(Array.empty)
      def reduce(b: Buf, h: Long): Buf = insert(k, b, h)
      def merge(x: Buf, y: Buf): Buf = {
        var acc = x
        var i = 0
        while (i < y.hs.length) { acc = insert(k, acc, y.hs(i)); i += 1 }
        acc
      }
      def finish(b: Buf): Array[Long] = b.hs
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** Untyped column form for DataFrame groupBy over a LongType hash. */
  def sketch(k: Int): Column => Column = {
    val f = udaf(aggregator(k))
    h => f(h)
  }
}
