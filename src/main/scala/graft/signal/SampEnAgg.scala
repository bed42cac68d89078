package graft.signal

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** Spark-native surfaces for sample entropy (SURVEY.md §7.3: the one
  * aggregate class that is genuinely not relational — order-dependent
  * O(n²) over the group):
  *
  *  - [[arrayUdf]]: array-column form — runs directly on the NATIVE
  *    `tokens` array with zero explode/shuffle of sequence points (the
  *    10^12-row posture for per-document features, SURVEY.md §7.4);
  *  - [[aggregator]]: typed Aggregator usable under groupBy/window for
  *    long-format points. The buffer collects the group's (ts, value)
  *    pairs — BOUNDED by the data model's per-entity sequence length —
  *    and sorts by ts at finish (shuffled input order must not change
  *    the result).
  */
object SampEnAgg {

  /** sampen over an array column (e.g. the raw tokens array); NULL
    * arrays yield NULL (Spark passes null Seqs through to the lambda). */
  val arrayUdf = udf((xs: Seq[Int], mm: Int, rFactor: Double) =>
    if (xs == null) Option.empty[Double]
    else Some(SampEn.sampen(xs.map(_.toDouble).toArray, mm, rFactor)))

  final case class Buf(ts: Array[Long], vs: Array[Double])

  def aggregator(mm: Int = 2, rFactor: Double = 0.2): Aggregator[(Long, Double), Buf, Double] =
    new Aggregator[(Long, Double), Buf, Double] {
      def zero: Buf = Buf(Array.empty, Array.empty)
      def reduce(b: Buf, a: (Long, Double)): Buf =
        Buf(b.ts :+ a._1, b.vs :+ a._2)
      def merge(x: Buf, y: Buf): Buf =
        Buf(x.ts ++ y.ts, x.vs ++ y.vs)
      def finish(b: Buf): Double = {
        val order = b.ts.zipWithIndex.sortBy(_._1).map(_._2)
        SampEn.sampen(order.map(b.vs), mm, rFactor)
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Untyped column form for DataFrame groupBy: two input columns
    * (ts, value). */
  def sampenUdaf(mm: Int = 2, rFactor: Double = 0.2): (Column, Column) => Column = {
    val f = udaf(aggregator(mm, rFactor))
    (ts, v) => f(ts, v)
  }
}
