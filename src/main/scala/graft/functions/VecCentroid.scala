package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable running (sum, count) for [[VecCentroid]]; `sum` is sized
  * lazily off the first vector so the aggregator works for any dimension. */
final case class VecBuf(var sum: Array[Double], var n: Long)

/** Elementwise mean of float vectors — mean pooling / cluster centroids,
  * the aggregate an embedding pipeline runs constantly (per-label class
  * centroids, IVF cell refits, near-dup cluster representatives).
  *
  * A typed [[Aggregator]], so Spark executes it with full partial
  * aggregation: every task folds its rows into ONE (sum, count) buffer
  * and the exchange carries a single d-dim vector per group per task —
  * O(groups × tasks × d), independent of row count. The naive
  * posexplode-then-avg shape shuffles rows × d exploded rows; at 100 TB
  * of 1k-dim embeddings that is a 1000× larger exchange.
  *
  * Null rows are skipped (SQL aggregate semantics); an all-null group
  * yields null. Mixed dimensionalities are a data error and fail fast.
  */
object VecCentroid extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
  private type Buf = VecBuf
  private def Buf(sum: Array[Double], n: Long) = VecBuf(sum, n)

  override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

  override def reduce(b: Buf, a: Seq[Float]): Buf = {
    if (a == null) return b
    if (b.n == 0L && b.sum.isEmpty) b.sum = new Array[Double](a.length)
    require(a.length == b.sum.length,
      s"vector length ${a.length} != ${b.sum.length} in the same group")
    var i = 0
    while (i < b.sum.length) { b.sum(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    if (y.n == 0L) return x
    if (x.n == 0L) return y
    require(x.sum.length == y.sum.length,
      s"vector length ${y.sum.length} != ${x.sum.length} in the same group")
    var i = 0
    while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0L) null else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()

  /** Column form: `df.groupBy(...).agg(VecCentroid(col("embedding")))`. */
  private lazy val fn = udaf(VecCentroid)
  def apply(vec: Column): Column = fn(vec)
}
