package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Asymmetric-distance computation for product-quantized vectors: given a
  * document's PQ codes (`array<int>`, one code per subspace) and a query's
  * flattened lookup table (`array<float>`, `m × k` entries where
  * `lut[j*k + c]` = the query subvector's dot product with subspace j's
  * centroid c), returns `Σ_j lut[j*k + codes[j]]` — the PQ approximation
  * of the full dot product, from 8–16 table lookups instead of 64 float
  * multiplies and with the corpus stored at 32× compression.
  *
  * Why a custom expression (same story as [[VecDot]]): the composable
  * `aggregate(transform(sequence(...)))` form runs interpreted at ~ms per
  * pair — a 500k-pair scoring join would take minutes. This generates a
  * tight lookup loop inside whole-stage codegen (~µs per pair).
  *
  * `k` is derived as `lut.length / codes.length`; a code outside the
  * table (mismatched m/k between encode and query side) fails LOUDLY —
  * silent mis-scoring on shape mismatch is the failure mode the persisted
  * -index validation work (round 2) exists to prevent.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    if (m == 0 || n % m != 0) {
      throw new IllegalArgumentException(
        s"pq_adc: LUT size $n is not a multiple of code length $m")
    }
    val k = n / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= k) {
        throw new IllegalArgumentException(
          s"pq_adc: code $c out of range [0, $k) — encode/query shape mismatch")
      }
      s += lut.getFloat(j * k + c).toDouble
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
        int $m = $codes.numElements();
        int $n = $lut.numElements();
        if ($m == 0 || $n % $m != 0) {
          throw new IllegalArgumentException(
            "pq_adc: LUT size " + $n + " is not a multiple of code length " + $m);
        }
        int $k = $n / $m;
        double $s = 0.0;
        for (int $j = 0; $j < $m; $j++) {
          int $c = $codes.getInt($j);
          if ($c < 0 || $c >= $k) {
            throw new IllegalArgumentException(
              "pq_adc: code " + $c + " out of range [0, " + $k +
                ") — encode/query shape mismatch");
          }
          $s += (double) $lut.getFloat($j * $k + $c);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
