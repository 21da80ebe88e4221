package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (log2) of a string's UTF-8 byte distribution — the
  * standard cheap screen for non-text content in a crawl corpus: natural
  * language sits near 4-5 bits/byte, base64/compressed/random blobs near
  * 6-8, and single-character padding near 0.
  *
  * Why a custom Catalyst expression: the composable route needs a per-row
  * histogram, which SQL can only express by exploding one row per
  * character and re-aggregating — two shuffles of corpus × doc-length
  * rows for what is a purely row-local quantity. This expression computes
  * the histogram in one pass over the string's bytes inside whole-stage
  * codegen: no shuffle, no row expansion, O(len) per row.
  *
  * Byte-level, not codepoint-level, by design (bytes are what the
  * garbage-detection signal wants, and the hot loop stays branch-free);
  * on ASCII text the two coincide, which is what the DuckDB oracle
  * (character unnest + `entropy()`, also log2) replays exactly. Empty
  * string ⇒ 0.0; null propagates.
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_entropy requires a string argument, got ${child.dataType}")
  override def prettyName: String = "byte_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    ByteEntropy.of(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = graft.functions.ByteEntropy.of($s.getBytes());
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)
}

object ByteEntropy {
  /** Shared by the interpreted and codegen paths so they cannot drift.
    * One histogram pass + one 256-slot fold; per-term log2 matches the
    * oracle's `entropy()` up to summation order (absorbed by the round-6
    * the queries apply). */
  def of(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val h = new Array[Int](256)
    var i = 0
    while (i < n) { h(bytes(i) & 0xff) += 1; i += 1 }
    val ln2 = java.lang.Math.log(2.0)
    var e = 0.0
    var k = 0
    while (k < 256) {
      val c = h(k)
      if (c > 0) {
        val p = c.toDouble / n
        e -= p * (java.lang.Math.log(p) / ln2)
      }
      k += 1
    }
    e
  }
}
