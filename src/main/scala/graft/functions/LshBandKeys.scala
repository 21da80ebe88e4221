package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash-LSH band keys: one compiled loop computing every band's
  * 60-bit MD5 key from the signature array — the [[ShingleHashes]]
  * treatment applied to the band-explode map stage (round 19, guide §4).
  *
  * The composable form ([[graft.ops.Dedup.lshBandKeys]]) builds, per
  * band, `md5Long(concat("b:", concat_ws(",", transform(slice(sig, …),
  * cast-to-string))))` — interpreted CodegenFallback higher-order
  * functions with boxed lambdas, visible as the giant lambda expression
  * in the committed q27 before-plan's Generate node. This expression
  * digests the identical byte sequence (`"<b>:"` prefix, then the
  * band's signature longs in decimal joined by `,`) in one loop.
  *
  * Value parity is spec-pinned (LshBandKeysSpec: fused ≡ composable over
  * random signatures, including short/ragged arrays where `slice` clamps).
  * 60-bit extraction = leading 15 hex chars of the digest, exactly
  * PortableHash.md5Long's `conv(substring(md5, 1, 15), 16, 10)`.
  */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_band_keys requires an array<bigint> signature, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    LshBandKeys.of(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      s"""
        ${ev.value} = graft.functions.LshBandKeys.of(
          $sig, $bands, $rowsPerBand);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by the interpreted and codegen paths. Ragged signatures
    * (shorter than bands × rowsPerBand) clamp per band exactly like the
    * composable form's `slice`. */
  def of(sig: ArrayData, bands: Int, rowsPerBand: Int): GenericArrayData = {
    val n = sig.numElements()
    val out = new Array[Long](bands)
    val digest = md.get()
    val d = new Array[Byte](16)
    var b = 0
    while (b < bands) {
      digest.reset()
      // "<b>:" prefix — the band-domain separator of the composable form
      digest.update(java.lang.Integer.toString(b)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      digest.update(':'.toByte)
      val start = b * rowsPerBand
      val end = math.min(start + rowsPerBand, n)
      var i = start
      while (i < end) {
        if (i > start) digest.update(','.toByte)
        digest.update(java.lang.Long.toString(sig.getLong(i))
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        i += 1
      }
      digest.digest(d, 0, 16)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      out(b) = h >>> 4
      b += 1
    }
    new GenericArrayData(out)
  }
}
