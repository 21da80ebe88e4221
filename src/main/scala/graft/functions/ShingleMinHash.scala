package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused tokenize-side MinHash: token array → n-gram shingles → 60-bit
  * MD5 → k universal-hash minima, all in one compiled pass per row.
  *
  * Why fuse: the composable pipeline (`transform(sequence(…), i ->
  * md5Long(concat_ws(" ", slice(toks, i, n))))` → [[MinHashSig]]) leaves
  * the shingle+hash stage in interpreted higher-order functions —
  * Catalyst HOFs are CodegenFallback, so every shingle pays boxed lambda
  * evaluation for `slice`, `concat_ws`, `md5`, `conv`, `substring`.
  * Measured on the sf0.1 corpus (5k docs) that stage dominates the whole
  * near-dup build (~2.5 s of a ~3.8 s query). This expression runs the
  * same computation as a tight JVM loop over the UTF-8 bytes: the MD5 is
  * fed the shingle's exact `concat_ws(" ", …)` byte sequence (no string
  * materialization), the leading 60 bits are the hash, and the k family
  * minima update in place — [[MinHashSig]]'s loop with the shingle pass
  * inlined.
  *
  * Value parity (spec-pinned): identical to
  * `minhash_sig(shingleHashesOf(toks, n), k)` — duplicate shingles can't
  * change a minimum, so skipping `array_distinct` is exact; the DuckDB
  * oracle replays it shingle-by-shingle. Docs with fewer than `shingleN`
  * tokens yield NULL (the caller's exclusion filter), matching the
  * `size(hs) > 0` gate of the composable form.
  */
case class ShingleMinHash(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_minhash requires array<string> tokens, got $other")
    }

  private lazy val as: Array[Long] =
    (0 until numHashes).map(PortableHash.uhA).toArray
  private lazy val bs: Array[Long] =
    (0 until numHashes).map(PortableHash.uhB).toArray

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHash.of(input.asInstanceOf[ArrayData], shingleN, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("shMinhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("shMinhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
        ${ev.value} = graft.functions.ShingleMinHash.of(
          $toks, $shingleN, $aRef, $bRef);
        ${ev.isNull} = (${ev.value} == null);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by the interpreted and codegen paths. Returns null when the
    * doc has fewer than `shingleN` tokens. */
  def of(toks: ArrayData, shingleN: Int,
      as: Array[Long], bs: Array[Long]): GenericArrayData = {
    val n = toks.numElements()
    if (n < shingleN) return null
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val digest = md.get()
    // token bytes extracted once per row + reused digest buffer — same
    // round-19 §4 allocation cut as ShingleHashes.of
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      tokBytes(t) = if (toks.isNullAt(t)) null else toks.getUTF8String(t).getBytes
      t += 1
    }
    val d = new Array[Byte](16)
    var i = 0
    val last = n - shingleN
    while (i <= last) {
      digest.reset()
      // null elements skipped, no separator — concat_ws semantics (same
      // ADVICE-r18 hardening as ShingleHashes.of; this library's token
      // arrays are never null, SQL callers' may be)
      var j = 0
      var first = true
      while (j < shingleN) {
        val tb = tokBytes(i + j)
        if (tb != null) {
          if (!first) digest.update(' '.toByte)
          digest.update(tb)
          first = false
        }
        j += 1
      }
      digest.digest(d, 0, 16)
      // first 15 hex chars of the digest = leading 60 bits, big-endian —
      // exactly PortableHash.md5Long's conv(substring(md5, 1, 15), 16, 10)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4
      val x = h & PortableHash.UhMask
      var s = 0
      while (s < k) {
        val v = (as(s) * x + bs(s)) % PortableHash.UhP
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
