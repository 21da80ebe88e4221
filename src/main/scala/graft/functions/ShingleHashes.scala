package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused token-array → n-gram shingle → 60-bit MD5 hash pass, one compiled
  * loop per row — the shingle-index sibling of [[ShingleMinHash]].
  *
  * Why it exists (optimization round 18, guide §4): the composable form
  * `array_distinct(transform(shinglesOf(toks, n), md5Long))` leaves the
  * whole shingle+hash stage in interpreted higher-order functions —
  * Catalyst HOFs are CodegenFallback, so every shingle pays boxed lambda
  * evaluation for `slice`, `concat_ws`, `md5`, `conv`, `substring`. That
  * stage is the dominant cost of every n-gram gate (Jaccard near-dup,
  * benchmark contamination, boilerplate fraction, substring spans).
  * [[ShingleMinHash]] fixed it for the MinHash path; this expression fixes
  * the posting-index path, which needs the hashes themselves.
  *
  * Value parity (spec-pinned): identical to
  * `array_distinct(transform(shinglesOf(toks, n), s => md5Long(s)))` when
  * `distinct = true` — same MD5 over the same `concat_ws(" ", …)` byte
  * sequence, leading 60 bits, first-occurrence order; and identical to
  * `transform(sequence(1, size-n+1), i => md5Long(concat_ws(" ",
  * slice(toks, i, n))))` when `distinct = false` (one hash per window
  * position, in position order — the [[Dedup.duplicatedSpans]] form).
  * Docs with fewer than `shingleN` tokens yield an EMPTY array, matching
  * the `when(size >= n) … otherwise(array())` gate of the composable form.
  */
case class ShingleHashes(child: Expression, shingleN: Int, distinct: Boolean)
    extends UnaryExpression {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires array<string> tokens, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.of(input.asInstanceOf[ArrayData], shingleN, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"""
        ${ev.value} = graft.functions.ShingleHashes.of(
          $toks, $shingleN, $distinct);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by the interpreted and codegen paths. Empty array when the doc
    * has fewer than `shingleN` tokens (matching the composable form's
    * `otherwise(array())`). Null elements are SKIPPED inside a window —
    * no bytes, no separator — exactly `concat_ws`'s semantics, so a SQL
    * caller with null-containing token arrays gets the composable form's
    * value instead of a task crash (ADVICE r18; the library's own token
    * arrays come from `regexp_extract_all` and are never null). */
  def of(toks: ArrayData, shingleN: Int, distinct: Boolean): GenericArrayData = {
    val n = toks.numElements()
    if (n < shingleN) return new GenericArrayData(Array.emptyLongArray)
    val nWin = n - shingleN + 1
    val out = new Array[Long](nWin)
    val digest = md.get()
    // token bytes extracted ONCE per row: getBytes can copy, and the
    // window loop below would otherwise call it shingleN times per token
    // (round-19 §4 allocation cut — the 32-core-slower-than-8 scaling
    // ratios on the hash-dense queries pointed at GC churn)
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      tokBytes(t) = if (toks.isNullAt(t)) null else toks.getUTF8String(t).getBytes
      t += 1
    }
    val d = new Array[Byte](16) // reused digest output buffer
    var i = 0
    while (i < nWin) {
      digest.reset()
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
      // leading 60 bits of the digest, big-endian — exactly
      // PortableHash.md5Long's conv(substring(md5, 1, 15), 16, 10)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = h >>> 4
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // first-occurrence-order dedup via open addressing (no boxing):
    // table size = next power of two ≥ 2·nWin, so load factor ≤ 0.5.
    // 0 is a valid hash value, so occupancy gets its own bitset.
    var cap = java.lang.Integer.highestOneBit(math.max(4, nWin * 2 - 1)) << 1
    if (cap <= 0) cap = 1 << 30
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val kept = new Array[Long](nWin)
    var k = 0
    i = 0
    while (i < nWin) {
      val v = out(i)
      // finalizer-style spread so nearby 60-bit values don't cluster
      var slot = (java.lang.Long.hashCode(v * -7046029254386353131L) & mask)
      var dup = false
      var probing = true
      while (probing) {
        if (!used(slot)) probing = false
        else if (table(slot) == v) { dup = true; probing = false }
        else slot = (slot + 1) & mask
      }
      if (!dup) {
        used(slot) = true; table(slot) = v
        kept(k) = v; k += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(kept, k))
  }
}
