package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: from an `array<long>` of shingle hashes,
  * compute the k per-family minima of `(a_k·(h & mask) + b_k) mod p`
  * ([[PortableHash]] universal families) in one pass.
  *
  * The composable SQL form (`transform(sequence(0,k-1), s ->
  * array_min(transform(hs, h -> …)))`) runs interpreted: k·|shingles|
  * boxed evaluations per row — ~24 s cold for 5,000 docs at k=24. This
  * expression generates one tight primitive loop (~10 ms for the same
  * corpus slice). Value-identical to the SQL form and to the DuckDB
  * oracle: same families, same modular arithmetic, empty input ⇒ all
  * Long.MaxValue (matches `coalesce(array_min(…), maxvalue)`).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = (0 until numHashes).map(PortableHash.uhA).toArray
  private lazy val bs: Array[Long] = (0 until numHashes).map(PortableHash.uhB).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val x = hs.getLong(i) & PortableHash.UhMask
      var s = 0
      while (s < numHashes) {
        val v = (as(s) * x + bs(s)) % PortableHash.UhP
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $hs.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $x = $hs.getLong($i) & ${PortableHash.UhMask}L;
          for (int $s = 0; $s < $numHashes; $s++) {
            long $v = ($aRef[$s] * $x + $bRef[$s]) % ${PortableHash.UhP}L;
            if ($v < $mins[$s]) $mins[$s] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
