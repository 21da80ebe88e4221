package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshBandKeysSpec extends SparkSpec {
  import spark.implicits._

  private def randomSigs(n: Int, width: Int): Seq[(Long, Seq[Long])] = {
    val rnd = new scala.util.Random(11)
    (1L to n.toLong).map { i =>
      // the real domain is [0, p) — positive; include 0 and repeats
      i -> Seq.fill(width)(rnd.nextLong(1L << 60))
    }
  }

  test("fused band keys equal the composable md5/concat_ws form") {
    GraftFunctions.ensureRegistered(spark)
    val sigs = randomSigs(200, 24).toDF("id", "sig")
    val fused = sigs.select($"id",
        graft.ops.Dedup.lshBandKeys($"sig", 8, 3).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    val composable = sigs.select($"id",
        graft.ops.Dedup.lshBandKeysComposable($"sig", 8, 3).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused === composable)
  }

  test("ragged signatures clamp per band exactly like slice") {
    GraftFunctions.ensureRegistered(spark)
    // width 7 with 8 bands × 3 rows: bands 2 (partial) and 3+ (empty)
    val sigs = randomSigs(50, 7).toDF("id", "sig")
    val fused = sigs.select($"id",
        graft.ops.Dedup.lshBandKeys($"sig", 8, 3).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    val composable = sigs.select($"id",
        graft.ops.Dedup.lshBandKeysComposable($"sig", 8, 3).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fused === composable)
  }

  test("interpreted path equals the codegen path") {
    GraftFunctions.ensureRegistered(spark)
    val rows = randomSigs(50, 24)
    val viaCodegen = rows.toDF("id", "sig")
      .select($"id", graft.ops.Dedup.lshBandKeys($"sig", 8, 3).as("k"))
      .as[(Long, Seq[Long])].collect().toMap
    val interp = rows.map { case (id, sig) =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(sig.toArray)
      id -> LshBandKeys.of(arr, 8, 3).toLongArray.toSeq
    }.toMap
    assert(viaCodegen === interp)
  }
}
