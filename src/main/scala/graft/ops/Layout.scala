package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for 100 TB joins: bucketing (co-located joins —
  * pay the shuffle once at write time, never again) and key salting
  * (manual skew mitigation where AQE's runtime splitting isn't enough).
  */
object Layout {

  /** Persist a frame bucketed + sorted by the join key. Any two tables
    * bucketed the same way join with NO exchange and NO sort — at 100 TB
    * that turns every recurring fact⋈fact join from a full-corpus shuffle
    * into a zip of pre-sorted buckets. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Inner equi-join with salted keys: the big side's rows get a
    * deterministic salt in [0, salts); the small side is replicated once
    * per salt value. A key carrying S% of the data spreads over `salts`
    * reducers instead of one. Results are identical to the plain join
    * (each big-side row matches exactly one replica). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    // the salt must vary PER ROW (hashing the key would put the whole hot
    // key back on one reducer); row position is fine — correctness doesn't
    // depend on which replica a row meets
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
