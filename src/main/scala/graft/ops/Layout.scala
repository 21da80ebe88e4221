package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** Crash-safe full-table rewrite of a directory-backed parquet table,
    * safe even when `df` is derived FROM the table being replaced.
    *
    * `SaveMode.Overwrite` onto the source path is a read-your-own-delete
    * hazard: Spark truncates the destination before the job that computes
    * `df` has fully materialized it, so a recomputed partition (cache
    * eviction, executor loss) reads the already-truncated input → silent
    * data loss. Caching is NOT a write barrier. The only safe protocol is
    * stage-to-temp, then swap by directory rename — the source stays
    * untouched (and readable) until the staged copy is durable.
    *
    * Two-phase for testability and recovery:
    *  - [[stageOverwrite]] materializes `df` at `<dir>.__staged` — crash
    *    here loses nothing, the live table was never touched;
    *  - [[commitOverwrite]] swaps via metadata-only renames. The only
    *    non-atomic window is between the two renames (the live path briefly
    *    absent); both halves survive as `<dir>.__old` / `<dir>.__staged`,
    *    so recovery is mechanical. On HDFS/local each rename is atomic; an
    *    object store would use a manifest commit instead (documented in
    *    SCALE.md — same two-phase shape, different commit primitive).
    */
  def atomicOverwrite(df: DataFrame, dir: String): Unit = {
    stageOverwrite(df, dir)
    commitOverwrite(df.sparkSession, dir)
  }

  /** Phase 1: write `df` to the staging path, leaving `dir` untouched. */
  def stageOverwrite(df: DataFrame, dir: String): String = {
    val staged = dir + ".__staged"
    df.write.mode(SaveMode.Overwrite).parquet(staged)
    staged
  }

  /** Phase 2: `dir` → `dir.__old`, `dir.__staged` → `dir`, drop the old. */
  def commitOverwrite(spark: SparkSession, dir: String): Unit = {
    val live = new Path(dir)
    val staged = new Path(dir + ".__staged")
    val old = new Path(dir + ".__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(staged), s"nothing staged at $staged")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) {
      if (!fs.rename(live, old)) sys.error(s"rename $live -> $old failed")
    }
    if (!fs.rename(staged, live)) sys.error(s"rename $staged -> $live failed")
    fs.delete(old, true)
    ()
  }

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
