package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ops.Layout

/** Exactly-once streaming appends COMMITTED AS TABLE SNAPSHOTS — the
  * object-store generation of [[IdempotentSink]].
  *
  * [[IdempotentSink.appendOnce]] gets exactly-once from an atomic
  * directory RENAME keyed by batchId — correct on HDFS/POSIX, but
  * rename is exactly the primitive S3-class stores lack, and its
  * committed layout is a bare partitioned directory: readers see
  * whatever files exist, with no versioning and no incremental scan.
  * This sink commits every micro-batch through
  * [[Layout.snapshotAppend]] instead, so one call buys four properties
  * at once:
  *
  *  - **exactly-once under replay**: the batchId travels IN the
  *    manifest (a `batch=<id>` metadata line). `foreachBatch` replays
  *    a batch only after a failure, and structured streaming batchIds
  *    are monotonically increasing per query, so "this batchId ≤ the
  *    newest committed one" ⇔ replay — the batch is skipped. A crash
  *    BEFORE the manifest PUT leaves an orphan data directory readers
  *    never see (swept by [[Layout.snapshotExpire]]'s grace-period
  *    orphan collection); a crash AFTER means the commit happened and
  *    the replay no-ops. No rename anywhere.
  *  - **torn-read-free versioned reads**: downstream readers use
  *    [[graft.Tables.snapshot]] semantics — a long analytics job pins
  *    one version's file list and is never torn across in-flight
  *    commits.
  *  - **an incremental feed for free**: each micro-batch is one
  *    snapshot version, so [[Layout.snapshotChanges]](lastSeen, latest)
  *    hands downstream consumers (vector-index append, corpus-index
  *    dedup, sketch merges) exactly the new files.
  *  - **bounded metadata**: expire old versions on any cadence without
  *    breaking newer appends (their manifests carry the file list
  *    forward).
  *
  * Contract: ONE streaming query owns the table (the same single-writer
  * contract a checkpointed query already implies) — the replay check
  * compares against the newest committed `batch=` marker, which is only
  * meaningful when all markers come from one monotonically-numbered
  * query. Mixed use with plain [[Layout.snapshotAppend]] (no marker) by
  * the SAME owner is fine: marker-less versions are skipped when
  * resolving the newest batchId.
  */
object SnapshotSink {

  private val BatchTag = "batch="

  /** Commit `batch` as one append snapshot of `dir` exactly once.
    * Returns false iff this batchId is already committed (a replay).
    * Use directly as a `foreachBatch` body:
    * {{{
    *   .foreachBatch((b: DataFrame, id: Long) =>
    *     SnapshotSink.appendOnce(b, id, dir): Unit)
    * }}} */
  def appendOnce(batch: DataFrame, batchId: Long, dir: String): Boolean = {
    val spark = batch.sparkSession
    val newest = Layout.snapshotVersions(spark, dir).reverseIterator
      .flatMap(v => Layout.snapshotMetaOf(spark, dir, v).collectFirst {
        case m if m.startsWith(BatchTag) => m.stripPrefix(BatchTag).toLong
      })
      .nextOption()
    if (newest.exists(batchId <= _)) return false
    Layout.snapshotAppend(batch, dir, meta = Seq(s"$BatchTag$batchId"))
    true
  }
}
