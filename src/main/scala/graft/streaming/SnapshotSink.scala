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
    * }}}
    *
    * The newest committed marker is resolved by
    * [[Layout.snapshotNewestMeta]]'s descending lazy probe — O(1)
    * manifest GETs per commit on a sink-owned table, where the previous
    * eager validation of every historical manifest made per-batch
    * metadata I/O grow quadratically over a long-running stream
    * (manifests grow O(total files), versions grow one per batch).
    *
    * Failure containment for a RESET checkpoint: structured streaming
    * replays at most the one in-flight batch, so a batchId more than one
    * below the newest committed marker cannot come from the engine's
    * normal recovery — it means the query's checkpoint was deleted or
    * forked (batchIds restarted at 0) or a second query is writing the
    * table. Silently treating that as "replay" would drop every future
    * batch as a duplicate; this throws instead. (A reset can still
    * shadow batches while the restarted counter is within 1 of the
    * newest marker — ids 0..newest-1 re-deliver DIFFERENT data under
    * replayed ids; exactly-once is only meaningful against one
    * checkpoint lineage. Recovery from a genuine reset: start the new
    * query against a fresh table, or snapshotExpire + bootstrap.) */
  /** `statsCols` forwards to [[Layout.snapshotAppend]]'s manifest
    * column stats, so a STREAMED table is born skippable: each
    * micro-batch's files carry min/max for the given columns and
    * [[Layout.snapshotReadWhere]] prunes them at planning time —
    * no separate "optimize" pass to retrofit stats later. */
  def appendOnce(batch: DataFrame, batchId: Long, dir: String,
      statsCols: Seq[String] = Nil): Boolean = {
    val spark = batch.sparkSession
    val newest = Layout.snapshotNewestMeta(spark, dir, BatchTag)
      .map(_.stripPrefix(BatchTag).toLong)
    newest match {
      case Some(n) if batchId < n - 1 =>
        throw new IllegalStateException(
          s"SnapshotSink at $dir: batchId $batchId is ${n - batchId} " +
            s"behind the newest committed marker $n — engine recovery " +
            "replays at most one batch, so this is a deleted/forked " +
            "checkpoint or a second writer; refusing to silently drop " +
            "the batch as a replay")
      case Some(n) if batchId <= n => false
      case _ =>
        Layout.snapshotAppend(batch, dir, meta = Seq(s"$BatchTag$batchId"),
          statsCols = statsCols)
        true
    }
  }
}
