package graft.queries

import org.apache.spark.sql.SparkSession

import graft.{Tables => T}
import graft.ops.Similarity

/** Process-wide memo of the deterministic bounded-sample index fits the
  * ANN / semantic-dedup queries share with their DuckDB oracles.
  *
  * Why memoize (and not just refit): the oracle SQL for q33b/q78/q78b/q95
  * embeds the fitted centroids/codebooks as VALUES literals (rendered by
  * [[graft.OracleLiterals]] when Verify dumps `oracle_sql.json`).
  * Distributed float reduction makes a k-means REFIT order-sensitive at
  * the last-ulp level, so the promotion is sound because BOTH consumers
  * read the SAME in-process fit: the registered queries pull from this
  * memo, and the oracle dump runs in the very process that ran the
  * queries it checks. At production scale this is also simply the right
  * shape — the fit is a one-time index artifact, not a per-query cost
  * (the same reason [[Similarity.ivfTopKWith]]/`pqTopKWith` exist).
  */
object Fits {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** IVF cell centroids over `embeddings.embedding` at `sfDir`. */
  def ivfCentroids(s: SparkSession, sfDir: String, nCells: Int,
      maxFitRows: Int): Array[Array[Double]] =
    cache.computeIfAbsent(s"ivf:$sfDir:$nCells:$maxFitRows", _ =>
      Similarity.ivfCentroids(T.embeddings(s, sfDir), "embedding",
        nCells, maxFitRows)).asInstanceOf[Array[Array[Double]]]

  /** PQ subspace codebooks over `embeddings.embedding` at `sfDir`. */
  def pqCodebooks(s: SparkSession, sfDir: String, m: Int, kCodes: Int,
      maxFitRows: Int): Array[Array[Array[Double]]] =
    cache.computeIfAbsent(s"pq:$sfDir:$m:$kCodes:$maxFitRows", _ =>
      Similarity.pqCodebooks(T.embeddings(s, sfDir), "embedding",
        m, kCodes, maxFitRows)).asInstanceOf[Array[Array[Array[Double]]]]

  /** Persisted [[graft.ops.VectorIndex]] over `embeddings` at `sfDir`,
    * built once per process with q78b's exact fit parameters (16 cells,
    * m=16, 16 codes, 2000-row fit) so its results — and its DuckDB
    * oracle — are q78b's own. */
  def vectorIndexDir(s: SparkSession, sfDir: String): String =
    cache.computeIfAbsent(s"vindex:$sfDir", _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_vindex").toString + "/idx"
      graft.ops.VectorIndex.build(T.embeddings(s, sfDir), "vec_id",
        "embedding", dir, nCells = 16, m = 16, kCodes = 16,
        maxFitRows = 2000)
      dir
    }).asInstanceOf[String]

  /** An APPEND-MAINTAINED twin of [[vectorIndexDir]]: same full-corpus
    * fit (so the same DuckDB oracle applies verbatim), but the coded
    * table is wiped after the build and reconstructed purely by two
    * [[graft.ops.VectorIndex.append]] batches — the daily-ingest path.
    * q104 hash-matching q103's oracle proves an index maintained by
    * appends is bit-identical to a one-shot build with the same fit. */
  /** A three-append snapshot table over `orders` (keys mod 3), the
    * fixture for q109's incremental-scan oracle: versions v1/v2/v3 carry
    * disjoint thirds of the table, so `snapshotChanges(v1, v3)` must be
    * EXACTLY the rows with `o_orderkey % 3 IN (1, 2)` — replayable in
    * SQL by the oracle without seeing the snapshot machinery. Built once
    * per process (the table is an on-disk artifact, like the vector
    * index). */
  def snapshotTableDir(s: SparkSession, sfDir: String): String =
    cache.computeIfAbsent(s"snaptab:$sfDir", _ => {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files
        .createTempDirectory("graft_snaptab").toString + "/t"
      val o = T.orders(s, sfDir)
      (0 to 2).foreach { m =>
        graft.ops.Layout.snapshotAppend(
          o.filter(col("o_orderkey") % 3 === m), dir)
      }
      dir
    }).asInstanceOf[String]

  def vectorIndexAppendDir(s: SparkSession, sfDir: String): String =
    cache.computeIfAbsent(s"vindexapp:$sfDir", _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_vindex_app").toString + "/idx"
      val emb = T.embeddings(s, sfDir)
      graft.ops.VectorIndex.build(emb, "vec_id",
        "embedding", dir, nCells = 16, m = 16, kCodes = 16,
        maxFitRows = 2000)
      val coded = new org.apache.hadoop.fs.Path(s"$dir/coded")
      coded.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(coded, true)
      import org.apache.spark.sql.functions.col
      graft.ops.VectorIndex.append(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", dir)
      graft.ops.VectorIndex.append(
        emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", dir)
      dir
    }).asInstanceOf[String]
}
