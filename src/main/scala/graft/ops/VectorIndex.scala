package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Similarity.{cosine, dot, norm}

/** Persisted IVF-PQ ANN index — the on-disk form of
  * [[Similarity.ivfPqTopK]], completing the index-artifact story the
  * MinHash signature index ([[Dedup.writeSignatureIndex]]) started: at
  * 100 TB the fit and the corpus encoding are one-time BUILD costs, and
  * every retrieval job after that reads the index, not the corpus.
  *
  * Layout under `dir`:
  *  - `coded/` — (id, codes, pq norm) parquet, PARTITIONED BY cell: a
  *    query probing `nProbe` cells touches `nProbe` directories, the
  *    rest are pruned at planning time (the broadcast cell join gives
  *    dynamic partition pruning on top of the equi-join) — the I/O
  *    contract that makes the index useful at scale;
  *  - `_centroids/` — (cell, vec) parquet: the IVF routing table;
  *  - `_books/` — (sub, code, vec) parquet: the PQ codebooks;
  *  - `_graft_index_meta.json` — build parameters. They are the index's
  *    identity: probing with a different (nCells, m, kCodes) silently
  *    returns garbage distances, so [[read]] refuses a mismatch, same
  *    contract as the signature index.
  *
  * Underscore-prefixed members are invisible to a plain
  * `spark.read.parquet(dir)` (Hadoop hidden-file rules), so the coded
  * table and its sidecars cannot be confused.
  *
  * Determinism: the fits are the same bounded-sample deterministic
  * k-means the in-process queries use ([[Similarity.ivfCentroids]] /
  * [[Similarity.pqCodebooks]]), so two builds over one corpus produce
  * byte-identical routing — an index rebuild is reproducible, not a
  * silent re-shuffle of neighbors.
  */
object VectorIndex {

  final case class Params(nCells: Int, m: Int, kCodes: Int, dim: Int)

  /** Handle to an opened index: routing tables decoded to driver arrays
    * (they are vocabulary-sized — nCells×dim + m×kCodes×(dim/m) doubles
    * — broadcast-friendly by construction), coded corpus left lazy. */
  final case class Handle(params: Params, centers: Array[Array[Double]],
      books: Array[Array[Array[Double]]], coded: DataFrame)

  private def metaJson(p: Params): String =
    s"""{"nCells":${p.nCells},"m":${p.m},"kCodes":${p.kCodes},"dim":${p.dim}}"""

  /** ascending (distance, cell) ranking of every IVF cell for `vec` —
    * -2·v·c + |c|² orders like true L2 distance (|v|² is constant per
    * row). Mirrors the in-process paths in [[Similarity]].
    *
    * Round-18 form: the centroid matrix is ONE two-level array literal
    * indexed per cell, not nCells separate per-element literal arrays —
    * the old form put nCells×dim Literal nodes in the tree (a 14 KB
    * expression line in q103's plan), and the analyzer/optimizer re-walk
    * that tree on every retrieval run (driver time, guide §7.3). Values
    * are bit-identical: same float literals, same VecDot fold, same
    * -2·dot + |c|² doubles, same (score, cell) sort. */
  private def cellRanking(vec: Column,
      centers: Array[Array[Double]]): Column = {
    val cLit = typedlit(centers.map(_.map(_.toFloat).toSeq).toSeq)
    val n2Lit = typedlit(centers.map(c => c.map(v => v * v).sum).toSeq)
    sort_array(transform(sequence(lit(0), lit(centers.length - 1)), i =>
      struct(
        (lit(-2.0) * dot(vec, element_at(cLit, i + 1)) +
          element_at(n2Lit, i + 1)).as("score"),
        i.as("cell"))))
  }

  /** Fit (deterministic bounded sample), encode the corpus, and write
    * the index. Returns the build parameters. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nCells: Int = 16, m: Int = 8, kCodes: Int = 16,
      maxFitRows: Int = 100000): Params = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim must split into m=$m subspaces")
    val params = Params(nCells, m, kCodes, dim)

    val centers = Similarity.ivfCentroids(corpus, vecCol, nCells, maxFitRows)
    val books = Similarity.pqCodebooks(corpus, vecCol, m, kCodes, maxFitRows)
    val norm2Lut = array(books.flatMap(_.map(c =>
      lit(c.map(v => v * v).sum.toFloat))).toIndexedSeq: _*)

    corpus.select(col(idCol).as("id"),
        element_at(cellRanking(col(vecCol), centers), 1)
          .getField("cell").as("cell"),
        Similarity.pqEncode(col(vecCol), books).as("codes"))
      .withColumn("pq_norm",
        sqrt(call_function("pq_adc", col("codes"), norm2Lut)))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$dir/coded")

    import spark.implicits._
    centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "vec").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_centroids")
    books.zipWithIndex
      .flatMap { case (sub, s) => sub.zipWithIndex.map { case (c, k) =>
        (s, k, c.toSeq) } }.toSeq
      .toDF("sub", "code", "vec").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_books")

    val p = new org.apache.hadoop.fs.Path(dir, "_graft_index_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(metaJson(params).getBytes("UTF-8"))
    out.close()
    params
  }

  /** Incremental index maintenance: encode `batch`'s vectors against the
    * index's FROZEN centroids and codebooks and append them to the cell
    * partitions — the daily-ingest path. A 100 TB corpus is built once;
    * every batch after that costs O(batch) encode + append, never a
    * refit or a rewrite of existing cells (a refit would silently move
    * the routing table under every previously coded row). The
    * param sidecar is checked first: appending to an index whose stored
    * `dim` differs from the batch's vectors is refused, same contract as
    * [[read]]. Determinism: appending any split of a corpus yields the
    * same coded rows as one [[build]] over the whole corpus fit on the
    * same sample — retrieval over the appended index hash-matches the
    * full-build oracle (pinned in VectorIndexSpec).
    */
  def append(batch: DataFrame, idCol: String, vecCol: String,
      dir: String): Params = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // sidecars only — the coded table may be empty/absent (an index can
    // be bootstrapped from a fit by appends alone)
    val (params, centers, books) = sidecars(spark, dir, -1, -1, -1)
    // empty batch = legitimate no-op on the daily-ingest path (a day
    // with no new vectors must not throw)
    val dimRow = batch.select(size(col(vecCol))).head(1).headOption
    if (dimRow.isEmpty) return params
    require(!dimRow.get.isNullAt(0),
      s"batch has a NULL `$vecCol` vector — the index stores fixed-dim " +
        "non-null vectors; drop or impute NULL rows before append")
    val dim = dimRow.get.getInt(0)
    require(dim == params.dim,
      s"vector index at $dir stores dim=${params.dim} vectors but " +
        s"the batch has dim=$dim — wrong index for this corpus")
    val norm2Lut = array(books.flatMap(_.map(c =>
      lit(c.map(v => v * v).sum.toFloat))).toIndexedSeq: _*)
    batch.select(col(idCol).as("id"),
        element_at(cellRanking(col(vecCol), centers), 1)
          .getField("cell").as("cell"),
        Similarity.pqEncode(col(vecCol), books).as("codes"))
      .withColumn("pq_norm",
        sqrt(call_function("pq_adc", col("codes"), norm2Lut)))
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(s"$dir/coded")
    params
  }

  /** Small-file compaction for the coded table: every [[append]] batch
    * adds one file per touched cell, so a daily-ingest index accumulates
    * O(days) files per cell and retrieval pays a task + footer read for
    * each — the same cliff [[Layout.compact]] documents, landing here on
    * the index's hot read path (a probed cell's scan). Rewrites each
    * cell partition directory through [[Layout.compact]] (stage + atomic
    * swap per directory; the dot-prefixed staging sibling is invisible
    * to partition discovery, so concurrent readers of the parent table
    * never see a phantom cell). The fits and meta are untouched — codes
    * are rewritten byte-identically, so retrieval before and after
    * hash-matches (spec-pinned). Returns the number of cell directories
    * compacted. */
  /** TAKEDOWN PROPAGATION: remove `ids` from the coded table —
    * cell-granular, the index analog of a merge-on-read materialization.
    * A corpus-table delete (e.g. [[Layout.snapshotDeleteKeys]]) does not
    * touch derived artifacts, so without this a removed document keeps
    * SURFACING as a retrieval hit; the propagation must be part of the
    * takedown runbook, not an afterthought. The probe scans only the id
    * column (column-pruned) to find the cells holding a matching row;
    * only those cell partition directories are rewritten
    * ([[Layout.atomicOverwrite]] per cell — crash-safe staged swap,
    * untouched cells byte-identical). Fits and sidecars never change:
    * deletion cannot move the routing table under surviving rows.
    * Returns the number of cell directories rewritten. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Int = {
    val codedRoot = new org.apache.hadoop.fs.Path(s"$dir/coded")
    val fs = codedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(codedRoot)) return 0
    val keys = ids.select(col(idCol).as("id")).distinct()
    val cells = spark.read.parquet(codedRoot.toString)
      .join(keys, Seq("id"), "left_semi")
      .select("cell").distinct().collect().map(_.get(0))
    cells.foreach { c =>
      val cellDir = s"${codedRoot.toString}/cell=$c"
      Layout.atomicOverwrite(
        spark.read.parquet(cellDir).join(keys, Seq("id"), "left_anti"),
        cellDir)
    }
    cells.length
  }

  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Int = {
    val codedRoot = new org.apache.hadoop.fs.Path(s"$dir/coded")
    val fs = codedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(codedRoot)) return 0
    val cells = fs.listStatus(codedRoot)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(_.getPath)
    cells.foreach(c => Layout.compact(spark, c.toString, targetBytes))
    cells.length
  }

  /** Open a persisted index, asserting it was built with the parameters
    * the caller is about to probe with (pass -1 to accept the stored
    * value). */
  def read(spark: SparkSession, dir: String, nCells: Int = -1,
      m: Int = -1, kCodes: Int = -1): Handle = {
    val (params, centers, books) = sidecars(spark, dir, nCells, m, kCodes)
    // explicit schema (one driver-side footer read + the `cell`
    // partition column): a schemaless read of the partitioned coded
    // table runs parquet schema inference as a one-task Spark job per
    // open — pure scheduling overhead on the retrieval hot path
    // (round-19 metadata pass; the r18 driver-cost fix's sibling)
    val coded = codedFooterSchema(spark, dir) match {
      case Some(s) => spark.read.schema(s).parquet(s"$dir/coded")
      case None    => spark.read.parquet(s"$dir/coded")
    }
    Handle(params, centers, books, coded)
  }

  /** Schema of the coded table from ONE data-file footer (driver-side,
    * no job) plus the directory-derived `cell` partition column — None
    * when no data file exists yet (fall back to the reader's own
    * discovery, which also handles the empty-table error paths). */
  private def codedFooterSchema(spark: SparkSession,
      dir: String): Option[org.apache.spark.sql.types.StructType] = {
    val codedRoot = new org.apache.hadoop.fs.Path(s"$dir/coded")
    val fs = codedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(codedRoot)) return None
    fs.listStatus(codedRoot).toSeq
      .find(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap(cd => fs.listStatus(cd.getPath).toSeq.find(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")))
      .map { f =>
        org.apache.spark.sql.GraftPlanBridge
          .parquetSchemaOf(spark, f.getPath.toString)
          .add("cell", org.apache.spark.sql.types.IntegerType)
      }
  }

  /** Meta + routing tables, parameter-checked — everything except the
    * coded table (which [[append]] must be able to skip: a just-built or
    * wiped index has sidecars but no coded rows yet). */
  private def sidecars(spark: SparkSession, dir: String, nCells: Int,
      m: Int, kCodes: Int):
      (Params, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_index_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$dir has no _graft_index_meta.json — not a persisted vector " +
        "index (write it with VectorIndex.build)")
    val in = fs.open(p)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def field(name: String): Int =
      s""""$name":(-?\\d+)""".r.findFirstMatchIn(meta)
        .map(_.group(1).toInt)
        .getOrElse(sys.error(s"malformed index meta: $meta"))
    val params = Params(field("nCells"), field("m"), field("kCodes"),
      field("dim"))
    Seq(("nCells", nCells, params.nCells), ("m", m, params.m),
        ("kCodes", kCodes, params.kCodes)).foreach { case (n, want, got) =>
      require(want < 0 || want == got,
        s"vector index at $dir was built with $n=$got but the caller " +
          s"expects $n=$want — rebuild the index or match its parameters")
    }
    // round-18: collect unsorted and order on the driver — the routing
    // tables are vocabulary-sized (≤ a few hundred rows), and the old
    // `.orderBy(...).collect()` forms each paid a range-partitioning
    // shuffle (sampling pass + exchange = 2-3 extra jobs per open) on
    // the retrieval hot path. Same arrays, bit-identically.
    // round-19: explicit static schemas — this library owns both sides
    // of the sidecar format (build writes (cell, vec) / (sub, code,
    // vec)); a schemaless read paid a one-task inference job per
    // sidecar per open.
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructType}
    val centroidSchema = new StructType()
      .add("cell", IntegerType).add("vec", ArrayType(DoubleType))
    val bookSchema = new StructType().add("sub", IntegerType)
      .add("code", IntegerType).add("vec", ArrayType(DoubleType))
    val centers = spark.read.schema(centroidSchema)
      .parquet(s"$dir/_centroids")
      .collect()
      .sortBy(_.getAs[Int]("cell"))
      .map(_.getAs[Seq[Double]]("vec").toArray)
    require(centers.length == params.nCells,
      s"index at $dir: ${centers.length} centroids, meta says ${params.nCells}")
    val books = spark.read.schema(bookSchema).parquet(s"$dir/_books")
      .collect()
      .groupBy(_.getAs[Int]("sub")).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getAs[Int]("code"))
        .map(_.getAs[Seq[Double]]("vec").toArray))
      .toArray
    (params, centers, books)
  }

  /** ADC top-k against the persisted index alone — one scan of `nProbe`
    * cell partitions per query batch, no corpus access. Scores are the
    * PQ cosine ESTIMATE (exact to the codebook resolution); follow with
    * [[topKRerank]] when exact ordering matters. */
  def topKAdc(index: Handle, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(slice(cellRanking(col(vecCol), index.centers), 1, nProbe))
          .as("probe"))
      .select(col("query_id"), col("probe.cell").as("cell"),
        Similarity.pqLut(col("qv"), index.books).as("lut"),
        norm(col("qv")).as("q_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_pq").desc, col("nbr_id"))
    // broadcast the (small) query batch: the cell equi-join then prunes
    // the coded table to the probed cell partitions (DPP)
    index.coded.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("nbr_id"),
        (call_function("pq_adc", col("codes"), col("lut")) /
          (col("q_norm") * col("pq_norm"))).as("cos_pq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Index-shortlisted exact top-k: ADC shortlist from the index, exact
    * cosine rerank against caller-supplied corpus vectors (the index
    * stores codes, not vectors — at scale the corpus join is the rerank
    * cost and the shortlist bounds it to `shortlist` rows per query). */
  def topKRerank(index: Handle, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4,
      shortlist: Int = -1): DataFrame = {
    val short = if (shortlist < 0) 10 * k else math.max(k, shortlist)
    val cand = topKAdc(index, queries, idCol, vecCol, short, nProbe)
      .select(col("query_id"), col("nbr_id"))
    val cv = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    cv.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"), col("cos"))
  }
}
