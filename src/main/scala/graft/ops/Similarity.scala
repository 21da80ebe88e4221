package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Three paths:
  *  - brute-force cosine top-k: exact; the query side is broadcast, the
  *    corpus streams — cost O(|corpus| · |queries| · dim) FLOPs with zero
  *    corpus shuffle. The baseline and the verifier for the approximate
  *    paths.
  *  - random-hyperplane LSH: `planes`-bit signatures, bucket-equality
  *    join with 1-bit multi-probe.
  *  - IVF: k-means cells + nProbe probing ([[ivfTopK]]).
  *
  * All inner products go through the codegen'd [[graft.functions.VecDot]]
  * — double-precision sequential left fold, bit-stable under any
  * partitioning and identical to DuckDB's list-function fold.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — the native codegen
    * expression [[graft.functions.VecDot]] (registered by [[graft.Tables]];
    * ~100× the interpreted higher-order-function form, same bit-exact
    * left-fold semantics). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector.
    *
    * `queries` must be small enough to broadcast (it is hinted); the corpus
    * is scanned once with no shuffle — the rank window partitions by
    * query id, so the only exchange is on |queries| keys after the narrow
    * similarity projection. Ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // fan out the scored side: the O(|corpus|·|queries|·dim) FLOPs must
    // not run at the accident of the input file's row-group parallelism
    val c = Par.fanOut(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"), col("cos"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes: plane p, dim d ↦
    * a fixed hash-derived value in [−1, 1). Derived from the portable
    * 60-bit MD5 ([[graft.functions.PortableHash.md5LongJvm]]) rather than
    * a JVM-only hash, so an oracle engine can regenerate the exact plane
    * constants — and therefore the exact signatures — from the seed string:
    *   DuckDB: ('0x'||substr(md5('plane:'||p||':'||d),1,15))::BIGINT
    *             / 2^59 − 1.0, cast to REAL. */
  private[graft] def planeVal(p: Int, d: Int): Double =
    graft.functions.PortableHash.md5LongJvm(s"plane:$p:$d").toDouble /
      (1L << 59).toDouble - 1.0

  /** `planes`-bit signature of a vector: bit p = (v · plane_p ≥ 0).
    *
    * Each projection is a [[graft.functions.VecDot]] against a literal
    * plane vector (constant-folded to one array literal) — the expression
    * references `vec` once per plane, not once per (plane, dim). The
    * naive `element_at(vec, d)` form built a 768-node tree that, ×13
    * multi-probes, overwhelmed the optimizer and broadcast build. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeVal(p, d).toFloat)): _*)
      when(call_function("vec_dot", vec, plane) >= 0.0, lit(1L << p))
        .otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) approximate top-k: k-means centroids partition
    * the corpus into cells; each query probes only its `nProbe` nearest
    * cells. The index build is one MLlib KMeans fit on a bounded sample
    * (`maxFitRows`, hard-capped); at query time the corpus side is a
    * cell-equality join — no cross product, shuffle keyed by cell id.
    *
    * Cell assignment and query probing both run as Column expressions
    * against the centroid literals (same pattern as [[lshSignature]]):
    * squared euclidean ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖², ranked with ‖x‖²
    * dropped since it's constant per row. `vec_dot` keeps the inner
    * products in codegen.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 3,
      maxFitRows: Int = 100000): DataFrame =
    ivfTopKWith(corpus, queries, idCol, vecCol, k,
      ivfCentroids(corpus, vecCol, nCells, maxFitRows), nProbe)

  /** Deterministic bounded train set for the IVF fit: at most `maxFitRows`
    * rows regardless of corpus size — at 100 TB the k-means fit reads a
    * bounded sample, never the corpus (centroid placement converges far
    * below 10⁵ points). `sample()` is fraction-approximate, so a hard
    * `limit` makes the bound a guarantee. */
  private[graft] def ivfTrainSet(
      corpus: DataFrame, vecCol: String, maxFitRows: Int): DataFrame = {
    // No full-corpus count: the bound is decided by early-terminating
    // limit-probes (each scans until maxFitRows+1 survivors, then stops).
    // On overflow a deterministic hash filter geometrically shrinks the
    // kept fraction — O(log(n/maxFitRows)) bounded probes, and the fit
    // input never materializes more than maxFitRows rows. Identical
    // vectors share one hash and pass/fail the filter as a block, so a
    // duplicate-heavy corpus (all-zero embeddings from failed encoder
    // batches) can collapse to (near-)empty in one doubling — fall back
    // to a deterministic prefix before the train set degenerates.
    var keep = corpus
    var denom = 1L
    var n = keep.limit(maxFitRows + 1).count()
    while (n > maxFitRows && denom < (1L << 40)) {
      denom *= 2L
      keep = corpus.filter(pmod(xxhash64(col(vecCol)), lit(denom)) === 0)
      n = keep.limit(maxFitRows + 1).count()
      if (n < math.max(1, maxFitRows / 8)) { // degenerate shrink
        keep = corpus
        n = maxFitRows // prefix fallback: bounded and never empty
      }
    }
    keep.limit(maxFitRows).select(col(vecCol))
  }

  /** K-means cell centroids from a bounded sample of the corpus. Compute
    * once, persist, and reuse via [[ivfTopKWith]] — the index build is a
    * one-time cost, not a per-query-batch one. */
  def ivfCentroids(
      corpus: DataFrame, vecCol: String, nCells: Int,
      maxFitRows: Int = 100000): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    new KMeans().setK(nCells).setSeed(42).setFeaturesCol("fv")
      .setPredictionCol("cell")
      .fit(ivfTrainSet(corpus, vecCol, maxFitRows)
        .select(array_to_vector(col(vecCol)).as("fv")))
      .clusterCenters.map(_.toArray)
  }

  /** IVF query path against prebuilt centroids (see [[ivfTopK]]). */
  def ivfTopKWith(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centers: Array[Array[Double]], nProbe: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // score(x, c) = −2·x·c + ‖c‖² orders cells by euclidean distance to x
    def cellScore(vec: Column, c: Array[Double]): Column = {
      val cLit = array(c.map(v => lit(v.toFloat)).toIndexedSeq: _*)
      lit(-2.0) * call_function("vec_dot", vec, cLit) + lit(c.map(v => v * v).sum)
    }
    def cellRanking(vec: Column): Column =
      sort_array(array(centers.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct(cellScore(vec, c).as("score"), lit(i).as("cell"))
      }: _*))

    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"),
      element_at(cellRanking(col(vecCol)), 1).getField("cell").as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(slice(cellRanking(col(vecCol)), 1, nProbe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"), col("cos"))
  }

  /** LSH approximate top-k: compare query to corpus vectors in the same
    * hyperplane bucket or any bucket at Hamming distance 1 (multi-probe),
    * rank within. Shuffle is on bucket ids only; the corpus is scanned
    * once. */
  // ------------------------------------------------ product quantization

  /** Per-subspace PQ codebooks: the vector is split into `m` contiguous
    * subvectors and each subspace gets `kCodes` k-means centroids, fit on
    * the same bounded deterministic sample as IVF ([[ivfTrainSet]] — at
    * 100 TB the train never reads the corpus). Returns
    * `books(j)(code) = centroid`, the one-time index artifact to persist
    * and reuse across query batches. */
  def pqCodebooks(
      corpus: DataFrame, vecCol: String, m: Int = 16, kCodes: Int = 16,
      maxFitRows: Int = 100000): Array[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = ivfTrainSet(corpus, vecCol, maxFitRows).cache()
    try {
      val dim = train.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val sub = dim / m
      // the m fits are independent 4–8-dim problems on the same cached
      // sample — run them as concurrent Spark jobs (the fit wall-clock is
      // scheduling overhead, not compute; 10 Lloyd iterations place
      // 16 centroids on ≤1e5 points far past convergence)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 8))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        Await.result(Future.sequence((0 until m).toList.map { j =>
          Future {
            new KMeans().setK(kCodes).setSeed(42L + j).setMaxIter(10)
              .setFeaturesCol("fv").setPredictionCol("code")
              .fit(train.select(array_to_vector(
                slice(col(vecCol), j * sub + 1, sub)).as("fv")))
              .clusterCenters.map(_.toArray)
          }
        }), Duration.Inf).toArray
      } finally { pool.shutdown() }
    } finally { train.unpersist(); () }
  }

  /** PQ encode as a Column: per subspace, the nearest codebook centroid's
    * index (‖x−c‖² ranking with the ‖x‖² term dropped — constant per
    * subvector). `array<int>` of length m: the corpus's 64 floats become
    * m small ints (4 bits at kCodes=16) — a 256-byte vector stored in
    * ~8–16 bytes, which is what lets a 100 TB embedding store live in
    * cluster memory for scoring. Ties break to the lower code. */
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val m = books.length
    val sub = books(0)(0).length
    array((0 until m).map { j =>
      val sv = slice(vec, j * sub + 1, sub)
      val ranked = sort_array(array(books(j).zipWithIndex.toIndexedSeq.map { case (c, i) =>
        val cLit = array(c.map(v => lit(v.toFloat)).toIndexedSeq: _*)
        struct(
          (lit(-2.0) * dot(sv, cLit) + lit(c.map(v => v * v).sum)).as("score"),
          lit(i).as("code"))
      }: _*))
      element_at(ranked, 1).getField("code")
    }: _*)
  }

  /** Query-side ADC lookup table, flattened `m × kCodes` floats:
    * `lut[j*kCodes + c]` = dot(query subvector j, books(j)(c)). Computed
    * once per query row; [[graft.functions.PqAdc]] then scores each
    * (query, doc) pair with m table lookups. */
  def pqLut(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    // round-18: one flattened (m·kCodes)×sub codebook literal indexed per
    // entry instead of m·kCodes separate per-element literal arrays — the
    // old form put m·kCodes·sub Literal nodes in the tree, re-walked by
    // the analyzer/optimizer on every retrieval run (guide §7.3). Same
    // float literals, same VecDot fold, same per-entry cast to float.
    val sub = books(0)(0).length
    val kCodes = books(0).length
    val bLit = typedlit(
      books.flatMap(_.map(_.map(_.toFloat).toSeq)).toSeq)
    transform(sequence(lit(0), lit(books.length * kCodes - 1)), j =>
      dot(slice(vec, (j.divide(lit(kCodes)).cast("int") * sub) + 1, lit(sub)),
        element_at(bLit, j + 1)).cast("float"))
  }

  /** PQ approximate top-k by cosine: corpus encoded once (one scan, codes
    * + reconstructed-norm per doc), queries broadcast with their LUTs,
    * every pair scored by codegen'd `pq_adc` lookups — the brute-force
    * scan shape of [[bruteForceTopK]] at ~32× less memory traffic and no
    * full-width float math per pair. Approximate cosine =
    * adc_dot / (‖q‖ · ‖x̂‖) with ‖x̂‖ the reconstruction's norm (per-
    * subspace orthogonality makes it Σ_j ‖c_j‖², one more `pq_adc` over a
    * norm table). Recall is pinned vs the exact path in SimilaritySpec. */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 16, kCodes: Int = 16,
      maxFitRows: Int = 100000, shortlist: Int = -1): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val books = pqCodebooks(corpus, vecCol, m, kCodes, maxFitRows)
    pqTopKWith(corpus, queries, idCol, vecCol, k, books,
      if (shortlist < 0) 10 * k else shortlist)
  }

  /** PQ query path against prebuilt codebooks (see [[pqTopK]]).
    *
    * Two phases, the standard production split:
    *  1. ADC shortlist — every (query, doc) pair scored from the codes
    *     alone (m table lookups, no full-width vectors in flight); keep
    *     the top `shortlist` candidates per query.
    *  2. Exact re-rank — the shortlist (|queries| × shortlist pairs,
    *     corpus-size-independent) broadcasts back against the corpus for
    *     one true-cosine pass; top k of that is the answer.
    * The quantization error only costs recall when a true neighbor falls
    * outside the ~10×k shortlist, not when its coarse score is merely
    * re-ordered inside it. `shortlist = 0` skips phase 2 (pure ADC,
    * returns `cos_pq` — the quantized estimate). */
  def pqTopKWith(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      books: Array[Array[Array[Double]]],
      shortlist: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    // ‖x̂‖² table: norm2Lut[j*kCodes + c] = ‖books(j)(c)‖²
    val norm2Lut = array(books.flatMap(_.map(c =>
      lit(c.map(v => v * v).sum.toFloat))).toIndexedSeq: _*)
    val c = corpus.select(col(idCol).as("nbr_id"),
      pqEncode(col(vecCol), books).as("codes"))
      .withColumn("nbr_norm",
        sqrt(call_function("pq_adc", col("codes"), norm2Lut)))
    val q = queries.select(col(idCol).as("query_id"),
      pqLut(col(vecCol), books).as("lut"),
      norm(col(vecCol)).as("q_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_pq").desc, col("nbr_id"))
    val adc = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        (call_function("pq_adc", col("codes"), col("lut")) /
          (col("q_norm") * col("nbr_norm"))).as("cos_pq"))
      .withColumn("rank", row_number().over(w).cast("long"))
    if (shortlist <= 0) {
      adc.filter(col("rank") <= k)
        .select(col("query_id"), col("nbr_id"), col("rank"), col("cos_pq"))
    } else {
      val cand = adc.filter(col("rank") <= math.max(k, shortlist))
        .select(col("query_id"), col("nbr_id"))
      val cv = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      val w2 = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("nbr_id"))
      cv.join(broadcast(cand), Seq("nbr_id"))
        .join(broadcast(qv), Seq("query_id"))
        .select(col("query_id"), col("nbr_id"),
          cosine(col("qv"), col("cv")).as("cos"))
        .withColumn("rank", row_number().over(w2).cast("long"))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("nbr_id"), col("rank"), col("cos"))
    }
  }

  /** IVF-PQ: the composed production ANN shape. IVF cells bound WHICH
    * docs each query touches (candidates = nProbe cells, not the
    * corpus); PQ codes bound HOW MUCH each touch costs (m table lookups
    * against 8–16 bytes, not 256 float bytes); the exact re-rank bounds
    * the recall cost of both approximations to shortlist membership.
    * One corpus pass builds (cell, codes, norm); scoring shuffles only
    * cell keys. Codes are plain PQ (not cell residuals) — residual
    * encoding is the next accuracy step and changes only [[pqEncode]]'s
    * input, not this plan. */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 3,
      m: Int = 16, kCodes: Int = 16,
      maxFitRows: Int = 100000, shortlist: Int = -1): DataFrame =
    ivfPqTopKWith(corpus, queries, idCol, vecCol, k,
      ivfCentroids(corpus, vecCol, nCells, maxFitRows),
      pqCodebooks(corpus, vecCol, m, kCodes, maxFitRows),
      nProbe, shortlist)

  /** IVF-PQ query path against prebuilt centroids + codebooks (see
    * [[ivfPqTopK]]) — the reuse form: both index artifacts are one-time
    * builds to persist, not per-query-batch costs. */
  def ivfPqTopKWith(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centers: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      nProbe: Int, shortlist: Int = -1): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val short = if (shortlist < 0) 10 * k else math.max(k, shortlist)

    def cellScore(vec: Column, c: Array[Double]): Column = {
      val cLit = array(c.map(v => lit(v.toFloat)).toIndexedSeq: _*)
      lit(-2.0) * dot(vec, cLit) + lit(c.map(v => v * v).sum)
    }
    def cellRanking(vec: Column): Column =
      sort_array(array(centers.zipWithIndex.toIndexedSeq.map { case (cn, i) =>
        struct(cellScore(vec, cn).as("score"), lit(i).as("cell"))
      }: _*))

    val norm2Lut = array(books.flatMap(_.map(c =>
      lit(c.map(v => v * v).sum.toFloat))).toIndexedSeq: _*)
    val c = corpus.select(col(idCol).as("nbr_id"),
      element_at(cellRanking(col(vecCol)), 1).getField("cell").as("cell"),
      pqEncode(col(vecCol), books).as("codes"))
      .withColumn("nbr_norm",
        sqrt(call_function("pq_adc", col("codes"), norm2Lut)))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(slice(cellRanking(col(vecCol)), 1, nProbe)).as("probe"))
      .select(col("query_id"), col("probe.cell").as("cell"),
        pqLut(col("qv"), books).as("lut"), norm(col("qv")).as("q_norm"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_pq").desc, col("nbr_id"))
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        (call_function("pq_adc", col("codes"), col("lut")) /
          (col("q_norm") * col("nbr_norm"))).as("cos_pq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= short)
      .select(col("query_id"), col("nbr_id"))

    val cv = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    cv.join(broadcast(cand), Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"), col("cos"))
  }

  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 12, dim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), planes, dim).as("bucket"))
    // multi-probe: the query's own bucket plus each 1-bit flip of it
    val qb = lshSignature(col(vecCol), planes, dim)
    val probes = array(qb +: (0 until planes).map(p => qb.bitwiseXOR(lit(1L << p))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probes).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id"))
    c.as("c").join(broadcast(q.as("q")),
        col("c.bucket") === col("q.bucket") && col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), col("rank"), col("cos"))
  }

  /** Margin-based pair mining between two embedding sets (the bitext-mining
    * shape: src = one language/modality, tgt = another; mined pairs become
    * parallel training data). For each src vector, its best tgt neighbor is
    * kept with a margin score — best cosine over the mean of the top-`k`
    * cosines — so a src vector "close to everything" (a hub) scores ≈ 1 and
    * is filtered, while a vector with ONE standout match scores high. The
    * forward-margin simplification of Artetxe & Schwenk's bidirectional
    * ratio margin.
    *
    * Candidates come from [[bruteForceTopK]] here (exact — and the form the
    * oracle can replay); at corpus scale swap the first line for
    * [[ivfPqTopK]] with the same downstream margin — the margin only needs
    * the top-k list, not how it was found.
    *
    * Determinism: the top-k mean routes through round-12 → DECIMAL so both
    * engines sum exactly; cosine itself is the sequential-fold
    * [[graft.functions.VecDot]] double, bit-identical cross-engine.
    */
  def marginMine(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMargin: Double = 0.0): DataFrame = {
    val topk = bruteForceTopK(tgt, src, idCol, vecCol, k)
    val w = Window.partitionBy(col("query_id"))
    topk
      .withColumn("avg_cos",
        (sum(round(col("cos"), 12).cast(DecimalType(28, 14))).over(w)
          .cast("double") / count(lit(1)).over(w)))
      .filter(col("rank") === 1)
      .select(col("query_id").as("src_id"), col("nbr_id").as("tgt_id"),
        col("cos"), (col("cos") / col("avg_cos")).as("margin"))
      .filter(col("margin") >= minMargin)
  }

  /** Embedding-space benchmark decontamination: for every corpus doc, its
    * max cosine against the benchmark/eval set, and the contamination flag
    * `max_cos >= threshold` — the semantic complement of the n-gram
    * containment check (q49), catching paraphrased leakage that exact
    * n-grams miss.
    *
    * Scale shape: the benchmark set is dimension-sized (thousands) —
    * broadcast it; the corpus streams ONCE with no input shuffle and
    * reduces via `max(struct(cos, -bench_id))`, a partial-aggregable
    * (map-side combined) one-exchange argmax, deterministic because the
    * [[graft.functions.VecDot]] fold is bit-stable and max is
    * order-independent. Nothing here is approximate: at 100 TB this is
    * O(|corpus| × |benchmark| × dim) FLOPs of embarrassing parallelism —
    * for a cheaper screen, gate it behind the LSH-bucketed path first.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val d = Par.fanOut(
      docs.select(col(idCol).as("doc_id"), col(vecCol).as("dv")))
    val b = benchmark.select(col(idCol).as("bench_id"), col(vecCol).as("bv"))
    // LEFT join, not inner: an empty benchmark set must yield every doc
    // with contaminated=false, not silently drop the whole corpus
    d.join(broadcast(b), lit(true), "left")
      .select(col("doc_id"), col("bench_id"),
        cosine(col("dv"), col("bv")).as("cos"))
      // argmax with smallest-bench-id tiebreak, as one associative max
      // (null cos rows — the unmatched-left case — are ignored by max)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("cos"), (-col("bench_id")).as("nb"))).as("m"))
      .select(col("doc_id"), (-col("m.nb")).as("nearest_bench_id"),
        col("m.cos").as("max_cos"),
        coalesce(col("m.cos") >= threshold, lit(false)).as("contaminated"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * the corpus into k-means cells (the [[ivfCentroids]] bounded-sample
    * fit), then search for near-duplicate pairs ONLY within a cell —
    * cosine ≥ threshold inside a cell-equi self-join, never an all-pairs
    * product. Of each duplicate pair the smaller id is kept; a doc is
    * dropped if ANY kept-or-dropped smaller-id partner exceeds the
    * threshold (greedy — conservative: the kept set provably contains no
    * intra-cell pair above the threshold, at the cost of occasionally
    * dropping a transitive neighbor a clique-exact method would keep).
    *
    * Scale shape: pair work is Σ|cell|² not |corpus|², bounded by cell
    * granularity — so `nCells` MUST scale with the corpus. The default
    * (`nCells = -1`, auto) therefore derives the cell count from an
    * actual corpus count via [[semDeDupCells]] (cells ≈ `targetCellRows`
    * ≈ 10⁵ rows each) instead of trusting a constant: a caller who kept
    * a fixed 16 at 10⁹ docs would get Σ|cell|² ≈ (n/16)²·16. The count
    * is one metadata-weight pass (parquet row-group footers); pass an
    * explicit `nCells` to skip it when the corpus size is known. The
    * pair join is a plain shuffled hash join on the cell id, so AQE skew
    * handling applies to a hot cell. Cross-cell duplicates are the
    * recall trade — the standard SemDeDup regime. Returns
    * (doc_id, cell, kept).
    */
  def semDeDup(docs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = -1,
      maxFitRows: Int = 100000, targetCellRows: Long = 100000L): DataFrame = {
    val k = if (nCells > 0) nCells
            else {
              val n = docs.count()
              // never more cells than rows (k-means can't place them)
              math.max(1L, math.min(n, semDeDupCells(n, targetCellRows))).toInt
            }
    semDeDupWith(docs, idCol, vecCol, threshold,
      ivfCentroids(docs, vecCol, k, maxFitRows))
  }

  /** [[semDeDup]] against prebuilt cell centroids — the reuse form. */
  def semDeDupWith(docs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, centers: Array[Array[Double]]): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    // nearest cell = min (euclidean score, cell idx) struct — one VecDot
    // per (doc, cell), deterministic idx tiebreak
    def cellScore(vec: Column, c: Array[Double]): Column = {
      val cLit = array(c.map(v => lit(v.toFloat)).toIndexedSeq: _*)
      lit(-2.0) * dot(vec, cLit) + lit(c.map(v => v * v).sum)
    }
    def cellOf(vec: Column): Column =
      array_min(array(centers.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct(cellScore(vec, c).as("s"), lit(i).as("cell"))
      }: _*)).getField("cell")

    val assigned = docs.select(col(idCol).as("doc_id"), col(vecCol).as("v"))
      .withColumn("cell", cellOf(col("v")))
    val a = assigned.select(col("doc_id").as("a_id"), col("v").as("av"),
      col("cell"))
    val b = assigned.select(col("doc_id").as("b_id"), col("v").as("bv"),
      col("cell"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosine(col("av"), col("bv")) >= threshold)
      .select(col("b_id").as("doc_id")).distinct()
    assigned.join(dropped.withColumn("is_dup", lit(true)),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("cell").cast("long").as("cell"),
        coalesce(!col("is_dup"), lit(true)).as("kept"))
  }

  /** [[semDeDup]]'s auto cell count: enough cells that each holds
    * ~`targetCellRows` rows (pair work per cell stays ~targetCellRows²),
    * floored at 16 so tiny corpora still partition, capped at 2¹⁶ where
    * the bounded-sample k-means fit itself (≤ maxFitRows points) stops
    * being able to place more distinct centroids meaningfully. */
  private[graft] def semDeDupCells(
      corpusRows: Long, targetCellRows: Long): Int =
    math.min(1L << 16,
      math.max(16L, corpusRows / math.max(1L, targetCellRows))).toInt
}
