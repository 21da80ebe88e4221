package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    GraftFunctions.ensureRegistered(spark)
    Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
  }

  test("vec_dot native expression: exact values, null propagation") {
    val r = vecs.filter($"vec_id" === 1L)
      .select(call_function("vec_dot", $"embedding", $"embedding")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
    val n = vecs.select(call_function("vec_dot", lit(null).cast("array<float>"),
      $"embedding")).head()
    assert(n.isNullAt(0))
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val c = vecs.as("a").join(vecs.as("b"), $"a.vec_id" === 0L)
      .select($"b.vec_id".as("id"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .orderBy($"id").collect().map(_.getDouble(1))
    assert(math.abs(c(0) - 1.0) < 1e-9)
    assert(math.abs(c(1) - 0.8) < 1e-6)
    assert(math.abs(c(2)) < 1e-9)
    assert(math.abs(c(3) + 1.0) < 1e-9)
  }

  test("brute-force top-k: correct neighbor order, self excluded") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 3).collect()
    assert(top.map(_.getAs[Long]("nbr_id")).toSeq === Seq(1L, 2L, 3L))
    assert(top.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
  }

  test("IVF ANN: sampled fit is bounded AND recall holds AND centroids reuse") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    // the fit's train set is hard-capped: 500-vector corpus, 100-row budget
    assert(Similarity.ivfTrainSet(e, "embedding", maxFitRows = 100).count() <= 100)
    assert(Similarity.ivfTrainSet(e, "embedding", maxFitRows = 100000).count() === e.count())
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    // recall with the fit seeing only a 100-row sample of the 500 vectors
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 3, maxFitRows = 100)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // prebuilt-centroid path ≡ fit-inline path (build once, reuse per batch)
    val centers = Similarity.ivfCentroids(e, "embedding", nCells = 8, maxFitRows = 100)
    val reused = Similarity.ivfTopKWith(e, q, "vec_id", "embedding", k = 5,
        centers, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    assert(reused === ivf)
  }

  test("LSH ANN: high recall on clustered vectors (the regime LSH serves)") {
    // 5 well-separated clusters of near-identical vectors: true neighbors
    // have cosine ≥ ~0.98, so hyperplane signatures collide with high
    // probability. (On near-orthogonal random vectors recall is
    // legitimately poor — that's the LSH trade, not a bug.)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for {
      c <- centers.indices
      i <- 0 until 20
    } yield {
      val v = centers(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      ((c * 20 + i).toLong, v)
    }
    val e = rows.toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" % 20 === 0) // one query per cluster
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5,
        planes = 12, dim = dim)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("decontaminate: exact max-cos per doc, flag at threshold") {
    // docs 2,3 vs benchmark {0: (1,0), 1: (.8,.6)}: doc 2 (0,1) has
    // max cos .6 (vs bench 1); doc 3 (-1,0) has max cos 0 (vs bench 1...
    // cos(3,0)=-1, cos(3,1)=-0.8 → max -0.8)
    val out = Similarity.decontaminate(
        vecs.filter($"vec_id" >= 2), vecs.filter($"vec_id" < 2),
        "vec_id", "embedding", threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nearest_bench_id"), r.getAs[Double]("max_cos"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(out(2L)._1 === 1L && math.abs(out(2L)._2 - 0.6) < 1e-6)
    assert(out(2L)._3 === true)
    assert(out(3L)._1 === 1L && math.abs(out(3L)._2 + 0.8) < 1e-6)
    assert(out(3L)._3 === false)
  }

  test("decontaminate: empty benchmark keeps every doc, contaminated=false") {
    val out = Similarity.decontaminate(
        vecs.filter($"vec_id" >= 2), vecs.filter($"vec_id" < 0),
        "vec_id", "embedding", threshold = 0.5)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet ===
      vecs.filter($"vec_id" >= 2).select($"vec_id").as[Long].collect().toSet)
    assert(out.forall(!_.getAs[Boolean]("contaminated")))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("max_cos"))))
  }

  test("semDeDup: auto cell count scales with the corpus, floored and capped") {
    // cells ≈ corpus / targetCellRows — the constant-16 default at 1e9
    // docs would have made pair work (n/16)²·16
    assert(Similarity.semDeDupCells(1000L, 100000L) === 16) // floor
    assert(Similarity.semDeDupCells(1000000000L, 100000L) === 10000)
    assert(Similarity.semDeDupCells(1000000000000L, 100000L) === 65536) // cap
    // and the auto path actually runs end-to-end (small corpus → floor,
    // clamped to the row count)
    val rnd = new scala.util.Random(7)
    val distinct = (1L to 39L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val e = (distinct :+ (40L, distinct.head._2)) // 40 duplicates 1 exactly
      .toDF("vec_id", "embedding")
    val out = Similarity.semDeDup(e, "vec_id", "embedding", threshold = 0.999)
    assert(out.count() === 40)
    val kept = out.filter($"kept").select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(40L))
  }

  test("semDeDup: kept set has no intra-cell pair above threshold") {
    // 5 tight clusters × 20 near-identical members: intra-cluster cosine
    // ≥ ~0.99 — SemDeDup should keep ~1 doc per cluster
    val rnd = new scala.util.Random(11)
    val dim = 16
    val centers = Array.fill(5)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for { c <- centers.indices; i <- 0 until 20 } yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 20 + i).toLong, v)
    }
    val e = rows.toDF("vec_id", "embedding")
    val out = Similarity.semDeDup(e, "vec_id", "embedding",
      threshold = 0.95, nCells = 5)
    val kept = out.filter($"kept").select($"doc_id").as[Long].collect().toSet
    assert(out.count() === 100L) // every doc gets a verdict
    // near-identical clusters collapse hard: ≤ 3 survivors per 20-member
    // cluster (cells may split a cluster; never the reverse at this sep)
    assert(kept.size <= 15, s"kept ${kept.size}")
    assert(kept.nonEmpty)
    // the invariant: no two KEPT docs in the same cell are ≥ threshold
    val keptVecs = out.filter($"kept")
      .join(e, out("doc_id") === e("vec_id"))
      .select($"doc_id", $"cell", $"embedding")
    val viol = keptVecs.as("a").join(keptVecs.as("b"),
        $"a.cell" === $"b.cell" && $"a.doc_id" < $"b.doc_id")
      .filter(Similarity.cosine($"a.embedding", $"b.embedding") >= 0.95)
    assert(viol.count() === 0L)
  }

  test("PQ ANN: codebooks from a bounded fit, recall holds, codes tiny") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val books = Similarity.pqCodebooks(e, "embedding", m = 16, kCodes = 16,
      maxFitRows = 100000)
    assert(books.length === 16 && books.forall(_.length === 16))
    assert(books.forall(_.forall(_.length === 4))) // 64 / 16 subspaces
    // pure ADC ranking: coarse (random vectors are PQ's worst case) but
    // must still beat chance by a wide margin
    val adcOnly = Similarity.pqTopKWith(e, q, "vec_id", "embedding", k = 5,
        books, shortlist = 0)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val adcRecall = (exact & adcOnly).size.toDouble / exact.size
    assert(adcRecall >= 0.2, s"ADC recall $adcRecall")
    // shortlist + exact re-rank (the production path): high recall
    val pq = Similarity.pqTopKWith(e, q, "vec_id", "embedding", k = 5,
        books, shortlist = 50)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.7, s"re-ranked recall $recall")
    // the codes really are m small ints (the 32× compression claim)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val codes = e.select(Similarity.pqEncode($"embedding", books).as("c"))
      .select(explode($"c").as("code"))
    assert(codes.agg(max($"code"), min($"code"))
      .head().toSeq.asInstanceOf[Seq[Int]].forall(c => c >= 0 && c < 16))
  }

  test("IVF-PQ composed ANN: candidates from cells, recall still holds") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val got = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 4, maxFitRows = 100000)
      .collect()
    val pairs = got.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = (exact & pairs).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // the re-rank phase reports TRUE cosines: every returned score must
    // match the exact score for that pair (approximation only selects)
    val exactCos = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 500)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id")) ->
        r.getAs[Double]("cos")).toMap
    got.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))
      assert(math.abs(r.getAs[Double]("cos") - exactCos(key)) < 1e-12)
    }
  }

  test("pq_adc scores match a driver-side replay; shape mismatch is loud") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val lut = (0 until 8).flatMap(j => (0 until 4).map(c => (j * 10 + c).toFloat))
    val codes = Seq(0, 1, 2, 3, 0, 1, 2, 3)
    val expected = codes.zipWithIndex.map { case (c, j) => (j * 10 + c).toDouble }.sum
    val got = Seq((codes, lut)).toDF("codes", "lut")
      .select(call_function("pq_adc", $"codes", $"lut"))
      .head().getDouble(0)
    assert(got === expected)
    // LUT not a multiple of m → loud failure, not silent mis-score
    val bad = Seq((Seq(0, 1, 2), lut)).toDF("codes", "lut")
      .select(call_function("pq_adc", $"codes", $"lut"))
    val ex = intercept[Exception] { bad.head() }
    assert(ex.getMessage != null)
    // code out of range → loud failure
    val oob = Seq((Seq(9, 0, 0, 0, 0, 0, 0, 0), lut)).toDF("codes", "lut")
      .select(call_function("pq_adc", $"codes", $"lut"))
    val ex2 = intercept[Exception] { oob.head() }
    assert(ex2.getMessage != null)
  }

  test("marginMine: standout pairs score high, hub vectors score ~1") {
    val tgt = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val src = Seq(
      (101L, Array(0.99f, 0.1f, 0.1f, 0f)),   // standout match: t1
      (102L, Array(0.58f, 0.57f, 0.59f, 0f))) // hub: close to all three
      .toDF("vec_id", "embedding")
    val r = Similarity.marginMine(src, tgt, "vec_id", "embedding", k = 3)
      .collect().map(x => x.getAs[Long]("src_id") ->
        (x.getAs[Long]("tgt_id"), x.getAs[Double]("margin"))).toMap
    assert(r(101L)._1 === 1L)
    assert(r(101L)._2 > 1.3)                    // standout margin
    assert(math.abs(r(102L)._2 - 1.0) < 0.05)   // hub margin ~ 1
    // minMargin screens the hub out
    val kept = Similarity.marginMine(src, tgt, "vec_id", "embedding",
        k = 3, minMargin = 1.2)
      .collect().map(_.getAs[Long]("src_id")).toSet
    assert(kept === Set(101L))
  }
}
