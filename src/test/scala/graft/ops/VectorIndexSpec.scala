package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted IVF-PQ vector index: build/read round-trip, parameter
  * identity enforcement, cell-partitioned layout, rebuild determinism,
  * and retrieval recall against the exact answer. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("build → read round-trip preserves routing tables and params") {
    val dir = tmpDir("vindex") + "/idx"
    val p = VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, kCodes = 16, maxFitRows = 200)
    val h = VectorIndex.read(spark, dir)
    assert(h.params === p)
    assert(h.centers.length === 8)
    assert(h.books.length === 8 && h.books.head.length === 16)
    // routing tables match a fresh in-process fit bit-for-bit (the fit
    // is deterministic) — a rebuilt index routes identically
    val centers2 = Similarity.ivfCentroids(emb, "embedding", 8, 200)
    assert(h.centers.map(_.toSeq).toSeq === centers2.map(_.toSeq).toSeq)
  }

  test("coded table is partitioned by cell; sidecars hidden from it") {
    val dir = tmpDir("vindex2") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 4, m = 8, kCodes = 16, maxFitRows = 200)
    val cellDirs = new java.io.File(s"$dir/coded").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(cellDirs.nonEmpty && cellDirs.forall(_.matches("cell=\\d+")))
    // a plain read of the index root sees ONLY the coded table
    val h = VectorIndex.read(spark, dir)
    assert(h.coded.columns.sorted.toSeq ===
      Seq("cell", "codes", "id", "pq_norm"))
    assert(h.coded.count() === emb.count())
  }

  test("read refuses mismatched build parameters") {
    val dir = tmpDir("vindex3") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 4, m = 8, kCodes = 16, maxFitRows = 200)
    val e = intercept[IllegalArgumentException](
      VectorIndex.read(spark, dir, m = 4))
    assert(e.getMessage.contains("built with m=8"))
    val e2 = intercept[IllegalArgumentException](
      VectorIndex.read(spark, tmpDir("novindex")))
    assert(e2.getMessage.contains("not a persisted vector index"))
  }

  test("rerank retrieval from the persisted index: recall vs exact") {
    val dir = tmpDir("vindex4") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, kCodes = 16, maxFitRows = 200)
    val h = VectorIndex.read(spark, dir)
    val queries = emb.filter($"vec_id" < 20)
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val viaIndex = VectorIndex.topKRerank(h, emb, queries,
        "vec_id", "embedding", k, nProbe = 4)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (exact & viaIndex).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    // exact rerank means every returned cosine is the TRUE cosine:
    // agreement rows must carry identical scores
    val exactCos = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k)
      .select($"query_id", $"nbr_id", $"cos").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    VectorIndex.topKRerank(h, emb, queries, "vec_id", "embedding", k,
        nProbe = 4)
      .select($"query_id", $"nbr_id", $"cos").as[(Long, Long, Double)]
      .collect().foreach { case (q, n, c) =>
        exactCos.get((q, n)).foreach(e => assert(math.abs(e - c) < 1e-9))
      }
  }

  test("append encodes against the FROZEN fit and extends the index") {
    import org.apache.spark.sql.functions.{call_function, element_at, lit, size, sqrt, struct}
    val dir = tmpDir("vindex6") + "/idx"
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 =!= 0)
    VectorIndex.build(half1, "vec_id", "embedding", dir,
      nCells = 8, m = 8, kCodes = 16, maxFitRows = 200)
    val before = VectorIndex.read(spark, dir)
    VectorIndex.append(half2, "vec_id", "embedding", dir)
    val after = VectorIndex.read(spark, dir)

    // the routing tables did not move: append froze the fit
    assert(after.centers.map(_.toSeq).toSeq ===
      before.centers.map(_.toSeq).toSeq)
    assert(after.books.map(_.map(_.toSeq).toSeq).toSeq ===
      before.books.map(_.map(_.toSeq).toSeq).toSeq)
    assert(after.coded.count() === emb.count())

    // bit-for-bit: the appended coded table equals encoding the FULL
    // corpus against the frozen half-corpus fit — so any retrieval over
    // the appended index matches a one-shot encode with this fit exactly
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val norm2Lut = org.apache.spark.sql.functions.array(
      before.books.flatMap(_.map(c =>
        lit(c.map(v => v * v).sum.toFloat))).toIndexedSeq: _*)
    def cellOf(v: org.apache.spark.sql.Column) = element_at(
      org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.array(
          before.centers.zipWithIndex.map { case (cn, i) => struct(
            (lit(-2.0) * Similarity.dot(v, org.apache.spark.sql.functions
                .array(cn.map(x => lit(x.toFloat)): _*)) +
              lit(cn.map(x => x * x).sum)).as("score"),
            lit(i).as("cell")) }: _*)), 1).getField("cell")
    val expect = emb.select($"vec_id".as("id"),
        cellOf($"embedding").as("cell"),
        Similarity.pqEncode($"embedding", before.books).as("codes"))
      .withColumn("pq_norm",
        sqrt(call_function("pq_adc", $"codes", norm2Lut)))
      .select($"id", $"cell", $"codes".cast("array<int>"), $"pq_norm")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    val got = after.coded
      .select($"id", $"cell", $"codes".cast("array<int>"), $"pq_norm")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    assert(got === expect)

    // retrieval over the appended index is well-formed end to end
    val res = VectorIndex.topKRerank(after, emb,
      emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3)
    assert(res.count() === 30)
  }

  test("append of an empty batch is a no-op, not an exception") {
    val dir = tmpDir("vindex8") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 4, m = 8, kCodes = 16, maxFitRows = 200)
    val before = VectorIndex.read(spark, dir)
    val p = VectorIndex.append(emb.filter($"vec_id" < 0), // empty
      "vec_id", "embedding", dir)
    assert(p.dim === before.params.dim) // params returned unchanged
    val after = VectorIndex.read(spark, dir)
    assert(after.coded.count() === before.coded.count())
  }

  test("append refuses a dimension-mismatched batch") {
    import org.apache.spark.sql.functions.slice
    val dir = tmpDir("vindex7") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 4, m = 8, kCodes = 16, maxFitRows = 200)
    val shrunk = emb.select($"vec_id",
      slice($"embedding", 1, 8).as("embedding"))
    val e = intercept[IllegalArgumentException](
      VectorIndex.append(shrunk, "vec_id", "embedding", dir))
    assert(e.getMessage.contains("dim"))
  }

  test("compact merges per-cell append files; retrieval is unchanged") {
    val dir = tmpDir("vindex9") + "/idx"
    // fit on the full corpus, then reconstruct the coded table by 4
    // appends — each writes its own files into every touched cell, the
    // daily-ingest accumulation compact() exists to undo
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 4, m = 8, kCodes = 16, maxFitRows = 200)
    val coded = new java.io.File(s"$dir/coded")
    def parquetFiles = coded.listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(coded)
    (0 until 4).foreach { m =>
      VectorIndex.append(emb.filter($"vec_id" % 4 === m),
        "vec_id", "embedding", dir)
    }
    val filesBefore = parquetFiles
    val resBefore = VectorIndex.topKRerank(VectorIndex.read(spark, dir),
        emb, emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(VectorIndex.compact(spark, dir) >= 1)
    assert(parquetFiles < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $parquetFiles")
    val h = VectorIndex.read(spark, dir)
    assert(h.coded.count() === emb.count())
    val resAfter = VectorIndex.topKRerank(h, emb,
        emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(resAfter === resBefore)
  }

  test("delete: removed ids stop surfacing; untouched cells byte-identical") {
    val dir = tmpDir("vindexdel") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, kCodes = 16, maxFitRows = 200)
    val h0 = VectorIndex.read(spark, dir)
    // probe with the victim's own vector under a FOREIGN id (retrieval
    // self-filters on equal ids): exact rerank must put the victim at
    // cosine ~1 pre-delete, and the index must stop producing it after
    val victim = 5L
    val queries = emb.filter($"vec_id" === victim)
      .select(lit(999999L).as("vec_id"), $"embedding")
    def hits() = VectorIndex.topKRerank(VectorIndex.read(spark, dir),
        emb, queries, "vec_id", "embedding", k = 10, nProbe = 8)
      .select($"nbr_id").as[Long].collect().toSet
    assert(hits().contains(victim))
    // capture the per-cell file layout and which cells hold the victim
    def cellFiles(): Map[String, Seq[(String, Long)]] =
      new java.io.File(s"$dir/coded").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().filter(_.isFile)
          .map(f => (f.getName, f.length())).toSeq.sorted).toMap
    val before = cellFiles()
    val victimCells = h0.coded.filter($"id" === victim)
      .select($"cell").as[Int].collect().map(c => s"cell=$c").toSet
    val rewritten = VectorIndex.delete(spark, dir,
      Seq(victim).toDF("vec_id"), "vec_id")
    assert(rewritten === victimCells.size)
    assert(!hits().contains(victim), "deleted id still retrieved")
    // cell granularity: every cell NOT holding the victim is untouched
    val after = cellFiles()
    before.keys.filterNot(victimCells).foreach { c =>
      assert(after(c) === before(c), s"untouched $c was rewritten")
    }
    // the rest of the corpus still retrieves (fits unchanged)
    assert(hits().nonEmpty)
    // deleting an absent id rewrites nothing
    assert(VectorIndex.delete(spark, dir,
      Seq(999999L).toDF("vec_id"), "vec_id") === 0)
  }

  test("ADC-only retrieval touches just the probed cells") {
    val dir = tmpDir("vindex5") + "/idx"
    VectorIndex.build(emb, "vec_id", "embedding", dir,
      nCells = 8, m = 8, kCodes = 16, maxFitRows = 200)
    val h = VectorIndex.read(spark, dir)
    val queries = emb.filter($"vec_id" === 0)
    val out = VectorIndex.topKAdc(h, queries, "vec_id", "embedding",
      k = 50, nProbe = 2)
    // candidate set spans at most nProbe distinct cells — the scan's
    // partition-pruning contract, asserted semantically
    val cells = out.join(h.coded.select($"id".as("nbr_id"), $"cell"),
        Seq("nbr_id"))
      .select($"cell").distinct().count()
    assert(cells <= 2, s"candidates from $cells cells, nProbe=2")
  }
}
