package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val docB = docA.replace("lazy", "sleepy")  // near-dup of A
  private val docC = "completely different content about spark query engines and distributed joins at scale"

  private lazy val docs = Seq((1L, docA), (2L, docA), (3L, docB), (4L, docC))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps lowest id") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy($"keep_id").collect()
    assert(r.length === 3)
    assert(r.head.getAs[Long]("keep_id") === 1L)
    assert(r.head.getAs[Long]("n_copies") === 2L)
  }

  test("minhash: identical docs have identical signatures; est_jaccard 1.0") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.9)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L
      && r.getAs[Double]("est_jaccard") == 1.0))
  }

  test("minhash-LSH finds the near-dup pair, not the unrelated one") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical sketches for identical docs; near-dups within hamming 8") {
    val sk = Dedup.simhashSketches(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("sk")).toMap
    assert(sk(1L) === sk(2L))
    assert(java.lang.Long.bitCount(sk(1L) ^ sk(3L)) <= 8)
    assert(java.lang.Long.bitCount(sk(1L) ^ sk(4L)) > 8)
    assert(sk.values.forall(_ >= 0L)) // 60-bit domain
  }

  test("OnIndex forms ≡ the direct forms over a shared shingle index") {
    // the cross-job reuse path: one persisted corpus index feeding both
    // n-gram gates must reproduce the direct per-gate builds exactly
    val idx = Dedup.shingleIndex(docs, "doc_id", "text", shingleN = 3)
    val direct = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.1).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).sortBy(p => (p._1, p._2)).toSeq
    val viaIdx = Dedup.ngramJaccardPairsOnIndex(idx, threshold = 0.1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).sortBy(p => (p._1, p._2)).toSeq
    assert(viaIdx === direct)

    val bench = Seq((100L, docA)).toDF("doc_id", "text")
    val directC = Dedup.benchmarkContamination(docs, "doc_id", "text",
        bench, "doc_id", "text", shingleN = 3, minContainment = 0.1)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bench_id"), r.getAs[Double]("containment")))
      .sortBy(p => (p._1, p._2)).toSeq
    val viaIdxC = Dedup.benchmarkContaminationOnIndex(
        idx.withColumnRenamed("id", "doc_id"),
        Dedup.shingleIndex(bench, "doc_id", "text", shingleN = 3,
          as = "bench_id"),
        minContainment = 0.1)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("bench_id"), r.getAs[Double]("containment")))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(viaIdxC === directC)
  }

  test("ngram jaccard: hand-checked value") {
    // A has 12 distinct 3-shingles, B differs in one word -> shares 9
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 2L)) === 1.0)
    val j13 = pairs((1L, 3L))
    assert(j13 > 0.4 && j13 < 0.8)
    assert(!pairs.contains((1L, 4L)))
  }

  test("native minhash_sig ≡ the composable SQL form, element for element") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val hs = docs
      .select($"doc_id", Text.tokens($"text").as("toks"))
      .select($"doc_id", Text.shingleHashesOf($"toks", 3).as("hs"))
    val native = hs.select($"doc_id",
        call_function("minhash_sig", $"hs", lit(24)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sql = hs.select($"doc_id",
        expr(Dedup.minhashSigExpr("hs", 24)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === sql)
    assert(native(1L).length === 24)
  }

  test("minhash: shingle-less docs never pair (sentinel signatures excluded)") {
    import spark.implicits._
    // one-token docs have no 3-gram shingles; their sentinel signatures
    // would otherwise all agree and score unrelated docs as 1.0 dups
    val docs = Seq((1L, "hello"), (2L, "world"), (3L, "hi"),
        (4L, "a real document with several tokens inside of it"),
        (5L, "a real document with several tokens inside of it"))
      .toDF("doc_id", "text")
    val self = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(self === Set((4L, 5L)))
    val cross = Dedup.minhashNearDupsAgainst(
        docs.filter($"doc_id" <= 3), docs.filter($"doc_id" > 3),
        "doc_id", "text", threshold = 0.5)
      .count()
    assert(cross === 0L)
  }

  test("minhash incremental: index form equals the direct cross form") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
        (i, if (i % 7 == 0) "the quick brown fox jumps over the lazy dog again"
            else s"unique document number $i with its own words ${i * 31}"))
      .toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" <= 20)
    val batch = docs.filter($"doc_id" > 20)
    val direct = Dedup.minhashNearDupsAgainst(corpus, batch, "doc_id", "text",
      threshold = 0.5)
    val index = Dedup.bandedSignatureIndex(corpus, "doc_id", "text")
    val viaIndex = Dedup.minhashNearDupsAgainstIndex(index, batch,
      "doc_id", "text", threshold = 0.5)
    assert(direct.count() > 0)
    assert(direct.except(viaIndex).isEmpty && viaIndex.except(direct).isEmpty)
  }

  test("minhash index: persisted round-trip carries parameters; mismatch refused") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"document number $i with several words"))
      .toDF("doc_id", "text")
    val dir = tmpDir("sigidx") + "/idx"
    Dedup.writeSignatureIndex(
      Dedup.bandedSignatureIndex(docs, "doc_id", "text"), dir, 24, 3, 8)
    assert(Dedup.readSignatureIndex(spark, dir, 24, 3, 8).count() > 0)
    val e = intercept[IllegalArgumentException] {
      Dedup.readSignatureIndex(spark, dir, numHashes = 16, shingleN = 3, bands = 8)
    }
    assert(e.getMessage.contains("numHashes"))
    // a bare parquet dir without the sidecar is not a trusted index
    val bare = tmpDir("sigidx2") + "/bare"
    docs.write.parquet(bare)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.readSignatureIndex(spark, bare, 24, 3, 8)
    }
    assert(e2.getMessage.contains("_graft_index_meta"))
  }

  test("signatureIndexDelete: a removed doc stops matching; sidecar survives") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog every day"
    val docs = ((1L to 10L).map(i =>
        (i, s"unique document number $i with its own words ${i * 31}"))
      :+ (11L, dup)).toDF("doc_id", "text")
    val dir = tmpDir("sigidxdel") + "/idx"
    Dedup.writeSignatureIndex(
      Dedup.bandedSignatureIndex(docs, "doc_id", "text"), dir, 24, 3, 8)
    val batch = Seq((100L, dup)).toDF("doc_id", "text")
    def matches() = Dedup.minhashNearDupsAgainstIndex(
      Dedup.readSignatureIndex(spark, dir, 24, 3, 8), batch,
      "doc_id", "text", threshold = 0.5).count()
    assert(matches() === 1L, "fixture: the near-dup must match pre-delete")
    // takedown: doc 11 leaves the corpus — its signatures must leave
    // the derived index too, or it keeps matching forever
    val removed = Dedup.signatureIndexDelete(spark, dir,
      Seq(11L).toDF("doc_id"), "doc_id")
    assert(removed > 0)
    assert(matches() === 0L, "deleted doc still matches from the index")
    // the parameter sidecar survives the rewrite (identity check holds)
    assert(Dedup.readSignatureIndex(spark, dir, 24, 3, 8).count() > 0)
    // deleting an absent id is a no-op (0 removed, index untouched)
    assert(Dedup.signatureIndexDelete(spark, dir,
      Seq(999L).toDF("doc_id"), "doc_id") === 0L)
    assert(Dedup.readSignatureIndex(spark, dir, 24, 3, 8).count() > 0)
  }

  test("minhash index: mis-shaped signatures fail loudly, never mis-score") {
    import spark.implicits._
    val docs = (1L to 10L).map(i =>
        (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // index actually built at width 16, joined as if width 24: zip_with
    // would null-pad and estJaccard divide by the wrong width
    val bad = Dedup.bandedSignatureIndex(docs, "doc_id", "text",
      numHashes = 16, bands = 8)
    val err = intercept[Exception] {
      Dedup.minhashNearDupsAgainstIndex(bad, docs, "doc_id", "text",
        numHashes = 24).count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(err).contains("signature width"))
  }

  test("minhash-LSH stop-band cap: a degenerate bucket is dropped, real pairs survive") {
    // boilerplate-heavy corpus: 10 identical docs share EVERY band key
    // (one degenerate bucket per band → 45 candidate pairs from
    // boilerplate alone), plus one genuine near-dup pair
    val boiler = (1L to 10L).map(i => (i, docA))
    val corpus = (boiler ++ Seq((11L, docA.replace("dog", "cat") + " extra words here"),
      (12L, docA.replace("dog", "cat") + " extra words here too")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(uncapped.count(p => p._1 <= 10 && p._2 <= 10) === 45)
    assert(uncapped.contains((11L, 12L)))
    val capped = Dedup.minhashNearDups(corpus, "doc_id", "text", threshold = 0.4,
        maxBandDocFreq = 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the 10-doc boilerplate bucket exceeds the cap → no pairs from it;
    // the (11,12) pair's buckets have df=2 and survive
    assert(!capped.exists(p => p._1 <= 10 && p._2 <= 10))
    assert(capped.contains((11L, 12L)))
  }

  test("n-gram stop-shingle cap: over-cap shingles feed no pairs, rare ones survive") {
    // round-19 internals change: the cap moved from a bucket-size filter
    // AFTER collect_list to a row-stream window filter BEFORE it (an
    // over-cap hot shingle must never materialize its posting array) —
    // the kept row set must be unchanged
    val boiler = (1L to 8L).map(i => (i, docA))
    val corpus = (boiler ++ Seq(
        (11L, docA.replace("dog", "cat") + " extra words here"),
        (12L, docA.replace("dog", "cat") + " extra words here too")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(uncapped.count(p => p._1 <= 8 && p._2 <= 8) === 28)
    assert(uncapped.contains((11L, 12L)))
    val capped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        shingleN = 3, threshold = 0.4, maxShingleDocFreq = 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // every shingle of the 8 boilerplate docs has df ≥ 8 > 5 → dropped
    // whole; (11, 12)'s distinguishing shingles have df = 2 and survive
    assert(!capped.exists(p => p._1 <= 8 && p._2 <= 8))
    assert(capped.contains((11L, 12L)))
  }

  test("simhash block-permutation: finds a pair differing only in HIGH bits") {
    import org.apache.spark.sql.functions.col
    // sketches differing in 3 high bits (57, 58, 59): the 12-bit prefix
    // bucketing of simhashNearDups can never pair them; the pigeonhole
    // block construction must
    val base = 0x0ABCDEF01234567L
    val flipped = base ^ (7L << 57)
    val sk = Seq((1L, base), (2L, flipped), (3L, 0x0123456789ABCDEL))
      .toDF("id", "sk")
    val prefix = sk.withColumn("bucket",
        org.apache.spark.sql.functions.shiftright(col("sk"), 48))
      .as("a").join(sk.withColumn("bucket",
        org.apache.spark.sql.functions.shiftright(col("sk"), 48)).as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
    assert(prefix.count() === 0) // the heuristic misses it
    val full = Dedup.simhashPairsFromSketches(sk, maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(full.contains((1L, 2L)))
    assert(!full.exists(p => p._2 == 3L))
  }

  test("simhash full recall ⊇ prefix-bucketed pairs on real docs") {
    val fullPairs = Dedup.simhashNearDupsFull(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val prefixPairs = Dedup.simhashNearDups(docs, "doc_id", "text",
        prefixBits = 12, maxHamming = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(prefixPairs.subsetOf(fullPairs))
    assert(fullPairs.contains((1L, 2L))) // identical docs, hamming 0
  }

  test("contamination: a doc embedding a benchmark item scores 1.0, jaccard stays low") {
    val bench = Seq((100L, docA)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, docA + " plus a very long tail of unrelated filler content words " * 3),
      (2L, docC))
      .toDF("doc_id", "text")
    val hits = Dedup.benchmarkContamination(
        corpus, "doc_id", "text", bench, "doc_id", "text",
        shingleN = 3, minContainment = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
        r.getAs[Double]("containment")))
    assert(hits.length === 1)
    assert(hits.head._1 === 1L && hits.head._2 === 100L)
    assert(hits.head._3 === 1.0) // every benchmark shingle is present
    // symmetric jaccard on the same pair is well below the containment
    val j = Dedup.ngramJaccardPairs(
        corpus.unionByName(bench), "doc_id", "text", shingleN = 3, threshold = 0.01)
      .filter(col("id_a") === 1L && col("id_b") === 100L)
      .head().getAs[Double]("jaccard")
    assert(j < 0.6)
  }

  test("embedding near-dups: cosine threshold on crafted vectors") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(e, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("embedding near-dups: O(n²) guard refuses a corpus over maxRows") {
    val e = (1L to 11L).map(i => (i, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(e, "vec_id", "embedding", threshold = 0.9,
        maxRows = 10)
    }
    assert(ex.getMessage.contains("embeddingNearDupsLsh"))
  }

  test("embedding LSH dedup: recall ≥ 0.8 vs the exact pairs at sf0.01") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(Dedup.embeddingNearDups(e, "vec_id", "embedding", 0.45))
    val lsh = pairSet(Dedup.embeddingNearDupsLsh(e, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty)
    // precision is exact by construction (every candidate is cosine-verified)
    assert(lsh.subsetOf(exact))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall over ${exact.size} exact pairs")
  }

  // --------------------------------------------- cross-doc line removal

  private lazy val linedDocs = Seq(
    (1L, "COOKIE BANNER\nunique first body\n\nCOPYRIGHT FOOT"),
    (2L, "COOKIE BANNER\nunique second body\nCOPYRIGHT FOOT"),
    (3L, "COOKIE BANNER\nunique third body\nCOPYRIGHT FOOT"),
    (4L, "COOKIE BANNER\nCOPYRIGHT FOOT"),
    (5L, "no boilerplate at all\njust content")
  ).toDF("doc_id", "text")

  test("removeCommonLines strips lines in >= minDocs docs, keeps order and empties") {
    val r = Dedup.removeCommonLines(linedDocs, "doc_id", "text", minDocs = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("clean_text"), x.getAs[Long]("n_lines_removed"))).toMap
    assert(r(1L) === (("unique first body\n", 2L)))   // empty line survives
    assert(r(2L) === (("unique second body", 2L)))
    assert(r(4L) === (("", 2L)))                      // fully-boilerplate doc
    assert(r(5L) === (("no boilerplate at all\njust content", 0L)))
  }

  test("removeCommonLines reconstruction is byte-exact when nothing is common") {
    val r = Dedup.removeCommonLines(linedDocs.repartition(7), "doc_id", "text",
        minDocs = 99)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("clean_text"))
      .toMap
    val orig = linedDocs.collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("text")).toMap
    assert(r === orig)
  }

  test("removeCommonLines result is independent of partitioning") {
    val a = Dedup.removeCommonLines(linedDocs, "doc_id", "text", 3)
      .orderBy($"doc_id").collect().toSeq
    val b = Dedup.removeCommonLines(linedDocs.repartition(13), "doc_id", "text", 3)
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  // ------------------------------------------------------ duplicatedSpans

  // 10 shared tokens embedded in otherwise-unique 20-token docs: with
  // w=4 the shared run yields windows at 7 consecutive positions that
  // must merge into ONE 10-token span.
  private val sharedRun = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private lazy val spanDocs = Seq(
    (1L, s"u11 u12 u13 u14 u15 $sharedRun u16 u17 u18 u19 u20"),
    (2L, s"v11 v12 v13 v14 v15 $sharedRun v16 v17 v18 v19 v20"),
    (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"),
    // internal repetition only — same 4-gram twice within ONE doc
    (4L, "x1 x2 rep1 rep2 rep3 rep4 x3 x4 rep1 rep2 rep3 rep4 x5 x6"),
    (5L, "short doc")) // fewer tokens than the window
    .toDF("doc_id", "text")

  test("duplicatedSpans merges overlapping shared windows into one span") {
    val r = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // shared run = tokens 6..15 → windows at pos 6..12 (7 windows, 1 span)
    for (id <- Seq(1L, 2L)) {
      assert(r(id).getAs[Long]("n_dup_windows") === 7L)
      assert(r(id).getAs[Long]("n_spans") === 1L)
      assert(r(id).getAs[Long]("covered_tokens") === 10L)
      assert(r(id).getAs[Double]("dup_fraction") === 0.5) // 10 of 20 tokens
    }
  }

  test("duplicatedSpans: unique, internal-repeat-only and short docs report zero") {
    val r = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    for (id <- Seq(3L, 4L, 5L)) {
      assert(r(id).getAs[Long]("n_dup_windows") === 0L, s"doc $id")
      assert(r(id).getAs[Long]("covered_tokens") === 0L, s"doc $id")
      assert(r(id).getAs[Double]("dup_fraction") === 0.0, s"doc $id")
    }
    assert(r(5L).getAs[Long]("n_tokens") === 2L)
  }

  test("duplicatedSpans: disjoint shared regions stay separate spans") {
    val run2 = "mu nu xi omicron pi rho"
    val docs2 = Seq(
      (1L, s"a1 a2 $sharedRun a3 a4 a5 a6 $run2 a7 a8"),
      (2L, s"b1 b2 b3 $sharedRun b4 b5 b6 b7 $run2 b8"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs2, "doc_id", "text", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_spans") === 2L)
    assert(r(1L).getAs[Long]("covered_tokens") === 16L) // 10 + 6
    assert(r(2L).getAs[Long]("n_spans") === 2L)
  }

  test("duplicatedSpans is independent of partitioning") {
    val a = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", 4)
      .orderBy($"doc_id").collect().toSeq
    val b = Dedup.duplicatedSpans(spanDocs.repartition(13), "doc_id", "text", 4)
      .orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }
}
