package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Govern.takedownCascade]] — the corpus+derived-index takedown
  * under the "indexes lead, the corpus follows" ordering contract:
  * crash-injected at the widest seam (all indexes purged, corpus
  * commit not yet), at a partial-index seam, and mid-WAP (staged but
  * unpublished); in every reachable state the purged indexes never
  * serve a removed doc, and re-running the same cascade converges. */
class GovernSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")

  /** corpus snapshot table + vector index + signature index, all
    * holding the full document set. */
  private def build(root: String): (String, String, String) = {
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    val vidx = s"$root/vidx"
    VectorIndex.build(emb, "vec_id", "embedding", vidx,
      nCells = 4, m = 4, kCodes = 16, maxFitRows = 200)
    val sidx = s"$root/sidx"
    Dedup.writeSignatureIndex(
      Dedup.bandedSignatureIndex(docs, "doc_id", "text",
        numHashes = 24, shingleN = 3, bands = 8, cache = false),
      sidx, numHashes = 24, shingleN = 3, bands = 8)
    (corpus, vidx, sidx)
  }

  private def removed = docs.filter(col("doc_id") % 10 === 3)
    .select(col("doc_id"))

  private def vectorServes(vidx: String): Long =
    spark.read.parquet(s"$vidx/coded")
      .join(removed.select(col("doc_id").as("id")), Seq("id"),
        "left_semi").count()

  private def sigServes(sidx: String): Long =
    spark.read.parquet(sidx)
      .join(removed.select(col("doc_id").as("id")), Seq("id"),
        "left_semi").count()

  private def corpusServes(corpus: String): Long =
    Layout.snapshotRead(spark, corpus)
      .join(removed, Seq("doc_id"), "left_semi").count()

  private final class Crash extends RuntimeException("injected crash")

  test("crash between the index purge and the corpus commit: " +
      "over-deletion only, never a removed doc served; re-run converges") {
    val root = tmpDir("govern1")
    val (corpus, vidx, sidx) = build(root)
    val ixs = Seq(Govern.VectorIndexRef(vidx), Govern.SignatureIndexRef(sidx))
    assert(vectorServes(vidx) > 0 && sigServes(sidx) > 0 &&
      corpusServes(corpus) > 0, "fixture must hold the removed docs")
    intercept[Crash] {
      Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"), ixs,
        beforeCorpusPublish = () => throw new Crash)
    }
    // the crash state: indexes purged (a still-resident doc is briefly
    // not retrievable — the tolerated direction), corpus untouched
    assert(vectorServes(vidx) === 0L,
      "the vector index must never serve a removed doc after the purge")
    assert(sigServes(sidx) === 0L,
      "the signature index must never match a removed doc after the purge")
    assert(corpusServes(corpus) > 0,
      "the corpus commit must not have landed before the crash point")
    // recovery = the SAME cascade again: index halves are idempotent
    // no-ops, the corpus half lands
    val r = Govern.takedownCascade(spark, corpus, removed,
      Seq("doc_id"), ixs)
    assert(r.indexChanges.values.forall(_ === 0L),
      "re-run index deletes must be idempotent no-ops")
    assert(corpusServes(corpus) === 0L && vectorServes(vidx) === 0L &&
      sigServes(sidx) === 0L, "converged: removed everywhere")
  }

  test("partial-index crash state (one index purged, one not) " +
      "converges on the full re-run") {
    val root = tmpDir("govern2")
    val (corpus, vidx, sidx) = build(root)
    intercept[Crash] {
      Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
        Seq(Govern.VectorIndexRef(vidx)),
        beforeCorpusPublish = () => throw new Crash)
    }
    assert(vectorServes(vidx) === 0L && sigServes(sidx) > 0 &&
      corpusServes(corpus) > 0, "mid-cascade state")
    Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
      Seq(Govern.VectorIndexRef(vidx), Govern.SignatureIndexRef(sidx)))
    assert(corpusServes(corpus) === 0L && vectorServes(vidx) === 0L &&
      sigServes(sidx) === 0L)
  }

  test("viaBranch: the corpus half stages on the branch and publishes; " +
      "a crashed attempt's duplicate staged takedown is harmless") {
    val root = tmpDir("govern3")
    val (corpus, vidx, sidx) = build(root)
    Layout.snapshotBranch(spark, corpus, "gdpr")
    val ixs = Seq(Govern.VectorIndexRef(vidx), Govern.SignatureIndexRef(sidx))
    // a previous attempt crashed AFTER staging its takedown but before
    // the publish — the staged line is pending on the branch
    Layout.snapshotBranchDeleteKeys(spark, corpus, "gdpr", removed,
      Seq("doc_id"))
    assert(corpusServes(corpus) > 0, "staged ≠ published")
    // recovery: the same cascade — indexes purge, the corpus half
    // stages a SECOND takedown of the same keys (a harmless re-mask)
    // and ONE fast-forward publishes both
    val r = Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
      ixs, viaBranch = Some("gdpr"))
    assert(r.corpusVersion > 0)
    assert(corpusServes(corpus) === 0L && vectorServes(vidx) === 0L &&
      sigServes(sidx) === 0L)
    // survivors intact end to end
    assert(Layout.snapshotRead(spark, corpus).count() ===
      docs.filter(col("doc_id") % 10 =!= 3).count())
  }

  test("viaBranch under LIVE main traffic: the publish self-heals by " +
      "rebase — the re-keyed takedown lands, no operator intervention") {
    val root = tmpDir("govern4")
    val (corpus, vidx, sidx) = build(root)
    Layout.snapshotBranch(spark, corpus, "gdpr")
    // main advances AFTER the branch was cut: a plain fast-forward
    // would refuse diverged — exactly the window where a crashed-
    // then-recovered cascade must not strand the over-deletion state
    Layout.snapshotAppend(
      Seq((100001L, "late arrival")).toDF("doc_id", "text"), corpus)
    val r = Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
      Seq(Govern.VectorIndexRef(vidx), Govern.SignatureIndexRef(sidx)),
      viaBranch = Some("gdpr"))
    assert(r.corpusVersion > 0)
    assert(corpusServes(corpus) === 0L && vectorServes(vidx) === 0L &&
      sigServes(sidx) === 0L, "converged across the rebase")
    val state = Layout.snapshotRead(spark, corpus)
    assert(state.filter(col("doc_id") === 100001L).count() === 1L,
      "main's interleaved row survives the rebased publish")
    assert(state.count() ===
      docs.filter(col("doc_id") % 10 =!= 3).count() + 1L)
  }

  test("re-run after FULL success converges (ADVICE r15: crash after " +
      "the publish, before the caller recorded it) — and an empty id " +
      "set is a converged no-op, never a 'nothing to publish' throw") {
    val root = tmpDir("govern5")
    val (corpus, vidx, sidx) = build(root)
    Layout.snapshotBranch(spark, corpus, "gdpr")
    val ixs = Seq(Govern.VectorIndexRef(vidx),
      Govern.SignatureIndexRef(sidx))
    val r1 = Govern.takedownCascade(spark, corpus, removed,
      Seq("doc_id"), ixs, viaBranch = Some("gdpr"))
    // the caller crashed before recording r1 — the documented recovery
    // is "run the same cascade again": it must CONVERGE (return the
    // published state), never surface an exception
    val r2 = Govern.takedownCascade(spark, corpus, removed,
      Seq("doc_id"), ixs, viaBranch = Some("gdpr"))
    assert(r2.corpusVersion >= r1.corpusVersion)
    assert(corpusServes(corpus) === 0L && vectorServes(vidx) === 0L &&
      sigServes(sidx) === 0L, "goal state holds after the re-run")
    assert(Layout.snapshotRead(spark, corpus).count() ===
      docs.filter(col("doc_id") % 10 =!= 3).count(),
      "survivors intact across the idempotent re-run")
    // an EMPTY id set stages nothing: the publish's refusal converts
    // to converged success (after verifying the — vacuous — absence)
    val r3 = Govern.takedownCascade(spark, corpus, removed.limit(0),
      Seq("doc_id"), ixs, viaBranch = Some("gdpr"))
    assert(r3.corpusVersion >= r2.corpusVersion)
  }

  test("refusals: composite keys have no single doc identity — and the " +
      "message says WHY and names the surrogate-key remedy") {
    val e = intercept[IllegalArgumentException] {
      Govern.takedownCascade(spark, "/nope", removed,
        Seq("doc_id", "text"), Nil)
    }
    assert(e.getMessage.contains("ONE document id"))
    assert(e.getMessage.contains("single") &&
      e.getMessage.contains("surrogate"),
      s"the refusal must explain the index-side constraint and the " +
        s"remedy, got: ${e.getMessage}")
  }

  test("idempotent re-run is READ-ONLY: the presence probe is stats-" +
      "pruned to the id bounds, no overlay commit, no new version") {
    val root = tmpDir("govern_prune")
    val corpus = s"$root/corpus"
    // ten single-file commits over disjoint doc_id ranges, stats kept
    (0 until 10).foreach { i =>
      Layout.snapshotAppend(
        ((i * 100 + 1) to (i * 100 + 100)).map(k => (k.toLong, s"d$k"))
          .toDF("doc_id", "text").repartition(1),
        corpus, statsCols = Seq("doc_id"))
    }
    Layout.snapshotBranch(spark, corpus, "gdpr")
    val ids = (250L to 260L).toDF("doc_id")
    val r1 = Govern.takedownCascade(spark, corpus, ids, Seq("doc_id"),
      Nil, viaBranch = Some("gdpr"))
    val v1 = Layout.snapshotLatestVersion(spark, corpus).get
    // the re-run: presence probe (pruned, finds nothing) → publish
    // refuses "nothing to publish" → absence guard (pruned) → converged
    val before = Layout.readWhereKeptFiles.get()
    val r2 = Govern.takedownCascade(spark, corpus, ids, Seq("doc_id"),
      Nil, viaBranch = Some("gdpr"))
    val kept = Layout.readWhereKeptFiles.get() - before
    assert(r2.corpusVersion === r1.corpusVersion &&
      Layout.snapshotLatestVersion(spark, corpus).get === v1,
      "an idempotent re-run must not commit a pointless overlay")
    // two pruned reads (probe + guard), each over files intersecting
    // doc_id in [250, 260]: ≤ 2 of 10-11 files each — never a pass
    assert(kept >= 1 && kept <= 4,
      s"the probe/guard must scan only files intersecting the id " +
        s"bounds (expected ≤ 4 of the ~20 file-reads a full pass " +
        s"costs), scanned $kept")
    // and the takedown itself held
    assert(Layout.snapshotRead(spark, corpus)
      .filter(col("doc_id").between(250, 260)).count() === 0L)
  }

  test("per-corpus id columns (takedownCascadeAllKeyed): a corpus " +
      "keyed doc_id and a derivative keyed id cascade in one call; " +
      "wrong per-corpus column refuses BEFORE any purge") {
    val root = tmpDir("govern_keyed")
    val (corpus, vidx, sidx) = build(root)
    val packed = s"$root/packed"
    Layout.snapshotAppend(
      docs.select(col("doc_id").as("id"), col("text")), packed,
      statsCols = Seq("id"))
    val ixs = Seq(Govern.VectorIndexRef(vidx),
      Govern.SignatureIndexRef(sidx))
    // a wrong id column on ANY corpus refuses before the first purge
    val e = intercept[IllegalArgumentException] {
      Govern.takedownCascadeAllKeyed(spark,
        Seq(corpus -> "doc_id", packed -> "doc_id"), removed, "doc_id",
        ixs)
    }
    assert(e.getMessage.contains("no id column") &&
      e.getMessage.contains("BEFORE any index purge"))
    assert(vectorServes(vidx) > 0, "refusal must precede the purge")
    val r = Govern.takedownCascadeAllKeyed(spark,
      Seq(corpus -> "doc_id", packed -> "id"), removed, "doc_id", ixs)
    assert(r.corpusVersions.keySet === Set(corpus, packed))
    assert(corpusServes(corpus) === 0L && vectorServes(vidx) === 0L &&
      sigServes(sidx) === 0L)
    assert(Layout.snapshotRead(spark, packed)
      .join(removed.select(col("doc_id").as("id")), Seq("id"),
        "left_semi").count() === 0L,
      "the heterogeneous-name derivative must be purged too")
    assert(Layout.snapshotRead(spark, packed).count() ===
      docs.filter(col("doc_id") % 10 =!= 3).count())
  }

  test("viaBranch purges a doc that exists ONLY in main commits newer " +
      "than the branch base (the probe must consult main, not just " +
      "the stale tip)") {
    val root = tmpDir("govern_staletip")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    Layout.snapshotBranch(spark, corpus, "gdpr")
    // the doc to remove lands on main AFTER the branch was based —
    // invisible at the branch tip until a rebase
    Layout.snapshotAppend(
      Seq((900001L, "late ingest, then takedown")).toDF("doc_id", "text"),
      corpus)
    val r = Govern.takedownCascade(spark, corpus,
      Seq(900001L).toDF("doc_id"), Seq("doc_id"), Nil,
      viaBranch = Some("gdpr"))
    assert(r.corpusVersion > 0)
    assert(Layout.snapshotRead(spark, corpus)
      .filter(col("doc_id") === 900001L).count() === 0L,
      "the staged takedown must ride the rebase over the doc's commit")
  }

  test("viaBranch id-column validation judges the BRANCH TIP schema: " +
      "a branch-staged rename of the id column refuses BEFORE any purge") {
    val root = tmpDir("govern_renval")
    val (corpus, vidx, sidx) = build(root)
    Layout.snapshotBranch(spark, corpus, "migrate")
    Layout.snapshotBranchRename(spark, corpus, "migrate",
      Map("doc_id" -> "id"))
    val ixs = Seq(Govern.VectorIndexRef(vidx),
      Govern.SignatureIndexRef(sidx))
    // main still says doc_id, the branch tip says id: naming doc_id
    // must refuse pre-purge (the staged delete would fail post-purge)
    val e = intercept[IllegalArgumentException] {
      Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
        ixs, viaBranch = Some("migrate"))
    }
    assert(e.getMessage.contains("no id column 'doc_id'") &&
      e.getMessage.contains("on branch 'migrate'") &&
      e.getMessage.contains("BEFORE any index purge"), e.getMessage)
    assert(vectorServes(vidx) > 0 && sigServes(sidx) > 0,
      "refusal must precede the first irreversible purge")
  }

  test("a TORN open record (no trailing #open) is skipped, never " +
      "fails the evidence query — and proves nothing was purged") {
    val root = tmpDir("govern_torn")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    // one COMPLETE cascade, then a hand-torn open record simulating a
    // crash inside the create-then-write window on a non-atomic store
    Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"), Nil)
    val torn = new java.io.File(s"$corpus/gov/td-torncrash.open")
    val w = new java.io.FileWriter(torn)
    w.write("takedown=td-torncrash\nop=takedownCascade\n") // no #open
    w.close()
    val l = Govern.takedownLedger(spark, corpus)
    assert(l.select("takedown_id").distinct().count() === 1L,
      "the torn record must be skipped, not parsed or thrown on")
    assert(l.filter(col("takedown_id") === "td-torncrash").count() === 0L)
    assert(l.filter(col("completed")).count() === l.count())
  }

  test("cascade under a PENDING branch-staged rename of the id column " +
      "succeeds with the tip's name, publishes rename + takedown " +
      "atomically, and the re-run converges read-only") {
    val root = tmpDir("govern_pendren")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    Layout.snapshotBranch(spark, corpus, "migrate")
    Layout.snapshotBranchRename(spark, corpus, "migrate",
      Map("doc_id" -> "id"))
    // the caller names the id column as the BRANCH tip knows it; the
    // main-side probe resolves it back to main's 'doc_id'
    val ids = removed.withColumnRenamed("doc_id", "id")
    val r1 = Govern.takedownCascade(spark, corpus, ids, Seq("id"), Nil,
      viaBranch = Some("migrate"))
    assert(r1.corpusVersion > 0)
    val state = Layout.snapshotRead(spark, corpus)
    assert(state.columns.head === "id",
      "the publish ships the staged rename with the takedown")
    assert(state.join(ids, Seq("id"), "left_semi").count() === 0L)
    // re-run: probes resolve under the published name, nothing commits
    val v1 = Layout.snapshotLatestVersion(spark, corpus).get
    val r2 = Govern.takedownCascade(spark, corpus, ids, Seq("id"), Nil,
      viaBranch = Some("migrate"))
    assert(r2.corpusVersion === r1.corpusVersion &&
      Layout.snapshotLatestVersion(spark, corpus).get === v1)
  }

  test("re-run after success is read-only EVEN WHEN MAIN ADVANCED " +
      "(no rebase, no publish, no branch commit)") {
    val root = tmpDir("govern_divro")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    Layout.snapshotBranch(spark, corpus, "gdpr")
    Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"), Nil,
      viaBranch = Some("gdpr"))
    // main advances past the publish — a plain fast-forward would now
    // refuse diverged, but a converged re-run must not rebase just to
    // discover there is nothing to do
    Layout.snapshotAppend(
      Seq((800001L, "unrelated")).toDF("doc_id", "text"), corpus)
    val mainV = Layout.snapshotLatestVersion(spark, corpus).get
    val tipV = Layout.snapshotBranchesDetail(spark, corpus)
      .find(_._1 == "gdpr").get._3
    val r = Govern.takedownCascade(spark, corpus, removed,
      Seq("doc_id"), Nil, viaBranch = Some("gdpr"))
    assert(r.corpusVersion === mainV,
      "converged at main's current version")
    assert(Layout.snapshotLatestVersion(spark, corpus).get === mainV &&
      Layout.snapshotBranchesDetail(spark, corpus)
        .find(_._1 == "gdpr").get._3 === tipV,
      "a diverged idempotent re-run must commit NOTHING on either ref")
  }

  test("persisted ledger: every attempt leaves a create-once record; " +
      "a crashed attempt shows incomplete FOREVER, the recovery " +
      "attempt completes, digests agree — and the TVF reads it") {
    val root = tmpDir("govern_ledger")
    val (corpus, chunks, vidx, sidx) = buildMulti(root)
    val ixs = Seq(Govern.VectorIndexRef(vidx),
      Govern.SignatureIndexRef(sidx))
    intercept[Crash] {
      Govern.takedownCascadeAll(spark, Seq(corpus, chunks), removed,
        Seq("doc_id"), ixs,
        beforeCorpusPublish = i => if (i == 1) throw new Crash)
    }
    val l1 = Govern.takedownLedger(spark, corpus)
    assert(l1.select("takedown_id").distinct().count() === 1L)
    assert(l1.filter(col("completed")).count() === 0L,
      "the completion marker lands LAST — a crash must never " +
        "fabricate completed evidence")
    assert(l1.count() === 4L, "2 indexes + 2 corpora planned rows")
    assert(l1.filter(col("result").isNotNull).count() === 0L)
    // recovery = the same call: a FRESH attempt pair, completed
    Govern.takedownCascadeAll(spark, Seq(corpus, chunks), removed,
      Seq("doc_id"), ixs)
    val l2 = Govern.takedownLedger(spark, corpus)
    assert(l2.select("takedown_id").distinct().count() === 2L)
    assert(l2.filter(col("completed"))
      .select("takedown_id").distinct().count() === 1L,
      "exactly the recovery attempt completes; the crashed one stays " +
        "incomplete")
    assert(l2.select("ids_digest").distinct().count() === 1L,
      "both attempts pinned the same id set — same digest")
    assert(l2.select("ids_count").distinct().as[Long].head() ===
      removed.count())
    val done = l2.filter(col("completed"))
    assert(done.filter(col("result").isNull).count() === 0L,
      "a completed attempt records every artifact's outcome")
    assert(done.filter(col("kind") === "corpus").count() === 2L &&
      done.filter(col("kind") === "vector-index").count() === 1L &&
      done.filter(col("kind") === "signature-index").count() === 1L)
    // the SQL door
    graft.plans.SnapshotTvf.ensureSqlDoor(spark)
    val viaSql = spark.sql(
      s"SELECT count(*) FROM snapshot_takedowns('$corpus') " +
        "WHERE completed").as[Long].head()
    assert(viaSql === 4L)
    // the ledger answers from EVERY participating corpus, not just
    // the head one (an auditor starts wherever they start)
    assert(Govern.takedownLedger(spark, chunks).count() === l2.count())
    assert(Govern.takedownLedger(spark, chunks)
      .filter(col("completed")).select("takedown_id").distinct()
      .count() === 1L)
  }

  /** text corpus + a CHUNKED derivative corpus sharing the doc_id
    * space (two chunks per doc), plus both indexes. */
  private def buildMulti(root: String)
      : (String, String, String, String) = {
    val (corpus, vidx, sidx) = build(root)
    val chunks = s"$root/chunks"
    val halves = docs.select(col("doc_id"),
      expr("substring(text, 1, length(text) DIV 2)").as("chunk"),
      lit(0).as("chunk_ix"))
      .unionByName(docs.select(col("doc_id"),
        expr("substring(text, length(text) DIV 2 + 1)").as("chunk"),
        lit(1).as("chunk_ix")))
    Layout.snapshotAppend(halves.select(col("doc_id"), col("chunk_ix"),
      col("chunk")), chunks, statsCols = Seq("doc_id"))
    (corpus, chunks, vidx, sidx)
  }

  private def chunksServe(chunks: String): Long =
    Layout.snapshotRead(spark, chunks)
      .join(removed, Seq("doc_id"), "left_semi").count()

  test("MULTI-CORPUS cascade (round 16): one pin, each index purged " +
      "once, corpora published in declared order — a crash BETWEEN " +
      "corpus publishes leaves a prefix, and the re-run converges") {
    val root = tmpDir("govern6")
    val (corpus, chunks, vidx, sidx) = buildMulti(root)
    val ixs = Seq(Govern.VectorIndexRef(vidx),
      Govern.SignatureIndexRef(sidx))
    assert(chunksServe(chunks) > 0 && corpusServes(corpus) > 0)
    // crash between corpus 0's publish and corpus 1's
    intercept[Crash] {
      Govern.takedownCascadeAll(spark, Seq(corpus, chunks), removed,
        Seq("doc_id"), ixs,
        beforeCorpusPublish = i => if (i == 1) throw new Crash)
    }
    // prefix state: indexes purged, corpus 0 purged, corpus 1 (the
    // derivative) still resident — the doc is nowhere SERVED as a
    // retrieval/dedup hit, the tolerated over-deletion direction
    assert(vectorServes(vidx) === 0L && sigServes(sidx) === 0L,
      "indexes lead: no removed doc reachable after the crash")
    assert(corpusServes(corpus) === 0L,
      "the declared-order prefix must have published")
    assert(chunksServe(chunks) > 0,
      "the crash point is between the two corpus publishes")
    // recovery = the same call again: index purges and corpus 0's
    // takedown are idempotent no-ops, corpus 1's lands
    val r = Govern.takedownCascadeAll(spark, Seq(corpus, chunks),
      removed, Seq("doc_id"), ixs)
    assert(r.indexChanges.values.forall(_ === 0L),
      "re-run index deletes must be idempotent no-ops")
    assert(r.corpusVersions.keySet === Set(corpus, chunks))
    assert(corpusServes(corpus) === 0L && chunksServe(chunks) === 0L &&
      vectorServes(vidx) === 0L && sigServes(sidx) === 0L,
      "converged: removed everywhere")
    assert(Layout.snapshotRead(spark, chunks).count() ===
      docs.filter(col("doc_id") % 10 =!= 3).count() * 2,
      "chunk survivors intact (two chunks per surviving doc)")
  }

  test("multi-corpus viaBranch: every corpus must hold the branch " +
      "BEFORE any index purge; with branches the publishes stage+" +
      "fast-forward per corpus in order") {
    val root = tmpDir("govern7")
    val (corpus, chunks, vidx, sidx) = buildMulti(root)
    Layout.snapshotBranch(spark, corpus, "gdpr")
    // chunks has NO branch: the call must refuse before touching the
    // indexes (the validation-leads contract)
    val e = intercept[IllegalArgumentException] {
      Govern.takedownCascadeAll(spark, Seq(corpus, chunks), removed,
        Seq("doc_id"),
        Seq(Govern.VectorIndexRef(vidx), Govern.SignatureIndexRef(sidx)),
        viaBranch = Some("gdpr"))
    }
    assert(e.getMessage.contains("no branch 'gdpr'") &&
      e.getMessage.contains("BEFORE any index purge"))
    assert(vectorServes(vidx) > 0 && sigServes(sidx) > 0,
      "refusal must precede the first irreversible purge")
    Layout.snapshotBranch(spark, chunks, "gdpr")
    val r = Govern.takedownCascadeAll(spark, Seq(corpus, chunks),
      removed, Seq("doc_id"),
      Seq(Govern.VectorIndexRef(vidx), Govern.SignatureIndexRef(sidx)),
      viaBranch = Some("gdpr"))
    assert(r.corpusVersions.values.forall(_ > 0))
    assert(corpusServes(corpus) === 0L && chunksServe(chunks) === 0L &&
      vectorServes(vidx) === 0L && sigServes(sidx) === 0L)
  }

  test("ledger records carry their OWN instants (round 18): opened_at " +
      "on every attempt, completed_at only once complete, both " +
      "ISO-8601 and ordered") {
    val root = tmpDir("govern_at")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    intercept[Crash] {
      Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
        Nil, beforeCorpusPublish = () => throw new Crash)
    }
    Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"), Nil)
    val l = Govern.takedownLedger(spark, corpus)
    assert(l.filter(col("opened_at").isNull).count() === 0L,
      "every attempt's open record embeds its instant")
    assert(l.filter(!col("completed") && col("completed_at").isNotNull)
      .count() === 0L,
      "a crashed attempt has no completion instant — forever")
    val doneRows = l.filter(col("completed"))
      .select("opened_at", "completed_at").distinct()
      .as[(String, String)].collect()
    assert(doneRows.nonEmpty)
    doneRows.foreach { case (o, c) =>
      val oi = java.time.Instant.parse(o)
      val ci = java.time.Instant.parse(c)
      assert(!ci.isBefore(oi), "completion cannot precede the open")
    }
  }

  test("ledger evidence is retention-EXEMPT: snapshotExpire and " +
      "snapshotMaintain never touch gov/") {
    val root = tmpDir("govern_ret")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"), Nil)
    Layout.snapshotAppend(
      Seq((900001L, "later")).toDF("doc_id", "text"), corpus)
    val before = Govern.takedownLedger(spark, corpus).collect().toSet
    assert(before.nonEmpty)
    // aggressive maintenance: keep 1 version, zero orphan grace
    Layout.snapshotExpire(spark, corpus, keep = 1, orphanGraceMs = 0L)
    Layout.snapshotMaintain(spark, corpus, orphanGraceMs = 0L)
    assert(Govern.takedownLedger(spark, corpus).collect().toSet ===
      before,
      "the evidence must outlive the data retention cycle untouched")
  }

  test("ledgerArchive MOVES old completed pairs to gov/archive — " +
      "never deletes, never archives incomplete attempts, and the " +
      "ledger query serves both locations") {
    val root = tmpDir("govern_arch")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text")),
      corpus, statsCols = Seq("doc_id"))
    intercept[Crash] {
      Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"),
        Nil, beforeCorpusPublish = () => throw new Crash)
    }
    Govern.takedownCascade(spark, corpus, removed, Seq("doc_id"), Nil)
    val before = Govern.takedownLedger(spark, corpus).collect().toSet
    // a cutoff in the future: the COMPLETED attempt archives, the
    // crashed (incomplete) one must stay hot — it is the actionable
    // crash evidence
    val moved = Govern.ledgerArchive(spark, corpus,
      java.time.Instant.now().plusSeconds(3600))
    assert(moved === 1L)
    val fs = new org.apache.hadoop.fs.Path(corpus)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hot = fs.listStatus(new org.apache.hadoop.fs.Path(corpus, "gov"))
      .filter(_.isFile).map(_.getPath.getName).toSet
    assert(hot.exists(_.endsWith(".open")) &&
      !hot.exists(_.endsWith(".done")),
      "only the incomplete attempt's open record stays hot")
    val arch = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$corpus/gov/archive"))
      .filter(_.isFile).map(_.getPath.getName).toSet
    assert(arch.count(_.endsWith(".done")) === 1 &&
      arch.count(_.endsWith(".open")) === 1,
      "the completed pair moved whole")
    assert(Govern.takedownLedger(spark, corpus).collect().toSet ===
      before,
      "archival must never hide evidence from the ledger query")
    // idempotent: nothing left to move
    assert(Govern.ledgerArchive(spark, corpus,
      java.time.Instant.now().plusSeconds(3600)) === 0L)
    // a past cutoff moves nothing
    assert(Govern.ledgerArchive(spark, corpus,
      java.time.Instant.parse("2000-01-01T00:00:00Z")) === 0L)
  }

  test("ids digest identifies the judged SET: duplicated input ids " +
      "digest identically (the pinned frame is distinct by " +
      "construction — ADVICE r18 #2)") {
    val root = tmpDir("govern_dig")
    val c1 = s"$root/c1"
    val c2 = s"$root/c2"
    Seq(c1, c2).foreach(c => Layout.snapshotAppend(
      docs.select(col("doc_id"), col("text")), c,
      statsCols = Seq("doc_id")))
    Govern.takedownCascade(spark, c1, removed, Seq("doc_id"), Nil)
    // same id set, but with every id duplicated — XOR cancellation
    // would zero a non-distinct digest; the distinct() pin keeps it
    // identical to the clean frame's
    Govern.takedownCascade(spark, c2,
      removed.unionAll(removed), Seq("doc_id"), Nil)
    val d1 = Govern.takedownLedger(spark, c1)
      .select("ids_digest", "ids_count").distinct()
      .as[(String, Long)].head()
    val d2 = Govern.takedownLedger(spark, c2)
      .select("ids_digest", "ids_count").distinct()
      .as[(String, Long)].head()
    assert(d1 === d2, "digest and count identify the SET, not the bag")
  }

  test("a main column SHADOWING the staged rename's target name " +
      "refuses loudly instead of fabricating a takedown (ADVICE r18 " +
      "#1): the probe degrades to staging and the rebase names the " +
      "collision") {
    val root = tmpDir("govern_shadow")
    val corpus = s"$root/corpus"
    Layout.snapshotAppend(docs.select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 10 =!= 3), corpus,
      statsCols = Seq("doc_id"))
    Layout.snapshotBranch(spark, corpus, "migrate")
    Layout.snapshotBranchRename(spark, corpus, "migrate",
      Map("doc_id" -> "id"))
    // main independently ADDS an unrelated column named 'id' AND
    // ingests the takedown targets — both AFTER the branch was based:
    // the old behavior judged main's unrelated 'id' (an absence
    // probe over the wrong column), skipped staging, and reported a
    // completed takedown while the corpus still served the docs
    Layout.snapshotEvolve(docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), col("text"),
        (col("doc_id") * 2).as("id")), corpus)
    val ids = removed.withColumnRenamed("doc_id", "id")
    val e = intercept[IllegalArgumentException] {
      Govern.takedownCascade(spark, corpus, ids, Seq("id"), Nil,
        viaBranch = Some("migrate"))
    }
    assert(e.getMessage.contains("name collision") ||
      e.getMessage.contains("carries a column of that name"),
      s"the rebase must surface the genuine collision: ${e.getMessage}")
    assert(Layout.snapshotRead(spark, corpus)
      .join(removed, Seq("doc_id"), "left_semi").count() > 0L,
      "the docs are still served — and the ledger must NOT say done")
    val l = Govern.takedownLedger(spark, corpus)
    assert(l.filter(col("completed")).count() === 0L,
      "no fabricated completion evidence")
  }
}
