package graft.queries

import graft.{QuerySpec, Tables => T}
import graft.ops.{Dedup, Multimodal, Sampling, Similarity, Text}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`:
  * text analysis, dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding cosine), similarity search, multimodal plumbing.
  *
  * Every hash-bearing query uses [[graft.functions.PortableHash]] (60-bit
  * MD5), so even the sketch-based operators get full DuckDB value oracles —
  * the oracle SQL below is generated to mirror the Spark expressions
  * bit-for-bit.
  */
object TrainingData {

  /** DuckDB twin of PortableHash.md5Long. */
  private def h60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"
  private def h60s(expr: String, seed: Int): String =
    h60(s"'$seed|' || $expr")

  private val D = "CAST(%s AS DOUBLE)"
  private def dbl(e: String) = D.format(e)

  // shared oracle CTE: tokens + distinct 3-gram shingle hashes per doc
  private val tokCte =
    """toks AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') t FROM documents)"""
  private def shingleCte(n: Int) = {
    val joined = (0 until n).map(i => s"t[i+$i]").mkString(" || ' ' || ")
    s"""sh AS (SELECT doc_id, CASE WHEN len(t) >= $n
       THEN list_distinct(list_transform(generate_series(1, len(t) - ${n - 1}), i -> ${h60(joined)}))
       ELSE [] END hs FROM toks)"""
  }

  // Shared oracle CTE fragments — one source of truth for the quality
  // formula (q46/q48/q54), the Jaccard-0.5 pair graph (q46/q51/q54) and
  // the connected-components replay (q51/q54), so the oracles cannot
  // silently drift apart when a formula is tuned.
  private val baseCte =
    s"""base AS (SELECT doc_id, text,
          CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(t, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS BIGINT) AS stop_hits,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct
          FROM toks)"""

  /** Quality-score CTE (the Text.qualityScore twin); `extraCols` lets a
    * query carry extra base columns through (e.g. " n_tokens,"). */
  private def qualCte(extraCols: String = ""): String =
    s"""qual AS (SELECT doc_id,$extraCols
          least(greatest(
            least(${dbl("n_tokens")} / ${dbl("50.0")}, ${dbl("1.0")}) * ${dbl("0.4")}
            + (CASE WHEN n_tokens > 0 THEN ${dbl("stop_hits")} / ${dbl("n_tokens")} ELSE ${dbl("0")} END) * ${dbl("10.0")} * ${dbl("0.2")}
            + (${dbl("1.0")} - (CASE WHEN length(text) > 0 THEN ${dbl("n_punct")} / ${dbl("length(text)")} ELSE ${dbl("0")} END)) * ${dbl("0.2")}
            + least((CASE WHEN n_tokens > 0 THEN ${dbl("length(text)")} / ${dbl("n_tokens")} ELSE ${dbl("0")} END) / ${dbl("8.0")}, ${dbl("1.0")}) * ${dbl("0.2")},
            ${dbl("0.0")}), ${dbl("1.0")}) AS quality
          FROM base)"""

  /** Jaccard ≥ 0.5 near-dup pairs over the 3-gram shingles (needs sh). */
  private val pairGraphCte =
    s"""e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                   FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b FROM common
                  JOIN sizes sa ON sa.doc_id = id_a
                  JOIN sizes sb ON sb.doc_id = id_b
                  WHERE ${dbl("c")} / ${dbl("(sa.n + sb.n - c)")} >= ${dbl("0.5")})"""

  /** Connected components over `pairs` + per-cluster sizes (RECURSIVE). */
  private val ccCte =
    """edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(id, comp) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT ed.src, r.comp FROM edges ed JOIN reach r ON r.id = ed.dst),
        cc AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
        assigned AS (SELECT d.doc_id, coalesce(cc.comp, d.doc_id) AS cluster_id
                     FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
        cs AS (SELECT cluster_id, COUNT(*) AS cluster_size
               FROM assigned GROUP BY cluster_id)"""

  private val NumHashes = 24
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** Shared by q66 (direct two-frame form) and q111 (the same dedup fed
    * through the snapshot-table pipeline): incoming (`doc_id >= 250`)
    * vs corpus (`< 250`) MinHash near-dups, full bit-for-bit signature
    * oracle. One source of truth so the two entries cannot drift. */
  private lazy val incrementalDedupOracleSql =
    s"""WITH $tokCte, ${shingleCte(3)},
        sig AS (SELECT doc_id, $minhashSigSql AS sig FROM sh WHERE len(hs) > 0),
        banded AS (SELECT doc_id, sig, unnest($minhashBandSql) AS bk FROM sig),
        cand AS (SELECT DISTINCT i.doc_id AS incoming_id, c.doc_id AS corpus_id
                 FROM banded i JOIN banded c ON i.bk = c.bk
                 WHERE i.doc_id >= 250 AND c.doc_id < 250)
        SELECT incoming_id, corpus_id,
          ${dbl(s"len(list_filter(list_zip(si.sig, sc.sig), x -> x[1] = x[2]))")} / ${dbl(s"$NumHashes")} AS est_jaccard
        FROM cand JOIN sig si ON si.doc_id = incoming_id
                  JOIN sig sc ON sc.doc_id = corpus_id
        WHERE ${dbl(s"len(list_filter(list_zip(si.sig, sc.sig), x -> x[1] = x[2]))")} / ${dbl(s"$NumHashes")} >= ${dbl("0.5")}
        ORDER BY incoming_id, corpus_id"""

  /** DuckDB twin of the MinHash signature (q27/q66 share it — one source
    * of truth for the per-seed rehash list). */
  private lazy val minhashSigSql: String = (0 until NumHashes).map { seed =>
    s"coalesce(list_min(list_transform(hs, h -> ${graft.functions.PortableHash.rehashDuckSql("h", seed)})), 9223372036854775807)"
  }.mkString("[", ", ", "]")

  /** DuckDB twin of [[graft.ops.Dedup.lshBandKeys]] over `sig`. */
  private lazy val minhashBandSql: String = (0 until Bands).map { b =>
    val lo = b * RowsPerBand + 1
    val hi = b * RowsPerBand + RowsPerBand
    h60(s"'$b:' || array_to_string(sig[$lo:$hi], ',')")
  }.mkString("[", ", ", "]")

  // shared oracle CTEs for the embedding operators: corpus as DOUBLE[],
  // portable hyperplane constants, per-vector norms. The planes are
  // MD5-derived ([[graft.ops.Similarity.planeVal]]), so DuckDB regenerates
  // the exact float32 plane values — and therefore the exact signatures —
  // from the seed strings alone.
  private val embCte =
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"
  private val nrmCte =
    "nrm AS (SELECT vec_id, sqrt(list_sum(list_transform(list_zip(v, v), x -> x[1] * x[2]))) AS n FROM e)"
  private def planesCte(planes: Int, dim: Int): String =
    s"""pl AS (SELECT p, list_transform(generate_series(0, ${dim - 1}), d ->
       CAST(('0x' || substr(md5('plane:' || p || ':' || d), 1, 15))::BIGINT
         / ${1L << 59}.0 - 1.0 AS REAL)) AS pv
     FROM (SELECT unnest(range($planes)) AS p))"""
  /** DuckDB twin of [[graft.ops.Similarity.lshSignature]] over `e`. */
  private val sigCte =
    s"""dots AS (SELECT e.vec_id, pl.p,
         list_sum(list_transform(list_zip(e.v, pl.pv), x -> x[1] * x[2])) AS dp
       FROM e CROSS JOIN pl),
     sig AS (SELECT vec_id, SUM(CASE WHEN dp >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS sg
       FROM dots GROUP BY vec_id)"""

  /** Fitted-centroid literals CTE: `{token}` is replaced at Verify dump
    * time ([[graft.OracleLiterals]]) with (cell, cf REAL[], c2 DOUBLE)
    * VALUES rows from the SAME memoized fit ([[Fits]]) the Spark query
    * consumed — what promotes the k-means queries to full hash oracles. */
  private def centCte(token: String): String =
    s"cent AS (SELECT * FROM (VALUES {$token}) AS t(cell, cf, c2))"

  /** DuckDB twin of the IVF cell score `-2·x·c + ‖c‖²` over every
    * (vector, cell) pair — float32 centroid dot, DOUBLE constant term,
    * exactly the Spark Column expression's mixed precision. */
  private val cscoreCte =
    """cscore AS (SELECT e.vec_id, cent.cell,
         -2.0 * list_sum(list_transform(list_zip(e.v, cent.cf), x -> x[1] * x[2])) + cent.c2 AS s
       FROM e CROSS JOIN cent)"""

  /** Codebook literals CTE for the PQ oracles:
    * (j, code, bf REAL[], b2d DOUBLE, b2f REAL) rows. */
  private def bookCte(token: String): String =
    s"book AS (SELECT * FROM (VALUES {$token}) AS t(j, code, bf, b2d, b2f))"

  /** DuckDB twin of [[graft.ops.Similarity.pqEncode]] + `pqLut` over `e`
    * (m=16 subspaces of 4 dims): per (vector, subspace) the nearest-code
    * argmin (enc) and every candidate dot (subscore — the query side's
    * LUT values before their float32 cast). */
  /** IVF-PQ retrieval oracle (cell routing → ADC shortlist → exact
    * rerank) — shared VERBATIM by q78b (in-process fitted artifacts) and
    * q103 (the persisted [[graft.ops.VectorIndex]]): both hashing to the
    * same DuckDB answer proves the on-disk index is a faithful
    * serialization of the in-process fit, not a parallel implementation
    * that happens to agree on recall. */
  private lazy val ivfPqOracleSql = ivfPqOracle()

  /** The same oracle with a corpus-side candidate filter — q121 excludes
    * TAKEN-DOWN ids from the index's candidate set (queries still come
    * from the full embeddings table, like the engine's). */
  private def ivfPqOracle(candFilter: String = "TRUE") = s"""WITH $embCte, $nrmCte, ${centCte("CENT16_2K")}, $cscoreCte,
        ${bookCte("BOOKS16_2K")}, $pqEncCte,
        ccell AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
          FROM cscore) WHERE rn = 1 AND ($candFilter)),
        probes AS (SELECT vec_id AS query_id, cell FROM (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
          FROM cscore WHERE vec_id < 20) WHERE rn <= 4),
        cand0 AS (SELECT p.query_id, c.vec_id AS nbr_id
          FROM probes p JOIN ccell c
            ON c.cell = p.cell AND c.vec_id <> p.query_id),
        adc AS (SELECT c0.query_id, c0.nbr_id,
            list_sum(list(CAST(q.lv AS DOUBLE) ORDER BY q.j)) AS a
          FROM cand0 c0
            JOIN qlut q ON q.query_id = c0.query_id
            JOIN enc en ON en.vec_id = c0.nbr_id
              AND en.j = q.j AND en.code = q.code
          GROUP BY c0.query_id, c0.nbr_id),
        cospq AS (SELECT a.query_id, a.nbr_id, a.a / (nq.n * n2.nn) AS cp
          FROM adc a JOIN nrm nq ON nq.vec_id = a.query_id
            JOIN nrm2 n2 ON n2.vec_id = a.nbr_id),
        cand AS (SELECT query_id, nbr_id FROM (SELECT query_id, nbr_id,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cp DESC, nbr_id) AS rn
          FROM cospq) WHERE rn <= 50),
        rescored AS (SELECT query_id, nbr_id,
            list_sum(list_transform(list_zip(eq.v, ec.v), x -> x[1] * x[2]))
              / (nq.n * nc.n) AS cos
          FROM cand
            JOIN e eq ON eq.vec_id = query_id JOIN e ec ON ec.vec_id = nbr_id
            JOIN nrm nq ON nq.vec_id = query_id JOIN nrm nc ON nc.vec_id = nbr_id),
        ranked AS (SELECT query_id, nbr_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rank
          FROM rescored)
        SELECT query_id, nbr_id, rank, cos FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""

  private val pqEncCte =
    """js AS (SELECT unnest(range(16)) AS j),
     sub AS (SELECT e.vec_id, js.j, e.v[js.j * 4 + 1 : js.j * 4 + 4] AS sv
       FROM e CROSS JOIN js),
     subscore AS (SELECT s.vec_id, s.j, b.code, b.b2f,
         -2.0 * list_sum(list_transform(list_zip(s.sv, b.bf), x -> x[1] * x[2])) + b.b2d AS sc,
         list_sum(list_transform(list_zip(s.sv, b.bf), x -> x[1] * x[2])) AS dp
       FROM sub s JOIN book b ON b.j = s.j),
     enc AS (SELECT vec_id, j, code, b2f FROM (SELECT vec_id, j, code, b2f,
         ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY sc, code) AS rn
       FROM subscore) WHERE rn = 1),
     nrm2 AS (SELECT vec_id, sqrt(list_sum(list(CAST(b2f AS DOUBLE) ORDER BY j))) AS nn
       FROM enc GROUP BY vec_id),
     qlut AS (SELECT vec_id AS query_id, j, code, CAST(dp AS REAL) AS lv
       FROM subscore WHERE vec_id < 20)"""

  val specs: Seq[QuerySpec] = Seq(

    // ---------------------------------------------------------------- q24
    // Text analysis: token counts (whitespace + BPE-ish), stopword hits,
    // content fingerprint, composite quality score. Narrow projection —
    // scan-speed at any scale.
    QuerySpec(
      "q24_text_stats",
      (s, d) =>
        T.documents(s, d).select(
          col("doc_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          Text.bpeIshCount(col("text")).as("n_bpe"),
          Text.stopwordHits(col("text"), Text.EnglishStopwords).as("stop_hits"),
          Text.fingerprint(col("text")).as("fp"),
          Text.qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id")),
      Some(s"""WITH $tokCte,
        base AS (SELECT doc_id, text, t,
          CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe,
          CAST(len(list_filter(t, x -> x IN ('the','a','an','and','or','of','to','in','is','it'))) AS BIGINT) AS stop_hits,
          ${h60("text")} AS fp,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_punct
          FROM toks),
        q AS (SELECT *,
          ${dbl("length(text)")} AS n_chars,
          CASE WHEN n_tokens > 0 THEN ${dbl("length(text)")} / ${dbl("n_tokens")} ELSE ${dbl("0")} END AS mean_word_len,
          CASE WHEN n_tokens > 0 THEN ${dbl("stop_hits")} / ${dbl("n_tokens")} ELSE ${dbl("0")} END AS stop_ratio,
          CASE WHEN length(text) > 0 THEN ${dbl("n_punct")} / ${dbl("length(text)")} ELSE ${dbl("0")} END AS punct_ratio
          FROM base)
        SELECT doc_id, n_tokens, n_bpe, stop_hits, fp,
          least(greatest(
            least(${dbl("n_tokens")} / ${dbl("50.0")}, ${dbl("1.0")}) * ${dbl("0.4")}
            + stop_ratio * ${dbl("10.0")} * ${dbl("0.2")}
            + (${dbl("1.0")} - punct_ratio) * ${dbl("0.2")}
            + least(mean_word_len / ${dbl("8.0")}, ${dbl("1.0")}) * ${dbl("0.2")},
            ${dbl("0.0")}), ${dbl("1.0")}) AS quality
        FROM q ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q25
    // Language ID by marker-word voting; ties break toward the marker-list
    // order (en > de > fr > es). The `lang` column in the synthetic data is
    // metadata, not recoverable from the (shared-vocabulary) text — the
    // oracle checks the computation, the ScalaTest spec checks
    // discrimination on crafted fixtures.
    QuerySpec(
      "q25_langid",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
          .orderBy(col("doc_id")),
      Some {
        val score = Text.LangMarkers.map { case (l, ms) =>
          s"CAST(len(list_filter(lt, x -> x IN (${ms.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS s_$l"
        }.mkString(", ")
        s"""WITH lo AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') lt FROM documents),
          sc AS (SELECT doc_id, $score FROM lo)
        SELECT doc_id,
          CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
               WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
               WHEN s_fr >= s_es THEN 'fr'
               ELSE 'es' END AS lang_pred
        FROM sc ORDER BY doc_id"""
      }),

    // ---------------------------------------------------------------- q26
    // Exact dedup: one shuffle on the 60-bit content hash.
    QuerySpec(
      "q26_exact_dedup",
      (s, d) =>
        Dedup.exact(T.documents(s, d), "doc_id", "text").orderBy(col("fp")),
      Some(s"""SELECT ${h60("text")} AS fp, MIN(doc_id) AS keep_id,
          COUNT(*) AS n_copies
        FROM documents GROUP BY fp ORDER BY fp"""),
      headline = true),

    // ---------------------------------------------------------------- q27
    // MinHash + LSH near-dup detection: 24 hashes, 8 bands × 3 rows,
    // agreement ≥ 0.5. The oracle replays the full signature/band pipeline
    // in SQL — every hash value matches bit-for-bit.
    QuerySpec(
      "q27_minhash_lsh",
      (s, d) =>
        Dedup.minhashNearDups(T.documents(s, d), "doc_id", "text",
            numHashes = NumHashes, shingleN = 3, bands = Bands, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some {
        s"""WITH $tokCte, ${shingleCte(3)},
          sig AS (SELECT doc_id, $minhashSigSql AS sig FROM sh WHERE len(hs) > 0),
          banded AS (SELECT doc_id, sig, unnest($minhashBandSql) AS bk FROM sig),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM banded a JOIN banded b ON a.bk = b.bk AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
          ${dbl(s"len(list_filter(list_zip(sa.sig, sb.sig), x -> x[1] = x[2]))")} / ${dbl(s"$NumHashes")} AS est_jaccard
        FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
        WHERE ${dbl(s"len(list_filter(list_zip(sa.sig, sb.sig), x -> x[1] = x[2]))")} / ${dbl(s"$NumHashes")} >= ${dbl("0.5")}
        ORDER BY id_a, id_b"""
      },
      headline = true),

    // ---------------------------------------------------------------- q28
    // SimHash sketch per document (60-bit). Narrow projection, no shuffle.
    QuerySpec(
      "q28_simhash",
      (s, d) =>
        Dedup.simhashSketches(T.documents(s, d), "doc_id", "text")
          .select(col("id").as("doc_id"), col("sk").as("sketch"))
          .orderBy(col("doc_id")),
      Some(s"""WITH $tokCte,
        th AS (SELECT doc_id, unnest(list_transform(t, x -> ${h60("x")})) AS h FROM toks),
        votes AS (SELECT doc_id, i,
            SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN (SELECT unnest(range(60)) AS i) bits
          GROUP BY doc_id, i),
        sk AS (SELECT doc_id,
            CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sketch
          FROM votes GROUP BY doc_id)
        SELECT d.doc_id, coalesce(sk.sketch, 1152921504606846975) AS sketch
        FROM documents d LEFT JOIN sk ON sk.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q29
    // SimHash near-dups: prefix-bucketed Hamming join.
    QuerySpec(
      "q29_simhash_neardups",
      (s, d) =>
        Dedup.simhashNearDups(T.documents(s, d), "doc_id", "text",
            prefixBits = 12, maxHamming = 8)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $tokCte,
        th AS (SELECT doc_id, unnest(list_transform(t, x -> ${h60("x")})) AS h FROM toks),
        votes AS (SELECT doc_id, i,
            SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN (SELECT unnest(range(60)) AS i) bits
          GROUP BY doc_id, i),
        sk0 AS (SELECT doc_id,
            CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sk
          FROM votes GROUP BY doc_id),
        sk AS (SELECT d.doc_id, coalesce(sk0.sk, 1152921504606846975) AS sk,
            coalesce(sk0.sk, 1152921504606846975) >> 48 AS bucket
          FROM documents d LEFT JOIN sk0 ON sk0.doc_id = d.doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sk, b.sk)) AS BIGINT) AS hamming
        FROM sk a JOIN sk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sk, b.sk)) <= 8
        ORDER BY id_a, id_b""")),

    // --------------------------------------------------------------- q29b
    // Full-recall SimHash near-dups: block-permutation bucketing
    // (pigeonhole over maxHamming+1 blocks guarantees every pair within
    // the Hamming budget collides in some block — the prefix heuristic of
    // q29 can miss pairs differing in high bits). Full value oracle: the
    // block split is replayed from the same (offset, len) table.
    QuerySpec(
      "q29b_simhash_neardups_full",
      (s, d) =>
        Dedup.simhashNearDupsFull(T.documents(s, d), "doc_id", "text",
            maxHamming = 8)
          .orderBy(col("id_a"), col("id_b")),
      Some {
        val blockRows = Dedup.blockBounds(60, 9).zipWithIndex
          .map { case ((off, len), b) => s"($b, $off, $len)" }.mkString(", ")
        s"""WITH $tokCte,
        th AS (SELECT doc_id, unnest(list_transform(t, x -> ${h60("x")})) AS h FROM toks),
        votes AS (SELECT doc_id, i,
            SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN (SELECT unnest(range(60)) AS i) bits
          GROUP BY doc_id, i),
        sk0 AS (SELECT doc_id,
            CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sk
          FROM votes GROUP BY doc_id),
        sk AS (SELECT d.doc_id, coalesce(sk0.sk, 1152921504606846975) AS sk
          FROM documents d LEFT JOIN sk0 ON sk0.doc_id = d.doc_id),
        blocks(bi, off, len) AS (SELECT * FROM (VALUES $blockRows)),
        blk AS (SELECT doc_id, sk, bi,
            (sk >> off) & ((1::BIGINT << len) - 1) AS bits
          FROM sk CROSS JOIN blocks),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM blk a JOIN blk b
                   ON a.bi = b.bi AND a.bits = b.bits AND a.doc_id < b.doc_id)
        SELECT c.id_a, c.id_b,
          CAST(bit_count(xor(sa.sk, sb.sk)) AS BIGINT) AS hamming
        FROM cand c JOIN sk sa ON sa.doc_id = c.id_a
                    JOIN sk sb ON sb.doc_id = c.id_b
        WHERE bit_count(xor(sa.sk, sb.sk)) <= 8
        ORDER BY c.id_a, c.id_b"""
      }),

    // ---------------------------------------------------------------- q30
    // Exact n-gram Jaccard pairs via shingle inverted-index self-join.
    QuerySpec(
      "q30_jaccard_pairs",
      (s, d) =>
        Dedup.ngramJaccardPairs(T.documents(s, d), "doc_id", "text",
            shingleN = 3, threshold = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $tokCte, ${shingleCte(3)},
        e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
                   FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
        SELECT id_a, id_b, common,
          ${dbl("common")} / ${dbl("(sa.n + sb.n - common)")} AS jaccard
        FROM common JOIN sizes sa ON sa.doc_id = id_a
                    JOIN sizes sb ON sb.doc_id = id_b
        WHERE ${dbl("common")} / ${dbl("(sa.n + sb.n - common)")} >= ${dbl("0.5")}
        ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- q31
    // Embedding near-dup pairs: exact cosine ≥ 0.45, double-precision
    // left-fold dot products on both engines (bit-identical).
    QuerySpec(
      "q31_embedding_neardups",
      (s, d) =>
        Dedup.embeddingNearDups(T.embeddings(s, d), "vec_id", "embedding", 0.45)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(list_zip(a.v, a.v), x -> x[1] * x[2])))
               * sqrt(list_sum(list_transform(list_zip(b.v, b.v), x -> x[1] * x[2])))) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos FROM p WHERE cos >= ${dbl("0.45")}
        ORDER BY id_a, id_b""")),

    // --------------------------------------------------------------- q31b
    // The scale-path embedding dedup — what a 100 TB user actually runs:
    // banded hyperplane LSH candidates (shuffle O(corpus × bands), never
    // all-pairs) + exact cosine verification. Full value oracle: the
    // portable MD5-derived planes let DuckDB replay signatures, band
    // buckets, and cosines bit-for-bit. Recall vs q31's exact pairs is
    // pinned separately in DedupSpec.
    QuerySpec(
      "q31b_embedding_neardups_lsh",
      (s, d) =>
        Dedup.embeddingNearDupsLsh(T.embeddings(s, d), "vec_id", "embedding",
            threshold = 0.45, rowsPerBand = 4, bands = 15)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $embCte, ${planesCte(60, 64)}, $sigCte, $nrmCte,
        banded AS (SELECT vec_id, b * 16 + ((sg >> (b * 4)) & 15) AS bucket
          FROM sig CROSS JOIN (SELECT unnest(range(15)) AS b)),
        cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM banded a JOIN banded b
                   ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        SELECT id_a, id_b,
          list_sum(list_transform(list_zip(ea.v, eb.v), x -> x[1] * x[2])) / (na.n * nb.n) AS cos
        FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b
          JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
        WHERE list_sum(list_transform(list_zip(ea.v, eb.v), x -> x[1] * x[2])) / (na.n * nb.n) >= ${dbl("0.45")}
        ORDER BY id_a, id_b""")),

    // ---------------------------------------------------------------- q32
    // Brute-force cosine top-k (the ANN baseline): 20 query vectors
    // broadcast against the corpus scan; rank window shuffles only
    // |queries| keys.
    QuerySpec(
      "q32_ann_bruteforce",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id, v FROM e WHERE vec_id < 20),
        scored AS (SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
            list_sum(list_transform(list_zip(q.v, c.v), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(list_zip(q.v, q.v), x -> x[1] * x[2])))
               * sqrt(list_sum(list_transform(list_zip(c.v, c.v), x -> x[1] * x[2])))) AS cos
          FROM e c CROSS JOIN q WHERE q.vec_id <> c.vec_id),
        ranked AS (SELECT query_id, nbr_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rank
          FROM scored)
        SELECT query_id, nbr_id, rank, cos FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank"""),
      headline = true),

    // ---------------------------------------------------------------- q33
    // LSH-bucketed approximate top-k (the scale path — no full cross
    // product). Full value oracle: the MD5-derived hyperplanes are
    // engine-portable, so DuckDB replays the 12-bit signatures, the 1-bit
    // multi-probe expansion, and the ranked cosines exactly. The ScalaTest
    // spec additionally pins recall against q32's exact results.
    QuerySpec(
      "q33_ann_lsh",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.lshTopK(e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5, planes = 12, dim = 64)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $embCte, ${planesCte(12, 64)}, $sigCte, $nrmCte,
        cq AS (SELECT vec_id AS query_id,
            unnest([sg] || list_transform(range(12), p -> xor(sg, (1::BIGINT << p)))) AS bucket
          FROM sig WHERE vec_id < 20),
        cand AS (SELECT DISTINCT cq.query_id, c.vec_id AS nbr_id
                 FROM cq JOIN sig c ON c.sg = cq.bucket AND c.vec_id <> cq.query_id),
        scored AS (SELECT query_id, nbr_id,
            list_sum(list_transform(list_zip(eq.v, ec.v), x -> x[1] * x[2])) / (nq.n * nc.n) AS cos
          FROM cand
            JOIN e eq ON eq.vec_id = query_id JOIN e ec ON ec.vec_id = nbr_id
            JOIN nrm nq ON nq.vec_id = query_id JOIN nrm nc ON nc.vec_id = nbr_id),
        ranked AS (SELECT query_id, nbr_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rank
          FROM scored)
        SELECT query_id, nbr_id, rank, cos FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // --------------------------------------------------------------- q33b
    // IVF-bucketed approximate top-k (the other scale path beside LSH):
    // k-means cells + nProbe probing. FULL value oracle since round 4:
    // the bounded-sample k-means fit is memoized ([[Fits]]) and its
    // centroids are baked into the DuckDB SQL as literals at Verify dump
    // time ({CENT16_100K} → graft.OracleLiterals), so the oracle replays
    // cell assignment, probing, and the ranked cosines bit-for-bit. The
    // ScalaTest spec additionally pins recall vs the exact q32 path.
    QuerySpec(
      "q33b_ann_ivf",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfTopKWith(e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5,
            Fits.ivfCentroids(s, d, 16, 100000), nProbe = 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $embCte, $nrmCte,
        ${centCte("CENT16_100K")}, $cscoreCte,
        ccell AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
          FROM cscore) WHERE rn = 1),
        probes AS (SELECT vec_id AS query_id, cell FROM (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
          FROM cscore WHERE vec_id < 20) WHERE rn <= 3),
        cand AS (SELECT p.query_id, c.vec_id AS nbr_id
          FROM probes p JOIN ccell c
            ON c.cell = p.cell AND c.vec_id <> p.query_id),
        scored AS (SELECT query_id, nbr_id,
            list_sum(list_transform(list_zip(eq.v, ec.v), x -> x[1] * x[2]))
              / (nq.n * nc.n) AS cos
          FROM cand
            JOIN e eq ON eq.vec_id = query_id JOIN e ec ON ec.vec_id = nbr_id
            JOIN nrm nq ON nq.vec_id = query_id JOIN nrm nc ON nc.vec_id = nbr_id),
        ranked AS (SELECT query_id, nbr_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rank
          FROM scored)
        SELECT query_id, nbr_id, rank, cos FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ---------------------------------------------------------------- q34
    // Multimodal plumbing: binary media column → per-partition batched
    // (stub) decode → fixed-width features. The oracle recomputes the
    // deterministic fake decode from the hex form of the same bytes.
    QuerySpec(
      "q34_media_features",
      (s, d) =>
        Multimodal.mediaFeatures(s, T.documents(s, d)).orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
          1 + ('0x' || substr(md5(text), 1, 2))::BIGINT AS width,
          1 + ('0x' || substr(md5(text), 3, 2))::BIGINT AS height,
          CAST(16 AS BIGINT) AS n_bytes,
          ${dbl("list_sum(list_transform(generate_series(0, 15), i -> ('0x' || substr(md5(text), 2*i + 1, 2))::BIGINT))")} / ${dbl("16")} AS mean_byte
        FROM documents ORDER BY doc_id""")),

    // --------------------------------------------------------------- q34b
    // Frame sampling (video-shaped multimodal): declared ×n fan-out via
    // posexplode; frame bytes stay binary for downstream batched decode,
    // the hex projection is what the oracle checks (DuckDB's md5 is
    // VARCHAR-only, so the blob itself can't be re-hashed there).
    QuerySpec(
      "q34b_media_frames",
      (s, d) => {
        val media = Multimodal.mediaTable(T.documents(s, d), "doc_id", "text")
        Multimodal.sampleFrames(media, "doc_id", "media", nFrames = 4)
          .select(col("doc_id"), col("frame_idx"),
            lower(hex(col("frame"))).as("frame_hex"),
            length(col("frame")).cast("long").as("n_bytes"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
          md5(md5(text) || ':' || CAST(i AS VARCHAR)) AS frame_hex,
          CAST(16 AS BIGINT) AS n_bytes
        FROM documents CROSS JOIN (SELECT unnest(range(4)) AS i)
        ORDER BY doc_id, frame_idx""")),

    // ---------------------------------------------------------------- q46
    // The flagship curation composition — what this engine exists for:
    // quality-gate the corpus, then remove the duplicate member of every
    // near-dup pair (keep the lower id). Quality scoring is a narrow
    // projection; dedup is the q30 inverted-index join; removal is a
    // left-anti join — three operator families composed in one plan.
    QuerySpec(
      "q46_curation",
      (s, d) => {
        val docs = T.documents(s, d)
        // round-18 note: the quality filter runs serialized on the
        // single-row-group scan (~0.4 s CPU at sf0.1). A Par.fanOut was
        // tried and REVERTED: Catalyst pushes deterministic filters
        // below Repartition, so the regex battery stayed on one core and
        // the round-robin exchange floated uselessly above the anti-join.
        // This is fixture-layout skew (guide §2.5) — at 100 TB the scan
        // splits and the filter parallelizes by itself.
        val kept = docs.filter(Text.qualityScore(col("text")) >= 0.8 &&
          Text.tokenCount(col("text")) >= 10)
        val dupIds = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            shingleN = 3, threshold = 0.5)
          .select(col("id_b").as("doc_id")).distinct()
        kept.join(dupIds, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $tokCte, ${shingleCte(3)},
        $baseCte,
        ${qualCte(" n_tokens,")},
        $pairGraphCte,
        dup AS (SELECT DISTINCT id_b FROM pairs)
        SELECT d.doc_id, d.n_chars
        FROM documents d JOIN qual ON qual.doc_id = d.doc_id
        WHERE qual.quality >= ${dbl("0.8")} AND qual.n_tokens >= 10
          AND d.doc_id NOT IN (SELECT id_b FROM dup)
        ORDER BY d.doc_id"""),
      headline = true),

    // ---------------------------------------------------------------- q51
    // Duplicate clusters: pairs are not a dedup decision — A≈B and B≈C
    // must collapse {A,B,C} even though A and C never collide. Connected
    // components over the q30 Jaccard pair graph via min-label propagation
    // + pointer jumping (O(log diameter) rounds, two label shuffles each);
    // every doc gets (cluster_id = min reachable doc_id, cluster_size),
    // singletons included. The oracle replays reachability with a
    // recursive CTE — the unique fixpoint makes the comparison exact.
    QuerySpec(
      "q51_dedup_clusters",
      (s, d) => {
        val docs = T.documents(s, d)
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
        Dedup.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $tokCte, ${shingleCte(3)},
        $pairGraphCte,
        $ccCte
        SELECT a.doc_id, a.cluster_id, cs.cluster_size
        FROM assigned a JOIN cs ON cs.cluster_id = a.cluster_id
        ORDER BY a.doc_id""")),

    // ---------------------------------------------------------------- q49
    // Benchmark decontamination: n-gram containment |A∩B|/|B| of each
    // "eval item" (docs 0-24 standing in for a benchmark) in each corpus
    // doc. Asymmetric on purpose — a doc embedding a whole benchmark item
    // scores 1.0 regardless of its own length. Inverted-index join; the
    // benchmark side is small and bounds the blowup.
    QuerySpec(
      "q49_contamination",
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.benchmarkContamination(
            docs.filter(col("doc_id") >= 25), "doc_id", "text",
            docs.filter(col("doc_id") < 25), "doc_id", "text",
            shingleN = 3, minContainment = 0.5)
          .orderBy(col("doc_id"), col("bench_id"))
      },
      Some(s"""WITH $tokCte, ${shingleCte(3)},
        d AS (SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id >= 25),
        b AS (SELECT doc_id AS bench_id, unnest(hs) AS h FROM sh WHERE doc_id < 25),
        bs AS (SELECT bench_id, COUNT(*) AS n_bench FROM b GROUP BY bench_id),
        cm AS (SELECT d.doc_id, b.bench_id, COUNT(*) AS n_common
               FROM d JOIN b ON d.h = b.h GROUP BY 1, 2)
        SELECT cm.doc_id, cm.bench_id, cm.n_common,
          ${dbl("n_common")} / ${dbl("n_bench")} AS containment
        FROM cm JOIN bs ON bs.bench_id = cm.bench_id
        WHERE ${dbl("n_common")} / ${dbl("n_bench")} >= ${dbl("0.5")}
        ORDER BY cm.doc_id, cm.bench_id""")),

    // ---------------------------------------------------------------- q50
    // Deterministic sequence packing: documents → fixed-token-budget
    // training sequences, cumulative-sum window per language. One shuffle
    // on the partition key; same bins on every run/engine by construction.
    QuerySpec(
      "q50_pack_sequences",
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("doc_id"), col("lang"),
            Text.tokenCount(col("text")).as("n_tokens"))
        Sampling.packSequences(docs, "lang", "doc_id", "n_tokens", budget = 512L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang,
            CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, lang, n_tokens,
            CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM t)
        SELECT doc_id, lang, n_tokens,
          CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id,
          (cum - n_tokens) % 512 AS seq_offset
        FROM c ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q47
    // Safety/quality signals a curation pass gates on: PII detection +
    // typed redaction (emails, phones, IPv4 — format-anchored regexes in
    // the Java∩RE2 dialect) and Gopher-style repetition metrics
    // (duplicate-line fraction, top-2-gram share). All per-row
    // projections; the redacted text is checked via its fingerprint.
    QuerySpec(
      "q47_quality_signals",
      (s, d) => {
        val base = graft.ops.Par.fanOut(
            T.documents(s, d).select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("toks"))
        // top-bigram share via the posexplode aggregate form: the per-row
        // HOF variant is O(len²) interpreted (measured 146 s vs 1.2 s at
        // sf0.1; see Text.topBigramRatios scaladoc)
        val ratios = Text.topBigramRatios(base, "doc_id", "toks")
        base.select(
            col("doc_id"),
            Text.piiCount(col("text"), Text.EmailRe).as("n_emails"),
            Text.piiCount(col("text"), Text.PhoneRe).as("n_phones"),
            Text.piiCount(col("text"), Text.Ipv4Re).as("n_ips"),
            Text.fingerprint(Text.piiRedact(col("text"))).as("redacted_fp"),
            Text.duplicateLineRatio(col("text")).as("dup_line_ratio"))
          .join(ratios, Seq("doc_id"), "left_outer")
          .withColumn("top_bigram_ratio",
            coalesce(col("top_bigram_ratio"), lit(0.0)))
          .orderBy(col("doc_id"))
      },
      Some {
        val redacted =
          s"""regexp_replace(regexp_replace(regexp_replace(d.text,
             '${Text.EmailRe}', '<EMAIL>', 'g'),
             '${Text.PhoneRe}', '<PHONE>', 'g'),
             '${Text.Ipv4Re}', '<IP>', 'g')"""
        s"""WITH $tokCte,
          sh2 AS (SELECT doc_id, CASE WHEN len(t) >= 2
              THEN list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
              ELSE [] END s2 FROM toks),
          ln AS (SELECT doc_id,
              list_filter(string_split(text, chr(10)), l -> length(l) > 0) lines
            FROM documents)
        SELECT d.doc_id,
          CAST(len(regexp_extract_all(d.text, '${Text.EmailRe}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(d.text, '${Text.PhoneRe}')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(d.text, '${Text.Ipv4Re}')) AS BIGINT) AS n_ips,
          ${h60(redacted)} AS redacted_fp,
          CASE WHEN len(lines) > 0
            THEN ${dbl("len(lines) - len(list_distinct(lines))")} / ${dbl("len(lines)")}
            ELSE ${dbl("0")} END AS dup_line_ratio,
          CASE WHEN len(s2) > 0
            THEN ${dbl("list_max(list_transform(list_distinct(s2), x -> len(list_filter(s2, y -> y = x))))")} / ${dbl("len(s2)")}
            ELSE ${dbl("0")} END AS top_bigram_ratio
        FROM documents d JOIN sh2 ON sh2.doc_id = d.doc_id
          JOIN ln ON ln.doc_id = d.doc_id
        ORDER BY d.doc_id"""
      },
      headline = true),

    // ---------------------------------------------------------------- q48
    // Deterministic corpus mixing: quality-tiered hash sampling — the
    // reproducible "data recipe" step. Membership is a pure function of
    // (salt, doc_id) through the portable MD5, so the identical subset
    // comes out of every re-run, partitioning, and engine: the oracle
    // replays the sampling decision row by row.
    QuerySpec(
      "q48_mix_hash_sampled",
      (s, d) => {
        val docs = T.documents(s, d)
        val q = Text.qualityScore(col("text"))
        Sampling.mixSources(Seq(
            ("high", docs.filter(q >= 0.8), 0.9),
            ("low", docs.filter(q < 0.8), 0.2)), "doc_id")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $tokCte,
        $baseCte,
        ${qualCte()}
        SELECT d.doc_id,
          CASE WHEN q.quality >= ${dbl("0.8")} THEN 'high' ELSE 'low' END AS source
        FROM documents d JOIN qual q ON q.doc_id = d.doc_id
        WHERE (q.quality >= ${dbl("0.8")}
                 AND ${h60("'high|' || d.doc_id")} < ${Sampling.cutoff(0.9)})
           OR (q.quality < ${dbl("0.8")}
                 AND ${h60("'low|' || d.doc_id")} < ${Sampling.cutoff(0.2)})
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q53
    // Per-label embedding centroids (mean pooling) via the typed
    // VecCentroid Aggregator: partial aggregation folds each task's rows
    // into one (sum, count) buffer, so the exchange carries one 64-dim
    // vector per label per task — independent of corpus size. The
    // posexplode+avg alternative would shuffle rows × dims. Outputs are
    // rounded to 1e-6 on both sides: cross-row float summation order
    // differs between engines at ~1e-16 relative, and the rounding
    // quantum absorbs it. The centroid is emitted one dimension per row
    // (label, dim, m): the comparator sorts every output column, which
    // an array column breaks — and the exploded form is |labels|×64
    // rows, still tiny. The aggregation itself stays vectorized; only
    // the final projection explodes.
    QuerySpec(
      "q53_embedding_centroids",
      (s, d) => {
        import graft.functions.VecCentroid
        T.embeddings(s, d)
          .groupBy(col("label"))
          .agg(VecCentroid(col("embedding")).as("raw"),
            count(lit(1)).as("n"))
          .select(col("label"), col("n"),
            posexplode(transform(col("raw"), x => round(x, 6))))
          .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
            col("col").as("m"), col("n"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH u AS (SELECT label, generate_subscripts(embedding, 1) AS i,
            unnest(embedding) AS e FROM embeddings),
        m AS (SELECT label, i, ROUND(AVG(CAST(e AS DOUBLE)), 6) AS m
              FROM u GROUP BY 1, 2)
        SELECT m.label, CAST(m.i AS BIGINT) AS dim, m.m AS m, n.n
        FROM m JOIN (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1) n
          ON n.label = m.label
        ORDER BY m.label, dim""")),

    // ---------------------------------------------------------------- q54
    // The kept set — the dedup pipeline's actual OUTPUT: near-dup pairs
    // (q30) → connected clusters (q51) → keep the best-quality doc per
    // cluster (quality DESC, doc_id ASC tiebreak). One row per cluster,
    // singletons included. This is the decision step that q46's
    // drop-all-id_b heuristic approximates; clustering keeps exactly one
    // representative per duplicate set even across chains. Cost on top of
    // clustering: one quality projection (scan-speed) + one row_number
    // window on cluster_id (reuses the cluster join's partitioning).
    QuerySpec(
      "q54_cluster_keep_best",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = T.documents(s, d)
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
        val clusters = Dedup.dedupClusters(docs, "doc_id", pairs, "id_a", "id_b")
        val withQ = docs.select(col("doc_id"),
          Text.qualityScore(col("text")).as("quality"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality").desc, col("doc_id"))
        clusters.join(withQ, Seq("doc_id"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
            col("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $tokCte, ${shingleCte(3)},
        $baseCte,
        ${qualCte()},
        $pairGraphCte,
        $ccCte,
        ranked AS (SELECT a.doc_id, a.cluster_id, cs.cluster_size, q.quality,
            ROW_NUMBER() OVER (PARTITION BY a.cluster_id
              ORDER BY q.quality DESC, a.doc_id) AS rk
          FROM assigned a
          JOIN cs ON cs.cluster_id = a.cluster_id
          JOIN qual q ON q.doc_id = a.doc_id)
        SELECT doc_id, cluster_id, cluster_size, quality
        FROM ranked WHERE rk = 1 ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q55
    // Corpus vocabulary: top-50 tokens by frequency (the first step of
    // any tokenizer/vocab build). Explode shuffles nothing raw: partial
    // aggregation combines per task BEFORE the exchange, so the shuffle
    // carries each task's distinct tokens (bounded by vocabulary), not
    // the corpus token stream — and the "the"-style hot keys are
    // pre-summed, so token skew never concentrates on one reducer. The
    // final top-k is a TakeOrdered, not a global sort.
    QuerySpec(
      "q55_token_freq",
      (s, d) =>
        T.documents(s, d)
          .select(explode(Text.tokens(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50),
      Some(s"""WITH $tokCte, u AS (SELECT unnest(t) AS token FROM toks)
        SELECT token, COUNT(*) AS n FROM u GROUP BY token
        ORDER BY n DESC, token LIMIT 50""")),

    // ---------------------------------------------------------------- q61
    // Quality-weighted corpus sample: top-100 docs by the
    // Efraimidis–Spirakis key −ln(u)/w, with u drawn from the portable
    // hash — sampling exactly proportional to the quality score, without
    // replacement, and fully reproducible (no RNG state; any engine with
    // md5 + ln replays the identical subset). The oracle mirrors the
    // Spark float arithmetic operation-for-operation (CAST before the
    // +1.0 — at 2⁶⁰ magnitudes the rounding order matters).
    QuerySpec(
      "q61_weighted_sample",
      (s, d) => {
        val withW = T.documents(s, d).select(col("doc_id"),
          Text.qualityScore(col("text")).as("weight"))
        Sampling.weightedSample(withW, "doc_id", "weight", k = 100, salt = "ws")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $tokCte, $baseCte, ${qualCte()},
        keyed AS (SELECT doc_id, quality AS weight,
            -ln((CAST(${h60("'ws|' || doc_id")} AS DOUBLE) + 1.0)
                / ${dbl(s"${1L << 60}.0 + 1.0")}) / quality AS es_key
          FROM qual WHERE quality > 0),
        topk AS (SELECT doc_id, weight FROM keyed
                 ORDER BY es_key, doc_id LIMIT 100)
        SELECT doc_id, weight FROM topk ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q64
    // Boilerplate fraction: share of each doc's 5-gram shingles appearing
    // in ≥ 5 docs — the passage-level repetition screen (shared
    // headers/templates) that doc-level near-dup detection misses. One
    // doc-frequency agg on the shingle hash (map-side combined), one join
    // back on the same hash partitioning, one per-doc count.
    QuerySpec(
      "q64_boilerplate_fraction",
      (s, d) =>
        Dedup.boilerplateFractions(T.documents(s, d), "doc_id", "text",
            shingleN = 5, minDocs = 5)
          .orderBy(col("doc_id")),
      Some(s"""WITH $tokCte, ${shingleCte(5)},
        ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
        dfq AS (SELECT h, COUNT(*) AS docfreq FROM ex GROUP BY h),
        per AS (SELECT ex.doc_id, COUNT(*) AS n_shingles,
            CAST(SUM(CASE WHEN dfq.docfreq >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
          FROM ex JOIN dfq USING (h) GROUP BY ex.doc_id)
        SELECT d.doc_id,
          coalesce(per.n_shingles, 0) AS n_shingles,
          coalesce(per.n_common, 0) AS n_common,
          CASE WHEN per.n_shingles > 0
            THEN CAST(per.n_common AS DOUBLE) / per.n_shingles END AS boilerplate_frac
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q65
    // Stratified sample: exactly 10 docs per source, picked by hash rank
    // — balanced per-source eval sets with zero RNG state. The rank
    // filter plans as partial+final WindowGroupLimit (≤ k rows per group
    // per task cross the exchange); the pick is a pure function of
    // (salt, doc_id), so every engine and re-run draws the same rows.
    QuerySpec(
      "q65_stratified_sample",
      (s, d) =>
        Sampling.stratifiedSample(T.documents(s, d), "doc_id", "source",
            k = 10, salt = "s65")
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some(s"""WITH r AS (SELECT doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY ${h60("'s65|' || doc_id")}, doc_id) AS rk
          FROM documents)
        SELECT doc_id, source FROM r WHERE rk <= 10 ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q66
    // Incremental dedup: which docs of an incoming batch (doc_id ≥ 250)
    // near-dup the EXISTING corpus (doc_id < 250) — the operational form
    // at 100 TB, where each ingest batch joins the persisted banded
    // signature index instead of re-running corpus × corpus. Candidates
    // form strictly ACROSS the split; batch×batch and corpus×corpus
    // pairs never exist in the plan. Full bit-for-bit signature oracle,
    // like q27.
    QuerySpec(
      "q66_incremental_dedup",
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.minhashNearDupsAgainst(
            docs.filter(col("doc_id") < 250),
            docs.filter(col("doc_id") >= 250),
            "doc_id", "text",
            numHashes = NumHashes, shingleN = 3, bands = Bands, threshold = 0.5)
          .orderBy(col("incoming_id"), col("corpus_id"))
      },
      Some(incrementalDedupOracleSql),
      headline = true),

    // --------------------------------------------------------------- q111
    // q66's incremental dedup fed end-to-end by the TABLE-FORMAT pipeline
    // (Fits.snapshotDocsPipeline): the corpus arrives as a SnapshotSink
    // micro-batch, the persisted signature index is built from the v1
    // bootstrap change feed, and the incoming batches (one of them
    // REPLAYED — the exactly-once skip keeps it a no-op) reach the dedup
    // join through Layout.snapshotChanges, never a table scan. Shares
    // q66's oracle VERBATIM: the split (corpus < 250 <= incoming) is the
    // batch boundary, so sink → change feed → index join must reproduce
    // the direct two-frame computation bit-for-bit.
    QuerySpec(
      "q111_pipeline_incremental_dedup",
      (s, d) => {
        val (tab, idx) = Fits.snapshotDocsPipeline(s, d)
        Dedup.minhashNearDupsAgainstIndex(
            Dedup.readSignatureIndex(s, idx, NumHashes, 3, Bands),
            graft.ops.Layout.snapshotChanges(s, tab, fromVersion = 1L),
            "doc_id", "text",
            numHashes = NumHashes, shingleN = 3, bands = Bands, threshold = 0.5)
          .orderBy(col("incoming_id"), col("corpus_id"))
      },
      Some(incrementalDedupOracleSql),
      headline = true),

    // --------------------------------------------------------------- q112
    // The THIRD consumer family on the change feed (q110 = vectors,
    // q111 = dedup, this = sketch state): one HLL token sketch per
    // snapshot DELTA of the sink-committed documents table, unioned into
    // the running vocabulary estimate — the daily-stats refresh that
    // costs one delta scan + a register merge, never a corpus rescan.
    // Certificate row (q105 convention, booleans literal TRUE in the
    // oracle): union-of-delta-sketches within 1% of the one-shot sketch
    // and within 3% of the exact distinct count (exact at this corpus's
    // vocabulary size, so drift = hash failure). n_docs = SUM of
    // per-delta doc counts, hash-checked against COUNT(*) — a replayed
    // micro-batch that double-committed would double a delta and break
    // it (the distinct-token metrics alone are idempotent and would
    // not notice duplicated rows).
    QuerySpec(
      "q112_pipeline_sketch_refresh",
      (s, d) => {
        import graft.ops.Layout
        val (tab, _) = Fits.snapshotDocsPipeline(s, d)
        val versions = Layout.snapshotVersions(s, tab)
        val perDelta = (0L +: versions).zip(versions).map { case (a, b) =>
          Layout.snapshotChanges(s, tab, a, b)
            .select(col("doc_id"),
              explode_outer(Text.tokens(col("text"))).as("tok"))
            .agg(expr("hll_sketch_agg(tok, 14)").as("sk"),
              countDistinct(col("doc_id")).as("n"))
        }.reduce(_ unionByName _)
        val merged = perDelta.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk, true))")
            .as("est_union"),
          sum(col("n")).as("n_docs"))
        val full = T.documents(s, d)
          .select(explode_outer(Text.tokens(col("text"))).as("tok"))
          .agg(expr("hll_sketch_estimate(hll_sketch_agg(tok, 14))")
              .as("est_full"),
            countDistinct(col("tok")).as("exact_toks"))
        full.crossJoin(merged).select(
          col("n_docs"), col("exact_toks"),
          (abs(col("est_union") - col("est_full")) <=
            col("est_full") * 0.01).as("union_near_full"),
          (abs(col("est_union") - col("exact_toks")) <=
            col("exact_toks") * 0.03).as("within_3pct"))
      },
      Some(s"""WITH $tokCte, tf AS (SELECT unnest(t) AS tok FROM toks)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
          CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_toks,
          TRUE AS union_near_full, TRUE AS within_3pct
        FROM tf"""),
      headline = true),

    // ---------------------------------------------------------------- q67
    // Top distinctive terms per source: term frequency within the source
    // scored against corpus-wide document frequency (tf/df — the ln-free
    // TF-IDF variant: IEEE division is bit-identical across engines,
    // where ln's last-ulp could flip near-ties in the rank; production
    // swaps in ln(N/df) unchanged). Two term-level aggregates + a
    // rank-k window that plans as WindowGroupLimit; the shuffle carries
    // (source, term) and (term) counts, never text.
    QuerySpec(
      "q67_distinctive_terms",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = T.documents(s, d)
        val terms = docs.select(col("source"), col("doc_id"),
          explode(Text.tokens(col("text"))).as("term"))
        // ONE pass over the exploded tokens: tf and the per-source
        // distinct-doc count aggregate together; df(term) is then the sum
        // of the per-source distinct counts (each doc has exactly one
        // source), so the scan + tokenize never runs twice
        val tf = terms.groupBy(col("source"), col("term"))
          .agg(count(lit(1)).as("tf"),
            countDistinct(col("doc_id")).as("dfs"))
        val df = tf.groupBy(col("term")).agg(sum(col("dfs")).as("df"))
        val w = Window.partitionBy(col("source"))
          .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
        tf.join(df, Seq("term"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("source"), col("term"), col("tf"), col("df"),
            (col("tf").cast("double") / col("df")).as("score"))
          .orderBy(col("source"), col("term"))
      },
      Some(s"""WITH $tokCte,
        terms AS (SELECT d.source, toks.doc_id, unnest(toks.t) AS term
                  FROM toks JOIN documents d USING (doc_id)),
        tf AS (SELECT source, term, COUNT(*) AS tf
               FROM terms GROUP BY source, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df
               FROM terms GROUP BY term),
        ranked AS (SELECT tf.source, tf.term, tf.tf, df.df,
            ${dbl("tf.tf")} / df.df AS score,
            ROW_NUMBER() OVER (PARTITION BY tf.source
              ORDER BY ${dbl("tf.tf")} / df.df DESC, tf.term) AS rk
          FROM tf JOIN df USING (term))
        SELECT source, term, tf, df, score
        FROM ranked WHERE rk <= 5 ORDER BY source, term""")),

    // ---------------------------------------------------------------- q68
    // Exact embedding dedup: group by the raw vector value (arrays are
    // groupable in both engines — no float-to-string round trip, no
    // portability hazard), keep the min id per group. One shuffle on the
    // vector bytes; at 100 TB pre-hash to 64 bits first and verify
    // in-bucket, exactly like the text path (q26).
    QuerySpec(
      "q68_embedding_exact_dedup",
      (s, d) =>
        T.embeddings(s, d)
          .groupBy(col("embedding"))
          .agg(min(col("vec_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          .select(col("keep_id"), col("n_copies"))
          .orderBy(col("keep_id")),
      Some("""SELECT MIN(vec_id) AS keep_id, COUNT(*) AS n_copies
        FROM embeddings GROUP BY embedding ORDER BY keep_id""")),

    // ---------------------------------------------------------------- q70
    // Byte-entropy garbage screen via the native codegen'd expression
    // (functions.ByteEntropy): one histogram pass per row inside
    // whole-stage codegen — no explode, no shuffle; the relational
    // alternative pays two exchanges of corpus × doc-length rows for
    // this purely row-local quantity. The oracle rebuilds it with a
    // character unnest + DuckDB's log2-based entropy() aggregate (equal
    // to the byte form on this ASCII corpus); round-6 absorbs the
    // engines' summation-order ulps.
    QuerySpec(
      "q70_byte_entropy",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            round(Text.byteEntropy(col("text")), 6).as("entropy_bits"))
          .orderBy(col("doc_id")),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents),
        ent AS (SELECT doc_id, entropy(c) AS e FROM ch GROUP BY doc_id)
        SELECT d.doc_id, ROUND(COALESCE(ent.e, 0.0), 6) AS entropy_bits
        FROM documents d LEFT JOIN ent ON ent.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q71
    // Unigram-LM fluency scoring (Text.unigramLogProbs): the corpus is
    // its own language model — vocab counts are one map-side-combined
    // agg whose output is vocab-sized, the scored vocab broadcasts back
    // (the corpus token stream is never shuffled for the join), and the
    // only corpus-sized exchange is the per-doc average. log2 on both
    // engines; round-6 on the cross-row average.
    QuerySpec(
      "q71_unigram_logprob",
      (s, d) =>
        Text.unigramLogProbs(T.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("n_tokens"),
            round(col("avg_logprob"), 6).as("avg_logprob"))
          .orderBy(col("doc_id")),
      Some(s"""WITH $tokCte,
        u AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        f AS (SELECT tok, COUNT(*) AS cnt FROM u GROUP BY tok),
        tot AS (SELECT SUM(cnt) AS total FROM f),
        lp AS (SELECT f.tok, log2(${dbl("f.cnt")} / ${dbl("tot.total")}) AS logp
               FROM f, tot),
        per AS (SELECT u.doc_id, COUNT(*) AS n_tokens, AVG(lp.logp) AS alp
                FROM u JOIN lp USING (tok) GROUP BY u.doc_id)
        SELECT d.doc_id, COALESCE(per.n_tokens, 0) AS n_tokens,
          ROUND(per.alp, 6) AS avg_logprob
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q73
    // Cross-doc line-level boilerplate REMOVAL (Dedup.removeCommonLines):
    // doc frequency aggregates on the line's 60-bit hash (the exchange
    // carries (hash, doc) pairs, never text), the tiny common set
    // broadcasts back, and the rebuild's array_sort keeps reconstruction
    // deterministic under any partitioning. This corpus has single-line
    // docs, so the oracle pins the hard part — byte-exact split→filter→
    // rejoin reconstruction across engines with zero removals — while
    // DedupSpec pins the removal semantics on multi-line fixtures.
    QuerySpec(
      "q73_line_dedup",
      (s, d) =>
        Dedup.removeCommonLines(T.documents(s, d), "doc_id", "text",
            minDocs = 5)
          .orderBy(col("doc_id")),
      Some(s"""WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS l
            FROM documents),
        ln AS (SELECT doc_id, unnest(l) AS line,
            unnest(generate_series(1, len(l))) AS pos FROM ls),
        lh AS (SELECT doc_id, pos, line, ${h60("line")} AS h FROM ln),
        common AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df
            FROM lh WHERE length(line) > 0 GROUP BY h) WHERE df >= 5),
        kept AS (SELECT doc_id, pos, line FROM lh
          WHERE length(line) = 0 OR h NOT IN (SELECT h FROM common)),
        agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
            string_agg(line, chr(10) ORDER BY pos) AS clean_text
          FROM kept GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
          CAST(len(string_split(d.text, chr(10))) - COALESCE(a.n_kept, 0)
            AS BIGINT) AS n_lines_removed
        FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q74
    // BM25 corpus search (Search.bm25): the term explode is filtered to
    // the query bag BEFORE any exchange, so every shuffle carries only
    // matching postings; df and the scalar (N, avgdl) stats broadcast
    // back. Ranking orders by the ROUNDED score so the top-100 boundary
    // cannot flip on cross-engine ln/summation ulps; doc_id breaks ties
    // totally.
    QuerySpec(
      "q74_bm25_search",
      (s, d) =>
        graft.ops.Search.bm25(T.documents(s, d), "doc_id", "text",
            Seq("spark", "vector", "hash", "window"))
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(100),
      Some(s"""WITH $tokCte,
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            AVG(CAST(len(t) AS BIGINT)) AS avgdl FROM toks),
        tr AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
            unnest(t) AS term FROM toks),
        qt AS (SELECT * FROM tr
          WHERE term IN ('spark', 'vector', 'hash', 'window')),
        tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM qt GROUP BY 1, 2, 3),
        dfx AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM qt GROUP BY term),
        sc AS (SELECT tf.doc_id,
            SUM(ln(1.0 + (${dbl("st.n - dfx.df")} + 0.5)
                / (${dbl("dfx.df")} + 0.5))
              * (${dbl("tf.tf")} * (1.2 + 1.0))
              / (${dbl("tf.tf")}
                 + 1.2 * ((1.0 - 0.75) + 0.75 * ${dbl("tf.dl")} / st.avgdl)))
              AS score
          FROM tf JOIN dfx USING (term), st GROUP BY tf.doc_id)
        SELECT doc_id, ROUND(score, 6) AS score FROM sc
        ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 100""")),

    // ---------------------------------------------------------------- q76
    // Per-source distribution drift (Text.sourceDrift): Jensen–Shannon
    // divergence between each source's unigram distribution and the
    // corpus's — the "did one crawl pollute the mix?" monitor. The token
    // stream collapses to (source, token) counts map-side; every later
    // exchange is vocab-bounded, and the absent-token grid is
    // |sources| × |vocab| with |sources| a small constant. Per-token
    // terms are order-free doubles; the cross-token SUM routes through
    // round-12 → DECIMAL so both engines add exactly.
    QuerySpec(
      "q76_source_drift",
      (s, d) =>
        Text.sourceDrift(T.documents(s, d), "source", "text")
          .select(col("source"), col("n_tokens"),
            round(col("jsd"), 6).as("jsd"))
          .orderBy(col("source")),
      Some(s"""WITH st AS (SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS tok
            FROM documents),
        cs AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_s
            FROM st GROUP BY 1, 2),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM st),
        g AS (SELECT source, tok, c_s,
            CAST(SUM(c_s) OVER (PARTITION BY tok) AS BIGINT) AS c_all,
            CAST(SUM(c_s) OVER (PARTITION BY source) AS BIGINT) AS n_s
          FROM cs),
        terms AS (SELECT source, n_s,
            0.5 * ((${dbl("c_s")} / ${dbl("n_s")})
                * log2((${dbl("c_s")} / ${dbl("n_s")})
                  / (((${dbl("c_s")} / ${dbl("n_s")})
                     + (${dbl("c_all")} / ${dbl("n_tot")})) / 2.0))
              + (${dbl("c_all")} / ${dbl("n_tot")})
                * log2((${dbl("c_all")} / ${dbl("n_tot")})
                  / (((${dbl("c_s")} / ${dbl("n_s")})
                     + (${dbl("c_all")} / ${dbl("n_tot")})) / 2.0))) AS term,
            ${dbl("c_all")} / ${dbl("n_tot")} AS q
          FROM g CROSS JOIN tot),
        agg AS (SELECT source, n_s,
            CAST(SUM(CAST(ROUND(term, 12) AS DECIMAL(28,14))) AS DOUBLE) AS a,
            CAST(SUM(CAST(ROUND(q, 12) AS DECIMAL(28,14))) AS DOUBLE) AS b
          FROM terms GROUP BY 1, 2)
        SELECT source, n_s AS n_tokens,
          ROUND(a + 0.5 * (1.0 - b), 6) AS jsd
        FROM agg ORDER BY source""")),

    // ---------------------------------------------------------------- q78
    // Product-quantized ANN (Similarity.pqTopK): the corpus's 64-float
    // vectors collapse to 16 4-bit codes (+1 reconstructed norm) in ONE
    // encode scan; each (query, doc) pair is then scored by 16 codegen'd
    // table lookups (functions.PqAdc) instead of 64 float multiplies —
    // the memory-bound ANN path that lets a 100 TB embedding store score
    // from RAM. k-means codebooks fit on the same bounded sample as IVF.
    // FULL value oracle since round 4: the memoized codebooks ([[Fits]])
    // are baked into the SQL as literals ({BOOKS16_2K}), so DuckDB
    // replays the encode argmin, the float32 LUT, the sequential pq_adc
    // fold, the ADC shortlist, and the exact re-rank bit-for-bit.
    // SimilaritySpec additionally pins recall vs the exact q32 ranking.
    QuerySpec(
      "q78_ann_pq",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.pqTopKWith(e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5,
            Fits.pqCodebooks(s, d, 16, 16, 2000), shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $embCte, $nrmCte, ${bookCte("BOOKS16_2K")}, $pqEncCte,
        adc AS (SELECT q.query_id, en.vec_id AS nbr_id,
            list_sum(list(CAST(q.lv AS DOUBLE) ORDER BY q.j)) AS a
          FROM qlut q JOIN enc en ON en.j = q.j AND en.code = q.code
          WHERE q.query_id <> en.vec_id
          GROUP BY q.query_id, en.vec_id),
        cospq AS (SELECT a.query_id, a.nbr_id, a.a / (nq.n * n2.nn) AS cp
          FROM adc a JOIN nrm nq ON nq.vec_id = a.query_id
            JOIN nrm2 n2 ON n2.vec_id = a.nbr_id),
        cand AS (SELECT query_id, nbr_id FROM (SELECT query_id, nbr_id,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cp DESC, nbr_id) AS rn
          FROM cospq) WHERE rn <= 50),
        rescored AS (SELECT query_id, nbr_id,
            list_sum(list_transform(list_zip(eq.v, ec.v), x -> x[1] * x[2]))
              / (nq.n * nc.n) AS cos
          FROM cand
            JOIN e eq ON eq.vec_id = query_id JOIN e ec ON ec.vec_id = nbr_id
            JOIN nrm nq ON nq.vec_id = query_id JOIN nrm nc ON nc.vec_id = nbr_id),
        ranked AS (SELECT query_id, nbr_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, nbr_id) AS rank
          FROM rescored)
        SELECT query_id, nbr_id, rank, cos FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // --------------------------------------------------------------- q78b
    // IVF-PQ composed ANN: cells bound WHICH docs a query touches, codes
    // bound the COST per touch, the exact re-rank bounds the recall cost
    // to shortlist membership. The full production shape at 100 TB: one
    // corpus pass builds (cell, codes, norm); scoring shuffles cell keys
    // only. FULL value oracle since round 4: both fitted artifacts
    // ({CENT16_2K} + {BOOKS16_2K}) are literal-baked, so the oracle
    // composes the q33b cell routing with the q78 ADC scoring exactly.
    QuerySpec(
      "q78b_ann_ivfpq",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.ivfPqTopKWith(e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5,
            Fits.ivfCentroids(s, d, 16, 2000),
            Fits.pqCodebooks(s, d, 16, 16, 2000),
            nProbe = 4, shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleSql)),

    // --------------------------------------------------------------- q103
    // q78b's retrieval through the PERSISTED vector index
    // ([[graft.ops.VectorIndex]]): the fits are built ONCE, the coded
    // corpus is written cell-partitioned to disk, and the query path
    // reads the index — the 100 TB operating shape, where retrieval jobs
    // never touch (or even see) the raw corpus except for the bounded
    // exact rerank. Shares q78b's oracle VERBATIM: hash-equality proves
    // the on-disk artifact reproduces the in-process fit bit-for-bit
    // (deterministic k-means + exact parquet round-trip of doubles).
    QuerySpec(
      "q103_vector_index",
      (s, d) => {
        val h = graft.ops.VectorIndex.read(s, Fits.vectorIndexDir(s, d))
        val e = T.embeddings(s, d)
        graft.ops.VectorIndex.topKRerank(h, e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5, nProbe = 4, shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleSql),
      headline = true),

    // --------------------------------------------------------------- q104
    // q103's retrieval against an index whose coded table was built
    // PURELY by VectorIndex.append (two ingest batches against the same
    // frozen full-corpus fit). Shares q103's oracle VERBATIM:
    // hash-equality proves append-maintained and one-shot-built indexes
    // are bit-identical — incremental maintenance cannot drift retrieval.
    QuerySpec(
      "q104_vector_index_append",
      (s, d) => {
        val h = graft.ops.VectorIndex.read(s, Fits.vectorIndexAppendDir(s, d))
        val e = T.embeddings(s, d)
        graft.ops.VectorIndex.topKRerank(h, e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5, nProbe = 4, shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleSql),
      headline = true),

    // --------------------------------------------------------------- q110
    // The END-TO-END incremental pipeline (round-8 pieces composed):
    // SnapshotSink micro-batch commits — one batch REPLAYED, one
    // snapshotCompact rewrite interleaved — feed Layout.snapshotChanges
    // per-version deltas into VectorIndex.append, and retrieval over the
    // resulting index shares q103's oracle VERBATIM. Hash-equality is the
    // composition proof: a replay double-commit would double coded rows
    // and shift ranks; a change feed that re-surfaced the compaction's
    // rewritten files would do the same; a dropped delta would lose
    // neighbors — every incremental-correctness failure mode lands in
    // the same driver-visible hash. Fixture: Fits.snapshotPipelineVectorIndexDir.
    QuerySpec(
      "q110_incremental_pipeline",
      (s, d) => {
        val h = graft.ops.VectorIndex.read(s,
          Fits.snapshotPipelineVectorIndexDir(s, d))
        val e = T.embeddings(s, d)
        graft.ops.VectorIndex.topKRerank(h, e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5, nProbe = 4, shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleSql),
      headline = true),

    // --------------------------------------------------------------- q121
    // TAKEDOWN PROPAGATION, oracle-checked end to end: q103's index with
    // every vec_id % 10 == 3 removed by VectorIndex.delete (cell-granular
    // rewrite, fits untouched — q103's routing literals still apply),
    // retrieved with q103's exact query workload. The oracle replays
    // retrieval with those ids excluded from the CANDIDATE side only:
    // hash-equality proves deleted vectors can never be answered with,
    // surviving neighbors re-rank exactly as a from-scratch index over
    // the reduced corpus would rank them, and deletion disturbed nothing
    // else. The derived-artifact half of the q119 takedown story.
    QuerySpec(
      "q121_vector_index_delete",
      (s, d) => {
        val h = graft.ops.VectorIndex.read(s, Fits.vectorIndexDeleteDir(s, d))
        val e = T.embeddings(s, d)
        graft.ops.VectorIndex.topKRerank(h, e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5, nProbe = 4, shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracle("vec_id % 10 <> 3"))),

    // --------------------------------------------------------------- q124
    // TAKEDOWN THROUGH THE PIPELINE: q110's incremental index maintained
    // PURELY by the typed change feed (Layout.snapshotChangesTyped) over
    // a corpus history containing a merge-on-read takedown, its
    // materializing compaction, and a later re-inserting append —
    // delete rows drive VectorIndex.delete, insert rows VectorIndex
    // .append, deletes before inserts per version. The oracle is q103's
    // retrieval with the candidate set reduced to exactly the surviving
    // corpus (removed unless re-inserted): hash-equality proves a
    // takedown flows through feed → index INCREMENTALLY and lands on
    // the same retrieval state a from-scratch rebuild over the reduced
    // corpus would — the full q119 → q121 story with no full recompute
    // anywhere. Fixture: Fits.snapshotTypedPipelineIndexDir.
    QuerySpec(
      "q124_pipeline_takedown",
      (s, d) => {
        val h = graft.ops.VectorIndex.read(s,
          Fits.snapshotTypedPipelineIndexDir(s, d))
        val e = T.embeddings(s, d)
        graft.ops.VectorIndex.topKRerank(h, e, e.filter(col("vec_id") < 20),
            "vec_id", "embedding", k = 5, nProbe = 4, shortlist = 50)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracle("(vec_id % 10 <> 3 OR vec_id % 3 = 2)"))),

    // ---------------------------------------------------------------- q79
    // Sketch-based heavy hitters: Spark 4's approx_top_k aggregate over
    // the corpus token stream. O(maxItemsTracked) state per partition,
    // map-side combined — the exchange carries ONE sketch per task, never
    // the token stream, and capacity (not cardinality) bounds memory: the
    // fleet-scale form of q55's exact vocabulary top-k. FULL hash oracle:
    // a frequent-items sketch is EXACT while the distinct-item count
    // stays under its tracking capacity (no eviction ever happens), and
    // this corpus's whitespace vocabulary (31 tokens at every SF) is far
    // under 10000 — so the estimates must equal DuckDB's exact counts
    // bit-for-bit, and any sketch drift is a driver-visible hash
    // failure. The over-capacity regime (where estimates diverge) is
    // pinned separately in HeavyHitterSpec.
    QuerySpec(
      "q79_heavy_hitters",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(explode(Text.tokens(col("text"))).as("tok"))
        toks.agg(expr("approx_top_k(tok, 20, 10000)").as("top"))
          .select(explode(col("top")).as("hh"))
          .select(col("hh.item").as("tok"),
            col("hh.count").cast("long").as("est_count"))
          .orderBy(col("est_count").desc, col("tok"))
      },
      Some(s"""WITH $tokCte,
          tf AS (SELECT unnest(t) AS tok FROM toks)
        SELECT tok, CAST(count(*) AS BIGINT) AS est_count FROM tf
        GROUP BY tok ORDER BY est_count DESC, tok LIMIT 20""")),

    // --------------------------------------------------------------- q108
    // MERGEABLE heavy-hitter state — q79's sketch split into the
    // accumulate/combine form (Spark 4's approx_top_k_accumulate /
    // approx_top_k_combine): one frequency sketch per ingest source,
    // persistable as binary state, COMBINED into the fleet-wide top-k.
    // This is the daily-vocabulary pattern at 100 TB — each ingest
    // partition accumulates its own sketch once, and the global panel is
    // a combine over |sources| sketch blobs, never a re-scan of the
    // token stream. Same exactness certificate as q79: a frequent-items
    // sketch is EXACT while distinct items stay under capacity (no
    // eviction), combine SUMS exact counts, and this corpus's
    // whitespace vocabulary (31 tokens) is far under 10000 — so the
    // combined estimates must equal DuckDB's exact counts bit-for-bit
    // (q79's oracle, verbatim).
    QuerySpec(
      "q108_topk_state_merge",
      (s, d) => {
        val st = T.documents(s, d)
          .select(col("source"),
            explode(Text.tokens(col("text"))).as("tok"))
          .groupBy(col("source"))
          .agg(expr("approx_top_k_accumulate(tok, 10000)").as("st"))
        st.agg(expr(
            "approx_top_k_estimate(approx_top_k_combine(st, 10000), 20)")
            .as("top"))
          .select(explode(col("top")).as("hh"))
          .select(col("hh.item").as("tok"),
            col("hh.count").cast("long").as("est_count"))
          .orderBy(col("est_count").desc, col("tok"))
      },
      Some(s"""WITH $tokCte,
          tf AS (SELECT unnest(t) AS tok FROM toks)
        SELECT tok, CAST(count(*) AS BIGINT) AS est_count FROM tf
        GROUP BY tok ORDER BY est_count DESC, tok LIMIT 20"""),
      headline = true),

    // ---------------------------------------------------------------- q80
    // Cross-doc repeated-substring spans (Dedup.duplicatedSpans): which
    // PARTS of each doc are copied from elsewhere — the span-level
    // complement of MinHash's whole-doc similarity, catching boilerplate
    // and quoted passages inside otherwise-unique docs. The window
    // explode collapses straight into a distinct-doc-frequency agg on the
    // 60-bit window hash (the exchange carries 16 B pairs, never text);
    // the join back is an equi-join on that hash; the interval merge is
    // one doc-keyed shuffle with a running-max window — the
    // gaps-and-islands form that avoids exploding every covered position.
    // Full value oracle: portable window hashes + the same island SQL.
    QuerySpec(
      "q80_substring_dupes",
      (s, d) =>
        Dedup.duplicatedSpans(T.documents(s, d), "doc_id", "text",
            windowTokens = 8, minDocs = 2)
          .orderBy(col("doc_id")),
      Some {
        val win8 = (0 until 8).map(i => s"t[pos + $i]").mkString(" || ' ' || ")
        s"""WITH $tokCte,
        win AS (SELECT doc_id, unnest(generate_series(1, len(t) - 7)) AS pos, t
            FROM toks WHERE len(t) >= 8),
        wh AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, ${h60(win8)} AS h
            FROM win),
        duph AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df
            FROM wh GROUP BY h) WHERE df >= 2),
        dw AS (SELECT doc_id, pos, pos + 7 AS e FROM wh
            WHERE h IN (SELECT h FROM duph)),
        m AS (SELECT doc_id, pos, e, MAX(e) OVER (PARTITION BY doc_id
            ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
          FROM dw),
        isl AS (SELECT doc_id, pos, e,
            SUM(CASE WHEN pos > COALESCE(pme, 0) THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM m),
        sp AS (SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e,
            COUNT(*) AS nw FROM isl GROUP BY 1, 2),
        agg AS (SELECT doc_id, CAST(SUM(nw) AS BIGINT) AS ndw,
            CAST(COUNT(*) AS BIGINT) AS nsp,
            CAST(SUM(e - s + 1) AS BIGINT) AS covered
          FROM sp GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tokens,
          COALESCE(a.ndw, CAST(0 AS BIGINT)) AS n_dup_windows,
          COALESCE(a.nsp, CAST(0 AS BIGINT)) AS n_spans,
          COALESCE(a.covered, CAST(0 AS BIGINT)) AS covered_tokens,
          ROUND(CASE WHEN len(regexp_extract_all(d.text, '\\S+')) > 0
            THEN CAST(COALESCE(a.covered, 0) AS DOUBLE)
              / len(regexp_extract_all(d.text, '\\S+'))
            ELSE 0.0 END, 6) AS dup_fraction
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id"""
      },
      headline = true),

    // ---------------------------------------------------------------- q82
    // Margin-based bitext mining (Similarity.marginMine): label-0
    // embeddings paired to their best label-1 neighbor, scored by best-cos
    // over mean-of-top-4-cos — hubs score ≈ 1, standout matches score
    // high. Exact top-k here (the oracle replays it); at corpus scale the
    // candidate stage swaps to IVF-PQ with the same margin downstream.
    // Cosines are the sequential-fold VecDot double (bit-identical in
    // DuckDB, q32 precedent); the top-k mean routes through round-12 →
    // DECIMAL so the only cross-row sum is exact.
    QuerySpec(
      "q82_bitext_mining",
      (s, d) => {
        val e = T.embeddings(s, d)
        Similarity.marginMine(
            e.filter(col("label") === 0), e.filter(col("label") === 1),
            "vec_id", "embedding", k = 4)
          .orderBy(col("src_id"))
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
        s AS (SELECT vec_id, v FROM e WHERE label = 0),
        t AS (SELECT vec_id, v FROM e WHERE label = 1),
        scored AS (SELECT s.vec_id AS query_id, t.vec_id AS nbr_id,
            list_sum(list_transform(list_zip(s.v, t.v), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(list_zip(s.v, s.v), x -> x[1] * x[2])))
               * sqrt(list_sum(list_transform(list_zip(t.v, t.v), x -> x[1] * x[2])))) AS cos
          FROM s CROSS JOIN t),
        ranked AS (SELECT query_id, nbr_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, nbr_id) AS rank
          FROM scored),
        top AS (SELECT * FROM ranked WHERE rank <= 4),
        ag AS (SELECT query_id,
            CAST(SUM(CAST(ROUND(cos, 12) AS DECIMAL(28,14))) AS DOUBLE)
              / COUNT(*) AS avgc
          FROM top GROUP BY query_id)
        SELECT top.query_id AS src_id, top.nbr_id AS tgt_id, top.cos AS cos,
          top.cos / ag.avgc AS margin
        FROM top JOIN ag USING (query_id) WHERE rank = 1
        ORDER BY src_id""")),

    // ---------------------------------------------------------------- q85
    // Learned quality filter (Classify.qualityClassifier): fasttext-style
    // hashed bag-of-words + dense stats → logistic regression on weak
    // rule labels. Model outputs are float-merge-order dependent, so the
    // query emits a CERTIFICATE row the oracle CAN check: the corpus
    // count and the weak-label count (both hash-checked — the label rule
    // is the deterministic quality formula the oracle replays), plus a
    // boolean asserting held-out ranking quality (binned Mann-Whitney
    // AUC ≥ 0.80; ClassifySpec pins the exact-pairs AUC at ≥ 0.85) —
    // TRUE on the oracle side, so a degraded model is a driver-visible
    // hash failure, not an untested rows-only pass. The AUC is computed
    // from a 1e4-bin score histogram: one map-side-combined aggregation
    // pass and an O(bins) driver fold — no global sort, no O(pos·neg)
    // pair loop — the shape that survives a 100 TB corpus.
    QuerySpec(
      "q85_quality_classifier",
      (s, d) => {
        val docs = T.documents(s, d)
        val held = graft.ops.Classify.qualityClassifier(
          docs, "doc_id", "text", heldOutOnly = true)
        val bins = held
          .groupBy(floor(col("p_high") * 1e4).cast("long").as("bin"))
          .agg(sum(col("label")).as("pos"),
            sum(lit(1.0) - col("label")).as("neg"))
          .orderBy(col("bin"))
          .collect() // ≤ 1e4 rows whatever the corpus size
        var negBelow = 0.0; var wins = 0.0; var nPos = 0.0; var nNeg = 0.0
        bins.foreach { r =>
          val p = r.getDouble(1); val n = r.getDouble(2)
          wins += negBelow * p + 0.5 * p * n
          negBelow += n; nPos += p; nNeg += n
        }
        val auc = if (nPos > 0 && nNeg > 0) wins / (nPos * nNeg) else 0.0
        graft.ops.Classify.labeledFeatures(docs, "doc_id", "text")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("label")).cast("long").as("n_label_high"))
          .withColumn("holdout_auc_ge_080", lit(auc >= 0.80))
      },
      Some(s"""WITH $tokCte, $baseCte, ${qualCte()}
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN quality >= ${dbl("0.7")} THEN 1 ELSE 0 END) AS BIGINT)
            AS n_label_high,
          TRUE AS holdout_auc_ge_080
        FROM qual""")),

    // ---------------------------------------------------------------- q94
    // Embedding-space benchmark decontamination: max cosine of every
    // corpus vector against the broadcast eval set (vec_id < 50 stands in
    // for the benchmark embeddings) — the semantic complement of q49's
    // n-gram containment, catching paraphrased leakage. One corpus pass,
    // no input shuffle; the argmax is a map-side-combined max(struct).
    // Full value oracle: VecDot's sequential double fold matches DuckDB's
    // list fold bit-for-bit (q32's parity machinery).
    QuerySpec(
      "q94_embedding_decontam",
      (s, d) => {
        val e = T.embeddings(s, d)
        graft.ops.Similarity.decontaminate(
            e.filter(col("vec_id") >= 50), e.filter(col("vec_id") < 50),
            "vec_id", "embedding", threshold = 0.35)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $embCte,
        b AS (SELECT vec_id AS bench_id, v FROM e WHERE vec_id < 50),
        d AS (SELECT vec_id AS doc_id, v FROM e WHERE vec_id >= 50),
        scored AS (SELECT doc_id, bench_id,
            list_sum(list_transform(list_zip(d.v, b.v), x -> x[1] * x[2]))
              / (sqrt(list_sum(list_transform(list_zip(d.v, d.v), x -> x[1] * x[2])))
               * sqrt(list_sum(list_transform(list_zip(b.v, b.v), x -> x[1] * x[2])))) AS cos
          FROM d CROSS JOIN b),
        ranked AS (SELECT doc_id, bench_id, cos,
            ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cos DESC, bench_id) AS rn
          FROM scored)
        SELECT doc_id, bench_id AS nearest_bench_id, cos AS max_cos,
          cos >= 0.35 AS contaminated
        FROM ranked WHERE rn = 1
        ORDER BY doc_id"""),
      headline = true),

    // ---------------------------------------------------------------- q95
    // SemDeDup semantic dedup (Abbas et al. 2023): k-means cells from the
    // bounded-sample IVF fit, near-dup pairs searched within cells only
    // (Σ|cell|², never |corpus|²), greedy keep-smallest-id. FULL value
    // oracle since round 4 via the {CENT16_100K} centroid literals;
    // SimilaritySpec additionally pins the no-kept-pair-above-threshold
    // invariant and the collapse of near-identical clusters.
    QuerySpec(
      "q95_semdedup",
      (s, d) =>
        graft.ops.Similarity.semDeDupWith(
            T.embeddings(s, d), "vec_id", "embedding",
            threshold = 0.9, Fits.ivfCentroids(s, d, 16, 100000))
          .orderBy(col("doc_id")),
      Some(s"""WITH $embCte, $nrmCte, ${centCte("CENT16_100K")}, $cscoreCte,
        ccell AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
          FROM cscore) WHERE rn = 1),
        pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
          FROM ccell a JOIN ccell b
            ON a.cell = b.cell AND a.vec_id < b.vec_id),
        dropped AS (SELECT DISTINCT b_id FROM pairs
            JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
            JOIN nrm na ON na.vec_id = a_id JOIN nrm nb ON nb.vec_id = b_id
          WHERE list_sum(list_transform(list_zip(ea.v, eb.v), x -> x[1] * x[2]))
              / (na.n * nb.n) >= ${dbl("0.9")})
        SELECT c.vec_id AS doc_id, CAST(c.cell AS BIGINT) AS cell,
          dr.b_id IS NULL AS kept
        FROM ccell c LEFT JOIN dropped dr ON dr.b_id = c.vec_id
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q96
    // Bigram-LM fluency (Text.bigramLogProbs): the order-2 upgrade of
    // q71 — scrambled or templated text keeps its unigram score but
    // collapses on never-seen transitions. Add-0.5 smoothing over the
    // corpus's own bigram table; c(w1·) derived from the bigram counts,
    // V from the unigram vocab. Same exchange discipline as q71 (scored
    // table broadcast back; the corpus stream's only shuffle is the
    // per-doc agg). Round-6 average, full value oracle.
    QuerySpec(
      "q96_bigram_logprob",
      (s, d) =>
        graft.ops.Text.bigramLogProbs(T.documents(s, d), "doc_id", "text")
          .select(col("doc_id"), col("n_bigrams"),
            round(col("avg_logprob"), 6).as("avg_logprob"))
          .orderBy(col("doc_id")),
      Some(s"""WITH $tokCte,
        bi AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
          FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                FROM toks WHERE len(t) >= 2)),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
        c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT tok) AS v
              FROM (SELECT unnest(t) AS tok FROM toks)),
        sc AS (SELECT c2.w1, c2.w2,
            log2((${dbl("c2.c2")} + 0.5) / (${dbl("c1.c1")} + 0.5 * ${dbl("v.v")})) AS logp
          FROM c2 JOIN c1 USING (w1), v),
        per AS (SELECT bi.doc_id, COUNT(*) AS n_bigrams, AVG(sc.logp) AS alp
          FROM bi JOIN sc ON sc.w1 = bi.w1 AND sc.w2 = bi.w2
          GROUP BY bi.doc_id)
        SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
          ROUND(per.alp, 6) AS avg_logprob
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // ---------------------------------------------------------------- q97
    // Deterministic train/val/test split (Sampling.splitAssign 80/10/10):
    // the portable hash claims a point in [0, 2⁶⁰), cumulative ranges
    // label it — disjoint, exhaustive, partition-independent, and STABLE
    // under corpus growth (a doc's split never changes across versions,
    // so eval sets stay honest). Pure projection: no shuffle.
    QuerySpec(
      "q97_train_val_test",
      (s, d) =>
        graft.ops.Sampling.splitAssign(T.documents(s, d), "doc_id",
            Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
          .select(col("doc_id"), col("split"))
          .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
          CASE WHEN ${h60("'split|' || doc_id")}
                 < ${graft.ops.Sampling.cutoff(0.8)} THEN 'train'
               WHEN ${h60("'split|' || doc_id")}
                 < ${graft.ops.Sampling.cutoff(0.9)} THEN 'val'
               ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q100
    // Overlapping-window chunking (Text.chunk): docs → 64-token chunks
    // with 16-token overlap, the doc→training/RAG unit splitter. Pure
    // per-row explode (no shuffle); (doc_id, chunk_idx) ids are
    // partition-independent, so embeddings computed later join back
    // exactly. Full value oracle down to the rejoined chunk text.
    QuerySpec(
      "q100_chunking",
      (s, d) =>
        graft.ops.Text.chunk(T.documents(s, d), "doc_id", "text",
            chunkTokens = 64, overlap = 16)
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some(s"""WITH $tokCte,
        st AS (SELECT doc_id, t,
            unnest(generate_series(1, greatest(len(t) - 16, 1), 48)) AS s
          FROM toks),
        c AS (SELECT doc_id, CAST((s - 1) / 48 AS BIGINT) AS chunk_idx,
            t[s : s + 63] AS ck FROM st)
        SELECT doc_id, chunk_idx,
          CAST(len(ck) AS BIGINT) AS chunk_tokens,
          array_to_string(ck, ' ') AS chunk
        FROM c ORDER BY doc_id, chunk_idx""")),

    // ---------------------------------------------------------------- q101
    // Chunk → pack composition: q100's overlapping chunks packed into
    // 512-token training sequences per language (q50's cumulative-sum
    // bin assignment over deterministic (doc_id, chunk_idx) order). The
    // whole doc→chunk→sequence path a tokenizer feeds from, as ONE
    // hash-checked plan: the chunk explode is shuffle-free and the only
    // exchange is the per-language packing window.
    QuerySpec(
      "q101_chunk_pack",
      (s, d) => {
        val docs = T.documents(s, d)
        val chunks = graft.ops.Text.chunk(docs, "doc_id", "text",
            chunkTokens = 64, overlap = 16)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .withColumn("ord",
            col("doc_id") * 1000000L + col("chunk_idx"))
        graft.ops.Sampling.packSequences(chunks, "lang", "ord",
            "chunk_tokens", budget = 512L)
          .select(col("doc_id"), col("chunk_idx"), col("lang"),
            col("chunk_tokens"), col("seq_id"), col("seq_offset"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""WITH $tokCte,
        st AS (SELECT doc_id, t,
            unnest(generate_series(1, greatest(len(t) - 16, 1), 48)) AS s
          FROM toks),
        c AS (SELECT doc_id, CAST((s - 1) / 48 AS BIGINT) AS chunk_idx,
            CAST(len(t[s : s + 63]) AS BIGINT) AS chunk_tokens FROM st),
        j AS (SELECT c.doc_id, c.chunk_idx, d.lang, c.chunk_tokens,
            c.doc_id * 1000000 + c.chunk_idx AS ord
          FROM c JOIN documents d ON d.doc_id = c.doc_id),
        w AS (SELECT doc_id, chunk_idx, lang, chunk_tokens,
            CAST(SUM(chunk_tokens) OVER (PARTITION BY lang ORDER BY ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM j)
        SELECT doc_id, chunk_idx, lang, chunk_tokens,
          CAST(floor((cum - chunk_tokens) / 512) AS BIGINT) AS seq_id,
          (cum - chunk_tokens) % 512 AS seq_offset
        FROM w ORDER BY doc_id, chunk_idx"""),
      headline = true),

    // ---------------------------------------------------------------- q98
    // The END-TO-END corpus build (ops.Curate.buildCorpus): quality →
    // entropy → fluency → near-dup → decontamination gates with pinned
    // precedence, per-doc audit verdicts, and a growth-stable split for
    // survivors — every screening family of this library composed into
    // the one query a training-data team ships. Docs 0-24 stand in for
    // the benchmark (q49's convention); the oracle replays all five
    // gates and the split assignment, so the COMPOSITION is
    // hash-checked, not just the parts.
    QuerySpec(
      "q98_corpus_build",
      (s, d) => {
        val docs = T.documents(s, d)
        graft.ops.Curate.buildCorpus(
            docs.filter(col("doc_id") >= 25), "doc_id", "text",
            docs.filter(col("doc_id") < 25))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $tokCte, ${shingleCte(3)},
        $baseCte,
        ${qualCte()},
        ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
               FROM documents WHERE doc_id >= 25),
        ent AS (SELECT doc_id, entropy(c) AS en FROM ch GROUP BY doc_id),
        u AS (SELECT doc_id, unnest(t) AS tok FROM toks WHERE doc_id >= 25),
        f AS (SELECT tok, COUNT(*) AS cnt FROM u GROUP BY tok),
        tot AS (SELECT SUM(cnt) AS total FROM f),
        lp AS (SELECT f.tok, log2(${dbl("f.cnt")} / ${dbl("tot.total")}) AS logp
               FROM f, tot),
        per AS (SELECT u.doc_id, AVG(lp.logp) AS alp
                FROM u JOIN lp USING (tok) GROUP BY u.doc_id),
        e AS (SELECT doc_id, unnest(hs) AS h FROM sh WHERE doc_id >= 25),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM e GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                   FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b FROM common
                  JOIN sizes sa ON sa.doc_id = id_a
                  JOIN sizes sb ON sb.doc_id = id_b
                  WHERE ${dbl("c")} / ${dbl("(sa.n + sb.n - c)")} >= ${dbl("0.5")}),
        dup AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
        bsh AS (SELECT doc_id AS bench_id, unnest(hs) AS h FROM sh
                WHERE doc_id < 25),
        bs AS (SELECT bench_id, COUNT(*) AS n_bench FROM bsh GROUP BY bench_id),
        cm AS (SELECT e.doc_id, bsh.bench_id, COUNT(*) AS n_common
               FROM e JOIN bsh ON e.h = bsh.h GROUP BY 1, 2),
        contam AS (SELECT DISTINCT cm.doc_id FROM cm JOIN bs USING (bench_id)
                   WHERE ${dbl("n_common")} / ${dbl("n_bench")} >= ${dbl("0.5")}),
        verdict AS (SELECT d.doc_id,
            CASE WHEN q.quality < ${dbl("0.8")} THEN 'quality'
                 WHEN ROUND(COALESCE(ent.en, 0.0), 6) < 3.8 THEN 'entropy'
                 WHEN per.alp IS NULL OR ROUND(per.alp, 6) < -5.0 THEN 'fluency'
                 WHEN dup.doc_id IS NOT NULL THEN 'near_dup'
                 WHEN contam.doc_id IS NOT NULL THEN 'contaminated'
            END AS reason
          FROM documents d
          JOIN qual q ON q.doc_id = d.doc_id
          LEFT JOIN ent ON ent.doc_id = d.doc_id
          LEFT JOIN per ON per.doc_id = d.doc_id
          LEFT JOIN dup ON dup.doc_id = d.doc_id
          LEFT JOIN contam ON contam.doc_id = d.doc_id
          WHERE d.doc_id >= 25)
        SELECT doc_id, reason IS NULL AS kept, reason,
          CASE WHEN reason IS NOT NULL THEN NULL
               WHEN ${h60("'split|' || doc_id")}
                 < ${graft.ops.Sampling.cutoff(0.8)} THEN 'train'
               WHEN ${h60("'split|' || doc_id")}
                 < ${graft.ops.Sampling.cutoff(0.9)} THEN 'val'
               ELSE 'test' END AS split
        FROM verdict ORDER BY doc_id"""),
      headline = true)
  )
}
