package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens and counts handle empties and runs of whitespace") {
    val r = one("  the  quick\nbrown fox  ")
      .select(Text.tokenCount($"text"), Text.bpeIshCount($"text")).head()
    assert(r.getLong(0) === 4)
    assert(r.getLong(1) === 4)
    assert(one("").select(Text.tokenCount($"text")).head().getLong(0) === 0)
  }

  test("bpe-ish segmentation splits digits and punctuation") {
    val r = one("hello42, world!").select(Text.bpeIshCount($"text")).head()
    // hello / 4 / 2 / , / world / !
    assert(r.getLong(0) === 6)
  }

  test("PII: detect and redact emails, phones, IPv4 — clean text untouched") {
    val dirty = "mail bob.smith+x@example.co.uk or call 503-555-0199, server 10.0.0.1 ok"
    val r = one(dirty).select(
      Text.piiCount($"text", Text.EmailRe).as("e"),
      Text.piiCount($"text", Text.PhoneRe).as("p"),
      Text.piiCount($"text", Text.Ipv4Re).as("i"),
      Text.piiRedact($"text").as("red")).head()
    assert(r.getAs[Long]("e") === 1L)
    assert(r.getAs[Long]("p") === 1L)
    assert(r.getAs[Long]("i") === 1L)
    val red = r.getAs[String]("red")
    assert(red === "mail <EMAIL> or call <PHONE>, server <IP> ok")
    val clean = "the quick brown fox at version two point one"
    assert(one(clean).select(Text.piiRedact($"text")).head().getString(0) === clean)
  }

  test("repetition: duplicate lines and dominant bigrams are flagged") {
    val boiler = "menu home\nmenu home\nmenu home\nreal content line"
    val dup = one(boiler).select(Text.duplicateLineRatio($"text")).head().getDouble(0)
    assert(dup === 0.5) // 4 lines, 2 distinct → (4-2)/4
    assert(one("a\nb\nc").select(Text.duplicateLineRatio($"text")).head().getDouble(0) === 0.0)
    val spam = "buy now " * 10 + "unique tail"          // "buy now"/"now buy" dominate
    val ratios = Seq(spam, "all words here are fully distinct tokens")
      .toDF("text")
      .select(Text.tokens($"text").as("toks"))
      .select(Text.shinglesOf($"toks", 2).as("sh2"))
      .select(Text.topBigramRatio($"sh2").as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios(0) > 0.4)  // templated text
    assert(ratios(1) < 0.2)  // natural text
    assert(one("").select(Text.duplicateLineRatio($"text")).head().getDouble(0) === 0.0)
  }

  test("topBigramRatios aggregate form ≡ the per-row Column form") {
    val docs = Seq(
      (1L, "buy now " * 10 + "unique tail"),
      (2L, "all words here are fully distinct tokens"),
      (3L, "one"),             // < 2 tokens → no bigrams
      (4L, ""))
      .toDF("doc_id", "text")
    val withToks = docs.select($"doc_id", $"text", Text.tokens($"text").as("toks"))
    val agg = Text.topBigramRatios(withToks, "doc_id", "toks")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val colForm = withToks
      .select($"doc_id", Text.shinglesOf($"toks", 2).as("sh2"))
      .select($"doc_id", Text.topBigramRatio($"sh2").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(agg(1L) === colForm(1L))
    assert(agg(2L) === colForm(2L))
    assert(!agg.contains(3L) && colForm(3L) === 0.0) // absent ≙ coalesce(0.0)
    assert(!agg.contains(4L) && colForm(4L) === 0.0)
  }

  test("quality score is bounded and orders sensibly") {
    val good = "the cat sat on the mat and it is a good day to walk in the park " * 3
    val bad = "@@ ## !! %% ^^"
    val q = Seq(good, bad).toDF("text")
      .select(Text.qualityScore($"text").as("q")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("language id discriminates marker-heavy text, ties break to list order") {
    val rows = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist ein tier",
      "le chat et les chiens est la",
      "el perro y los gatos es un animal",
      "xyzzy plugh")
    val got = rows.toDF("text").select(Text.langId($"text")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "de", "fr", "es", "en"))
  }

  test("shingles: sliding windows, short docs yield none") {
    val r = one("a b c d").select(Text.shingles($"text", 3)).head().getSeq[String](0)
    assert(r === Seq("a b c", "b c d"))
    assert(one("a b").select(Text.shingles($"text", 3)).head().getSeq[String](0).isEmpty)
  }

  test("fingerprint: equal text equal hash, different text different hash") {
    val r = Seq("abc", "abc", "abd").toDF("text")
      .select(Text.fingerprint($"text")).collect().map(_.getLong(0))
    assert(r(0) === r(1))
    assert(r(0) !== r(2))
    assert(r.forall(_ >= 0L)) // 60-bit, never negative
  }

  test("sourceDrift: corpus-identical source ≈ 0, alien source ≫, JSD ∈ [0,1]") {
    // two sources with the SAME distribution, one with a disjoint vocab
    val docs = (Seq.fill(10)(("a", "x y z")) ++ Seq.fill(10)(("b", "x y z")) ++
      Seq.fill(10)(("c", "q r s"))).toDF("source", "text")
    val got = Text.sourceDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === Set("a", "b", "c"))
    got.values.foreach(v => assert(v >= 0.0 && v <= 1.0, s"JSD $v out of range"))
    assert(got("a") === got("b")) // same distribution → same drift
    assert(got("c") > got("a") + 0.2, s"alien source not flagged: $got")
    // n_tokens carried through
    val n = Text.sourceDrift(docs, "source", "text")
      .filter($"source" === "a").head().getLong(1)
    assert(n === 30L)
  }

  test("chunk: overlap coverage, short and empty docs, stable ids") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "just five little tokens here"),            // < chunk size
      (3L, "")                                          // empty
    ).toDF("doc_id", "text")
    val out = Text.chunk(docs, "doc_id", "text", chunkTokens = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts at 1 and 49: chunks of 64 and 52 tokens, sharing 16
    assert(d1.map(c => (c._2, c._3)).toSeq === Seq((0L, 64L), (1L, 52L)))
    assert(d1(0)._4.endsWith("w64") && d1(1)._4.startsWith("w49"))
    // every token appears in some chunk
    assert(d1.flatMap(_._4.split(" ")).toSet.size === 100)
    // short doc: exactly one whole chunk; empty doc: one empty chunk
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 5L,
      "just five little tokens here")))
    assert(out.filter(_._1 == 3L).toSeq === Seq((3L, 0L, 0L, "")))
  }

  test("bigramLogProbs: word salad collapses where unigram LM can't see it") {
    // same unigram multiset per doc — the natural docs repeat the
    // transition "the cat sat", the salad uses the same words with
    // never-repeated transitions
    val natural = "the cat sat the cat sat the cat sat"
    val salad   = "the the the cat cat cat sat sat sat"
    val docs = (Seq.fill(9)((1L, natural)) :+ (2L, salad))
      .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val uni = Text.unigramLogProbs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val big = Text.bigramLogProbs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // unigram: identical multisets → identical scores
    assert(math.abs(uni(9L) - uni(0L)) < 1e-9)
    // bigram: the salad's transitions are (near-)unseen → clearly lower
    assert(big(9L) < big(0L) - 1.0, s"salad ${big(9L)} vs natural ${big(0L)}")
    // short doc: no bigrams, null score
    val short = Seq((0L, "one")).toDF("doc_id", "text")
    val r = Text.bigramLogProbs(short, "doc_id", "text").head()
    assert(r.getLong(1) === 0L && r.isNullAt(2))
  }
}
