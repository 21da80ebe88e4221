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
}
