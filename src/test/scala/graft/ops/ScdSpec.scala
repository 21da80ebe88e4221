package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ScdSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatest bridge in the
    * offline cache) — same idiom as PropertySpec. */
  private def forAllSampled[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen(Gen.Parameters.default, Seed(i.toLong * 7919)).get)
    }

  private def log(rows: (Int, String, Long, Long)*) =
    rows.toDF("k", "v", "us", "id")
      .select($"k", $"v", timestamp_micros($"us").as("ts"), $"id")

  private def collectHist(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"v", $"valid_from_us", $"valid_to_us", $"n_events")
      .as[(Int, String, Long, Option[Long], Long)].collect().toSet

  test("historize: consecutive equal values collapse; open run has null end") {
    val hist = Scd.historize(
      log((1, "a", 100L, 1L), (1, "a", 200L, 2L), (1, "b", 300L, 3L),
        (1, "a", 400L, 4L), (2, "x", 50L, 5L)),
      "k", "v", "ts", "id")
    assert(collectHist(hist) === Set(
      (1, "a", 100L, Some(300L), 2L),
      (1, "b", 300L, Some(400L), 1L),
      (1, "a", 400L, None, 1L),
      (2, "x", 50L, None, 1L)))
  }

  test("historize: equal-timestamp boundary stays deterministic (tie order)") {
    // two different values at the same micro: run order = tie column, and
    // the interval close must follow segment order, not the (tied) start
    val hist = Scd.historize(
      log((1, "a", 100L, 1L), (1, "b", 100L, 2L), (1, "b", 200L, 3L)),
      "k", "v", "ts", "id")
    assert(collectHist(hist) === Set(
      (1, "a", 100L, Some(100L), 1L),
      (1, "b", 100L, None, 2L)))
  }

  test("historize: result independent of partitioning") {
    val l = log((1, "a", 100L, 1L), (1, "b", 300L, 3L), (1, "a", 400L, 4L))
    assert(collectHist(Scd.historize(l.repartition(8), "k", "v", "ts", "id"))
      === collectHist(Scd.historize(l.coalesce(1), "k", "v", "ts", "id")))
  }

  test("merge ≡ historize of the union (property over random change logs)") {
    val rowGen = Gen.zip(
      Gen.choose(1, 3), Gen.oneOf("a", "b", "c"), Gen.choose(1L, 20L))
    forAllSampled(Gen.listOfN(24, rowGen)) { raw =>
      // unique tie ids in arrival order; batch must be at-or-after each
      // key's open start, so split by TIME: first 2/3 of the clock is the
      // base log, the rest is the batch
      val rows = raw.zipWithIndex.map { case ((k, v, t), i) =>
        (k, v, t * 100L, i.toLong)
      }
      val (base, batch) = rows.partition(_._3 <= 1400L)
      if (base.nonEmpty && batch.nonEmpty) {
        val full = collectHist(Scd.historize(log(rows: _*), "k", "v", "ts", "id"))
        val merged = collectHist(Scd.merge(
          Scd.historize(log(base: _*), "k", "v", "ts", "id"),
          log(batch: _*), "k", "v", "ts", "id"))
        assert(merged === full)
      }
    }
  }

  test("merge: one exchange for the re-segmented slice; closed rows untouched") {
    val base = log((1, "a", 100L, 1L), (1, "b", 300L, 2L))
    val hist = Scd.historize(base, "k", "v", "ts", "id")
    val merged = Scd.merge(hist, log((1, "b", 500L, 3L), (1, "c", 600L, 4L)),
      "k", "v", "ts", "id")
    assert(collectHist(merged) === Set(
      (1, "a", 100L, Some(300L), 1L),
      (1, "b", 300L, Some(600L), 2L),
      (1, "c", 600L, None, 1L)))
  }
}
