package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.when

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("hash sample: identical subset under re-runs and repartitioning") {
    val df = (1L to 1000L).toDF("id")
    val a = ids(Sampling.hashSample(df, "id", 0.5, "s1"))
    val b = ids(Sampling.hashSample(df.repartition(13), "id", 0.5, "s1"))
    assert(a === b) // rng-based sample() fails exactly this
    assert(a.size > 400 && a.size < 600, s"rate off: ${a.size}/1000")
  }

  test("hash sample: different salts draw independent subsets") {
    val df = (1L to 1000L).toDF("id")
    val a = ids(Sampling.hashSample(df, "id", 0.5, "s1"))
    val b = ids(Sampling.hashSample(df, "id", 0.5, "s2"))
    assert(a !== b)
    // independence: overlap ≈ 0.25 ± noise
    val overlap = (a & b).size.toDouble / 1000
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap")
  }

  test("hash sample: edge fractions keep nothing / everything") {
    val df = (1L to 100L).toDF("id")
    assert(Sampling.hashSample(df, "id", 0.0).count() === 0)
    assert(Sampling.hashSample(df, "id", 1.0).count() === 100)
  }

  test("hash sample: nested — raising the fraction only ADDS rows") {
    val df = (1L to 1000L).toDF("id")
    val s20 = ids(Sampling.hashSample(df, "id", 0.2, "recipe"))
    val s50 = ids(Sampling.hashSample(df, "id", 0.5, "recipe"))
    val s90 = ids(Sampling.hashSample(df, "id", 0.9, "recipe"))
    assert(s20.subsetOf(s50) && s50.subsetOf(s90))
  }

  test("packSequences: per-group bins by cumulative budget, stable under partitioning") {
    val docs = Seq(
      (1L, "en", 300L), (2L, "en", 300L), (3L, "en", 100L), (4L, "en", 200L),
      (10L, "de", 600L), (11L, "de", 100L))
      .toDF("doc_id", "lang", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, "lang", "doc_id", "n_tokens", budget = 512L)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))).toMap
    val bins = run(docs)
    // en: offsets 0,300,600,700 → bins 0,0,1,1 ; de: 0,600 → bins 0,1
    assert(bins(1L) === (0L, 0L))
    assert(bins(2L) === (0L, 300L))
    assert(bins(3L) === (1L, 88L))   // 600 % 512
    assert(bins(4L) === (1L, 188L))
    assert(bins(10L) === (0L, 0L))
    assert(bins(11L) === (1L, 88L))  // de packs independently of en
    assert(run(docs.repartition(7)) === bins)
  }

  test("weightedSample: deterministic, size-bounded, weight-proportional") {
    val docs = (1L to 2000L)
      .map(i => (i, if (i <= 1000) 1.0 else 10.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(docs, "id", "w", k = 200, salt = "t")
    val s2 = Sampling.weightedSample(docs.repartition(13), "id", "w", k = 200, salt = "t")
    val ids1 = s1.select("id").as[Long].collect().sorted
    assert(ids1.length === 200)
    assert(ids1.toSeq === s2.select("id").as[Long].collect().sorted.toSeq,
      "sample must not depend on partitioning")
    // 10×-weighted half must dominate the sample (expected ~91% of picks)
    val heavy = ids1.count(_ > 1000L)
    assert(heavy > 150, s"heavy-weight docs under-sampled: $heavy/200")
    // zero/negative weights are never sampled
    val withZero = docs.withColumn("w", when($"id" === 1L, -1.0).otherwise($"w"))
    assert(!Sampling.weightedSample(withZero, "id", "w", 2000, "t")
      .select("id").as[Long].collect().contains(1L))
  }

  test("stratifiedSample: exactly k per group, deterministic, WindowGroupLimit plan") {
    val docs = (1L to 900L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val s1 = Sampling.stratifiedSample(docs, "id", "src", k = 7, salt = "x")
    val perGroup = s1.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.toSeq === Seq(7L, 7L, 7L))
    // stable under partitioning
    val s2 = Sampling.stratifiedSample(docs.repartition(11), "id", "src", 7, "x")
    assert(ids(s1) === ids(s2))
    // a group smaller than k returns whole
    val tiny = Sampling.stratifiedSample(docs.filter($"id" <= 2), "id", "src", 7, "x")
    assert(tiny.count() === 2)
    // the rank filter pushes into WindowGroupLimit (bounded pre-shuffle)
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val plan = s1.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    assert(plan.collect { case w: WindowGroupLimitExec => w }.size >= 2)
  }

  test("mixSources: per-source rates and tags, stable union") {
    val web = (1L to 1000L).toDF("id")
    val code = (2000L to 2999L).toDF("id")
    val mixed = Sampling.mixSources(
      Seq(("web", web, 0.3), ("code", code, 0.8)), "id")
    val bySource = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("web") > 230 && bySource("web") < 370, s"$bySource")
    assert(bySource("code") > 720 && bySource("code") < 880, s"$bySource")
    // re-running reproduces the exact mixture
    val again = Sampling.mixSources(
      Seq(("web", web, 0.3), ("code", code, 0.8)), "id")
    assert(ids(mixed) === ids(again))
  }

  test("splitAssign: disjoint+exhaustive, ~proportional, stable under growth") {
    import spark.implicits._
    val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val small = spark.range(1000).select($"id".cast("string").as("k"))
    val big = spark.range(5000).select($"id".cast("string").as("k"))
    val s1 = Sampling.splitAssign(small, "k", w)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // exhaustive: every row labeled with a declared split
    assert(s1.size === 1000 && s1.values.toSet.subsetOf(w.map(_._1).toSet))
    // roughly proportional
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 740 && counts("train") < 860, counts.toString)
    assert(counts("val") > 55 && counts("val") < 150, counts.toString)
    // growth-stable: the same key keeps its split in the larger corpus
    val s2 = Sampling.splitAssign(big, "k", w)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    s1.foreach { case (k, v) => assert(s2(k) === v, s"key $k moved") }
    // weights must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(small, "k", Seq(("a", 0.5), ("b", 0.1)))
    }
  }
}
