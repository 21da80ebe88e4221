package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Par, Sampling, Text}

/** Interleaved same-JVM A/B of QUERY FORMS (the ConfProbe discipline
  * applied to code shapes instead of configs): times the round-17
  * window/self-join n-gram forms against the round-18 bucket forms on the
  * SAME fused shingle index, alternating arms per rep so one-sided host
  * stalls hit both equally. Verdict r18 mandated this measurement — the
  * driver's r18 capture read q46 at 0.44× in a demonstrably contended
  * window, so the bucket restructure's sf0.1 wall-clock was unproven.
  *
  * Both arms are built HERE, off every query path (the library keeps one
  * implementation); `--check` first proves the arms produce identical
  * sorted results before any timing.
  *
  * Usage: runMain graft.FormProbe [reps] [q46,q98]
  */
object FormProbe {

  /** Round-17 ngramJaccardPairsOnIndex: window df-cap + posting self-join
    * + two per-id size aggregates (4 references to the index subtree). */
  private def oldJaccardPairs(sh: DataFrame, threshold: Double,
      maxShingleDocFreq: Long = 1000000L): DataFrame = {
    val filtered = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= maxShingleDocFreq).drop("df")
    val sizes = filtered.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val common = filtered.as("a")
      .join(filtered.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("common"), col("jaccard"))
  }

  /** Round-17 benchmarkContaminationOnIndex: window df-cap + h-join. */
  private def oldContamination(docIndex: DataFrame, benchIndex: DataFrame,
      minContainment: Double = 0.5,
      maxShingleDocFreq: Long = 1000000L): DataFrame = {
    val d = docIndex
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("df") <= maxShingleDocFreq).drop("df")
    val b = benchIndex
    val benchSizes = b.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_bench"))
    d.join(b, Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
      .join(benchSizes, Seq("bench_id"))
      .withColumn("containment",
        col("n_common").cast("double") / col("n_bench").cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("doc_id"), col("bench_id"), col("n_common"),
        col("containment"))
  }

  /** Round-17 buildCorpus: independent subtrees per gate (tokenize per
    * gate, no persists, no priming count) — but on the SAME fused
    * shingle-hash expression as the current form, so the A/B isolates
    * the bucket/persist restructure, not the round-18 codegen fusion. */
  private def oldBuildCorpus(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val base = Par.fanOut(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
    val sig = base.select(col("doc_id"),
      Text.qualityScore(col("text")).as("quality"),
      round(Text.byteEntropy(col("text")), 6).as("entropy"))
    val flu = Text.unigramLogProbs(base, "doc_id", "text")
      .select(col("doc_id"), round(col("avg_logprob"), 6).as("alp"))
    val dup = oldJaccardPairs(
        Dedup.shingleIndex(base, "doc_id", "text", shingleN = 3),
        threshold = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("is_dup", lit(true))
    val contam = oldContamination(
        Dedup.shingleIndex(base, "doc_id", "text", shingleN = 3,
          as = "doc_id"),
        Dedup.shingleIndex(bench, "doc_id", "text", shingleN = 3,
          as = "bench_id"),
        minContainment = 0.5)
      .select(col("doc_id")).distinct()
      .withColumn("is_contam", lit(true))
    val reason = when(col("quality") < 0.8, "quality")
      .when(col("entropy") < 3.8, "entropy")
      .when(col("alp").isNull || col("alp") < -5.0, "fluency")
      .when(col("is_dup"), "near_dup")
      .when(col("is_contam"), "contaminated")
    Sampling.splitAssign(sig, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .join(flu, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("reason", reason)
      .select(col("doc_id"), col("reason").isNull.as("kept"), col("reason"),
        when(col("reason").isNull, col("split")).as("split"))
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 6
    val names = if (args.length > 1) args(1).split(",").toSet
                else Set("q46", "q98")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-formprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.Tables.documents(spark, sfDir)

    // q46 shape (TrainingData.q46_curation) with a pluggable pair form
    def q46Of(pairs: DataFrame => DataFrame): DataFrame = {
      val d = docs
      val kept = d.filter(Text.qualityScore(col("text")) >= 0.8 &&
        Text.tokenCount(col("text")) >= 10)
      val dupIds = pairs(d)
        .select(col("id_b").as("doc_id")).distinct()
      kept.join(dupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }
    val q46New = () => q46Of(d =>
      Dedup.ngramJaccardPairs(d, "doc_id", "text", shingleN = 3,
        threshold = 0.5))
    val q46Old = () => q46Of(d =>
      oldJaccardPairs(Dedup.shingleIndex(d, "doc_id", "text", shingleN = 3),
        threshold = 0.5))

    // q98 shape (TrainingData.q98_corpus_build)
    val q98New = () => graft.ops.Curate.buildCorpus(
        docs.filter(col("doc_id") >= 25), "doc_id", "text",
        docs.filter(col("doc_id") < 25))
      .orderBy(col("doc_id"))
    val q98Old = () => oldBuildCorpus(
        docs.filter(col("doc_id") >= 25), "doc_id", "text",
        docs.filter(col("doc_id") < 25))
      .orderBy(col("doc_id"))

    val probes: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q46_curation", q46Old, q46New),
      ("q98_corpus_build", q98Old, q98New)
    ).filter(p => names.exists(n => p._1.startsWith(n)))

    probes.foreach { case (name, oldF, newF) =>
      // arms must agree before timing means anything
      spark.catalog.clearCache()
      val a = oldF().collect().map(_.toString).sorted
      spark.catalog.clearCache()
      val b = newF().collect().map(_.toString).sorted
      require(a.sameElements(b),
        s"$name: old and new forms DISAGREE (${a.length} vs ${b.length} rows)")
      println(s"[formprobe] $name arms agree: ${a.length} rows")

      // warm both plans (codegen differs per shape)
      Seq(oldF, newF).foreach { f =>
        spark.catalog.clearCache()
        f().write.mode("overwrite").format("noop").save()
      }
      val times = Array.fill(2)(List.empty[Double])
      (1 to reps).foreach { _ =>
        Seq(0, 1).foreach { arm =>
          spark.catalog.clearCache()
          val f = if (arm == 0) oldF else newF
          val t0 = System.nanoTime()
          f().write.mode("overwrite").format("noop").save()
          times(arm) = ((System.nanoTime() - t0) / 1e9) :: times(arm)
        }
      }
      val o = times(0).min; val n = times(1).min
      println(f"[formprobe] $name%-18s old=$o%.3f new=$n%.3f " +
        f"ratio(new/old)=${n / o}%.3f  " +
        f"oldReps=${times(0).reverse.map(t => f"$t%.2f").mkString(",")}  " +
        f"newReps=${times(1).reverse.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
