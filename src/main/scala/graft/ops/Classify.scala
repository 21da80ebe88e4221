package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.{HashingTF, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Model-based quality filtering — the learned half of the curation gate.
  *
  * The rule-based [[Text.qualityScore]] is the cheap screen; production
  * pipelines then train a lightweight classifier (fasttext-style: hashed
  * bag-of-words → linear model) on weak labels and keep documents the model
  * scores as high-quality. This module is that loop on Spark ML:
  *
  *  - features: `HashingTF` over whitespace tokens (the hashing trick —
  *    feature width is FIXED at `numFeatures`, independent of vocabulary,
  *    so driver/executor memory is bounded at any corpus size) plus the
  *    dense per-doc stats the rules use (token count, stopword ratio,
  *    punctuation ratio);
  *  - model: logistic regression via L-BFGS — each iteration is one
  *    `treeAggregate` pass over the corpus (gradient partial-aggregated
  *    map-side), and the driver holds only the `numFeatures`-wide
  *    coefficient vector. No per-row UDF at scoring time beyond the ML
  *    transform itself.
  *
  * Train/score split is a deterministic [[PortableHash]] cutoff so the
  * held-out set is reproducible across engines and partitionings.
  * Model predictions are floating-point (treeAggregate merge order moves
  * coefficients at ~1e-15), so classifier queries register rows-only;
  * ClassifySpec pins ranking quality (AUC) instead of exact values.
  */
object Classify {

  /** Weak-label + feature frame: `label` = 1.0 when the rule-based quality
    * score clears `labelThreshold`, plus the token/stat features. */
  def labeledFeatures(docs: DataFrame, idCol: String, textCol: String,
      labelThreshold: Double = 0.7): DataFrame = {
    val toked = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("toks"),
      Text.qualityScore(col(textCol)).as("quality"),
      Text.tokenCount(col(textCol)).cast("double").as("f_len"),
      (length(regexp_replace(col(textCol), lit("[A-Za-z0-9\\s]"), lit("")))
        .cast("double") /
        greatest(length(col(textCol)), lit(1)).cast("double")).as("f_punct"))
    toked.withColumn("label",
      when(col("quality") >= labelThreshold, 1.0).otherwise(0.0))
  }

  /** Train on a deterministic `trainFrac` hash split of the corpus. */
  def train(labeled: DataFrame, numFeatures: Int = 1 << 12,
      trainFrac: Double = 0.7): LogisticRegressionModel = {
    val cut = Sampling.cutoff(trainFrac)
    val train = labeled
      .filter(PortableHash.md5Long(col("doc_id"), "clfsplit") < cut)
    val feat = featurize(train, numFeatures)
    new LogisticRegression()
      .setMaxIter(25).setRegParam(1e-3).setTol(1e-7)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(feat)
  }

  /** Score every doc: P(high quality) + the hard keep/drop call. */
  def score(model: LogisticRegressionModel, labeled: DataFrame,
      numFeatures: Int = 1 << 12): DataFrame =
    model.transform(featurize(labeled, numFeatures))
      .select(col("doc_id"), col("label"),
        vector_to_array(col("probability")).getItem(1).as("p_high"),
        col("prediction").cast("long").as("pred"))

  /** Hashed bag-of-words + dense stats, assembled for Spark ML. */
  private def featurize(labeled: DataFrame, numFeatures: Int): DataFrame = {
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    new VectorAssembler()
      .setInputCols(Array("tf", "f_len", "f_punct"))
      .setOutputCol("features")
      .transform(tf.transform(labeled))
  }

  /** End-to-end: weak-label, train on the hash split, score everything.
    * `heldOutOnly` restricts output to docs the model never saw. */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
      labelThreshold: Double = 0.7, numFeatures: Int = 1 << 12,
      trainFrac: Double = 0.7, heldOutOnly: Boolean = false): DataFrame = {
    val labeled = labeledFeatures(docs, idCol, textCol, labelThreshold)
    val model = train(labeled, numFeatures, trainFrac)
    val cut = Sampling.cutoff(trainFrac)
    val target =
      if (heldOutOnly)
        labeled.filter(PortableHash.md5Long(col("doc_id"), "clfsplit") >= cut)
      else labeled
    score(model, target, numFeatures)
  }
}
