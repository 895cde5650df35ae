package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style linear quality classifier as MODEL-AS-DATA (beyond-
  * reference scope; rounds out the LLM text stack beside NgramLm's
  * bigram-LM and DSIR importance weights): a document scores as a linear
  * function of HASHED n-gram presence features (unigrams by default,
  * word n-grams via the `ngrams` knob, folded into a fixed bucket
  * space), with the weight vector living in a small
  * DataFrame a pipeline fits offline, parquets, broadcasts, and joins —
  * the same frozen-model discipline as [[graft.similarity.SparseSim.buildBm25Index]].
  * No UDF anywhere: hashing is the md5-prefix primitive (cross-engine
  * exact, the `Sampling.weightedSample` precedent), fitting is two
  * aggregations, scoring is join + sum.
  *
  * The fit is the log-count-ratio weighting (NB-SVM's feature half,
  * Wang–Manning 2012) plus a fitted max-margin threshold — a linear
  * model of exactly fastText's shape (w·x + b over hashed n-grams),
  * chosen because train AND calibrate are expressible as plain
  * relational algebra, so the ENTIRE pipeline is DuckDB-oracle-
  * checkable (q_quality_model).
  *
  * Determinism contract: stored weights are quantized to DECIMAL(18,6)
  * (absorbing the ≤2-ulp cross-engine `ln` spread at a 1e-6 grid where a
  * tie needs a ~1e-16 coincidence), so per-feature contributions and the
  * decimal score sum are bit-identical in any engine and any partitioning.
  *
  * Scale shape: fitting is one explode→groupBy over the train split
  * (map-side combining; feature space capped at `nBuckets`, so the
  * shuffle carries ≤ nBuckets×2 aggregate rows per map partition);
  * scoring broadcasts the ≤nBuckets-row weight table into the corpus
  * scan — the 100 TB corpus never shuffles to be scored, and the model
  * never grows with the corpus (hash folding caps it, fastText's own
  * trick).
  */
object QualityModel {

  /** Weights (feature: long, w: decimal(18,6)) + 1-row scalars
    * (w0: prior log-odds, tau: fitted decision threshold).
    */
  final case class LinearTextModel(weights: DataFrame, scalars: DataFrame)

  /** Hashed PRESENCE feature rows: (idCol, feature) — distinct hashed
    * buckets per document. Tokens (and word n-grams up to `ngrams`,
    * fastText's -wordNgrams knob) fold to `[0, nBuckets)` via the first
    * 8 md5 hex chars (uniform 32-bit, engine-portable); collisions
    * merge features identically everywhere — the hashing-trick
    * semantics, not a defect. BINARIZED on purpose (Bernoulli
    * presence, the Wang–Manning recommendation): tf-weighted scores
    * accumulate a per-token drift that scales with document length and
    * drowns sparse teacher signals — measured on the test corpus,
    * presence features rank-separate where tf features do not.
    */
  def featureRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int,
      ngrams: Int = 1): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val terms = (2 to ngrams).foldLeft(toks)((acc, n) =>
      concat(acc, graft.functions.GraftFunctions.wordShingles(toks, n)))
    docs
      .select(col(idCol), explode(terms).as("term"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"), lit(nBuckets))
          .as("feature"))
      .distinct()
  }

  /** Fit log-count-ratio weights (the NB-SVM / Wang–Manning feature
    * weighting) on a labeled train split:
    * {{{ w_f = ln( ((c_pos_f+α)/(c_neg_f+α)) · (t_neg/t_pos) ) }}}
    * — numerator-only smoothing, so a feature occurring proportionally
    * in both classes weighs ~0 REGARDLESS of doc length (classic
    * denominator smoothing `t+αB` leaves a per-token drift that scales
    * with document length and drowns sparse signals), while a
    * class-exclusive feature keeps its full log-ratio. Prior
    * `w0 = ln((n_pos+α)/(n_neg+α))`; then a CALIBRATION pass scores the
    * train split itself and stores `tau` = the max-margin midpoint
    * between the highest-scoring negative and lowest-scoring positive —
    * the fitted operating threshold real distillation pipelines pick on
    * dev data instead of assuming score 0 separates. All three
    * artifacts are DECIMAL(18,6)-quantized into the stored model.
    *
    * `label` must be a boolean column over `docs` (null ⇒ negative,
    * both engines' CASE semantics); both classes must be non-empty.
    */
  def fit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      label: Column,
      nBuckets: Int = 4096,
      alpha: Double = 0.5,
      ngrams: Int = 1): LinearTextModel = {
    val labeled = docs.select(col(idCol), label.cast("boolean").as("y"), col(textCol))
      .localCheckpoint(eager = false) // three consumers: features, prior, calibration
    val fr = featureRows(labeled, idCol, textCol, nBuckets, ngrams)
      .join(labeled.select(col(idCol), col("y")), Seq(idCol))
      .localCheckpoint(eager = false) // two consumers: weight fit + calibration
    val posTf = sum(when(col("y"), 1L).otherwise(0L))
    val negTf = sum(when(!col("y"), 1L).otherwise(0L))
    val cnt = fr.groupBy("feature").agg(posTf.as("c_pos"), negTf.as("c_neg"))
    val tot = fr.agg(posTf.as("t_pos"), negTf.as("t_neg"))
    val weights = cnt.crossJoin(broadcast(tot)).select(
      col("feature"),
      log(((col("c_pos") + lit(alpha)) / (col("c_neg") + lit(alpha))) *
        (col("t_neg").cast("double") / col("t_pos")))
        .cast("decimal(18,6)").as("w"))
      .localCheckpoint(eager = false) // two consumers: calibration + caller
    val w0 = log((sum(when(col("y"), 1L).otherwise(0L)) + lit(alpha)) /
      (sum(when(!col("y"), 1L).otherwise(0L)) + lit(alpha)))
      .cast("decimal(18,6)").as("w0")
    val prior = labeled.agg(w0)
    // Calibration: train-split scores in the just-fitted model.
    val trainScore = fr
      .join(broadcast(weights), Seq("feature"))
      .groupBy(col(idCol))
      .agg(sum(col("w").cast("decimal(28,6)")).as("s"))
    val sc = coalesce(col("s"), lit(0).cast("decimal(28,6)")) + col("w0")
    val scalars = labeled.select(col(idCol), col("y"))
      .join(trainScore, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .agg(
        first(col("w0")).as("w0"),
        ((min(when(col("y"), sc)) + max(when(!col("y"), sc)))
          .cast("double") * lit(0.5)).cast("decimal(18,6)").as("tau"))
    LinearTextModel(weights, scalars)
  }

  /** Score documents against a FROZEN model: features unseen at fit
    * time contribute 0 (they have no weight row), a featureless document
    * scores the bare prior — every input doc emits exactly one row.
    * Output: (idCol, n_feats, score, pred) with `score` the decimal-
    * exact w·x + w0 as a rounded double and `pred` = score > tau (the
    * fitted threshold, compared in exact decimals).
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: LinearTextModel,
      nBuckets: Int = 4096,
      ngrams: Int = 1): DataFrame = {
    val matched = featureRows(docs, idCol, textCol, nBuckets, ngrams)
      .join(broadcast(model.weights), Seq("feature"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_feats"),
        sum(col("w").cast("decimal(28,6)")).as("s"))
    val total = coalesce(col("s"), lit(0).cast("decimal(28,6)")) + col("w0")
    docs.select(col(idCol))
      .join(matched, Seq(idCol), "left")
      .crossJoin(broadcast(model.scalars))
      .select(
        col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(total.cast("double"), 6).as("score"),
        (total > col("tau")).as("pred"))
  }
}
