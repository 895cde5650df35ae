package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Dedup, Sampling}
import graft.similarity.NearDup
import graft.text.QualityModel

/** The whole training-data pipeline COMPOSED, end to end, on real
  * testdata: distilled-classifier gate → exact dedup → near-dup
  * clustering with quality-aware survivor selection → temperature
  * source mix → sequence packing. Each stage is an operator the
  * registry oracles individually; this spec pins that they compose —
  * monotone funnel, stage invariants, and bit-determinism of the whole
  * chain (the property that makes a 100 TB re-run reproducible).
  */
class EndToEndSpec extends SparkTestBase {
  import spark.implicits._

  private def runPipeline(): org.apache.spark.sql.DataFrame = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .localCheckpoint(eager = false)

    // 1. Quality gate: distilled keyword-teacher classifier at its
    //    fitted threshold (model trained on a disjoint split).
    val model = QualityModel.fit(
      docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text",
      label = array_contains(graft.text.TextAnalysis.tokens($"text"), "spark"))
    val gated = docs.join(
      QualityModel.score(docs, "doc_id", "text", model)
        .filter($"pred").select("doc_id"),
      Seq("doc_id"), "left_semi")

    // 2. Exact dedup (normalized-content hash, min id survives).
    val exact = Dedup.exactTextDedup(gated, "doc_id", "text")

    // 3. Near-dup clusters + keep-BEST survivor (longest doc).
    val labels = NearDup.connectedComponentsAdaptive(
      NearDup.jaccardVerify(
        NearDup.minhashCandidates(exact, "doc_id", "text",
          shingleLen = 3, numHashes = 12, bands = 12, maxBucket = 10000),
        exact, "doc_id", "text", shingleLen = 3, minJaccard = 0.8),
      "doc_id_a", "doc_id_b")
    val kept = NearDup.survivorsByQuality(exact, "doc_id", labels, quality = $"n_chars")
      .filter($"is_survivor")
      .select(docs.columns.map(col): _*)

    // 4. Temperature mix over the (skewed) lang distribution.
    val mixed = Sampling.temperatureMix(kept, $"doc_id", $"lang", alpha = 0.5)
      .drop("__keep")

    // 5. Pack into token-budgeted batches per lang.
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mixed
      .select($"doc_id", $"lang",
        graft.functions.GraftFunctions.textStats($"text").getField("n_tokens")
          .cast("long").as("n_tokens"))
      .withColumn("batch_id",
        floor((sum($"n_tokens").over(w) - $"n_tokens") / 2000L))
  }

  test("composed pipeline: gate → exact dedup → keep-best clusters → mix → pack") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").localCheckpoint()
    val out = runPipeline().localCheckpoint()

    // Funnel monotonicity: every stage only removes.
    val n0 = docs.count()
    val nOut = out.count()
    assert(nOut > 0 && nOut < n0, s"funnel must shrink: $n0 -> $nOut")

    // No exact duplicates survive: normalized fingerprints unique.
    val fps = docs.join(out.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(graft.text.TextAnalysis.fingerprintNormMd5($"text")).as[String].collect()
    assert(fps.length == fps.distinct.length, "exact dup escaped the funnel")

    // Packing invariant: within every (lang, batch) the token sum stays
    // under budget + one doc's overflow allowance (first-fit running
    // pack: a batch closes when the NEXT doc would overflow).
    val bad = out.groupBy("lang", "batch_id")
      .agg(sum($"n_tokens").as("t"), max($"n_tokens").as("mx"))
      .filter($"t" >= lit(2000L) + $"mx")
      .count()
    assert(bad == 0, "a packed batch exceeded budget by more than one doc")

    // Whole-chain determinism: a second independent run is bit-identical.
    val again = runPipeline()
    assert(out.as[(Long, String, Long, Long)].collect().toSet ==
      again.as[(Long, String, Long, Long)].collect().toSet,
      "the composed pipeline must be deterministic end to end")
  }

  test("eval stage closes the loop: holdout AUC/AP above chance, model-vs-truth kappa positive") {
    import graft.core.Stats
    // The funnel's FIRST stage is a fitted model — production QC also
    // asks "is the gate any good?" before trusting its survivors. The
    // new eval family answers on the held-out split: ranking quality
    // (AUC), imbalance-robust ranking quality (AP vs base rate), and
    // chance-corrected agreement of the thresholded decision (kappa).
    val docs = spark.read.parquet(s"$sf/documents.parquet").localCheckpoint()
    val label = array_contains(graft.text.TextAnalysis.tokens($"text"), "spark")
    val model = QualityModel.fit(
      docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text", label = label)
    val holdout = docs.filter($"doc_id" % 3 === 0)
    val scored = QualityModel.score(holdout, "doc_id", "text", model)
      .join(holdout.select($"doc_id", label.as("y")), Seq("doc_id"))
      .localCheckpoint()

    val auc = Stats.rocAuc(scored, lit("all"), $"score", $"y")
      .collect().head.getAs[Double]("auc")
    assert(auc > 0.7, s"distilled gate must rank holdout positives high: AUC=$auc")

    val apRow = Stats.avgPrecision(scored, lit("all"), $"score", $"doc_id", $"y")
      .collect().head
    val ap = apRow.getAs[Double]("avg_precision")
    val base = apRow.getAs[Long]("np").toDouble / scored.count()
    assert(ap > base, s"AP must beat the positive base rate: $ap vs $base")

    val kap = Stats.cohenKappa(scored, lit("all"),
      $"pred".cast("int"), $"y".cast("int"))
      .collect().head.getAs[Double]("kappa")
    assert(kap > 0.2, s"thresholded decision vs truth must beat chance: kappa=$kap")
  }

  test("drift monitor closes the funnel: survivors' length mix stays near the corpus (PSI/JSD)") {
    import graft.core.Stats
    val docs = spark.read.parquet(s"$sf/documents.parquet").localCheckpoint()
    val out = runPipeline().select("doc_id").localCheckpoint()
    // The production QC gate after a selection funnel: did the kept set
    // drift from the corpus it was drawn from? Reference = full corpus,
    // current = survivors, per language over doc length.
    val tagged = docs
      .join(out.withColumn("kept", lit(true)), Seq("doc_id"), "left")
      .select($"lang", $"n_chars", coalesce($"kept", lit(false)).as("kept"))
    val monitored = tagged
      .select($"lang", $"n_chars", lit(true).as("ref"))
      .unionByName(tagged.filter($"kept").select($"lang", $"n_chars", lit(false).as("ref")))
    // Cheap global readout (single group): PSI is finite and small —
    // the funnel selects on quality/dup structure, not length, so a
    // length-mix alarm (PSI > 0.25 is the classic action threshold at
    // this smoothing) would mean a selection bug.
    val p = Stats.psi(monitored.withColumn("g", lit("all")), $"g", $"n_chars", $"ref")
      .collect().head.getAs[Double]("psi")
    assert(!p.isNaN && p >= 0.0 && p < 0.25, s"funnel skewed the length mix: PSI = $p")
    // Vocabulary drift likewise bounded: JSD of survivors vs corpus
    // unigram mixes stays well under ln 2 (disjoint-vocab worst case).
    val toks = docs
      .join(out.withColumn("kept", lit(true)), Seq("doc_id"), "left")
      .select(coalesce($"kept", lit(false)).as("kept"),
        explode(graft.text.TextAnalysis.tokens($"text")).as("tok"))
    val counts = toks.groupBy("tok").agg(
      count(lit(1)).as("ca"),
      count(when($"kept", 1)).as("cb"))
      .withColumn("g", lit("all"))
    val jsd = Stats.jsdFromCounts(counts, $"g", $"ca", $"cb")
      .collect().head.getAs[Double]("jsd")
    assert(jsd >= 0.0 && jsd < 0.35, s"funnel skewed the vocabulary: JSD = $jsd nats")
  }
}
