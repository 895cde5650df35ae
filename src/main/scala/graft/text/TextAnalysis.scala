package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (beyond-reference
  * scope: language ID, quality scoring, token counting, fingerprinting).
  *
  * Everything is built from codegen'd `functions._` primitives — these run
  * inside whole-stage codegen as a narrow projection over the document
  * scan, so a 100 TB corpus is processed in one pass with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens. Empty/blank text → empty array (not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Mod-10 Luhn checksum validity of a digit string of ANY length
    * (13–19 for real card numbers): a pure integer fold over the digit
    * positions — every second digit from the RIGHT doubles, with the
    * classic subtract-9 wrap. Runs inside whole-stage codegen; the
    * validation step behind card-number PII detection (q_luhn,
    * [[graft.streaming.DocsStream.piiGate]]).
    */
  def luhnValid(digits: Column): Column = {
    val len = length(digits)
    val total = aggregate(sequence(lit(1), len), lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        // position from the right is len - i + 1; even ones double
        val term = when(pmod(len - i + 1, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + term
      })
    length(digits) >= 2 && pmod(total, lit(10)) === 0
  }

  /** Candidate card-number runs (13–19 digits) in free text. */
  def panCandidates(text: Column): Column =
    regexp_extract_all(text, lit("[0-9]{13,19}"), lit(0))

  /** TRUE when the text contains at least one Luhn-valid card-number
    * candidate — the "this really is a PAN" confirmation that cuts the
    * false-positive rate of a bare digit-run regex.
    */
  def containsValidPan(text: Column): Column =
    exists(panCandidates(text), p => luhnValid(p))

  /** Token count without materializing the token array. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "" || text.isNull, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-unit count: word pieces + digits + punctuation as
    * separate units (a cheap deterministic stand-in for a real tokenizer's
    * token count; useful for budget estimation).
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"), t => t =!= "" && t =!= " "))

  /** Word-level n-gram shingles (the MinHash/Jaccard unit). */
  def wordShingles(text: Column, n: Int): Column =
    // One-pass codegen'd kernel; coalesce keeps the HOF variant's
    // null-text => [] convention. Equivalence-tested in TextSpec.
    coalesce(graft.functions.GraftFunctions.wordShingles(tokens(text), n), array())

  /** Composable higher-order formulation of [[wordShingles]] — identical
    * output, interpreted per row; kept as the kernel's executable spec.
    */
  def wordShinglesHof(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())
  }

  /** Character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(regexp_replace(text, "\\s+", " "))
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - n + 1), i => t.substr(i, lit(n))))
      .otherwise(array())
  }

  /** Document fingerprint: hash of whitespace/case-normalized content.
    * md5 for a portable oracle-checkable form; xxhash64 for the fast path.
    */
  def fingerprintMd5(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  def fingerprint64(text: Column): Column =
    xxhash64(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** The stronger dedup normalization (case + punctuation + whitespace) —
    * ONE definition shared by the batch collapse (q_norm_dedup) and the
    * streaming dedup (DocsStream.dedupedDocs) so the two paths cannot
    * drift: a punctuation-only re-crawl collapses in both.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  def fingerprintNormMd5(text: Column): Column = md5(normalizeForDedup(text))

  /** Hostnames of http(s) URLs in `text` — the domain-accounting step of a
    * web-corpus pipeline (per-domain quotas, blocklists, provenance
    * stats). Pattern is deliberately RE2-compatible (plain classes and a
    * single capture group), so a DuckDB/Trino oracle runs it verbatim.
    */
  def urlHosts(text: Column): Column =
    regexp_extract_all(lower(text), lit("https?://([a-z0-9.-]+)"), lit(1))

  /** Stopword tables for the n-gram/stopword language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "un"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
  )

  /** Count how many tokens of `text` appear in `words` (codegen'd; the
    * word set becomes an array literal, membership via `array_contains`).
    */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(wordArr, t)))
  }

  /** Heuristic language ID: argmax of per-language stopword hit counts;
    * `und` (undetermined) when nothing matches.
    */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(text, words).as("hits"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality signals: length, token count, mean word length, punctuation
    * ratio, stopword ratio, uppercase ratio — the standard cheap filters a
    * pretraining pipeline cuts on.
    */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChar = length(t)
    df.withColumn("n_chars", nChar)
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len",
        when(nTok > 0, round(length(regexp_replace(t, "\\s+", "")).cast("double") / nTok, 4)))
      .withColumn("punct_ratio",
        when(nChar > 0, round(size(filter(split(t, ""), c => c.rlike("[\\p{Punct}]"))).cast("double") / nChar, 4)))
      .withColumn("stopword_ratio",
        when(nTok > 0, round(stopwordHits(t, stopwords("en")).cast("double") / nTok, 4)))
      .withColumn("upper_ratio",
        when(nChar > 0, round((nChar - length(regexp_replace(t, "[A-Z]", ""))).cast("double") / nChar, 4)))
  }
}
