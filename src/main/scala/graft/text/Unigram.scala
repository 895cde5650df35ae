package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer: the same deterministic piece inventory
  * as [[WordPiece]] (every corpus character + top substrings by
  * occurrences × length), but each piece carries an integer LOG-PROB
  * (micro-nats: floor(1e6·ln(occ / Σocc))) and encode is VITERBI
  * max-probability segmentation — the SentencePiece unigram-LM inference
  * step (Kudo 2018, arXiv:1804.10959) — instead of WordPiece's greedy
  * MaxMatch. The third tokenizer family beside [[Bpe]] (merge replay)
  * and [[WordPiece]] (greedy inventory match).
  *
  * Determinism doctrine: ln runs once per vocabulary piece (≤ vocabSize
  * doubles, IEEE-identical across engines) and immediately quantizes to
  * an integer, so the DP itself is pure BIGINT arithmetic — the oracle
  * replays fit, forward DP, and backward path reconstruction exactly
  * (recursive CTEs), with the canonical path defined as "shortest last
  * piece achieving dp[i]" at every backward step.
  *
  * Scale shape: identical to WordPiece — fit is one token-count shuffle
  * over the corpus then vocabulary-bounded substring work; encode is a
  * broadcast-model codegen kernel, zero corpus shuffles.
  */
object Unigram {

  /** Fit: (piece, lp) model of exactly `vocabSize` rows — the WordPiece
    * inventory selection (chars forced in for totality, then top
    * substrings by score = occ × len, ties lexicographic) with
    * lp = floor(1e6 · ln(occ / Σ_vocab occ)) micro-nat log-probs,
    * normalized over the SELECTED inventory (the unigram-LM seed
    * distribution). The total rides back as an in-plan broadcast scalar
    * — no driver round-trip between counting and scoring.
    */
  def vocabFromWordCounts(
      words: DataFrame,
      vocabSize: Int = 64,
      maxPieceLen: Int = 6,
  ): DataFrame = {
    val pieces = WordPiece.pieceCounts(words, maxPieceLen)
    val chars = pieces.filter(length(col("piece")) === 1)
    val nChars = chars.count().toInt
    require(nChars < vocabSize,
      s"Unigram.buildVocab: vocabSize ($vocabSize) must exceed the " +
        s"corpus's distinct character count ($nChars) — single chars are " +
        "forced into the vocabulary for segmentation totality")
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("score").desc, col("piece"))
      .limit(vocabSize - nChars)
    val voc = chars.unionByName(multi).select("piece", "occ")
    val tot = voc.agg(sum(col("occ")).cast("double").as("t"))
    voc.crossJoin(broadcast(tot))
      .select(col("piece"),
        floor(lit(1e6) * log(col("occ").cast("double") / col("t"))).as("lp"))
  }

  def buildVocab(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int = 64,
      maxPieceLen: Int = 6,
  ): DataFrame =
    vocabFromWordCounts(WordPiece.wordCounts(docs, textCol), vocabSize, maxPieceLen)

  /** Encode `text` against a frozen (piece, lp) model: Viterbi
    * max-log-prob segmentation per word; an unknown character costs
    * min(lp) − 1e6 and counts in `n_unk`. Returns struct(n_words,
    * n_pieces, n_unk, score_total, seg) with the same U+001F/U+001E
    * canonical segmentation string convention as [[WordPiece.encode]].
    */
  def encode(text: Column, model: Seq[(String, Long)], maxPieceLen: Int = 6): Column =
    graft.functions.GraftFunctions.unigramEncode(text, model, maxPieceLen)
}
