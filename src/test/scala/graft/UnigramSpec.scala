package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.text.{Unigram, WordPiece}

/** Unigram-LM Viterbi tokenizer pins (q_unigram_vocab/encode/oov). */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def enc(text: String, model: Seq[(String, Long)], maxLen: Int = 6): Row =
    Seq(text).toDF("t")
      .select(Unigram.encode($"t", model, maxLen).as("e"))
      .select($"e.n_words", $"e.n_pieces", $"e.n_unk", $"e.score_total", $"e.seg")
      .collect()(0)

  private def seg(r: Row): Seq[Seq[String]] =
    r.getString(4).split('\u001E').toSeq.map(_.split('\u001F').toSeq)

  test("Viterbi beats greedy where greedy strands a character") {
    // 'abc' with {ab, a, bc}: greedy takes 'ab' then unk 'c'; Viterbi
    // finds 'a'+'bc' (two known pieces, no unk) — the exact case the
    // WordPieceSpec pins as greedy's documented trade.
    val m = Seq("ab" -> -100L, "a" -> -300L, "bc" -> -200L, "b" -> -400L)
    val r = enc("abc", m)
    assert(seg(r) == Seq(Seq("a", "bc")))
    assert(r.getLong(2) == 0, "no unk: Viterbi routes around the stranded 'c'")
    assert(r.getLong(3) == -500L, "score = lp(a) + lp(bc)")
  }

  test("max-probability, not max-length: a likely pair beats one rare long piece") {
    // 'abcd' whole-word piece exists but is RARE; 'ab'+'cd' are common.
    val m = Seq("abcd" -> -900L, "ab" -> -100L, "cd" -> -100L,
      "a" -> -500L, "b" -> -500L, "c" -> -500L, "d" -> -500L)
    val r = enc("abcd", m)
    assert(seg(r) == Seq(Seq("ab", "cd")) && r.getLong(3) == -200L)
  }

  test("tie-break is canonical: shortest last piece at every backward step") {
    // Two optimal paths for 'aa': ['aa'] (-200) and ['a','a'] (-100-100):
    // equal scores — the canonical path takes the SHORTEST last piece,
    // so ['a','a'] wins (backward min-l), matching the oracle CTE.
    val m = Seq("aa" -> -200L, "a" -> -100L)
    val r = enc("aa", m)
    assert(seg(r) == Seq(Seq("a", "a")) && r.getLong(3) == -200L)
  }

  test("unknown characters cost min(lp) - 1e6 and count in n_unk") {
    val m = Seq("a" -> -100L, "b" -> -700L)
    val r = enc("axb", m)
    assert(seg(r) == Seq(Seq("a", "x", "b")) && r.getLong(2) == 1)
    assert(r.getLong(3) == -100L - 700L + (-700L - 1000000L),
      "unk penalty derives from the worst vocabulary piece")
  }

  test("Viterbi score_total >= greedy's score under the same model (optimality)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val model = Unigram.buildVocab(docs, "text", 64, 6)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val lp = model.toMap
    val unk = model.map(_._2).min - 1000000L
    val both = docs
      .select(Unigram.encode(col("text"), model, 6).as("u"),
        WordPiece.encode(col("text"), model.map(_._1), 6).as("g"))
      .select(col("u.score_total").as("vit"), col("g.seg").as("gseg"))
      .collect()
    both.foreach { r =>
      val greedyScore = r.getString(1).split('\u001E')
        .flatMap(_.split('\u001F')).filter(_.nonEmpty)
        .map(p => lp.getOrElse(p, unk)).sum
      assert(r.getLong(0) >= greedyScore,
        s"Viterbi ${r.getLong(0)} < greedy $greedyScore — DP not optimal")
    }
  }

  test("segmentation is total: pieces concatenate back to the words") {
    val m = Seq("a" -> -10L, "b" -> -20L, "ab" -> -5L)
    val r = enc("abab ba x", m)
    assert(seg(r).map(_.mkString) == Seq("abab", "ba", "x"))
  }

  test("surrogate pairs: an astral codepoint is one unk piece, never split") {
    val m = Seq("a" -> -10L, "b" -> -20L)
    val r = enc("a𝄞b", m) // 𝄞 U+1D11E
    assert(seg(r) == Seq(Seq("a", "𝄞", "b")) && r.getLong(2) == 1)
  }

  test("empty and whitespace-only text encode to zero words") {
    val m = Seq("a" -> -10L)
    assert(enc("", m).getLong(0) == 0)
    assert(enc("  \t ", m).getLong(0) == 0)
  }

  test("vocab: chars forced in, multi by score desc, lp in micro-nats over the inventory") {
    val docs = Seq("ab ab b").toDF("text")
    // occ: a=2, b=3, ab=2 → inventory (vocabSize 3) = {a, b, ab}; tot=7
    val v = Unigram.buildVocab(docs, "text", vocabSize = 3, maxPieceLen = 2)
      .as[(String, Long)].collect().toMap
    assert(v.keySet == Set("a", "b", "ab"))
    def lp(occ: Long) = math.floor(1e6 * math.log(occ.toDouble / 7.0)).toLong
    assert(v("a") == lp(2) && v("b") == lp(3) && v("ab") == lp(2))
  }

  test("kernel runs inside whole-stage codegen (broadcast model, no shuffle)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = Unigram.buildVocab(docs, "text", 64, 6)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val plan = docs.select(Unigram.encode(col("text"), model, 6).as("e"))
      .queryExecution.executedPlan.toString
    // the star prefix is the whole-stage-codegen marker in the simple plan
    assert(plan.linesIterator.exists(_.trim.startsWith("*(")),
      s"kernel fell out of codegen:\n$plan")
    assert(!plan.contains("Exchange"), s"encode must not shuffle the corpus:\n$plan")
  }
}
