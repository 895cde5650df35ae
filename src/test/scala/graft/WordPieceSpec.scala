package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.text.WordPiece

/** WordPiece tokenizer pins (q_wordpiece_vocab / q_wordpiece_encode). */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  private def enc(text: String, vocab: Seq[String], maxLen: Int = 6): Row =
    Seq(text).toDF("t")
      .select(WordPiece.encode($"t", vocab, maxLen).as("e"))
      .select($"e.n_words", $"e.n_pieces", $"e.n_unk", $"e.n_piece_chars", $"e.seg")
      .collect()(0)

  private def seg(r: Row): Seq[Seq[String]] =
    r.getString(4).split('\u001E').toSeq.map(_.split('\u001F').toSeq)

  test("greedy longest match wins over any shorter decomposition") {
    // vocab has both 'tab'+'le' and 'table' — greedy must take 'table'
    val r = enc("table tab le", Seq("table", "tab", "le", "t", "a", "b", "l", "e"))
    assert(seg(r) == Seq(Seq("table"), Seq("tab"), Seq("le")))
    assert(r.getLong(1) == 3 && r.getLong(2) == 0)
  }

  test("greedy is NOT optimal-count (the documented trade): ab|c vs a|bc") {
    // 'abc' with vocab {ab, c missing, a, bc}: greedy takes 'ab' then
    // must emit unk 'c'; optimal 'a'+'bc' exists — pin greedy semantics.
    val r = enc("abc", Seq("ab", "a", "bc", "b"))
    assert(seg(r) == Seq(Seq("ab", "c")))
    assert(r.getLong(2) == 1, "the stranded 'c' is an unk piece")
  }

  test("unknown characters pass through as single-char unk pieces") {
    val r = enc("axb", Seq("a", "b"))
    assert(seg(r) == Seq(Seq("a", "x", "b")) && r.getLong(2) == 1)
  }

  test("whitespace runs and edges: words split exactly like the engine convention") {
    val r = enc("  aa \t bb  ", Seq("aa", "bb", "a", "b"))
    assert(r.getLong(0) == 2 && seg(r) == Seq(Seq("aa"), Seq("bb")))
  }

  test("codepoint walk never splits a surrogate pair; CJK pieces match") {
    val bmp = "你好" // two BMP CJK chars
    val astral = new String(Character.toChars(0x1F600)) // one astral codepoint
    val r = enc(s"$bmp$astral", Seq(bmp, astral))
    assert(seg(r) == Seq(Seq(bmp, astral)))
    assert(r.getLong(3) == 3, "piece chars count codepoints, not UTF-16 units")
  }

  test("maxLen caps the match even when a longer piece is in the vocabulary") {
    val r = enc("abcd", Seq("abcd", "abc", "d"), maxLen = 3)
    assert(seg(r) == Seq(Seq("abc", "d")))
  }

  test("buildVocab: forced chars + scored multi pieces with exact tie-breaks") {
    // 'aba' f=2, 'ab' f=1. Occurrences count every start (multiplicity
    // inside a word): a = 2*2+1 = 5, b = 2+1 = 3, ab = 2+1 = 3 -> 6,
    // ba = 2 -> 4, aba = 2 -> 6. vocabSize 4 -> 2 multi slots; the
    // ab/aba score tie (6) breaks lexicographically, ba is cut.
    val docs = Seq("aba aba ab").toDF("text")
    val v = WordPiece.buildVocab(docs, "text", vocabSize = 4, maxPieceLen = 6)
      .as[(String, Long)].collect().toMap
    assert(v == Map("a" -> 5L, "b" -> 3L, "ab" -> 6L, "aba" -> 6L))
  }

  test("buildVocab refuses a vocabSize below the distinct character count") {
    val docs = Seq("abcdef").toDF("text")
    val e = intercept[IllegalArgumentException] {
      WordPiece.buildVocab(docs, "text", vocabSize = 4, maxPieceLen = 6)
    }
    assert(e.getMessage.contains("distinct character count"))
  }

  test("SQL surface: graft_wordpiece with a literal inventory") {
    val got = spark.sql(
      """SELECT graft_wordpiece('table scan', array('table', 'scan', 'tab'), 6).n_pieces"""
    ).collect()(0).getLong(0)
    assert(got == 2L)
  }

  test("encode over the corpus: totals are consistent and reconstruction holds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val vocab = WordPiece.buildVocab(docs, "text", 64, 6)
      .select("piece").as[String].collect().toSeq.sorted
    val rows = docs
      .select($"text", WordPiece.encode($"text", vocab, 6).as("e"))
      .select($"text", $"e.n_pieces", $"e.n_piece_chars", $"e.seg")
      .filter($"e.n_words" > 0)
      .as[(String, Long, Long, String)].collect()
    rows.foreach { case (text, nPieces, nChars, s) =>
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      val segWords = s.split('\u001E')
      assert(segWords.length == words.length)
      // reconstruction: pieces concatenate back to each word exactly
      words.zip(segWords).foreach { case (w, sw) =>
        assert(sw.split('\u001F').mkString == w)
      }
      // segmentation partitions each word: piece chars sum to word chars
      assert(nChars == words.map(w => w.codePointCount(0, w.length).toLong).sum)
      assert(nPieces == segWords.map(_.split('\u001F').length.toLong).sum)
    }
  }
}
