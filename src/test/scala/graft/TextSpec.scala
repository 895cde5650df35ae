package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, LineDedup, TextAnalysis}

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens/tokenCount handle blanks and repeated whitespace") {
    val df = Seq("  a  b\tc ", "", "single").toDF("t")
      .select($"t", TextAnalysis.tokenCount($"t").as("n"))
    val m = df.as[(String, Int)].collect().toMap
    assert(m("  a  b\tc ") == 3)
    assert(m("") == 0)
    assert(m("single") == 1)
  }

  test("wordShingles produces n-grams; short docs give empty") {
    val out = Seq("a b c d").toDF("t")
      .select(TextAnalysis.wordShingles($"t", 3).as("sh"))
      .head().getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.wordShingles($"t", 3).as("sh")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("wordShingles kernel is equivalent to the HOF formulation on testdata") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val k = docs.select($"doc_id", TextAnalysis.wordShingles($"text", 3).as("sh"))
    val h = docs.select($"doc_id", TextAnalysis.wordShinglesHof($"text", 3).as("sh"))
    assert(k.exceptAll(h).isEmpty && h.exceptAll(k).isEmpty)
    // null text => [] under both formulations
    val nullRow = Seq[Option[String]](None).toDF("text")
    assert(nullRow.select(TextAnalysis.wordShingles($"text", 2)).head().getSeq[String](0).isEmpty)
  }

  test("charShingles slides over normalized text") {
    val out = Seq("ab  cd").toDF("t")
      .select(TextAnalysis.charShingles($"t", 3).as("sh")).head().getSeq[String](0)
    assert(out == Seq("ab ", "b c", " cd"))
  }

  test("fingerprint is whitespace/case-invariant") {
    val df = Seq(("a", "Hello   World"), ("b", "hello world"), ("c", "hello worlds"))
      .toDF("id", "t")
      .select($"id", TextAnalysis.fingerprintMd5($"t").as("f"), TextAnalysis.fingerprint64($"t").as("f64"))
    val rows = df.collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rows("a") == rows("b"))
    assert(rows("a") != rows("c"))
  }

  test("langId picks the stopword-dominant language") {
    val df = Seq(
      ("en", "the cat sat on the mat and the dog is in the house"),
      ("de", "der hund und die katze sind mit den kindern zu haus"),
      ("fr", "le chien et les chats sont dans une des maisons du village"),
      ("und", "zzz qqq xxx"),
    ).toDF("expected", "t").select($"expected", TextAnalysis.langId($"t").as("got"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("bpeishTokenCount counts subword-ish units") {
    val n = Seq("hello, world 42!").toDF("t")
      .select(TextAnalysis.bpeishTokenCount($"t").as("n")).head().getInt(0)
    // hello , world 42 ! -> 5 units
    assert(n == 5, s"got $n")
  }

  test("TextStats kernel agrees with the HOF formulations on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .union(Seq((9001L, ""), (9002L, "   "), (9003L, "the the the")).toDF("doc_id", "text"))
    val st = graft.functions.GraftFunctions.textStats($"text")
    val both = docs.select(
      $"doc_id",
      TextAnalysis.tokenCount($"text").as("n1"), st.getField("n_tokens").as("n2"),
      TextAnalysis.langId($"text").as("l1"), st.getField("lang_pred").as("l2"),
      length($"text").as("c1"), st.getField("n_chars").as("c2"),
      length(regexp_replace($"text", "\\s+", "")).as("w1"), st.getField("n_chars_no_ws").as("w2"),
      TextAnalysis.stopwordHits($"text", TextAnalysis.stopwords("en")).as("h1"), st.getField("h_en").as("h2"),
    ).collect()
    both.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"token count mismatch: $r")
      assert(r.getString(3) == r.getString(4), s"lang mismatch: $r")
      assert(r.getInt(5) == r.getInt(6), s"n_chars mismatch: $r")
      assert(r.getInt(7) == r.getInt(8), s"no-ws chars mismatch: $r")
      assert(r.getInt(9) == r.getInt(10), s"stopword hits mismatch: $r")
    }
  }

  test("qualitySignals computes ratios on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val out = TextAnalysis.qualitySignals(docs.select($"doc_id", $"text"), "text")
    val r = out.filter($"n_tokens" > 0).head()
    assert(r.getAs[Double]("mean_token_len") > 0)
    assert(r.getAs[Int]("n_chars") > 0)
  }

  test("BPE learns the canonical merge sequence on a hand corpus") {
    // "low" ×3, "lower" ×1, "lowest" ×1 → (l,o) and (o,w) both count 5;
    // lexicographic tiebreak picks (l,o), then (lo,w) at 5, then (low,e)
    // at 2 — the classic worked example.
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 3)
      .orderBy("merge_rank")
      .select("left", "right", "pair_count")
      .as[(String, String, Long)].collect().toSeq
    assert(merges == Seq(("l", "o", 5L), ("lo", "w", 5L), ("low", "e", 2L)), merges.toString)
  }

  test("BPE learnMerges fails loudly above maxVocab (driver-collect guard)") {
    // The vocab collect is "bounded by the language" only for clean
    // prose; on noisy corpora the distinct-word set is data-bounded.
    // Above the cap the learner must refuse, not OOM the driver.
    val e = intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq("aa bb cc dd ee").toDF("text"), "text",
        nMerges = 1, maxVocab = 3L)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
    // At the default cap the same corpus learns normally.
    assert(Bpe.learnMerges(Seq("aa bb aa").toDF("text"), "text", nMerges = 1)
      .count() == 1L)
  }

  test("BPE greedy merge scan handles overlapping pairs left-to-right") {
    val out = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Bpe.mergePair($"syms", "a", "a")).as[Seq[String]].head()
    assert(out == Seq("aa", "a"), out.toString)
    val stops = Bpe.learnMerges(Seq("xy xy").toDF("text"), "text", nMerges = 10)
      .count()
    assert(stops == 1, s"must stop when no pair repeats, learned $stops")
  }

  test("BPE driver-local merge scan is the mergePair column's twin") {
    // Training now learns merges driver-side over the collected vocab;
    // this pin keeps applyMergeLocal and the HOF mergePair (the apply
    // path's executable spec) from drifting, on overlap-adversarial and
    // boundary cases.
    val cases = Seq(
      Seq("a", "a", "a"), Seq("a", "a", "a", "a"), Seq("a", "b", "a", "b"),
      Seq("b", "a", "a", "b"), Seq("a"), Seq.empty[String],
      Seq("x", "a", "b", "a", "b", "y"), Seq("a", "b"), Seq("b", "a"))
    cases.foreach { syms =>
      val viaColumn = Seq(syms).toDF("syms")
        .select(Bpe.mergePair($"syms", "a", "b")).as[Seq[String]].head()
      val viaLocal = Bpe.applyMergeLocal(syms.toArray, "a", "b").toSeq
      assert(viaColumn == viaLocal, s"$syms: column=$viaColumn local=$viaLocal")
    }
  }

  test("BPE encodeWords replays learned merges; unseen words degrade to characters") {
    // Model from the classic corpus: merges (l,o), (lo,w), (low,e).
    val train = Seq("low low low", "lower lowest").toDF("text")
    val merges = Bpe.learnMerges(train, "text", nMerges = 3)
    val enc = Bpe.encodeWords(
      Seq((1L, "Lowest low zap")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .orderBy("word_pos")
      .select("w", "subwords").as[(String, Seq[String])].collect().toSeq
    // lowest -> lowe|s|t (all three merges fire in rank order);
    // low -> low; zap has no learned pairs -> characters.
    assert(enc == Seq(
      ("lowest", Seq("lowe", "s", "t")),
      ("low", Seq("low")),
      ("zap", Seq("z", "a", "p"))), enc.toString)
    // Train/apply share the greedy scan: "aaa" under merge (a,a) is [aa, a].
    val aa = Bpe.learnMerges(Seq("aa aa").toDF("text"), "text", nMerges = 1)
    val tri = Bpe.encodeWords(Seq((1L, "aaa")).toDF("doc_id", "text"), "doc_id", "text", aa)
      .select("subwords").as[Seq[String]].head()
    assert(tri == Seq("aa", "a"), tri.toString)
    // Kernel ≡ chained-fold spec on real testdata words.
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(40)
    val realMerges = Bpe.learnMerges(docs, "text", nMerges = 6)
    val viaKernel = Bpe.encodeWords(docs, "doc_id", "text", realMerges)
      .select($"doc_id", $"word_pos", array_join($"subwords", "|"))
      .as[(Long, Int, String)].collect().toSet
    val viaHof = Bpe.encodeWordsHof(docs, "doc_id", "text", realMerges)
      .select($"doc_id", $"word_pos", array_join($"subwords", "|"))
      .as[(Long, Int, String)].collect().toSet
    assert(viaKernel == viaHof, "BpeEncodeWord kernel must equal the HOF spec")
    assert(viaKernel.nonEmpty)
  }

  test("NgramLm: add-k bigram math, OOV counting, short-doc rows (golden)") {
    import graft.text.NgramLm
    // Train counts: "a b"x2, "b a"x1, "a c"x1; ctx: a->3, b->1; V=3; k=0.5.
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLm.train(train, "doc_id", "text")
    val docs = Seq((10L, "a b"), (11L, "a d"), (12L, "x")).toDF("doc_id", "text")
    val out = NgramLm.score(docs, "doc_id", "text", model)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "n_oov", "mean_p", "ppl")
      .as[(Long, Long, Long, Option[Double], Option[Double])].collect().toSeq
    // "a b": P=(2+.5)/(3+1.5)=5/9 -> ppl=1/P=1.8. "a d" unseen: P=.5/4.5=1/9 -> ppl=9.
    assert(out(0)._1 == 10L && out(0)._2 == 1L && out(0)._3 == 0L)
    assert(math.abs(out(0)._4.get - 5.0 / 9.0) < 1e-9, out(0).toString)
    assert(out(0)._5.get == 1.8, out(0).toString)
    assert(out(1) == ((11L, 1L, 1L, out(1)._4, Some(9.0))) &&
      math.abs(out(1)._4.get - 1.0 / 9.0) < 1e-9, out(1).toString)
    // Single-token doc keeps its row: zero events, NULL scores.
    assert(out(2) == ((12L, 0L, 0L, None, None)), out(2).toString)
  }

  test("DSIR weights tilt toward the target domain on the real corpus") {
    val out = SparkEntry.queries("q_dsir_weight")(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"lang"), "doc_id")
    val by = out.filter($"weight".isNotNull)
      .groupBy($"lang" === "en").agg(avg($"weight")).as[(Boolean, Double)].collect().toMap
    assert(by(true) > by(false),
      s"target-domain (en) docs must average a higher importance weight: $by")
    assert(by(true) > 0, s"en docs should score positive against the mixed raw corpus: $by")
  }

  test("LineDedup: threshold, earliest-owner keep, order-preserving reassembly") {
    val docs = Seq(
      (1L, "keep me\nboiler plate\nunique one"),
      (2L, "boiler plate\nother text"),
      (3L, "boiler plate"),          // loses its only line -> empty doc
      (4L, "boiler plate appears once here")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_lines", "n_dropped")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "keep me\nboiler plate\nunique one", 3L, 0L), // owner: doc 1, line 1
      (2L, "other text", 2L, 1L),
      (3L, "", 1L, 1L),                                  // doc survives, text empties
      (4L, "boiler plate appears once here", 1L, 0L)), out.toString)
    val shared = LineDedup.sharedLines(docs, "doc_id", "text", minDocs = 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(shared == Seq(("boiler plate", 3L, 1L, 1L)), shared.toString)
  }

  test("LineDedup: blank lines are exempt — paragraph structure survives") {
    // "\n\n" paragraph breaks and trailing newlines put the empty line in
    // every doc; it must never count as boilerplate.
    val docs = Seq(
      (1L, "para one\n\npara two\n"),
      (2L, "intro\n\nbody\n"),
      (3L, "alpha\n\nomega\n")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_dropped")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "para one\n\npara two\n", 0L),
      (2L, "intro\n\nbody\n", 0L),
      (3L, "alpha\n\nomega\n", 0L)), out.toString)
    assert(LineDedup.sharedLines(docs, "doc_id", "text", minDocs = 2).isEmpty)
  }

  test("canonicalizeUrl: case, www, default ports, slashes, fragments, tracking params, order") {
    val cases = Seq(
      // scheme+host case-fold, www strip, http default port, trailing slash
      "HTTP://WWW.Example.com:80/a/" -> "http://example.com/a",
      // https default port stripped, non-default kept
      "https://example.com:443/a" -> "https://example.com/a",
      "https://example.com:8443/a" -> "https://example.com:8443/a",
      // fragment dropped; tracking params out; survivors sorted
      "http://example.com/a?utm_source=x&b=2&a=1#frag" -> "http://example.com/a?a=1&b=2",
      "http://example.com/a?fbclid=Z&gclid=Y&ref=hn" -> "http://example.com/a",
      // bare slash path collapses; query alone survives
      "http://example.com/?b=1" -> "http://example.com?b=1",
      // utm prefix must not over-match a real param
      "http://example.com/a?utmx=1" -> "http://example.com/a?utmx=1")
    val got = cases.map(_._1).toDF("url")
      .select(graft.text.Urls.canonicalizeUrl($"url")).as[String].collect().toSeq
    assert(got == cases.map(_._2), got.toString)
    // Malformed input routes to NULL, never a bogus group key.
    val bad = Seq("not a url", "mailto:x@y.z").toDF("url")
      .select(graft.text.Urls.canonicalizeUrl($"url")).collect()
    assert(bad.forall(_.isNullAt(0)), bad.mkString(","))
  }

  test("urlHosts pulls every http(s) hostname, case-folded, in order") {
    val hosts = Seq("See HTTPS://A.Example.COM/x and http://b.example.net, nothing else.")
      .toDF("t").select(TextAnalysis.urlHosts($"t")).as[Seq[String]].head()
    assert(hosts == Seq("a.example.com", "b.example.net"), hosts.toString)
    val none = Seq("no links here").toDF("t")
      .select(TextAnalysis.urlHosts($"t")).as[Seq[String]].head()
    assert(none.isEmpty)
  }

  test("QualityModel: distills a keyword teacher; frozen model; featureless doc scores prior") {
    import graft.text.QualityModel
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val teacher = array_contains(TextAnalysis.tokens($"text"), "spark")
    val model = QualityModel.fit(
      docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text", label = teacher)
    val heldOut = docs.filter($"doc_id" % 3 === 0)
    val scored = QualityModel.score(heldOut, "doc_id", "text", model)
      .join(heldOut.select($"doc_id", teacher.as("y")), Seq("doc_id"))
    val (right, total) = scored
      .agg(sum(when($"pred" === $"y", 1L).otherwise(0L)), count(lit(1)))
      .as[(Long, Long)].head()
    val (posMin, negMax) = scored
      .agg(min(when($"y", $"score")), max(when(!$"y", $"score")))
      .as[(Double, Double)].head()
    // The hashed-linear model must recover the keyword rule on held-out
    // docs: rank separation (every teacher-positive above every
    // negative) plus high accuracy at the score>0 threshold.
    assert(posMin > negMax,
      s"teacher-positive scores must rank above negatives ($posMin vs $negMax)")
    assert(total > 0 && right.toDouble / total > 0.85,
      s"held-out accuracy ${right.toDouble / total} ($right/$total)")
    // Frozen model: scoring a batch in two halves == one shot.
    val half1 = QualityModel.score(heldOut.filter($"doc_id" % 2 === 0), "doc_id", "text", model)
    val half2 = QualityModel.score(heldOut.filter($"doc_id" % 2 =!= 0), "doc_id", "text", model)
    val split = half1.unionByName(half2).as[(Long, Long, Double, Boolean)].collect().toSet
    val whole = QualityModel.score(heldOut, "doc_id", "text", model)
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(split == whole, "split-batch scoring must be bit-identical")
    // Featureless doc: one row, prior-only score, zero matched features.
    val empty = Seq((999999L, "")).toDF("doc_id", "text")
    val es = QualityModel.score(empty, "doc_id", "text", model)
      .as[(Long, Long, Double, Boolean)].collect()
    val w0 = model.scalars.head().getDecimal(0).doubleValue()
    assert(es.length == 1 && es.head._2 == 0L &&
      math.abs(es.head._3 - (math.rint(w0 * 1e6) / 1e6)) < 1e-9,
      s"featureless doc must score the bare prior, got ${es.toSeq} vs w0=$w0")
  }
}
