package graft

import graft.text.SubstringDedup

class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  // Unique filler so nothing outside the planted span can collide:
  // seeded random streams — a cyclic pattern (e.g. i mod 26) would make
  // every filler a shifted copy of every other and collide everywhere.
  private def filler(seed: Char, n: Int): String =
    new scala.util.Random(seed.toLong).alphanumeric.take(n).mkString

  private val shared = "THE-PLANTED-VERBATIM-SPAN-0123456789-XYZ" // 40 chars

  test("sharedSpans finds a planted cross-doc span at its exact offsets") {
    val pa = filler('q', 25)
    val pb = filler('j', 60)
    val docs = Seq(
      (1L, pa + shared + filler('m', 30)),
      (2L, pb + shared + filler('r', 15)),
      (3L, filler('z', 120)), // no overlap with anything
    ).toDF("doc_id", "text")
    val spans = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 8, minSpan = 12)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // Grams fully inside the shared span match; boundary grams differ
    // (different neighbours) → span == exactly the planted region.
    assert(spans.toSeq == Seq(
      (1L, 26L, 65L, 40L, 33L),  // |pa|+1 .. |pa|+40
      (2L, 61L, 100L, 40L, 33L),
    ))
  }

  test("shared substrings shorter than gramLen are invisible") {
    val docs = Seq(
      (1L, filler('a', 50) + "tiny-dup" + filler('b', 50)),
      (2L, filler('c', 50) + "tiny-dup" + filler('d', 50)),
    ).toDF("doc_id", "text")
    assert(SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 12, minSpan = 12)
      .isEmpty)
  }

  test("identical documents collapse to one whole-doc span each") {
    val t = filler('e', 30) + shared
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val spans = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 8, minSpan = 12)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.length == 2 &&
      spans.forall { case (_, s, e, len, _) => s == 1 && e == t.length && len == t.length })
  }

  test("stride > 1 anchors stride-ALIGNED copies (the documented recall caveat)") {
    // Prefix lengths 33 and 48 are both ≡ 0 (mod 3): the two copies are
    // stride-aligned, so sampled anchors select the same grams in both.
    // Misaligned copies are exactly the case stride sampling may miss —
    // SubstringDedup's scaladoc points to winnow anchors for that.
    val docs = Seq(
      (1L, filler('g', 33) + shared + filler('h', 21)),
      (2L, filler('k', 48) + shared + filler('n', 9)),
    ).toDF("doc_id", "text")
    val spans = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 8, minSpan = 12, stride = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    // Sampled anchors may trim the ends by < gramLen+stride, but both docs
    // must still report a span inside the planted region.
    assert(spans.map(_._1).toSet == Set(1L, 2L))
    val byDoc = spans.groupBy(_._1)
    for ((doc, start) <- Seq(1L -> 34L, 2L -> 49L); s = byDoc(doc)) {
      assert(s.length == 1)
      assert(s.head._2 >= start && s.head._3 <= start + 39 && s.head._4 >= 12)
    }
  }

  test("minDocs=3 (two-pass countDistinct path) ignores spans shared by only two docs") {
    // No 10-char gram in common between the two planted strings — a
    // shared prefix would (correctly) bridge them into one longer span.
    val three = "SHARED-BY-THREE-DOCUMENTS-EXACTLY-HERE!!"
    val two = "zqvxw+ONLY=TWO@DOCS#CARRY$THIS%SUBSTRING"
    val docs = Seq(
      (1L, filler('a', 20) + three + filler('b', 20)),
      (2L, filler('c', 20) + three + filler('d', 20)),
      (3L, filler('e', 20) + three + two + filler('f', 20)),
      (4L, filler('g', 20) + two + filler('h', 20)),
    ).toDF("doc_id", "text")
    val spans = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 10, minSpan = 20, minDocs = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.map(_._1).toSet == Set(1L, 2L, 3L), s"got ${spans.toSeq}")
    // Doc 3's span must cover only the three-way region, not the two-way tail.
    val d3 = spans.find(_._1 == 3L).get
    assert(d3._2 == 21 && d3._3 == 20 + three.length)
  }

  test("winnow anchors find UNALIGNED copies that strided grams miss") {
    // Prefix lengths 13 and 10 differ mod 4, so the two copies of the
    // planted span are NOT stride-4-aligned: every stride-4 gram of one
    // copy starts at a different in-span offset than every gram of the
    // other, no gram text matches, and the strided path finds nothing.
    // Winnowing selects positions from the CONTENT, so identical text
    // regions anchor identical grams wherever the copies sit.
    val span = shared + "-AND-THEN-THE-SPAN-KEEPS-GOING-FOR-A-WHILE-LONGER-" + shared // 131 chars
    val docs = Seq(
      (1L, filler('u', 13) + span + filler('v', 40)),
      (2L, filler('w', 10) + span + filler('y', 40)),
    ).toDF("doc_id", "text")
    val strided = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 24, minSpan = 60, stride = 4)
    assert(strided.isEmpty, "stride-4 must miss the misaligned copies (the documented caveat)")
    val winnowed = SubstringDedup
      .sharedSpansWinnowed(docs, "doc_id", "text", gramLen = 24, window = 16, minSpan = 60)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(winnowed.map(_._1).toSeq == Seq(1L, 2L), s"winnow must find both copies: ${winnowed.toSeq}")
    // Conservative extents: reported span ⊆ planted region, and long
    // enough that most of the region was recovered.
    for ((doc, start) <- Seq(1L -> 14L, 2L -> 11L); s = winnowed.find(_._1 == doc).get) {
      assert(s._2 >= start && s._3 <= start + span.length - 1,
        s"span ${s} outside planted region [$start, ${start + span.length - 1}]")
      assert(s._4 >= 60, s"recovered span too short: ${s._4}")
    }
  }

  test("winnow anchors survive supplementary characters (code-point positions, not UTF-16)") {
    // An astral emoji is ONE position for Spark's substr but TWO UTF-16
    // code units; charAt-based anchoring would shift every anchor after
    // it and the two copies' gram texts would never match.
    val span = shared + "-AND-THEN-THE-SPAN-KEEPS-GOING-FOR-A-WHILE-LONGER-" + shared
    val emoji = new String(Character.toChars(0x1F600)) // 😀 (surrogate pair)
    val docs = Seq(
      (1L, emoji * 3 + filler('u', 10) + span + filler('v', 40)),
      (2L, filler('w', 11) + span + filler('y', 40)),
    ).toDF("doc_id", "text")
    val spans = SubstringDedup
      .sharedSpansWinnowed(docs, "doc_id", "text", gramLen = 24, window = 16, minSpan = 60)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.map(_._1).toSet == Set(1L, 2L),
      s"emoji prefix must not break winnowed detection: ${spans.toSeq}")
    // Doc 1's span sits after 3 emoji (3 code points) + 10 filler chars.
    val d1 = spans.find(_._1 == 1L).get
    assert(d1._2 >= 14 && d1._3 <= 13 + span.length,
      s"span ${d1} outside code-point region [14, ${13 + span.length}]")
  }

  test("winnowed detection is exact: disjoint corpora report nothing") {
    val docs = Seq(
      (1L, filler('a', 300)),
      (2L, filler('b', 300)),
      (3L, filler('c', 300)),
    ).toDF("doc_id", "text")
    assert(SubstringDedup
      .sharedSpansWinnowed(docs, "doc_id", "text", gramLen = 24, window = 16, minSpan = 60)
      .isEmpty)
  }

  test("hot-gram routing is result-invariant (skew guard changes the plan, not the answer)") {
    // A boilerplate-heavy corpus: the same license-ish header in every
    // doc (an ultra-hot gram source) plus one genuine two-doc span.
    val header = "ALL-RIGHTS-RESERVED-BOILERPLATE-HEADER-v1.0-APPLIES-TO-THIS-FILE "
    val docs = (1L to 12L).map { i =>
      val body =
        if (i <= 2) shared + filler(('a' + i).toChar, 60)
        else filler(('a' + i).toChar, 100)
      (i, header + body)
    }.toDF("doc_id", "text")
    // hotGramOcc=2 routes ~every shared gram through the broadcast path;
    // a huge threshold routes everything through the shuffled join.
    val viaHot = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 8, minSpan = 12, hotGramOcc = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaCold = SubstringDedup
      .sharedSpans(docs, "doc_id", "text", gramLen = 8, minSpan = 12, hotGramOcc = 1 << 30)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viaHot == viaCold && viaHot.nonEmpty)
    // Every doc carries the header span; docs 1-2 also share `shared`.
    assert(viaHot.count(_._1 <= 2) >= 2)
  }

  test("incremental dedup: new batch vs stored anchor index, plus within-batch sharing") {
    val span = shared + "-AND-THEN-THE-SPAN-KEEPS-GOING-FOR-A-WHILE-LONGER-" + shared
    val corpus = Seq(
      (1L, filler('a', 40) + span + filler('b', 40)),
      (2L, filler('c', 250)),
    ).toDF("doc_id", "text")
    val index = SubstringDedup.buildAnchorIndex(corpus, "doc_id", "text", gramLen = 24, window = 16)
    // Long enough that the conservative winnow extents (edges trimmed up
    // to window−1 anchor positions) still clear minSpan=60.
    val batchSpan = "A-FRESH-DUPLICATE-THAT-ONLY-THE-NEW-BATCH-CARRIES-TWICE-OVER-9876543210" +
      "-AND-ITS-SECOND-HALF-KEEPS-GOING-WITH-MORE-UNIQUE-MATERIAL-abcdefghij"
    val batch = Seq(
      (10L, filler('d', 17) + span + filler('e', 30)),        // duplicates CORPUS text (unaligned)
      (11L, filler('f', 260)),                                // clean
      (12L, filler('g', 21) + batchSpan + filler('h', 30)),   // within-batch pair…
      (13L, filler('k', 34) + batchSpan + filler('n', 30)),   // …misaligned vs doc 12
    ).toDF("doc_id", "text")
    val spans = SubstringDedup
      .incrementalSharedSpans(batch, "doc_id", "text", index,
        gramLen = 24, window = 16, minSpan = 60)
      .as[(Long, Long, Long, Long, Long)].collect()
    // Only NEW docs are reported (the corpus is the reference, not the
    // subject), and only the duplicated ones.
    assert(spans.map(_._1).toSet == Set(10L, 12L, 13L), s"got ${spans.toSeq}")
    val d10 = spans.find(_._1 == 10L).get
    assert(d10._2 >= 18 && d10._3 <= 17 + span.length && d10._4 >= 60)
    for (doc <- Seq(12L, 13L); s = spans.find(_._1 == doc).get)
      assert(s._4 >= 60 && s._4 <= batchSpan.length)
  }

  test("removeShared cuts the non-canonical copy, keeps the first, leaves others alone") {
    val pa = filler('q', 25)
    val pb = filler('j', 60)
    val sb = filler('r', 15)
    val docs = Seq(
      (1L, pa + shared + filler('m', 30)),  // canonical (min doc_id) — kept
      (2L, pb + shared + sb),               // copy — spliced out
      (3L, filler('z', 120)),               // untouched
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .removeShared(docs, "doc_id", "text", gramLen = 8, minSpan = 12)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0)._2 == pa + shared + filler('m', 30) && out(0)._3 == 0)
    assert(out(1)._2 == pb + sb, "copy must be spliced out, neighbours joined")
    assert(out(1)._3 == 1 && out(1)._4 == shared.length)
    assert(out(2)._2 == filler('z', 120) && out(2)._3 == 0)
  }

  test("removeSharedFunneled == removeShared, with UNALIGNED copies and clean bulk") {
    val span = shared + "-AND-THEN-THE-SPAN-KEEPS-GOING-FOR-A-WHILE-LONGER-" + shared
    // Copies at offsets 25 and 60 (≠ mod anything small) + a clean
    // majority the funnel's stage 2 never has to gram-amplify.
    val docs = Seq(
      (1L, filler('q', 25) + span + filler('m', 40)),
      (2L, filler('j', 60) + span + filler('r', 40)),
      (3L, filler('z', 300)),
      (4L, filler('y', 280)),
      (5L, filler('x', 260)),
    ).toDF("doc_id", "text")
    val funneled = SubstringDedup
      .removeSharedFunneled(docs, "doc_id", "text", gramLen = 40, minSpan = 60,
        winnowGramLen = 24, window = 16)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val exact = SubstringDedup
      .removeShared(docs, "doc_id", "text", gramLen = 40, minSpan = 60)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(funneled.toSeq == exact.toSeq,
      "funnel must reproduce the exact removal (stage 1 only prunes docs)")
    // And the removal itself did its job: doc 1 canonical kept, doc 2 spliced.
    assert(funneled(0)._3 == 0 && funneled(1)._3 == 1)
    assert(funneled(1)._2 == filler('j', 60) + filler('r', 40))
    assert(funneled.drop(2).forall(r => r._3 == 0 && r._4 == 0))
  }

  test("removeShared on identical docs empties all but the first") {
    val t = filler('e', 30) + shared
    val docs = Seq((1L, t), (2L, t), (3L, t)).toDF("doc_id", "text")
    val out = SubstringDedup
      .removeShared(docs, "doc_id", "text", gramLen = 8, minSpan = 12)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0)._2 == t)
    assert(out(1)._2 == "" && out(1)._4 == t.length)
    assert(out(2)._2 == "" && out(2)._4 == t.length)
  }

  test("documents shorter than gramLen produce no grams (and no crash)") {
    val docs = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    assert(SubstringDedup.sharedSpans(docs, "doc_id", "text", gramLen = 8, minSpan = 8).isEmpty)
  }
}
