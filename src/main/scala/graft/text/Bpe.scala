package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-vocabulary step of
  * an LLM data pipeline, as distributed dataflow.
  *
  * Classic BPE (Sennrich et al. 2016, ACL — public algorithm): start
  * from characters, repeatedly merge the most frequent adjacent symbol
  * pair. The Spark-first decomposition:
  *
  *  - the corpus collapses ONCE to the (word, freq) vocabulary — the
  *    bounded side (vocab size, not corpus size), which is what every
  *    round iterates over; a 100 TB corpus pays one tokenize+count
  *    shuffle total.
  *  - each round is: adjacent-pair explode → weighted count → argmax
  *    (ONE row collects — the same tiny-model-to-driver move as
  *    KMeans) → greedy left-to-right merge applied per word by a fold
  *    over the symbol array (HOF — no UDF). The word table is lazily
  *    checkpointed per round to cap plan growth (the CC discipline).
  *
  * Deterministic: ties in pair frequency break lexicographically, so
  * the learned merge list is reproducible across runs and partitionings.
  */
object Bpe {

  /** The learned merge table: (rank, left, right, pair_count), rank 0 =
    * first merge. `nMerges` rounds; stops early if no pair repeats.
    *
    * ONE distributed job total, independent of `nMerges`: the corpus
    * collapses to the (word, freq) vocabulary — bounded by the language,
    * not the data — which collects once, and every merge round runs
    * driver-local over it (the r9 formulation ran a pair-count job +
    * a checkpointing merge projection PER ROUND: at a realistic
    * 10k-merge vocabulary that is 10k driver round-trips of pure
    * scheduling latency for work that fits in one in-memory loop).
    * Greedy semantics are the SAME scan as [[mergePair]] (TextSpec pins
    * the equivalence on overlap-adversarial words), and the argmax
    * tie-break compares UTF-8 bytes — Spark's UTF8String/DuckDB
    * collation order, NOT Java's UTF-16 `compareTo`, which disagrees
    * above the BMP — so the learned table is bit-identical to the
    * distributed rounds and to the unrolled SQL oracle.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxVocab: Long = 4000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Corpus → word-frequency table: the only cluster job. "Bounded by
    // the language" holds for clean prose but NOT for noisy web corpora
    // (URLs, hashes, typos make the distinct-word set data-bounded), so
    // the collect is guarded: fail loudly instead of OOMing the driver
    // silently. At the default cap (4M words × ~50 B) the driver table
    // is ≤ a few hundred MB; above it the caller must pre-normalize or
    // frequency-prune the corpus — pruning here would change the
    // learned table, which is pinned bit-identical to the SQL oracle.
    val vocabDf = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .localCheckpoint(eager = false) // count + collect share the agg
    val vocabSize = vocabDf.count()
    require(vocabSize <= maxVocab,
      s"Bpe.learnMerges: distinct-word vocabulary ($vocabSize) exceeds " +
        s"maxVocab ($maxVocab) — the merge learner collects the vocab to " +
        "the driver; normalize or frequency-prune the corpus first, or " +
        "raise maxVocab if the driver heap allows.")
    val vocab: Array[(String, Long)] = vocabDf.as[(String, Long)].collect()
    // Symbols start as characters — CODE POINTS, matching the SQL
    // formulation's substr(i, 1) (Java chars would split surrogate pairs).
    var words: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      val syms = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      (syms.result(), f)
    }
    val learned = collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var continue = nMerges > 0
    while (continue) {
      // Adjacent-pair histogram, freq-weighted (every position counts,
      // same as the exploded formulation).
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts.update(p, counts.getOrElse(p, 0L) + f)
      }
      val top = counts.iterator.filter(_._2 >= 2L).reduceOption { (x, y) =>
        // max n; ties → lexicographically smallest (a, b) in UTF-8 bytes
        if (y._2 > x._2) y
        else if (y._2 < x._2) x
        else {
          val ca = utf8Compare(y._1._1, x._1._1)
          if (ca < 0 || (ca == 0 && utf8Compare(y._1._2, x._1._2) < 0)) y else x
        }
      }
      top match {
        case Some(((a, b), n)) =>
          learned += ((rank, a, b, n))
          words = words.map { case (syms, f) => (applyMergeLocal(syms, a, b), f) }
          rank += 1
          continue = rank < nMerges
        case None => continue = false
      }
    }
    learned.toSeq.toDF("merge_rank", "left", "right", "pair_count")
  }

  /** UTF-8 byte comparison — Spark's UTF8String (and DuckDB's) string
    * order; Java's UTF-16 compareTo disagrees for code points ≥ U+10000
    * vs [U+E000, U+FFFF].
    */
  private def utf8Compare(x: String, y: String): Int =
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Driver-local twin of [[mergePair]]'s greedy left-to-right scan
    * (non-overlapping: "aaa" under (a,a) → [aa, a]); TextSpec pins the
    * equivalence so train and the HOF spec cannot drift.
    */
  private[graft] def applyMergeLocal(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** The APPLY half of the tokenizer (model-as-data): segment text with
    * an already-LEARNED merge table — the step that actually runs over
    * 100 TB once a vocabulary is trained. Words tokenize to characters
    * and replay the merges in rank order with the SAME greedy
    * left-to-right scan as training ([[mergePair]] — one definition, so
    * train and apply cannot drift). The merge table's rows collect to
    * the driver (bounded BY CONSTRUCTION: nMerges rows — the model, not
    * the corpus) and compile into one chained fold expression, so
    * encoding is a pure scan-side projection: no join, no shuffle, the
    * corpus never moves.
    *
    * Output: one row per (doc, word) — (idCol, word_pos, w, subwords).
    */
  def encodeWords(docs: DataFrame, idCol: String, textCol: String, merges: DataFrame): DataFrame =
    encodeWith(docs, idCol, textCol, collectMerges(merges)) { ms =>
      // One codegen'd kernel call per word (graft.functions.BpeEncodeWord):
      // the merge list rides in as a reference object, so segmentation
      // stays inside WholeStageCodegen — ~5× faster than the chained-fold
      // spec below at 8 merges (each fold is an interpreted aggregate).
      graft.functions.GraftFunctions.bpeEncodeWord(col("w"), ms)
    }

  /** The composable chained-[[mergePair]] formulation — kept as the
    * executable SPEC of the BpeEncodeWord kernel (equivalence-tested in
    * TextSpec); training's greedy scan and this are one definition.
    */
  private[graft] def encodeWordsHof(
      docs: DataFrame, idCol: String, textCol: String, merges: DataFrame): DataFrame =
    encodeWith(docs, idCol, textCol, collectMerges(merges)) { ms =>
      val chars = transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1)))
      ms.foldLeft(chars) { case (syms, (a, b)) => mergePair(syms, a, b) }
    }

  /** Rank-ordered (left, right) pairs — the bounded model collect. */
  private def collectMerges(merges: DataFrame): Seq[(String, String)] =
    merges
      .select(col("merge_rank").cast("int"), col("left"), col("right"))
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq

  private def encodeWith(
      docs: DataFrame, idCol: String, textCol: String, ms: Seq[(String, String)])(
      seg: Seq[(String, String)] => Column): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("word_pos", "w")))
      .select(col(idCol), col("word_pos"), col("w"), seg(ms).as("subwords"))

  /** Greedy left-to-right merge of adjacent (a,b) → a+b, the standard
    * BPE scan (so "aaa" under (a,a) merges once, leaving [aa, a]),
    * expressed as an aggregate fold with (accumulated, pending) state.
    */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      struct(array().cast("array<string>").as("acc"), lit(null).cast("string").as("prev")),
      (st, x) => {
        val acc = st.getField("acc")
        val prev = st.getField("prev")
        when(prev.isNull, struct(acc.as("acc"), x.as("prev")))
          .when(prev === lit(a) && x === lit(b),
            struct(concat(acc, array(lit(a + b))).as("acc"), lit(null).cast("string").as("prev")))
          .otherwise(struct(concat(acc, array(prev)).as("acc"), x.as("prev")))
      },
      st =>
        when(st.getField("prev").isNull, st.getField("acc"))
          .otherwise(concat(st.getField("acc"), array(st.getField("prev")))),
    )
}
