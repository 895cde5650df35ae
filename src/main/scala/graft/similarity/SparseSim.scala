package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical similarity: TF-IDF-weighted cosine over word n-gram
  * shingles through an inverted index — the embedding-free k-nearest-
  * neighbor graph used by retrieval-style dedup and clustering when no
  * encoder is available (the lexical complement of `Ann`'s dense path).
  *
  * Scale shape (the reason this is an inverted index and not doc×doc):
  *  - pair generation shuffles the postings ONCE on the shingle and
  *    emits each a<b pair from the grouped posting list (successor
  *    slice — no self-join); per-term fan-out is bounded by `dfCap`²
  *    because ultra-common shingles are excluded from the vector space
  *    entirely (they carry ~zero IDF signal and would alone produce
  *    O(df²) candidate pairs — the same hot-set cut as `q_boilerplate`);
  *  - pair partial products combine map-side into the (doc_a, doc_b)
  *    aggregation, so the second shuffle carries one row per candidate
  *    pair, not one per shared term;
  *  - the per-doc top-k window is bounded: a doc's candidate list is at
  *    most Σ_{t ∈ doc} (df(t) − 1) ≤ distinct-terms · dfCap.
  *
  * Oracle-parity determinism (README rules): every cross-row double
  * summation — the squared-weight norm and the pair dot product — is
  * per-term quantized to decimal(28,12) (Spark `Cast` semantics) and
  * summed exactly, so accumulation order cannot move the result. All
  * remaining arithmetic is single IEEE ops on identical inputs.
  */
object SparseSim {

  /** L2-normalized TF-IDF postings `(doc_id, term, u)` over word
    * `shingleLen`-gram shingles; the vector space keeps shingles with
    * `df <= dfCap` (and `df < nDocs`, which a corpus-wide shingle would
    * hit). Docs with fewer than `shingleLen` tokens have no postings.
    */
  def postings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      dfCap: Int = 100): DataFrame =
    weighted(docs, idCol, textCol, shingleLen, dfCap)
      .select(col("doc_id"), col("term"), col("u"))

  /** The corpus half of INCREMENTAL lexical kNN: postings plus the frozen
    * IDF model carried as data — `(doc_id, term, u, df, n_docs)`, where
    * df/n_docs are the corpus-wide term stats the weights were computed
    * in. At 100 TB the index is written bucketed on `term`
    * (`core/Layout`), so each arriving batch joins against it without
    * reshuffling the corpus — the postings analogue of
    * [[graft.text.SubstringDedup.buildAnchorIndex]]'s anchor store and
    * [[NearDup.incrementalCandidates]]'s signature store. df is constant
    * per term (parquet dictionary-encodes it away), and carrying it makes
    * batch weighting a pure join — no per-batch corpus aggregation.
    */
  def buildPostingsIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      dfCap: Int = 100): DataFrame =
    weighted(docs, idCol, textCol, shingleLen, dfCap)

  private def weighted(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      dfCap: Int): DataFrame = {
    // Canonical tokenizer (trim + filter empties) — a raw split("\\s+")
    // keeps a leading "" token on text with leading whitespace, which
    // would silently change the shingle set vs the oracle's
    // list_filter(string_split_regex(trim(text),'\s+'), x <> '').
    // tf feeds BOTH the df aggregation and the weight join; w feeds BOTH
    // the norm aggregation and the postings join. Each is lazily
    // localCheckpointed (the NearDup discipline) — otherwise every
    // consumer re-expands the full tokenize→tf lineage and the corpus
    // is re-scanned per consumer (observed: 48 parquet scans in the
    // un-checkpointed q_sparse_topk plan). The returned postings are
    // NOT checkpointed: topKNeighbors consumes them exactly once
    // (successor-pair emission, no self-join); callers that fan out
    // should checkpoint at their own multi-consumer point.
    // r15 note (measured rejection, the window-norm precedent): folding
    // the norm into a per-doc collect_list aggregate (agg+join → one
    // exchange) A/B'd NEUTRAL on the postings build (1.62 vs 1.56 s)
    // and REGRESSED the multi-consumer pipelines (q_rbo 2.68 → 3.3–4.1,
    // q_sparse_incremental 2.93 → 4.0–4.6 s): the "saved" norms
    // exchange is partial-aggregated (one row per doc per map
    // partition, negligible bytes), while the fold trades the codegen'd
    // hash aggregate for an object-mode collect AND removes the `w`
    // checkpoint every fan-out consumer relied on. Shuffle BYTES do not
    // fall, so the 5→4-shuffle reading of the postings build
    // overcounted a tiny exchange. Kept: agg + join.
    val tf = termFreqs(docs, idCol, textCol, shingleLen)
      .localCheckpoint(eager = false)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = tf
      .join(df.filter(col("df") <= dfCap), Seq("term"))
      .crossJoin(broadcast(nDocs)) // in-plan scalar, no collect
      .filter(col("df") < col("n_docs"))
      .withColumn(
        "w",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .localCheckpoint(eager = false)
    val norms = w
      .groupBy("doc_id")
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(28,12)")).cast("double")).as("norm"))
    w.join(norms, Seq("doc_id"))
      .select(col("doc_id"), col("term"), (col("w") / col("norm")).as("u"),
        col("df"), col("n_docs"))
  }

  /** Per-doc term frequencies `(doc_id, term, tf)` — the shared front of
    * both the batch build and the incremental batch weighting.
    */
  private def termFreqs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    docs.select(
        col(idCol).as("doc_id"),
        explode(graft.functions.GraftFunctions.wordShingles(toks, shingleLen)).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
  }

  /** New-batch postings in a FROZEN model: each new doc is weighted with
    * the index's df/n_docs (model-as-data, the [[graft.text.NgramLm]]
    * discipline — scoring a batch must not silently refit the corpus
    * statistics). Terms absent from the index leave the vector space:
    * they carry no corpus-matching signal (no indexed doc has them) and
    * the frozen model has no IDF for them. Norms are over the doc's
    * model terms only, decimal-quantized exactly as [[postings]].
    *
    * Correct against a pruned OR unpruned index: pruning by term keeps
    * every (df, n_docs) row of the terms that can match, so the model
    * join sees identical stats either way.
    */
  def postingsInModel(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      shingleLen: Int = 3): DataFrame =
    postingsFromTf(termFreqs(newDocs, idCol, textCol, shingleLen), index)

  private def postingsFromTf(tf: DataFrame, index: DataFrame): DataFrame = {
    val model = index.select("term", "df", "n_docs").distinct()
    val w = tf
      .join(model, Seq("term"))
      .withColumn(
        "w",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
      .localCheckpoint(eager = false) // two consumers: norm agg + postings join
    val norms = w
      .groupBy("doc_id")
      .agg(sqrt(sum((col("w") * col("w")).cast("decimal(28,12)")).cast("double")).as("norm"))
    w.join(norms, Seq("doc_id"))
      .select(col("doc_id"), col("term"), (col("w") / col("norm")).as("u"))
  }

  /** Top-k neighbors of a NEW document batch against (a) the stored
    * postings index and (b) the batch itself — never corpus × corpus
    * (the standing corpus's internal pairs were found when the index was
    * built; re-finding them would redo the whole corpus's work every
    * batch — the [[NearDup.incrementalCandidates]] rule). Doc-id sets
    * must be disjoint.
    *
    * Scale shape: the index side is cut down by a broadcast of the
    * (small) batch's distinct terms BEFORE any shuffle, so per-batch
    * cost scales with the batch — ≤ |batch terms| · dfCap pruned
    * postings, df having been capped at build time. With a term-bucketed
    * index (`core/Layout.writeBucketed`) the index-side exchange of the
    * scoring join disappears entirely (LayoutSpec pins the exchange
    * count). Cross and batch-internal partial products union into ONE
    * map-side-combining (doc_a, doc_b) aggregation, then the bounded
    * per-doc top-k window — the [[topKNeighbors]] tail unchanged.
    *
    * Output matches [[topKNeighbors]]: `(doc_a, doc_b, n_shared, cos,
    * rn)` with doc_a ∈ newDocs; cosines are decimal-quantized per term
    * product, so a batch scored incrementally returns BIT-identical rows
    * to the same docs scored by the full machinery in the same model
    * (SimilaritySpec pins this).
    */
  def incrementalNeighbors(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      shingleLen: Int = 3,
      k: Int = 5): DataFrame = {
    val newTf = termFreqs(newDocs, idCol, textCol, shingleLen)
      .localCheckpoint(eager = false) // two consumers: term set + model weighting
    val batchTerms = newTf.select("term").distinct()
    // Index pruned to the batch's term set BEFORE any scoring join. The
    // index IS read twice (model distinct + scoring join) — deliberately
    // NOT checkpointed: materializing would capture batch-local
    // partitioning and discard the stored bucket layout, re-introducing
    // the index-side exchange a term-bucketed index exists to remove
    // (LayoutSpec pins the exchange count). The semi-join strategy is
    // AQE-decided, NOT a forced broadcast: a production batch's term set
    // is small and converts to a runtime broadcast for free, while a
    // corpus-proportional batch (the benchmark's 10% slice at sf10 —
    // millions of salted shingles) would OOM the driver as a forced
    // broadcast (r13 measured: 68 GB RSS, never completed).
    val idx = index.join(batchTerms, Seq("term"), "left_semi")
    val newP = postingsFromTf(newTf, idx)
      .localCheckpoint(eager = false) // two consumers: cross a-side + internal both sides
    val a = newP.select(col("term"), col("doc_id").as("doc_a"), col("u").as("ua"))
    val cross = a.join(
      idx.select(col("term"), col("doc_id").as("doc_b"), col("u").as("ub")),
      Seq("term"))
    val internal = a.join(
        newP.select(col("term"), col("doc_id").as("doc_b"), col("u").as("ub")),
        Seq("term"))
      .filter(col("doc_a") =!= col("doc_b"))
    val cand = cross.unionByName(internal)
      .groupBy("doc_a", "doc_b")
      .agg(
        count(lit(1)).as("n_shared"),
        sum((col("ua") * col("ub")).cast("decimal(28,12)")).cast("double").as("cos"))
    val win = Window.partitionBy("doc_a").orderBy(col("cos").desc, col("doc_b").asc)
    cand.withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
  }

  /** k-nearest-neighbor graph from an inverted index: cosine for every
    * pair sharing ≥1 term (computed once per unordered pair, mirrored
    * into both directions), then the top `k` neighbors per doc by
    * (cos desc, neighbor id asc). Output: `(doc_a, doc_b, n_shared,
    * cos, rn)`.
    */
  def topKNeighbors(postings: DataFrame, k: Int = 5): DataFrame = {
    // Successor-pair emission (the NearDup bucket pattern): ONE shuffle
    // groups each term's posting list, then every a<b pair falls out of
    // the graft_successor_pairs kernel + one builtin explode (r15: the
    // old posexplode + slice chain re-materialized the full posting
    // list per position — two Generate nodes and O(df²) array copies
    // per term; the kernel builds the pair array in one pass). No
    // self-join, no second exchange of the postings, and each unordered
    // pair is produced exactly once. List width is bounded by the
    // postings' dfCap, so per-row fan-out is ≤ cap(cap−1)/2.
    val pairs = postings
      .groupBy("term")
      .agg(collect_list(struct(col("doc_id"), col("u"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(array_sort(col("ps")).as("ps"))
      .select(explode(graft.functions.GraftFunctions.successorPairs(col("ps"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(
        count(lit(1)).as("n_shared"),
        sum((col("a.u") * col("b.u")).cast("decimal(28,12)")).cast("double").as("cos"))
    val sym = pairs.unionByName(
      pairs.select(
        col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b"),
        col("n_shared"),
        col("cos")))
    val win = Window.partitionBy("doc_a").orderBy(col("cos").desc, col("doc_b").asc)
    sym.withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
  }

  /** [[topKNeighbors]] restricted to a query subset: top-k TF-IDF cosine
    * neighbors (among ALL docs) for only the docs matching `isQuery` —
    * row-identical to `topKNeighbors(postings, k).filter(isQuery on
    * doc_a)`, but the pair space never forms for non-query anchors.
    *
    * Shape: asymmetric scoring — the query-side posting rows join the
    * full postings on term, so the per-term fan-out is |Q∩term|·df
    * instead of the successor-pair df²/2, and the top-k window runs over
    * query anchors only. With a q-fraction query set that is ~2q× the
    * symmetric cost (each kept pair is now formed from both sides
    * instead of once), a large win whenever q ≪ 1/2 — q_rbo's 1/17
    * sample cuts the lex pipeline ~8×. Per-pair cosine is the same
    * order-free decimal sum, so results are bit-identical to the
    * symmetric path.
    */
  def topKNeighborsFor(postings: DataFrame, isQuery: Column, k: Int = 5): DataFrame = {
    val a = postings.filter(isQuery)
      .select(col("term"), col("doc_id").as("doc_a"), col("u").as("ua"))
    val cand = a
      .join(postings.select(col("term"), col("doc_id").as("doc_b"), col("u").as("ub")), Seq("term"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(
        count(lit(1)).as("n_shared"),
        sum((col("ua") * col("ub")).cast("decimal(28,12)")).cast("double").as("cos"))
    val win = Window.partitionBy("doc_a").orderBy(col("cos").desc, col("doc_b").asc)
    cand.withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
  }

  /** BM25 retrieval: score every corpus document against a (small) query
    * set through the same inverted-postings machinery as [[topKNeighbors]],
    * with Okapi BM25 term weighting instead of TF-IDF cosine — the
    * ranking function retrieval-style decontamination and seed-document
    * expansion actually use (a raw cosine over-rewards long documents;
    * BM25's `b`-controlled length normalization is the standard fix).
    *
    * Per matched term `t` of query `q` in document `d`:
    * {{{ idf(t) * tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·dl(d)/avgdl)) }}}
    * with the Robertson–Sparck-Jones smoothed idf
    * `ln(1 + (N − df + 0.5)/(df + 0.5))` — strictly positive, so a
    * corpus-wide term degrades to near-zero signal instead of flipping
    * the ranking sign. Query-side tf is ignored (binary query model):
    * queries here are documents, and repeating a word in a seed doc
    * should not multiply its retrieval weight.
    *
    * Scale shape: the postings build is one shuffle (tf groupBy) plus
    * broadcast scalars for (N, avgdl); `dfCap` cuts hot terms out of the
    * vector space exactly as in [[postings]], bounding per-term fan-out.
    * The query term set is broadcast into the scoring join — the corpus
    * postings NEVER shuffle on account of the query batch — and the
    * (q_id, doc_b) aggregation combines map-side, so the one shuffle
    * after the scan carries one row per (query, candidate) pair. Per-term
    * scores are decimal(28,12)-quantized before the exact sum (README
    * determinism rules), so the DuckDB oracle is hash-exact.
    *
    * Output: `(q_id, doc_b, n_shared, score, rn)`, `rn <= k` per query,
    * ties broken by ascending `doc_b`; self-matches excluded.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isQuery: Column,
      shingleLen: Int = 2,
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      dfCap: Int = 100): DataFrame =
    // One definition of the BM25 machinery (build + score) — the
    // self-retrieval entry is literally the incremental pair composed,
    // so the one-shot and standing-index paths cannot drift.
    bm25Retrieve(docs.filter(isQuery), idCol, textCol,
      buildBm25Index(docs, idCol, textCol, shingleLen, dfCap),
      shingleLen, k, k1, b)

  /** The standing half of INCREMENTAL BM25 retrieval: dfCap'd postings
    * with the frozen corpus statistics carried AS DATA — `(doc_id, term,
    * tf, dl, df, n_docs, avgdl)`. Store term-bucketed (`core/Layout`) and
    * every arriving query batch joins it without reshuffling the corpus —
    * the BM25 analogue of [[buildPostingsIndex]]'s frozen-IDF store. df
    * and the two scalars are constant per term/row (parquet dictionary-
    * encodes them away); carrying them makes batch scoring pure joins,
    * no per-batch corpus aggregation (the NgramLm model-as-data rule:
    * scoring a batch must not silently refit corpus statistics).
    */
  def buildBm25Index(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 2,
      dfCap: Int = 100): DataFrame =
    bm25IndexFrom(
      bm25DocLengths(docs, idCol, textCol, shingleLen),
      bm25RawPostings(docs, idCol, textCol, shingleLen),
      dfCap)

  /** The APPEND-ONLY raw halves of a BM25 store, split out so a standing
    * index can be MAINTAINED under ingest (streaming/DocsStream
    * .bm25IndexAppender): both are pure per-document functions — no
    * corpus statistic touches them — so appending a batch's rows never
    * rewrites existing rows, and corpus-global stats (df, n_docs, avgdl)
    * derive at SNAPSHOT time from the accumulated store
    * ([[bm25IndexFrom]]). Maintained-store ≡ batch-rebuild equality is
    * pinned in StreamingSpec.
    *
    * [[bm25DocLengths]]: (doc_id, dl) for EVERY doc — zero-term docs
    * must still count in n_docs/avgdl. dl is the doc's SHINGLE count
    * (the length BM25 normalizes by must count the same units tf does);
    * greatest(…, 0): size() of a null array is -1 and the oracle's
    * COALESCE(GREATEST(len-…, 0), 0) must see the same 0.
    */
  def bm25DocLengths(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 2): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      greatest(size(graft.functions.GraftFunctions.wordShingles(toks, shingleLen)), lit(0))
        .as("dl"))
  }

  /** (doc_id, term, tf) — term rows only. Terms are word shingleLen-grams
    * (the SparseSim vector space, not bare unigrams): unigram df over a
    * small-vocabulary corpus puts every term above dfCap and empties the
    * index; shingles keep df in the discriminative range.
    */
  def bm25RawPostings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 2): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    docs
      .select(
        col(idCol).as("doc_id"),
        explode(graft.functions.GraftFunctions.wordShingles(toks, shingleLen)).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
  }

  /** Snapshot a scoreable index out of the raw halves: derive df /
    * n_docs / avgdl from the accumulated store and attach them as data
    * columns — the [[buildBm25Index]] schema, byte-for-byte. Stats are
    * derived, never stored, so the append path has nothing to go stale.
    */
  def bm25IndexFrom(docLengths: DataFrame, rawPostings: DataFrame, dfCap: Int = 100): DataFrame = {
    val lengths = docLengths.localCheckpoint(eager = false) // two consumers: stats + join
    val tf = rawPostings.localCheckpoint(eager = false) // two consumers: df agg + postings
    val stats = lengths.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfs.filter(col("df") <= dfCap), Seq("term"))
      .join(lengths, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select("doc_id", "term", "tf", "dl", "df", "n_docs", "avgdl")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009): combine any
    * number of ranked retrieval lists into one, scoring each (query,
    * doc) as Σ over lists of `1/(c + rank)` — the standard hybrid-
    * retrieval merge (lexical BM25 + a second ranker here; dense + sparse
    * in an encoder stack) that needs NO score calibration between lists,
    * only ranks. `c = 60` is the paper's constant.
    *
    * Inputs must share columns (q_id, doc_b, rn); a doc missing from a
    * list simply contributes nothing (the RRF convention). Scale shape:
    * the union is k·|lists| rows per query and the groupBy combines
    * map-side — cost scales with the fused lists, never the corpus.
    * Determinism: each contribution is decimal-quantized before the
    * exact sum (README oracle-parity rules), ties break by doc_b.
    * Output: (q_id, doc_b, n_lists, rrf, rn), top `k` per query.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 5, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = lists.map(_.select(
      col("q_id"), col("doc_b"),
      (lit(1.0) / (lit(c) + col("rn"))).cast("decimal(18,12)").as("contrib")))
    val scored = contribs.reduce(_.unionByName(_))
      .groupBy("q_id", "doc_b")
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("rrfd"))
    val win = Window.partitionBy("q_id").orderBy(col("rrfd").desc, col("doc_b").asc)
    scored
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("doc_b"), col("n_lists"),
        col("rrfd").cast("double").as("rrf"), col("rn"))
  }

  /** Score a (small) query batch against a standing [[buildBm25Index]]:
    * per query the top `k` indexed docs by BM25, in the index's FROZEN
    * model — query terms absent from the index leave the space (no
    * indexed doc has them; the frozen model has no df for them).
    *
    * Scale shape: the batch's distinct term set is broadcast into the
    * index join, so per-batch cost is ≤ |batch terms| · dfCap pruned
    * postings and the corpus-scale index never shuffles on account of
    * one batch — with a term-bucketed store the index-side exchange
    * disappears entirely (LayoutSpec pins the exchange count for the
    * sibling postings index; the same layout serves both). Output:
    * `(q_id, doc_b, n_shared, score, rn)` exactly as [[bm25TopK]].
    * Each query's rows depend ONLY on (query, index) — scoring a batch
    * in any number of sub-batches returns bit-identical rows
    * (SimilaritySpec pins split-batch equality and the frozen-model
    * scores against a driver-side corpus-stats reference).
    */
  def bm25Retrieve(
      queries: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      shingleLen: Int = 2,
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    val qterms = queries
      .select(
        col(idCol).as("q_id"),
        explode(graft.functions.GraftFunctions.wordShingles(toks, shingleLen)).as("term"))
      .distinct()
    val perTerm = index
      // AQE-decided: a handful of queries broadcast at runtime; a
      // corpus-proportional query batch must not be forced to
      .join(qterms, Seq("term"))
      .filter(col("doc_id") =!= col("q_id")) // overlap-safe self-exclusion
      .withColumn(
        "idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn(
        "contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = perTerm
      .groupBy(col("q_id"), col("doc_id").as("doc_b"))
      .agg(
        count(lit(1)).as("n_shared"),
        sum(col("contrib").cast("decimal(28,12)")).cast("double").as("score"))
    val win = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_b").asc)
    scored.withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
  }
}
