package graft.similarity

import org.apache.spark.sql.DataFrame
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
      dfCap: Int = 100): DataFrame = {
    // Canonical tokenizer (trim + filter empties) — a raw split("\\s+")
    // keeps a leading "" token on text with leading whitespace, which
    // would silently change the shingle set vs the oracle's
    // list_filter(string_split_regex(trim(text),'\s+'), x <> '').
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    val terms = docs.select(
      col(idCol).as("doc_id"),
      explode(graft.functions.GraftFunctions.wordShingles(toks, shingleLen)).as("term"))
    // tf feeds BOTH the df aggregation and the weight join; w feeds BOTH
    // the norm aggregation and the postings join. Each is lazily
    // localCheckpointed (the NearDup discipline) — otherwise every
    // consumer re-expands the full tokenize→tf lineage and the corpus
    // is re-scanned per consumer (observed: 48 parquet scans in the
    // un-checkpointed q_sparse_topk plan). The returned postings are
    // NOT checkpointed: topKNeighbors consumes them exactly once
    // (successor-pair emission, no self-join); callers that fan out
    // should checkpoint at their own multi-consumer point.
    val tf = terms
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
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
      .select(col("doc_id"), col("term"), (col("w") / col("norm")).as("u"))
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
    // posexplode + a successor slice — codegen'd Generates, no
    // self-join, no second exchange of the postings, and each unordered
    // pair is produced exactly once. List width is bounded by the
    // postings' dfCap, so per-row fan-out is ≤ cap(cap−1)/2.
    val pairs = postings
      .groupBy("term")
      .agg(collect_list(struct(col("doc_id"), col("u"))).as("ps"))
      .filter(size(col("ps")) >= 2)
      .select(array_sort(col("ps")).as("ps"))
      .select(posexplode(col("ps")).as(Seq("pos", "a")), col("ps"))
      .select(col("a"), explode(slice(col("ps"), col("pos") + 2, size(col("ps")))).as("b"))
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
}
