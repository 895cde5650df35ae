package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al., "Scaling Up All Pairs Similarity
  * Search", WWW'07). The lossless, exact counterpart to the probabilistic
  * MinHash-LSH path in [[NearDup]]: every pair with Jaccard ≥ t is
  * returned, with its exact intersection/union counts.
  *
  * Losslessness of the prefix filter: if J(A,B) ≥ t then |A∩B| ≥ t·|A∪B|
  * ≥ t·|A|, i.e. the overlap is at least o = ceil(t·|A|). Order every set
  * by one shared total order; if A and B shared NONE of A's first
  * |A| − o + 1 tokens, all o overlapping tokens would have to sit in A's
  * last o − 1 positions — pigeonhole contradiction. So emitting only the
  * first |A| − ceil(t·|A|) + 1 tokens of each set as join keys loses no
  * qualifying pair (the correctness gate proves this empirically: the
  * DuckDB oracle is the brute-force all-pairs join).
  *
  * Scale design (the whole point of the prefix filter at 100 TB):
  *  - The shared order is (global df ASC, token ASC) — rarest-first. The
  *    prefix therefore holds each document's RAREST tokens, which bounds
  *    the per-token candidate fan-out by construction; frequent tokens
  *    never become join keys.
  *  - No global rank is materialized: the order key (df, token) attaches
  *    with one keyed join and each document sorts ITS OWN array — there
  *    is no window over the token dictionary (which at corpus scale is
  *    tens of millions of rows).
  *  - Candidates shuffle on prefix token only; the doc×doc space is never
  *    formed. Verification joins the bounded candidate set back to the
  *    sorted arrays (two keyed joins) and computes |A∩B| per pair.
  *  - The threshold test stays in the integer domain: inter ≥ t·union as
  *    ONE IEEE multiply+compare of exact ints — bit-equal across engines.
  */
object SetSimJoin {

  /** All pairs (a < b) with Jaccard(tokenSet_a, tokenSet_b) ≥ t.
    *
    * @param tokenSet array column; de-duplicated internally. Empty sets
    *                 never match (J undefined) and are dropped up front.
    * @return (doc_a, doc_b, inter, un, jaccard) — exact counts; jaccard
    *         is one IEEE division of them.
    */
  def selfJoin(df: DataFrame, id: Column, tokenSet: Column, t: Double): DataFrame = {
    require(t > 0.0 && t < 1.0, s"threshold must be in (0,1), got $t")
    val base = df
      .select(id.as("sid"), array_distinct(tokenSet).as("ts"))
      .filter(size(col("ts")) > 0)
    val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfr"))
    val ordered = toks
      .join(dfreq, "tok")
      .groupBy("sid")
      .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
      .select(
        col("sid"),
        transform(col("pairs"), e => e.getField("tok")).as("arr"),
        size(col("pairs")).as("m"))
      .withColumn("p", col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))
    // `ordered` has four consumers (both prefix sides + both verify
    // sides) and the plan audit shows the scan recomputed for each —
    // deliberately NOT localCheckpointed: measured at sf1, materializing
    // the fat sorted-array rows costs 2× more (5.6 → 11.3 s) than
    // re-running the thin scan+explode pipelines, which stay inside
    // whole-stage codegen with broadcast dims. The multi-consumer
    // checkpoint discipline applies to REUSED SMALL state, not to
    // array-wide intermediates cheaper to rebuild than to store.
    // Prefix rows carry the token's POSITION and the set size so two
    // PPJoin-style prunes run inside the candidate join, BEFORE the
    // distinct and the array-verify step:
    //  - length filter: J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|);
    //  - positional filter: a pair first meeting at positions (i, j) can
    //    overlap at most 1 + min(|A|−i, |B|−j), which must reach the
    //    equivalent-overlap bound t/(1+t)·(|A|+|B|).
    // Both are Spark-side pruning only — the DuckDB oracle stays the
    // brute-force join, so the gate keeps proving losslessness. The ε
    // guard keeps borderline pairs: a false KEEP costs one verify row, a
    // false PRUNE would cost a result.
    val prefix = ordered.select(
      col("sid"), col("m"),
      posexplode(slice(col("arr"), lit(1), col("p"))).as(Seq("pos", "tok")))
    val cands = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.tok") === col("b.tok") && col("a.sid") < col("b.sid")
          && col("b.m").cast("double") >= lit(t) * col("a.m").cast("double") - lit(1e-9)
          && col("a.m").cast("double") >= lit(t) * col("b.m").cast("double") - lit(1e-9)
          && (lit(1) + least(col("a.m") - col("a.pos") - 1, col("b.m") - col("b.pos") - 1))
               .cast("double") >=
             lit(t / (1.0 + t)) * (col("a.m") + col("b.m")).cast("double") - lit(1e-9))
      .select(col("a.sid").as("da"), col("b.sid").as("db"))
      .distinct()
    cands
      .join(ordered.select(col("sid").as("da"), col("arr").as("aa"), col("m").as("ma")), "da")
      .join(ordered.select(col("sid").as("db"), col("arr").as("ab"), col("m").as("mb")), "db")
      .withColumn("inter", size(array_intersect(col("aa"), col("ab"))))
      .withColumn("un", col("ma") + col("mb") - col("inter"))
      .filter(col("inter").cast("double") >= lit(t) * col("un").cast("double"))
      .select(
        col("da").as("doc_a"), col("db").as("doc_b"),
        col("inter").cast("long").as("inter"),
        col("un").cast("long").as("un"),
        (col("inter").cast("double") / col("un").cast("double")).as("jaccard"))
  }

  /** The STANDING half of incremental set-similarity: each corpus set
    * stored with its tokens sorted under the then-current (df ASC, token
    * ASC) order, plus that token order itself as data — `(sid, arr, m)`
    * and the frozen `(tok, dfr)` dictionary. The key property making a
    * frozen order safe: prefix-filter losslessness holds under ANY shared
    * total order (the pigeonhole argument never uses what df means), so
    * corpus drift degrades only the FILTER's selectivity, never recall —
    * the standing index stays exact forever, it just prunes a little
    * worse as true frequencies drift. (The NgramLm model-as-data rule:
    * scoring a batch must not silently refit corpus statistics.)
    */
  def buildIndex(df: DataFrame, id: Column, tokenSet: Column): (DataFrame, DataFrame) = {
    val base = df
      .select(id.as("sid"), array_distinct(tokenSet).as("ts"))
      .filter(size(col("ts")) > 0)
    // r14: the two returned halves materialize as SEPARATE checkpoint
    // actions, so in-plan exchange reuse cannot share the tokenize+explode
    // subtree between them — checkpoint the thin (sid, tok) stream once
    // (idle A/B: build 1.62 → 1.19 s). The one-shot joins keep their
    // no-checkpoint design: all their consumers live in ONE plan, where
    // ReuseExchange already dedupes the heavy aggregates.
    val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
      .localCheckpoint(false)
    val dict = toks.groupBy("tok").agg(count(lit(1)).as("dfr"))
    val ordered = toks
      .join(dict, "tok")
      .groupBy("sid")
      .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
      .select(
        col("sid"),
        transform(col("pairs"), e => e.getField("tok")).as("arr"),
        size(col("pairs")).as("m"))
    // Checkpointed: a STANDING index is read from storage in production;
    // in-session both halves have two consumers each (prefix emission +
    // verify partner / dict prune + order join) and must not re-run the
    // corpus groupBy per consumer.
    (ordered.localCheckpoint(false), dict.localCheckpoint(false))
  }

  /** Incremental set-similarity: all qualifying pairs touching the batch
    * — batch×index and batch×batch; index×index pairs are NEVER re-formed
    * (they were emitted when their rows arrived). Batch sets sort under
    * the FROZEN dictionary order, with unseen tokens taking df = 0 — they
    * sort rarest-first, which is both consistent (any shared total order
    * preserves losslessness, see [[buildIndex]]) and efficient (a token
    * the corpus has never seen is maximally selective). Output ids are
    * (batch id, partner id) with a side marker instead of an id-ordered
    * pair, so a batch row never needs the index side's id range.
    */
  def selfJoinIncrement(
      batch: DataFrame,
      id: Column,
      tokenSet: Column,
      index: (DataFrame, DataFrame),
      t: Double): DataFrame = {
    require(t > 0.0 && t < 1.0, s"threshold must be in (0,1), got $t")
    val (idxSets, dict) = index
    val base = batch
      .select(id.as("sid"), array_distinct(tokenSet).as("ts"))
      .filter(size(col("ts")) > 0)
    val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
    // The batch vocabulary feeds TWO semi-joins (dictionary prune +
    // index-prefix prune below) — checkpoint the distinct set once (the
    // containmentIncrement discipline). NO forced broadcast hint — AQE
    // broadcasts at runtime when the batch vocabulary is genuinely small
    // (the production shape) and falls back to a shuffled semi when a
    // corpus-proportional batch would otherwise OOM the driver (the r13
    // sf10 lesson: a forced batch-vocab broadcast at 100x sat at 68 GB
    // RSS without completing).
    val batchVocab = toks.select("tok").distinct().localCheckpoint(false)
    // Dictionary pruned to the batch's vocabulary first: the corpus-scale
    // token dictionary never joins whole.
    val dictPruned = dict.join(batchVocab, Seq("tok"), "left_semi")
    val ordered = toks
      .join(dictPruned, Seq("tok"), "left")
      .withColumn("dfr", coalesce(col("dfr"), lit(0L)))
      .groupBy("sid")
      .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
      .select(
        col("sid"),
        transform(col("pairs"), e => e.getField("tok")).as("arr"),
        size(col("pairs")).as("m"))
      .withColumn("p", col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))
      .localCheckpoint(false) // consumers: batch prefix, internal join, verify
    val bPrefix = ordered.select(
      col("sid"), col("m"),
      posexplode(slice(col("arr"), lit(1), col("p"))).as(Seq("pos", "tok")))
    // Index-side prefixes from the STORED arrays — same prefix rule, no
    // index-side recompute of order — PRUNED to the batch vocabulary
    // before they shuffle (r15, the containmentIncrement pattern): a
    // candidate needs a.tok = b.tok and every probe token is a batch
    // token by construction, so dropping index prefix rows outside the
    // batch vocabulary loses nothing while the index-side exchange
    // shrinks from corpus-proportional to batch-proportional — at
    // production batch ≪ index ratios this is the dominant join input
    // (guide §3.2: reduce the big side before shuffling it).
    val iPrefix = idxSets
      .withColumn("p", col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))
      .select(col("sid"), col("m"),
        posexplode(slice(col("arr"), lit(1), col("p"))).as(Seq("pos", "tok")))
      .join(batchVocab, Seq("tok"), "left_semi")
    // The selfJoin PPJoin prunes (length + positional, ε-guarded — see
    // there) applied inside both candidate joins.
    val prune =
      col("b.m").cast("double") >= lit(t) * col("a.m").cast("double") - lit(1e-9) &&
        col("a.m").cast("double") >= lit(t) * col("b.m").cast("double") - lit(1e-9) &&
        (lit(1) + least(col("a.m") - col("a.pos") - 1, col("b.m") - col("b.pos") - 1))
          .cast("double") >=
          lit(t / (1.0 + t)) * (col("a.m") + col("b.m")).cast("double") - lit(1e-9)
    // FUSED candidate + verify (r14): the cross (batch×index) and
    // internal (batch×batch) pipelines used to run as two separate
    // join+distinct+verify chains — ~8 operators for rows the SAME probe
    // prefix generates. Doc-id disjointness (the documented contract)
    // makes the partner's side a FUNCTION of its id, so one union'd
    // postings side with an origin flag produces the identical candidate
    // set in ONE join (the internal a<b order constraint applies only to
    // batch-side partners), and one verify pair of joins against the
    // union'd set store replays the identical arithmetic. Row-identical
    // to the two-pipeline formulation (SimilaritySpec's incremental pins
    // cover both sides).
    val posts = iPrefix.withColumn("bidx", lit(true))
      .unionByName(bPrefix.withColumn("bidx", lit(false)))
    val cand = bPrefix.alias("a")
      .join(posts.alias("b"), col("a.tok") === col("b.tok") &&
        (col("b.bidx") || col("a.sid") < col("b.sid")) && prune)
      .select(col("a.sid").as("da"), col("b.sid").as("db"), col("b.bidx").as("bidx"))
      .distinct()
    val allSets = idxSets.select(col("sid"), col("arr"), col("m"))
      .unionByName(ordered.select(col("sid"), col("arr"), col("m")))
    cand
      .join(ordered.select(col("sid").as("da"), col("arr").as("aa"), col("m").as("ma")), "da")
      .join(allSets.select(col("sid").as("db"), col("arr").as("ab"), col("m").as("mb")), "db")
      .withColumn("inter", size(array_intersect(col("aa"), col("ab"))))
      .withColumn("un", col("ma") + col("mb") - col("inter"))
      .filter(col("inter").cast("double") >= lit(t) * col("un").cast("double"))
      .select(
        col("da").as("batch_id"), col("db").as("partner_id"),
        when(col("bidx"), lit("index")).otherwise(lit("batch")).as("side"),
        col("inter").cast("long").as("inter"),
        col("un").cast("long").as("un"),
        (col("inter").cast("double") / col("un").cast("double")).as("jaccard"))
  }

  /** Directed containment self-join: all (a, b), a ≠ b, with
    * |A∩B| / |A| ≥ t — "A is (mostly) contained in B", the quote/subset
    * detector the symmetric Jaccard join cannot express (a short quote
    * inside a long document has tiny Jaccard but containment ≈ 1).
    *
    * Prefix filtering adapts ASYMMETRICALLY: only the probe side A can
    * be prefixed (overlap ≥ ceil(t·|A|), so A's first
    * |A| − ceil(t·|A|) + 1 rarest tokens must hit any qualifying B —
    * the same pigeonhole as [[selfJoin]]); containment puts no lower
    * bound on |A∩B|/|B|, so B indexes ALL its tokens. The rarest-first
    * shared order is what keeps that tractable: A's prefix holds rare
    * tokens, and the candidate list for a rare token is short by
    * definition — its length IS the token's df. One length prune
    * survives the asymmetry (B must hold the overlap: |B| ≥ ceil(t·|A|)),
    * ε-guarded like the PPJoin prunes. The DuckDB oracle is the
    * brute-force directed all-pairs join, so the gate re-proves
    * losslessness every run.
    */
  def containmentJoin(df: DataFrame, id: Column, tokenSet: Column, t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    val base = df
      .select(id.as("sid"), array_distinct(tokenSet).as("ts"))
      .filter(size(col("ts")) > 0)
    val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfr"))
    val ordered = toks
      .join(dfreq, "tok")
      .groupBy("sid")
      .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
      .select(
        col("sid"),
        transform(col("pairs"), e => e.getField("tok")).as("arr"),
        size(col("pairs")).as("m"))
    // Same no-checkpoint decision as selfJoin: thin scan pipelines are
    // cheaper to re-run than fat sorted-array rows are to store.
    // BOTH sides carry their position in the shared sorted order, so
    // the PPJoin positional prune applies despite the asymmetry: a pair
    // first meeting at positions (i, j) can overlap at most
    // 1 + min(|A|−i−1, |B|−j−1), which must reach ceil(t·|A|) — the
    // earliest-common-token row always survives, so candidates are
    // never lost (ε-guarded like selfJoin's prunes).
    val prefix = ordered.select(
      col("sid"), col("m"),
      posexplode(slice(col("arr"), lit(1),
        col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))).as(Seq("pos", "tok")))
    val postings = ordered.select(
      col("sid").as("bsid"), col("m").as("mb"),
      posexplode(col("arr")).as(Seq("posb", "tok")))
    val cands = prefix
      .join(postings, Seq("tok"))
      .filter(col("sid") =!= col("bsid") &&
        col("mb").cast("double") >=
          ceil(lit(t) * col("m").cast("double")) - lit(1e-9) &&
        (lit(1) + least(col("m") - col("pos") - 1, col("mb") - col("posb") - 1))
          .cast("double") >=
          ceil(lit(t) * col("m").cast("double")) - lit(1e-9))
      .select(col("sid").as("da"), col("bsid").as("db"))
      .distinct()
    cands
      .join(ordered.select(col("sid").as("da"), col("arr").as("aa"), col("m").as("ma")), "da")
      .join(ordered.select(col("sid").as("db"), col("arr").as("ab")), "db")
      .withColumn("inter", size(array_intersect(col("aa"), col("ab"))))
      .filter(col("inter").cast("double") >= lit(t) * col("ma").cast("double"))
      .select(
        col("da").as("doc_a"), col("db").as("doc_b"),
        col("inter").cast("long").as("inter"),
        col("ma").cast("long").as("size_a"),
        (col("inter").cast("double") / col("ma").cast("double")).as("containment"))
  }

  /** Incremental containment against a [[buildIndex]] standing store —
    * all directed pairs touching the batch, in BOTH directions
    * (index×index pairs were emitted when their rows arrived):
    *  - `batch_in_index`: a new document (mostly) contained in an
    *    indexed one — "this upload is a quote of something we hold";
    *  - `index_in_batch`: an indexed document contained in the new one
    *    — "this upload swallowed something we hold";
    *  - `batch_in_batch`: containment inside the batch itself.
    * Probe sides prefix under the FROZEN dictionary order (unseen
    * tokens df = 0 — the selfJoinIncrement rule; losslessness holds
    * under any shared total order, so drift degrades pruning, never
    * recall); the non-probe side always contributes FULL postings, per
    * the containment asymmetry (see [[containmentJoin]]). The
    * index-as-probe join keeps the index side bounded by semi-joining
    * its postings to the batch vocabulary first.
    */
  def containmentIncrement(
      batch: DataFrame,
      id: Column,
      tokenSet: Column,
      index: (DataFrame, DataFrame),
      t: Double): DataFrame = {
    require(t > 0.0 && t <= 1.0, s"threshold must be in (0,1], got $t")
    val (idxSets, dict) = index
    val base = batch
      .select(id.as("sid"), array_distinct(tokenSet).as("ts"))
      .filter(size(col("ts")) > 0)
    val toks = base.select(col("sid"), explode(col("ts")).as("tok"))
    // The batch vocabulary feeds THREE semi-joins (dictionary prune,
    // index postings, index prefixes) — checkpoint the distinct set once
    // instead of re-running the batch explode per consumer. No forced
    // broadcast on any of them: AQE broadcasts small batch vocabularies
    // at runtime and shuffles corpus-proportional ones (see
    // selfJoinIncrement — the r13 sf10 lesson).
    val batchVocab = toks.select("tok").distinct().localCheckpoint(false)
    val dictPruned = dict.join(batchVocab, Seq("tok"), "left_semi")
    val ordered = toks
      .join(dictPruned, Seq("tok"), "left")
      .withColumn("dfr", coalesce(col("dfr"), lit(0L)))
      .groupBy("sid")
      .agg(sort_array(collect_list(struct(col("dfr"), col("tok")))).as("pairs"))
      .select(
        col("sid"),
        transform(col("pairs"), e => e.getField("tok")).as("arr"),
        size(col("pairs")).as("m"))
      .localCheckpoint(false) // prefix + postings + both verify partners
    def prefixOf(sets: DataFrame) = sets.select(
      col("sid"), col("m"),
      posexplode(slice(col("arr"), lit(1),
        col("m") - ceil(lit(t) * col("m")).cast("int") + lit(1))).as(Seq("pos", "tok")))
    def postingsOf(sets: DataFrame) = sets.select(
      col("sid").as("bsid"), col("m").as("mb"),
      posexplode(col("arr")).as(Seq("posb", "tok")))
    // length prune + the positional bound (see containmentJoin)
    val lenPrune =
      col("mb").cast("double") >= ceil(lit(t) * col("m").cast("double")) - lit(1e-9) &&
        (lit(1) + least(col("m") - col("pos") - 1, col("mb") - col("posb") - 1))
          .cast("double") >=
          ceil(lit(t) * col("m").cast("double")) - lit(1e-9)
    // index postings restricted to the batch vocabulary: a standing
    // store's token lists only join where the batch can actually hit
    // (AQE-decided join strategy, same rationale as above)
    val iPosts = postingsOf(idxSets)
      .join(batchVocab, Seq("tok"), "left_semi")
    val iPrefix = prefixOf(idxSets)
      .join(batchVocab, Seq("tok"), "left_semi")
    // FUSED candidate + verify (r14): the three directed pipelines
    // (batch_in_index / index_in_batch / batch_in_batch) each ran their
    // own join + distinct + two verify joins — 12 operators for
    // candidates one union'd join produces. Doc-id disjointness (the
    // documented contract) makes each side label a FUNCTION of
    // (da, db) membership, so: probe = batch prefixes ∪ (vocab-pruned)
    // index prefixes, posts = batch postings ∪ (vocab-pruned) index
    // postings, one candidate join with the index×index combination
    // filtered out (those pairs were emitted when their rows arrived),
    // one verify against the union'd set store, side derived from the
    // origin flags. Row-identical to the three-pipeline formulation
    // (SimilaritySpec's containment pins cover all three sides).
    val probe = prefixOf(ordered).withColumn("pidx", lit(false))
      .unionByName(iPrefix.withColumn("pidx", lit(true)))
    val posts = postingsOf(ordered).withColumn("bidx", lit(false))
      .unionByName(iPosts.withColumn("bidx", lit(true)))
    val cand = probe
      .join(posts, Seq("tok"))
      .filter(col("sid") =!= col("bsid") && !(col("pidx") && col("bidx")) && lenPrune)
      .select(col("sid").as("da"), col("bsid").as("db"), col("pidx"), col("bidx"))
      .distinct()
    val allSets = idxSets.select(col("sid"), col("arr"), col("m"))
      .unionByName(ordered.select(col("sid"), col("arr"), col("m")))
    cand
      .join(allSets.select(col("sid").as("da"), col("arr").as("aa"), col("m").as("ma")), "da")
      .join(allSets.select(col("sid").as("db"), col("arr").as("ab")), "db")
      .withColumn("inter", size(array_intersect(col("aa"), col("ab"))))
      .filter(col("inter").cast("double") >= lit(t) * col("ma").cast("double"))
      .select(
        col("da").as("doc_a"), col("db").as("doc_b"),
        when(!col("pidx") && col("bidx"), lit("batch_in_index"))
          .when(col("pidx") && !col("bidx"), lit("index_in_batch"))
          .otherwise(lit("batch_in_batch")).as("side"),
        col("inter").cast("long").as("inter"),
        col("ma").cast("long").as("size_a"),
        (col("inter").cast("double") / col("ma").cast("double")).as("containment"))
  }
}
