package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example construction over a document corpus — the two
  * layout steps between "cleaned documents" and "model input":
  * fixed-context sequence packing (pretraining) and overlapping token
  * chunking (RAG / retrieval indexing). Both are pure dataflow: no
  * UDFs, no driver loops, no corpus collects.
  */
object Packing {

  /** GPT-style concat-and-split sequence packing: documents are laid
    * end-to-end (each contributing `n_tokens + 1` — one EOS separator
    * after every doc) on a per-shard token stream, and the stream is cut
    * into fixed `ctxLen` windows ("bins" — the training examples).
    * Documents may straddle a cut, exactly as pretraining packers leave
    * them (no padding waste; `straddles` marks the affected docs).
    *
    * Determinism and scale shape: a single GLOBAL token stream would be
    * one window partition — a serial scan no cluster can parallelize —
    * so the corpus shards by md5 of the id into `shards` independent
    * streams first (what any distributed packer does: shard, pack within
    * shard), and each shard orders by (md5 rank, id). One hash shuffle
    * into `shards`-way windows; everything else is scan-side arithmetic.
    * Size `shards` to the cluster's parallelism at 100 TB.
    *
    * Null/empty documents drop (nothing to pack). Output: one row per
    * doc — (idCol, shard, n_tokens, tok_start, bin_first, bin_last,
    * straddles), token offsets shard-local, EOS included in the stream
    * (bin_last is the bin of the doc's final content-or-EOS token).
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ctxLen: Int,
      shards: Int,
  ): DataFrame = {
    require(ctxLen >= 2, s"ctxLen must be >= 2, got $ctxLen")
    require(shards >= 1 && shards <= 65536, s"shards in [1,65536], got $shards")
    val rank = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("__rank"), col(idCol))
    docs
      .select(
        col(idCol),
        size(TextAnalysis.tokens(col(textCol))).as("n_tokens"),
        rank.as("__rank"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("__rank"), lit(shards)))
      .withColumn("__tok_end", sum(col("n_tokens") + lit(1L)).over(w))
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("__tok_end") - (col("n_tokens") + lit(1L))).as("tok_start"),
        floor((col("__tok_end") - (col("n_tokens") + lit(1L))) / lit(ctxLen)).as("bin_first"),
        floor((col("__tok_end") - lit(1L)) / lit(ctxLen)).as("bin_last"))
      .withColumn("straddles", col("bin_last") > col("bin_first"))
  }

  /** Per-bin utilization of a [[packSequences]] layout: how many docs
    * touch each (shard, bin) and how many of them straddle — the packing
    * diagnostic (concat-split bins are always full except each shard's
    * tail, so the interesting number is the straddle rate per bin).
    */
  def packStats(packed: DataFrame): DataFrame =
    packed
      .select(col("shard"), explode(sequence(col("bin_first"), col("bin_last"))).as("bin"),
        col("straddles"))
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))

  /** No-straddle greedy packing (next-fit) — the T5-style EXAMPLE
    * packer: docs fill a bin until the next one would overflow `ctxLen`,
    * then a fresh bin opens; no document crosses a bin boundary (the
    * padding-for-integrity trade [[packSequences]] refuses). Oversize
    * docs (n_tokens > ctxLen) occupy a bin alone, flagged `truncated`
    * (the trainer's truncation decision, marked not hidden).
    *
    * Next-fit is inherently SEQUENTIAL — bin state is a running fold
    * with capacity resets, which no associative window can express — so
    * the corpus md5-shards first and each shard scans independently
    * through the codegen'd O(m) [[graft.functions.NextFitBins]] kernel
    * over its sorted doc list (the SemDeDup maxCell discipline: shards
    * are both the parallelism AND the memory envelope — one array row
    * of (rank, id, tokens) triples per shard, so size `shards` to keep
    * corpus/shards rows comfortably in an executor; for unbounded
    * corpora use [[packSequences]]). One groupBy(shard) shuffle, one
    * kernel projection, one explode — the corpus moves once.
    *
    * Output: (idCol, shard, n_tokens, bin, truncated); bins shard-local,
    * dense from 0 in shard order.
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ctxLen: Int,
      shards: Int,
  ): DataFrame =
    packGreedyAppend(docs, idCol, textCol, ctxLen, shards,
      emptyPackState(docs.sparkSession))

  /** Empty standing-layout state for [[packGreedyAppend]]: one row per
    * shard will accumulate as batches arrive — (shard, bin, fill) is the
    * COMPLETE maintenance state of a greedy layout (the open tail bin
    * per shard; closed bins are immutable), so the standing side is
    * `shards` rows no matter how much data has been packed.
    */
  def emptyPackState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("shard", "bin", "fill")
  }

  /** Fold a NEW batch into a standing greedy layout — the packing member
    * of the incremental family (the appendToPqIndex/scd2Increment
    * discipline): each shard's fold seeds from the standing (bin, fill)
    * tail instead of (0, 0), so already-placed docs never move and
    * append(append(∅, b₁), b₂) is BIT-IDENTICAL to one-shot
    * [[packGreedy]] over b₁∥b₂ whenever b₁'s ranks precede b₂'s per
    * shard (PackingSpec pins the split-append equivalence). Batch cost:
    * one groupBy(shard) over the BATCH plus a broadcast-size state join
    * — the standing placements are never read, let alone re-shuffled.
    *
    * Output: [[packGreedy]]'s schema for the batch docs only. Roll the
    * state forward with [[packState]].
    */
  def packGreedyAppend(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      ctxLen: Int,
      shards: Int,
      state: DataFrame,
  ): DataFrame = {
    require(ctxLen >= 2, s"ctxLen must be >= 2, got $ctxLen")
    require(shards >= 1 && shards <= 65536, s"shards in [1,65536], got $shards")
    val rank = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    val perShard = batch
      .select(
        col(idCol).as("__id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n"),
        rank.as("__rank"))
      .filter(col("__n") > 0)
      .withColumn("shard", pmod(col("__rank"), lit(shards)))
      .groupBy("shard")
      .agg(array_sort(collect_list(struct(col("__rank"), col("__id"), col("__n"))))
        .as("__docs"))
      .join(broadcast(state.select(
        col("shard"), col("bin").as("__bin0"), col("fill").as("__fill0"))), Seq("shard"), "left")
      .select(col("shard"), col("__docs"),
        coalesce(col("__bin0"), lit(0L)).as("__bin0"),
        coalesce(col("__fill0"), lit(0L)).as("__fill0"))
    // The sequential scan itself is the codegen'd NextFitBins kernel —
    // O(m) per shard. (The previous aggregate-HOF fold concatenated the
    // accumulated placement array once PER ELEMENT: O(m²) per shard,
    // measured 14× at a 10× corpus. Sequentiality still lives inside one
    // row's array; the operator remains a projection.)
    val bins = graft.functions.GraftFunctions.nextFitBins(
      transform(col("__docs"), d => d.getField("__n")),
      col("__bin0"), col("__fill0"), ctxLen.toLong)
    perShard
      .withColumn("__bins", bins)
      .select(col("shard"),
        explode(arrays_zip(col("__docs"), col("__bins"))).as("__p"))
      .select(
        col("__p.__docs.__id").as(idCol),
        col("shard"),
        col("__p.__docs.__n").as("n_tokens"),
        col("__p.__bins").as("bin"),
        (col("__p.__docs.__n") > lit(ctxLen.toLong)).as("truncated"))
  }

  /** Roll the standing state forward after [[packGreedyAppend]]: touched
    * shards derive their new (tail bin, fill) from the batch placements;
    * untouched shards carry the old row. Both sides are ≤ `shards` rows.
    */
  def packState(oldState: DataFrame, placed: DataFrame, ctxLen: Int): DataFrame = {
    val tail = placed.groupBy("shard").agg(max("bin").as("bin"))
    // When a shard's batch tail bin IS the carried-over standing bin
    // (every batch doc fit into the old open bin), the old fill is part
    // of the tail's occupancy — add it back; a fresh tail bin starts
    // from the batch docs alone.
    val derived = placed
      .join(tail, Seq("shard", "bin"))
      .groupBy("shard", "bin")
      .agg(sum(least(col("n_tokens"), lit(ctxLen.toLong))).as("__batch_fill"))
      .join(oldState.select(
        col("shard"), col("bin").as("__old_bin"), col("fill").as("__old_fill")),
        Seq("shard"), "left")
      .select(col("shard"), col("bin"),
        (col("__batch_fill") +
          when(col("bin") === col("__old_bin"), col("__old_fill")).otherwise(lit(0L)))
          .as("fill"))
    derived.unionByName(
      oldState.join(derived.select("shard"), Seq("shard"), "left_anti"))
  }

  /** Overlapping token-window chunking — the RAG indexing cut: chunk i
    * of a doc covers tokens `[i·stride, i·stride + window)` (clamped at
    * the doc end), chunks start at every stride multiple below `n`, so
    * consecutive chunks overlap by `window - stride` tokens and the tail
    * chunk may be short (standard retrieval-chunker behavior — context
    * is never silently dropped).
    *
    * Scale shape: a pure scan-side posexplode — no shuffle, no join; the
    * corpus never moves. Chunk text is emitted as a joined string (the
    * embedding-input payload) plus scalar offsets for downstream joins.
    * Null/empty documents drop.
    */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int,
  ): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride in [1, window=$window], got $stride")
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(
        col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), floor((col("__n") - 1) / lit(stride)).cast("int")))
          .as(Seq("chunk_idx", "__i")))
      .withColumn("tok_start", (col("__i").cast("long") * lit(stride.toLong)))
      .withColumn("chunk_len", least(lit(window.toLong), col("__n") - col("tok_start")))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("tok_start"),
        col("chunk_len"),
        array_join(slice(col("__toks"), col("tok_start").cast("int") + 1, lit(window)), " ")
          .as("chunk_text"))
  }
}
