package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Deterministic mergeable quantile sketch (Munro–Paterson / MRL family,
  * KLL-style alternating-parity compaction, no randomness).
  *
  * Structure: level i holds items each standing for 2^i original rows;
  * level 0 is the live insert buffer. When a level reaches capacity k it
  * is sorted and every PAIR collapses to one survivor — the kept parity
  * alternates per level per compaction, so the ±1-rank error of each
  * collapse cancels in expectation instead of accumulating as bias (the
  * deterministic compactor from the KLL line of work; with fixed parity
  * the sketch would drift systematically high or low).
  *
  * This is the 100 TB percentile shape: one streaming pass builds
  * per-partition sketches of O(k·log(n/k)) doubles, partials merge
  * associatively (concatenate levels, re-compact), and NO global sort or
  * value-keyed shuffle ever happens — where exact `percentile` sorts
  * each group. Rank error is bounded (≈ Σ compactions·2^i ≤ n·log₂(n/k)/k
  * worst-case, far smaller with alternation); the registry query pins an
  * empirical envelope as a contract oracle.
  *
  * Merge-order note: WHICH values survive depends on arrival order
  * (compactions fire at capacity crossings), so sketch contents are not
  * canonical across shuffles — only the rank-error GUARANTEE is. Specs
  * pin exact behavior under a fixed feed order and the bound under
  * arbitrary splits; the oracle checks the bound.
  */
final class MrlSketch(val k: Int) extends Serializable {
  require(k >= 8, s"MrlSketch: k must be >= 8, got $k")

  var count: Long = 0L
  /** levels(i): values of weight 2^i (insertion order; sorted only during
    * compaction / query).
    */
  var levels: scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Double]] =
    scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Double])
  /** Per-level kept-parity flag, flipped after each compaction. */
  var parity: scala.collection.mutable.ArrayBuffer[Boolean] =
    scala.collection.mutable.ArrayBuffer(false)

  def insert(v: Double): Unit = {
    levels(0) += v
    count += 1L
    if (levels(0).length >= k) compact(0)
  }

  /** Weighted insert: decompose w into powers of two and place ONE copy
    * of v at each set-bit level — level i items already stand for 2^i
    * rows, so mass conservation is exact (Σ set bits = w) and the
    * compaction analysis is unchanged. O(popcount(w)) per row instead
    * of O(w) repeated inserts: the weighted-percentile shape (e.g.
    * token-weighted document statistics) at any weight magnitude.
    */
  def insertWeighted(v: Double, w: Long): Unit = {
    require(w >= 0L, s"MrlSketch.insertWeighted: negative weight $w")
    count += w
    var i = 0
    var rem = w
    while (rem != 0L) {
      if ((rem & 1L) == 1L) {
        ensureLevel(i)
        levels(i) += v
        if (levels(i).length >= k) compact(i)
      }
      rem >>>= 1
      i += 1
    }
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.length <= i) {
      levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      parity += false
    }

  /** Sort level i, collapse pairs keeping the alternating parity, push
    * survivors up one level (weight doubles); an odd leftover (the
    * largest) stays behind so no mass is dropped. Cascades upward.
    */
  private def compact(i: Int): Unit = {
    val buf = levels(i)
    if (buf.length < 2) return
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val nPairs = arr.length / 2
    ensureLevel(i + 1)
    val off = if (parity(i)) 1 else 0
    parity(i) = !parity(i)
    val up = levels(i + 1)
    var j = 0
    while (j < nPairs) { up += arr(2 * j + off); j += 1 }
    buf.clear()
    if (arr.length % 2 == 1) buf += arr(arr.length - 1)
    if (up.length >= k) compact(i + 1)
  }

  /** Absorb another sketch: concatenate level-wise (weights align), then
    * re-compact any level at/over capacity. Mutates and returns `this`.
    */
  def merge(o: MrlSketch): MrlSketch = {
    require(o.k == k, s"MrlSketch.merge: k mismatch ($k vs ${o.k})")
    count += o.count
    var i = 0
    while (i < o.levels.length) {
      ensureLevel(i)
      levels(i) ++= o.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) compact(i)
      i += 1
    }
    this
  }

  /** Estimated quantile at fraction f in [0,1]: smallest stored value
    * whose cumulative weight reaches ceil(f·count) (min 1). NaN for an
    * empty sketch.
    */
  def quantile(f: Double): Double = {
    if (count == 0L) return Double.NaN
    val target = math.max(1L, math.ceil(f * count).toLong)
    val items = weightedItems
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    items(items.length - 1)._1
  }

  /** All (value, weight) pairs sorted by value. */
  def weightedItems: Array[(Double, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortInPlace()(Ordering.by(_._1))
    out.toArray
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(count)
    out.writeInt(levels.length)
    var i = 0
    while (i < levels.length) {
      out.writeBoolean(parity(i))
      out.writeInt(levels(i).length)
      levels(i).foreach(out.writeDouble)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object MrlSketch {
  def deserialize(bytes: Array[Byte]): MrlSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new MrlSketch(in.readInt())
    sk.count = in.readLong()
    val nLevels = in.readInt()
    sk.levels.clear(); sk.parity.clear()
    var i = 0
    while (i < nLevels) {
      sk.parity += in.readBoolean()
      val n = in.readInt()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
      var j = 0
      while (j < n) { buf += in.readDouble(); j += 1 }
      sk.levels += buf
      i += 1
    }
    sk
  }

  /** Static entry for generated code: quantiles of a serialized sketch. */
  def quantilesOf(bytes: Array[Byte], fractions: Array[Double]): ArrayData = {
    // Zero-length bytes → null, matching MgEntries/TopKEntries: a
    // persisted empty merge-agg buffer or user-stored empty binary must
    // probe to null, not EOFException mid-deserialize.
    if (bytes == null || bytes.isEmpty) return null
    val sk = deserialize(bytes)
    if (sk.count == 0L) null
    else ArrayData.toArrayData(fractions.map(sk.quantile))
  }
}

/** graft_quantile_sketch(x, k) → binary: build an [[MrlSketch]] over a
  * double column. The binary result is a REUSABLE artifact: persist
  * per-shard/per-day sketches, then fold them with
  * [[QuantileSketchMergeAgg]] and probe with [[SketchQuantiles]] — the
  * incremental-percentile pipeline (same triple shape as Spark's
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MrlSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_quantile_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MrlSketch = new MrlSketch(k)
  override def update(b: MrlSketch, input: InternalRow): MrlSketch = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Double])
    b
  }
  override def merge(b: MrlSketch, o: MrlSketch): MrlSketch = b.merge(o)
  override def eval(b: MrlSketch): Any = b.serialize()
  override def serialize(b: MrlSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MrlSketch = MrlSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

/** graft_quantile_sketch_w(x, w, k) → binary: weighted build — each row
  * contributes `w` units of mass at value `x` via the power-of-two level
  * decomposition (see [[MrlSketch.insertWeighted]]). Null value OR null
  * weight skips the row.
  */
case class WeightedQuantileSketchAgg(
    value: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MrlSketch]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def prettyName: String = "graft_quantile_sketch_w"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def left: Expression = value
  override def right: Expression = weight

  override def createAggregationBuffer(): MrlSketch = new MrlSketch(k)
  override def update(b: MrlSketch, input: InternalRow): MrlSketch = {
    val v = value.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null)
      b.insertWeighted(v.asInstanceOf[Double], w.asInstanceOf[Long])
    b
  }
  override def merge(b: MrlSketch, o: MrlSketch): MrlSketch = b.merge(o)
  override def eval(b: MrlSketch): Any = b.serialize()
  override def serialize(b: MrlSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MrlSketch = MrlSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedQuantileSketchAgg =
    copy(value = newLeft, weight = newRight)
}

/** graft_quantile_sketch_merge(sketch) → binary: fold serialized
  * [[MrlSketch]]es into one — the shard-then-union / incremental-update
  * half of the sketch kit (yesterday's corpus sketch + today's batch
  * sketch = the updated corpus sketch, no rescan).
  */
case class QuantileSketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[MrlSketch]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_quantile_sketch_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  // The buffer is Option: k rides in the sketches themselves, so an
  // empty fold has no capacity to build an empty sketch from.
  override def createAggregationBuffer(): Option[MrlSketch] = None
  override def update(b: Option[MrlSketch], input: InternalRow): Option[MrlSketch] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val sk = MrlSketch.deserialize(v.asInstanceOf[Array[Byte]])
      b match {
        case None => Some(sk)
        case Some(acc) => Some(acc.merge(sk))
      }
    }
  }
  override def merge(b: Option[MrlSketch], o: Option[MrlSketch]): Option[MrlSketch] =
    (b, o) match {
      case (Some(x), Some(y)) => Some(x.merge(y))
      case (Some(x), None) => Some(x)
      case (None, y) => y
    }
  override def eval(b: Option[MrlSketch]): Any = b.map(_.serialize()).orNull
  override def serialize(b: Option[MrlSketch]): Array[Byte] =
    b.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[MrlSketch] =
    if (bytes.isEmpty) None else Some(MrlSketch.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchMergeAgg =
    copy(child = newChild)
}

/** graft_sketch_quantiles(sketch, fractions) → array<double>: probe a
  * serialized [[MrlSketch]] at plan-time-constant fractions. Codegen'd
  * (fractions ride `addReferenceObj`); null/empty sketch → null.
  */
case class SketchQuantiles(child: Expression, fractions: Seq[Double])
    extends UnaryExpression {
  require(fractions.nonEmpty, "sketch_quantiles: empty fraction list")
  require(fractions.forall(f => f >= 0.0 && f <= 1.0),
    s"sketch_quantiles: fractions must be in [0,1], got $fractions")

  override def prettyName: String = "graft_sketch_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // An EMPTY sketch probes to null even when the sketch column itself is
  // non-nullable (the build agg always emits bytes) — without this
  // override nullSafeCodeGen would seed ev.isNull with the `false`
  // literal and the generated `isNull = true` branch fails janino.
  override def nullable: Boolean = true
  @transient private lazy val fracArr: Array[Double] = fractions.toArray

  override def nullSafeEval(v: Any): Any =
    MrlSketch.quantilesOf(v.asInstanceOf[Array[Byte]], fracArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sketchFracs", fracArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("skq")
      s"""
         |Object $res = graft.functions.MrlSketch.quantilesOf($c, $ref);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): SketchQuantiles =
    copy(child = newChild)
}
