package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded exact top-k state: the k largest (value, id) pairs under the
  * total order (value DESC, id ASC). UNLIKE the sketch kits this is
  * EXACT and order-free — top-k under a total order is canonical, so
  * any arrival/merge order yields the same state — which is why the
  * registry can oracle it against a DuckDB row_number window directly.
  *
  * The point at scale: `groupBy(key).agg(graft_topk(...))` partial-
  * aggregates map-side, so every exchange carries at most k pairs per
  * key instead of EVERY row the window formulation
  * (`row_number().over(partitionBy(key).orderBy(v desc)) <= k`) must
  * shuffle and sort. With millions of rows per hot key and k = 5 that
  * is the difference between a skew bomb and a bounded merge — the same
  * asymmetric win as Dedup.bestRowPerKey (which is the k = 1 special
  * case), generalized to any k.
  *
  * It is also the deterministic reservoir sampler: feed
  * value = hash-uniform(id) and the kept set is a uniform k-sample that
  * is growth-stable (a row's keep/drop flips only when a better-keyed
  * row arrives), engine-reproducible, and mergeable — A-Res
  * (Efraimidis & Spiridakis 2006) with the randomness replaced by a
  * hash so both engines can replay it.
  *
  * State: two parallel arrays as a size-k binary min-heap ordered by
  * (value ASC, id DESC) so the root is the WORST kept pair — O(log k)
  * insert when full, O(1) reject of sub-root arrivals.
  */
final class TopKState(val k: Int) extends Serializable {
  require(k >= 1, s"TopKState: k must be >= 1, got $k")

  val vs = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  /** a-side strictly worse than b-side under (v DESC, id ASC)? */
  @inline private def worse(va: Double, ia: Long, vb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(va, vb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(vs(l), ids(l), vs(m), ids(m))) m = l
      if (r < size && worse(vs(r), ids(r), vs(m), ids(m))) m = r
      if (m == i) return
      val tv = vs(i); vs(i) = vs(m); vs(m) = tv
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  def insert(v: Double, id: Long): Unit = {
    if (size < k) {
      // grow phase: append then sift up
      var i = size
      vs(i) = v; ids(i) = id
      size += 1
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(vs(i), ids(i), vs(p), ids(p))) {
          val tv = vs(i); vs(i) = vs(p); vs(p) = tv
          val ti = ids(i); ids(i) = ids(p); ids(p) = ti
          i = p
        } else return
      }
    } else if (worse(vs(0), ids(0), v, id)) {
      // full: replace the worst kept pair only if the arrival beats it
      vs(0) = v; ids(0) = id
      siftDown(0)
    }
  }

  /** (v,id) already kept? O(k) linear probe — k is small by contract,
    * and the check only runs on the merge path (per-row inserts are
    * distinct by construction of the id).
    */
  private def contains(v: Double, id: Long): Boolean = {
    var i = 0
    while (i < size) {
      if (ids(i) == id && java.lang.Double.compare(vs(i), v) == 0) return true
      i += 1
    }
    false
  }

  /** Merge is a set union, not a multiset fold: a (v,id) pair present in
    * both states inserts once, so folding overlapping or replayed states
    * (standing-index maintenance re-delivering a shard) cannot
    * double-count an entry and evict a genuinely distinct one.
    */
  def merge(o: TopKState): TopKState = {
    require(o.k == k, s"TopKState.merge: k mismatch ($k vs ${o.k})")
    var i = 0
    while (i < o.size) {
      if (!contains(o.vs(i), o.ids(i))) insert(o.vs(i), o.ids(i))
      i += 1
    }
    this
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(size)
    var i = 0
    while (i < size) { out.writeDouble(vs(i)); out.writeLong(ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TopKState {
  def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new TopKState(in.readInt())
    val n = in.readInt()
    var i = 0
    // re-inserting preserves the heap invariant without trusting the wire
    while (i < n) { val v = in.readDouble(); val id = in.readLong(); st.insert(v, id); i += 1 }
    st
  }

  /** Static entry for generated code: (rank, id, v) rows, rank 1 = best
    * under (v DESC, id ASC) — the canonical sorted read of the state.
    */
  def entriesOf(bytes: Array[Byte]): ArrayData = {
    val st = deserialize(bytes)
    val idx = Array.range(0, st.size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(st.vs(a), st.vs(b))
      c > 0 || (c == 0 && st.ids(a) < st.ids(b))
    }
    val rows = new Array[Any](st.size)
    var r = 0
    while (r < st.size) {
      rows(r) = InternalRow(r + 1, st.ids(idx(r)), st.vs(idx(r)))
      r += 1
    }
    new GenericArrayData(rows)
  }
}

/** graft_topk(value, id, k) → binary: exact bounded top-k by
  * (value DESC, id ASC). Probe with [[TopKEntries]]; fold shard states
  * with [[TopKMergeAgg]] — the build/merge/probe triple of the sketch
  * kits, but EXACT. Null value or id rows are skipped.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with BinaryLike[Expression] {

  override def prettyName: String = "graft_topk"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKState = new TopKState(k)
  override def update(b: TopKState, input: InternalRow): TopKState = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null)
      b.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }
  override def merge(b: TopKState, o: TopKState): TopKState = b.merge(o)
  override def eval(b: TopKState): Any = b.serialize()
  override def serialize(b: TopKState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TopKState = TopKState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

/** graft_topk_merge(state) → binary: fold serialized [[TopKState]]s —
  * the shard-then-union / standing-index maintenance path.
  */
case class TopKMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[TopKState]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_topk_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[TopKState] = None
  override def update(b: Option[TopKState], input: InternalRow): Option[TopKState] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val st = TopKState.deserialize(v.asInstanceOf[Array[Byte]])
      b match {
        case None => Some(st)
        case Some(acc) => Some(acc.merge(st))
      }
    }
  }
  override def merge(b: Option[TopKState], o: Option[TopKState]): Option[TopKState] =
    (b, o) match {
      case (Some(x), Some(y)) => Some(x.merge(y))
      case (Some(x), None) => Some(x)
      case (None, y) => y
    }
  override def eval(b: Option[TopKState]): Any = b.map(_.serialize()).orNull
  override def serialize(b: Option[TopKState]): Array[Byte] =
    b.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[TopKState] =
    if (bytes.isEmpty) None else Some(TopKState.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMergeAgg =
    copy(child = newChild)
}

/** graft_topk_entries(state) → array<struct<rank,id,v>>: the kept pairs
  * best-first — rank 1 is the group maximum under (v DESC, id ASC).
  */
case class TopKEntries(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_topk_entries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
  // Empty input bytes (an all-null merge) probe to null.
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null else TopKState.entriesOf(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("topkEntries")
      s"""
         |Object $res = ($c.length == 0) ? null
         |  : graft.functions.TopKState.entriesOf($c);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): TopKEntries =
    copy(child = newChild)
}
