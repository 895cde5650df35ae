package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: at most k counters, deterministic
  * memory, mergeable. The complement of the Count-Min path
  * ([[CmsEstimate]]): CMS answers point queries over EVERY term with
  * probabilistic overcount; MG carries the top candidates themselves
  * with a deterministic UNDERcount — est ≤ freq and freq − est ≤
  * n/(k+1), so every term with frequency above n/(k+1) is guaranteed
  * present. Partials merge associatively (counter-wise sum, then
  * subtract the (k+1)-th largest and drop ≤0 — the mergeable-summaries
  * construction of Agarwal et al., PODS'12, which preserves the additive
  * n/(k+1) envelope), so the 100 TB shape is the same as the other
  * sketches: map-side partials, exchanges carry k counters, no
  * term-keyed shuffle to FIND the heavy hitters.
  *
  * Like the quantile sketch, WHICH sub-threshold candidates survive
  * depends on arrival/merge order; only the guarantee is canonical.
  * Registry queries oracle the guarantee (presence + bound for
  * above-threshold terms); specs pin exact behavior on fixed feeds.
  */
final class MgSummary(val k: Int) extends Serializable {
  require(k >= 1, s"MgSummary: k must be >= 1, got $k")

  /** Total items observed (the n of the error bound). */
  var n: Long = 0L
  val counts = new java.util.HashMap[String, Long]()

  def insert(term: String): Unit = {
    n += 1L
    val cur = counts.get(term)
    if (cur != 0L || counts.containsKey(term)) counts.put(term, cur + 1L)
    else if (counts.size < k) counts.put(term, 1L)
    else {
      // Classic decrement-all step: one shared unit comes off every
      // counter (the arriving term's implicit counter included), zeros
      // drop out. O(k) on a miss-when-full; hits and non-full inserts
      // are O(1).
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Counter-wise sum, then if over k counters subtract the (k+1)-th
    * largest value from all and drop ≤0. Mutates and returns `this`.
    */
  def merge(o: MgSummary): MgSummary = {
    require(o.k == k, s"MgSummary.merge: k mismatch ($k vs ${o.k})")
    n += o.n
    o.counts.forEach { (t, c) =>
      val cur = counts.get(t)
      counts.put(t, cur + c)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val pivot = vals(vals.length - (k + 1)) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= pivot) it.remove() else e.setValue(e.getValue - pivot)
      }
    }
    this
  }

  def estimate(term: String): Long = counts.getOrDefault(term, 0L)

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(n)
    out.writeInt(counts.size)
    // Length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws
    // UTFDataFormatException past 65535 encoded bytes, and whitespace
    // tokens in noisy web corpora can exceed that — a crash at
    // serialization time, long after the offending insert.
    counts.forEach { (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }
}

object MgSummary {
  def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val mg = new MgSummary(in.readInt())
    mg.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      mg.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    mg
  }

  /** Static entry for generated code: (term, est, n) rows of a
    * serialized summary, terms sorted for a deterministic layout.
    */
  def entriesOf(bytes: Array[Byte]): ArrayData = {
    val mg = deserialize(bytes)
    val terms = new java.util.ArrayList[String](mg.counts.keySet())
    java.util.Collections.sort(terms)
    val rows = new Array[Any](terms.size())
    var i = 0
    while (i < terms.size()) {
      val t = terms.get(i)
      rows(i) = InternalRow(
        UTF8String.fromString(t), mg.counts.get(t).longValue(), mg.n)
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** graft_mg_topk(term, k) → binary: build a [[MgSummary]] over a string
  * column. Probe with [[MgEntries]]; fold shard summaries with
  * [[MgMergeAgg]] — same build/merge/probe triple as the quantile kit.
  */
case class MgTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  override def prettyName: String = "graft_mg_topk"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgSummary = new MgSummary(k)
  override def update(b: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[UTF8String].toString)
    b
  }
  override def merge(b: MgSummary, o: MgSummary): MgSummary = b.merge(o)
  override def eval(b: MgSummary): Any = b.serialize()
  override def serialize(b: MgSummary): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MgSummary = MgSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopKAgg =
    copy(child = newChild)
}

/** graft_mg_merge(summary) → binary: fold serialized [[MgSummary]]s. */
case class MgMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[MgSummary]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_mg_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Option[MgSummary] = None
  override def update(b: Option[MgSummary], input: InternalRow): Option[MgSummary] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val mg = MgSummary.deserialize(v.asInstanceOf[Array[Byte]])
      b match {
        case None => Some(mg)
        case Some(acc) => Some(acc.merge(mg))
      }
    }
  }
  override def merge(b: Option[MgSummary], o: Option[MgSummary]): Option[MgSummary] =
    (b, o) match {
      case (Some(x), Some(y)) => Some(x.merge(y))
      case (Some(x), None) => Some(x)
      case (None, y) => y
    }
  override def eval(b: Option[MgSummary]): Any = b.map(_.serialize()).orNull
  override def serialize(b: Option[MgSummary]): Array[Byte] =
    b.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[MgSummary] =
    if (bytes.isEmpty) None else Some(MgSummary.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgMergeAgg =
    copy(child = newChild)
}

/** graft_mg_entries(summary) → array<struct<term,est,n>>: the surviving
  * counters of a serialized [[MgSummary]] (terms sorted), plus the
  * stream length n each row — one deserialize per summary, then explode.
  */
case class MgEntries(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_mg_entries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  // Empty input bytes (an all-null merge) probe to null.
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null else MgSummary.entriesOf(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("mgEntries")
      s"""
         |Object $res = ($c.length == 0) ? null
         |  : graft.functions.MgSummary.entriesOf($c);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MgEntries =
    copy(child = newChild)
}
