package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k per group as a TypedImperativeAggregate: each
  * partial buffer is a size-k heap, so the shuffle carries at most k
  * rows per group per map task instead of every group member — the
  * scalable replacement for Window row_number() <= k, which sorts
  * whole groups (q09/q25-style patterns at 100 TB: top-k per user
  * over billions of rows shuffles k rows, not billions).
  *
  * Child is a struct whose FIRST field is the double score and whose
  * SECOND field is a long tiebreak id; "best" = highest score, ties
  * broken by lowest id (matching the window formulation
  * orderBy(desc(score), asc(id))). Returns the top-k structs sorted
  * best-first.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length >= 2 &&
        s(0).dataType == DoubleType && s(1).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_rows expects struct<score:double, id:bigint, ...>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // null score/id rows are excluded (getDouble on a null field
      // would silently read 0.0 and mis-rank); matches the window
      // form whenever groups hold >= k non-null rows
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val score = row.getDouble(0)
        val id = row.getLong(1)
        if (buf.wouldAccept(score, id)) {
          buf.insert(score, id, proj(row).copy())
        }
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach { case (s, i, r) =>
      if (buf.wouldAccept(s, i)) buf.insert(s, i, r)
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedBestFirst.map(_._3.asInstanceOf[Any]).toArray)

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes(structType.length)

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(bytes, k, structType.length)

  override def withNewMutableAggBufferOffset(offset: Int): TopKRows =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRows =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKRows = copy(child = c.head)
}

/** Size-bounded heap keeping the k best (score desc, id asc) rows.
  * Head of the queue is the WORST kept element (eviction candidate).
  */
final class TopKBuffer(k: Int) {
  // worst-first ordering: lower score first; on ties, higher id first
  private val ord: Ordering[(Double, Long, UnsafeRow)] =
    Ordering.by[(Double, Long, UnsafeRow), (Double, Long)](e => (e._1, -e._2)).reverse
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long, UnsafeRow)](ord)

  def wouldAccept(score: Double, id: Long): Boolean =
    heap.size < k || {
      val (ws, wi, _) = heap.head
      score > ws || (score == ws && id < wi)
    }

  def insert(score: Double, id: Long, row: UnsafeRow): Unit = {
    heap.enqueue((score, id, row))
    if (heap.size > k) heap.dequeue()
  }

  def foreach(f: ((Double, Long, UnsafeRow)) => Unit): Unit = heap.foreach(f)

  def sortedBestFirst: Seq[(Double, Long, UnsafeRow)] =
    heap.toSeq.sortBy(e => (-e._1, e._2))

  def toBytes(numFields: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (s, i, r) =>
      out.writeDouble(s); out.writeLong(i)
      val b = r.getBytes
      out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte], k: Int, numFields: Int): TopKBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble(); val i = in.readLong()
      val len = in.readInt(); val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(numFields)
      row.pointTo(b, len)
      buf.insert(s, i, row)
    }
    buf
  }
}

/** Column wrapper: top_k_rows(struct(score, id, ...), k). */
object TopKFunctions {
  def top_k_rows(structCol: Column, k: Int): Column =
    Bridge.column(TopKRows(Bridge.expression(structCol), k)
      .toAggregateExpression())
}
