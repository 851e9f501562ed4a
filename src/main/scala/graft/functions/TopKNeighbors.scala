package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k buffer: (score, id) pairs, kept to at most 4k entries by
  * periodic sort-and-trim. Order: score desc, id asc (the deterministic
  * tiebreak every similarity query in the engine uses).
  */
final class TopKBuffer(val k: Int) {
  val entries: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  def add(score: Double, id: Long): Unit = {
    entries += ((score, id))
    if (entries.length > 4 * k) trim()
  }

  def addAll(other: TopKBuffer): Unit = {
    entries ++= other.entries
    if (entries.length > 4 * k) trim()
  }

  def trim(): Unit = {
    val sorted = entries.sortBy { case (s, id) => (-s, id) }
    entries.clear()
    entries ++= sorted.take(k)
  }
}

/** `top_k_neighbors(score, id, k) -> array<struct<neighbor_id, cos>>` —
  * bounded top-k as a TypedImperativeAggregate.
  *
  * This replaces the `row_number().over(Window.partitionBy(query_id))`
  * idiom, whose plan shuffles EVERY scored candidate to one task per query
  * and sorts the full candidate list there — a driver-sized sort per query
  * at corpus scale (`VERDICT.md` "What's wrong" #6). As an aggregate, the
  * top-k runs partial/final: each input partition reduces its candidates to
  * at most k before the shuffle, so the exchange carries `partitions × k`
  * rows per query instead of the whole corpus.
  */
case class TopKNeighbors(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("neighbor_id", LongType, nullable = false),
        StructField("cos", DoubleType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val top = buffer.entries.sortBy { case (s, i) => (-s, i) }.take(k)
    new GenericArrayData(top.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    }.toArray[Any])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    buffer.trim()
    val bb = ByteBuffer.allocate(4 + buffer.entries.length * 16)
    bb.putInt(buffer.entries.length)
    buffer.entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.add(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): TopKNeighbors =
    copy(score = newChildren(0), id = newChildren(1))
}
