package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012): at most
  * `capacity` counters, with the guarantee that after summarizing `n`
  * items, every item whose true frequency exceeds `n / (capacity + 1)`
  * holds a counter, and each counter undercounts its item's true
  * frequency by at most `n / (capacity + 1)`.
  *
  * Update is the classic rule — hit: increment; miss with a free slot:
  * insert at 1; miss with a full table: decrement every counter (each
  * such event retires `capacity + 1` units of total count, so the
  * amortized cost is O(1) per item). Merge adds counts pairwise, then if
  * more than `capacity` counters remain, subtracts the (capacity+1)-th
  * largest count from all and drops the non-positive — the PODS-2012
  * merge that preserves the error bound under arbitrary merge trees,
  * which is exactly what Spark's partial/final aggregation plan does.
  */
final class MisraGriesBuffer(val capacity: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String, weight: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + weight)
      case None if counts.size < capacity => counts.update(item, weight)
      case None =>
        // decrement-all by the incoming weight, floored at the smallest
        // resident count (the multi-weight generalization: retire
        // min(weight, min-count) from everyone including the newcomer)
        val dec = math.min(weight, counts.valuesIterator.min)
        shrinkBy(dec)
        if (weight > dec) add(item, weight - dec)
    }
  }

  def mergeIn(other: MisraGriesBuffer): Unit = {
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from every counter
      val sorted = counts.valuesIterator.toArray.sortBy(-_)
      shrinkBy(sorted(capacity))
    }
  }

  private def shrinkBy(dec: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    counts.keysIterator.foreach { k =>
      val nc = counts(k) - dec
      if (nc <= 0L) dead += k else counts.update(k, nc)
    }
    dead.foreach(counts.remove)
  }
}

/** `misra_gries(item, capacity) -> array<struct<tok, lb>>` — the bounded
  * frequent-items sketch as a TypedImperativeAggregate, `lb` the
  * counter's (lower-bound-ish) residual count, output sorted by
  * (lb desc, tok asc) for a deterministic frame.
  *
  * Scale shape: a GLOBAL aggregate with O(capacity) state — Spark runs it
  * partial/final, so each input partition reduces its token stream to at
  * most `capacity` counters before the single-row shuffle, and the final
  * merge combines `partitions × capacity` counters. The corpus token
  * stream never shuffles — compare `groupBy(token).count`, which shuffles
  * every distinct token's partial counts and at web scale makes the
  * token-frequency table itself a multi-TB intermediate. Candidates from
  * this sketch feed an exact recount of only `capacity` keys
  * ([[graft.operators.HeavyHitters]]), the standard 2-pass exact
  * heavy-hitters plan.
  */
case class MisraGries(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(capacity >= 1, s"misra_gries capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("tok", StringType, nullable = false),
        StructField("lb", LongType, nullable = false)
      )
    ),
    containsNull = false
  )

  override def createAggregationBuffer(): MisraGriesBuffer =
    new MisraGriesBuffer(capacity)

  override def update(buffer: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = item.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MisraGriesBuffer): Any = {
    val out = buffer.counts.toArray.sortBy { case (tok, lb) => (-lb, tok) }
    new GenericArrayData(out.map { case (tok, lb) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(tok), lb))
    }.toArray[Any])
  }

  override def serialize(buffer: MisraGriesBuffer): Array[Byte] = {
    val entries = buffer.counts.toArray.map { case (tok, c) =>
      (tok.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MisraGriesBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val dst = new Array[Byte](len)
      bb.get(dst)
      buf.counts.update(new String(dst, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): MisraGries =
    copy(item = newChildren(0))
}
