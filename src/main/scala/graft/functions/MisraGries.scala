package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012): at most
  * `capacity` counters, with the guarantee that after summarizing `n`
  * items, every item whose true frequency exceeds `n / (capacity + 1)`
  * holds a counter, and each counter undercounts its item's true
  * frequency by at most `n / (capacity + 1)`.
  *
  * The update path runs once per corpus TOKEN, so the store is built for
  * it: open-addressing arrays keyed by UTF8String (no boxed `Long`s, no
  * `Option` allocation, no per-token `String` decode — the key is cloned
  * only when RETAINED, since the evaluated UTF8String aliases the row
  * buffer Spark reuses). Hit: one probe + primitive increment. Miss with
  * a free slot: probe + clone + insert. Miss with a full table: the
  * classic decrement-all — each such event retires `capacity + 1` units
  * of total count, so there are at most `n / (capacity + 1)` events and
  * the amortized per-token cost stays O(1). Merge adds counts pairwise
  * (the probe table is sized 4×capacity, so a 2×capacity transient
  * fits), then subtracts the (capacity+1)-th largest count from all and
  * drops the non-positive — the PODS-2012 merge that preserves the error
  * bound under arbitrary merge trees, which is exactly what Spark's
  * partial/final aggregation plan does.
  */
final class MisraGriesBuffer(val capacity: Int) {
  // load factor <= 0.5 even mid-merge (2*capacity live entries)
  private val tableSize: Int = {
    var s = 4
    while (s < capacity * 4) s <<= 1
    s
  }
  private val mask = tableSize - 1
  private val keys = new Array[UTF8String](tableSize)
  private val cnts = new Array[Long](tableSize)
  private var liveCount = 0

  def size: Int = liveCount

  private def slotOf(item: UTF8String): Int = {
    var i = item.hashCode & mask
    while (keys(i) != null && !keys(i).equals(item)) i = (i + 1) & mask
    i
  }

  def add(item: UTF8String, weight: Long = 1L): Unit = {
    val i = slotOf(item)
    if (keys(i) != null) cnts(i) += weight
    else if (liveCount < capacity) {
      keys(i) = item.clone()
      cnts(i) = weight
      liveCount += 1
    } else {
      var m = Long.MaxValue
      var j = 0
      while (j < tableSize) {
        if (keys(j) != null && cnts(j) < m) m = cnts(j)
        j += 1
      }
      val dec = math.min(weight, m)
      shrinkBy(dec)
      if (weight > dec) add(item, weight - dec)
    }
  }

  /** Force-insert for [[mergeIn]]: may exceed `capacity` transiently. */
  private def put(item: UTF8String, weight: Long): Unit = {
    val i = slotOf(item)
    if (keys(i) != null) cnts(i) += weight
    else {
      keys(i) = item
      cnts(i) = weight
      liveCount += 1
    }
  }

  def mergeIn(other: MisraGriesBuffer): Unit = {
    other.foreach((k, c) => put(k, c))
    if (liveCount > capacity) {
      val sorted = new Array[Long](liveCount)
      var j = 0
      var n = 0
      while (j < tableSize) {
        if (keys(j) != null) { sorted(n) = cnts(j); n += 1 }
        j += 1
      }
      java.util.Arrays.sort(sorted)
      shrinkBy(sorted(n - capacity - 1)) // the (capacity+1)-th largest
    }
  }

  /** Subtract `dec` everywhere, drop non-positive, rebuild the probe
    * chains (open addressing cannot delete in place).
    */
  private def shrinkBy(dec: Long): Unit = {
    val ks = new Array[UTF8String](liveCount)
    val cs = new Array[Long](liveCount)
    var j = 0
    var n = 0
    while (j < tableSize) {
      if (keys(j) != null) {
        if (cnts(j) > dec) { ks(n) = keys(j); cs(n) = cnts(j) - dec; n += 1 }
        keys(j) = null
      }
      j += 1
    }
    liveCount = 0
    var i = 0
    while (i < n) {
      val s = slotOf(ks(i))
      keys(s) = ks(i)
      cnts(s) = cs(i)
      liveCount += 1
      i += 1
    }
  }

  def foreach(f: (UTF8String, Long) => Unit): Unit = {
    var j = 0
    while (j < tableSize) {
      if (keys(j) != null) f(keys(j), cnts(j))
      j += 1
    }
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
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MisraGriesBuffer): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(UTF8String, Long)]
    buffer.foreach((k, c) => out += ((k, c)))
    val sorted = out.sortBy { case (tok, lb) => (-lb, tok.toString) }
    new GenericArrayData(sorted.map { case (tok, lb) =>
      new GenericInternalRow(Array[Any](tok, lb))
    }.toArray[Any])
  }

  override def serialize(buffer: MisraGriesBuffer): Array[Byte] = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
    buffer.foreach((k, c) => entries += ((k.getBytes, c)))
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
      buf.add(UTF8String.fromBytes(dst), bb.getLong)
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
