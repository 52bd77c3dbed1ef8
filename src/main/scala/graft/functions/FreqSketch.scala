package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary over a string column — the
  * bounded-memory frequency sketch for cardinalities that don't fit an
  * exact groupBy at 100 TB. Holds at most `capacity` counters; any value
  * with true frequency > n/(capacity+1) is guaranteed present, and every
  * reported count undercounts by at most n/(capacity+1). Summaries are
  * MERGEABLE (count-sum then global decrement by the (capacity+1)-th
  * count), so the aggregate gets map-side partials and tree merges like
  * any declarative agg. Returns a value→approx-count map; pair with an
  * exact re-count of the candidate set (`Aggregates.exactTopKByFreq`)
  * for provably exact top-k in two passes.
  */
case class MisraGriesAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buffer.get(k) match {
        case Some(c) => buffer.update(k, c + 1)
        case None if buffer.size < capacity => buffer.update(k, 1L)
        case None => decrementAll(buffer, 1L) // classic MG eviction step
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + c)
    }
    if (buffer.size > capacity) {
      // mergeable-MG shrink: subtract the (capacity+1)-th largest count
      // from everyone; ≤ capacity strictly-positive counters survive
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      decrementAll(buffer, cut)
    }
    buffer
  }

  private def decrementAll(buffer: mutable.HashMap[String, Long],
                           by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buffer.foreach { case (k, c) =>
      if (c <= by) dead += k else buffer.update(k, c - by)
    }
    dead.foreach(buffer.remove)
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val ks = new Array[Any](buffer.size)
    val vs = new Array[Any](buffer.size)
    var i = 0
    buffer.foreach { case (k, c) =>
      ks(i) = UTF8String.fromString(k); vs(i) = c; i += 1
    }
    ArrayBasedMapData(ks, vs)
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column API: `graft_heavy_hitters(col, capacity)` aggregate. */
  def heavyHitters(c: Column, capacity: Int): Column =
    Bridge.column(
      MisraGriesAgg(Bridge.expression(c), capacity).toAggregateExpression())
}
