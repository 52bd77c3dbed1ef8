package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy hitters — at most `k` counters per
  * group, the frequency sibling of [[KllSketchAgg]]'s rank sketch.
  * Update is the classic 1982 algorithm (increment if tracked, insert
  * if room, else decrement all); merge is the Agarwal/Cormode/Huang/
  * Phillips/Wei/Yi 2012 mergeable-summaries rule (sum counters, then
  * subtract the (k+1)-st largest count and drop non-positives), which
  * preserves the DETERMINISTIC worst-case guarantee under ANY merge
  * tree — the property the oracle gate leans on:
  *
  *   c(x) − n/(k+1)  ≤  ĉ(x)  ≤  c(x)
  *
  * so every item with true count > n/(k+1) is necessarily retained,
  * and the estimate undershoots by at most n/(k+1). WHICH
  * low-frequency items survive varies with partition order; the two
  * theorem facts do not — driver queries emit the exact heavy
  * hitters (SQL-replayable) plus the retained/bound booleans, and
  * HeavyHittersSpec stress-tests the guarantee on adversarial orders.
  *
  * Input: long or string items (nulls ignored).
  * Output: `array<struct<item, est>>`, est descending, item-ascending
  * tie-break.
  */
case class HeavyHittersAgg(item: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  require(k >= 1 && k <= 65536, s"k in [1, 65536], got $k")

  private def itemOk(dt: DataType): Boolean = dt match {
    case LongType | StringType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemOk(item.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters item must be long/string, got " +
        item.dataType.simpleString)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", item.dataType),
    StructField("est", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
                      input: InternalRow): mutable.HashMap[Any, Long] = {
    val raw = item.eval(input)
    if (raw != null) {
      val v: Any = raw match {
        case u: UTF8String => u.toString // own the bytes
        case other => other
      }
      buf.get(v) match {
        case Some(c) => buf(v) = c + 1L
        case None if buf.size < k => buf(v) = 1L
        case None =>
          // decrement-all; amortized O(1) per input over the run
          val dead = mutable.ArrayBuffer.empty[Any]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf(key) = c - 1L
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
                     other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (key, c) =>
      buf(key) = buf.getOrElse(key, 0L) + c
    }
    if (buf.size > k) {
      // subtract the (k+1)-st largest count, drop non-positives
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[Any]
      buf.foreach { case (key, c) =>
        if (c - sub <= 0L) dead += key else buf(key) = c - sub
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  private def cmpItem(a: Any, b: Any): Int = item.dataType match {
    case LongType => java.lang.Long.compare(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case StringType => a.asInstanceOf[String].compareTo(b.asInstanceOf[String])
    case dt => throw new IllegalStateException(s"unreachable: $dt")
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val sorted = buf.toArray.sortWith { (x, y) =>
      if (x._2 != y._2) x._2 > y._2 else cmpItem(x._1, y._1) < 0
    }
    new GenericArrayData(sorted.map { case (i, c) =>
      val iv: Any = i match {
        case s: String => UTF8String.fromString(s)
        case other => other
      }
      new GenericInternalRow(Array[Any](iv, c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      item.dataType match {
        case LongType => out.writeLong(i.asInstanceOf[Long])
        case StringType =>
          val b = i.asInstanceOf[String]
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.writeInt(b.length); out.write(b)
        case dt => throw new IllegalStateException(s"unreachable: $dt")
      }
      out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val key: Any = item.dataType match {
        case LongType => in.readLong()
        case StringType =>
          val b = new Array[Byte](in.readInt())
          in.readFully(b)
          new String(b, java.nio.charset.StandardCharsets.UTF_8)
        case dt => throw new IllegalStateException(s"unreachable: $dt")
      }
      buf(key) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(item = newChildren(0))
}

object HeavyHittersAgg {
  /** Column API: `array<struct<item, est>>` of ≤ k retained items,
    * est descending. Guarantee in the class doc.
    */
  def heavyHitters(item: Column, k: Int): Column =
    Bridge.column(HeavyHittersAgg(Bridge.expression(item), k)
      .toAggregateExpression())
}
