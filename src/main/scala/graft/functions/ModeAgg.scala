package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass mode (most frequent string) with the pandas
  * `Series.mode()[0]` tie-break (smallest value wins) — SURVEY §2.4 A5
  * as a `TypedImperativeAggregate`.
  *
  * The two-phase spelling (`groupBy(g, v).count` + row_number window)
  * shuffles twice; this buffer-based aggregate computes the mode in one
  * shuffle with map-side partial aggregation — worth it when the value
  * domain per group is modest (the buffer is a value→count map).
  */
case class ModeAgg(child: Expression,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_mode expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_mode"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      buffer.update(k, buffer.getOrElse(k, 0L) + 1L)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, n) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + n)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    if (buffer.isEmpty) null
    else {
      // max count; ties → smallest value (pandas mode contract)
      val (k, _) = buffer.minBy { case (k, n) => (-n, k) }
      UTF8String.fromString(k)
    }

  // length-prefixed UTF-8 byte arrays, not writeUTF: writeUTF throws
  // UTFDataFormatException past 65535 encoded bytes, which would crash
  // the partial-aggregate shuffle on long string values
  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, n) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(n)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): ModeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ModeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ModeAgg =
    copy(child = newChildren.head)
}

object ModeAgg {
  /** Column API: `graft_mode(col)` aggregate. */
  def mode(c: Column): Column =
    Bridge.column(ModeAgg(Bridge.expression(c)).toAggregateExpression())
}
