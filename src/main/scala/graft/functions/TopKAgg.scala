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

/** Bounded mergeable top-k: the per-group `(score, id)` pairs with the
  * k best scores, returned as an ordered `array<struct<id, score,
  * rank>>` — SURVEY §2 ANN finishers, without the per-group
  * `row_number()` window.
  *
  * Why not the window: `row_number().over(partitionBy(query_id))`
  * funnels EVERY scored candidate row for one query through one reducer
  * task. For a brute-force ANN pass that is |corpus| rows per query —
  * the single-partition bottleneck that kills the plan at 100 TB. This
  * aggregate keeps a size-k buffer per group on the MAP side
  * (ObjectHashAggregate partial), so each partition ships at most k
  * rows per query into the final merge: shuffle volume drops from
  * O(corpus × queries) to O(k × queries × partitions), and no task ever
  * holds more than k candidates per group.
  *
  * Ordering contract (matches the windows it replaces, ties included):
  * score descending (`largest = true`; NaN sorts largest, −0.0 == 0.0,
  * Spark SQL double semantics), then id ascending. `largest = false`
  * ranks ascending scores first (the PQ-ADC shortlist order). Rows with
  * a null score or null id are ignored — the ANN paths never produce
  * them (cosine/ADC are total on non-null vectors).
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   largest: Boolean = true,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Any, Any)]] {

  require(k > 0, "k must be positive")

  private def scoreOk(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | LongType | IntegerType => true
    case _ => false
  }
  private def idOk(dt: DataType): Boolean = id.dataType match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!scoreOk(score.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k score must be numeric, got ${score.dataType.simpleString}")
    else if (!idOk(id.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k id must be long/int/string, got ${id.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", id.dataType),
    StructField("score", score.dataType),
    StructField("rank", IntegerType))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "graft_top_k"

  // score compare: equal-first so -0.0 == 0.0 (Spark SQL double
  // ordering), else java compare (NaN sorts largest — also Spark's rule)
  private def cmpScore(a: Any, b: Any): Int = score.dataType match {
    case DoubleType =>
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      if (x == y) 0 else java.lang.Double.compare(x, y)
    case FloatType =>
      val (x, y) = (a.asInstanceOf[Float], b.asInstanceOf[Float])
      if (x == y) 0 else java.lang.Float.compare(x, y)
    case LongType => java.lang.Long.compare(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => java.lang.Integer.compare(
      a.asInstanceOf[Int], b.asInstanceOf[Int])
    case dt => throw new IllegalStateException(s"unreachable: $dt")
  }

  private def cmpId(a: Any, b: Any): Int = id.dataType match {
    case LongType => java.lang.Long.compare(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => java.lang.Integer.compare(
      a.asInstanceOf[Int], b.asInstanceOf[Int])
    case StringType =>
      a.asInstanceOf[String].compareTo(b.asInstanceOf[String])
    case dt => throw new IllegalStateException(s"unreachable: $dt")
  }

  /** Total order: best first (score desc-or-asc per `largest`, id asc). */
  private def before(a: (Any, Any), b: (Any, Any)): Boolean = {
    val c = cmpScore(a._1, b._1)
    if (c != 0) { if (largest) c > 0 else c < 0 }
    else cmpId(a._2, b._2) < 0
  }

  private def compact(buffer: mutable.ArrayBuffer[(Any, Any)]): Unit =
    if (buffer.length > k) {
      val sorted = buffer.sortWith(before).take(k)
      buffer.clear()
      buffer ++= sorted
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Any, Any)] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[(Any, Any)],
                      input: InternalRow): mutable.ArrayBuffer[(Any, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // UTF8String may alias a reused scan buffer — own the bytes
      val iv: Any = i match {
        case u: UTF8String => u.toString
        case other => other
      }
      buffer += ((s, iv))
      // amortized compaction: discarding past-k entries is monotone
      // (an entry outside the top-k of a subset can never re-enter)
      if (buffer.length >= 2 * k + 64) compact(buffer)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[(Any, Any)],
                     other: mutable.ArrayBuffer[(Any, Any)]): mutable.ArrayBuffer[(Any, Any)] = {
    buffer ++= other
    compact(buffer)
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[(Any, Any)]): Any = {
    val sorted = buffer.sortWith(before).take(k)
    new GenericArrayData(sorted.zipWithIndex.map { case ((s, i), r) =>
      val iv: Any = i match {
        case str: String => UTF8String.fromString(str)
        case other => other
      }
      new GenericInternalRow(Array[Any](iv, s, r + 1))
    }.toArray[Any])
  }

  private def writeScore(out: DataOutputStream, v: Any): Unit =
    score.dataType match {
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case FloatType => out.writeFloat(v.asInstanceOf[Float])
      case LongType => out.writeLong(v.asInstanceOf[Long])
      case IntegerType => out.writeInt(v.asInstanceOf[Int])
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
  private def readScore(in: DataInputStream): Any = score.dataType match {
    case DoubleType => in.readDouble()
    case FloatType => in.readFloat()
    case LongType => in.readLong()
    case IntegerType => in.readInt()
    case dt => throw new IllegalStateException(s"unreachable: $dt")
  }
  private def writeId(out: DataOutputStream, v: Any): Unit =
    id.dataType match {
      case LongType => out.writeLong(v.asInstanceOf[Long])
      case IntegerType => out.writeInt(v.asInstanceOf[Int])
      case StringType =>
        val b = v.asInstanceOf[String]
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b)
      case dt => throw new IllegalStateException(s"unreachable: $dt")
    }
  private def readId(in: DataInputStream): Any = id.dataType match {
    case LongType => in.readLong()
    case IntegerType => in.readInt()
    case StringType =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case dt => throw new IllegalStateException(s"unreachable: $dt")
  }

  override def serialize(buffer: mutable.ArrayBuffer[(Any, Any)]): Array[Byte] = {
    compact(buffer) // ship at most k entries across the shuffle
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { case (s, i) => writeScore(out, s); writeId(out, i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Any, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Any, Any)]
    var i = 0
    while (i < n) { buf += ((readScore(in), readId(in))); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column API: ordered `array<struct<id, score, rank>>` of the k
    * best-scoring (score, id) pairs in the group. `largest = false`
    * ranks smallest scores first (distance shortlists).
    */
  def topK(score: Column, id: Column, k: Int,
           largest: Boolean = true): Column =
    Bridge.column(TopKAgg(Bridge.expression(score), Bridge.expression(id),
      k, largest).toAggregateExpression())
}
