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

/** Mergeable rank-sketch quantiles (r10 verdict mandate #7) — the
  * KLL-family compactor hierarchy (Karnin, Lang & Liberty 2016) with
  * DETERMINISTIC alternating compaction and a uniform per-level
  * capacity (the Munro–Paterson 1980 discipline), so the rank-error
  * bound is WORST-CASE, not probabilistic, and holds under any
  * partition/merge order:
  *
  *   - level ℓ holds items of weight 2^ℓ, at most `capacity` of them;
  *   - a full level sorts and keeps every other item (offset
  *     alternating per compaction), promoting the keepers with
  *     doubled weight — one compaction perturbs any rank by at most
  *     2^ℓ, and a compaction at level ℓ consumes ≥ capacity·2^ℓ of
  *     raw mass, so total error ≤ L·n/capacity with
  *     L = ⌊log₂(max(n/capacity,1))⌋ + 1 (see [[KllSketchAgg.rankErrorBound]]);
  *   - merge is level-wise concatenation + the same compaction —
  *     the bound argument only counts consumed mass, so arbitrary
  *     merge trees (shuffle partials, streaming state restores)
  *     stay inside it.
  *
  * Unlike st13's equal-width histogram the value domain need not be
  * known in advance — this is the streaming-quantile gap the verdict
  * named. Quantile rule on eval matches the suite's exact integer
  * rank rule (a26/w13): target rank = ⌈p·S/100⌉ over the sketch's
  * total weight S (= n when no compaction ever fired, so the sketch
  * is EXACT for groups smaller than `capacity`), answer = smallest
  * retained value whose cumulative weight reaches the target.
  *
  * Estimates depend on partition order (which items survive
  * compaction does); the BOUND does not — driver queries gate the
  * bound (a deterministic boolean) plus the exact quantiles, and
  * KllSpec stress-tests the bound on adversarial orders.
  *
  * Input: double values (nulls ignored). `percents` are integer
  * percentiles (e.g. 10, 50, 99) so the target-rank arithmetic is
  * engine-exact. Output: `array<struct<p int, est double>>`.
  */
case class KllSketchAgg(value: Expression, capacity: Int,
                        percents: Seq[Int],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketchAgg.State] {
  import KllSketchAgg.State

  require(capacity >= 8 && capacity % 2 == 0,
    s"capacity must be even and >= 8, got $capacity")
  require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100),
    s"percents must be in [0,100], got $percents")

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_kll value must be double, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", IntegerType),
    StructField("est", DoubleType))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(value)
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): State = State.empty()

  override def update(buffer: State, input: InternalRow): State = {
    val v = value.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double], capacity)
    buffer
  }

  override def merge(buffer: State, other: State): State = {
    buffer.mergeIn(other, capacity)
    buffer
  }

  override def eval(buffer: State): Any = {
    val ests = buffer.quantiles(percents)
    new GenericArrayData(percents.zip(ests).map { case (p, e) =>
      new GenericInternalRow(Array[Any](p, e))
    }.toArray[Any])
  }

  override def serialize(buffer: State): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): State = State.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(value = newChildren(0))
}

object KllSketchAgg {

  /** Sketch state: per-level item buffers (level ℓ weight = 2^ℓ),
    * per-level compaction parity (the deterministic alternating
    * offset), and the exact input count.
    */
  final class State(val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]],
                    val parity: mutable.ArrayBuffer[Int],
                    var count: Long) {

    private def ensureLevel(l: Int): Unit =
      while (levels.length <= l) {
        levels += mutable.ArrayBuffer.empty[Double]
        parity += 0
      }

    def add(v: Double, capacity: Int): Unit = {
      ensureLevel(0)
      levels(0) += v
      count += 1
      if (levels(0).length >= capacity) compactFrom(0, capacity)
    }

    /** Compact every full level from `l` upward: sort, keep every
      * other item starting at the alternating offset, promote keepers
      * one level up with doubled weight.
      */
    private def compactFrom(l: Int, capacity: Int): Unit = {
      var i = l
      while (i < levels.length && levels(i).length >= capacity) {
        val sorted = levels(i).sortWith(_ < _)
        val off = parity(i) & 1
        parity(i) += 1
        levels(i).clear()
        ensureLevel(i + 1)
        var j = off
        while (j < sorted.length) {
          levels(i + 1) += sorted(j)
          j += 2
        }
        i += 1
      }
    }

    def mergeIn(other: State, capacity: Int): Unit = {
      var l = 0
      while (l < other.levels.length) {
        if (other.levels(l).nonEmpty) {
          ensureLevel(l)
          levels(l) ++= other.levels(l)
        }
        l += 1
      }
      count += other.count
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= capacity) compactFrom(i, capacity)
        i += 1
      }
    }

    /** Total retained weight S (= count when nothing ever compacted;
      * within ±(compactions) of count otherwise).
      */
    def totalWeight: Long = {
      var s = 0L
      var l = 0
      while (l < levels.length) {
        s += levels(l).length.toLong << l
        l += 1
      }
      s
    }

    /** Smallest retained value whose cumulative weight reaches
      * ⌈p·S/100⌉ (the a26/w13 integer rank rule) for each percent.
      * NaN for the empty sketch.
      */
    def quantiles(percents: Seq[Int]): Seq[Double] = {
      val items = mutable.ArrayBuffer.empty[(Double, Long)]
      var l = 0
      while (l < levels.length) {
        val w = 1L << l
        levels(l).foreach(v => items += ((v, w)))
        l += 1
      }
      if (items.isEmpty) return percents.map(_ => Double.NaN)
      val sorted = items.sortBy(_._1)
      val s = sorted.map(_._2).sum
      percents.map { p =>
        val target = math.max(1L, (p.toLong * s + 99L) / 100L)
        var cum = 0L
        var i = 0
        var ans = sorted.last._1
        var found = false
        while (i < sorted.length && !found) {
          cum += sorted(i)._2
          if (cum >= target) { ans = sorted(i)._1; found = true }
          i += 1
        }
        ans
      }
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(count)
      out.writeInt(levels.length)
      var l = 0
      while (l < levels.length) {
        out.writeInt(parity(l))
        out.writeInt(levels(l).length)
        levels(l).foreach(out.writeDouble)
        l += 1
      }
      out.flush(); bos.toByteArray
    }
  }

  object State {
    def empty(): State = new State(mutable.ArrayBuffer.empty,
      mutable.ArrayBuffer.empty, 0L)

    def fromBytes(bytes: Array[Byte]): State = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val count = in.readLong()
      val nLevels = in.readInt()
      val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Double]]
      val parity = mutable.ArrayBuffer.empty[Int]
      var l = 0
      while (l < nLevels) {
        parity += in.readInt()
        val n = in.readInt()
        val buf = new mutable.ArrayBuffer[Double](n)
        var i = 0
        while (i < n) { buf += in.readDouble(); i += 1 }
        levels += buf
        l += 1
      }
      new State(levels, parity, count)
    }
  }

  /** Worst-case rank error (in ranks, not fraction) of a
    * capacity-`k` sketch over `n` items, any merge order. The
    * analytic argument gives L·n/k with L = ⌊log₂(max(n/k,1))⌋ + 1
    * (compaction at level ℓ perturbs ranks by ≤ 2^ℓ and consumes
    * ≥ k·2^ℓ raw mass, so ≤ n/(k·2^ℓ) compactions per level); the
    * returned bound doubles it to absorb the odd-length promotion
    * slack (ceil-half keeps can inflate level mass by 2^ℓ per
    * compaction), keeping the driver-query gate deterministic rather
    * than tight. Zero when the sketch never compacted (n ≤ k).
    */
  def rankErrorBound(k: Int, n: Long): Long = {
    if (n <= k) return 0L
    var levels = 1L
    var m = n / k
    while (m > 1) { levels += 1; m >>= 1 }
    2L * levels * n / k
  }

  /** Column API: `array<struct<p, est>>` of percentile estimates.
    * Rank-error contract in the class doc.
    */
  def kllQuantiles(value: Column, capacity: Int,
                   percents: Seq[Int]): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(value), capacity,
      percents).toAggregateExpression())
}
