package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** AMS (Alon–Matias–Szegedy 1996) tug-of-war sketch for the second
  * frequency moment F₂ = Σᵢ c(i)² — the moment sibling of
  * [[KllSketchAgg]] (rank) and [[HeavyHittersAgg]] (frequency), and
  * the simplest member of the family: a LINEAR sketch. The state is
  * `r` signed counters z_j = Σᵢ c(i)·s_j(i) with s_j ∈ {−1,+1} a
  * 2-universal sign hash; `update` adds s_j(x) to every counter and
  * `merge` is plain vector addition — LOSSLESS under any merge tree
  * (z(A ⊎ B) = z(A) + z(B) exactly), the strongest possible
  * mergeable-summaries guarantee, vs KLL/MG whose merges only
  * preserve an error bound. E[z_j²] = F₂ and Var[z_j²] ≤ 2·F₂², so
  * the mean of r counters' squares estimates F₂ within ε·F₂ with
  * r = O(1/ε²) (Alon-Matias-Szegedy 1996, theorem 2.2).
  *
  * The sign hash is pure 64-bit integer algebra over the Mersenne
  * prime p = 2³¹−1 (Carter–Wegman h(x) = (a_j·x' + b_j) mod p with
  * a_j = (2j+1)·1103515245 mod p, b_j = (12345·j + 6789) mod p,
  * x' = x mod p folded non-negative; sign = +1 iff 2h < p), so a SQL
  * engine replays the counters bit-identically — the a51/st27 oracle
  * gate recomputes every z_j from exact (item, count) pairs in
  * DuckDB and pins both the exact F₂ and the sketch estimate.
  * a_j·x' ≤ (p−1)² < 2⁶² never overflows.
  *
  * Reference capability: the per-type frequency-concentration
  * questions the dashboard's counter panels ask (`FD/dashboard.py:
  * 150-163`, `FD/evaluation.py:181-196`) at a state size (r longs)
  * independent of the key cardinality. |z_j| ≤ n, so counters are
  * exact in Long for any group under ~9·10¹⁸ rows.
  *
  * Input: long items (nulls ignored). Output: `array<long>` of the
  * r counters, j ascending.
  */
case class AmsSketchAgg(item: Expression, r: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(r >= 1 && r <= 4096, s"r in [1, 4096], got $r")

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ams_sketch item must be long, got ${item.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override def prettyName: String = "graft_ams_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](r)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val raw = item.eval(input)
    if (raw != null) {
      val x = raw.asInstanceOf[Long]
      val xf = ((x % AmsSketchAgg.P) + AmsSketchAgg.P) % AmsSketchAgg.P
      var j = 0
      while (j < r) {
        buf(j) += AmsSketchAgg.sign(xf, j)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < r) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AmsSketchAgg =
    copy(item = newChildren(0))
}

object AmsSketchAgg {
  /** Mersenne prime 2³¹−1 — the hash field; small enough that
    * a·x never overflows Int64, large enough for 2-universality over
    * any realistic folded-key domain.
    */
  val P: Long = 2147483647L

  /** Sign of item-fold `xf` ∈ [0, P) under counter j's hash — the
    * EXACT algebra the oracle SQL replays (see class doc).
    */
  def sign(xf: Long, j: Int): Long = {
    val a = ((2L * j + 1L) * 1103515245L) % P
    val b = (12345L * j + 6789L) % P
    val h = (a * xf + b) % P
    if (2L * h < P) 1L else -1L
  }

  /** Column API: `array<long>` of r signed counters, j ascending.
    * Guarantee and hash algebra in the class doc.
    */
  def amsSketch(item: Column, r: Int): Column =
    Bridge.column(AmsSketchAgg(Bridge.expression(item), r)
      .toAggregateExpression())
}
