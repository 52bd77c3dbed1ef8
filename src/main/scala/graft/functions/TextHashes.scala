package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._


/** Single-pass MinHash / SimHash signatures as native expressions.
  *
  * The composable form (`array_min(transform(shingles, xxhash64(...)))`
  * × k permutations, or a 64-wide `zip_with` vote per token) evaluates
  * interpreted higher-order lambdas with boxing per element — k (or 64)
  * full passes over the array per row. These expressions make ONE pass
  * with primitive accumulators (Spark's own XXH64 as the hash kernel).
  * CodegenFallback is acceptable: the per-row work is a tight Scala
  * loop, and rows stay inside the surrounding codegen stage.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, k)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** 64-bit SimHash: per-bit ±1 votes from each token's XXH64, folded to a
  * long sign mask — one pass, primitive vote array.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Distinct word n-gram shingles of a token array in one pass.
  *
  * Semantics are exactly `ops/Dedup.shinglesComposable`: fewer than n
  * tokens → a single shingle joining ALL tokens; otherwise every
  * n-window joined with single spaces; duplicates dropped keeping first
  * occurrence. The composable spelling costs three interpreted HOF
  * passes with boxed lambdas per window (transform + slice + array_join
  * per shingle); this kernel builds each shingle with one
  * `UTF8String.concatWs` over the window and dedups through a hash set
  * — it is the map-side cost of every near-dup path, so it gets
  * `doGenCode` (static call) like the parse kernel.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Row kernel (also the codegen call target — static forwarder). */
  def shingle(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var i = 0
    while (i < len) { parts(i) = toks.getUTF8String(i); i += 1 }
    if (len < n) {
      return new GenericArrayData(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.concatWs(SPACE,
          parts.toIndexedSeq: _*)))
    }
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var start = 0
    while (start <= len - n) {
      System.arraycopy(parts, start, window, 0, n)
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(SPACE,
        window.toIndexedSeq: _*))
      start += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

object TextHashes {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
  def wordShingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
}
