package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass log-block parser: `Key: Value` lines → normalized-key map.
  *
  * Exactly the composable grammar in `ops/LogGrammar.parseBlock`
  * (keep lines containing ':', key = lowercased/trimmed prefix of
  * the FIRST ':' with spaces → underscores, value = trimmed suffix,
  * last key wins) — but as a single string scan per row instead of a
  * split + per-line regexp_replace + HOF map build (~15 interpreted
  * passes). Matches `FD/evaluation.py:65-70` (`if ':' in line` +
  * `split(':', 1)`): header lines like `New Transaction Received:`
  * yield an empty-valued `new_transaction_received` key, same as the
  * reference; typed projections only read real `Key: Value` fields. One
  * retained divergence: trims the space character only (Spark's `trim`),
  * where Python `strip()` takes all whitespace — the grammar never emits
  * tabs/CRs around fields.
  *
  * The display-log analytics path (SURVEY §3.3) parses every block on
  * every read, so this is its hot kernel: `doGenCode` keeps the whole
  * stage inside codegen (a static call on the input UTF8String — no
  * CodegenFallback row boxing), and the last-win map builds through
  * parallel arrays with linear-scan replace (blocks carry ~12 unique
  * keys; a hash map loses at that size).
  */
case class ParseLogBlock(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"parse_log_block expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "graft_parse_log_block"

  override def nullSafeEval(input: Any): Any =
    ParseLogBlock.parseUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ParseLogBlock.parseUTF8($c)")

  override protected def withNewChildInternal(c: Expression): ParseLogBlock =
    copy(child = c)
}

object ParseLogBlock {
  def parse(block: Column): Column =
    Bridge.column(ParseLogBlock(Bridge.expression(block)))

  /** Row kernel (also the codegen call target — static forwarder).
    *
    * Spark's `trim` strips the space character only (not all whitespace
    * like Java's String.trim) — mirrored for parity with the composable
    * form.
    */
  def parseUTF8(input: UTF8String): MapData = {
    val text = input.toString
    val n = text.length
    var keys = new Array[String](16)
    var values = new Array[String](16)
    var size = 0
    var start = 0
    while (start <= n) {
      val nl = text.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      // find the line's first ':' (the reference keeps any line with one)
      var firstColon = -1
      var i = start
      while (i < end && firstColon < 0) {
        if (text.charAt(i) == ':') firstColon = i
        i += 1
      }
      if (firstColon >= 0) {
        // key: space-trimmed [start, firstColon), lowered, ' ' -> '_'
        var a = start; var b = firstColon
        while (a < b && text.charAt(a) == ' ') a += 1
        while (b > a && text.charAt(b - 1) == ' ') b -= 1
        val key = text.substring(a, b).toLowerCase.replace(' ', '_')
        // value: space-trimmed suffix after the first ':'
        var va = firstColon + 1; var vb = end
        while (va < vb && text.charAt(va) == ' ') va += 1
        while (vb > va && text.charAt(vb - 1) == ' ') vb -= 1
        val value = text.substring(va, vb)
        // last-win: replace in place if the key repeats
        var j = 0
        while (j < size && keys(j) != key) j += 1
        if (j == size) {
          if (size == keys.length) {
            keys = java.util.Arrays.copyOf(keys, size * 2)
            values = java.util.Arrays.copyOf(values, size * 2)
          }
          keys(size) = key
          size += 1
        }
        values(j) = value
      }
      start = if (nl < 0) n + 1 else end + 1
    }
    val ks = new Array[Any](size)
    val vs = new Array[Any](size)
    var i = 0
    while (i < size) {
      ks(i) = UTF8String.fromString(keys(i))
      vs(i) = UTF8String.fromString(values(i))
      i += 1
    }
    ArrayBasedMapData(ks, vs)
  }
}
