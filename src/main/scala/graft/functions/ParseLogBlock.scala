package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass log-block parser: `Key: Value` lines → normalized-key map.
  *
  * Exactly the composable grammar in `ops/LogGrammar.parseBlock`
  * (filter lines containing ": ", key = lowercased/trimmed prefix of
  * the FIRST ':' with spaces → underscores, value = trimmed suffix,
  * last key wins) — but as a single string scan per row instead of a
  * split + per-line regexp_replace + HOF map build (~15 interpreted
  * passes). The display-log analytics path (SURVEY §3.3) parses every
  * block on every read, so this is its hot kernel.
  */
case class ParseLogBlock(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"parse_log_block expects string, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "graft_parse_log_block"

  /** Spark's `trim` strips the space character only (not all
    * whitespace like Java's String.trim) — mirrored for parity with the
    * composable form.
    */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // last-win ordered map (blocks have unique keys; junk may repeat)
    val entries = mutable.LinkedHashMap.empty[String, String]
    var start = 0
    val n = text.length
    while (start <= n) {
      val nl = text.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      val line = text.substring(start, end)
      if (line.contains(": ")) {
        val colon = line.indexOf(':')
        if (colon >= 0) {
          val key = trimSpaces(line.substring(0, colon))
            .toLowerCase.replace(' ', '_')
          val value = trimSpaces(line.substring(colon + 1))
          entries.put(key, value)
        }
      }
      start = end + 1
      if (nl < 0) start = n + 1
    }
    val keys = new Array[Any](entries.size)
    val values = new Array[Any](entries.size)
    var i = 0
    entries.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      values(i) = UTF8String.fromString(v)
      i += 1
    }
    ArrayBasedMapData(keys, values)
  }

  override protected def withNewChildInternal(c: Expression): ParseLogBlock =
    copy(child = c)
}

object ParseLogBlock {
  def parse(block: Column): Column =
    Bridge.column(ParseLogBlock(Bridge.expression(block)))
}
