package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Position-weighted rolling fingerprint of a string as ONE per-row pass:
  * `sum(codepoint(c_i) * ((i-1) % 64 + 1))` over characters (1-based i).
  *
  * Replaces the declarative formulation
  * `aggregate(transform(sequence(1, length(t)), i -> ascii(substr(t,i,1)) * w_i), ...)`,
  * whose `substr(i, 1)` re-scans the string per character — O(n²) per
  * document and a fresh UTF8String allocation per character. This kernel is
  * O(n) with zero allocation on the ASCII fast path, so at 100 TB
  * fingerprinting rides the document scan as a narrow map.
  *
  * Value-identical to the HOF form and to the DuckDB oracle
  * (`ascii(text[i])` = i-th codepoint): verified by TextFunctionsSpec on
  * ASCII, multi-byte, empty, and null inputs.
  */
case class Fingerprint64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    if (s.numChars() == bytes.length) {
      // Pure ASCII: 1 byte == 1 char == codepoint.
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        sum += (bytes(i) & 0xffL) * ((i % 64) + 1)
        i += 1
      }
      sum
    } else {
      // Multi-byte path: iterate unicode codepoints (DuckDB `text[i]` slices
      // characters, Spark `ascii` returns the first codepoint — both are
      // codepoint semantics).
      val str = s.toString
      var sum = 0L
      var i = 0
      var pos = 0
      while (pos < str.length) {
        val cp = str.codePointAt(pos)
        sum += cp.toLong * ((i % 64) + 1)
        pos += Character.charCount(cp)
        i += 1
      }
      sum
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
