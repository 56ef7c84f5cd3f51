package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a string in ONE pass: all length-`n` codepoint
  * windows in order; `distinct = true` keeps first occurrences only
  * (`array_distinct` semantics). Texts shorter than n collapse to
  * `[text]` — the shingling convention of the declarative form.
  *
  * Replaces `transform(sequence(1, length(t) - n + 1), i -> substr(t, i, n))`,
  * whose `substr` re-scans the string per window — O(len²) per document
  * and the dominant cost of corpus-wide shingling/bigram extraction.
  * This kernel walks codepoint offsets once (Spark `substr` slices
  * codepoints, so multibyte text matches exactly — parity spec in
  * DedupSimilaritySpec).
  */
case class CharNgrams(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n-gram length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    // codepoint start offsets (UTF-16 indices), one walk
    val nChars = str.codePointCount(0, str.length)
    if (nChars < n) return new GenericArrayData(Array[Any](s))
    val starts = new Array[Int](nChars + 1)
    var pos = 0
    var i = 0
    while (pos < str.length) {
      starts(i) = pos
      pos += Character.charCount(str.codePointAt(pos))
      i += 1
    }
    starts(nChars) = str.length
    val total = nChars - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](total * 2)
      var j = 0
      while (j < total) {
        seen.add(str.substring(starts(j), starts(j + n)))
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](total)
      var j = 0
      while (j < total) {
        out(j) = UTF8String.fromString(str.substring(starts(j), starts(j + n)))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
