package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a narrow per-row map — the canonical
  * first step of large-corpus text curation (decomposed accents, ligature
  * variants, and width variants otherwise defeat exact dedup, n-gram
  * shingles, and tokenizer vocabularies: "café" with a combining acute is
  * a different byte string than its composed form).
  *
  * ASCII fast path: NFC is the identity on ASCII, so a `numChars ==
  * numBytes` input is returned untouched with zero allocation — on a
  * mostly-ASCII 100 TB corpus the kernel costs one byte-length compare per
  * row. Non-ASCII strings take the JDK normalizer, whose quick-check also
  * short-circuits already-composed text.
  *
  * The DuckDB oracle's `nfc_normalize` implements the same Unicode
  * canonical composition, so outputs hash-compare exactly.
  */
case class NormalizeNfc(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numChars() == s.numBytes()) s // pure ASCII: NFC is the identity
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
