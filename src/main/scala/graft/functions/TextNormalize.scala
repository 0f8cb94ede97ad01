package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step every text-dedup pipeline needs BEFORE hashing
  * (the same document crawled twice often differs only in composed vs
  * decomposed accents, so un-normalized exact dedup silently misses it).
  *
  * Spark has no builtin for this, and a Scala UDF would break
  * whole-stage codegen right at the scan where normalization runs over
  * 100 TB of text; this expression keeps codegen intact (`doGenCode`
  * emits a single static call) and fast-paths already-normalized
  * strings — the overwhelming majority of a real crawl — via the
  * Normalizer quick-check without copying.
  */
object TextNormalize {

  /** Static entry point shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalize.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftshim.column(
      NfcNormalize(org.apache.spark.sql.graftshim.expression(text)))
}
