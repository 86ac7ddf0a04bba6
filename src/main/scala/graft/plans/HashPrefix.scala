package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 60-bit big-endian slice of the md5 digest as a native codegen'd
  * expression — bit-identical to the portable SQL formulation
  * `conv(substring(md5(x), offset+1, 15), 16, 10)` that every engine
  * can replicate, minus its per-row costs: the built-in chain
  * allocates a 32-char hex string, substrings it, and re-parses the
  * hex through conv; this reads the 15 nibbles straight off the raw
  * digest. The hash itself stays md5 (specified identically
  * everywhere), so the DuckDB oracle twins ([[graft.ops.TextOps.h64Sql]])
  * are untouched — this is the same (b)-tier native-expression move as
  * [[FloatDot]], applied to the hot inner kernel of the dedup/sketch
  * family (every shingle, line, span and probe hashes through it).
  *
  * `offsetNibbles` = 0 is [[graft.ops.TextOps.h64]]; 15 is the second
  * independent hash [[graft.ops.TextOps.h64b]] (nibbles 15..29 of the
  * same digest — one digest feeds the Kirsch-Mitzenmacher family). */
case class Md5Prefix60(child: Expression, offsetNibbles: Int)
    extends UnaryExpression {
  require(offsetNibbles >= 0 && offsetNibbles + 15 <= 32,
    s"offsetNibbles must keep 15 nibbles inside the 32-nibble digest, got $offsetNibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects binary input, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[Array[Byte]], offsetNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Md5Prefix60$$.MODULE$$.compute($c, $offsetNibbles)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest is not thread-safe and allocation per row would undo
  // the point; one instance per task thread, reset per call
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The 60-bit value of hex nibbles [off, off+15) of md5(bytes). */
  def compute(bytes: Array[Byte], off: Int): Long = {
    val m = digest.get()
    m.reset()
    val d = m.digest(bytes)
    var v = 0L
    var i = off
    val end = off + 15
    while (i < end) {
      val b = d(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xF else b & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}
