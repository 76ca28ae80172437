package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-component MinHash over a string array, one pass.
  *
  * Semantics are EXACTLY the md5('j:'||item) family the oracle-checked
  * queries use ([[graft.functions.TextFunctions.minhashOf]]): component
  * j is the minimum md5 hex string over the items. The built-in
  * composition evaluates k separate interpreted `transform`+`array_min`
  * chains — k traversals, a Column-lambda allocation per element, and a
  * 32-char hex string per (element × component). This expression does
  * ONE traversal, hashes raw UTF-8 bytes, compares 16-byte digests
  * unsigned (hex encoding is order-preserving, so digest order ≡ hex
  * string order), and hex-encodes only the k winners.
  *
  * NULL contract: null array → null; null elements are skipped (what
  * `array_min` does); an array with no hashable items yields null
  * components (again matching `array_min` over empty).
  */
object MinHashUtil {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** "j:" prefixes, cached up to 64 components. */
  private val prefixes: Array[Array[Byte]] =
    (0 until 64).map(j => s"$j:".getBytes("UTF-8")).toArray

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def signature(items: ArrayData, k: Int): ArrayData = {
    require(k <= prefixes.length, s"k=$k exceeds supported components")
    val md = digests.get()
    val mins = new Array[Array[Byte]](k)
    val n = items.numElements()
    var i = 0
    while (i < n) {
      if (!items.isNullAt(i)) {
        val bytes = items.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(bytes)
          val d = md.digest()
          if (mins(j) == null ||
            java.util.Arrays.compareUnsigned(d, mins(j)) < 0) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(d => if (d == null) null else hex(d)): Array[Any])
  }
}

/** `minhash_signature(array<string>, k)` → `array<string>` of k min-md5
  * components. The per-row work is a single static call, so the
  * expression stays inside whole-stage codegen spans (no interpreted
  * lambda tree); the loop itself is plain JVM byte arithmetic. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashUtil.signature(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.MinHashUtil.signature($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
