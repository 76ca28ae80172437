package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (the UDTF extension point): explode a
  * token array into its overlapping n-gram windows with their ordinal
  * position, as rows `(pos, gram)`.
  *
  * Why a Generator instead of `explode(transform(sequence(...)))` (the
  * dc01/dd11 composition): the composed form materializes the FULL
  * per-row gram array before the explode — an O(tokens · n) chars
  * intermediate `ArrayData` per document that lives across the two
  * expression evaluations. The generator streams one `InternalRow` at
  * a time out of a lazy iterator, so peak per-row memory is one gram,
  * which is what you want when a 100 TB corpus has million-token
  * outlier documents. Each output row is built with
  * `UTF8String.concatWs` directly from the backing array — no
  * intermediate Scala strings.
  *
  * Registered as `ngram_explode(tokens, n)` beside the vector
  * functions ([[VectorExpressions.register]] / [[GraftExtensions]]);
  * the analyzer routes it through the standard `ExtractGenerator` →
  * `GenerateExec` path, so it composes with projections and lateral
  * views exactly like the built-in `posexplode`.
  */
case class NGramExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"ngram_explode n must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_explode requires array<string> input, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = true)))

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    // explode() semantics: a NULL array contributes zero rows
    if (arr == null || arr.numElements() < n) Iterator.empty
    else new Iterator[InternalRow] {
      private[this] var i = 0
      private[this] val last = arr.numElements() - n
      // concat_ws NULL contract: null window members are skipped
      override def hasNext: Boolean = i <= last
      override def next(): InternalRow = {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        val row = InternalRow(i, UTF8String.concatWs(sep, parts: _*))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramExplode =
    copy(child = newChild)
}
