package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating expression (the UDTF leg of SURVEY §2.3's
  * UDF / UDAF / UDTF surface, next to the scalar Catalyst expressions
  * and the typed Aggregators): one input row → 0..n output rows,
  * planned by Spark's own GenerateExec exactly like `explode`.
  *
  * [[NgramsGenerator]] emits a document's positional token n-grams as
  * ROWS directly — the fused form of
  * `posexplode(transform(sequence(...), i -> array_join(slice(...))))`:
  * no intermediate gram ARRAY is materialized per row (for a 10k-token
  * document at k = 5 that array is ~50k tokens of copied text), each
  * gram is built and handed straight to the consumer. Evaluation is
  * interpreted inside GenerateExec (CodegenFallback — Spark plans
  * generators through GenerateExec whether or not the generator itself
  * codegens); the surrounding projections stay in codegen.
  *
  * Ref: reference transform stage derives per-item keys then groups
  * (etl_connector.py:130-160) — generalized to positional n-gram
  * derivation.
  */
case class NgramsGenerator(tokens: Expression, k: Int)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NgramsGenerator =
    copy(tokens = newChildren(0))

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(s"ngrams_gen k ($k) must be >= 1")
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngrams_gen expects array<string> tokens, got ${other.sql}")
    }

  /** (pos, gram): pos 0-based, gram = k tokens space-joined. */
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < k) return Iterator.empty
    (0 to n - k).iterator.map { i =>
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        val t = arr.getUTF8String(j)
        if (t != null) sb.append(t.toString)
        j += 1
      }
      InternalRow(i, UTF8String.fromString(sb.toString))
    }
  }
}
