package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** `in_bucket_pairs(array<struct<i, p>>)` → rows `(ia, ib, pa, pb)`:
  * all unordered element pairs (list positions i &lt; j) of one LSH
  * bucket, as a native Catalyst [[Generator]].
  *
  * Why custom: the composed form — nested `transform` lambdas + `slice`
  * + `flatten` + `explode` — is higher-order functions all the way down:
  * CodegenFallback, one interpreted lambda frame per element, and a
  * fully materialized nested pair array per bucket before the explode
  * even starts. This generator walks the (i, j) index pairs directly and
  * streams one output row at a time; the only allocation is one struct
  * snapshot per bucket element. Generic over id/payload types (minhash
  * signatures, simhash longs, embedding vectors all route through it).
  *
  * Generators run in `GenerateExec`'s row loop (no per-expression
  * codegen to fall out of), so interpreted eval here is the normal
  * execution mode, not a regression.
  */
case class InBucketPairs(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.length == 2 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"in_bucket_pairs needs array<struct<i, p>> input, got $other")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("ia", elemType(0).dataType, nullable = true),
    StructField("ib", elemType(0).dataType, nullable = true),
    StructField("pa", elemType(1).dataType, nullable = true),
    StructField("pb", elemType(1).dataType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val idT = elemType(0).dataType
    val pT = elemType(1).dataType
    // snapshot the elements once — getStruct returns buffer views that do
    // not survive beyond the current row without a copy
    val elems = Array.tabulate(n)(i => arr.getStruct(i, 2).copy())
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val a = elems(i); val b = elems(j)
        val out = new GenericInternalRow(Array[Any](
          a.get(0, idT), b.get(0, idT), a.get(1, pT), b.get(1, pT)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): InBucketPairs = copy(child = newChild)
  override def prettyName: String = "in_bucket_pairs"
}
