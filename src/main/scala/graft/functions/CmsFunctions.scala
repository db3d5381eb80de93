package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Spark ships the count-min-sketch BUILD aggregate (`count_min_sketch`)
  * but no SQL surface to MERGE stored sketch partials or PROBE one — the
  * two halves that make the sketch family serve-many (the HLL family has
  * hll_union_agg / hll_sketch_estimate built in; this supplies the CMS
  * equivalents). Sketch params must match Aggregates.cmsHeavyHitters'
  * build call (CountMinSketch merge requires identical depth/width/seed).
  */
object Cms {
  val Eps = 0.001
  val Confidence = 0.99
  val Seed = 42
}

/** `count_min_sketch_merge(binary)`: merge serialized CMS partials into one
  * sketch — associative/commutative, so partial aggregation applies and
  * the shuffle carries bytes, not keys. */
case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch_merge expects binary, got ${t.simpleString}")
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "count_min_sketch_merge"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(Cms.Eps, Cms.Confidence, Cms.Seed)
  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeInPlace(CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    a.mergeInPlace(b)
  override def eval(buf: CountMinSketch): Any = buf.toByteArray
  override def serialize(buf: CountMinSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)
  override def withNewMutableAggBufferOffset(n: Int): CmsMerge =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMerge =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMerge =
    copy(child = c(0))
}

/** `count_min_sketch_estimate(sketch, item)`: probe a serialized CMS for a
  * string item's estimated count. Hash path matches the build aggregate's
  * (both hash the item's UTF-8 bytes), so estimates are consistent with
  * what `count_min_sketch` ingested. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_min_sketch_estimate expects (binary, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_sketch_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any =
    CountMinSketch.readFrom(sk.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[UTF8String].toString)

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (sk, item) =>
      // readFrom declares IOException — generated Java must catch it or the
      // whole stage silently falls back to interpreted mode
      s"""try {
            ${ev.value} = org.apache.spark.util.sketch.CountMinSketch
              .readFrom($sk).estimateCount($item.toString());
          } catch (java.io.IOException e) {
            throw new RuntimeException(e);
          }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
