package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_structs(score, id, k, asc)`: the k best (score, id) pairs of the
  * group as an array of structs in final rank order — the payload-carrying
  * generalization of `top_vals` (graft.functions.TopVals), built for the
  * ANN serve family's per-query ranking (VERDICT r7 item 1).
  *
  * Why this exists: ranking a corpus-sized candidate frame per query with
  * `row_number().over(Window.partitionBy("q_id"))` shuffles the FULL N×Q
  * frame into Q partitions and sorts N rows in each — at 1000 executors the
  * whole scan concentrates onto Q tasks. As a TypedImperativeAggregate this
  * participates in partial aggregation: every map task sends at most k
  * (double, long) pairs per query up the exchange, so the shuffle carries
  * Q×k×partitions rows and no task ever sorts more than it heaps — the same
  * reason sum() scales. The scan stays embarrassingly parallel; only
  * k-bounded buffers move.
  *
  * Ordering contract (bit-compatible with the window form it replaces):
  *  - `asc = false`: best = largest score (cosine similarity), ties to the
  *    LOWER id — the `ORDER BY score DESC, id` rank;
  *  - `asc = true`: best = smallest score (distance), ties to the LOWER id
  *    — the `ORDER BY score ASC, id` rank.
  * Scores compare under Spark's double TOTAL order (java.lang.Double.compare:
  * NaN greatest, -0 < 0), identical to the window's sort, and ids are unique
  * per group on every call site, so the result is a deterministic function
  * of the group's value set — any partition order and any merge tree
  * produce identical output. Null scores/ids are skipped (the aggregate
  * convention; serve-path scores are never null).
  */
case class TopStructs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    ascExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  // k and asc are query-shape constants (like percentile's fraction)
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue
  private lazy val asc: Boolean = ascExpr.eval().asInstanceOf[Boolean]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_structs expects a double score, got ${scoreExpr.dataType.simpleString}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_structs expects a bigint id, got ${idExpr.dataType.simpleString}")
    else if (!kExpr.foldable || kExpr.eval().asInstanceOf[Number].intValue <= 0)
      TypeCheckResult.TypeCheckFailure("top_structs k must be a positive literal")
    else if (!ascExpr.foldable || ascExpr.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure("top_structs asc must be a boolean literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr, ascExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_structs"

  /** Worse-first comparator: heap head is the element the next better value
    * evicts. Score direction flips with `asc`; the id tiebreak does not
    * (larger id is always worse — both rank orders prefer the lower id). */
  private def worseFirst: Comparator[(Double, Long)] =
    new Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) { if (asc) -c else c }
        else java.lang.Long.compare(b._2, a._2)
      }
    }

  private def newHeap() = new java.util.PriorityQueue[(Double, Long)](k + 1, worseFirst)

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    newHeap()

  private def offer(
      buf: java.util.PriorityQueue[(Double, Long)], v: (Double, Long)): Unit = {
    if (buf.size < k) buf.offer(v)
    else if (worseFirst.compare(v, buf.peek) > 0) { buf.poll(); buf.offer(v) }
  }

  override def update(
      buf: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: java.util.PriorityQueue[(Double, Long)],
      b: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // best first = reverse of the worse-first heap order
    java.util.Arrays.sort(arr, worseFirst.reversed())
    new GenericArrayData(arr.map { case (s, id) =>
      InternalRow(s, id)
    })
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, id) = it.next(); bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = newHeap()
    var i = 0
    while (i < n) { heap.offer((bb.getDouble, bb.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopStructs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2), ascExpr = newChildren(3))
}
