package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters buffer: item → (count estimate, max
  * overestimation error). Invariants: est ≥ true-count-seen ≥ est − err;
  * at most `capacity` entries ever held.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val entries: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def add(item: String): Unit = entries.get(item) match {
    case Some((c, e)) => entries.update(item, (c + 1, e))
    case None if entries.size < capacity => entries.update(item, (1L, 0L))
    case None =>
      // evict the min-count entry (ties: smallest item, so the step is a
      // deterministic function of the buffer contents); the newcomer
      // inherits the evictee's count as its overestimation error
      val (evictItem, (minC, _)) =
        entries.minBy { case (it, (c, _)) => (c, it) }
      entries.remove(evictItem)
      entries.update(item, (minC + 1, minC))
  }

  /** Largest possible count of an item NOT in this summary. */
  def minCount: Long =
    if (entries.size < capacity) 0L else entries.valuesIterator.map(_._1).min
}

/** Space-Saving top-k heavy hitters (Metwally, Agrawal, El Abbadi 2005) as
  * a native TypedImperativeAggregate — the aggregation-state tier of the
  * custom-expression surface (alongside the codegen'd scalar expressions
  * and the GroupedTopK physical operator).
  *
  * State is a hard `capacity` entries per aggregation state regardless of
  * input size — the frequent-terms companion to the GK-quantile/HLL sketch
  * tier (`ops/Quantiles.scala`): at corpus scale an exact term count over
  * a 100 TB vocabulary shuffles billions of distinct keys, while this
  * sketch ships `capacity` entries per partial.
  *
  * Guarantees (they survive the partial/final merge, which follows the
  * Mergeable Summaries construction of Agarwal et al. 2012: absent items
  * are charged the other side's minCount, then the union is re-trimmed to
  * capacity): any item with true count > n/capacity is present in the
  * summary, and every entry satisfies est ≥ true ≥ est − err. When the
  * distinct-item count never exceeds `capacity`, no eviction occurs and
  * the summary is EXACT with err = 0 — the property q89 oracle-checks;
  * the eviction/skew regime is pinned by SpaceSavingSpec.
  *
  * Output: array<struct<item, count_est, count_err>> of the top `k`
  * entries, ordered by (count_est desc, item) for determinism given the
  * final buffer.
  */
case class SpaceSavingTopK(
    child: Expression, capacity: Int, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk expects a string item column, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_est", LongType, nullable = false),
    StructField("count_err", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    val minA = buffer.minCount
    val minB = other.minCount
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    buffer.entries.foreach { case (it, (c, e)) =>
      other.entries.get(it) match {
        case Some((c2, e2)) => merged.update(it, (c + c2, e + e2))
        case None => merged.update(it, (c + minB, e + minB))
      }
    }
    other.entries.foreach { case (it, (c, e)) =>
      if (!buffer.entries.contains(it)) merged.update(it, (c + minA, e + minA))
    }
    val out = new SpaceSavingBuffer(capacity)
    val kept =
      if (merged.size <= capacity) merged
      else merged.toSeq
        .sortBy { case (it, (c, _)) => (-c, it) }.take(capacity)
    kept.foreach { case (it, ce) => out.entries.update(it, ce) }
    out
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val top = buffer.entries.toSeq
      .sortBy { case (it, (c, _)) => (-c, it) }
      .take(k)
      .map { case (it, (c, e)) =>
        InternalRow(UTF8String.fromString(it), c, e) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.entries.size)
    buffer.entries.foreach { case (it, (c, e)) =>
      val bytes = it.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val b = new SpaceSavingBuffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      b.entries.update(new String(bytes, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}
