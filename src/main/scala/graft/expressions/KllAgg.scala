package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Native KLL quantile-sketch aggregates over the Apache Datasketches
  * library already on Spark's classpath — the QUANTILE ledger to
  * [[graft.operators.Sketches]]' HLL cardinality ledger: per-shard
  * sketches persist as kilobyte binary columns and merge without
  * re-reading raw rows, with the KLL single-sided normalized rank
  * error guarantee (~1.65% at k=200, 99% confidence) surviving any
  * merge tree. Spark ships HLL SQL functions but no KLL ones, so
  * these are `TypedImperativeAggregate`s in the [[TopKScoredAgg]]
  * mold: primitive updates straight off `InternalRow`s, one
  * serialization per group per exchange.
  *
  * Determinism note (same honesty as the HLL ledger): KLL compaction
  * flips random coins, so sketch BYTES and estimates are not
  * reproducible run to run — callers emit EXACT values and gate the
  * sketch's rank error in-job ([[graft.operators.Sketches
  * .gatedQuantileReport]]); nothing randomized reaches an oracle. */
case class KllSketchAgg(
    value: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes {

  require(k >= 8, s"KLL k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = value.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllSketchAgg = copy(value = c(0))
  override def prettyName: String = "graft_kll_sketch"
}

/** Union of serialized KLL sketches — the ledger-read aggregate:
  * input rows carry binary sketches (from [[KllSketchAgg]], possibly
  * loaded from parquet written in an earlier job), output is one
  * merged binary sketch. */
case class KllMergeAgg(
    sketch: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes {

  require(k >= 8, s"KLL k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(sketch)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(
      buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val b = sketch.eval(input)
    if (b != null) {
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(b.asInstanceOf[Array[Byte]])))
    }
    buf
  }

  override def merge(
      buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllMergeAgg = copy(sketch = c(0))
  override def prettyName: String = "graft_kll_merge"
}
