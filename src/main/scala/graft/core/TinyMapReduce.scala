package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.reflect.ClassTag

/** Spark-native re-expression of the reference's MapReduce job surface
  * (reference: `Imagine_MapReduce` — Mapper.h:26, Reducer.h:130,
  * MapReduceMaster.h:49-54). The reference pipeline is
  *
  *   input splits -> LineRecordReader (offset,line) -> user map(k,v)
  *   -> hash partition -> sort-spill -> k-way merged sorted shuffle
  *   -> reduce-side merge -> sum-by-key reduce -> `key value` text
  *
  * Here each phase maps onto Spark's own machinery:
  *   - split planning / record reading  -> `newAPIHadoopFile` with Hadoop
  *     `TextInputFormat` (identical straddle semantics to the reference's
  *     LineRecordReader.h:44-119, including real byte-offset keys);
  *   - map / flatMap / filter           -> RDD transforms;
  *   - hash partition (StringPartitioner.h:21-26, 5 partitions default,
  *     Callbacks.h:44)                  -> `HashPartitioner`;
  *   - ring buffer + sort-spill + merge (KVBuffer.cpp, MapRunner.h)
  *                                      -> sort-based shuffle, done by
  *     `repartitionAndSortWithinPartitions` (ONE shuffle, spill-capable);
  *   - reduce-side merge + reduce (Reducer.h:30-106,
  *     MapReduceUtil.cpp:114-135)       -> streaming adjacent-key merge
  *     over the sorted partition iterator (O(1) memory per key run);
  *   - the map-side combiner that the reference keeps dormant
  *     (MapReduceUtil.cpp:48-65, call site commented out) is enabled here
  *     as a bounded-memory partial aggregation, because at 100 TB the
  *     shuffle volume reduction is the whole ballgame.
  *
  * All orchestration/RPC/registry plumbing of the reference
  * (MapReduceMaster.cpp, Imagine_Rpc, Imagine_ZooKeeper) is subsumed by
  * the Spark driver/executor runtime and deliberately not rebuilt.
  */
object TinyMapReduce {

  /** 128 MiB, the reference's DEFAULT_READ_SPLIT_SIZE (Callbacks.h:40). */
  val DefaultSplitSize: Long = 128L * 1024 * 1024

  /** The reference's DEFAULT_PARTITION_NUM / DEFAULT_REDUCER_NUM
    * (Callbacks.h:44,47). */
  val DefaultPartitionNum: Int = 5

  /** Max distinct keys held by the map-side combiner before it flushes a
    * batch downstream. Bounds executor memory regardless of key
    * cardinality — the analog of the reference's 100 MiB ring buffer
    * (Callbacks.h:41) without the busy-wait. */
  val DefaultCombinerCapacity: Int = 1 << 16

  /** Text source with real byte-offset keys, the exact record contract of
    * the reference's LineRecordReader (LineRecordReader.h:65-75): key =
    * byte offset of the line, value = line text without the terminator.
    * `splitSize` plays DEFAULT_READ_SPLIT_SIZE's role via Hadoop split
    * planning (MapReduceUtil.cpp:139-166 equivalent).
    */
  def text(
      spark: SparkSession,
      paths: Seq[String],
      splitSize: Long = DefaultSplitSize): MRStage[Long, String] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", splitSize)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(
        paths.mkString(","),
        classOf[TextInputFormat],
        classOf[LongWritable],
        classOf[Text],
        conf)
      // Hadoop reuses Writable instances per record; materialize copies.
      .map { case (k, v) => (k.get(), v.toString) }
    new MRStage(rdd)
  }

  /** Lift any keyed RDD into the facade (custom RecordReader hook — the
    * analog of subclassing RecordReader.h:10-53). */
  def from[K: ClassTag, V: ClassTag](rdd: RDD[(K, V)]): MRStage[K, V] =
    new MRStage(rdd)

  /** Streaming reduce over a key-sorted iterator: merges adjacent equal
    * keys, holding one accumulator at a time (Hadoop reduce semantics —
    * Reducer.h:77-106 + MapReduceUtil.cpp:114-135 without materializing
    * the run). */
  private[core] def reduceSorted[K, V](
      it: Iterator[(K, V)],
      f: (V, V) => V): Iterator[(K, V)] = new Iterator[(K, V)] {
    private val in = it.buffered
    override def hasNext: Boolean = in.hasNext
    override def next(): (K, V) = {
      var (k, acc) = in.next()
      while (in.hasNext && in.head._1 == k) acc = f(acc, in.next()._2)
      (k, acc)
    }
  }

  /** Bounded-memory map-side combiner: hash-aggregates up to `capacity`
    * distinct keys, emitting the batch when full. Correct under any
    * cardinality because downstream re-reduces. */
  private[core] def combinePartition[K, V](
      it: Iterator[(K, V)],
      f: (V, V) => V,
      capacity: Int): Iterator[(K, V)] = new Iterator[(K, V)] {
    private var batch: Iterator[(K, V)] = Iterator.empty
    private def fill(): Unit = {
      val m = mutable.HashMap.empty[K, V]
      while (it.hasNext && m.size < capacity) {
        val (k, v) = it.next()
        m.updateWith(k) {
          case Some(acc) => Some(f(acc, v))
          case None      => Some(v)
        }
      }
      batch = m.iterator
    }
    override def hasNext: Boolean = {
      if (!batch.hasNext && it.hasNext) fill()
      batch.hasNext
    }
    override def next(): (K, V) = {
      if (!hasNext) throw new NoSuchElementException
      batch.next()
    }
  }
}

/** A stage of key/value records — the facade's composable surface.
  * `mapKV` mirrors the reference's 1-in-1-out MapCallback
  * (Callbacks.h:14-15); `flatMapKV`/`filterKV` are the natural
  * generalizations the reference lacks (SURVEY §2.2). */
final class MRStage[K, V](val rdd: RDD[(K, V)])(
    implicit kt: ClassTag[K], vt: ClassTag[V]) extends Serializable {

  def mapKV[K2: ClassTag, V2: ClassTag](
      f: (K, V) => (K2, V2)): MRStage[K2, V2] =
    new MRStage(rdd.map { case (k, v) => f(k, v) })

  def flatMapKV[K2: ClassTag, V2: ClassTag](
      f: (K, V) => IterableOnce[(K2, V2)]): MRStage[K2, V2] =
    new MRStage(rdd.flatMap { case (k, v) => f(k, v) })

  def filterKV(p: (K, V) => Boolean): MRStage[K, V] =
    new MRStage(rdd.filter { case (k, v) => p(k, v) })

  /** The reduce phase: hash-partition by key (StringPartitioner
    * equivalent), sort within partitions (the shuffle/merge order
    * invariant of SURVEY §1.3), streaming sum-by-key. One shuffle total;
    * map-side combine on by default. */
  def reduceByKeySorted(
      f: (V, V) => V,
      numPartitions: Int = TinyMapReduce.DefaultPartitionNum,
      partitioner: Option[Partitioner] = None,
      combine: Boolean = true,
      combinerCapacity: Int = TinyMapReduce.DefaultCombinerCapacity)(
      implicit ord: Ordering[K]): MRResult[K, V] = {
    val part = partitioner.getOrElse(new HashPartitioner(numPartitions))
    val pre =
      if (combine)
        rdd.mapPartitions(
          TinyMapReduce.combinePartition(_, f, combinerCapacity),
          preservesPartitioning = false)
      else rdd
    val sorted = pre.repartitionAndSortWithinPartitions(part)
    val reduced = sorted.mapPartitions(
      TinyMapReduce.reduceSorted(_, f),
      preservesPartitioning = true)
    new MRResult(reduced)
  }

  /** Map-only job (no shuffle): hash-partitioned, key-sorted output
    * without a reduce function — the reference's pipeline when the user
    * reduce is identity. */
  def partitionSorted(
      numPartitions: Int = TinyMapReduce.DefaultPartitionNum,
      partitioner: Option[Partitioner] = None)(
      implicit ord: Ordering[K]): MRResult[K, V] = {
    val part = partitioner.getOrElse(new HashPartitioner(numPartitions))
    new MRResult(rdd.repartitionAndSortWithinPartitions(part))
  }
}

/** A finished job: hash-partitioned, key-sorted per partition — exactly
  * the reference's observable output layout (one sorted file per reducer,
  * Reducer.h:77-106). */
final class MRResult[K, V](val rdd: RDD[(K, V)])(
    implicit kt: ClassTag[K], vt: ClassTag[V]) extends Serializable {

  /** `key<SPACE>value` text sink, the reference's TextOutputFormat intent
    * (Callbacks.h:49-53; we keep the value the reference drops —
    * TextOutputFormat.h:25-31, SURVEY §4.3). One file per partition,
    * sorted by key within each, like `disk_merge_<i>.txt`. */
  def saveAsKVText(path: String): Unit =
    saveAsText(path)((k, v) => s"$k $v")

  /** Custom OutputFormat hook (the analog of subclassing
    * OutputFormat.h:6-17): caller supplies the record serializer. */
  def saveAsText(path: String)(format: (K, V) => String): Unit =
    rdd.map { case (k, v) => format(k, v) }.saveAsTextFile(path)

  def collectSorted()(implicit ord: Ordering[K]): Seq[(K, V)] =
    rdd.collect().sortBy(_._1).toSeq

  /** Expose as DataFrame for the oracle path. */
  def toDF(spark: SparkSession, keyName: String, valueName: String)(
      implicit ev: org.apache.spark.sql.Encoder[(K, V)]): DataFrame =
    spark.createDataset(rdd)(ev).toDF(keyName, valueName)
}
