package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeStub: deterministic, normalized histogram of EmbeddingDim") {
    val payload = "hello media".getBytes("UTF-8")
    val a = MediaCodec.decodeStub(payload)
    val b = MediaCodec.decodeStub(payload)
    assert(a.toSeq == b.toSeq)
    assert(a.length == MediaCodec.EmbeddingDim)
    assert(math.abs(a.sum - 1.0f) < 1e-5f) // histogram normalized by length
    assert(MediaCodec.decodeStub(Array.empty[Byte]).forall(_ == 0f))
  }

  test("checksum differs across payloads, stable across calls") {
    val x = MediaCodec.checksum("abc".getBytes)
    assert(x == MediaCodec.checksum("abc".getBytes))
    assert(x != MediaCodec.checksum("abd".getBytes))
  }

  test("sampleFrameOffsets: evenly spaced, clamped") {
    assert(MediaCodec.sampleFrameOffsets(1000, 4) == Seq(0L, 250L, 500L, 750L))
    assert(MediaCodec.sampleFrameOffsets(0, 4).isEmpty)
    assert(MediaCodec.sampleFrameOffsets(1000, 0).isEmpty)
  }

  test("extractFeatures end-to-end over the documents-derived media table") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val media = mediaFromDocuments(spark, docs)
    val feats = extractFeatures(media).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(Set("image", "audio", "video").contains(f.mediaType))
      assert(f.nBytes > 0)
      assert(f.embedding.length == MediaCodec.EmbeddingDim)
    }
    // JVM-side recompute must agree with the distributed run
    val one = media.filter(_.id == 0L).head()
    val viaDs = feats.find(_.id == 0L).get
    assert(viaDs.checksum == MediaCodec.checksum(one.payload))
    assert(viaDs.embedding.toSeq == MediaCodec.decodeStub(one.payload).toSeq)
  }

  test("codec seam: swapping the codec changes only the embedding") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(50)
    val media = mediaFromDocuments(spark, docs)
    val hist = extractFeatures(media, HistogramCodec).collect()
      .map(f => f.id -> f).toMap
    val stride = extractFeatures(media, StrideMeanCodec).collect()
      .map(f => f.id -> f).toMap
    assert(hist.keySet == stride.keySet)
    hist.foreach { case (id, h) =>
      val s = stride(id)
      // plumbing identical: ids, types, byte counts, checksums
      assert(h.mediaType == s.mediaType)
      assert(h.nBytes == s.nBytes)
      assert(h.checksum == s.checksum)
      assert(h.embedding.length == s.embedding.length)
    }
    // the two stubs genuinely compute different features
    assert(hist.exists { case (id, h) =>
      h.embedding.toSeq != stride(id).embedding.toSeq })
    // both deterministic
    val strideAgain = extractFeatures(media, StrideMeanCodec).collect()
      .map(f => f.id -> f.embedding.toSeq).toMap
    stride.foreach { case (id, f) =>
      assert(strideAgain(id) == f.embedding.toSeq) }
  }

  test("sampleFrames fans out only videos, frame count as configured") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val media = mediaFromDocuments(spark, docs)
    val nVideos = media.filter(_.meta.mediaType == "video").count()
    val frames = sampleFrames(media, framesPerVideo = 4)
    assert(frames.count() == nVideos * 4)
    val byId = frames.groupBy("id").count().select("count").as[Long].collect()
    assert(byId.forall(_ == 4L))
  }
}
