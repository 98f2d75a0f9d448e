package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcdefgh" * 100, 800L),
    (1L, "tiny", 4L),
    (2L, "x" * 1500, 1500L))
    .toDF("doc_id", "text", "n_chars")
    .withColumn("lang", lit("en")).withColumn("source", lit("src0"))

  test("fromDocuments: binary payload + typed metadata schema") {
    val items = Multimodal.fromDocuments(docs)
    val schema = items.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val byId = items.collect().map(m => m.media_id -> m).toMap
    assert(byId(0L).media_type == "image" && byId(1L).media_type == "audio"
      && byId(2L).media_type == "video")
    assert(byId(0L).payload.length == 800)
    assert(byId(1L).meta.sampleRateHz == 16000)
  }

  test("decode: deterministic features, histogram normalized, partition-preserving") {
    val items = Multimodal.fromDocuments(docs).repartition(3)
    val feats = Multimodal.decode(items)
    assert(feats.rdd.getNumPartitions == 3) // mapPartitions keeps partitioning
    val f = feats.collect().map(x => x.media_id -> x).toMap
    assert(f(0L).n_bytes == 800)
    assert(f.values.forall(_.histogram.length == Multimodal.HistogramBins))
    assert(f.values.forall(x => math.abs(x.histogram.sum - 1.0) < 1e-9))
    // deterministic: same input -> same checksum
    val again = Multimodal.decode(Multimodal.fromDocuments(docs))
      .collect().map(x => x.media_id -> x.checksum).toMap
    assert(f.view.mapValues(_.checksum).toMap == again)
  }

  test("frameSample: chunk count, offsets, strided sampling") {
    val items = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSample(items, frameSize = 256, every = 4)
      .collect().groupBy(_.media_id)
    // doc 0: 800 bytes -> 4 frames (0..3), sampled every 4 -> frame 0 only
    assert(frames(0L).map(_.frame_no).toSeq == Seq(0))
    assert(frames(0L).head.frame_bytes.length == 256)
    // doc 2: 1500 bytes -> 6 frames, every 4 -> frames 0 and 4
    assert(frames(2L).map(_.frame_no).sorted.toSeq == Seq(0, 4))
    assert(frames(2L).find(_.frame_no == 4).get.offset == 1024)
    // doc 1: 4 bytes -> 1 frame, short tail preserved
    assert(frames(1L).head.frame_bytes.length == 4)
  }

  test("resize: clamps image dims keeping aspect, non-images untouched") {
    val items = Multimodal.fromDocuments(docs)
    val resized = Multimodal.resize(items, maxDim = 100)
      .collect().map(m => m.media_id -> m).toMap
    val img = resized(0L) // image, 161x321 (n_chars%640+1 x n_chars%480+1)
    assert(math.max(img.meta.width, img.meta.height) == 100)
    assert(img.meta.height > img.meta.width) // aspect preserved
    assert(resized(1L).meta == Multimodal.fromDocuments(docs)
      .filter($"media_id" === 1L).head().meta)
  }
}
