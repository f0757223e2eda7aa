package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.toMediaFrame(
    spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", "image")

  test("media frame schema: opaque binary payload + typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val r = media.filter(col("media_id") === 0).collect()(0)
    val payload = r.getAs[Array[Byte]]("payload")
    val nBytes = r.getStruct(r.fieldIndex("meta")).getAs[Long]("n_bytes")
    assert(payload.length.toLong == nBytes)
  }

  test("extractFeatures runs partition-wise and is deterministic") {
    val f1 = Multimodal.extractFeatures(spark, media)
      .orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(spark, media)
      .orderBy("media_id").collect()
    assert(f1.length == 500)
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    // stub decode invariants: image duration 0, dims in [64, 191]
    assert(f1.forall(_.getAs[Long]("duration_ms") == 0L))
    assert(f1.filter(_.getAs[Long]("n_bytes") > 0)
      .forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") <= 191 &&
        r.getAs[Int]("height") >= 64 && r.getAs[Int]("height") <= 191))
    // 1-byte payload: midpoint byte indexing must not go out of bounds
    val tiny = Multimodal.decodeStub("image", Array[Byte](7))
    assert(tiny._1 >= 64 && tiny._2 >= 64)
  }

  test("decodeStub handles null/empty payloads") {
    assert(Multimodal.decodeStub("image", null) == ((0, 0, 0L)))
    assert(Multimodal.decodeStub("video", Array[Byte]()) == ((0, 0, 0L)))
    val (w, h, d) = Multimodal.decodeStub("video", Array[Byte](1, 2, 3, 4))
    assert(w >= 64 && h >= 64 && d == 40L)
  }

  test("sampleOffsets emits one row per stride") {
    val offsets = Multimodal.sampleOffsets(
      media.filter(col("media_id") === 0), everyBytes = 100)
    val n = offsets.count()
    val nBytes = media.filter(col("media_id") === 0)
      .select(col("meta.n_bytes")).collect()(0).getLong(0)
    assert(n == (nBytes - 1) / 100 + 1)
  }
}
