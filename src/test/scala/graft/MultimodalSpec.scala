package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.ext.Multimodal.{FakeCodec, MediaRow}

/** The multimodal pipeline's Spark-side plumbing is real (binary column,
  * typed encoders, partition-local decode loop, fan-out); only the codec
  * is a deterministic stub. These specs pin the plumbing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload round-trips text bytes; media_type cycles by doc_id") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    rows.foreach { r =>
      assert(new String(r.payload, "UTF-8") == texts(r.doc_id))
      val want = Seq("image", "audio", "video")((r.doc_id % 3).toInt)
      assert(r.media_type == want)
    }
  }

  test("mediaMeta == driver-side FakeCodec over collected payloads") {
    val viaSpark = Multimodal.mediaMeta(spark, sf)
      .collect().map(_.toString).toSet
    val viaDriver = Multimodal.mediaTable(spark, sf).collect()
      .map(FakeCodec.meta).toSeq.toDF().collect().map(_.toString).toSet
    assert(viaSpark == viaDriver)
  }

  test("frameSamples: only video rows, ceil(n/32) frames each") {
    val frames = Multimodal.frameSamples(spark, sf)
    val perDoc = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val videos = Multimodal.mediaTable(spark, sf)
      .filter(col("media_type") === "video").collect()
    assert(videos.nonEmpty && perDoc.keySet == videos.map(_.doc_id).toSet)
    videos.foreach { v =>
      val want = (v.payload.length + FakeCodec.FrameStride - 1) / FakeCodec.FrameStride
      assert(perDoc(v.doc_id) == want.toLong)
    }
  }

  test("metadata-only consumers prune the payload column at the scan") {
    // Leaf scans (parquet or a cached InMemoryTableScan) must read only
    // doc_id — neither text nor the derived payload column.
    val plan = Multimodal.mediaTable(spark, sf)
      .select("doc_id", "media_type")
      .queryExecution.executedPlan
    val leaves = plan.collectLeaves()
    assert(leaves.nonEmpty)
    leaves.foreach { leaf =>
      val cols = leaf.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("payload"),
        s"scan not pruned: $leaf")
    }
  }
}
