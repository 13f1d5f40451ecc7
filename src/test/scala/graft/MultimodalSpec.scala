package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Pins the multimodal plumbing: stub-decode arithmetic against
  * independently computed values, column pruning of the payload, and
  * the frame sampler's reassembly property. */
class MultimodalSpec extends SparkSuite {

  test("decode parses the payload header back to the asset metadata") {
    val feats = Multimodal.assetFeatures(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val assets = Multimodal.assets(spark, sfDir).collect()
    assert(assets.nonEmpty)
    assets.take(50).foreach { a =>
      val f = feats(a.doc_id)
      // n_bytes = header + UTF-8 body, straight from the raw payload
      assert(f.getAs[Long]("n_bytes") == a.payload.length)
      assert(a.payload.length >= Multimodal.HeaderLen)
      // width/height parsed OUT OF THE BYTES must round-trip the
      // metadata columns the header was built from
      assert(f.getAs[Int]("width") == a.width)
      assert(f.getAs[Int]("height") == a.height)
      // header magic + format initial are really in the payload
      val hdr = new String(a.payload, 0, Multimodal.HeaderLen, "UTF-8")
      assert(hdr.startsWith("GRFT" + a.format.head))
      assert(f.getAs[Int]("n_frames") ==
        (a.payload.length + Multimodal.FrameStride - 1) / Multimodal.FrameStride)
    }
  }

  test("manifest prunes the payload column from the parquet scan") {
    val plan = Multimodal.assetManifest(spark, sfDir)
      .queryExecution.executedPlan.toString
    // n_bytes comes from octet_length(cast(text)), so `text` is read,
    // but nothing else beyond the manifest inputs may be
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("lang"), s"lang not pruned:\n$plan")
  }

  test("frame sampler splits payload into stride-sized frames that reassemble") {
    val assets = Multimodal.assets(spark, sfDir).limit(20)
    val frames = Multimodal.sampleFrames(assets)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val originals = assets.collect().map(a => a.doc_id -> a.payload).toMap
    originals.foreach { case (id, payload) =>
      val rebuilt = frames(id).sortBy(_.getAs[Int]("frame_no"))
        .flatMap(_.getAs[Array[Byte]]("frame_bytes"))
      assert(java.util.Arrays.equals(rebuilt, payload),
        s"doc $id frames do not reassemble")
      frames(id).dropRight(1).foreach(f =>
        assert(f.getAs[Array[Byte]]("frame_bytes").length ==
          Multimodal.FrameStride))
    }
  }

  test("batch packing: contiguous batch numbers, bounded overflow") {
    val rows = Multimodal.batchPacking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (fmt, perFmt) =>
      val byBatch = perFmt.groupBy(_._2)
      val ids = byBatch.keys.toSeq.sorted
      assert(ids.head == 0L, s"$fmt batches must start at 0")
      // an id gap is legal ONLY when the earlier batch holds an asset
      // spanning the skipped byte range (the documented one-asset
      // overflow); otherwise ids are contiguous
      ids.sliding(2).foreach {
        case Seq(a, b) if b > a + 1 =>
          val spanned = (b - a - 1) * Multimodal.BatchTargetBytes
          assert(byBatch(a).map(_._3).max >= spanned,
            s"$fmt gap $a->$b without an asset spanning it")
        case _ => ()
      }
      byBatch.foreach { case (b, as) =>
        val bytes = as.map(_._3).sum
        val maxAsset = as.map(_._3).max
        // floor(bytes_before/target) packing: a batch holds at most
        // target + one overflowing asset
        assert(bytes <= Multimodal.BatchTargetBytes + maxAsset,
          s"$fmt batch $b holds $bytes bytes")
      }
    }
  }
}
