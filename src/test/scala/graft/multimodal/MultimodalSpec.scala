package graft.multimodal

import graft.SparkSpec
import Multimodal._

/** The multimodal plumbing contract: schema, determinism, batching and
  * generator shapes — everything except the stubbed codec itself. */
class MultimodalSpec extends SparkSpec {

  private lazy val assets = syntheticAssets(spark, sfDir)

  test("synthetic assets cover all kinds with binary payloads and metadata") {
    val rows = assets.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    rows.foreach { a =>
      assert(a.bytes.nonEmpty)
      assert(a.meta.contains("lang") && a.meta("codec") == "fake")
    }
  }

  test("decode is deterministic and emits plausible dimensions") {
    val d1 = decode(assets).collect().sortBy(_.asset_id)
    val d2 = decode(assets).collect().sortBy(_.asset_id)
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
    d1.foreach { m =>
      assert(m.width >= 64 && m.height >= 64 && m.channels == 3)
      assert(m.n_bytes > 0)
    }
  }

  test("feature extraction yields fixed-dim vectors, stable across runs") {
    val f1 = extractFeatures(assets, dim = 16).collect().sortBy(_.asset_id)
    assert(f1.forall(_.feature.length == 16))
    val f2 = extractFeatures(assets, dim = 16).collect().sortBy(_.asset_id)
    (f1 zip f2).foreach { case (a, b) =>
      assert(a.feature.sameElements(b.feature))
    }
  }

  test("frame sampling explodes video assets into ordered frames that reassemble") {
    val frames = sampleFrames(assets, chunk = 64).collect()
      .groupBy(_.asset_id)
    assert(frames.nonEmpty)
    val videos = assets.filter(_.kind == "video").collect().map(a => a.asset_id -> a.bytes).toMap
    frames.foreach { case (id, fs) =>
      val reassembled = fs.sortBy(_.frame_idx).flatMap(_.frame_bytes)
      assert(reassembled.sameElements(videos(id)))
    }
  }

  test("pipeline summary groups by kind deterministically") {
    val s = Multimodal.pipelineSummary(spark, sfDir).collect()
    assert(s.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    s.foreach(r => assert(r.getAs[Long]("n_assets") > 0))
  }
}
