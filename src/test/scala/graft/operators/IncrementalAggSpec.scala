package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.meta.{MetaStore, Model}

/** Incremental rollup maintenance: delta-merge must equal a full
  * recompute, fall back to rebuild across replace snapshots, and no-op
  * when already current. */
class IncrementalAggSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture() = {
    import spark.implicits._
    import MetaStore._
    val store = new MetaStore(spark, Files.createTempDirectory("ia-meta").toString)
    val dataDir = Files.createTempDirectory("ia-data").toString
    val f1 = s"$dataDir/g1.parquet"
    val f2 = s"$dataDir/g2.parquet"
    val f3 = s"$dataDir/g3.parquet" // replace generation
    Seq(("a", 10.0), ("a", 20.0), ("b", 5.0))
      .toDF("k", "v").coalesce(1).write.parquet(f1)
    Seq(("a", 30.0), ("c", 7.0))
      .toDF("k", "v").coalesce(1).write.parquet(f2)
    Seq(("a", 1.0), ("b", 2.0))
      .toDF("k", "v").coalesce(1).write.parquet(f3)
    store.write("snapshots", spark.createDataset(Seq(
      Model.SnapshotMeta("db", "t", ts("2026-01-01 00:00:00"), 1L, None, "append", "m1", Map.empty),
      Model.SnapshotMeta("db", "t", ts("2026-01-02 00:00:00"), 2L, Some(1L), "append", "m2", Map.empty),
      Model.SnapshotMeta("db", "t", ts("2026-01-03 00:00:00"), 3L, Some(2L), "overwrite", "m3", Map.empty))))
    store.write("files", spark.createDataset(Seq(
      Model.FileMeta("db", "t", 1L, 0, f1, "PARQUET", 0, Map.empty, 3, 30),
      Model.FileMeta("db", "t", 2L, 0, f1, "PARQUET", 0, Map.empty, 3, 30),
      Model.FileMeta("db", "t", 2L, 0, f2, "PARQUET", 0, Map.empty, 2, 20),
      Model.FileMeta("db", "t", 3L, 0, f3, "PARQUET", 0, Map.empty, 2, 20))))
    store
  }

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n_rows", "sum_v", "min_v", "max_v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue(), r.getDouble(3), r.getDouble(4)))
      .toSet

  test("delta merge equals full recompute after an append") {
    val store = fixture()
    val (s1, rebuilt1) = IncrementalAgg.refresh(
      store, "db", "t", "byk", Seq("k"), "v", toSnapshotId = 1L)
    assert(rebuilt1) // first build is always full
    assert(snap(s1) == Set(("a", 2L, 30.0, 10.0, 20.0), ("b", 1L, 5.0, 5.0, 5.0)))

    val (s2, rebuilt2) = IncrementalAgg.refresh(
      store, "db", "t", "byk", Seq("k"), "v", toSnapshotId = 2L)
    assert(!rebuilt2) // append chain -> delta merge, no rebuild
    val full = IncrementalAgg.partials(
      graft.sources.SnapshotReads.readAt(store, "db", "t", 2L), Seq("k"), "v")
    assert(snap(s2) == snap(full))
    assert(snap(s2) == Set(
      ("a", 3L, 60.0, 10.0, 30.0), ("b", 1L, 5.0, 5.0, 5.0), ("c", 1L, 7.0, 7.0, 7.0)))
  }

  test("already-current refresh is a no-op read") {
    val store = fixture()
    IncrementalAgg.refresh(store, "db", "t", "byk", Seq("k"), "v", 1L)
    val (again, rebuilt) = IncrementalAgg.refresh(store, "db", "t", "byk", Seq("k"), "v", 1L)
    assert(!rebuilt)
    assert(snap(again) == Set(("a", 2L, 30.0, 10.0, 20.0), ("b", 1L, 5.0, 5.0, 5.0)))
  }

  test("a replace snapshot on the path forces a full rebuild") {
    val store = fixture()
    IncrementalAgg.refresh(store, "db", "t", "byk", Seq("k"), "v", 2L)
    val (s3, rebuilt) = IncrementalAgg.refresh(store, "db", "t", "byk", Seq("k"), "v", 3L)
    assert(rebuilt) // overwrite breaks the append-only increment
    assert(snap(s3) == Set(("a", 1L, 1.0, 1.0, 1.0), ("b", 1L, 2.0, 2.0, 2.0)))
  }

  test("finalized adds exact avg from partials") {
    val store = fixture()
    val (s1, _) = IncrementalAgg.refresh(store, "db", "t", "byk", Seq("k"), "v", 1L)
    val avgs = IncrementalAgg.finalized(s1, "v")
      .select("k", "avg_v").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(avgs == Map("a" -> 15.0, "b" -> 5.0))
  }
}
