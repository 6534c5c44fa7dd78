package graft.meta

import graft.SparkSpec

/** The Iceberg runtime seam: cold in this environment (no
  * iceberg-spark-runtime jar ships here), and the fallbacks must say so
  * rather than throw — a deployment WITH the jar flips `available` and
  * the metadata reads route to the live catalog. */
class IcebergRuntimeSpec extends SparkSpec {

  test("probe is cold in this environment and fallbacks are graceful") {
    assert(!IcebergRuntime.available)
    val r = IcebergRuntime.metadataTable(spark, "db.tbl", "files")
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("native metadata model"))
    assert(IcebergRuntime.filesTable(spark, "db.tbl").isEmpty)
    assert(IcebergRuntime.partitionsTable(spark, "db.tbl").isEmpty)
  }
}
