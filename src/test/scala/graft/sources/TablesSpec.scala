package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver's TESTDATA has shipped `events.ts` under two physical
  * parquet schemas across regenerations: TIMESTAMP(NANOS) (read as long
  * via the legacy flag) and TIMESTAMP(MICROS). `Tables.events` must load
  * either and yield identical TimestampType micros — a regression here
  * silently reds every events-family query (round-7 postmortem). */
class TablesSpec extends SparkSpec {

  // One synthetic event at a micros-exact instant plus a ragged-ns one.
  private val microsA = 1700000000123456L // 2023-11-14T22:13:20.123456Z
  private val microsB = 1700000999999999L

  private def writeDir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("tables-spec")
    d.toFile.deleteOnExit()
    d
  }

  private def load(dir: String): Seq[Long] =
    Tables.events(spark, dir)
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq.sorted

  test("events loads a nanos-as-long physical schema (legacy TESTDATA)") {
    val dir = writeDir()
    import spark.implicits._
    // 789 trailing ns on the second row: integral div must floor to µs.
    Seq((1L, microsA * 1000L), (2L, microsB * 1000L + 789L))
      .toDF("event_id", "ts")
      .repartition(1)
      .write.mode("overwrite").parquet(dir.resolve("tmp").toString)
    // Stage as the single-file layout Tables.load expects.
    val part = java.nio.file.Files.list(dir.resolve("tmp"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("events.parquet"))
    assert(load(dir.toString) == Seq(microsA, microsB))
    assert(Tables.events(spark, dir.toString).schema("ts").dataType == TimestampType)
  }

  test("events loads a timestamp[us] physical schema (current TESTDATA)") {
    val dir = writeDir()
    import spark.implicits._
    Seq((1L, microsA), (2L, microsB))
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .repartition(1)
      .write.mode("overwrite").parquet(dir.resolve("tmp").toString)
    val part = java.nio.file.Files.list(dir.resolve("tmp"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("events.parquet"))
    assert(load(dir.toString) == Seq(microsA, microsB))
    assert(Tables.events(spark, dir.toString).schema("ts").dataType == TimestampType)
  }

  test("documents/embeddings survive a narrower-typed regeneration") {
    import spark.implicits._
    val dir = writeDir()
    // int32 ids / counts, double embeddings — plausible regeneration drift
    Seq((1, "hello world", "en", "web", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(dir.resolve("dtmp").toString)
    var part = java.nio.file.Files.list(dir.resolve("dtmp"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("documents.parquet"))
    Seq((1, Array(0.5, 1.5), 3))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(dir.resolve("etmp").toString)
    part = java.nio.file.Files.list(dir.resolve("etmp"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(part, dir.resolve("embeddings.parquet"))

    val docs = Tables.documents(spark, dir.toString)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    assert(docs.select("doc_id", "n_chars").collect().head.toSeq == Seq(1L, 11L))
    val vecs = Tables.embeddings(spark, dir.toString)
    assert(vecs.schema("vec_id").dataType == LongType)
    assert(vecs.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    assert(vecs.schema("label").dataType == IntegerType)
    assert(vecs.select("embedding").as[Array[Float]].collect().head.toSeq
      == Seq(0.5f, 1.5f))
  }

  test("TESTDATA events loads with a TimestampType ts and sane range") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    val (lo, hi) = df.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    // epoch-µs magnitudes, not raw nanos misread as micros
    assert(lo > 1000000000000000L && hi < 4102444800000000L)
  }
}
