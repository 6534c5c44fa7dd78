package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** JSONL ingestion: clean parse, corrupt-line quarantine (not job
  * failure), documents-layout conformance, and id minting. */
class JsonlCorpusSpec extends SparkSpec {

  private def writeJsonl(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"),
      lines.mkString("\n"))
    dir.toString
  }

  test("clean lines parse; malformed lines quarantine instead of failing") {
    val path = writeJsonl(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """{this is not json at all""",
      """{"doc_id": 4}""" // parses but has no text -> quarantined
    ))
    val ingest = JsonlCorpus.read(spark, path)
    try {
      val good = ingest.good.collect()
      assert(good.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))
      val quarantined = ingest.quarantine.collect()
      assert(quarantined.length == 2)
      // the truly-corrupt line keeps its raw text for triage
      assert(quarantined.exists(r =>
        Option(r.getAs[String]("raw_line")).exists(_.contains("not json"))))
    } finally ingest.release()
  }

  test("toDocuments conforms to the documents layout and mints missing ids") {
    val path = writeJsonl(Seq(
      """{"doc_id": 7, "text": "seven", "lang": "en", "source": "a"}""",
      """{"text": "no id here"}"""
    ))
    val ingest = JsonlCorpus.read(spark, path)
    try {
      val docs = JsonlCorpus.toDocuments(ingest.good, idOffset = 1000L).collect()
      assert(docs.map(_.schema.fieldNames.toSeq).head ==
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      val byText = docs.map(r => r.getAs[String]("text") -> r).toMap
      assert(byText("seven").getAs[Long]("doc_id") == 7L)
      assert(byText("seven").getAs[Long]("n_chars") == 5L)
      val minted = byText("no id here")
      assert(minted.getAs[Long]("doc_id") >= 1000L)
      assert(minted.getAs[String]("lang") == "und")
      assert(minted.getAs[String]("source") == "jsonl")
    } finally ingest.release()
  }

  test("a whole corpus round-trips through jsonl and back") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).limit(50)
    val dir = Files.createTempDirectory("jsonl-rt").toString
    docs.select(to_json_struct()).as[String]
      .write.text(s"$dir/out")
    val ingest = JsonlCorpus.read(spark, s"$dir/out")
    try {
      val back = JsonlCorpus.toDocuments(ingest.good)
      assert(back.count() == 50)
      val orig = docs.select($"doc_id", $"text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val rt = back.select($"doc_id", $"text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rt == orig)
    } finally ingest.release()
  }

  private def to_json_struct() = {
    import org.apache.spark.sql.functions._
    to_json(struct(col("doc_id"), col("text"), col("lang"), col("source")))
  }
}
