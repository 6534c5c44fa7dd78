package graft

import java.time.{Instant, LocalDate}

import graft.meta.MetaStore

/** CLI shell — the thin service façade over the engine (SURVEY.md §7.2
  * step 7): each subcommand maps to a reference endpoint.
  *
  * {{{
  * runMain graft.Main refresh   <metaDir> <database> <name=path>...
  * runMain graft.Main cycle     <metaDir>                  # daily maintenance cycle
  * runMain graft.Main work      <metaDir> [<db.table=dataPath>...]  # drain queue
  * runMain graft.Main tasks     <metaDir>                  # list tasks
  * runMain graft.Main optimize  <metaDir> <db> <table> <from> <to> [day|week|month]
  * runMain graft.Main clean     <docsParquet> <outDir> [jaccardThreshold]   # corpus cleaning
 * runMain graft.Main curate    <docsParquet> <shardDir> [thr] [evalParquet] [shardTokens] [boilerMinDf] [nfc] [intraSegTokens] # clean -> token-balanced shards
  * runMain graft.Main sample    <docsParquet> <outDir> <rate>               # deterministic sample
  * runMain graft.Main index-build <corpusParquet> <indexDir>                # persist dedup index
  * runMain graft.Main index-dedup <batchParquet> <indexDir> <keptOut> [thr] # dedup batch vs index
 * runMain graft.Main ingest    <srcDir> <indexDir> <corpusOut> <ckptDir> [thr] # streaming ingest
 * runMain graft.Main analyze   <metaDir> <db> <table> <dataPath> [cols...] [--approx] # column stats
  * runMain graft.Main serve     <metaDir> [port] [dataRoot]  # REST façade (default 8080)
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: <command> <metaDir> ...")
    val cmd = args(0)
    val spark = Sessions.local(s"graft-$cmd")
    // lazy: the corpus commands' args(1) is a DATASET path, not a
    // metaDir — eagerly building the store/queue there would drop a
    // tasks.lock file inside the user's input data
    lazy val store = new MetaStore(spark, args(1))
    lazy val engine = new Engine(store)
    try {
      cmd match {
        case "refresh" =>
          val db = args(2)
          val tables = args.drop(3).map { s =>
            val Array(n, p) = s.split("=", 2); n -> p
          }.toMap
          val stale = operators.Refresh.fullRefresh(store, db, tables, Instant.now())
          println(s"refreshed ${tables.size} tables, removed ${stale.size} stale")
        case "cycle" =>
          val r = engine.runCycle(Instant.now())
          println(s"cycle: tables=${r.tableCount} optimize=${r.optimizeTasks} " +
            s"expire=${r.expireTasks} orphans=${r.orphanTasks}")
        case "work" =>
          val paths = args.drop(2).map { s =>
            val Array(t, p) = s.split("=", 2)
            val Array(db, tbl) = t.split("\\.", 2)
            (db, tbl) -> p
          }.toMap
          var n = 0
          while (engine.processNext(1, paths).isDefined) n += 1
          println(s"processed $n tasks")
        case "tasks" =>
          val (rows, total) = engine.queue.list(Seq.empty, 100, 0)
          println(s"total=$total")
          rows.foreach(t => println(
            s"${t.id} ${t.database}.${t.table} ${t.kind} ${t.status} ${t.result}"))
        case "optimize" =>
          val ids = engine.enqueueOptimize(args(2), args(3), 512,
            LocalDate.parse(args(4)), LocalDate.parse(args(5)),
            if (args.length > 6) args(6) else "day")
          println(ids.fold(e => s"error: $e", ids => s"enqueued ${ids.size} tasks"))
        case "serve" =>
          val port = if (args.length > 2) args(2).toInt else 8080
          val dataRoot = if (args.length > 3) Some(args(3)) else None
          val server = new http.Api(store, engine, dataRoot).start(port)
          println(s"serving /api on port ${server.getAddress.getPort} (ctrl-c to stop)")
          Thread.currentThread().join() // serve until killed
        case "clean" =>
          // args(1) is the documents parquet here, not a metaDir.
          val docs = spark.read.parquet(args(1))
          val threshold = if (args.length > 3) args(3).toDouble else 0.8
          val (cleaned, stats) = operators.CleanCorpus.clean(docs, threshold)
          cleaned.write.mode("overwrite").parquet(args(2))
          println(s"clean: input=${stats.input} quality=${stats.afterQuality} " +
            s"decontam=${stats.afterDecontam} exact=${stats.afterExact} " +
            s"final=${stats.afterNearDup} -> ${args(2)}")
        case "curate" =>
          // args(1): docs parquet, args(2): shard out dir,
          // [args(3): jaccard thr], [args(4): eval parquet],
          // [args(5): shard tokens], [args(6): boilerplate min df],
          // [args(7): "nfc" to normalize], [args(8): intra-doc seg tokens]
          val docs = spark.read.parquet(args(1))
          val thr = if (args.length > 3) args(3).toDouble else 0.8
          val eval = if (args.length > 4) Some(spark.read.parquet(args(4))) else None
          val shardTokens = if (args.length > 5) args(5).toInt else 1 << 20
          val boilerMinDf = if (args.length > 6) Some(args(6).toInt) else None
          val nfc = args.length > 7 && args(7) == "nfc"
          val intraSeg = if (args.length > 8) Some(args(8).toInt) else None
          val (cleaned, stats) =
            operators.CleanCorpus.clean(docs, thr, eval, boilerplateMinDf = boilerMinDf,
              normalize = nfc, intraDocSegTokens = intraSeg)
          val nShards = operators.Packing.writeShards(cleaned, args(2), shardTokens)
          println(s"curate: input=${stats.input} quality=${stats.afterQuality} " +
            s"boilerplate=${stats.afterBoilerplate} decontam=${stats.afterDecontam} " +
            s"exact=${stats.afterExact} final=${stats.afterNearDup} " +
            s"shards=$nShards -> ${args(2)}")
        case "sample" =>
          val docs = spark.read.parquet(args(1))
          val sampled = operators.Sampling.sample(docs,
            org.apache.spark.sql.functions.col("doc_id"), args(3).toDouble)
          sampled.write.mode("overwrite").parquet(args(2))
          println(s"sample: ${sampled.count()} of ${docs.count()} docs -> ${args(2)}")
        case "diff" =>
          // args(1): old corpus parquet, args(2): new corpus parquet,
          // args(3): report out dir — the release gate before switching
          // a training run to a new corpus version.
          val report = operators.CorpusDiff.diff(
            spark.read.parquet(args(1)), spark.read.parquet(args(2)))
          report.write.mode("overwrite").parquet(args(3))
          val byStatus = report.groupBy("status").count().collect()
            .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
          println(s"diff: $byStatus -> ${args(3)}")
        case "index-build" =>
          // args(1): corpus parquet, args(2): index dir
          operators.DedupIndex.build(spark.read.parquet(args(1)), args(2))
          println(s"dedup index built at ${args(2)}")
        case "analyze" =>
          // args(2): db, args(3): table, args(4): data parquet,
          // args(5...): columns (default: all), optional leading "--approx"
          val approx = args.contains("--approx")
          val rest = args.drop(5).filterNot(_ == "--approx").toSeq
          val df = spark.read.parquet(args(4))
          val cols = if (rest.nonEmpty) rest else df.columns.toSeq
          val stats = operators.Analyze.analyzeTable(store, args(2), args(3),
            df, cols, approximate = approx)
          stats.foreach(s => println(
            s"${s.column}: rows=${s.nRows} nulls=${s.nNull} " +
              s"distinct=${s.nDistinct}${if (s.approximate) "~" else ""} " +
              s"[${s.minValue.getOrElse("")} .. ${s.maxValue.getOrElse("")}]"))
        case "ingest" =>
          // args(1): stream source dir (parquet files arriving), args(2):
          // index dir, args(3): corpus out dir, args(4): checkpoint dir
          val threshold = if (args.length > 5) args(5).toDouble else 0.8
          // a continuous ingester normally starts against an EMPTY
          // landing directory — poll until the first file arrives to
          // infer the schema instead of dying at startup
          def inferSchema(): Option[org.apache.spark.sql.types.StructType] =
            try Some(spark.read.parquet(args(1)).schema)
            catch { case _: org.apache.spark.sql.AnalysisException => None }
          var schemaOpt = inferSchema()
          while (schemaOpt.isEmpty) {
            println(s"waiting for a first file in ${args(1)} to infer the schema...")
            Thread.sleep(5000)
            schemaOpt = inferSchema()
          }
          val stream = spark.readStream
            .schema(schemaOpt.get)
            .parquet(args(1))
          val q = streaming.StreamingIngest.start(stream, args(2), args(3),
            args(4), threshold,
            r => println(s"ingest batch ${r.batchId}: input=${r.input} kept=${r.kept}"))
          println(s"ingesting ${args(1)} -> ${args(3)} (ctrl-c to stop)")
          q.awaitTermination()
        case "index-dedup" =>
          // args(1): batch parquet, args(2): index dir, args(3): kept out
          val threshold = if (args.length > 4) args(4).toDouble else 0.8
          val (kept, stats) = operators.DedupIndex.dedupBatch(spark,
            spark.read.parquet(args(1)), args(2), threshold)
          kept.write.mode("overwrite").parquet(args(3))
          println(s"index-dedup: input=${stats.input} afterExact=${stats.afterExact} " +
            s"kept=${stats.kept} -> ${args(3)} (index extended)")
        case other => sys.error(s"unknown command $other")
      }
    } finally spark.stop()
  }
}
