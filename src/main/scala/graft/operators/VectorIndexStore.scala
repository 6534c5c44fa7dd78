package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent vector indexes — the stored form of the IVF and PQ
  * artifacts the session caches hold ([[Similarity.ivfIndex]],
  * [[ProductQuantization.pqIndex]]): centroids, inverted lists, PQ
  * codebooks and codes written as parquet tables so a deployment
  * builds the index in one job and serves queries from another.
  *
  *  - `centroids` (cent_id, cv)        coarse quantizer
  *  - `assigned`  (vec_id, v, cent_id) inverted lists (IVF)
  *  - `codebooks` (mi, code, cw)       per-subspace PQ codewords
  *  - `codes`     (vec_id, codes)      PQ-encoded corpus
  *
  * At 100 TB the inverted lists would be partitioned by cent_id
  * (probing reads only the probed lists' partitions) and the code
  * table is the only thing the ADC scan touches.
  */
object VectorIndexStore {

  def centroidsPath(dir: String) = s"$dir/centroids"
  def assignedPath(dir: String) = s"$dir/assigned"
  def codebooksPath(dir: String) = s"$dir/codebooks"
  def codesPath(dir: String) = s"$dir/codes"

  /** Build and persist the IVF index of a normalized (vec_id, v)
    * corpus. The inverted lists land under an `ingest_batch=base`
    * partition so later [[appendIvf]] batches sit beside them — the
    * same replay-idempotent layout as [[DedupIndex]]. */
  def buildIvf(e: DataFrame, dir: String, nCentroids: Int = 16,
      kmeansIters: Int = 4): Unit = {
    graft.functions.CosineSimilarity.register(e.sparkSession)
    val (cents, assigned) = Similarity.ivfIndex(e, nCentroids, kmeansIters)
    cents.write.mode(SaveMode.Overwrite).parquet(centroidsPath(dir))
    assigned.write.mode(SaveMode.Overwrite)
      .partitionBy("cent_id").parquet(s"${assignedPath(dir)}/ingest_batch=base")
  }

  /** Incrementally index a (vec_id, v) delta against the STORED
    * quantizer: assign each new vector to its nearest centroid (the
    * standard IVF maintenance move — lists grow, centroids only move
    * on an explicit rebuild/compaction) and write the rows under one
    * `ingest_batch=<label>` partition, Overwrite per partition, so
    * re-committing the same batch after a failure replaces rather than
    * duplicates. At 100 TB this is the difference between re-running
    * Lloyd over the corpus per ingest and one broadcast-argmax map
    * over the delta. */
  def appendIvf(delta: DataFrame, dir: String, label: String): Unit = {
    val spark = delta.sparkSession
    import spark.implicits._
    require(label.nonEmpty && label != "base",
      s"append label must be a non-base batch id, got '$label'")
    graft.functions.CosineSimilarity.register(spark)
    val cents = spark.read.parquet(centroidsPath(dir))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"cent_id".asc)
    delta.crossJoin(broadcast(cents))
      .withColumn("cos", Similarity.cos($"v", $"cv"))
      .withColumn("rn", row_number().over(wAssign))
      .where($"rn" === 1)
      .select($"vec_id", $"v", $"cent_id")
      .write.mode(SaveMode.Overwrite).partitionBy("cent_id")
      .parquet(s"${assignedPath(dir)}/ingest_batch=$label")
  }

  /** ANN top-k from the STORED IVF index: probe the query's nProbe
    * nearest centroid lists, exact-cosine the candidates, bounded
    * top-k. Partition pruning on cent_id keeps the scan to the probed
    * lists. */
  def queryIvf(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val cents = spark.read.parquet(centroidsPath(dir))
    val assigned = spark.read.parquet(assignedPath(dir))
    val wProbe = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cent_id".asc)
    val qprobes = queries
      .select($"vec_id".as("query_id"), $"v".as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", Similarity.cos($"qv", $"cv"))
      .withColumn("rn", row_number().over(wProbe))
      .where($"rn" <= nProbe)
      .select($"query_id", $"qv", $"cent_id")
    val scored = qprobes.join(assigned, Seq("cent_id"))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        Similarity.cos($"qv", $"v").as("cos"))
    val topK = udaf(new graft.functions.TopKAggregator(k))
    scored
      .groupBy($"query_id")
      .agg(topK($"cos", $"neighbor_id").as("ids"))
      .select($"query_id", explode($"ids").as("neighbor_id"))
      .orderBy($"query_id", $"neighbor_id")
  }

  /** IVF-blocked near-dup PAIRS entirely from the STORED index — the
    * cross-session form of [[Dedup.embeddingNearDupIvf]]: the persisted
    * inverted lists ARE the corpus (vec_id, v, cent_id), so dedup after
    * a restart re-reads neither the raw embeddings nor retrains the
    * quantizer. Multi-probe assignments come from one scan of the lists
    * against the stored-centroid broadcast; the pair kernel and exact
    * verify are the SAME code path as the in-session operator
    * ([[Dedup.blockedPairsOf]]), so the two forms cannot drift —
    * VectorIndexStoreSpec pins stored == session output. */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double,
      nAssign: Int = 8): DataFrame = {
    import spark.implicits._
    graft.functions.CosineSimilarity.register(spark)
    val cents = spark.read.parquet(centroidsPath(dir))
    val e = spark.read.parquet(assignedPath(dir)).select($"vec_id", $"v")
    val wAssign = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"cent_id".asc)
    val probes = e.crossJoin(broadcast(cents))
      .withColumn("cos", Similarity.cos($"v", $"cv"))
      .withColumn("rn", row_number().over(wAssign))
      .where($"rn" <= nAssign)
      .select($"vec_id", $"cent_id")
    Dedup.blockedPairsOf(e, probes, threshold)
  }

  /** Build and persist the PQ index (codebooks + encoded corpus). The
    * code table lands under `ingest_batch=base`, like the IVF lists. */
  def buildPq(e: DataFrame, dir: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 4): Unit = {
    val spark = e.sparkSession
    import spark.implicits._
    val (books, codes) = ProductQuantization.pqIndex(e, m, ksub, iters)
    val bookRows = for {
      mi <- books.indices; c <- books(mi).indices
    } yield (mi, c, books(mi)(c))
    spark.createDataset(bookRows).toDF("mi", "code", "cw")
      .write.mode(SaveMode.Overwrite).parquet(codebooksPath(dir))
    codes.write.mode(SaveMode.Overwrite)
      .parquet(s"${codesPath(dir)}/ingest_batch=base")
  }

  /** Incrementally encode a (vec_id, v) delta with the STORED
    * codebooks — one broadcast-encode map, no retraining — written
    * under an `ingest_batch=<label>` partition with per-partition
    * Overwrite (replay-idempotent, like [[appendIvf]]). */
  def appendPq(delta: DataFrame, dir: String, label: String): Unit = {
    val spark = delta.sparkSession
    import spark.implicits._
    require(label.nonEmpty && label != "base",
      s"append label must be a non-base batch id, got '$label'")
    val books = loadCodebooks(spark, dir)
    ProductQuantization.encode(delta.as[(Long, Array[Double])], books)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${codesPath(dir)}/ingest_batch=$label")
  }

  /** Index staleness audit — the consistency check a deployment runs
    * before trusting a stored index: which corpus vectors are MISSING
    * from the index (arrived after the last append → need indexing),
    * and which index rows are ORPHANED (vector deleted from the corpus
    * → need compaction)? Two anti-joins on vec_id; at 100 TB both
    * sides are id-projections, so the shuffle carries ids, not
    * vectors. Returns one row: (n_corpus, n_indexed, n_missing,
    * n_orphaned, fresh). */
  def ivfStaleness(corpus: DataFrame, dir: String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusIds = corpus.select($"vec_id")
    val indexIds = spark.read.parquet(assignedPath(dir)).select($"vec_id")
    val missing = corpusIds.join(indexIds, Seq("vec_id"), "left_anti").count()
    val orphaned = indexIds.join(corpusIds, Seq("vec_id"), "left_anti").count()
    val nCorpus = corpusIds.count()
    val nIndexed = indexIds.count()
    Seq((nCorpus, nIndexed, missing, orphaned,
      missing == 0 && orphaned == 0))
      .toDF("n_corpus", "n_indexed", "n_missing", "n_orphaned", "fresh")
  }

  /** Staleness-driven refresh: index exactly the corpus vectors the
    * stored IVF index is missing, as one `ingest_batch=<label>` append.
    * The delta is an anti-join of id-projections (ids cross the
    * shuffle, vectors only for the missing rows), so a mostly-fresh
    * 100 TB index refreshes at the cost of its delta, not a rebuild.
    * Orphans (deleted vectors still indexed) are reported by
    * [[ivfStaleness]] and removed by a rebuild/compaction — an append
    * cannot unwrite other batches' rows. Returns the number of vectors
    * indexed. */
  def refreshIvf(corpus: DataFrame, dir: String, label: String): Long = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val indexIds = spark.read.parquet(assignedPath(dir)).select($"vec_id")
    val missing = corpus.join(indexIds, Seq("vec_id"), "left_anti")
    val n = missing.count()
    if (n > 0) appendIvf(missing, dir, label)
    n
  }

  /** Load stored PQ codebooks back into the driver-side array form. */
  def loadCodebooks(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    import spark.implicits._
    val rows = spark.read.parquet(codebooksPath(dir))
      .as[(Int, Int, Array[Double])].collect()
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach { case (mi, c, cw) => books(mi)(c) = cw }
    books.map(_.toArray)
  }
}
