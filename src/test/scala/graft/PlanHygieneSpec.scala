package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape regression tests — the SCALE.md claims as assertions, so
  * a refactor that silently loses pushdown, pruning, broadcast, or the
  * bounded-pagination plan fails CI instead of surviving to a 100 TB
  * cluster.
  */
class PlanHygieneSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  private def formattedPlanOf(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q1 prunes the lineitem scan to referenced columns only") {
    val plan = formattedPlanOf(queries.Relational.q1Agg(spark, sfDir))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    // 6 of the 11 lineitem columns
    assert(readSchema.count(_ == ',') <= 5, readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      readSchema)
  }

  test("q4 pushes its filters into the parquet scan") {
    val plan = formattedPlanOf(queries.Relational.q4FilesBrowse(spark, sfDir))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("EqualTo") || pushed.contains("IsNotNull"), plan)
  }

  test("q7 broadcasts the small dimension sides") {
    val plan = planOf(queries.Relational.q7JoinAgg(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q6 pagination avoids the global window; its page source is a bounded top-k") {
    import org.apache.spark.sql.functions._
    // the final page frame: no WindowExec, no hash-partitioned shuffle
    val plan = planOf(queries.Relational.q6Page(spark, sfDir))
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("hashpartitioning"), plan)
    // the page source shape (orderBy.limit) plans as TakeOrderedAndProject
    val src = graft.sources.Tables.orders(spark, sfDir)
      .orderBy(col("o_orderdate").desc).limit(120)
    assert(planOf(src).contains("TakeOrderedAndProject"), planOf(src))
  }

  test("q52 as-of join plans as union+window — no nested-loop join") {
    val plan = planOf(queries.Streams.q52AsOfAttribution(spark, sfDir))
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q63/q68 banded interval joins never fall back to a nested loop") {
    Seq(planOf(graft.operators.IntervalJoin.q63IntervalAttribution(spark, sfDir)),
      planOf(graft.operators.IntervalJoin.q68OverlapPairs(spark, sfDir))).foreach { plan =>
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan)
    }
  }

  test("q78 fuzzy join blocks on deletion variants — an equi-join, not a nested loop") {
    val plan = planOf(graft.operators.FuzzyJoin.q78FuzzyNames(spark, sfDir))
    // a raw levenshtein(a,b) <= 1 cross predicate would plan as
    // BroadcastNestedLoopJoin; FastSS blocking must keep it an equi-join
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q112 sessionize runs one hash exchange: user_id satisfies every window") {
    // lag/cumsum partition on user_id; the (user_id, sess_id) windows are
    // satisfied by the same HashPartitioning, so EnsureRequirements must
    // add sorts, not a second hash exchange. The only other exchange is
    // the presentation orderBy's range partitioning.
    val plan = planOf(queries.Streams.q112Sessionize(spark, sfDir))
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert("rangepartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("q113 shuffle shards: codegen'd hash, per-shard window, no global sort window") {
    val plan = planOf(graft.operators.Sampling.q113ShuffleShards(spark, sfDir))
    // the rank partitions by shard — a single-partition global window
    // would show hashpartitioning on an empty key list / SinglePartition
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("hashpartitioning()"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("q114 length batches shuffle on the band, never a one-partition window") {
    val plan = planOf(graft.operators.Sampling.q114LengthBatches(spark, sfDir))
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("hashpartitioning()"), plan)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q119 corpus diff: keyed joins only, shingle work gated behind the status filter") {
    val plan = planOf(graft.operators.CorpusDiff.q119CorpusDiff(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("FullOuter"), plan)
  }

  test("q121 span pairs: equi-join candidates, per-(pair,diagonal) window, no alignment loop") {
    val plan = planOf(graft.operators.SpanDedup.q121SpanPairs(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("Window"), plan)
  }

  test("q120 double correlation plans as order-grain aggregates, not subquery loops") {
    // r17 optimization: the EXISTS/NOT-EXISTS pair is evaluated as two
    // per-order counting aggregates (n_supp >= 2, n_late == 1) joined
    // on the order key — no semi/anti join, no recomputed `late`
    // lineage, and still never a per-row subquery loop.
    val plan = planOf(queries.Relational4.q120SoleLateSupplier(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q85 forward as-of keeps the union+window single-shuffle shape") {
    val plan = planOf(queries.Streams.q85ForwardAsOf(spark, sfDir))
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q67 gap fill generates the calendar per key — no cartesian grid") {
    val plan = planOf(queries.Relational3.q67GapFill(spark, sfDir))
    assert(plan.contains("Generate"), plan) // sequence+explode, per key
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("every groupBy query runs partial aggregation (no single-shot hash agg)") {
    val plan = planOf(queries.Relational.q1Agg(spark, sfDir))
    // partial + final pair: HashAggregate appears at least twice
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q92 priority keeper is one aggregate pass — no window, no join-back") {
    val plan = planOf(queries.TrainingData.q92DedupPriority(spark, sfDir))
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q93 source mix scans documents once and prunes to its three columns") {
    val plan = formattedPlanOf(graft.operators.Sampling.q93SourceMix(spark, sfDir))
    // one scan node in the numbered tree (formatted mode repeats the
    // node name once more in the details section)
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan).size == 1, plan)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("text"), readSchema) // the wide column stays unread
  }

  test("q96 boilerplate broadcasts the segment-df table and shares one doc shuffle") {
    val plan = planOf(queries.TrainingData.q96Boilerplate(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
    // the df(seg) table joins back broadcast, not shuffled
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the n_segments window and the reassembly groupBy reuse a single
    // doc_id exchange — a second one means the shared partitioning broke
    assert("hashpartitioning\\(doc_id".r.findAllIn(plan).size == 1, plan)
  }

  test("q97 source overlap stays on the LSH edge list — no all-pairs fallback") {
    val plan = planOf(queries.TrainingData.q97SourceOverlap(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("q98 bigram lift reads the materialized count table, not four corpus scans") {
    graft.util.PlanCache.clearAll()
    val plan = planOf(queries.TrainingData.q98BigramLift(spark, sfDir))
    // counts + both marginals + the total all read the cached table
    assert("InMemoryTableScan".r.findAllIn(plan).size >= 4, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan) // bounded top-n
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q149/q150 LM scoring tokenizes ONCE: consumers read the materialized count tables") {
    graft.util.PlanCache.clearAll()
    // Node-level counts on sparkPlan: the explain STRING renders each
    // InMemoryRelation's cached subtree inline, so string-counting
    // FileScans would see the tokenize scan once per cached read.
    def counts(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val p = df.queryExecution.sparkPlan
      (p.collect { case n if n.nodeName.contains("InMemoryTableScan") => 1 }.sum,
        p.collect { case n if n.nodeName.contains("Scan parquet") ||
          n.nodeName.contains("FileSourceScan") => 1 }.sum)
    }
    // q149: per-doc bigram + unigram tables each feed a corpus aggregate
    // AND a join side — four cached reads; the only parquet read left is
    // the thin doc_id spine of the final LEFT JOIN.
    val (imts149, scans149) = counts(
      graft.operators.LmScore.q149LmFluency(spark, sfDir))
    assert(imts149 >= 4, s"q149 cached reads: $imts149")
    assert(scans149 <= 1, s"q149 parquet scans: $scans149")
    // q150 rides the SAME materialized bigram table (built by q149 above
    // — cross-query reuse is the point), plus thin (doc_id, source)
    // spine scans.
    val (imts150, scans150) = counts(
      graft.operators.LmScore.q150TargetAffinity(spark, sfDir))
    assert(imts150 >= 3, s"q150 cached reads: $imts150")
    assert(scans150 <= 3, s"q150 parquet scans: $scans150")
  }

  test("capped co-occurrence pair join is an equi-join on the basket key") {
    import org.apache.spark.sql.functions.col
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    val plan = planOf(queries.Relational4.coOccurrenceCapped(items, 3, 20, 100))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("q103 intra-doc dedup is shuffle-free except the presentation sort") {
    // the dedup itself is a scan-side array_distinct projection; the only
    // Exchange allowed is the final orderBy's range partitioning.
    val plan = planOf(queries.TrainingData.q103IntraDocDedup(spark, sfDir))
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
  }

  test("q102 span coverage joins positions to duplicated shingles as an equi-join") {
    val plan = planOf(queries.TrainingData.q102DupSpans(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    // interval union is the per-doc window, present exactly once
    assert("WindowExec|Window ".r.findAllIn(plan).nonEmpty, plan)
  }

  test("q104 familiarity is map-only: no join, no aggregation exchange") {
    val plan = planOf(queries.TrainingData.q104Familiarity(spark, sfDir))
    // the r14 kernel scores each doc in one pass against a broadcast
    // familiar set: the only exchange left is the output sort, and the
    // scan reads exactly (doc_id, text)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Generate"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan) // rangepartitioning
    assert(plan.contains("rangepartitioning(doc_id"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("q122 CDC dedup: scan-side chunking, one hash shuffle, bounded top-k") {
    val plan = planOf(graft.operators.Chunking.q122CdcDedup(spark, sfDir))
    // the report is orderBy+limit → TakeOrderedAndProject, never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"), plan)
    // chunk aggregation is partial before the exchange
    assert(plan.contains("partial_count") || plan.contains("partial"), plan)
  }

  test("q121/q102 share one materialized position index") {
    graft.util.PlanCache.clearAll()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    graft.operators.SpanDedup.dupSpanCoverageOf(docs, 5).count()
    val plan = planOf(graft.operators.SpanDedup.spanPairsOf(docs, 5, 8))
    // the second consumer must read the InMemoryRelation, not re-shingle
    assert(plan.contains("InMemoryTableScan"), plan)
    graft.util.PlanCache.clearAll()
  }

  test("q137 disjunction: single-side residuals reach both scans, join stays broadcast") {
    val plan = planOf(queries.Relational5.q137DisjunctiveRevenue(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    // Catalyst must factor the OR: quantity bounds on the lineitem scan,
    // brand/size bounds on the part scan — neither side reads unfiltered.
    val scans = plan.split('\n').filter(_.contains("FileScan"))
    assert(scans.exists(s => s.contains("l_quantity")), plan)
    assert(scans.exists(s => s.contains("p_brand")), plan)
  }

  test("q109 clusters ride q108's materialized frame-signature table") {
    graft.util.PlanCache.clearAll()
    graft.multimodal.Multimodal.frameNearDup(spark, sfDir).count()
    val plan = planOf(graft.multimodal.Multimodal.visualDupClusters(spark, sfDir))
    // the cluster query must read the cached signatures, not re-decode
    assert(plan.contains("InMemoryTableScan"), plan)
    graft.util.PlanCache.clearAll()
  }

  test("q116 containment rides q21's materialized intersection counts") {
    graft.util.PlanCache.clearAll()
    graft.operators.Dedup.ngramJaccard(spark, sfDir, 0.6).count()
    val plan = planOf(graft.operators.Dedup.q116Containment(spark, sfDir))
    // the second consumer must read the cached pair frame, not re-run
    // the shingle self-join + pair aggregate
    assert(plan.contains("InMemoryTableScan"), plan)
    graft.util.PlanCache.clearAll()
  }

  test("q124 split leakage rides the LSH pair frame — no all-pairs shingle self-join") {
    // warm the pair cache the way Verify/Bench would (q22 runs first)
    graft.operators.Dedup.minhashLsh(spark, sfDir, 0.8).count()
    val plan = planOf(graft.operators.Sampling.q124SplitLeakage(spark, sfDir))
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q125 code-switch is one projection — no shuffle except the presentation sort") {
    val plan = planOf(graft.operators.TextAnalysis.q125CodeSwitch(spark, sfDir))
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("Api handlers never collect a whole metadata table driver-side") {
    // Source-level pin: every store.<table> read in the REST layer must
    // filter/aggregate on the Dataset BEFORE .collect()/.head(). A
    // deployment with 10^6 partitions would otherwise OOM the driver on
    // a GET. (The engine-side equivalents are pinned by their oracles.)
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/http/Api.scala"))
    val direct = """store\.(tables|partitions|snapshots|files|tasks)\s*\.\s*collect\(""".r
    assert(direct.findFirstIn(src).isEmpty,
      s"unfiltered collect in Api.scala: ${direct.findFirstIn(src)}")
    assert(!src.contains("collect().filter"),
      "driver-side filter after collect in Api.scala")
  }

  test("q143 drift: one co-partitioned outer join, no all-pairs, label-sized agg") {
    val plan = planOf(graft.operators.EmbeddingDrift.q143EmbeddingDrift(spark, sfDir))
    // drift compares a vector only to its own successor: an equi-join on
    // vec_id, never a similarity self-join
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("FullOuter") || plan.contains("full_outer"), plan)
    // the rollup keeps its partial aggregate before the label exchange
    assert(plan.contains("partial"), plan)
  }

  test("missing-files endpoint plans as a distributed anti-join, not a driver sweep") {
    // The Api missing-files route goes through Maintenance.missingFilesFrame;
    // at 100 TB a snapshot manifests millions of files, so the expected-set
    // comparison must be a LeftAnti join against the executor-side listing —
    // never an expected.collect() membership test on the driver.
    val store = new graft.meta.MetaStore(spark,
      java.nio.file.Files.createTempDirectory("plan-missing").toString)
    import graft.meta.MetaStore._
    store.write("files", spark.createDataset(Seq(
      graft.meta.Model.FileMeta("db", "t", 1, 0, "/tmp/x.parquet", "PARQUET", 0,
        Map.empty[String, String], 1L, 1L))))
    val plan = planOf(graft.operators.Maintenance
      .missingFilesFrame(spark, store, "db", "t", 1L))
    assert(plan.contains("LeftAnti"), plan)
    // source-level pin: the endpoint must route through the frame
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/http/Api.scala"))
    assert(src.contains("Maintenance.missingFiles"), "Api must use the anti-join path")
  }

  test("q144 min-cost supplier: broadcast dims, ONE window min — no agg join-back") {
    val plan = planOf(queries.Relational5.q144MinCostSupplier(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
    // the correlated min is a single window over ONE offers scan — the
    // groupBy+join-back alternative re-scans the offers lineage per side
    assert("Window".r.findAllIn(plan).nonEmpty, plan)
    assert("FileScan parquet.*lineitem".r.findAllIn(plan).size == 1, plan)
  }
}
