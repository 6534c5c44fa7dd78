package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** BPE tokenizer training at corpus scale (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-fitting pass of a training-data pipeline, fed by the
  * same corpus the engine curates.
  *
  * The expensive step is the WORD COUNT — one scan + one shuffle over
  * the full corpus. Everything after runs on the word-frequency table,
  * which is vocabulary-bounded (≪ corpus; ~1e8 rows for web text at
  * 100 TB, kilobytes at test SF). Each of the `nMerges` iterations is
  * one pair-count aggregation over that table plus a 1-row argmax —
  * tiny distributed jobs, never a corpus re-scan.
  *
  * Two equivalent merge-loop drivers (spec-asserted identical):
  *  - distributed: the vocab lives as a Dataset; per iteration one
  *    flatMap→agg→TakeOrdered(1), lineage cut with localCheckpoint
  *    every few merges (the connected-components discipline).
  *  - local fast path, threshold-gated: when the vocab fits the driver
  *    comfortably (`localVocabMax`), collect once and loop in memory —
  *    40 sub-millisecond iterations instead of 40 scheduler round
  *    trips. Same gate pattern as Dedup's small-edge-set cutover.
  *
  * Determinism: best pair = max count, ties broken lexicographically
  * on (left, right). Pair counts follow the reference algorithm:
  * every adjacent symbol position counts (overlapping repeats included),
  * weighted by word frequency; merging is greedy left-to-right.
  */
object BpeTrain {

  type Merge = (String, String)

  /** Greedy left-to-right application of one merge to a symbol seq. */
  private[operators] def applyMerge(syms: Array[String], pair: Merge): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  private def pairCountsLocal(vocab: Array[(Array[String], Long)]): Map[Merge, Long] = {
    val m = scala.collection.mutable.HashMap[Merge, Long]().withDefaultValue(0L)
    vocab.foreach { case (syms, f) =>
      var i = 0
      while (i + 1 < syms.length) { m((syms(i), syms(i + 1))) += f; i += 1 }
    }
    m.toMap
  }

  private def bestOf(counts: Iterable[(Merge, Long)]): Option[Merge] =
    if (counts.isEmpty) None
    else Some(counts.minBy { case ((a, b), n) => (-n, a, b) }._1)

  /** Reference in-memory merge loop over a word-frequency table —
    * also the local fast path of [[learnMerges]]. */
  private[operators] def learnMergesLocal(
      words: Array[(String, Long)], nMerges: Int): Array[Merge] = {
    var vocab = words.map { case (w, f) => (w.toCharArray.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    while (merges.length < nMerges && !done) {
      bestOf(pairCountsLocal(vocab)) match {
        case Some(p) =>
          merges += p
          vocab = vocab.map { case (s, f) => (applyMerge(s, p), f) }
        case None => done = true
      }
    }
    merges.toArray
  }

  /** Word-frequency table of the corpus: THE corpus-scale step. */
  def wordCounts(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where($"text".isNotNull)
      .select(explode(split(lower($"text"), " ")).as("word"))
      .where(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** Learn `nMerges` BPE merges from `docs`. `topWords` bounds the
    * vocab the merge loop sees (standard practice; rare-word tail
    * contributes ~nothing to pair counts but dominates vocab size at
    * web scale). Vocabs at or under `localVocabMax` run the in-memory
    * loop; larger ones stay distributed. */
  def learnMerges(docs: DataFrame, nMerges: Int, topWords: Int = 50000,
      localVocabMax: Int = 65536): Array[Merge] = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = wordCounts(docs)
      .orderBy($"freq".desc, $"word".asc).limit(topWords)
    if (topWords <= localVocabMax)
      return learnMergesLocal(wc.as[(String, Long)].collect(), nMerges)

    // distributed merge loop
    var vocab: Dataset[(Array[String], Long)] =
      wc.as[(String, Long)]
        .map { case (w, f) => (w.toCharArray.map(_.toString), f) }
        .persist()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    while (merges.length < nMerges && !done) {
      val best = vocab.flatMap { case (syms, f) =>
          syms.sliding(2).collect { case Array(a, b) => (a, b, f) }
        }
        .toDF("left", "right", "f")
        .groupBy($"left", $"right").agg(sum($"f").as("n"))
        .orderBy($"n".desc, $"left".asc, $"right".asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case Some((a, b, _)) =>
          val p = (a, b)
          merges += p
          val next = vocab.map { case (s, f) => (applyMerge(s, p), f) }
          val cut = if (merges.length % 8 == 0) next.localCheckpoint() else next
          val prev = vocab
          vocab = cut.persist()
          prev.unpersist()
        case None => done = true
      }
    }
    vocab.unpersist()
    merges.toArray
  }

  /** BPE-encode: token → subword pieces by applying the learned merges
    * in rank order (lowest-rank applicable pair first — the standard
    * encode loop). Pure map side: merge ranks broadcast in the closure,
    * no shuffle beyond what the caller adds. */
  def encodeWord(word: String, rank: Map[Merge, Int]): Array[String] = {
    var syms = word.toCharArray.map(_.toString)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: Merge = null
      var i = 0
      while (i + 1 < syms.length) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = applyMerge(syms, best)
      if (syms.length < 2) continue = false
    }
    syms
  }

  /** Oracle-parity guard: the q115/q147 DuckDB oracles encode by
    * applying each merge once in rank order via `replace()`, while
    * [[encodeWord]] re-checks lower ranks after every merge. The two
    * are equivalent UNLESS a later merge's output string equals a
    * component of an earlier merge — two different merges concatenating
    * to the same symbol (e.g. ('a','bc') and ('ab','c') both yielding
    * "abc") — because applying the later merge then creates pair
    * instances the already-passed earlier rank would have consumed.
    * The Sennrich argument in the oracle notes covers components being
    * outputs of lower ranks, not this aliasing; it is corpus-dependent,
    * so the oracle-backed queries ASSERT it instead of assuming it. */
  private[operators] def assertRankChainEncodable(merges: Array[Merge]): Unit = {
    val lowerComponents = scala.collection.mutable.HashSet[String]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val merged = l + r
      require(!lowerComponents.contains(merged),
        s"BPE oracle assumption violated: merge #${i + 1} ('$l','$r') produces " +
          s"'$merged', which is also a component of a lower-rank merge — the " +
          "rank-order replace() chain in q115Sql/q147Sql would diverge from " +
          "encodeWord on this corpus (see the oracle notes in BpeTrain.scala).")
      lowerComponents += l
      lowerComponents += r
    }
  }

  /** Per-document piece counts under the learned tokenizer:
    * (doc_id, n_words, n_pieces). Scan-side; the merge table rides the
    * closure (broadcast by Spark's task serialization). */
  def encodeStats(docs: DataFrame, merges: Array[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    docs.where($"text".isNotNull)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) =>
        val words = t.toLowerCase.split(' ').filter(_.nonEmpty)
        (id, words.length.toLong,
          words.map(w => encodeWord(w, rank).length.toLong).sum)
      }
      .toDF("doc_id", "n_words", "n_pieces")
      .orderBy($"doc_id")
  }

  /** q107: the learned merge table for the corpus — rank, pair, and the
    * merged symbol. Oracle: [[q107Sql]] re-runs the ENTIRE training loop
    * in DuckDB (20 chained MATERIALIZED argmax CTEs over a
    * separator-encoded vocab — see the oracle section below), taking no
    * literals from the engine; distributed == local is additionally
    * spec-asserted. */
  def q107BpeMerges(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    learnMerges(Tables.documents(spark, d), nMerges = 20)
      .zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b, a + b) }
      .toSeq.toDF("rank", "left", "right", "merged")
  }

  /** q115: the corpus tokenized under its own learned merges — per-doc
    * word and piece counts, the token-budget accounting every training
    * run needs. Train-then-apply in one query: [[learnMerges]] (one
    * corpus word-count shuffle + vocab-sized loop) feeds [[encodeStats]]
    * (pure scan-side encode, merge table in the closure). Oracle:
    * [[q115Sql]] re-learns the merges with the q107 chain, then replays
    * the rank-ordered encode as a 20-deep replace() chain per word;
    * BpeTrainSpec additionally pins the encode against hand-computed
    * pieces and the merge learner against the reference loop. */
  def q115BpeEncode(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val merges = learnMerges(docs, nMerges = 20)
    assertRankChainEncodable(merges) // q115Sql replays rank-order replace()
    encodeStats(docs, merges)
  }

  /** q147: tokenizer FERTILITY by language — pieces per word under the
    * corpus's own learned tokenizer, grouped by document language. The
    * standard tokenizer-fairness diagnostic for multilingual
    * pretraining (a language whose fertility is far above the corpus
    * mean pays more of the sequence budget per word and trains on
    * effectively less text — the compression-parity concern raised for
    * multilingual BPE vocabularies). Rides the q115 machinery: one
    * corpus word-count shuffle for training, one scan-side encode, one
    * bounded groupBy(lang); fertility is an IEEE division of the two
    * exact integer sums, identical in both engines. */
  def q147BpeFertility(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val merges = learnMerges(docs, nMerges = 20)
    assertRankChainEncodable(merges) // q147Sql replays rank-order replace()
    val stats = encodeStats(docs, merges)
    stats.join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("n_words"),
        sum($"n_pieces").as("n_pieces"))
      // NULL (not 0/0 = NaN) when a language holds only empty docs —
      // NaN semantics differ subtly across engines, NULL doesn't
      .withColumn("fertility",
        when($"n_words" > 0,
          $"n_pieces".cast("double") / $"n_words".cast("double")))
      .orderBy($"lang")
  }

  // --------------------------------------------------------------------
  // STATIC DuckDB oracles. The key trick: a symbol sequence is encoded
  // as one string — chr(31) flanking every symbol, chr(31)chr(31) in
  // each gap ("␟a␟␟b␟␟c␟") — so greedy left-to-right application of one
  // merge (a,b) is EXACTLY SQL replace(enc, '␟a␟␟b␟', '␟ab␟'):
  // replace() consumes left-to-right without overlap, and the flank
  // discipline makes partial-symbol matches impossible (a match's
  // leading ␟ must be a left flank, and symbols contain no ␟, so both
  // pattern symbols must align to whole vocab symbols). Training is
  // then 20 chained argmax rounds (pair-count → best → replace), all
  // MATERIALIZED: v{r-1} is referenced twice per round, and without
  // MATERIALIZED DuckDB inlines the chain into 2^20 scans.
  //
  // Encoding with the learned table in rank order is exact because a
  // merge's components are always outputs of LOWER-rank merges (they
  // existed when the pair was counted), so applying ranks 1..N
  // sequentially can never skip a newly-applicable lower rank — the
  // classic Sennrich encoder argument; BpeTrainSpec pins the loop
  // equivalence.
  // --------------------------------------------------------------------

  private val nOracleMerges = 20
  private val S = "chr(31)"           // symbol flank
  private val G = "chr(31)||chr(31)"  // inter-symbol gap

  /** The shared training-replay CTE chain: wc, v0, then per round r
    * p{r} (pair counts), b{r} (argmax), v{r} (vocab after merge r).
    * `withVocabUpdates=false` drops the final v{N} (q115 only needs the
    * b{r} rows). */
  private def trainCtes(withFinalVocab: Boolean): Seq[String] = {
    val head = Seq(
      s"""wc AS MATERIALIZED (
         |  SELECT word, count(*) AS freq FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL
         |  ) WHERE word <> '' GROUP BY word
         |  ORDER BY freq DESC, word ASC LIMIT 50000
         |)""".stripMargin,
      s"""v0 AS MATERIALIZED (
         |  SELECT freq, $S || array_to_string(string_split(word, ''), $G) || $S AS enc
         |  FROM wc
         |)""".stripMargin)
    val rounds = (1 to nOracleMerges).flatMap { r =>
      val pairs =
        s"""p$r AS MATERIALIZED (
           |  SELECT left_, right_, sum(freq) AS n FROM (
           |    SELECT freq, syms[i] AS left_, syms[i+1] AS right_
           |    FROM (SELECT freq, string_split(trim(enc, $S), $G) AS syms FROM v${r - 1}),
           |         unnest(range(1, len(syms))) AS t(i)
           |  ) GROUP BY 1, 2
           |)""".stripMargin
      val best =
        s"""b$r AS MATERIALIZED (
           |  SELECT left_, right_ FROM p$r
           |  ORDER BY n DESC, left_ ASC, right_ ASC LIMIT 1
           |)""".stripMargin
      val vocab =
        s"""v$r AS MATERIALIZED (
           |  SELECT v.freq,
           |         replace(v.enc, $S || b.left_ || $G || b.right_ || $S,
           |                        $S || b.left_ || b.right_ || $S) AS enc
           |  FROM v${r - 1} v CROSS JOIN b$r b
           |)""".stripMargin
      if (r < nOracleMerges || withFinalVocab) Seq(pairs, best, vocab)
      else Seq(pairs, best)
    }
    head ++ rounds
  }

  /** q107 oracle: DuckDB re-learns all 20 merges from the corpus (no
    * literals from the engine at all) and emits its own argmax rows. */
  val q107Sql: String = {
    val finals = (1 to nOracleMerges).map { r =>
      s"""SELECT $r AS rank, left_ AS "left", right_ AS "right", left_ || right_ AS merged FROM b$r"""
    }
    "WITH " + trainCtes(withFinalVocab = false).mkString(",\n") + "\n" +
      finals.mkString("\nUNION ALL\n") + "\nORDER BY rank"
  }

  /** Shared encode chain: the training CTEs, the learned pairs
    * collapsed into a one-row table m(l1,r1..l20,r20), every corpus
    * word encoded with a rank-ordered 20-deep replace chain, and the
    * per-doc rollup `perdoc`. */
  private def encodeCtes: Seq[String] = {
    // `m` collapses the learned pairs into one row via scalar
    // subqueries, NOT a cross join of b1..bN: a corpus with fewer than
    // N learnable merges leaves the later b{r} EMPTY, and a cross join
    // would empty `m` (and with it every per-doc row) while the engine
    // correctly encodes with the merges it did learn. A missing round
    // coalesces to the flank char, whose pattern can never match an
    // encoded word (symbols contain no flanks, and gaps are exactly two
    // flanks wide) — a structural no-op merge.
    val mCols = (1 to nOracleMerges)
      .map(r => s"coalesce((SELECT left_ FROM b$r), $S) AS l$r, " +
        s"coalesce((SELECT right_ FROM b$r), $S) AS r$r").mkString(",\n       ")
    val encChain = (1 to nOracleMerges).foldLeft(
      s"$S || array_to_string(string_split(word, ''), $G) || $S") { (e, r) =>
      s"replace($e, $S || m.l$r || $G || m.r$r || $S, $S || m.l$r || m.r$r || $S)"
    }
    trainCtes(withFinalVocab = false) ++ Seq(
      s"m AS MATERIALIZED (SELECT $mCols)",
      s"""words AS MATERIALIZED (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
         |    FROM documents WHERE text IS NOT NULL
         |  ) WHERE word <> ''
         |)""".stripMargin,
      s"""pieces AS MATERIALIZED (
         |  SELECT doc_id, len(string_split(trim($encChain, $S), $G)) AS np
         |  FROM words CROSS JOIN m
         |)""".stripMargin,
      // LEFT JOIN from the document set: the engine's encodeStats emits
      // (id, 0, 0) for a non-null but whitespace-only text, which has
      // no word rows — an inner GROUP BY over pieces would drop it.
      s"""perdoc AS MATERIALIZED (
         |  SELECT d.doc_id,
         |         coalesce(w.n_words, 0) AS n_words,
         |         coalesce(w.n_pieces, 0) AS n_pieces
         |  FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
         |  LEFT JOIN (
         |    SELECT doc_id, count(*) AS n_words, CAST(sum(np) AS BIGINT) AS n_pieces
         |    FROM pieces GROUP BY doc_id
         |  ) w USING (doc_id)
         |)""".stripMargin)
  }

  /** q115 oracle: re-learn the merges (same chain), encode every word,
    * aggregate per doc. */
  val q115Sql: String =
    "WITH " + encodeCtes.mkString(",\n") +
      "\nSELECT doc_id, n_words, n_pieces FROM perdoc ORDER BY doc_id"

  /** q147 oracle: the q115 chain grouped by document language; the
    * fertility division is IEEE double over the same exact integer
    * sums both engines compute. */
  val q147Sql: String =
    "WITH " + encodeCtes.mkString(",\n") + """
      |SELECT d.lang, count(*) AS n_docs,
      |       CAST(sum(p.n_words) AS BIGINT) AS n_words,
      |       CAST(sum(p.n_pieces) AS BIGINT) AS n_pieces,
      |       CASE WHEN sum(p.n_words) > 0
      |            THEN CAST(sum(p.n_pieces) AS DOUBLE)
      |                   / CAST(sum(p.n_words) AS DOUBLE) END AS fertility
      |FROM perdoc p JOIN documents d USING (doc_id)
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin
}
