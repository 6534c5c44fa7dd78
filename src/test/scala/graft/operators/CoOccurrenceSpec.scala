package graft.operators

import graft.SparkSpec
import graft.queries.Relational4

/** Skew guard for the market-basket co-occurrence: per-basket top-N
  * capping must be invisible on healthy data and bounded + loud on an
  * adversarial mega-basket. */
class CoOccurrenceSpec extends SparkSpec {

  test("cap at or above the largest basket equals the uncapped query") {
    import spark.implicits._
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey")
    var logged = (-1L, -1L)
    val capped = Relational4.coOccurrenceCapped(items, minCount = 3, topK = 20,
        maxBasketItems = 10000, logDropped = Some((i, b) => logged = (i, b)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // A genuinely uncapped reference build, inline (the registered q89
    // routes through the cap-64 guard; the driver's oracle checks THAT
    // against uncapped SQL, this checks cap-insensitivity above the max).
    import org.apache.spark.sql.functions.{count, lit}
    val base = items.distinct()
    val frequent = base.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
      .where($"n" >= 3).select($"l_partkey")
    val pruned = base.join(frequent, Seq("l_partkey"))
    val uncapped = pruned.select($"l_orderkey", $"l_partkey".as("part_a"))
      .join(pruned.select($"l_orderkey", $"l_partkey".as("part_b")), Seq("l_orderkey"))
      .where($"part_a" < $"part_b")
      .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("n_together"))
      .orderBy($"n_together".desc, $"part_a".asc, $"part_b".asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val registered = Relational4.q89CoOccurrence(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(capped == uncapped)
    assert(registered == uncapped) // the cap-64 registered form is invisible here
    assert(logged == ((0L, 0L))) // nothing dropped, and the log said so
  }

  test("hot-key fallback (supportByWindow=false) equals the window form") {
    // The groupBy+join support form exists for corpora where one item
    // key is too hot to buffer in a single window task; it must be a
    // pure plan swap — identical rows out.
    import spark.implicits._
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey")
    def run(byWindow: Boolean) =
      Relational4.coOccurrenceCapped(items, minCount = 3, topK = 20,
          maxBasketItems = 64, supportByWindow = Some(byWindow))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(byWindow = false) == run(byWindow = true))
  }

  test("skew gate auto-selects the groupBy support form past the hot-key bound") {
    // The default supportByWindow=None consults the key profile: plant
    // an item hot enough to clear a (test-sized) hotKeyRowLimit and the
    // plan must swap its support computation from the count-window to
    // the groupBy+join form — one Window node (the basket ranking)
    // instead of two — with identical rows out. Cold data stays on the
    // window form.
    import spark.implicits._
    // item 1 spans 20 baskets (the hot key); items 2..4 span 4 baskets
    // each alongside item 1, so pairs survive minCount=3.
    val rows = (for (o <- 1L to 20L) yield (o, 1L)) ++
      (for (o <- 1L to 4L; p <- 2L to 4L) yield (o, p))
    val items = rows.toDF("l_orderkey", "l_partkey")
    def windowCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.size
    val gated = Relational4.coOccurrenceCapped(items, minCount = 3, topK = 10,
      maxBasketItems = 64, hotKeyRowLimit = 10L)
    val windowed = Relational4.coOccurrenceCapped(items, minCount = 3, topK = 10,
      maxBasketItems = 64, supportByWindow = Some(true))
    assert(windowCount(gated) == 1, "hot key must take the groupBy support path")
    assert(windowCount(windowed) == 2)
    assert(gated.collect().map(_.toString).toSeq ==
      windowed.collect().map(_.toString).toSeq)
    // Under the limit the gate keeps the window form (no extra exchange).
    val cold = Relational4.coOccurrenceCapped(items, minCount = 3, topK = 10,
      maxBasketItems = 64, hotKeyRowLimit = 1000L)
    assert(windowCount(cold) == 2, "cold data must stay on the window path")
  }

  test("NULL item keys neither earn support nor consume basket-cap slots") {
    // The count-window support prune must match the old inner-join
    // semantics: a window PARTITION BY would otherwise count the NULL
    // group, let NULL items pass the prune, and evict real items at
    // the basket cap.
    import spark.implicits._
    // every basket holds items 1, 2 and a NULL: all three "keys" span 3
    // baskets, so an unfiltered NULL would clear minCount=3 with equal
    // support and rank FIRST (nulls-first asc tie-break) — at cap=2 it
    // would evict item 2 from every basket and no pair would survive.
    val rows = Seq[(Long, java.lang.Long)](
      (1L, 1L), (1L, 2L), (1L, null),
      (2L, 1L), (2L, 2L), (2L, null),
      (3L, 1L), (3L, 2L), (3L, null))
      .toDF("l_orderkey", "l_partkey")
    val out = Relational4.coOccurrenceCapped(rows, minCount = 3, topK = 10,
        maxBasketItems = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 3L)), out.toString) // pair (1,2) in all 3 baskets
  }

  test("mega-basket is truncated to the cap, drop volume logged, healthy pairs kept") {
    import spark.implicits._
    // 3 mega-baskets (orders 1-3) each holding items 1..50; items reach
    // support 3 from the mega-baskets alone. Orders 100-119 repeat the
    // pair (1, 2) — the healthy signal the cap must preserve.
    val mega = for (o <- 1L to 3L; p <- 1L to 50L) yield (o, p)
    val healthy = for (o <- 100L to 119L; p <- Seq(1L, 2L)) yield (o, p)
    val items = (mega ++ healthy).toDF("l_orderkey", "l_partkey")
    var logged = (0L, 0L)
    val out = Relational4.coOccurrenceCapped(items, minCount = 3, topK = 5,
        maxBasketItems = 10, logDropped = Some((i, b) => logged = (i, b)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 3 baskets truncated, 40 items dropped from each
    assert(logged == ((120L, 3L)))
    // items 1 and 2 have the highest support (3 + 20 healthy orders), so
    // they survive the per-basket top-10 and the pair keeps its full
    // count: 20 healthy co-occurrences + 3 mega-basket ones
    assert(out.head == ((1L, 2L, 23L)))
    // every surviving pair count is bounded by what capped baskets emit:
    // no pair can exceed n_baskets-with-both; and the per-basket pair
    // volume is C(10,2)=45, not C(50,2)=1225
    val keptPairs = out.map(p => (p._1, p._2)).toSet
    assert(keptPairs.forall { case (a, b) => a < b })
  }
}
