package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** MODEL-BASED testing for the standing delete store — the last of the
  * four stores to get a random-op suite. The model is the smallest of
  * all: a map of live label → key set (union = what morRead erases)
  * plus the applied ledger. Random sequences of append / replay /
  * crash-injected append / compact / reset / retire / vacuum must keep
  * `liveDeletes` equal to the model's union after EVERY op, and the
  * final `morRead` equal to the model's anti-join. Fixed seeds, so
  * failures replay exactly. */
class DeleteStoreModelSpec extends SparkSpec {

  import DeleteStore._

  private def runSeed(seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"del-model-$seed-").toString
    val li = Tables.lineitem(spark, sfDir)
    val allKeys = li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey").as[Long].collect()

    // ---- the ~20-line model ------------------------------------------
    var live = Map.empty[String, Set[Long]] // label -> its key set
    var applied = Set.empty[String]
    var batchOf = Map.empty[String, Set[Long]] // immutable once applied
    def union: Set[Long] = live.values.flatten.toSet
    // ------------------------------------------------------------------

    def keysDf(ks: Set[Long]) =
      ks.toSeq.sorted.toDF("l_orderkey")
    def check(op: String): Unit = {
      val got =
        if (manifest(spark, dir).live.isEmpty) Set.empty[Long]
        else liveDeletes(spark, dir).as[Long].collect().toSet
      assert(got == union,
        s"seed=$seed after $op: store live keys ${got.size} != " +
          s"model ${union.size}")
      assert(manifest(spark, dir).applied.toSet == applied,
        s"seed=$seed after $op: applied ledger diverged")
    }

    init(spark, dir, keys = Seq("l_orderkey"))
    var n = 0
    var nFold = 0
    (1 to 12).foreach { step =>
      rnd.nextInt(7) match {
        case 0 | 1 => // fresh append
          n += 1
          val ks = rnd.shuffle(allKeys.toSeq).take(rnd.nextInt(20) + 1).toSet
          append(keysDf(ks), dir, s"d$n")
          applied += s"d$n"; batchOf += (s"d$n" -> ks); live += (s"d$n" -> ks)
          check(s"append d$n")
        case 2 => // replay of a committed label, possibly with WRONG data
          if (applied.nonEmpty) {
            val l = rnd.shuffle(applied.toSeq).head
            val decoy = rnd.shuffle(allKeys.toSeq).take(3).toSet
            append(keysDf(decoy), dir, l) // committed = immutable: no-op
            check(s"replay $l")
          }
        case 3 => // crash-injected append, then 50/50 replayed
          n += 1
          val ks = rnd.shuffle(allKeys.toSeq).take(rnd.nextInt(20) + 1).toSet
          intercept[RuntimeException] {
            append(keysDf(ks), dir, s"d$n",
              beforeCommit = () => throw new RuntimeException("crash"))
          }
          check(s"crashed append d$n") // nothing committed
          if (rnd.nextBoolean()) {
            append(keysDf(ks), dir, s"d$n") // replay converges
            applied += s"d$n"; batchOf += (s"d$n" -> ks); live += (s"d$n" -> ks)
            check(s"replayed crash d$n")
          }
        case 4 => // compact folds live labels into one
          if (live.nonEmpty) {
            nFold += 1
            compact(spark, dir, s"fold$nFold")
            applied += s"fold$nFold"
            live = Map(s"fold$nFold" -> union)
            check(s"compact fold$nFold")
          }
        case 5 => // reset (a rewrite materialized the deletes)
          reset(spark, dir)
          live = Map.empty
          check("reset")
        case 6 => // retire a random subset of live labels; vacuum after
          val victims = live.keys.filter(_ => rnd.nextBoolean()).toSeq
          retire(spark, dir, victims)
          live = live -- victims
          vacuum(spark, dir)
          check(s"retire ${victims.mkString(",")}+vacuum")
      }
    }
    // final read surface: morRead == the model's anti-join
    val got = morRead(li, dir).select($"l_orderkey").as[Long]
      .collect().toSet
    val expect = allKeys.toSet -- union
    assert(got == expect,
      s"seed=$seed: morRead diverged from the set model " +
        s"(got ${got.size}, expect ${expect.size})")
    StoreIO.deleteLocalDirs(java.util.List.of(dir))
  }

  Seq(7L, 404L, 99991L, 20260816L).foreach { seed =>
    test(s"random op sequence agrees with the key-set model (seed $seed)") {
      runSeed(seed)
    }
  }
}
