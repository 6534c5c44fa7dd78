package graft.util

import org.apache.spark.sql.functions._

/** 30×/10× measurement harness for the CDC-consumer paths (SCALE.md
  * entries; run by hand, not in `sbt test` — the 30× replica needs a
  * 24g driver):
  *
  *   SPARK_DRIVER_MEM=24g sbt -batch \
  *     "Test/runMain graft.util.IvmScaleProbe /tmp/graft_sf3"
  *
  * Measures, median-of-3 where cheap and single-shot where the setup
  * dominates:
  *  1. syncAggMirror STEADY-STATE delta sync (count+sum, and the
  *     min/max variant with a deleted-extremum repair) vs a from-
  *     scratch re-aggregation of the same table — the "aggregate-sized
  *     merge, never a table scan" claim priced at scale.
  *  2. history() at a few hundred retained commits — an O(commits)
  *     sequential driver loop by design; this prices the constant.
  * Prints one JSON line per measurement. */
object IvmScaleProbe {

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = graft.Sessions.local("graft-ivm-probe")
    import spark.implicits._
    import graft.operators.GraftTable._

    val li = graft.sources.Tables.lineitem(spark, src)
    val keys = Seq("l_returnflag")
    val sums = Seq("l_quantity")
    val mm = Seq("l_extendedprice")

    // ---- 1. steady-state sync vs re-aggregation ----------------------
    val root = java.nio.file.Files.createTempDirectory("ivm-probe-")
      .toString
    val dir = s"$root/t"
    // the delete key is BLOOM-indexed, so the CDC delete-preimage
    // probe takes the index-pruned path for the ≤cap-key erasure
    // below. NO hand-tuned bloomBits (the r16 run needed 2^20 by
    // hand): the auto policy sizes each refresh's blooms from the
    // observed rows-per-file — the prune below must hold regardless.
    create(spark, dir, zoneCols = Seq("l_partkey"),
      bloomCols = Seq("l_orderkey"), deleteKeys = Seq("l_orderkey"))
    val (tLoad, _) = timed { append(li, dir, "b1") }
    // two min/max views: 3 giant groups (l_returnflag — a dirty group
    // is a third of the table, the worst case for repair) and the
    // realistic high-cardinality grouping (l_partkey — a dirty group is
    // ~rows/partkeys, where the repair's rows-of-dirty-groups bound
    // actually bites)
    val hiKeys = Seq("l_partkey")
    // bucket counts sized for the view scale (the knob a deployment
    // sets from key cardinality): 1024 for the ~200k-group agg view,
    // so an erasure's dirty-group rewrite is ~1/1024-grained
    val (tBase, _) = timed {
      syncAggMirror(spark, dir, s"$root/agg", keys, sums)
      syncAggMirror(spark, dir, s"$root/aggmm", keys, sums, mm, mm)
      syncAggMirror(spark, dir, s"$root/aggmm2", hiKeys, sums, mm, mm,
        buckets = 1024)
    }
    // delta window: a rekeyed sf0.001-sized append + a 50-key erasure
    // that INCLUDES a group extremum (forcing the min/max repair path)
    val small = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("l_orderkey", $"l_orderkey" + 900000000L)
    val deltaRows = small.count()
    append(small, dir, "b2")
    val extremum = li.orderBy($"l_extendedprice".desc).limit(1)
      .select($"l_orderkey").as[Long].head()
    val victims = li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey").limit(49)
      .union(Seq(extremum).toDF("l_orderkey"))
    delete(victims, dir, "e1")
    var repairRows = -1L
    // rows each delta sync physically WRITES (its new version dir
    // alone — carried-forward buckets are references): the r17
    // bucketed layout's claim is write volume ~flat in view size
    def vWritten(viewDir: String): Long = {
      val man = graft.operators.StoreIO.parseJson(
        graft.operators.StoreIO.readString(spark, s"$viewDir/_sync.json"))
      val c = graft.operators.StoreIO.jLong(man, "ver").orElse(
        graft.operators.StoreIO.jLong(man, "commit")).get
      val d = new java.io.File(s"$viewDir/v$c")
      if (!d.exists) 0L else spark.read.parquet(d.toString).count()
    }
    val (tSync, _) = timed {
      syncAggMirror(spark, dir, s"$root/agg", keys, sums)
    }
    val (tSyncMM, _) = timed {
      syncAggMirror(spark, dir, s"$root/aggmm", keys, sums, mm, mm,
        repairSeam = df => repairRows = df.count())
    }
    var repairRowsHi = -1L
    val (tSyncMMHi, _) = timed {
      syncAggMirror(spark, dir, s"$root/aggmm2", hiKeys, sums, mm, mm,
        repairSeam = df => repairRowsHi = df.count())
    }
    val aggHiRows = aggMirrorRead(spark, s"$root/aggmm2").count()
    val aggHiWritten = vWritten(s"$root/aggmm2")
    // a ROW mirror over the same table (the table-scale GDPR-mirror
    // shape, bucketed 1024): two steady-state windows priced by WRITE
    // volume — (a) a broad append + small erasure (inserts APPEND
    // segments, only the erasure's buckets fold), (b) a pure-erasure
    // window (the per-user deletion request: fold volume =
    // dirty-buckets' standing rows, ~keys/1024 of the view)
    val (tMirrorBase, _) = timed {
      syncMirror(spark, dir, s"$root/mirror", buckets = 1024)
    }
    val small2 = graft.sources.Tables
      .lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("l_orderkey", $"l_orderkey" + 950000000L)
    append(small2, dir, "b3")
    delete(li.select($"l_orderkey").distinct()
      .orderBy($"l_orderkey".desc).limit(5), dir, "e2")
    val (tMirrorSync, _) = timed {
      syncMirror(spark, dir, s"$root/mirror")
    }
    val mirrorRows = mirrorRead(spark, s"$root/mirror").count()
    val mirrorWritten = vWritten(s"$root/mirror")
    // (b) the pure-erasure window, for the mirror AND the hi-card agg:
    // absorb the (b3, e2) window into the agg first so e3 stands alone
    syncAggMirror(spark, dir, s"$root/aggmm2", hiKeys, sums, mm, mm)
    delete(li.select($"l_orderkey").distinct()
      .orderBy(($"l_orderkey" % 97).asc, $"l_orderkey".asc).limit(20),
      dir, "e3")
    val (tMirrorErase, _) = timed {
      syncMirror(spark, dir, s"$root/mirror")
    }
    val mirrorEraseWritten = vWritten(s"$root/mirror")
    val (tAggErase, _) = timed {
      syncAggMirror(spark, dir, s"$root/aggmm2", hiKeys, sums, mm, mm)
    }
    val aggEraseWritten = vWritten(s"$root/aggmm2")
    // deterministic read-volume evidence for the preimage prune (wall
    // times on this host drift ±30% run-over-run; file counts do not):
    // how many live files can hold ANY of the erasure's keys, per the
    // bloom qualify, vs the total the unpruned semi-join probe reads
    val victimVals = victims.collect().map(_.get(0)).toSeq
    val (pq, pu) = graft.operators.SkippingIndex.qualify(spark,
      s"$dir/index", Nil,
      Seq(graft.operators.SkippingIndex.ColumnEquals(
        "l_orderkey", victimVals)), Nil)
    // the single-key (GDPR-shaped) erasure, the prune's home turf
    val (sq, su) = graft.operators.SkippingIndex.qualify(spark,
      s"$dir/index", Nil,
      Seq(graft.operators.SkippingIndex.ColumnEquals(
        "l_orderkey", Seq(extremum))), Nil)
    val liveFilesN = spark.read.parquet(s"$dir/index/stats")
      .select("file").distinct().count()
    val (tReagg, nGroups) = timed {
      read(spark, dir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(28,2)")).as("s"),
          min(col("l_extendedprice")), max(col("l_extendedprice")))
        .count()
    }
    val tableRows = read(spark, dir).count()
    println(s"""{"probe":"ivm_steady_state","src":"$src",""" +
      s""""table_rows":$tableRows,"delta_rows":$deltaRows,""" +
      s""""load_s":${f"$tLoad%.2f"},"baseline_sync_s":${f"$tBase%.2f"},""" +
      s""""delta_sync_s":${f"$tSync%.2f"},""" +
      s""""delta_sync_minmax_s":${f"$tSyncMM%.2f"},""" +
      s""""repair_rescan_rows":$repairRows,""" +
      s""""delta_sync_minmax_hicard_s":${f"$tSyncMMHi%.2f"},""" +
      s""""repair_rescan_rows_hicard":$repairRowsHi,""" +
      s""""agg_hicard_rows":$aggHiRows,"agg_hicard_written":$aggHiWritten,""" +
      s""""mirror_baseline_s":${f"$tMirrorBase%.2f"},""" +
      s""""mirror_delta_sync_s":${f"$tMirrorSync%.2f"},""" +
      s""""mirror_rows":$mirrorRows,"mirror_written":$mirrorWritten,""" +
      s""""mirror_erase_sync_s":${f"$tMirrorErase%.2f"},""" +
      s""""mirror_erase_written":$mirrorEraseWritten,""" +
      s""""agg_erase_sync_s":${f"$tAggErase%.2f"},""" +
      s""""agg_erase_written":$aggEraseWritten,""" +
      s""""preimage_files_qualifying":${(pq ++ pu).distinct.size},""" +
      s""""preimage_files_one_key":${(sq ++ su).distinct.size},""" +
      s""""live_files":$liveFilesN,""" +
      s""""reagg_s":${f"$tReagg%.2f"},"groups":$nGroups}""")

    // ---- 2. history() at a few hundred retained commits --------------
    // (skippable with a second arg "nohist" — the 200-commit build
    // dominates a re-run that only needs the steady-state numbers)
    if (args.length > 1 && args(1) == "nohist") {
      graft.operators.StoreIO.deleteLocalDirs(java.util.List.of(root))
      spark.stop()
      return
    }
    val hroot = java.nio.file.Files.createTempDirectory("ivm-hist-")
      .toString
    val hdir = s"$hroot/t"
    create(spark, hdir, zoneCols = Seq("k"))
    val tiny = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val nCommits = 200
    val (tCommits, _) = timed {
      (1 to nCommits).foreach(i => append(tiny, hdir, s"c$i"))
    }
    val times = (1 to 3).map { _ =>
      timed { history(spark, hdir).collect().length }._1
    }.sorted
    println(s"""{"probe":"history_commits","commits":${nCommits + 1},""" +
      s""""build_s":${f"$tCommits%.2f"},""" +
      s""""history_median_s":${f"${times(1)}%.3f"}}""")

    graft.operators.StoreIO.deleteLocalDirs(java.util.List.of(root, hroot))
    spark.stop()
  }
}
