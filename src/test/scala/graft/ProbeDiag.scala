package graft

/** One-off diagnostic for the 10x scale probe: frame-hash chunk-bucket
  * and identical-signature histograms, to attribute q108's blowup and
  * size the kernel fix. Run:
  * sbt 'Test/runMain graft.ProbeDiag /tmp/graft_sf1'
  */
object ProbeDiag {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local("graft-diag", "8")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hashes = graft.multimodal.Multimodal.frameHashes(
      graft.multimodal.Multimodal.syntheticAssets(spark, d))
    val n = hashes.count()
    val sigs = hashes.select($"ahash").distinct().cache()
    val nd = sigs.count()
    println(s"frames=$n distinctSig=$nd")

    def chunksOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"ahash", explode(array(
        (0 until 8).map(c => struct(lit(c).as("c"),
          shiftright($"ahash", c * 8).bitwiseAND(0xFFL).as("ck"))): _*)).as("b"))
        .select($"ahash", $"b.c".as("c"), $"b.ck".as("ck"))

    def vol(sized: org.apache.spark.sql.DataFrame): Long =
      sized.agg(sum(($"cnt" * ($"cnt" - 1) / 2).cast("decimal(38,0)")))
        .head.getDecimal(0).longValueExact()

    val rawSizes = chunksOf(hashes.select($"ahash"))
      .groupBy($"c", $"ck").agg(count(lit(1)).as("cnt"))
    println(s"cand RAW (current kernel)        = ${vol(rawSizes)}")

    val dSizes = chunksOf(sigs).groupBy($"c", $"ck")
      .agg(count(lit(1)).as("cnt")).cache()
    println(s"cand DISTINCT-collapsed          = ${vol(dSizes)}")

    val hotCap = 2048
    val coldVol = vol(dSizes.where($"cnt" <= hotCap))
    // hot buckets: refine by 8 x 7-bit groups of the remaining 56 bits
    val hot = chunksOf(sigs).join(
      dSizes.where($"cnt" > hotCap).select($"c", $"ck"), Seq("c", "ck"))
    val rem = hot
      .withColumn("low", expr("ahash & (shiftleft(CAST(1 AS BIGINT), 8 * c) - 1)"))
      .withColumn("r", expr(
        "shiftleft(shiftrightunsigned(ahash, 8 * (c + 1)), 8 * c) | low"))
    val sub = rem.select($"c", $"ck", explode(array(
        (0 until 8).map(g => struct(lit(g).as("g"),
          shiftrightunsigned($"r", g * 7).bitwiseAND(0x7FL).as("gk"))): _*)).as("s"))
      .select($"c", $"ck", $"s.g", $"s.gk")
    val subSizes = sub.groupBy($"c", $"ck", $"g", $"gk")
      .agg(count(lit(1)).as("cnt"))
    val hotVol = vol(subSizes)
    println(s"cand COLLAPSED+refined(cap=$hotCap) = ${coldVol + hotVol} (cold=$coldVol hot=$hotVol)")
    println("top refined sub-buckets: " + subSizes.orderBy($"cnt".desc).limit(8)
      .collect().map(r => s"${r.getLong(4)}").mkString(","))
    spark.stop()
  }
}
