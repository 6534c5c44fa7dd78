package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed tables: co-located joins and aggregations plan without a
  * shuffle exchange. */
class BucketingSpec extends SparkSpec {

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }

  test("join of two tables bucketed on the key plans with no Exchange") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val customer = graft.sources.Tables.customer(spark, sfDir)
    Bucketing.writeBucketed(orders, "bkt_orders", Seq("o_custkey"), 4)
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "bkt_customer", Seq("o_custkey"), 4)
    try {
      // disable broadcast so the shuffle-free plan is due to bucketing
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val joined = spark.table("bkt_orders")
          .join(spark.table("bkt_customer"), "o_custkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
        assert(joined.count() ==
          orders.join(customer,
            orders("o_custkey") === customer("c_custkey")).count())
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("groupBy on the bucket key plans with no Exchange") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    Bucketing.writeBucketed(orders, "bkt_orders_agg", Seq("o_custkey"), 4)
    try {
      val agg = spark.table("bkt_orders_agg")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
      assert(agg.count() == orders.select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS bkt_orders_agg")
  }
}
