package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class QualityChecksSpec extends SparkSpec {

  test("q76 reports zero violations on the healthy generated tables") {
    val out = QualityChecks.q76QualityChecks(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("orders_pk_dup", "orders_fk_customer",
      "lineitem_fk_orders", "lineitem_qty_positive", "lineitem_price_nonneg",
      "lineitem_fk_not_null"))
    assert(out.values.forall(_ == 0L), s"violations: $out")
  }

  test("checks catch planted violations") {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
    // plant: two extra copies of one pk row, one fk to a missing customer
    val planted = orders
      .unionByName(orders.limit(1)).unionByName(orders.limit(1))
      .unionByName(orders.limit(1).withColumn("o_custkey", lit(-99L)))

    val dup = planted.groupBy($"o_orderkey").count().where($"count" > 1)
      .agg(coalesce(sum($"count" - 1), lit(0L))).head.getLong(0)
    assert(dup >= 2L)

    val customer = Tables.customer(spark, sfDir)
    val orphans = planted.join(customer,
        planted("o_custkey") === customer("c_custkey"), "left_anti").count()
    assert(orphans == 1L)
  }
}
