package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declarative data-quality checks over the warehouse tables — the
  * constraint-report pass (uniqueness, completeness, referential
  * integrity, domain ranges) an admin runs before trusting a snapshot,
  * and a training pipeline runs before ingesting a drop. Each check is
  * one aggregate or one anti-join; the report is their union — all
  * integer counts, fully oracle-checkable.
  *
  * Scale shape: every check is a single-purpose scan (uniqueness =
  * groupBy count on the key; orphans = broadcast-or-shuffle anti-join
  * on the fk; domains/nulls = scan-side conditional counts that
  * collapse into ONE pass per table). Nothing materializes violations
  * row-by-row — only counts travel.
  */
object QualityChecks {

  /** q76: the standard constraint suite on the TPC-H-ish tables.
    * Output: (check, n_violations) — 0 everywhere on healthy data,
    * and the generated corpus IS healthy, so the oracle also proves
    * the checks agree on zero across engines (the spec proves they
    * catch planted violations). */
  def q76QualityChecks(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, d)
    val customer = Tables.customer(spark, d)
    val lineitem = Tables.lineitem(spark, d)

    // Uniqueness: duplicated primary-key values (count each extra row).
    val dupOrders = orders.groupBy($"o_orderkey").count()
      .where($"count" > 1)
      .agg(coalesce(sum($"count" - 1), lit(0L)).as("n"))
      .select(lit("orders_pk_dup").as("check_name"), $"n".as("n_violations"))

    // Referential integrity: fk rows with no parent (anti-joins).
    val orphanOrders = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_fk_customer").as("check_name"), $"n_violations")
    val orphanLines = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem_fk_orders").as("check_name"), $"n_violations")

    // Completeness + domain: one conditional-count pass per table.
    val lineDomains = lineitem.agg(
        sum(when($"l_quantity" <= 0, 1L).otherwise(0L)).as("bad_qty"),
        sum(when($"l_extendedprice" < 0, 1L).otherwise(0L)).as("bad_price"),
        sum(when($"l_orderkey".isNull, 1L).otherwise(0L)).as("null_fk"))
    val lineChecks = lineDomains.select(
        array(
          struct(lit("lineitem_qty_positive").as("check_name"), $"bad_qty".as("n_violations")),
          struct(lit("lineitem_price_nonneg").as("check_name"), $"bad_price".as("n_violations")),
          struct(lit("lineitem_fk_not_null").as("check_name"), $"null_fk".as("n_violations"))).as("a"))
      .select(explode($"a").as("s"))
      .select($"s.check_name", $"s.n_violations")

    dupOrders
      .unionByName(orphanOrders)
      .unionByName(orphanLines)
      .unionByName(lineChecks)
      .orderBy($"check_name")
  }

  val q76Sql: String =
    """SELECT * FROM (
      |  SELECT 'orders_pk_dup' AS check_name, CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n_violations
      |  FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_fk_customer', count(*) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders', count(*) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_qty_positive', CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_price_nonneg', CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_fk_not_null', CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |) ORDER BY check_name""".stripMargin

  /** Cross-modal completeness report — the governance gate a multimodal
    * training pipeline runs before a corpus ships: every document must
    * carry its embedding, no embedding may be orphaned, and the vector
    * column must be dimension-uniform (a ragged dim breaks every
    * downstream kernel silently). One co-partitioned full-outer join on
    * the id + one aggregate — at 100 TB both tables shuffle once on the
    * join key and the report is a single row. */
  def modalityChecks(docs: DataFrame, vecs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select($"doc_id", lit(1).as("has_d"))
    val v = vecs.select($"vec_id".as("doc_id"),
      size($"embedding").as("dim"), lit(1).as("has_v"))
    d.join(v, Seq("doc_id"), "full_outer")
      .agg(
        // coalesce OUTSIDE the sums: on an empty corpus sum() is null,
        // and a governance report must read 0, not null
        coalesce(sum(coalesce($"has_d", lit(0))), lit(0L)).as("n_docs"),
        coalesce(sum(coalesce($"has_v", lit(0))), lit(0L)).as("n_vecs"),
        coalesce(sum(when($"has_v".isNull, 1L).otherwise(0L)), lit(0L)).as("n_missing_vec"),
        coalesce(sum(when($"has_d".isNull, 1L).otherwise(0L)), lit(0L)).as("n_orphan_vec"),
        countDistinct($"dim").as("n_dims"),
        min($"dim").as("dim_min"), max($"dim").as("dim_max"))
  }

  def q117ModalityChecks(spark: SparkSession, d: String): DataFrame =
    modalityChecks(Tables.documents(spark, d), Tables.embeddings(spark, d))

  val q117Sql: String =
    """WITH j AS (
      |  SELECT d.doc_id AS did, e.vec_id AS vid, len(e.embedding) AS dim
      |  FROM documents d FULL OUTER JOIN embeddings e ON e.vec_id = d.doc_id
      |)
      |SELECT count(did) AS n_docs, count(vid) AS n_vecs,
      |       CAST(sum(CASE WHEN vid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_vec,
      |       CAST(sum(CASE WHEN did IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_vec,
      |       count(DISTINCT dim) AS n_dims,
      |       CAST(min(dim) AS INT) AS dim_min, CAST(max(dim) AS INT) AS dim_max
      |FROM j""".stripMargin
}
