package graft.operators.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the "validate my 100 TB
  * table on every load" utility (the warehouse-side complement of the
  * reference's dirty-data side outputs, `BaseLogApp`'s quarantine
  * split). Each rule yields one report row (rule, checked,
  * violations, pass). The whole suite costs ONE scan per table (all
  * per-table rules share a single multi-output aggregate, unpivoted
  * to rows at the end — cardinality = rule count, not facts) plus one
  * key anti-join for the referential rule; nothing is collected to
  * the driver. Counts are integer-exact, so the report is fully
  * SQL-oracle-able.
  */
object Expectations {

  /** The expectation suite for the orders/lineitem pair: primary-key
    * uniqueness, completeness, value range, domain membership, and
    * lineitem→orders referential integrity. Null values count as
    * violations of range/domain rules (a null quantity is not "in
    * [1, 50]" — three-valued logic must not let it slip through). */
  def orderSuite(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def ruleRow(rule: String, checked: String, viol: String) =
      struct(lit(rule).as("rule"), col(checked).as("checked"),
        col(viol).as("violations"))

    val o = orders.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_pk"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("null_cust"),
        sum(when(col("o_totalprice").isNull ||
                 col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("bad_price"),
        sum(when(col("o_orderstatus").isNull ||
                 !col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("bad_status"))
      .select(explode(array(
        ruleRow("orders.o_orderkey is unique", "n", "dup_pk"),
        ruleRow("orders.o_custkey is complete", "n", "null_cust"),
        ruleRow("orders.o_totalprice > 0", "n", "bad_price"),
        ruleRow("orders.o_orderstatus in {O,F,P}", "n", "bad_status")))
        .as("r"))

    val l = lineitem.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity").isNull ||
                 col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("bad_qty"),
        sum(when(col("l_extendedprice").isNull ||
                 col("l_extendedprice") <= 0, 1L).otherwise(0L))
          .as("bad_ext"))
      .select(explode(array(
        ruleRow("lineitem.l_quantity in [1,50]", "n", "bad_qty"),
        ruleRow("lineitem.l_extendedprice > 0", "n", "bad_ext")))
        .as("r"))

    // referential: every l_orderkey must resolve in orders (the anti
    // join is the only exchange in the suite; the fact side prunes to
    // the key column before it moves)
    val fk = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n")))
      .select(explode(array(
        ruleRow("lineitem.l_orderkey references orders", "n", "orphans")))
        .as("r"))

    o.unionAll(l).unionAll(fk)
      .select(col("r.rule").as("rule"), col("r.checked").as("checked"),
        col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("pass"))
      .orderBy("rule")
  }
}
