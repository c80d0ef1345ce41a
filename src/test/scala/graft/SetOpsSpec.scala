package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dwd.SetOps

/** Semantics + plan-shape checks for the relational-completeness
  * operators (semi/anti join, intersect/except, cube, top-k). */
class SetOpsSpec extends SparkTestBase {

  test("semi join equals inner-join-distinct reformulation") {
    val orders = Tables.orders(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val semi = SetOps.semiJoin(orders, li)
    val viaInner = orders
      .join(li.filter(col("l_quantity") > 45)
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("total"))
    assertSameRows(semi, viaInner)
  }

  test("anti join + semi join partition the customer table") {
    val cust = Tables.customer(spark, sf0001)
    val jan = Tables.orders(spark, sf0001)
      .filter(month(col("o_orderdate")) === 1).select(col("o_custkey"))
    val anti = SetOps.antiJoin(cust, Tables.orders(spark, sf0001)).count()
    val withOrders = cust.join(jan,
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti > 0 && anti + withOrders == cust.count())
  }

  test("bloom-pruned join: identical to plain join, fact rows pruned") {
    val li = Tables.lineitem(spark, sf0001)
    val orders = Tables.orders(spark, sf0001)
    val pruned = graft.operators.dwd.Joins.bloomPrunedJoin(li, orders)
    val plain = li.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .join(orders.filter(month(col("o_orderdate")) === 1)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("o_custkey"),
        round(col("l_quantity"), 2).as("qty"))
    assertSameRows(pruned, plain)
    // the bloom must actually prune: survivors ≪ the full fact table
    val dim = orders.filter(month(col("o_orderdate")) === 1)
    val bloom = dim.stat.bloomFilter("o_orderkey",
      math.max(dim.count(), 1L), 0.01)
    val survivors = li.collect()
      .count(r => bloom.mightContainLong(r.getAs[Long]("l_orderkey")))
    assert(survivors < li.count() / 2,
      s"bloom pruned nothing: $survivors of ${li.count()}")
  }

  test("grouped top-k aggregator equals the window-rank formulation") {
    val orders = Tables.orders(spark, sf0001)
    val viaAgg = SetOps.topKPerGroup(orders, k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("rank").cast("int").as("rank"),
        round(col("o_totalprice"), 2).as("total"))
    assertSameRows(viaAgg, viaWindow)
    // plan shape: a hash aggregate pair (partial + final), no Window
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("intersect/except partition the month-1 customer set") {
    val orders = Tables.orders(spark, sf0001)
    val m1 = orders.filter(month(col("o_orderdate")) === 1)
      .select("o_custkey").distinct().count()
    val both = SetOps.intersectCustomers(orders).count()
    val only1 = SetOps.exceptCustomers(orders).count()
    assert(only1 > 0 && both + only1 == m1)
  }

  test("cube emits all four grouping combinations consistently") {
    val orders = Tables.orders(spark, sf0001)
    val cube = SetOps.statusPriorityCube(orders).cache()
    val grand = cube.filter(col("status") === "ALL" && col("priority") === "ALL")
    assert(grand.count() == 1)
    val total = grand.collect()(0).getAs[Long]("order_ct")
    assert(total == orders.count())
    // per-status rows sum back to the grand total
    val perStatus = cube
      .filter(col("status") =!= "ALL" && col("priority") === "ALL")
      .agg(sum(col("order_ct"))).collect()(0).getLong(0)
    assert(perStatus == total)
    cube.unpersist()
  }

  test("top-k is a TakeOrderedAndProject, not a global sort") {
    val plan = SetOps.topKOrders(Tables.orders(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("top-k matches sort-then-head") {
    val orders = Tables.orders(spark, sf0001)
    val topk = SetOps.topKOrders(orders, 10).collect().map(_.toString).toSeq
    val ref = orders
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("total"))
      .orderBy(col("total").desc, col("o_orderkey").asc)
      .collect().take(10).map(_.toString).toSeq
    assert(topk == ref)
  }
}
