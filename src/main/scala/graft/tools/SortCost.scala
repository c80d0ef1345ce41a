package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.dwd.Joins
object SortCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[sortcost] $name: ${ts.min}%.2f s")
    }
    val lineitem = Tables.lineitem(spark, d); val orders = Tables.orders(spark, d)
    val full = Joins.orderWideTable(lineitem, orders)
    val noSort = lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("o_custkey"), col("o_orderstatus"),
        round(col("l_quantity"), 2).as("quantity"),
        round(col("l_extendedprice"), 2).as("amount"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    time("j1 with orderBy")(full.write.format("noop").mode("overwrite").save())
    time("j1 without orderBy")(noSort.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
