package graft.operators.skew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §7.4, 100 TB posture).
  *
  * When one join key carries a disproportionate share of rows, the
  * plain shuffle sends them all to one reducer. Salting splits each
  * key's rows across `salts` sub-partitions and replicates the other
  * (smaller, but not broadcastable) side once per salt — equal output,
  * bounded per-task input. AQE's skew-join handles moderate skew
  * automatically (enabled in our sessions); salting is the explicit
  * tool for the pathological keys AQE can't split (e.g. a single hot
  * key inside one reducer's range).
  */
object Salting {

  /** Equi-join `big ⋈ right on key`, with `big`'s rows scattered over
    * `salts` sub-keys and `right` replicated per salt. Bag-equal to the
    * plain join. */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    // salt by a per-row value (not the key!) so a hot key spreads out;
    // monotonically_increasing_id is partition-local and never shuffles
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedRight,
        Seq(key, "__salt"))
      .drop("__salt")
  }
}
