package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation join (salting).
  *
  * AQE's skew-join handles most cases at runtime by splitting oversized
  * shuffle partitions, but it only fires for sort-merge joins after the
  * map stage materializes; salting remains the tool when the skew is
  * known up front, when the join must be shuffled-hash, or in
  * Structured Streaming where AQE is off. Pattern: give every row of
  * the large side a uniform salt in [0, salt), replicate the small(er)
  * side once per salt value, and join on (key, salt) — each hot key
  * then spreads over `salt` reducers. Result set is identical to the
  * unsalted inner equi-join (verified by oracle in q30).
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed, salted) with `dim` (replicated
    * `salt`×). `dim` should be the smaller side: its shuffle volume
    * multiplies by `salt`. */
  def saltedInnerJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                      salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    // Collision-free working column: extend "_salt" until it clashes
    // with neither input schema (withColumn would silently REPLACE an
    // existing column and corrupt user data).
    val taken = (big.columns ++ dim.columns).toSet
    val saltName = Iterator.iterate("_salt")(_ + "_").dropWhile(taken).next()
    // Any per-row value in [0, salt) preserves correctness; derive it
    // from the row's own key columns plus partition id so it needs no
    // extra state and stays uniform under key skew.
    val saltCol: Column =
      pmod(xxhash64(keys.map(col) :+ spark_partition_id().cast("long"): _*)
        + monotonically_increasing_id(), lit(salt.toLong))
    val b = big.withColumn(saltName, saltCol)
    val d = dim.withColumn(saltName,
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    b.join(d, keys :+ saltName).drop(saltName)
  }
}
