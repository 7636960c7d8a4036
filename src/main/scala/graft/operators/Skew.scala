package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side's key into
  * `saltFactor` sub-keys and replicate the small side across all salts, so
  * one hot key spreads over `saltFactor` tasks instead of one straggler.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting is the tool when a single key is hot enough that even split
  * shuffle blocks overwhelm a task (the classic power-law key at 100 TB),
  * or when the join is not a sort-merge join AQE can split.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salted. `small` rows are
    * replicated `saltFactor`× (explode), so keep the factor modest (8–32).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
