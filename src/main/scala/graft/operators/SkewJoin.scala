package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY §4.1: the manual-Partitioner
  * escape hatch, Spark-native form). AQE's skew-join handles most
  * cases at runtime; explicit salting remains the tool when one side's
  * key distribution is pathological (e.g. a null-heavy or celebrity
  * key) and the skewed side must be split BEFORE the shuffle.
  *
  * Shape: the skewed (large) side gets a uniform random salt in
  * [0, salts); the small side is replicated `salts` times; the join
  * key becomes (key, salt). Row-level results are identical to the
  * unsalted join — the salt only splinters each hot key's hash bucket
  * into `salts` shuffle partitions.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small ON largeKey = smallKey`, salted.
    * `salts` ≈ number of tasks a single hot key should spread over. */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: Column, smallKey: Column, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt_l",
      (rand(seed = 42) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt_r",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall,
        largeKey === smallKey && col("__salt_l") === col("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
