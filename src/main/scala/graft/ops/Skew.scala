package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation — key salting for joins whose hot keys defeat hash
  * partitioning (the manual fallback when AQE skew-join splitting isn't
  * applicable, e.g. non-shuffle-join plans or pre-Spark-3 sinks).
  *
  * `saltedJoin` replicates the (small) right side `salt` times and
  * scatters the (large) left side across the replicas with a
  * deterministic salt derived from stable columns — hot keys fan out
  * over `salt` reducers instead of one. Result set is provably
  * identical to the plain join (tested).
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int, saltSource: String): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(salt.toLong)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
