package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY §4): salting for hot keys.
  *
  * AQE's skew-join split handles most runtime skew; these are for the
  * cases a planner can't fix — a groupBy where one key holds 30% of a
  * 100 TB table, or a join against a dimension whose hot keys are known.
  */
object Skew {

  /** Two-stage salted aggregation: partial-aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then merge partials.
    * `partials` maps output column -> partial agg; `merges` merges the
    * partials (sum→sum, count→sum, min→min, ...). */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                partials: Map[String, Column], merges: Map[String, Column => Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    partial.groupBy(col("__key"))
      .agg(merges(partials.head._1)(col(partials.head._1)).as(partials.head._1),
        partials.tail.keys.map(n => merges(n)(col(n)).as(n)).toSeq: _*)
  }

  /** Salted broadcast-side replication for a skewed shuffle join: explode
    * the small side `salts`× with a salt column, salt the big side randomly
    * but DETERMINISTICALLY (hash of a unique column), join on (key, salt).
    * Each hot key's rows spread over `salts` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 uniqueCol: String): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(salts)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }
}
