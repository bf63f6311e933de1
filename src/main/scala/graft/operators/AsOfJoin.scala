package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTime <= leftTime` for the same key (the time-series lookup Spark
  * has no built-in operator for).
  *
  * Implementation is the union+window shape, which scales: tag both sides,
  * union, ONE shuffle on (key) with an ordered window, propagate the last
  * seen right payload with `last(ignoreNulls)`, keep left rows. Never a
  * per-key range self-join (that is O(|left|·|right|) per key); wall-clock
  * is one sort-shuffle regardless of key skew in time.
  */
object AsOfJoin {

  /** Columns `payload` from `right` are attached to `left` with the given
    * prefix (null when no prior right row exists). Ties on equal timestamps
    * resolve to the right row (right sorts before left at equal time). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(payload.map(p => s"__p_$p" -> lit(null).cast(right.schema(p).dataType)).toMap)
    val rTagged = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side")) ++
        payload.map(p => col(p).as(s"__p_$p"))): _*)
    val lAligned = lTagged.select(
      (Seq(col(key), col("__t"), col("__side")) ++
        payload.map(p => col(s"__p_$p")) ++
        left.columns.filter(_ != key).map(c => col(c))): _*)
    // right rows carry only the asof columns; left columns become null there
    val rAligned = left.columns.filter(_ != key)
      .foldLeft(rTagged)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lAligned.unionByName(rAligned)
      .withColumns(payload.map(p =>
        s"$prefix$p" -> last(col(s"__p_$p"), ignoreNulls = true).over(w)).toMap)
    joined.filter(col("__side") === 1)
      .drop((Seq("__t", "__side") ++ payload.map(p => s"__p_$p")): _*)
  }

  /** As-of join with a MAX-GAP tolerance (pandas `merge_asof(tolerance=…)`
    * semantics): the nearest prior right row is matched as in [[asOf]], but
    * when that match is older than `toleranceMicros` the payload columns are
    * null — a stale quote/sensor reading must not attach to a trade/event
    * hours later. Only the NEAREST right row is ever considered; an older
    * in-tolerance row never substitutes for an out-of-tolerance nearest one.
    * Same single union+window shuffle as [[asOf]] — the matched right time
    * rides along as one extra propagated column and the gap test is a
    * map-stage expression after the window. */
  def asOfTolerance(left: DataFrame, right: DataFrame, key: String,
                    leftTime: String, rightTime: String,
                    payload: Seq[String], toleranceMicros: Long,
                    prefix: String = "asof_"): DataFrame = {
    val matchT = s"__matched_$rightTime"
    val rWithT = right.withColumn(matchT, col(rightTime))
    val joined = asOf(left, rWithT, key, leftTime, rightTime,
      payload :+ matchT, prefix)
    val gapOk = col(s"$prefix$matchT").isNotNull &&
      unix_micros(col(leftTime)) - unix_micros(col(s"$prefix$matchT")) <= toleranceMicros
    payload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"$prefix$p", when(gapOk, col(s"$prefix$p")))
    }.drop(s"$prefix$matchT")
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` for the same key (the "next event after"
    * lookup — time-to-next-purchase, next maintenance window, etc.).
    * Identical union+one-window shape as [[asOf]], scanned in descending
    * time order; ties on equal timestamps resolve to the right row. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String,
                  payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(payload.map(p => s"__p_$p" -> lit(null).cast(right.schema(p).dataType)).toMap)
    val rTagged = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side")) ++
        payload.map(p => col(p).as(s"__p_$p"))): _*)
    val lAligned = lTagged.select(
      (Seq(col(key), col("__t"), col("__side")) ++
        payload.map(p => col(s"__p_$p")) ++
        left.columns.filter(_ != key).map(c => col(c))): _*)
    val rAligned = left.columns.filter(_ != key)
      .foldLeft(rTagged)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lAligned.unionByName(rAligned)
      .withColumns(payload.map(p =>
        s"$prefix$p" -> last(col(s"__p_$p"), ignoreNulls = true).over(w)).toMap)
    joined.filter(col("__side") === 1)
      .drop((Seq("__t", "__side") ++ payload.map(p => s"__p_$p")): _*)
  }
}
