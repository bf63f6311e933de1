package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins as chunked EQUI-joins.
  *
  * Spark has no native range-join strategy: `a JOIN b ON a.t BETWEEN b.lo
  * AND b.hi` plans as a broadcast-nested-loop (or worse, a cartesian) —
  * every point × every interval, the canonical 100 TB killer. The classic
  * fix: quantize the join dimension into fixed chunks, explode each
  * interval onto the chunks it covers, tag each point with its one chunk,
  * and equi-join on (extra keys, chunk) — Catalyst then plans an ordinary
  * shuffled hash/sort-merge join — followed by the exact range predicate.
  * Candidates are bounded by per-chunk density instead of |points|×|ivals|.
  *
  * Chunk sizing: ≈ the typical interval width, so an interval explodes
  * into ~2 chunks and a chunk holds ~width-worth of points. Chunk ids come
  * from a monotone floor-division (candidate completeness needs ONLY
  * monotonicity — p ∈ [lo, hi] ⇒ chunk(p) ∈ [chunk(lo), chunk(hi)] — and
  * the final exact predicate carries correctness). Malformed intervals
  * (lo > hi) are dropped, matching the empty range they denote.
  *
  * reference: chewdata has no join stage at all (single-stream steps);
  * this is part of the relational surface the Spark engine adds (SURVEY
  * §2.1 15c's as-of join is the nearest sibling — nearest-past-match,
  * where this is containment/overlap).
  */
object RangeJoin {

  private def chunkOf(c: Column, chunk: Long): Column =
    floor(c.cast("double") / lit(chunk.toDouble)).cast("long")

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose [loCol, hiCol] contains pointCol (inclusive both
    * ends), optionally also matching on `keys` (join-key columns present
    * on both sides). Column sets must otherwise be disjoint. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      chunk: Long, keys: Seq[String] = Nil): DataFrame = {
    require(chunk > 0, s"chunk must be positive, got $chunk")
    val p = points.withColumn("__chunk", chunkOf(col(pointCol), chunk))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__chunk",
        explode(sequence(chunkOf(col(loCol), chunk), chunkOf(col(hiCol), chunk))))
    p.join(iv, keys :+ "__chunk")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__chunk")
  }

  /** Interval-overlap join: pairs where [aLo, aHi] and [bLo, bHi]
    * intersect (inclusive). Both sides explode onto their chunks; a pair
    * sharing several chunks would surface once per shared chunk, so each
    * pair is EMITTED exactly once — at the chunk of max(aLo, bLo), which
    * every overlapping pair's shared-chunk range contains. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      aLo: String, aHi: String, bLo: String, bHi: String,
                      chunk: Long, keys: Seq[String] = Nil): DataFrame = {
    require(chunk > 0, s"chunk must be positive, got $chunk")
    val l = left.filter(col(aLo) <= col(aHi))
      .withColumn("__chunk",
        explode(sequence(chunkOf(col(aLo), chunk), chunkOf(col(aHi), chunk))))
    val r = right.filter(col(bLo) <= col(bHi))
      .withColumn("__chunk",
        explode(sequence(chunkOf(col(bLo), chunk), chunkOf(col(bHi), chunk))))
    l.join(r, keys :+ "__chunk")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__chunk") === chunkOf(greatest(col(aLo), col(bLo)), chunk))
      .drop("__chunk")
  }
}
