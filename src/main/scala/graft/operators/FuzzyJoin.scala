package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — the record-linkage / data-cleaning
  * operator (near-identical names, titles, SKUs) that Spark has no native
  * form of and a naive formulation makes a |corpus|² cartesian.
  *
  * Blocking is the FastSS deletion neighborhood (Bocek et al., "Fast
  * Similarity Search in Large Dictionaries", 2007): for distance 1, two
  * strings a, b with levenshtein(a,b) ≤ 1 ALWAYS share a key in
  * {s} ∪ {s minus one character} — a substitution at i shares the
  * delete-at-i variant, an insertion/deletion shares the shorter string
  * itself. So an equi-join on deletion keys has 100% recall at d=1 and
  * Catalyst plans an ordinary shuffled join; candidates are bounded by
  * neighborhood density, never |corpus|².
  *
  * Scale discipline (the LSH-family rules): exact-duplicate strings
  * collapse to their min-id representative FIRST (a million identical
  * names would otherwise make every shared key quadratic in the dup
  * count); key buckets cap at the `maxBucket` smallest ids INSIDE the
  * aggregation buffer (bounded min-k heap — a degenerate key never
  * buffers its whole membership); only (id, short-string) pairs shuffle.
  */
object FuzzyJoin {

  /** Array of every single-character-deletion variant of `s` (empty array
    * for the empty string). Pure codegen'd built-ins: transform over a
    * 0..len-1 sequence of split points. */
  def deletionVariants(s: Column): Column =
    when(length(s) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), length(s) - 1),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))))

  /** All pairs of DISTINCT `strCol` values within Levenshtein distance 1,
    * as (id_a < id_b, s_a, s_b, dist) over min-id representatives.
    * Exact duplicates are NOT emitted as pairs (compose with
    * [[Dedup.exact]] for those). A pair found via several shared keys is
    * emitted once. `maxBucket` bounds any pathological key bucket by
    * smallest id — non-binding on natural name data (see the gate), hard
    * insurance on adversarial data. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxBucket: Int = 64): DataFrame = {
    val reps = df.groupBy(col(strCol).as("s"))
      .agg(min(col(idCol).cast("long")).as("id"))
    val keyed = reps.select(col("id"),
      explode(array_union(array(col("s")), deletionVariants(col("s")))).as("k"))
    val buckets = keyed.groupBy(col("k"))
      .agg(graft.plans.Native.minKByKey(col("id"), col("id"), maxBucket).as("ks"))
      .select(transform(col("ks"), e => e.getField("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val cands = buckets.select(explode(flatten(transform(col("ids"),
        (a, i) => transform(slice(col("ids"), i + 2, size(col("ids"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    cands
      .join(reps.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(reps.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"), col("dist"))
  }
}
