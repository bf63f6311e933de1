package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation (PageRank) in EXACT fixed-point integer
  * arithmetic — authority/centrality scoring over entity graphs (host link
  * graphs for crawl prioritization, customer–supplier interaction graphs).
  *
  * Why integer: float PageRank sums contributions in shuffle order, so no
  * two runs (or engines) agree bit-for-bit. Here ranks are longs at a
  * fixed scale; each step is rank div outdeg → exact long sum → damped
  * integer recombine — every op exact, so the result is REPRODUCIBLE
  * across partitionings, retries, and engines (the same determinism
  * discipline as the dedup family's md5 keys). Precision: div truncation
  * loses < outdeg ulps per node per step at scale 10⁶ — ranking-order
  * noise far below 1 ppm per iteration.
  *
  * Scale shape: the classic Pregel loop — per iteration ONE shuffle
  * keying ranks by src (the edge join) and ONE re-aggregation by dst.
  * Edges are the big side and never change: pre-partition (or bucket) the
  * edge table on src once and the per-iteration exchange moves only the
  * nodes-sized rank frame. Dangling mass is handled by construction here
  * (callers pass symmetric edges) or leaks to teleport as in the original
  * formulation — documented per call site.
  */
object Graph {

  /** `iterations` damped PageRank steps over `edges(src: long, dst: long)`.
    * Returns (id, rank) for every node appearing in the edge list — src OR
    * dst, so sink nodes (incoming edges only) keep their incoming mass; a
    * sink's outgoing mass leaks to teleport as in the original formulation.
    * rank₀ = scale; rankᵢ₊₁ = (15·scale) div 100 + (85 · Σ_{(s→id)} (rankᵢ(s)
    * div outdeg(s))) div 100 — the standard d=0.85 update in longs.
    *
    * The RETURNED frame is persisted (and forced): that lets this method
    * release the edge cache before returning instead of leaking an
    * edges-sized cached dataset per invocation — callers ranking many
    * graphs in one session should `unpersist()` the result when done. */
  def pageRank(edges: DataFrame, iterations: Int = 5,
               scale: Long = 1000000L): DataFrame = {
    // the edge list feeds deg, the node set, AND every iteration's join —
    // without a persist the (possibly join-shaped) upstream plan would
    // re-execute 2 + iterations times; materialize it once (the
    // representatives() precedent — at cluster scale a bucketed edge
    // table on `src` additionally makes the per-iteration join
    // exchange-free on the edge side)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val teleport = (15L * scale) / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 0 until iterations) {
      // `div` is true integer division (not double-divide-then-truncate,
      // which goes inexact past 2^53)
      val contribs = ranks.join(deg, ranks("id") === deg("src"))
        .select(col("id").as("csrc"), expr("rank div deg").as("contrib"))
      val incoming = e.join(contribs, e("src") === col("csrc"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("acc"))
      ranks = nodes.join(incoming, nodes("id") === incoming("dst"), "left")
        .select(col("id"),
          (lit(teleport) + expr(s"(85 * coalesce(acc, 0L)) div 100"))
            .as("rank"))
    }
    finishRanks(ranks, e)
  }

  /** Materialize the final node-sized rank frame, then release the
    * edges-sized cache: the result's lineage references the edge frame
    * 2+iterations times, so the edge cache must outlive the first (and
    * only) evaluation — persist+count the ranks, THEN unpersist edges. */
  private def finishRanks(ranks: DataFrame, e: DataFrame): DataFrame = {
    val out = ranks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    e.unpersist(false)
    out
  }

  /** Persist the edge list as a table bucketed on `src`, out-degree
    * embedded per edge row — build ONCE, rank many (the graph analogue of
    * the BM25/IVF persisted-index family): each iteration's edges⋈ranks
    * join reads the corpus-sized edge side bucket-partitioned
    * (exchange-free), so only the nodes-sized rank frame moves per
    * iteration, and a nightly re-rank never re-shuffles the graph. */
  def buildEdgeIndex(edges: DataFrame, table: String, buckets: Int): Unit = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = e.groupBy(col("src").as("dsrc")).agg(count(lit(1)).as("deg"))
    Bucketing.writeBucketed(
      e.join(deg, e("src") === col("dsrc"))
        .select(col("src"), col("dst"), col("deg")),
      table, buckets, keys = Seq("src"))
  }

  /** [[pageRank]] over a [[buildEdgeIndex]] table — identical integer
    * dynamics (the gate shares [[pageRank]]'s oracle: layout changes the
    * plan, never the answer). */
  def pageRankFromIndex(spark: org.apache.spark.sql.SparkSession,
                        table: String, iterations: Int = 5,
                        scale: Long = 1000000L): DataFrame = {
    val e = Bucketing.readBucketed(spark, table)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val teleport = (15L * scale) / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 0 until iterations) {
      val incoming = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("acc"))
      ranks = nodes.join(incoming, nodes("id") === incoming("dst"), "left")
        .select(col("id"),
          (lit(teleport) + expr(s"(85 * coalesce(acc, 0L)) div 100"))
            .as("rank"))
    }
    ranks
  }

  /** Weighted PageRank over `edges(src, dst, w)` — interaction STRENGTH
    * (order counts, link multiplicity) steers the walk: each edge carries
    * contrib = (rank·w) div Σw(src), the per-edge integer division making
    * the result exactly reproducible like [[pageRank]]. Overflow bound:
    * rank·w < 2⁶³ (at scale 10⁶, weights up to ~9·10¹² — route heavier
    * multiplicities through a pre-normalized weight). */
  def pageRankWeighted(edges: DataFrame, iterations: Int = 5,
                       scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val teleport = (15L * scale) / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 0 until iterations) {
      val r = ranks.join(deg, ranks("id") === deg("src"))
        .select(col("id").as("rsrc"), col("rank"), col("wsum"))
      val incoming = e.join(r, e("src") === col("rsrc"))
        .select(col("dst"), expr("(rank * w) div wsum").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("acc"))
      ranks = nodes.join(incoming, nodes("id") === incoming("dst"), "left")
        .select(col("id"),
          (lit(teleport) + expr(s"(85 * coalesce(acc, 0L)) div 100"))
            .as("rank"))
    }
    finishRanks(ranks, e)
  }
}
