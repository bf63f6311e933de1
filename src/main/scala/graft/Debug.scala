package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs  -> $r")
    Console.flush()
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.01").documents

    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
    time("minhash candidates count")(cands.count())

    val sets = docs
      .select(col("doc_id").as("__sid"), split(trim(col("text")), "\\s+").as("__toks"))
      .select(col("__sid"), array_distinct(Dedup.shinglesFromTokens(col("__toks"), 3)).as("__sset"))
    time("sets count")(sets.count())

    val j = cands
      .join(sets.withColumnRenamed("__sid", "a").withColumnRenamed("__sset", "sa"), "a")
      .join(sets.withColumnRenamed("__sid", "b").withColumnRenamed("__sset", "sb"), "b")
      .select(col("a"), col("b"), Dedup.jaccard(col("sa"), col("sb")).as("jac"))
    val top = time("jaccard join")(j.orderBy(col("jac").desc).limit(10).collect().toSeq)
    top.foreach(println)

    val sim = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("bits"))
    time("simhash bits")(sim.count())
    val sp = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 20)
    val spc = time("simhash pairs h<=20")(sp.collect().toSeq)
    spc.sortBy(r => r.getAs[Int]("dist")).take(10).foreach(println)

    val lsh = Similarity.lshNearDupPairs(Tables(spark, "/root/testdata/sf0.01").embeddings, 0.2)
    val lc = time("emb lsh pairs cos>=0.2")(lsh.collect().toSeq)
    println(s"lsh pairs: ${lc.size}"); lc.take(5).foreach(println)
    spark.stop()
  }
}
