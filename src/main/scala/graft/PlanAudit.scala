package graft

/** Plan audit main: prints formatted physical plans for the headline
  * queries so scan pushdown / broadcast / codegen spans can be reviewed.
  * `sbt "runMain graft.PlanAudit [queryName...]"` */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_project", "q1_pricing_summary", "q5_local_supplier",
        "q3_shipping_priority", "q_ann_topk", "q_dedup_exact",
        "q_doc_freq_score", "q_tfidf", "q_contamination", "q_pack_sequences")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
