package graft

/** Dev tool: print formatted physical plans for headline queries so
  * pushdown / broadcast / whole-stage-codegen can be audited
  * (`runMain graft.Explain <sfDir> [query...]`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_agg_pricing_summary", "q_join_broadcast", "q_join_star",
        "q_filter_project", "q_sim_topk_brute")
    val spark = Sessions.local(cpus = 4, appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
