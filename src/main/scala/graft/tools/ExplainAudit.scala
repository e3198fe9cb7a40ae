package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the load-bearing plan lines (scans, exchanges,
  * broadcasts, aggregates, windows) for the queries named on the command
  * line — the `.explain`-and-iterate loop SURVEY.md §7 mandates, in
  * greppable form. `runMain graft.tools.ExplainAudit [query ...]`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      val p = graft.SparkEntry.queries(n)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"===== $n")
      println(p.linesIterator.filter(l => l.contains("Scan") || l.contains("Exchange") ||
        l.contains("Broadcast") || l.contains("ReadSchema") || l.contains("Window") ||
        l.contains("HashAggregate") || l.contains("Join") || l.contains("Condition"))
        .take(200).mkString("\n"))
    }
    spark.stop()
  }
}
