package graft

/** Dev tool: dump the formatted physical plan of every query to a
  * directory (plan-review evidence; see PLANS.md). Usage:
  * runMain graft.ExplainAll [outDir] [sfDir]. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "docs/plans"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[explain-all] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

/** Dev tool: print the formatted physical plan and timing for one
  * query. Usage: runMain graft.Explain <query> [sfDir]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.get()
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[explain] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    val n2 = SparkEntry.queries(name)(spark, dir).count()
    println(f"[explain] $name (2nd run) rows=$n2 time=${(System.nanoTime() - t1) / 1e9}%.2fs")
    spark.stop()
  }
}
