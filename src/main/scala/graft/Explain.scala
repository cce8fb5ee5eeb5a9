package graft

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
