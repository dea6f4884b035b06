package graft

import java.nio.file.{Files, Paths}

import graft.core.Sessions

/** Dev tool: dump `explain("formatted")` for EVERY declared contract query
  * to a directory (one file per query) so the optimization-round plan audit
  * has the complete before/after record. Plans are captured at the bench
  * scale factor by default — join strategies are stats-driven and a
  * sf0.001 plan can broadcast where sf0.1 shuffles.
  *
  * Usage: runMain graft.PlanDump [sfDir] [outDir] [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "target/plans"
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qmap = SparkEntry.queries
    val names = (if (only.nonEmpty) qmap.keys.filter(only) else qmap.keys).toSeq.sorted
    for (name <- names) {
      try {
        val df = qmap(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"$name.txt"), plan.getBytes("UTF-8"))
        println(s"[plandump] $name ok (${plan.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
