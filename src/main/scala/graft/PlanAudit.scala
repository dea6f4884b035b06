package graft

import graft.core.Sessions

/** Dev-only: print the executed plan of named queries at a scale factor. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
