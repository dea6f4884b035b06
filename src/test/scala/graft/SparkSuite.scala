package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one SparkContext per test JVM). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.builder("local[8]", 8)
    .appName("graft-test")
    .getOrCreate()

  def sf(name: String): String = s"/root/testdata/$name"

  /** Fresh scratch dir under the build target (never outside the repo). */
  def scratch(name: String): String = {
    val dir = s"/root/repo/target/test-scratch/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(p, true)
    dir
  }
}
