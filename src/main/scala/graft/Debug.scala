package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.queries.Fixtures

/** Dev profiling: times sub-stages of the hot operators at a given SF. */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Fixtures.table(spark, sfDir, "documents")
    val sh = time("shingles+persist") {
      val s = Dedup.wordShingles(docs, "doc_id", "text").persist(); s.count(); s
    }
    val sigs = time("signatures") {
      val g = Dedup.minHashSignatures(sh).persist(); g.count(); g
    }
    val cand = time("bands+candidates") {
      val c = Dedup.lshCandidates(Dedup.lshBands(sigs)).persist(); c.count(); c
    }
    println(s"[debug] candidates: ${cand.count()}")
    time("full minHashPairs") {
      Dedup.minHashPairs(docs, "doc_id", "text", 0.8).write.format("noop").mode("overwrite").save()
    }
    val embs = Fixtures.table(spark, sfDir, "embeddings")
    time("embedding nearDupPairs") {
      Similarity.nearDupPairs(embs, "vec_id", "embedding", 0.44)
        .write.format("noop").mode("overwrite").save()
    }
    time("sim_ann") {
      Similarity.annTopK(embs, embs.where(col("vec_id") % 100 === 0), "vec_id", "embedding", 10)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
