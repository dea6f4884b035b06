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
    // dedup_clusters breakdown: where do the extra ~30 s go vs dedup_minhash?
    spark.catalog.clearCache()
    val docs2 = Fixtures.table(spark, sfDir, "documents")
    val ids2 = docs2.select(col("doc_id").as("id"))
    val pairs2 = Dedup.minHashPairs(docs2, "doc_id", "text", 0.8)
    val idSet = ids2.select(col("id").cast("long"))
    val p2 = time("clusters: semi-join plan + persist + count") {
      val p = pairs2.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .join(idSet.withColumnRenamed("id", "id_a"), Seq("id_a"), "left_semi")
        .join(idSet.withColumnRenamed("id", "id_b"), Seq("id_b"), "left_semi")
        .persist()
      println(s"[debug] nPairs=${p.count()}")
      p
    }
    time("clusters: collect") { p2.collect() }
    time("clusters: full components + noop write") {
      Dedup.components(ids2, Dedup.minHashPairs(docs2, "doc_id", "text", 0.8))
        .write.format("noop").mode("overwrite").save()
    }
    time("clusters: second run (cache warm)") {
      Dedup.components(ids2, Dedup.minHashPairs(docs2, "doc_id", "text", 0.8))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
