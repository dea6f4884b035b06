package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/**
 * Dev-only: synthesize the sf1 scale-audit tables (the driver generates
 * sf <= 0.1, so 10x-data audits need a deterministic local corpus — the
 * BASELINE.md "sf1 scale audit" precedent from round 6).
 *
 * Key-carrying tables replicate the real sf0.1 rows with every key shifted
 * by `replica * 10_000_000`: row counts and per-key fanout (orders per
 * customer) scale exactly 10x, key distributions stay realistic, and the
 * contract queries' absent-key probes (+2M/+3M/+5M offsets) stay absent.
 * Replica 0 is the unmodified source. Non-key columns carry over verbatim
 * (they are payload to the kv serving paths under audit).
 *
 * Usage: graft.SynthScale [outDir=/root/repo/target/sf1] — documents.parquet
 * is synthesized separately (r6: half-text recombination) and left alone.
 */
object SynthScale {
  private val Replicas = 10
  private val Offset = 10_000_000L

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/root/repo/target/sf1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = explode(sequence(lit(0L), lit(Replicas - 1L))).as("r")

    spark.read.parquet(s"$src/customer.parquet")
      .select(col("*"), r)
      .withColumn("c_custkey", col("c_custkey") + col("r") * Offset)
      .drop("r")
      .repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")

    spark.read.parquet(s"$src/orders.parquet")
      .select(col("*"), r)
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * Offset)
      .withColumn("o_custkey", col("o_custkey") + col("r") * Offset)
      .drop("r")
      .repartition(8).write.mode("overwrite").parquet(s"$out/orders.parquet")

    // embeddings: key-shifted replicas with the vector ROTATED by the
    // replica index — rotation preserves the norm but decorrelates the
    // copies (cosine between rotations of a random vector ≈ random), so
    // replica clones don't manufacture quadratic exact-dup clusters the
    // real corpus wouldn't have. Replica 0 is the unmodified source.
    spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("*"), r)
      .withColumn("vec_id", col("vec_id") + col("r") * Offset)
      .withColumn("embedding",
        expr("""CASE WHEN r = 0 THEN embedding ELSE
               |  concat(slice(embedding, CAST(r + 1 AS INT), size(embedding) - CAST(r AS INT)),
               |         slice(embedding, 1, CAST(r AS INT))) END""".stripMargin))
      .drop("r")
      .repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Seq("customer", "orders", "embeddings").foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"[synth] $out/$t.parquet rows=$n")
    }
    spark.stop()
  }
}
