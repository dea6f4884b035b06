package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions
import org.apache.spark.sql.functions._

import graft.functions._
import graft.queries.Fixtures

/** Dev tool: dumps formatted physical plans for the load-bearing queries
  * so pushdown / pruning / join strategy / codegen can be audited. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dump(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    val domain = Fixtures.customerDomain(spark, sfDir)
    dump("single-key get (expect: PartitionFilters shard=, PushedFilters key=)") {
      val k = java.nio.ByteBuffer.allocate(8).putLong(42L).array()
      val shard = graft.core.ShardIndex.shardIndex(k, domain.numShards)
      domain.read(spark).where(col("shard") === shard && col("key") === lit(k)).select("value")
    }
    dump("plain key= filter, NO shard mentioned (expect: ShardPruningRule injects PartitionFilters shard=)") {
      val k = java.nio.ByteBuffer.allocate(8).putLong(42L).array()
      domain.read(spark).where(col("key") === lit(k)).select("value")
    }
    dump("kv range scan (expect: scan description carries keyRange=, filters pushed)") {
      val kv = Fixtures.customerKvFileDomain(spark, sfDir)
      def be(l: Long) = java.nio.ByteBuffer.allocate(8).putLong(l).array()
      kv.rangeScan(spark, from = Some(be(100L)), to = Some(be(200L)))
    }
    dump("multiGet (expect: pruned scan + broadcast hash join)") {
      val keys = Fixtures.table(spark, sfDir, "customer")
        .where(col("c_custkey") % 7 === 0)
        .select(long_be(col("c_custkey")).as("key"))
      domain.multiGet(keys)
    }
    dump("q1_agg (expect: PushedFilters l_shipdate, pruned ReadSchema)") {
      queries.RelQueries.queries("q1_agg")(spark, sfDir)
    }
    dump("q3_join (expect: broadcast join on customer)") {
      queries.RelQueries.queries("q3_join")(spark, sfDir)
    }
    dump("q5 6-table join (expect: broadcasts on supplier/nation/region, shuffle joins on facts)") {
      queries.RelQueries.queries("q5_region_revenue")(spark, sfDir)
    }
    dump("minhash signatures (expect: single exchange, partial aggs, codegen despite 128 cols)") {
      graft.operators.Dedup.minHashSignatures(
        graft.operators.Dedup.wordShingles(
          Fixtures.table(spark, sfDir, "documents"), "doc_id", "text"))
    }
    dump("salted lookupJoin (expect: join keys (key, _salt) — hot key spread over salt tasks)") {
      val probe = Fixtures.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), long_be(col("o_custkey") % 50).as("key"))
      domain.lookupJoin(probe, salt = 8)
    }
    dump("lookupJoin, small non-literal probe (expect: PartitionFilters shard IN — derived from the probe relation at plan time)") {
      val probe = Fixtures.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), long_be(col("o_custkey") % 3).as("key"))
      domain.lookupJoin(probe)
    }
    // IVF plan must not grow with nlist: centroids ride one broadcast, the
    // per-row argmin is a single NearestCellsExpr call either way.
    locally {
      val embs = Fixtures.table(spark, sfDir, "embeddings")
      val q = embs.where(col("vec_id") % 100 === 0)
      def planLen(nlist: Int): Int = graft.operators.Similarity
        .ivfTopK(embs, q, "vec_id", "embedding", 10, nlist = nlist, nprobe = 4)
        .queryExecution.executedPlan.toString.length
      val (p16, p256) = (planLen(16), planLen(256))
      println(s"\n========== ivf plan size vs nlist ==========")
      println(s"nlist=16: $p16 chars; nlist=256: $p256 chars (must be ~equal; " +
        "literal-centroid formulations grow linearly)")
    }
    dump("text_decontam (expect: bench grams BroadcastExchange, corpus grams never shuffled raw)") {
      queries.TextQueries.queries("text_decontam")(spark, sfDir)
    }
    dump("text_packing (expect: RangePartitioning + Sort + MapPartitions — no global Window, no _pid re-shuffle)") {
      queries.TextQueries.queries("text_packing")(spark, sfDir)
    }
    dump("ev_asof_join (expect: one shuffle on user_id; running-last window, no range-expansion join)") {
      queries.EventQueries.queries("ev_asof_join")(spark, sfDir)
    }
    dump("ev_asof_join_bucketed (expect: big side shuffled once on (user,bucket); only the small summary re-shuffles for the carry join)") {
      queries.EventQueries.queries("ev_asof_join_bucketed")(spark, sfDir)
    }
    dump("pipeline_data_prune (expect: drop-set BroadcastExchange into a LeftAnti join — " +
      "the corpus payload's only hash exchange is the pruning partial-agg on cell)") {
      queries.PipelineQueries.dataPrune(Fixtures.table(spark, sfDir, "embeddings"))
    }
    dump("domain build plan (expect: one Exchange + in-partition Sort)") {
      import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
      val kvDf = Fixtures.customerKv(spark, sfDir)
      kvDf.withColumn("shard", shard_index(col("key"), 8))
        .withColumn("_pid", lit(0)) // stand-in; real write uses shardToPartitionId
        .repartition(8, col("_pid"))
        .sortWithinPartitions("shard", "key")
        .drop("_pid")
    }
    spark.stop()
  }
}
