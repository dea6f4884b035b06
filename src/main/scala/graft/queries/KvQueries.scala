package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Driver-contract queries for the KV-domain parity surface (SURVEY.md §2.2,
 * §2.3): build/round-trip, multiGet (hit + miss), count, reshard, upsert,
 * version resolution, and shard routing. Every query decodes the engine's
 * opaque binary keys/values back to typed columns so the DuckDB oracle can
 * compare values instead of blobs (SURVEY.md §7.4).
 */
object KvQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1-W4 + S1/S2 + Q7: build a domain, read every pair back.
    "kv_build_roundtrip" -> { (s, dir) =>
      Fixtures.customerDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // S7-S9: same round-trip through the second storage engine
    // (orc-sorted) of the persistenceFormat SPI.
    "kv_orc_roundtrip" -> { (s, dir) =>
      Fixtures.customerOrcDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // Q1/Q2: batched point lookup; absent keys yield null values, not errors.
    "kv_multiget" -> { (s, dir) =>
      val customer = Fixtures.table(s, dir, "customer")
      val keys = customer
        .where(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"))
        .unionByName(customer
          .where(col("c_custkey") % 50 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey")))
        .select(long_be(col("c_custkey")).as("key"))
      Fixtures.customerDomain(s, dir).multiGet(keys)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // W5 (Indexer SPI): multiGet against the bloom-indexed domain. Most of
    // this key set is absent (c_custkey + 2000000), so the sidecar probe
    // resolves the bulk of it driver-side with zero data I/O; results must
    // be indistinguishable from an unindexed lookup, which is exactly what
    // the oracle checks.
    "kv_indexed_lookup" -> { (s, dir) =>
      val customer = Fixtures.table(s, dir, "customer")
      val keys = customer
        .where(col("c_custkey") % 11 === 0)
        .select(col("c_custkey"))
        .unionByName(customer
          .where(col("c_custkey") % 5 === 0)
          .select((col("c_custkey") + 2000000).as("c_custkey")))
        .select(long_be(col("c_custkey")).as("key"))
      Fixtures.customerIndexedDomain(s, dir).multiGet(keys)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // S7 third engine: the servable kv-sorted local-KV format (per-shard
    // sorted run + offset index, binary-searchable without Spark) must
    // round-trip the exact pair set like any other engine.
    "kv_kvfile_roundtrip" -> { (s, dir) =>
      Fixtures.customerKvFileDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // Q2 on the serving engine: multiGet against a kv-sorted domain takes
    // the indexed path — one task per probed shard binary-searching its
    // sorted run (no scan, no join) — and must be indistinguishable from
    // the scan-join engines: hits resolve, absent keys yield null.
    "kv_kvfile_multiget" -> { (s, dir) =>
      val customer = Fixtures.table(s, dir, "customer")
      val keys = customer
        .where(col("c_custkey") % 9 === 0)
        .select(col("c_custkey"))
        .unionByName(customer
          .where(col("c_custkey") % 40 === 0)
          .select((col("c_custkey") + 3000000).as("c_custkey")))
        .select(long_be(col("c_custkey")).as("key"))
      Fixtures.customerKvFileDomain(s, dir).multiGet(keys)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // S8/S9 compressed-engine capability: the block-compressed kv-sorted-z
    // format (SSTable-style Deflate blocks, magic-sniffed by every kv
    // reader) must round-trip the exact pair set like any other engine —
    // document text is the compressible payload it exists for.
    "kv_kvz_roundtrip" -> { (s, dir) =>
      Fixtures.docsKvzDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("doc_id"),
          bytes_utf8(col("value")).as("text"))
    },
    // Q2 on the compressed engine: the indexed multiGet path decompresses
    // ONE block per probed key run (key-sorted batches hit the reader's
    // block cache) and must be indistinguishable from every other engine:
    // hits resolve, absent keys yield null.
    "kv_kvz_multiget" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      val keys = docs
        .where(col("doc_id") % 6 === 0)
        .select(col("doc_id"))
        .unionByName(docs
          .where(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 5000000).as("doc_id")))
        .select(long_be(col("doc_id")).as("key"))
      Fixtures.docsKvzDomain(s, dir).multiGet(keys)
        .select(
          be_long(col("key")).as("doc_id"),
          bytes_utf8(col("value")).as("text"))
    },
    // Storage-engine migration (the step the reference-layout fail-loud
    // error points at): transcode re-publishes a domain under a new
    // persistence format with sharding preserved — kv → kvz here runs
    // ZERO-SHUFFLE (each shard's sorted run streams scan → writer in its
    // own task) — and the migrated domain must answer like the original.
    "kv_transcode" -> { (s, dir) =>
      Fixtures.customerTranscodedDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // Storage-partitioned domain-to-domain join: two kv-sorted domains
    // sharded by the same scheme (customer names, per-customer order
    // counts) joined on (shard, key) through the layout-reporting DSv2
    // scans — Catalyst plans a merge join with NO exchange and NO sort on
    // either side (pinned in KvDomainV2Spec), because the source reports
    // the on-disk hash-partitioning and per-shard key order. At 100 TB
    // this is the join shape for domain vs domain (index vs corpus
    // stats, base vs delta): neither side moves.
    "kv_copartition_join" -> { (s, dir) =>
      val names = Fixtures.customerKvFileDomain(s, dir).readPartitioned(s)
      val counts = Fixtures.ordersCountKvDomain(s, dir).readPartitioned(s)
      names.as("a").join(counts.as("b"), Seq("shard", "key"))
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("a.value")).as("c_name"),
          bytes_utf8(col("b.value")).cast("long").as("n_orders"))
    },
    // Key-range scan on the kv-sorted engine: bounds push into the DSv2
    // source, where each shard reader binary-searches its sorted run to
    // the range start and stops at the first key past the end — I/O
    // proportional to the matching records, not the domain (pinned in
    // KvDomainV2Spec). Non-negative custkeys big-endian: unsigned byte
    // order == numeric order, so the byte range IS the numeric range.
    "kv_range_scan" -> { (s, dir) =>
      def be(l: Long): Array[Byte] = java.nio.ByteBuffer.allocate(8).putLong(l).array()
      Fixtures.customerKvFileDomain(s, dir)
        .rangeScan(s, from = Some(be(200L)), to = Some(be(700L)), toInclusive = false)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // Composite-key prefix retrieval (entity‖id): every order of one
    // customer as the prefix run `c000000007:` — the range pushdown
    // reads only that run per shard, never the rest of the domain.
    "kv_prefix_scan" -> { (s, dir) =>
      Fixtures.ordersCompositeDomain(s, dir)
        .prefixScan(s, "c000000007:".getBytes("UTF-8"))
        .select(
          substring_index(bytes_utf8(col("key")), ":", -1).cast("long").as("o_orderkey"),
          bytes_utf8(col("value")).cast("long").as("total_cents"))
    },
    // The SQL catalog surface: the same kv domain resolved as a plain SQL
    // table through GraftCatalog (spark.sql.catalog.* registration) — no
    // DataFrame code touches the domain; resolution, version pinning, and
    // the layout-reporting scan all ride Spark's own catalog mechanism.
    "kv_sql_catalog" -> { (s, dir) =>
      Fixtures.customerKvFileDomain(s, dir) // ensure built + published
      val cat = "graft_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", Fixtures.dbRoot(dir))
      s.sql(s"SELECT key, value FROM $cat.`customer-kvfile`")
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // Version diff — "what did the new publish touch": added / removed /
    // changed keys across two published versions of one domain. On the
    // kv engine both versions share one sharding scheme, so the
    // full-outer join plans as a storage-partitioned merge join with
    // ZERO exchange on either side (pinned in KvDomainV2Spec) — the
    // 100 TB shape for auditing a publish.
    "kv_version_diff" -> { (s, dir) =>
      Fixtures.customerDiffDomain(s, dir).versionDiff(s, 1L, 2L)
        .select(
          be_long(col("key")).as("c_custkey"),
          col("change"),
          bytes_utf8(col("old_value")).as("old_v"),
          bytes_utf8(col("new_value")).as("new_v"))
    },
    // Q6: getCount — through the metadata-only footer path, surfaced as a
    // one-row DataFrame so the oracle verifies the footer sum itself.
    "kv_count" -> { (s, dir) =>
      val n = Fixtures.customerDomain(s, dir).count(s)
      s.range(1).select(lit(n).as("cnt"))
    },
    // DSv2 aggregate pushdown: COUNT + key extent computed from the kv
    // trailers and first/last record keys (KvDomainAggScan) — the plan
    // reads ZERO data bytes; big-endian keys make min/max the custkey
    // extent. The SQL-surface twin of kv_count's engine API.
    "kv_agg_pushdown" -> { (s, dir) =>
      Fixtures.customerKvFileDomain(s, dir).readPartitioned(s)
        .agg(count(lit(1)).as("cnt"),
          min(col("key")).as("min_key"), max(col("key")).as("max_key"))
        .select(col("cnt"),
          be_long(col("min_key")).as("min_custkey"),
          be_long(col("max_key")).as("max_custkey"))
    },
    // W6: reshard 3 -> 5 preserves the exact set of pairs.
    "kv_reshard" -> { (s, dir) =>
      Fixtures.customerReshardedDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("c_name"))
    },
    // W7/W8: upsert with last-write-wins per key + copy-forward of
    // untouched shards.
    "kv_upsert" -> { (s, dir) =>
      Fixtures.customerUpsertDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("v"))
    },
    // Takedown lifecycle: delete publishes a new version with the named
    // keys ABSENT (delta-sized rewrite + copy-forward). The multiGet mix
    // proves absence the strong way: deleted keys read as null values
    // (exactly like never-written keys), surviving keys still serve.
    "kv_delete" -> { (s, dir) =>
      val keys = Fixtures.table(s, dir, "customer")
        .where(col("c_custkey") % 5 === 0)
        .select(long_be(col("c_custkey")).as("key"))
      Fixtures.customerDeleteDomain(s, dir).multiGet(keys)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("v"))
    },
    // Manifest-linked publish (VERDICT r11 task 2): a linked upsert + a
    // linked delete record untouched shards as shard->origin links
    // instead of copying their dirs (O(delta) publish at 64k shards).
    // The read goes through the layout-reporting DSv2 scan, whose input
    // partitions resolve the links at planning — content must be
    // indistinguishable from the copy-forward twin.
    "kv_linked_publish" -> { (s, dir) =>
      Fixtures.customerLinkedDomain(s, dir).readPartitioned(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("v"))
    },
    // V2/V4/Q10: reads resolve the newest *published* version at plan time.
    "kv_version_latest" -> { (s, dir) =>
      Fixtures.customerVersionedDomain(s, dir).read(s)
        .select(
          be_long(col("key")).as("c_custkey"),
          bytes_utf8(col("value")).as("v"))
    },
    // Q4 (O1): reference-compatible md5-BigInteger-mod shard routing,
    // checked value-by-value against DuckDB's own md5.
    "kv_shard_routing" -> { (s, dir) =>
      Fixtures.table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          shard_index(utf8_bytes(col("o_orderkey").cast("string")), RoutingShards)
            .as("shard"))
    },
    // Flagship at bench scale: bulk build of the lineitem domain
    // (composite 12-byte key) + multiGet of ~1% of keys, decoded back.
    "kv_lineitem_lookup" -> { (s, dir) =>
      val keys = Fixtures.table(s, dir, "lineitem")
        .where(col("l_orderkey") % 97 === 0)
        .select(composite_key(long_be(col("l_orderkey")), int_be(col("l_linenumber"))).as("key"))
      Fixtures.lineitemDomain(s, dir).multiGet(keys)
        .select(
          be_long(expr("substring(key, 1, 8)")).as("l_orderkey"),
          be_long(expr("substring(key, 9, 4)")).as("l_linenumber"),
          bytes_utf8(col("value")).as("suppkey"))
    },
    // Bulk enrichment with a salted join (README "AQE-friendly" skew
    // hatch, pinned by DomainStoreSpec): probe keys o_custkey % 50
    // concentrate on ~50 hot keys; salt = 8 spreads each over 8 tasks.
    // Salt is a query-time rewrite only, so results must equal a plain
    // left join — which is exactly what the oracle checks.
    "kv_lookup_join_salted" -> { (s, dir) =>
      val probe = Fixtures.table(s, dir, "orders")
        .select(col("o_orderkey"), long_be(col("o_custkey") % 50).as("key"))
      Fixtures.customerDomain(s, dir).lookupJoin(probe, salt = 8)
        .select(col("o_orderkey"), bytes_utf8(col("value")).as("c_name"))
    },
    // Per-shard skew report over a BUILT domain — metadata-only (kv
    // trailers / parquet footers, no data page read): the histogram that
    // catches a hot shard before a 64k-shard build straggles. The oracle
    // replays the md5 routing of every key and counts per shard, so the
    // report is pinned against the routing math itself (4 | 2^64, so the
    // low-8-byte simplification applies). Bytes are format-dependent
    // metadata and stay out of the contract columns.
    "kv_shard_stats" -> { (s, dir) =>
      Fixtures.customerStrDomain(s, dir).shardStats(s)
        .select(col("shard"), col("n_rows"))
    },
    // Q4+Q6: per-shard fanout of the routing function (the write-side
    // histogram a domain build produces for these keys).
    "kv_shard_distribution" -> { (s, dir) =>
      Fixtures.table(s, dir, "orders")
        .select(
          shard_index(utf8_bytes(col("o_orderkey").cast("string")), RoutingShards)
            .as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("cnt"))
    })

  val RoutingShards = 16

  def oracleSql: Map[String, String] = {
    val n = RoutingShards
    val p64 = java.math.BigInteger.ONE.shiftLeft(64).mod(java.math.BigInteger.valueOf(n.toLong)).longValue()
    Map(
      "kv_build_roundtrip" ->
        "SELECT c_custkey, c_name FROM customer",
      "kv_orc_roundtrip" ->
        "SELECT c_custkey, c_name FROM customer",
      "kv_kvfile_roundtrip" ->
        "SELECT c_custkey, c_name FROM customer",
      "kv_kvfile_multiget" ->
        """WITH ks AS (
          |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 9 = 0
          |  UNION ALL
          |  SELECT c_custkey + 3000000 FROM customer WHERE c_custkey % 40 = 0)
          |SELECT ks.k AS c_custkey, c.c_name FROM ks LEFT JOIN customer c ON ks.k = c.c_custkey""".stripMargin,
      "kv_transcode" ->
        "SELECT c_custkey, c_name FROM customer",
      "kv_kvz_roundtrip" ->
        "SELECT doc_id, text FROM documents",
      "kv_kvz_multiget" ->
        """WITH ks AS (
          |  SELECT doc_id AS k FROM documents WHERE doc_id % 6 = 0
          |  UNION ALL
          |  SELECT doc_id + 5000000 FROM documents WHERE doc_id % 25 = 0)
          |SELECT ks.k AS doc_id, d.text FROM ks LEFT JOIN documents d ON ks.k = d.doc_id""".stripMargin,
      "kv_multiget" ->
        """WITH ks AS (
          |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 7 = 0
          |  UNION ALL
          |  SELECT c_custkey + 1000000 FROM customer WHERE c_custkey % 50 = 0)
          |SELECT ks.k AS c_custkey, c.c_name FROM ks LEFT JOIN customer c ON ks.k = c.c_custkey""".stripMargin,
      "kv_indexed_lookup" ->
        """WITH ks AS (
          |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 11 = 0
          |  UNION ALL
          |  SELECT c_custkey + 2000000 FROM customer WHERE c_custkey % 5 = 0)
          |SELECT ks.k AS c_custkey, c.c_name FROM ks LEFT JOIN customer c ON ks.k = c.c_custkey""".stripMargin,
      "kv_sql_catalog" ->
        "SELECT c_custkey, c_name FROM customer",
      "kv_version_diff" ->
        """WITH v1 AS (SELECT c_custkey AS k, c_name AS v FROM customer),
          |v2 AS (
          |  SELECT c_custkey AS k,
          |    CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment ELSE c_name END AS v
          |  FROM customer WHERE c_custkey % 7 != 0
          |  UNION ALL
          |  SELECT c_custkey + 1000000, c_name FROM customer WHERE c_custkey % 50 = 0),
          |j AS (
          |  SELECT coalesce(v1.k, v2.k) AS c_custkey, v1.v AS old_v, v2.v AS new_v,
          |    CASE WHEN v1.k IS NULL THEN 'added'
          |         WHEN v2.k IS NULL THEN 'removed'
          |         WHEN v1.v IS DISTINCT FROM v2.v THEN 'changed'
          |         ELSE 'same' END AS change
          |  FROM v1 FULL JOIN v2 ON v1.k = v2.k)
          |SELECT c_custkey, change, old_v, new_v FROM j WHERE change != 'same'""".stripMargin,
      "kv_range_scan" ->
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey >= 200 AND c_custkey < 700",
      "kv_prefix_scan" ->
        """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
          |FROM orders WHERE o_custkey = 7""".stripMargin,
      "kv_agg_pushdown" ->
        """SELECT CAST(count(*) AS BIGINT) AS cnt,
          |  min(c_custkey) AS min_custkey, max(c_custkey) AS max_custkey
          |FROM customer""".stripMargin,
      "kv_shard_stats" ->
        """WITH r AS (
          |  SELECT CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 17, 16))::UBIGINT % 4 AS INT) AS shard
          |  FROM customer)
          |SELECT CAST(s.shard AS INT) AS shard, CAST(coalesce(c.n, 0) AS BIGINT) AS n_rows
          |FROM (SELECT unnest(range(0, 4)) AS shard) s
          |LEFT JOIN (SELECT shard, count(*) AS n FROM r GROUP BY shard) c USING (shard)""".stripMargin,
      "kv_count" ->
        "SELECT count(*) AS cnt FROM customer",
      "kv_copartition_join" ->
        """SELECT c.c_custkey, c.c_name, CAST(o.n AS BIGINT) AS n_orders
          |FROM customer c
          |JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
          |  ON o.o_custkey = c.c_custkey""".stripMargin,
      "kv_lookup_join_salted" ->
        """SELECT o.o_orderkey, c.c_name
          |FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey % 50""".stripMargin,
      "kv_lineitem_lookup" ->
        """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
          |  CAST(l_suppkey AS VARCHAR) AS suppkey
          |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin,
      "kv_reshard" ->
        "SELECT c_custkey, c_name FROM customer",
      "kv_upsert" ->
        "SELECT c_custkey, CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment ELSE c_name END AS v FROM customer",
      "kv_delete" ->
        """SELECT c_custkey,
          |  CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_name END AS v
          |FROM customer WHERE c_custkey % 5 = 0""".stripMargin,
      "kv_linked_publish" ->
        """SELECT c_custkey,
          |  CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment ELSE c_name END AS v
          |FROM customer WHERE c_custkey % 10 <> 0""".stripMargin,
      "kv_version_latest" ->
        "SELECT c_custkey, c_mktsegment AS v FROM customer",
      // Replicates new BigInteger(md5(key)).mod(n) — the 16 md5 bytes as a
      // *signed* big-endian value — using two unsigned 64-bit halves.
      "kv_shard_routing" ->
        s"""WITH h AS (SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS hx FROM orders),
           |parts AS (SELECT o_orderkey,
           |  ('0x' || substr(hx, 1, 16))::UBIGINT AS hi,
           |  ('0x' || substr(hx, 17, 16))::UBIGINT AS lo,
           |  substr(hx, 1, 1) >= '8' AS neg FROM h)
           |SELECT o_orderkey,
           |  CAST(((((hi % $n)::BIGINT + $n - CASE WHEN neg THEN $p64 ELSE 0 END) % $n) * $p64
           |        + (lo % $n)::BIGINT) % $n AS INT) AS shard
           |FROM parts""".stripMargin,
      "kv_shard_distribution" ->
        s"""WITH h AS (SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS hx FROM orders),
           |parts AS (SELECT o_orderkey,
           |  ('0x' || substr(hx, 1, 16))::UBIGINT AS hi,
           |  ('0x' || substr(hx, 17, 16))::UBIGINT AS lo,
           |  substr(hx, 1, 1) >= '8' AS neg FROM h),
           |r AS (SELECT CAST(((((hi % $n)::BIGINT + $n - CASE WHEN neg THEN $p64 ELSE 0 END) % $n) * $p64
           |        + (lo % $n)::BIGINT) % $n AS INT) AS shard FROM parts)
           |SELECT shard, count(*) AS cnt FROM r GROUP BY shard""".stripMargin)
  }
}
