package graft

import java.util.Locale

import graft.core.Sessions

/**
 * Driver-run benchmark: times every contract query at the given scale
 * factor and prints one JSON line. Queries are materialized through the
 * noop sink (not count()) so column-pruning can't skip the measured work
 * (count(*) would let Catalyst drop every computed column).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: run the sf0.001 flagship once so JIT + codegen +
    // parquet-reader init aren't billed to whichever query sorts first.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // The warmup built the sf0.001 flagship fixture; forget it so a bench
    // at sf0.001 still times that domain build in pass 1.
    spark.catalog.clearCache()
    queries.Fixtures.reset()

    // Stable order for comparable per-query numbers across rounds; the
    // query map is assembled once, outside anything timed.
    val qmap = SparkEntry.queries
    val names = qmap.keys.toSeq.sorted
    def runAll(): Map[String, (Double, Boolean)] = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }.toMap
    // Best of two full passes: wall-clock noise on a shared box swings
    // single runs by ±50%. The cache is cleared between passes so each
    // pass re-does the real work (operator-internal persists would
    // otherwise turn pass 2 into a cache read), and the domain fixtures
    // are forgotten so build queries time the build in every pass.
    val rep1 = runAll()
    spark.catalog.clearCache()
    queries.Fixtures.reset()
    val rep2 = runAll()
    // Sub-metrics: pipeline_dedup_index deliberately times the full index
    // lifecycle; attribute its two halves so a regression points at the
    // right one (build = band + publish the KV index domain; probe =
    // delta banding + point lookups + exact verify). BEST OF TWO passes,
    // like the queries: a single pass after ~5 min of prior work in this
    // JVM once printed a 53.9 s probe for a pipeline whose isolated time
    // is ~8 s (r5 verdict) — a 7× noise artifact defeats the submetric's
    // whole purpose (regression attribution). Failures skip the field
    // rather than kill the bench line.
    def subPass(): Seq[(String, Double)] = {
        spark.catalog.clearCache()
        queries.Fixtures.reset()
        val b0 = System.nanoTime()
        queries.PipelineQueries.dedupIndexStore(spark, sfDir)
        val buildSec = (System.nanoTime() - b0) / 1e9
        val p0 = System.nanoTime()
        queries.PipelineQueries.dedupIndexProbe(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val probeSec = (System.nanoTime() - p0) / 1e9
        // the image twin (build = decode + hash + band + publish the KV
        // index; probe = delta hash + point lookups + popcount verify)
        val ib0 = System.nanoTime()
        queries.PipelineQueries.imageIndexStore(spark, sfDir)
        val imgBuild = (System.nanoTime() - ib0) / 1e9
        val ip0 = System.nanoTime()
        queries.PipelineQueries.imageIndexProbe(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val imgProbe = (System.nanoTime() - ip0) / 1e9
        // the embedding twin (build = cell assignment + publish; probe =
        // delta cells + point lookups + cosine verify of named rows)
        val eb0 = System.nanoTime()
        queries.PipelineQueries.semIndexStore(spark, sfDir)
        val semBuild = (System.nanoTime() - eb0) / 1e9
        val ep0 = System.nanoTime()
        queries.PipelineQueries.semIndexProbe(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val semProbe = (System.nanoTime() - ep0) / 1e9
        // same attribution for the two ANN-serving pipelines (fixtures
        // still fresh for their stores: reset() above cleared them)
        val ab0 = System.nanoTime()
        queries.PipelineQueries.annIndexStore(spark, sfDir)
        val annBuild = (System.nanoTime() - ab0) / 1e9
        val ap0 = System.nanoTime()
        queries.PipelineQueries.annIndexProbe(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val annProbe = (System.nanoTime() - ap0) / 1e9
        val pb0 = System.nanoTime()
        queries.PipelineQueries.annPqIndexStore(spark, sfDir)
        val pqBuild = (System.nanoTime() - pb0) / 1e9
        val pp0 = System.nanoTime()
        queries.PipelineQueries.annPqIndexProbe(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val pqProbe = (System.nanoTime() - pp0) / 1e9
        // and the full-text index pipeline (build = inverted index +
        // publish; probe = term lookups + lengths join + scoring + topk)
        val sb0 = System.nanoTime()
        queries.SearchQueries.searchIndexStore(spark, sfDir)
        val searchBuild = (System.nanoTime() - sb0) / 1e9
        val sp0 = System.nanoTime()
        queries.SearchQueries.searchProbe(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val searchProbe = (System.nanoTime() - sp0) / 1e9
        // and the phrase pipeline (build = positional index + publish on
        // the compressed engine; probe = postings lookups + anchor votes)
        val pb2 = System.nanoTime()
        queries.SearchQueries.positionalIndexStore(spark, sfDir)
        val phraseBuild = (System.nanoTime() - pb2) / 1e9
        val pp2 = System.nanoTime()
        graft.operators.Search.phraseSearch(
          queries.SearchQueries.positionalIndexStore(spark, sfDir),
          { import spark.implicits._; queries.SearchQueries.PhraseLits.toDF("query_id", "phrase") },
          k = queries.SearchQueries.TopK)
          .write.format("noop").mode("overwrite").save()
        val phraseProbe = (System.nanoTime() - pp2) / 1e9
        Seq("pipeline_dedup_index_build" -> buildSec,
          "pipeline_dedup_index_probe" -> probeSec,
          "pipeline_image_index_build" -> imgBuild,
          "pipeline_image_index_probe" -> imgProbe,
          "pipeline_semdedup_index_build" -> semBuild,
          "pipeline_semdedup_index_probe" -> semProbe,
          "pipeline_ann_index_build" -> annBuild,
          "pipeline_ann_index_probe" -> annProbe,
          "pipeline_annpq_index_build" -> pqBuild,
          "pipeline_annpq_index_probe" -> pqProbe,
          "text_search_topk_build" -> searchBuild,
          "text_search_topk_probe" -> searchProbe,
          "text_search_phrase_build" -> phraseBuild,
          "text_search_phrase_probe" -> phraseProbe)
    }
    val subMetrics: Seq[(String, Double)] =
      try {
        val s1 = subPass()
        val s2 = subPass()
        s1.zip(s2).map { case ((k, a), (k2, b)) =>
          assert(k == k2); k -> math.min(a, b)
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] submetrics failed: $e")
          Nil
      }
    // Per query: min over SUCCESSFUL passes; a query with no successful
    // pass keeps a time but is listed under "failures" so a crash can't
    // masquerade as a speedup.
    val results = names.map { n =>
      val passes = Seq(rep1(n), rep2(n))
      val good = passes.filter(_._2).map(_._1)
      n -> (if (good.nonEmpty) good.min else passes.map(_._1).min, good.nonEmpty)
    }
    val failed = results.collect { case (n, (_, false)) => n }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def num(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))
    // Query names are code-controlled identifiers today, but these lines
    // are the artifacts built to SURVIVE truncation — a name carrying a
    // quote/backslash/control char must not be the thing that makes
    // them unparseable (ADVICE r11).
    def jstr(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }.mkString("\"", "", "\"")
    // ASCENDING by time (name-tiebroken): the driver's capture keeps only
    // the LAST ~2k chars of stdout, which under alphabetical order made the
    // head families (dedup_*/ev_*/kv_*/mm_*) permanently invisible — the
    // exact attribution gap of the r14 bench watch. Cheapest first puts
    // every expensive (diagnostic) query inside the surviving tail; JSON
    // key order carries no semantics, and target/bench_queries.json keeps
    // the slowest-first full record.
    val qs = results.sortBy { case (k, (v, _)) => (v, k) }
      .map { case (k, (v, _)) => jstr(k) + ":" + num(v) }
      .mkString("{", ",", "}")
    val failuresField =
      if (failed.isEmpty) ""
      else failed.map(jstr).mkString(""","failures":[""", ",", "]")
    // "total" = sum of per-query best-of-two (not the wall-clock of either
    // pass — per_pass_total carries those); queries with no successful
    // pass are excluded (their timing measures a crash, not the work).
    val total = results.collect { case (n, (v, true)) => v }.sum
    def passTotal(rep: Map[String, (Double, Boolean)]): Double = rep.values.map(_._1).sum
    // n_ok/n_failed ride at top level so a round-over-round comparison of
    // "value" can't mistake a crashed (and therefore excluded) query for
    // a speedup without noticing the query count dropped.
    val subField =
      if (subMetrics.isEmpty) ""
      else subMetrics.map { case (k, v) => jstr(k) + ":" + num(v) }
        .mkString(""","submetrics_method":"best_of_2","submetrics":{""", ",", "}")
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","method":"sum_of_best_of_2"""" +
        s""","n_ok":${results.size - failed.size},"n_failed":${failed.size}""" +
        s""","per_pass_total":[${num(passTotal(rep1))},${num(passTotal(rep2))}]""" +
        s""","queries":$qs$failuresField$subField,"sf":"$sfDir"}"""
    // The driver PARSES THE FINAL JSON LINE (PERF_r16: `parsed` held only
    // total_summary, so per_query/n_common/geomean were empty two rounds
    // running — r16 verdict task 1). The final line therefore carries the
    // FULL record: per-query map (ascending by time, so a tail-truncated
    // capture still keeps every expensive query) and submetrics,
    // additions-only on the old summary fields. The first "total" line
    // stays unchanged for any consumer keyed on metric=="total".
    val summary =
      s"""{"metric":"total_summary","value":${num(total)},"unit":"sec"""" +
        s""","n_ok":${results.size - failed.size},"n_failed":${failed.size}""" +
        s""","queries":$qs$failuresField$subField,"sf":"$sfDir"}"""
    // FILES FIRST, stdout second (r10 verdict task 6): the driver's
    // stdout capture lost per-query data two rounds running; the files
    // are the per-query record and must exist even if the process dies
    // mid-print. bench_queries.json is the compact slowest-first record
    // so the top movers survive ANY truncation of any channel — and it
    // carries its OWN failures list (a crashed query's timing measures
    // the crash; without the marker riding the same file, the one
    // channel built to survive truncation would let a crash masquerade
    // as a speedup). File-write failures must not cost the stdout
    // channel too: they log to stderr and the prints still run.
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n" + summary + "\n").getBytes("UTF-8"))
      val slowestFirst = results.sortBy { case (_, (v, _)) => -v }
        .map { case (k, (v, _)) => jstr(k) + ":" + num(v) }
        .mkString("{", ",", "}")
      val failedArr = failed.map(jstr).mkString("[", ",", "]")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/bench_queries.json"),
        (s"""{"failures":$failedArr,"queries":$slowestFirst}""" + "\n").getBytes("UTF-8"))
    } catch {
      case e: Throwable => System.err.println(s"[bench] artifact write failed: $e")
    }
    println(line)
    println(summary)
    spark.stop()
  }
}
