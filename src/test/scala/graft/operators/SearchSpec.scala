package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.DomainSpec
import graft.functions.bytes_utf8
import graft.store.DomainStore

/** Pins graft.operators.Search: the published-index search pipeline vs an
  * INDEPENDENT BigInt reference implementation of the same exact-integer
  * BM25 (so the Catalyst decimal math, the postings roundtrip, and the
  * ranking are all checked against from-scratch arithmetic), plus the
  * postings-cap recall contract and the fail-loud corruption path. */
class SearchSpec extends SparkSuite {

  import spark.implicits._

  private val corpus = Seq(
    1L -> "cat cat dog",
    2L -> "cat fish",
    3L -> "dog dog dog bird",
    4L -> "bird fish cat dog")

  private def corpusDf: DataFrame = corpus.toDF("doc_id", "text")

  /** Independent reference: same formula, java.math arithmetic. */
  private def refContrib(n: Long, total: Long, df: Long, tf: Long, len: Long): BigInt =
    (BigInt(1) << Search.ScaleBits) * BigInt(n - df + 1) * BigInt(tf) * 22 * BigInt(total) /
      (BigInt(df + 1) *
        (BigInt(10) * BigInt(tf) * BigInt(total) + BigInt(3) * BigInt(total) +
          BigInt(9) * BigInt(len) * BigInt(n)))

  /** Reference top-k over the hand corpus for one query string. */
  private def refSearch(query: String, k: Int): Seq[(Long, Long)] = {
    val docToks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docToks.size.toLong
    val total = docToks.map(_._2.size.toLong).sum
    val dfs = docToks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val terms = query.split(" ").toSeq.distinct.filter(dfs.contains)
    val scores = docToks.flatMap { case (id, ts) =>
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) BigInt(0)
        else refContrib(n, total, dfs(t), tf, ts.size.toLong)
      }.sum
      if (score > 0) Some(id -> score.toLong) else None
    }
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  private def store(name: String, format: String): DomainStore = {
    val st = DomainStore.create(
      scratch(s"search-$name"),
      DomainSpec(numShards = 4, persistenceFormat = format),
      new Configuration())
    st.write(Search.invertedIndexKv(corpusDf, "doc_id", "text"), version = 1L)
    st
  }

  private def run(st: DomainStore, query: String, k: Int = 10): Seq[(Long, Long)] =
    Search.searchTopK(st, Seq(0L -> query).toDF("query_id", "query_text"), k)
      .orderBy("rank")
      .select(col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  for (format <- Seq(DomainSpec.ParquetSorted, DomainSpec.KvSorted))
    test(s"search on a $format index matches the BigInt reference") {
      val st = store(s"ref-$format", format)
      for (q <- Seq("cat", "dog bird", "cat dog fish", "fish")) {
        assert(run(st, q) === refSearch(q, 10), s"query '$q'")
      }
      // unknown terms contribute nothing; all-unknown → empty
      assert(run(st, "wombat") === Nil)
      assert(run(st, "wombat fish") === refSearch("fish", 10))
    }

  test("phrase search: consecutive-token matches vs a naive substring reference") {
    // richer corpus with repeats and overlapping phrases
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "a cat sat where the cat sat before",
      3L -> "cat cat cat",
      4L -> "sat cat",
      5L -> "the the the")
    val st = DomainStore.create(
      scratch("search-phrase"), DomainSpec(numShards = 4), new Configuration())
    st.write(Search.positionalIndexKv(docs.toDF("doc_id", "text"), "doc_id", "text"), 1L)
    // naive reference: count anchors where the token sequence matches
    def refPhrase(phrase: String): Seq[(Long, Long)] = {
      val p = phrase.split(" ").toSeq
      docs.flatMap { case (id, t) =>
        val ts = t.split(" ").toSeq
        val n = (0 to ts.size - p.size).count(a => ts.slice(a, a + p.size) == p)
        if (n > 0) Some(id -> n.toLong) else None
      }.sortBy { case (id, n) => (-n, id) }
    }
    def run(phrase: String): Seq[(Long, Long)] =
      Search.phraseSearch(st, Seq(0L -> phrase).toDF("query_id", "phrase"), k = 10)
        .orderBy("rank").select(col("doc_id"), col("n_matches"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (phrase <- Seq(
        "cat sat", "the cat", "cat sat on", "cat cat", "the the",
        "sat", "mat", "cat sat before", "dog"))
      assert(run(phrase) === refPhrase(phrase), s"phrase '$phrase'")
    // a phrase whose terms all exist but never consecutively: no matches
    assert(run("mat the") === Nil)
  }

  test("phrase search fails loud on a term the build tombstoned") {
    val docs = (1L to 30L).map(i => i -> s"hot cold$i").toDF("doc_id", "text")
    val st = DomainStore.create(
      scratch("search-phrase-cap"), DomainSpec(numShards = 4), new Configuration())
    // cap of 10 docs: 'hot' (df=30) tombstones, every 'coldN' stays
    st.write(Search.positionalIndexKv(docs, "doc_id", "text", maxPostings = 10), 1L)
    val e = intercept[Exception] {
      Search.phraseSearch(st, Seq(0L -> "hot cold5").toDF("query_id", "phrase"), 10).collect()
    }
    assert(e.getMessage.contains("hot") && e.getMessage.contains("postings cap"), e.getMessage)
    // queries not touching the tombstone still answer
    val ok = Search.phraseSearch(st, Seq(0L -> "cold5").toDF("query_id", "phrase"), 10)
      .collect()
    assert(ok.length === 1 && ok(0).getAs[Long]("doc_id") === 5L)
  }

  test("Spark-free PhraseReader serves the same matches, bit for bit, on plain AND compressed kv") {
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "a cat sat where the cat sat before",
      3L -> "cat cat cat",
      4L -> "sat cat the cat sat")
    for (format <- Seq(DomainSpec.KvSorted, DomainSpec.KvSortedZ)) {
      val st = DomainStore.create(
        scratch(s"phrase-serve-$format"),
        DomainSpec(numShards = 4, persistenceFormat = format), new Configuration())
      st.write(Search.positionalIndexKv(docs.toDF("doc_id", "text"), "doc_id", "text"), 1L)
      val reader = new graft.store.PhraseReader(
        graft.store.KvDomainReader.open(st.root.toString, new Configuration()))
      try {
        for (phrase <- Seq("cat sat", "the cat", "cat cat", "sat", "cat sat before", "dog cat")) {
          val spark0 = Search.phraseSearch(
              st, Seq(0L -> phrase).toDF("query_id", "phrase"), k = 10)
            .orderBy("rank").select(col("doc_id"), col("n_matches"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          assert(reader.phrase(phrase, 10) === spark0, s"format $format phrase '$phrase'")
        }
        // empty + absent-term queries answer without Spark too
        assert(reader.phrase("zebra", 5) === Nil)
      } finally reader.close()
    }
  }

  test("positional upsert == full rebuild, bit for bit; contracts enforced") {
    val base = Seq(1L -> "cat sat", 2L -> "cat cat dog").toDF("doc_id", "text")
    val delta = Seq(3L -> "dog cat sat", 4L -> "bird").toDF("doc_id", "text")
    val union = Seq(
      1L -> "cat sat", 2L -> "cat cat dog",
      3L -> "dog cat sat", 4L -> "bird").toDF("doc_id", "text")
    val inc = DomainStore.create(
      scratch("pos-ups-inc"), DomainSpec(numShards = 4), new Configuration())
    inc.write(Search.positionalIndexKv(base, "doc_id", "text"), 1L)
    Search.positionalIndexUpsert(inc, delta, "doc_id", "text", newVersion = 2L)
    val full = DomainStore.create(
      scratch("pos-ups-full"), DomainSpec(numShards = 4), new Configuration())
    full.write(Search.positionalIndexKv(union, "doc_id", "text"), 1L)
    def dump(st: DomainStore): Map[String, String] =
      st.read(spark).select(bytes_utf8(col("key")), bytes_utf8(col("value")))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dump(inc) === dump(full))
    // phrase results over the grown index match the rebuilt one
    val q = Seq(0L -> "dog cat").toDF("query_id", "phrase")
    def run(st: DomainStore) = Search.phraseSearch(st, q, 10)
      .orderBy("rank").collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"))).toSeq
    assert(run(inc) === run(full) && run(inc) === Seq((3L, 1L)))
    // re-ingesting an indexed doc id fails loud
    val e = intercept[IllegalArgumentException] {
      Search.positionalIndexUpsert(inc, delta, "doc_id", "text", newVersion = 3L)
    }
    assert(e.getMessage.contains("already indexed"))
    // a tombstoned term stays elided and its df advances
    val capped = DomainStore.create(
      scratch("pos-ups-cap"), DomainSpec(numShards = 4), new Configuration())
    capped.write(
      Search.positionalIndexKv(
        (1L to 12L).map(i => i -> "hot").toDF("doc_id", "text"),
        "doc_id", "text", maxPostings = 10), 1L)
    Search.positionalIndexUpsert(
      capped, Seq(13L -> "hot cool").toDF("doc_id", "text"),
      "doc_id", "text", newVersion = 2L, maxPostings = 10)
    val d2 = dump(capped)
    assert(d2("x:hot") === "13") // 12 + 1
    assert(d2("p:cool") === "13:1")
    // a merge that would CROSS the cap fails loud naming the rebuild
    val nearCap = DomainStore.create(
      scratch("pos-ups-cross"), DomainSpec(numShards = 4), new Configuration())
    nearCap.write(
      Search.positionalIndexKv(
        (1L to 10L).map(i => i -> "warm").toDF("doc_id", "text"),
        "doc_id", "text", maxPostings = 10), 1L)
    val e2 = intercept[Exception] {
      Search.positionalIndexUpsert(
        nearCap, Seq(11L -> "warm").toDF("doc_id", "text"),
        "doc_id", "text", newVersion = 2L, maxPostings = 10)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e2).exists(_.contains("positionalIndexKv")), messages(e2).mkString(" | "))
  }

  test("index-type guards: positional ops refuse a BM25 domain; non-long ids fail loud") {
    val docs = Seq(1L -> "cat sat", 2L -> "dog ran").toDF("doc_id", "text")
    val bm25 = DomainStore.create(
      scratch("guard-bm25"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    bm25.write(Search.invertedIndexKv(docs, "doc_id", "text"), 1L)
    // upsert aimed at the wrong index type: both types publish d: records,
    // so only the marker stands between this and silent pollution
    val e1 = intercept[IllegalArgumentException] {
      Search.positionalIndexUpsert(
        bm25, Seq(3L -> "new doc").toDF("doc_id", "text"), "doc_id", "text", 2L)
    }
    assert(e1.getMessage.contains("not a positional-index domain"), e1.getMessage)
    // phrase query against a BM25 domain: loud, not silently empty
    val e2 = intercept[IllegalArgumentException] {
      Search.phraseSearch(bm25, Seq(0L -> "cat sat").toDF("query_id", "phrase"), 5).collect()
    }
    assert(e2.getMessage.contains("not a positional-index domain"), e2.getMessage)
    // Spark-free reader refuses too
    val e3 = intercept[IllegalArgumentException] {
      new graft.store.PhraseReader(
        graft.store.KvDomainReader.open(bm25.root.toString, new Configuration()))
    }
    assert(e3.getMessage.contains("not a positional-index domain"), e3.getMessage)
    // and the BM25 surface still refuses a positional domain — which now
    // publishes m:stats too (ranked fusion), so the m:positional MARKER,
    // not stats presence, must be what decides
    val pos = DomainStore.create(
      scratch("guard-pos"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    pos.write(Search.positionalIndexKv(docs, "doc_id", "text"), 1L)
    val e4 = intercept[IllegalArgumentException] {
      Search.searchIndexUpsert(
        pos, Seq(3L -> "new doc").toDF("doc_id", "text"), "doc_id", "text", 2L)
    }
    assert(e4.getMessage.contains("positional-index domain"), e4.getMessage)
    val e4b = intercept[IllegalArgumentException] {
      Search.searchTopK(pos, Seq(0L -> "cat").toDF("query_id", "query_text"), 5).collect()
    }
    assert(e4b.getMessage.contains("positional-index domain"), e4b.getMessage)
    val e4c = intercept[IllegalStateException] {
      new graft.store.SearchReader(
        graft.store.KvDomainReader.open(pos.root.toString, new Configuration()))
    }
    assert(e4c.getMessage.contains("positional-index domain"), e4c.getMessage)
    // a non-long-castable id corrupts silently without the canonical-id
    // guard — it must fail loud at build time instead (under ANSI the
    // cast itself throws CAST_INVALID_INPUT; the guard's raise_error
    // covers NULL ids and any non-ANSI session)
    val badIds = Seq("docA" -> "some text", "7" -> "more text").toDF("doc_id", "text")
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    def failsLoud(e: Throwable): Boolean = {
      val m = msgs(e)
      m.contains("not long-castable") || m.contains("CAST_INVALID_INPUT")
    }
    val e5 = intercept[Exception] {
      Search.invertedIndexKv(badIds, "doc_id", "text").collect()
    }
    assert(failsLoud(e5), msgs(e5))
    val e6 = intercept[Exception] {
      Search.positionalIndexKv(badIds, "doc_id", "text").collect()
    }
    assert(failsLoud(e6), msgs(e6))
    // NULL ids take the guard's raise_error on any session, with the
    // null-specific actionable message (ADVICE r11)
    val nullIds = Seq((java.lang.Long.valueOf(5L), "ok"), (null.asInstanceOf[java.lang.Long], "bad"))
      .toDF("doc_id", "text")
    val e7 = intercept[Exception] {
      Search.invertedIndexKv(nullIds, "doc_id", "text").collect()
    }
    assert(msgs(e7).contains("NULL 'doc_id'") &&
      msgs(e7).contains("drop or re-key"), msgs(e7))
    // distinct raw ids that collide under the long cast ('007' vs '7')
    // would silently fuse into one doc — the build-time distinct-count
    // guard must fail loud instead, naming the collision
    val colliding = Seq("007" -> "alpha beta", "7" -> "gamma").toDF("doc_id", "text")
    val e8 = intercept[IllegalArgumentException](
      Search.invertedIndexKv(colliding, "doc_id", "text"))
    assert(e8.getMessage.contains("collide"), e8.getMessage)
    val e9 = intercept[IllegalArgumentException](
      Search.positionalIndexKv(colliding, "doc_id", "text"))
    assert(e9.getMessage.contains("collide"), e9.getMessage)
    // and the upsert paths guard their delta the same way
    val bm25b = DomainStore.create(
      scratch("guard-bm25-collide"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    bm25b.write(Search.invertedIndexKv(docs, "doc_id", "text"), 1L)
    val e10 = intercept[IllegalArgumentException](
      Search.searchIndexUpsert(bm25b, colliding, "doc_id", "text", 2L))
    assert(e10.getMessage.contains("collide"), e10.getMessage)
  }

  test("ranked phrase fusion: candidates = exact phrase matches, scores = BM25 of the terms") {
    import spark.implicits._
    val conf = new Configuration()
    val docs = corpusDf
    val pos = DomainStore.create(
      scratch("fusion-pos"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSortedZ), conf)
    pos.write(Search.positionalIndexKv(docs, "doc_id", "text"), 1L)
    val bm25 = DomainStore.create(
      scratch("fusion-bm25"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted), conf)
    bm25.write(Search.invertedIndexKv(docs, "doc_id", "text"), 1L)
    // drawn from the suite corpus: multi-doc match, repeated-occurrence
    // match, repeated-term phrase, and a no-match phrase
    val phrases = Seq(0L -> "cat dog", 1L -> "dog dog", 2L -> "cat cat", 3L -> "fish bird")
      .toDF("query_id", "phrase")
    val big = 1000
    val fused = Search.phraseSearchRanked(pos, phrases, big)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // candidate set per query == the full phrase-match set
    val matches = Search.phraseSearch(pos, phrases, big)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fused.keySet === matches.keySet)
    fused.foreach { case (k, (nm, _, _)) => assert(nm === matches(k), s"$k n_matches") }
    // scores == the BM25 index's scores for the same distinct terms at
    // the same docs (identical integer formula, identical stats)
    val queriesAsText = phrases.select(col("query_id"),
      array_join(array_distinct(graft.operators.TextAnalysis.wordTokens(col("phrase"))), " ")
        .as("query_text"))
    val bm = Search.searchTopK(bm25, queriesAsText, big)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    fused.foreach { case (k, (_, score, _)) =>
      assert(bm.contains(k), s"$k must appear in the BM25 ranking")
      assert(bm(k) === score, s"$k score must equal the BM25 index's score")
    }
    // ranks are dense per query, ordered by (score desc, doc_id)
    fused.groupBy(_._1._1).foreach { case (q, rows) =>
      val byRank = rows.toSeq.sortBy(_._2._3)
      assert(byRank.map(_._2._3) === (1L to byRank.size.toLong))
      byRank.sliding(2).foreach {
        case Seq((ka, (_, sa, _)), (kb, (_, sb, _))) =>
          assert(sa > sb || (sa == sb && ka._2 < kb._2), s"query $q order")
        case _ => ()
      }
    }
  }

  test("top-k truncates by (score desc, doc_id) and ranks densely") {
    val st = store("topk", DomainSpec.KvSorted)
    val all = run(st, "cat dog fish bird")
    assert(all.size === 4)
    assert(run(st, "cat dog fish bird", k = 2) === all.take(2))
  }

  test("postings cap drops hot terms at build; the audit names them") {
    // cap=2: "cat" (df 3) and "dog" (df 3) exceed; fish/bird (df 2) stay
    val audited = Search.oversizedPostingTerms(corpusDf, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(audited === Map("cat" -> 3L, "dog" -> 3L))

    val st = DomainStore.create(
      scratch("search-capped"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    st.write(
      Search.invertedIndexKv(corpusDf, "doc_id", "text", maxPostings = 2),
      version = 1L)
    assert(run(st, "cat") === Nil) // dropped term = stop-term elision
    assert(run(st, "cat fish") === refSearch("fish", 10))
  }

  test("incremental upsert == full rebuild, bit for bit") {
    val half = corpusDf.where(col("doc_id") <= 2)
    val rest = corpusDf.where(col("doc_id") > 2)
    val inc = DomainStore.create(
      scratch("search-inc"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    inc.write(Search.invertedIndexKv(half, "doc_id", "text"), version = 1L)
    Search.searchIndexUpsert(inc, rest, "doc_id", "text", newVersion = 2L)
    val full = store("full", DomainSpec.KvSorted)
    def dump(st: DomainStore): Map[String, String] =
      st.read(spark)
        .select(bytes_utf8(col("key")), bytes_utf8(col("value")))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dump(inc) === dump(full)) // every record class identical
    for (q <- Seq("cat dog", "fish bird", "cat"))
      assert(run(inc, q) === refSearch(q, 10), s"query '$q'")
  }

  test("upsert of an already-indexed doc id fails loud") {
    val st = store("upsert-clash", DomainSpec.KvSorted)
    val e = intercept[IllegalArgumentException] {
      Search.searchIndexUpsert(
        st, Seq(2L -> "new text").toDF("doc_id", "text"), "doc_id", "text", 2L)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("a tombstoned term stays elided through upsert; its df advances") {
    val st = DomainStore.create(
      scratch("search-tomb"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    st.write(
      Search.invertedIndexKv(corpusDf, "doc_id", "text", maxPostings = 2),
      version = 1L)
    Search.searchIndexUpsert(
      st, Seq(9L -> "cat zebra").toDF("doc_id", "text"), "doc_id", "text", 2L,
      maxPostings = 2)
    assert(run(st, "cat") === Nil) // no partial postings resurrected
    val xdf = st.get(spark, s"${Search.DroppedPrefix}cat".getBytes("UTF-8"))
      .map(new String(_, "UTF-8"))
    assert(xdf === Some("4")) // build df 3 + delta df 1
    // the delta's new term is searchable
    assert(run(st, "zebra").map(_._1) === Seq(9L))
  }

  test("an upsert that would cross the postings cap fails loud") {
    val st = DomainStore.create(
      scratch("search-cap-cross"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    // "fish" has df 2 at build (cap 2, just fits); one more doc crosses
    st.write(
      Search.invertedIndexKv(corpusDf, "doc_id", "text", maxPostings = 2),
      version = 1L)
    val e = intercept[Exception] {
      Search.searchIndexUpsert(
        st, Seq(9L -> "fish").toDF("doc_id", "text"), "doc_id", "text", 2L,
        maxPostings = 2)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("exceed maxPostings")))
  }

  test("Spark-free SearchReader serves the same ranking, bit for bit") {
    val st = store("serving", DomainSpec.KvSorted)
    val reader = new graft.store.SearchReader(
      graft.store.KvDomainReader.open(st.root.toString, new Configuration()))
    try {
      assert(reader.stats === (4L, 13L))
      for (q <- Seq("cat", "dog bird", "cat dog fish", "wombat", "wombat fish"))
        assert(reader.topK(q, 10) === run(st, q), s"query '$q'")
      assert(reader.topK("cat dog fish bird", 2) === run(st, "cat dog fish bird", k = 2))
    } finally reader.close()
  }

  test("a candidate without a doc-length record fails loud") {
    val st = DomainStore.create(
      scratch("search-corrupt"),
      DomainSpec(numShards = 4, persistenceFormat = DomainSpec.KvSorted),
      new Configuration())
    // drop every d:<id> record — postings then name docs the index
    // cannot length-normalize, which must be an error, not a miss
    st.write(
      Search.invertedIndexKv(corpusDf, "doc_id", "text")
        .where(!bytes_utf8(col("key")).startsWith(Search.DocPrefix)),
      version = 1L)
    val e = intercept[Exception] {
      Search.searchTopK(st, Seq(0L -> "cat").toDF("query_id", "query_text"), 5)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("no length record")))
  }
}
