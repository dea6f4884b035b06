package graft.queries

import graft.SparkSuite

/** The testdata generator has flipped a fixture column's physical type
  * between rounds before (events.ts, CLAUDE.md) — the guard must turn
  * that into a FIRST, named failure instead of a mid-query analyzer
  * error. */
class SchemaGuardSpec extends SparkSuite {

  test("a deliberately re-typed column fails with the table.column named") {
    import spark.implicits._
    val dir = scratch("schema-drift")
    // events with ts re-typed to string — the exact class of generator
    // change the r6 timestamp flip was
    Seq((1L, "2020-01-01", 2L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](SchemaGuard.check(spark, dir))
    assert(e.getMessage.contains("events.ts"), e.getMessage)
    assert(e.getMessage.contains("string"), e.getMessage)
    assert(e.getMessage.contains("tsAsNanos"), "error should point at the fixture-boundary fix")
  }

  test("a missing expected column fails named; extra columns are tolerated") {
    import spark.implicits._
    val dir = scratch("schema-missing")
    Seq((1L, "some text", "extra"))
      .toDF("doc_id", "text", "surplus_col")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](SchemaGuard.check(spark, dir))
    assert(e.getMessage.contains("documents.lang"), e.getMessage)
    assert(e.getMessage.contains("MISSING"), e.getMessage)
  }

  test("the real driver testdata passes the guard at every generated sf") {
    Seq("sf0.001", "sf0.01").foreach(s => SchemaGuard.check(spark, sf(s)))
  }

  test("a regenerated embedding DIM fails named (no schema carries it)") {
    import spark.implicits._
    val dir = scratch("schema-dim")
    Seq((1L, Array(0.1f, 0.2f, 0.3f), 0), (2L, Array(0.4f, 0.5f, 0.6f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](SchemaGuard.check(spark, dir))
    assert(e.getMessage.contains("3 elements"), e.getMessage)
    assert(e.getMessage.contains("EmbeddingDim"), e.getMessage)
  }
}
