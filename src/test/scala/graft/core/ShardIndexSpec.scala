package graft.core

import java.math.BigInteger
import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{shard_index, utf8_bytes}

/** Pins the O1 routing function (SURVEY.md §4): signed-BigInteger md5 mod,
  * byte-compatible with the reference HashModScheme. */
class ShardIndexSpec extends SparkSuite {

  /** Independent re-derivation (not via ShardIndex) for cross-checking. */
  private def reference(key: Array[Byte], n: Int): Int =
    new BigInteger(MessageDigest.getInstance("MD5").digest(key))
      .mod(BigInteger.valueOf(n.toLong)).intValue()

  test("key codecs: long_be/int_be/be_long round-trip, order- and width-correct") {
    import spark.implicits._
    import graft.functions._
    val rnd = new Random(11)
    val values = (Seq(0L, 1L, -1L, 255L, 256L, -256L, Int.MaxValue.toLong,
      Int.MinValue.toLong, Long.MaxValue, Long.MinValue) ++
      Seq.fill(200)(rnd.nextLong())).distinct
    val df = values.toDF("v")
    // round-trip, including negatives (two's complement both ways)
    val back = df.select(be_long(long_be(col("v"))).as("r"), col("v"))
      .where(col("r") =!= col("v")).count()
    assert(back === 0L)
    // width: always 8 bytes (4 for int_be), so composite keys parse by offset
    val widths = df.select(octet_length(long_be(col("v"))).as("w8"),
      octet_length(int_be(lit(7))).as("w4"),
      octet_length(int_be(lit(-7))).as("w4n")).distinct().collect()
    assert(widths.forall(r => r.getInt(0) == 8 && r.getInt(1) == 4 && r.getInt(2) == 4))
    // negative ints encode distinctly (two's complement low 32 bits)
    val negs = spark.range(1).select(
      hex(int_be(lit(-1))).as("a"), hex(int_be(lit(-2))).as("b")).head()
    assert(negs.getString(0) === "FFFFFFFF" && negs.getString(1) === "FFFFFFFE")
    // big-endian byte order preserves numeric order for non-negative longs
    val nonNeg = values.filter(_ >= 0)
    val sortedByBytes = nonNeg.toDF("v").select(col("v"), long_be(col("v")).as("k"))
      .orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    assert(sortedByBytes === nonNeg.sorted)
  }

  test("rolling_hash == aggregate/split/ascii formulation (incl. BMP unicode)") {
    import spark.implicits._
    import graft.functions.rolling_hash
    val texts = Seq("", "a", "hello world", "The quick brown fox 123!",
      "café naïve résumé", "こんにちは")
    val df = texts.toDF("t")
    val oldForm = aggregate(
      filter(split(col("t"), ""), c => c =!= ""),
      lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % 1000000007L)
    val rows = df.select(rolling_hash(col("t")).as("nw"), oldForm.as("old")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) === r.getLong(1), s"mismatch for '$t'")
    }
  }

  test("pinned vectors incl. md5 with leading 1-bit (negative BigInteger)") {
    // md5("0") = cfcd... has a leading 1-bit -> negative signed BigInteger;
    // expected values cross-checked externally (python int.from_bytes signed).
    val cases = Seq("0", "1", "42", "12345", "hello", "999999", "x8", "zq")
    val expected16 = Seq(10, 11, 6, 11, 2, 14, 13, 8)
    cases.zip(expected16).foreach { case (s, exp) =>
      assert(ShardIndex.shardIndex(s.getBytes("UTF-8"), 16) === exp, s"key=$s")
    }
  }

  test("property: range, determinism, agreement with independent impl") {
    val rnd = new Random(7)
    (1 to 2000).foreach { _ =>
      val key = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt().toByte)
      val n = 1 + rnd.nextInt(1024)
      val s = ShardIndex.shardIndex(key, n)
      assert(s >= 0 && s < n)
      assert(s === ShardIndex.shardIndex(key, n))
      assert(s === reference(key, n))
    }
  }

  test("expression (codegen path) agrees with the Scala function") {
    import spark.implicits._
    val df = (0 until 1000).map(_.toString).toDF("s")
      .select(col("s"), shard_index(utf8_bytes(col("s")), 64).as("shard"))
    df.collect().foreach { r =>
      assert(r.getInt(1) === ShardIndex.shardIndex(r.getString(0).getBytes("UTF-8"), 64))
    }
  }

  test("distribution is roughly uniform") {
    val counts = (0 until 10000)
      .map(i => ShardIndex.shardIndex(s"key-$i".getBytes("UTF-8"), 16))
      .groupBy(identity).view.mapValues(_.size)
    assert(counts.size === 16)
    counts.values.foreach(c => assert(c > 400 && c < 850, s"skewed distribution: $counts"))
  }

  test("SQL-registered kernels equal the Scala DSL expressions") {
    // same Expression classes behind both surfaces; this pins the SQL
    // registration wiring (names, arity, analysis)
    val row = spark.sql(
      """SELECT
        |  shard_index(encode('hot', 'UTF-8'), 8) AS s,
        |  rolling_hash('the quick brown fox') AS rh,
        |  top_freq(array('a', 'b', 'a', 'c', 'a')) AS tf,
        |  array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) === reference("hot".getBytes("UTF-8"), 8))
    assert(row.getLong(1) === RollingHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox")))
    assert(row.getInt(2) === 3)
    assert(row.getDouble(3) === (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
    // arity is validated at analysis, not mid-run
    intercept[Exception](spark.sql("SELECT rolling_hash('a', 'b')").collect())
  }
}
