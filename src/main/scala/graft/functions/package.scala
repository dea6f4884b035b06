package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.interop

import graft.core.{AnchorPositionsExpr, DenseScatterExpr, DoubleArrayDot, RollingHashExpr, ShardIndexExpr, SpanExciseExpr, TopFreqExpr}

/**
 * Column-level functions of the graft engine. Everything here is either a
 * native Catalyst expression or a composition of Spark built-ins, so it all
 * stays inside whole-stage codegen (no Scala UDFs in hot paths).
 */
package object functions {

  /** Reference-compatible shard routing: `BigInteger(md5(key)) mod n` (see [[graft.core.ShardIndex]]). */
  def shard_index(key: Column, n: Int): Column = {
    require(n > 0, s"numShards must be positive, got $n")
    interop.column(ShardIndexExpr(interop.expression(key), Literal(n)))
  }


  // --- Key codecs: typed columns <-> the engine's opaque binary keys. ---
  // The reference keeps keys/values as raw bytes and pushes serde to callers
  // (client.clj:72-84); these helpers are the "caller-side serde" for the
  // common typed cases, built from codegen'd Spark functions.

  /** BIGINT -> 8-byte big-endian binary (two's complement, order-preserving for non-negative values). */
  def long_be(c: Column): Column = unhex(lpad(hex(c.cast("long")), 16, "0"))

  /** INT -> 4-byte big-endian binary (two's complement). `hex` widens to
    * bigint (16 F-led chars for negatives), so mask to the low 32 bits
    * first — a left-truncating lpad would collapse every negative int to
    * the same 4 bytes. */
  def int_be(c: Column): Column =
    unhex(lpad(hex(c.cast("int").cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0"))

  /** 8-byte big-endian binary -> BIGINT, the exact inverse of [[long_be]]
    * including negatives: `conv` yields the unsigned value as a string, so
    * re-bias anything above Long.MaxValue by 2^64 in decimal before the
    * final cast (a bare cast would overflow to null). */
  def be_long(c: Column): Column = {
    val u = conv(hex(c), 16, 10).cast("decimal(20,0)")
    when(u > lit(Long.MaxValue), u - lit(new java.math.BigDecimal("18446744073709551616")))
      .otherwise(u)
      .cast("long")
  }

  /** 4-byte big-endian binary -> INT, the exact inverse of [[int_be]]
    * including negatives: `conv`'s unsigned value re-biases by 2^32 when
    * above Int.MaxValue. */
  def be_int(c: Column): Column = {
    val u = conv(hex(c), 16, 10).cast("long")
    when(u > lit(Int.MaxValue.toLong), u - lit(1L << 32)).otherwise(u).cast("int")
  }

  /** UTF-8 string -> binary. */
  def utf8_bytes(c: Column): Column = encode(c, "UTF-8")

  /** binary -> UTF-8 string. */
  def bytes_utf8(c: Column): Column = decode(c, "UTF-8")

  /** Composite key: concatenation of already-encoded binary parts. */
  def composite_key(parts: Column*): Column = concat(parts: _*)

  /** Codegen'd left-to-right dot product of two array<double> columns
    * (see [[graft.core.DoubleArrayDot]]). */
  def array_dot(a: Column, b: Column): Column =
    interop.column(DoubleArrayDot(interop.expression(a), interop.expression(b)))

  /** Codegen'd rolling polynomial hash of a string column
    * (see [[graft.core.RollingHashExpr]]). */
  def rolling_hash(s: Column): Column =
    interop.column(RollingHashExpr(interop.expression(s)))

  /** Codegen'd content-defined anchor positions (1-based array<int>) of a
    * string column under a Rabin-Karp window hash
    * (see [[graft.core.AnchorPositionsExpr]]). */
  def anchor_positions(s: Column, window: Int, modulus: Int): Column =
    interop.column(AnchorPositionsExpr(interop.expression(s), window, modulus))

  /** Codegen'd count of the most frequent element of an array<string>
    * column (see [[graft.core.TopFreqExpr]]). */
  def top_freq(a: Column): Column =
    interop.column(TopFreqExpr(interop.expression(a)))

  /** Codegen'd dense assembly of feature-hashed (cell:int, w:long)
    * entries into array<double> of length `dim` (see
    * [[graft.core.DenseScatterExpr]]). */
  def dense_scatter(entries: Column, dim: Int): Column =
    interop.column(DenseScatterExpr(interop.expression(entries), dim))

  /** Codegen'd codepoint-exact excision of `[p, p + minLen)` for every
    * sorted 1-based cut position in `ps` (array<int>) from string `t` —
    * one byte-level pass (see [[graft.core.SpanExciseExpr]]). */
  def span_excise(t: Column, ps: Column, minLen: Int): Column =
    interop.column(SpanExciseExpr(interop.expression(t), interop.expression(ps), minLen))

  /** First 32 bits of md5 of a string column as a non-negative long — the
    * engine's engine-replicable base hash (DuckDB twin:
    * `('0x' || substr(md5(x), 1, 8))::UBIGINT`). Shared by SimHash votes
    * and sampling buckets so the two can't drift from their oracles. */
  def md5_prefix32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
}
