package graft.core

import java.math.BigInteger
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.graft.interop
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/**
 * Key -> shard routing, byte-compatible with the reference scheme
 * (elephantdb HashModScheme: `new BigInteger(md5(key)).mod(numShards)`,
 * reference elephantdb-core/src/jvm/elephantdb/partition/HashModScheme.java:7-11
 * and Utils.java:57-60). The 16 md5 bytes are interpreted as a *signed*
 * big-endian BigInteger; `mod` is the always-non-negative modulus.
 *
 * This single function is load-bearing: write-side sharding, read-side
 * routing (multiGet pruning) and reshard must agree byte-for-byte
 * (SURVEY.md O1).
 */
object ShardIndex {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def md5(key: Array[Byte]): Array[Byte] = {
    val d = digests.get()
    d.reset()
    d.digest(key)
  }

  /** Reference-compatible shard routing; n must be > 0. */
  def shardIndex(key: Array[Byte], n: Int): Int =
    new BigInteger(md5(key)).mod(BigInteger.valueOf(n.toLong)).intValue()
}

/**
 * Catalyst expression for [[ShardIndex.shardIndex]]. Codegen emits a
 * static call, so the expression stays inside whole-stage codegen (no
 * UDF/serialization overhead on the write path where it runs per row).
 */
case class ShardIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Declared input types make a mistyped key column (un-encoded long,
  // string, ...) a clear plan-time AnalysisException instead of a
  // ClassCastException mid-execution.
  override def inputTypes: Seq[interop.AbstractType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "shard_index"

  override protected def nullSafeEval(key: Any, n: Any): Any =
    ShardIndex.shardIndex(key.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.core.ShardIndex.shardIndex($k, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): ShardIndexExpr =
    copy(left = newLeft, right = newRight)
}
