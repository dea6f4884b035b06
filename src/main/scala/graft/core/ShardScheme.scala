package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.graft.interop
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/**
 * Pluggable key -> shard routing — the engine's twin of the reference's
 * class-name-loaded sharding scheme SPI (`DomainSpec.java:46-52` resolves
 * any `shardingScheme` class via `Utils.java:31-51`; `HashModScheme.java`
 * is the only shipped implementation). A spec's `shardScheme` is either
 * the built-in `"hash-mod"` or the fully-qualified class name of a
 * [[ShardScheme]] with a public no-arg constructor (the [[graft.store.Indexer]]
 * resolution idiom) — resolution happens at spec validation/open, so a
 * typo'd class fails loud before any byte is routed.
 *
 * Implementations MUST be deterministic pure functions of (key, numShards):
 * write-side sharding, read-side pruning/point routing, reshard, fsck's
 * misroute audit, and the Spark-free serving reader all route through one
 * resolved instance, and they must agree byte-for-byte (SURVEY O1).
 * Instances are `Serializable` (they ride Catalyst expressions and task
 * closures) and must be thread-safe.
 *
 * Plumbing constraints of a CUSTOM scheme (documented trade-offs, all
 * fail-safe):
 *  - the plan-time [[graft.plans.ShardPruningRule]] only fires for
 *    hash-mod domains (it derives `shard = shard_index(key)` from
 *    key-equality filters; injecting hash-mod routing under a foreign
 *    scheme would prune the WRONG shards) — custom-scheme lookups still
 *    prune through multiGet's explicit routing;
 *  - the Python clients (`graft_client.py` ring routing) compute md5-mod
 *    client-side and support hash-mod domains only — serve custom-scheme
 *    domains to JVM clients, or route via single-host mode.
 */
trait ShardScheme extends Serializable {
  /** Shard of `key` in a domain of `numShards`; must be in [0, numShards). */
  def shardIndex(key: Array[Byte], numShards: Int): Int
}

object ShardScheme {

  /** The reference-compatible default: `BigInteger(md5(key)) mod n`
    * ([[ShardIndex]], HashModScheme.java:7-11). */
  object HashMod extends ShardScheme {
    override def shardIndex(key: Array[Byte], numShards: Int): Int =
      ShardIndex.shardIndex(key, numShards)
  }

  /** Resolve a spec's `shardScheme` string. `"hash-mod"` -> [[HashMod]];
    * anything else is loaded as a class name — unknown/ill-typed names
    * fail loud with the migration hint, never mis-route. */
  def forName(name: String): ShardScheme = {
    val n = name.trim
    if (n == DomainSpec.HashMod) HashMod
    else if (!n.contains(".")) throw new IllegalArgumentException(
      s"unknown shardScheme '$n' (known: ${DomainSpec.HashMod}, or the " +
        "fully-qualified class name of a graft.core.ShardScheme with a " +
        "no-arg constructor)")
    else {
      val inst =
        try Class.forName(n).getDeclaredConstructor().newInstance()
        catch {
          case e @ (_: ClassNotFoundException | _: NoSuchMethodException |
              _: ReflectiveOperationException) =>
            throw new IllegalArgumentException(
              s"shardScheme class '$n' cannot be instantiated (must be on " +
                "the classpath with a public no-arg constructor)", e)
        }
      inst match {
        case s: ShardScheme => s
        case other => throw new IllegalArgumentException(
          s"shardScheme class ${other.getClass.getName} does not implement graft.core.ShardScheme")
      }
    }
  }

  /** The routing COLUMN for a resolved scheme: hash-mod keeps the static
    * [[ShardIndexExpr]] (whose shape ShardPruningRule and the oracles
    * recognize); custom schemes ride [[SchemeShardIndexExpr]], codegen'd
    * through a reference object — still no UDF, still whole-stage. */
  def routingColumn(scheme: ShardScheme, key: Column, numShards: Int): Column = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    scheme match {
      case HashMod => interop.column(ShardIndexExpr(interop.expression(key), Literal(numShards)))
      case s => interop.column(SchemeShardIndexExpr(s, interop.expression(key), Literal(numShards)))
    }
  }
}

/** Catalyst routing expression for a CUSTOM [[ShardScheme]]: the scheme
  * instance rides the expression as a reference object, so generated code
  * calls it directly (no UDF wrapper, no serialization per row). The
  * instance is part of the expression's equality (case-class field), which
  * is as precise as a by-name SPI can be. */
case class SchemeShardIndexExpr(scheme: ShardScheme, left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[interop.AbstractType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = s"scheme_shard_index(${scheme.getClass.getSimpleName})"

  override protected def nullSafeEval(key: Any, n: Any): Any =
    scheme.shardIndex(key.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardScheme", scheme, classOf[ShardScheme].getName)
    defineCodeGen(ctx, ev, (k, n) => s"$ref.shardIndex($k, $n)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): SchemeShardIndexExpr =
    copy(left = newLeft, right = newRight)
}
