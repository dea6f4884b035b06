package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.core.ShardIndex

/**
 * Optimizer rule making shard pruning automatic: a plain `key = X` (or
 * `key IN (...)`) filter over a domain scan implies `shard =
 * shard_index(X)`, so the rule injects that conjunct and partition
 * pruning does the rest — users and tools (plain SQL included) get
 * pruned point lookups without knowing the routing function exists.
 * `DomainStore.readVersion` tags its key column with `graft.numShards`
 * metadata; that tag travels with the attribute through projections, so
 * the rule fires wherever both `key` and `shard` are still in scope.
 *
 * The reference client does this routing imperatively on every RPC
 * (`HashModScheme` + shard selection, SURVEY §2.3 Q4); here it is a
 * plan rewrite, which is what makes it compose — semi joins, unions and
 * subqueries over a domain scan all prune for free.
 *
 * Injected conjuncts are checked for semantic presence first, so the
 * rule is idempotent under the optimizer's fixpoint iteration, and the
 * explicit `shard = i` filters the `DomainStore.get` API writes are
 * simply found already present.
 */
object ShardPruningRule extends Rule[LogicalPlan] {

  val NumShardsKey = "graft.numShards"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Shard set implied by one conjunct on the tagged key column, if any. */
  private def impliedShards(
      c: Expression,
      key: AttributeReference,
      n: Int): Option[Seq[Int]] = c match {
    case EqualTo(a: AttributeReference, Literal(v: Array[Byte], BinaryType))
        if a.semanticEquals(key) && v != null =>
      Some(Seq(ShardIndex.shardIndex(v, n)))
    case EqualTo(Literal(v: Array[Byte], BinaryType), a: AttributeReference)
        if a.semanticEquals(key) && v != null =>
      Some(Seq(ShardIndex.shardIndex(v, n)))
    case In(a: AttributeReference, elems)
        if a.semanticEquals(key) && elems.nonEmpty &&
          elems.forall {
            case Literal(v: Array[Byte], BinaryType) => v != null
            case _ => false
          } =>
      Some(elems.map { case Literal(v: Array[Byte], BinaryType) =>
        ShardIndex.shardIndex(v, n)
      }.distinct)
    case InSet(a: AttributeReference, hset)
        if a.semanticEquals(key) && hset.nonEmpty &&
          hset.forall(v => v.isInstanceOf[Array[Byte]] && v != null) =>
      Some(hset.toSeq.map(v =>
        ShardIndex.shardIndex(v.asInstanceOf[Array[Byte]], n)).distinct)
    case _ => None
  }

  private def shardPredicate(shard: AttributeReference, shards: Seq[Int]): Expression =
    shards.sorted match {
      case Seq(one) => EqualTo(shard, Literal(one, IntegerType))
      case many => In(shard, many.map(Literal(_, IntegerType)))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val keyOpt = child.output.collectFirst {
        case a: AttributeReference
            if a.dataType == BinaryType && a.metadata.contains(NumShardsKey) => a
      }
      val shardOpt = child.output.collectFirst {
        case a: AttributeReference if a.name == "shard" && a.dataType == IntegerType => a
      }
      (keyOpt, shardOpt) match {
        case (Some(key), Some(shard)) =>
          val n = key.metadata.getLong(NumShardsKey).toInt
          val existing = conjuncts(cond)
          val derived = existing
            .flatMap(c => impliedShards(c, key, n))
            .map(shardPredicate(shard, _))
            .filterNot(d => existing.exists(_.semanticEquals(d)))
          if (derived.isEmpty) f
          else Filter(derived.foldLeft(cond)(And(_, _)), child)
        case _ => f
      }
  }
}
