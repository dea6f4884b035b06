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
 *
 * Pairing is by LEAF PROVENANCE, not by bare name: the rule locates the
 * leaf relation that produced the tagged key attribute (by exprId) and
 * takes the `shard` attribute of THAT leaf — matching any
 * integer column merely named `shard` across the whole child output
 * would happily inject the routing predicate against an unrelated
 * column from the other side of a join and silently drop rows. (The
 * shard partition column cannot carry schema metadata itself: Spark
 * rebuilds partition-column attributes without user-field metadata, so
 * only the key's metadata survives to identify a domain scan.) If the
 * leaf's shard attribute is no longer visible at the filter (projected
 * away or re-aliased), the rule stands down: a missed optimization,
 * never a wrong plan.
 *
 * The reference client does this routing imperatively on every RPC
 * (`HashModScheme` + shard selection, SURVEY §2.3 Q4); here it is a
 * plan rewrite, which is what makes it compose — semi joins, unions and
 * subqueries over a domain scan all prune for free.
 *
 * Idempotent under the optimizer's fixpoint: a derived constraint is
 * skipped when an existing conjunct already pins the shard to the same
 * set — including the `InSet` form `OptimizeIn` rewrites an injected
 * `In` into on the next iteration (a plain semanticEquals check would
 * re-inject forever and burn the whole iteration budget).
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

  /** Shard set an existing conjunct pins the shard column to, if any —
    * covers the EqualTo / In forms this rule injects AND the InSet form
    * OptimizeIn rewrites them into. */
  private def existingShardSet(
      c: Expression,
      shard: AttributeReference): Option[Set[Int]] = c match {
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.semanticEquals(shard) =>
      Some(Set(v))
    case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.semanticEquals(shard) =>
      Some(Set(v))
    case In(a: AttributeReference, elems)
        if a.semanticEquals(shard) &&
          elems.forall { case Literal(_: Int, IntegerType) => true; case _ => false } =>
      Some(elems.map { case Literal(v: Int, IntegerType) => v }.toSet)
    case InSet(a: AttributeReference, hset)
        if a.semanticEquals(shard) && hset.forall(_.isInstanceOf[Int]) =>
      Some(hset.map(_.asInstanceOf[Int]))
    case _ => None
  }

  private def shardPredicate(shard: AttributeReference, shards: Seq[Int]): Expression =
    shards.sorted match {
      case Seq(one) => EqualTo(shard, Literal(one, IntegerType))
      case many => In(shard, many.map(Literal(_, IntegerType)))
    }

  /** The `shard` attribute of the SAME leaf relation that produced
    * `key`, provided it is still visible at the filter. */
  private def leafShardFor(
      child: LogicalPlan,
      key: AttributeReference): Option[AttributeReference] =
    child.collectLeaves()
      .find(_.output.exists(_.exprId == key.exprId))
      .flatMap(_.output.collectFirst {
        case a: AttributeReference if a.name == "shard" && a.dataType == IntegerType => a
      })
      .filter(child.outputSet.contains)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val keyed = child.output.collect {
        case a: AttributeReference
            if a.dataType == BinaryType && a.metadata.contains(NumShardsKey) => a
      }
      val existing = conjuncts(cond)
      val derived = keyed.flatMap { key =>
        leafShardFor(child, key).toSeq.flatMap { shard =>
          val n = key.metadata.getLong(NumShardsKey).toInt
          existing
            .flatMap(c => impliedShards(c, key, n))
            .map(_.toSet)
            .filterNot(set =>
              existing.exists(c => existingShardSet(c, shard).contains(set)))
            .map(set => shardPredicate(shard, set.toSeq))
        }
      }.filterNot(d => existing.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And(_, _)), child)
  }
}
