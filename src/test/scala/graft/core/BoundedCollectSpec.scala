package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct drive of the r15 LAZY buffer cycle (no Spark session — pure
  * Catalyst objects): the serialize fast-path ships a deserialized
  * buffer's ORIGINAL bytes verbatim whenever it is untouched, so every
  * mutation path must void it (materialize/overflow) — a mutator that
  * forgot would re-spill stale bytes under sort-based aggregation
  * fallback and silently drop its delta, with only large index builds
  * as indirect coverage. The aggregate-level semantics (cap boundary,
  * canonical orders, distinct mode, map-side overflow through real
  * exchanges) are OperatorsSpec "bounded_collect"'s; THIS pins the
  * buffer-state machine itself. */
class BoundedCollectSpec extends AnyFunSuite {

  private def agg(cap: Int, distinct: Boolean = false) = BoundedCollectAgg(
    BoundReference(0, StringType, nullable = true),
    BoundReference(1, StringType, nullable = true),
    cap, distinctMembers = distinct)

  private def row(s: String): InternalRow =
    InternalRow(UTF8String.fromString(s), UTF8String.fromString(s))

  private def filled(a: BoundedCollectAgg, ss: String*): BoundedCollectBuf = {
    val b = a.createAggregationBuffer()
    ss.foreach(s => a.update(b, row(s)))
    b
  }

  test("deserialize is header-only; untouched re-serialize is verbatim; mutation voids it") {
    val a = agg(cap = 4)
    val bytes = a.serialize(filled(a, "b", "a", "c"))
    val lazyBuf = a.deserialize(bytes)
    assert(lazyBuf.pendingBytes != null && lazyBuf.pendingCount == 3)
    assert(lazyBuf.size == 3 && lazyBuf.vals.isEmpty, "entries parsed eagerly")
    assert(lazyBuf.n == 3 && !lazyBuf.over)
    // untouched: the fast path returns the ORIGINAL array, not a copy
    assert(a.serialize(lazyBuf) eq bytes)
    // ANY mutation voids it — even a null-payload row that only bumps n
    // (the fast path would otherwise re-ship the old n)
    val lazy2 = a.deserialize(bytes)
    a.update(lazy2, InternalRow(null, null))
    assert(lazy2.pendingBytes == null && lazy2.n == 4 && lazy2.vals.length == 3)
    val re = a.deserialize(a.serialize(lazy2))
    assert(re.n == 4 && re.pendingCount == 3)
  }

  test("the discard path never materializes: lazy partial into an overflowed buffer") {
    val a = agg(cap = 2)
    val over = filled(a, "x", "y", "z")
    assert(over.over && over.n == 3)
    val lazyPart = a.deserialize(a.serialize(filled(a, "p", "q")))
    a.merge(over, lazyPart)
    assert(lazyPart.pendingBytes != null, "discard path parsed the partial's entries")
    assert(over.over && over.n == 5)
    // the overflow DECISION reads header sizes only: two under-cap sides
    // crossing the cap together overflow without parsing the lazy one
    val b = filled(a, "0")
    val lazySide = a.deserialize(a.serialize(filled(a, "1", "2")))
    a.merge(b, lazySide)
    assert(b.over && b.n == 3)
    assert(lazySide.pendingBytes != null, "size-decided overflow parsed the lazy side")
  }

  test("lazy merge + eval keep canonical order; distinct dedupes across the lazy boundary") {
    val a = agg(cap = 8)
    val m = a.merge(filled(a, "d", "b"), a.deserialize(a.serialize(filled(a, "c", "a"))))
    val out = a.eval(m).asInstanceOf[GenericInternalRow]
    assert(out.getLong(0) == 4)
    assert(out.getArray(1).toObjectArray(StringType).map(_.toString).toSeq
      === Seq("a", "b", "c", "d"))
    // eval on an UNTOUCHED lazy buffer materializes on demand
    val lone = agg(cap = 8)
    val lazyOnly = lone.deserialize(lone.serialize(filled(lone, "t", "s")))
    val out2 = lone.eval(lazyOnly).asInstanceOf[GenericInternalRow]
    assert(out2.getArray(1).toObjectArray(StringType).map(_.toString).toSeq === Seq("s", "t"))
    // distinct mode: membership dedupe spans the lazy boundary and n
    // counts distinct members
    val ad = agg(cap = 8, distinct = true)
    val d1 = filled(ad, "k", "k", "m")
    assert(d1.n == 2)
    ad.merge(d1, ad.deserialize(ad.serialize(filled(ad, "m", "n"))))
    val outD = ad.eval(d1).asInstanceOf[GenericInternalRow]
    assert(outD.getLong(0) == 3)
    assert(outD.getArray(1).toObjectArray(StringType).map(_.toString).toSeq
      === Seq("k", "m", "n"))
  }
}
