#!/usr/bin/env python3
"""Self-test for graft_client.py against a live serving host.

Driven by PyClientSpec (ScalaTest): the JVM side builds fixture domains,
starts the daemon, forks this script with (host, port), and asserts on
the exit code + final OK line. The fixture contract this script expects:

  domain "users" (4 shards): u1 -> "ada", u2 -> "grace",
      "emoji-\U0001F600" -> "smile", "empty" -> b"", "nullv" -> NULL value
  domain "docs" (2 shards, kv-sorted-z): d1 -> "first document"

Every assertion failure raises (non-zero exit) with a message naming
what diverged; success prints SELFTEST OK as the last line.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "main", "python"))

from graft_client import (  # noqa: E402
    GraftClient, NULL_VALUE, RemoteServingError,
    _encode_modified_utf8, _decode_modified_utf8,
)


def check(cond, msg):
    if not cond:
        raise AssertionError(msg)


def utf_roundtrips():
    # writeUTF twin: NUL as C0 80, supplementary as CESU-8 pairs
    cases = ["", "ascii", "nul\x00nul", "café", "中文", "\U0001F600mix"]
    for s in cases:
        b = _encode_modified_utf8(s)
        check(_decode_modified_utf8(b) == s, f"modified UTF-8 roundtrip broke on {s!r}")
    check(_encode_modified_utf8("\x00") == b"\xc0\x80", "NUL must encode as C0 80")
    check(_encode_modified_utf8("\U0001F600") ==
          b"\xed\xa0\xbd\xed\xb8\x80", "supplementary must encode as CESU-8")


def ring_straddle_routing_unit():
    """Pure-unit pin (no server): a replica that keeps straddling version
    swaps (VersionStraddleError — its own retries exhausted mid-roll) is
    a FAILOVER signal at ring level, never a loud abort; a genuine
    protocol violation stays loud. The JVM parity seam: RemoteKvReader
    throws IllegalStateException there, which RingClient's generic
    failover absorbs."""
    from graft_client import ProtocolError, VersionStraddleError
    from graft_ring import GraftRing

    def fake_ring(stubs):
        r = GraftRing.__new__(GraftRing)
        r._stubs = stubs
        r.num_shards = 1
        r._shard_hosts = {0: sorted(stubs)}
        r.domain = "users"
        return r

    class Stub:
        def __init__(self, versioned=None, plain=None):
            self._v, self._p = versioned, plain

        def multi_get_versioned(self, keys):
            if isinstance(self._v, Exception):
                raise self._v
            return self._v

        def multi_get(self, keys):
            if isinstance(self._p, Exception):
                raise self._p
            return self._p

    straddle = VersionStraddleError("kept straddling version swaps")
    # one straddling replica + one healthy: the batch answers (failover)
    ring = fake_ring({"hA": Stub(versioned=straddle, plain=straddle),
                      "hB": Stub(versioned=(7, [b"v"]), plain=[b"v"])})
    check(ring._ring_multi_get_versioned([b"k"]) == (7, [b"v"]),
          "straddling replica must fail over, not abort the admission")
    check(ring.multi_get([b"k"]) == [b"v"], "plain multi_get must fail over too")
    # EVERY replica straddling = the ring is mid-roll: re-scatter (None),
    # never a loud ProtocolError
    allbusy = fake_ring({"hA": Stub(versioned=straddle, plain=straddle),
                         "hB": Stub(versioned=straddle, plain=straddle)})
    check(allbusy._ring_multi_get_versioned([b"k"]) is None,
          "an all-straddling ring is mid-roll: the caller re-scatters")
    try:
        allbusy.multi_get([b"k"])
        check(False, "all-straddling plain multi_get must raise ConnectionError")
    except ConnectionError:
        pass
    # a genuine frame violation stays loud naming the condition
    broken = fake_ring({"hA": Stub(versioned=ProtocolError("status byte 9")),
                        "hB": Stub(versioned=(7, [b"v"]))})
    try:
        broken._ring_multi_get_versioned([b"k"])
        check(False, "a wrong-protocol peer must stay loud")
    except VersionStraddleError:
        check(False, "a wrong-protocol peer must stay loud")
    except ProtocolError:
        pass


def main(host, port, hit_texts=()):
    utf_roundtrips()
    ring_straddle_routing_unit()

    with GraftClient(host, port) as census:
        names = census.domains()
        check(names == ["docs", "fpidx", "users"], f"census {names}")
        statuses = {d["name"]: d for d in census.status_all()}
        check(statuses["users"]["status"] == "ready", f"users status {statuses}")
        check(statuses["users"]["served_version"] == 1, "users version")
        check(census.fully_loaded(), "host should be fully loaded")

    with GraftClient(host, port, "users") as users:
        check(users.get(b"u1") == b"ada", "get hit")
        check(users.get(b"missing") is None, "get miss")
        check(users.get("emoji-\U0001F600".encode("utf-8")) == b"smile",
              "binary (non-ASCII) key")
        check(users.get(b"empty") == b"", "empty value must be b'', not None")
        # the present-null distinction: absent -> None, null value -> sentinel
        recs = users.multi_get_records([b"nullv", b"missing", b"u2"])
        check(recs[0] is NULL_VALUE, f"nullv record {recs[0]!r}")
        check(recs[1] is None, "missing record")
        check(recs[2] == b"grace", "u2 record")
        # flattened view: both read as None
        check(users.multi_get([b"nullv", b"missing"]) == [None, None], "flattened")
        # duplicates resolve independently and stay aligned
        check(users.multi_get([b"u2", b"u2", b"u1"]) == [b"grace", b"grace", b"ada"],
              "duplicate keys")
        num_shards, version, can_refresh = users.stats()
        check(num_shards == 4, f"num_shards {num_shards}")
        check(version == 1, f"served_version {version}")
        check(can_refresh, "root-opened domain must be refreshable")
        check(users.count() == 5, f"count {users.count()}")
        check(users.refresh() is False, "no new publish: refresh must be False")
        st = users.status()
        check(st["name"] == "users" and st["status"] == "ready", f"status {st}")

    with GraftClient(host, port, "users") as users:
        # globally key-ordered scan, paged at 2 records per round trip:
        # every key exactly once, unsigned-lexicographic order, the
        # present-null record as (key, None)
        rows = list(users.scan(page_records=2))
        keys = [k for k, _ in rows]
        check(keys == sorted(keys), f"scan order {keys}")
        check(sorted(keys) == sorted([
            b"u1", b"u2", "emoji-\U0001F600".encode("utf-8"), b"empty", b"nullv"]),
            f"scan keys {keys}")
        vals = dict(rows)
        check(vals[b"u1"] == b"ada" and vals[b"nullv"] is None and vals[b"empty"] == b"",
              f"scan values {vals}")
        # bounded sub-range: [u1, u2) keeps only u1
        sub = list(users.scan(from_key=b"u1", to_key=b"u2", to_inclusive=False))
        check(sub == [(b"u1", b"ada")], f"bounded scan {sub}")
        # shard filter: all four shards == unfiltered; per-shard pages
        # partition the key set exactly
        _, _, full_recs, _ = users.range_page(shards=[0, 1, 2, 3])
        check(sorted(k for k, _ in full_recs) == sorted(keys), "all-shard filter")
        per_shard = [k for s in range(4)
                     for k, _ in users.range_page(shards=[s])[2]]
        check(sorted(per_shard) == sorted(keys), f"per-shard partition {per_shard}")
        # a shard index past the domain is a loud error, not empty
        try:
            users.range_page(shards=[99])
            check(False, "out-of-range shard must raise")
        except RemoteServingError:
            pass

    with GraftClient(host, port, "docs") as docs:
        check(docs.get(b"d1") == b"first document", "kv-sorted-z domain get")
        check(docs.count() == 1, "docs count")

    # execution failures arrive as typed error frames, connection reusable
    with GraftClient(host, port, "no-such-domain") as bad:
        try:
            bad.get(b"x")
            check(False, "unknown domain must raise")
        except RemoteServingError as e:
            check("no-such-domain" in e.remote_message, f"error message {e}")
        # ... and the CLIENT stays usable (fresh dial under the hood)
        check(bad.domains() == ["docs", "fpidx", "users"], "client unusable after error frame")

    # domain metadata (reference getDomainMetaData): spec + versions +
    # hosted shard census with record counts
    with GraftClient(host, port, "users") as users:
        m = users.meta()
        check(m["num_shards"] == 4, f"meta num_shards {m}")
        check(m["served_version"] == 1 and m["latest_published"] == 1, f"meta versions {m}")
        check(m["persistence_format"] == "kv-sorted", f"meta format {m}")
        check(sum(n for _, n in m["shards"]) == 5, f"meta shard records {m}")
        check([s for s, _ in m["shards"]] == sorted(s for s, _ in m["shards"]),
              f"meta shard order {m}")
    with GraftClient(host, port, "no-such-domain") as bad:
        try:
            bad.meta()
            check(False, "meta of unknown domain must raise")
        except RemoteServingError:
            pass

    # ring-client routing math, pinned to the reference vectors
    # (shard_test.clj via ShardRing's scaladoc) — pure, no servers
    from graft_ring import compute_host_to_shards
    check(compute_host_to_shards(["a", "b"], 5, 1)
          == {"a": {0, 2, 4}, "b": {1, 3}}, "ring deal vector 1")
    check(compute_host_to_shards(["a", "b", "c"], 5, 2)
          == {"a": {0, 1, 3, 4}, "b": {1, 2, 4}, "c": {0, 2, 3}},
          "ring deal vector 2")

    # batched admission (overlapping_all) == per-doc overlapping, on a
    # mixed hit/clean/non-BMP/anchor-free batch against the LIVE daemon —
    # one versioned multi_get certifies the whole batch; the planted hit
    # texts arrive from the JVM fixture via argv (the selftest cannot
    # know the index contents)
    if hit_texts:
        with GraftClient(host, port, "fpidx") as ov:
            batch = list(hit_texts) + ["x" * 300, "short"]
            per_doc = [ov.overlapping(t) for t in batch]
            check(per_doc[0], "fixture vacuous: planted hit text found nothing")
            check(per_doc[-2] == [] and per_doc[-1] == [],
                  "clean/anchor-free probes must be empty")
            check(ov.overlapping_all(batch) == per_doc,
                  "overlapping_all diverged from per-doc overlapping")
            # and the batch dedups shared fingerprints: a doubled hit text
            # answers identically per position
            check(ov.overlapping_all([batch[0], batch[0]])
                  == [per_doc[0], per_doc[0]], "duplicate texts diverged")

    with GraftClient(host, port) as ops:
        swapped, failed = ops.update_all()
        check(failed == 0, f"update_all failed count {failed}")
        m = ops.metrics()
        check(m.get("multi_get.requests", 0) > 0, f"metrics {m}")
        check(m.get("update_all.requests", 0) >= 1, "update_all counted")
        check("connections.accepted" in m, "connection counters present")

    print("SELFTEST OK")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3:])
