#!/usr/bin/env python3
"""Dependency-free Python RING client for graft serving clusters.

The cross-language twin of the JVM RingClient
(src/main/scala/graft/store/RingClient.scala): md5-mod shard routing,
the deterministic round-robin shard deal, per-shard replica failover,
and scatter-gather multi_get — over graft_client.GraftClient host stubs.
Boots from the SAME shared global conf the daemons boot from
(src/main/scala/graft/ServeConfig.scala: `hosts`, `replication`, `port`,
`domain.<name>`), so an ops box needs this file, graft_client.py, and
the conf — no JVM.

The two routing algorithms are BYTE-COMPATIBLE with the engine (and so
with the reference, nathanmarz/elephantdb):

- shard_index(key, n) = BigInteger(md5(key)) mod n over the SIGNED md5
  bytes (elephantdb's HashModScheme; graft core/ShardIndex.scala) —
  Python: int.from_bytes(md5, 'big', signed=True) % n (Python's % and
  BigInteger.mod are both always non-negative for positive n).
- host_to_shards = deal shards over hosts round-robin, `replication`
  passes, skipping (and consuming the turn of) any host already holding
  the shard (elephantdb common/shard.clj; graft store/ShardRing.scala).
  Reference vectors (shard_test.clj): (["a","b"], 5, 1) ->
  {a: {0,2,4}, b: {1,3}}; (["a","b","c"], 5, 2) ->
  {a: {0,1,3,4}, b: {1,2,4}, c: {0,2,3}}.

Usage:

    from graft_ring import GraftRing
    ring = GraftRing.from_conf("/etc/graft/global.conf", "users")
    value = ring.get(b"u1")
    values = ring.multi_get([b"u1", b"u2"])
    ring.close()

CLI:

    graft_ring.py CONF DOMAIN get KEY
    graft_ring.py CONF DOMAIN multi-get KEY [KEY...]
    graft_ring.py CONF DOMAIN scan [FROM [TO]]
    graft_ring.py CONF DOMAIN overlap TEXT [TEXT...]   # batched admission
                  # (one line per text: ids or '(clean)'; default anchor
                  # geometry — the batch certifies ONE served version
                  # ring-wide)
"""

import hashlib
import random
import sys
import threading

from graft_client import GraftClient, ProtocolError, VersionStraddleError


def shard_index(key, num_shards):
    """BigInteger(md5(key)).mod(n) over SIGNED md5 bytes — byte-compatible
    with the engine's write routing (and the reference's HashMod)."""
    digest = hashlib.md5(key).digest()
    return int.from_bytes(digest, "big", signed=True) % num_shards


def compute_host_to_shards(hosts, shard_count, replication):
    """The deterministic ring deal (see module doc). Returns
    {host: set(shard)}; hosts that never get a shard are absent."""
    if not hosts:
        raise ValueError("ring: no hosts")
    if len(set(hosts)) != len(hosts):
        raise ValueError(f"ring: duplicate hosts in {hosts}")
    if shard_count < 1 or replication < 1:
        raise ValueError("ring: shard_count and replication must be >= 1")
    if len(hosts) < replication:
        raise ValueError(
            f"ring: replication {replication} greater than number of hosts ({len(hosts)})")
    acc = {}
    turn = 0
    for _ in range(replication):
        for shard in range(shard_count):
            skipped = 0
            host = hosts[turn % len(hosts)]
            turn += 1
            while shard in acc.get(host, set()):
                skipped += 1
                if skipped > len(hosts):
                    raise AssertionError(f"ring: no host free for shard {shard}")
                host = hosts[turn % len(hosts)]
                turn += 1
            acc.setdefault(host, set()).add(shard)
    return acc


def parse_global_conf(path):
    """Parse the shared global conf (java.util.Properties subset: one
    `key = value` per line, # / ! comments — the shape ServeConfig
    writes and reads). Returns (host_entries, replication, port, domains)
    where host_entries = [(name, address, port)]."""
    props = {}
    with open(path, "r", encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line[0] in "#!":
                continue
            if "=" not in line:
                raise ProtocolError(f"{path}: unparseable line {line!r}")
            k, v = line.split("=", 1)
            props[k.strip()] = v.strip()
    port = int(props.get("port", "3578"))
    hosts_raw = props.get("hosts")
    if not hosts_raw:
        raise ProtocolError(f"{path}: missing required key 'hosts'")
    entries = []
    for entry in [e.strip() for e in hosts_raw.split(",") if e.strip()]:
        if "=" in entry:
            name, addr = entry.split("=", 1)
            a, _, p = addr.partition(":")
            if not p:
                raise ProtocolError(
                    f"{path}: host entry {entry!r} must be name or name=address:port")
            entries.append((name.strip(), a.strip(), int(p)))
        else:
            entries.append((entry, entry, port))
    names = [n for n, _, _ in entries]
    if len(set(names)) != len(names):
        raise ProtocolError(f"{path}: duplicate host names in 'hosts'")
    domains = {k[len("domain."):]: v for k, v in props.items() if k.startswith("domain.")}
    replication = int(props.get("replication", "1"))
    return entries, replication, port, domains


class GraftRing:
    """Ring client for one domain: routes each key to its shard, tries
    that shard's replicas in a shuffled sticky order, and scatter-gathers
    multi_get batches per host. Not thread-safe (one GraftClient per
    host, like the JVM client's reader map)."""

    def __init__(self, host_entries, replication, domain,
                 connect_timeout=5.0, read_timeout=60.0, seed=None):
        self.domain = domain
        self._rnd = random.Random(seed)
        self._stubs = {
            name: GraftClient(addr, port, domain,
                              connect_timeout=connect_timeout,
                              read_timeout=read_timeout)
            for name, addr, port in host_entries}
        names = [n for n, _, _ in host_entries]
        # probe the shard count in PARALLEL (the JVM client's discipline:
        # a frozen host costs construction at most ONE timeout, never one
        # per broken host); reachable hosts must agree. Down hosts AND
        # hosts answering "no such domain" (mid-deploy, puller not done)
        # are failover's job, matching RingClient.probeShardCount; a
        # wrong-protocol peer stays loud.
        metas = {}
        errs = {}
        def probe(n):
            try:
                m = self._stubs[n].meta()
                metas[n] = (m["num_shards"], m["shard_scheme"])
            except Exception as e:
                errs[n] = e
        threads = [threading.Thread(target=probe, args=(n,), daemon=True)
                   for n in names]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for n, e in errs.items():
            if isinstance(e, ProtocolError):
                self.close()
                raise ProtocolError(f"host {n} speaks the wrong protocol: {e}")
        if not metas:
            self.close()
            raise ConnectionError(
                f"no host of the ring answered a shard-count probe "
                f"(tried: {', '.join(names)}): {errs}")
        if len(set(metas.values())) != 1:
            self.close()
            raise ProtocolError(
                f"ring hosts disagree on shard count/scheme — different domains: {metas}")
        self.num_shards, scheme = next(iter(metas.values()))
        # scheme gate: this client routes md5-mod ONLY. A custom-scheme
        # domain would degrade to per-lookup wrong-host failover at best
        # (and silent misses if the daemon could not re-route) — refuse
        # AT BOOT naming the scheme, like the JVM RingClient.fromConf.
        # The META probe already paid for the answer; the gate is free.
        if scheme != "hash-mod":
            self.close()
            raise ProtocolError(
                f"domain {domain!r} routes with shard scheme {scheme!r}, but this "
                "client can only route 'hash-mod' (md5-mod) — serve custom-scheme "
                "domains from a JVM client built with the resolved scheme")
        fwd = compute_host_to_shards(names, self.num_shards, replication)
        self._shard_hosts = {}
        for host, shards in fwd.items():
            for s in shards:
                self._shard_hosts.setdefault(s, []).append(host)
        for s in self._shard_hosts:
            self._rnd.shuffle(self._shard_hosts[s])

    @classmethod
    def from_conf(cls, path, domain, **kw):
        entries, replication, _, domains = parse_global_conf(path)
        if domain not in domains:
            raise ProtocolError(
                f"{path}: domain {domain!r} not configured "
                f"(domains: {', '.join(sorted(domains))})")
        return cls(entries, replication, domain, **kw)

    def close(self):
        for c in self._stubs.values():
            try:
                c.close()
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _replicas(self, shard):
        hosts = self._shard_hosts.get(shard)
        if not hosts:
            raise ProtocolError(
                f"no hosts in the ring for shard {shard} (of {self.num_shards})")
        return hosts

    def get(self, key):
        """Point lookup with replica failover. None = key absent."""
        return self.multi_get([key])[0]

    def scan(self, from_key=None, to_key=None,
             from_inclusive=True, to_inclusive=True, page_records=4096):
        """Ring-wide, globally key-ordered scan — the Python twin of
        RingClient.rangeScan: each shard is read from exactly ONE replica
        (a replicated ring is read once, not once per replica) with
        sticky failover and exact exclusive resume; each shard's stream
        certifies ONE serving version for its whole run (a replica that
        can only continue at a different version counts as failed; when
        every replica of a shard fails, the scan raises naming it). The
        merged stream yields (key, value) with value None for
        present-null records."""
        import heapq
        from graft_client import MAX_BATCH, MAX_KEY_LEN
        # validate CALLER arguments up front (the Scala twin's requires):
        # inside the per-replica try they would read as host failures and
        # surface as "all replicas failed" -- an ops alarm for a usage error
        if not 0 < page_records <= MAX_BATCH:
            raise ValueError(f"scan: page_records {page_records} outside (0, {MAX_BATCH}]")
        for b in (from_key, to_key):
            if b is not None and len(b) > MAX_KEY_LEN:
                raise ValueError(
                    f"scan: range bound of {len(b)} bytes exceeds the protocol bound {MAX_KEY_LEN}")

        def shard_iter(shard):
            order = list(self._replicas(shard))
            resume, inclusive = from_key, from_inclusive
            version = None
            done = False
            while not done:
                page = None
                last = None
                for host in order:
                    try:
                        v_lo, v_hi, records, truncated = self._stubs[host].range_page(
                            resume, to_key, inclusive, to_inclusive,
                            page_records, shards=[shard])
                        if v_lo != v_hi:
                            raise ProtocolError(
                                f"shard {shard} page straddled a version swap on {host}")
                        if version is not None and v_lo != version:
                            raise ProtocolError(
                                f"shard {shard}: {host} serves version {v_lo}, "
                                f"this scan started on {version}")
                        if not records and truncated:
                            raise ProtocolError(
                                f"shard {shard}: {host} returned an empty truncated page")
                        page = (records, truncated)
                        if version is None:
                            version = v_lo
                        if order[0] != host:  # sticky: winner to the front
                            order.remove(host)
                            order.insert(0, host)
                        break
                    except Exception as e:  # next replica (incl. version misses)
                        last = e
                if page is None:
                    raise ConnectionError(
                        f"all replicas of shard {shard} failed the range scan "
                        f"(tried: {', '.join(sorted(self._replicas(shard)))})") from last
                records, truncated = page
                yield from records
                if not truncated:
                    done = True
                else:
                    resume, inclusive = records[-1][0], False

        return heapq.merge(
            *(shard_iter(s) for s in range(self.num_shards)),
            key=lambda kv: kv[0])

    def overlapping(self, text, min_len=64, window=8, modulus=16):
        """Ring-wide admission probe: indexed corpus doc ids sharing an
        exact >= min_len-codepoint run with `text` — overlapping_all for
        one doc."""
        return self.overlapping_all([text], min_len, window, modulus)[0]

    def overlapping_all(self, texts, min_len=64, window=8, modulus=16):
        """Batched admission over the RING — the deployment-shaped twin
        of GraftClient.overlapping_all: every doc's fingerprints dedup
        across the batch (shared boilerplate probes once, not once per
        carrier), the deduped keys scatter-gather per SHARD OWNER with
        replica failover, and the batch is accepted only when every
        shard's frames certify ONE ring-wide served version (the scan
        path's rule: a replica that can only answer a different version
        counts as failed) — every answer in the batch reflects the same
        published version, never a pre-/post-takedown mix across hosts.
        A mid-roll ring that cannot converge on one version within the
        retries fails LOUD rather than mixing. The fp-anchor family gate
        runs against the SAME certified version (meta from a host
        serving it; the in-data marker fallback routed to the marker's
        owner shard), cached per version like the single-server client.
        min_len/window/modulus MUST match the index build's — they
        define the key bytes themselves. Answers align with the input;
        each is exactly what a single complete server would return."""
        from graft_client import batch_fingerprints, resolve_overlaps
        per_doc, uniq = batch_fingerprints(texts, min_len, window, modulus)
        if not uniq:
            # still fail loud on a wrong-family domain (the single-server
            # rule: anchor-free texts must not read as silently clean
            # forever) — gate once at any one certifiable version
            if not hasattr(self, "_fp_gate_version"):
                for _ in range(3):
                    v = self._fp_gate_ring(None)
                    if v is not None:
                        self._fp_gate_version = v
                        break
                else:
                    raise ProtocolError(
                        "overlapping: the ring kept swapping versions under "
                        "the family gate — retries exhausted")
            return [[] for _ in per_doc]
        for _ in range(3):
            got = self._ring_multi_get_versioned(uniq)
            if got is None:
                continue  # mid-roll version split: re-scatter
            version, records = got
            if getattr(self, "_fp_gate_version", None) == version or \
                    self._fp_gate_ring(version) == version:
                self._fp_gate_version = version
                return resolve_overlaps(per_doc, uniq, records)
        raise ProtocolError(
            "overlapping: the ring kept serving mixed versions under the "
            "batch — retries exhausted (mid-roll: retry when the roll "
            "converges rather than mixing versions within one admission)")

    def _ring_multi_get_versioned(self, keys):
        """(version, records aligned with keys) where every shard
        group's frames certified the SAME ring-wide served version — the
        batch's first successful answer pins it; a replica answering a
        different version counts as failed and the next replica is
        tried. Returns None when some shard's replicas are alive but can
        only answer another version (the ring is mid-roll — the caller
        re-scatters); raises when every replica of some shard is DOWN,
        and stays loud on a wrong-protocol peer."""
        out = [None] * len(keys)
        groups = {}
        for i, k in enumerate(keys):
            groups.setdefault(shard_index(k, self.num_shards), []).append((k, i))
        version = None
        for shard, group in groups.items():
            answered = False
            wrong_version = False
            last = None
            for host in self._replicas(shard):
                try:
                    v, vals = self._stubs[host].multi_get_versioned(
                        [k for k, _ in group])
                except VersionStraddleError:
                    # alive but republishing so fast its own frame stamps
                    # never agreed — the same mid-roll signal as an
                    # explicit other-version answer: try the next replica,
                    # and if none certifies, re-scatter (never loud — one
                    # busy host must not abort the whole ring admission)
                    wrong_version = True
                    continue
                except ProtocolError:
                    raise  # wrong service: loud, not failover
                except Exception as e:
                    last = e  # down/mid-frame: next replica
                    continue
                if version is not None and v != version:
                    wrong_version = True  # alive, but another version
                    continue
                if version is None:
                    version = v
                for (k, i), val in zip(group, vals):
                    out[i] = val
                answered = True
                break
            if not answered:
                if wrong_version:
                    return None
                raise ConnectionError(
                    f"all replicas of shard {shard} failed the versioned "
                    f"batch (tried: {', '.join(sorted(self._replicas(shard)))})"
                ) from last
        return version, out

    def _fp_gate_ring(self, version):
        """The fp-anchor family gate against one served version (None =
        whatever single version can be observed): meta's index_type from
        a host serving that version is the spec authority; a pre-field
        spec ('none') falls back to the in-data m:index-type marker,
        routed to the marker's OWNER shard and certified against the
        same version. The VERDICT body (marker decode + family check) is
        graft_client's, shared with the single-server gate so the two
        admissions cannot drift. Returns the certified version, or None
        when the observation raced a swap (the caller re-probes); raises
        ConnectionError when NO host answers at all (a dead ring is not
        a version roll), ValueError on a wrong-family domain, and stays
        loud on a wrong-protocol peer."""
        from graft_client import (FP_TYPE_MARKER_KEY, marker_index_type,
                                  require_fp_family)
        last = None
        answered = False
        for host, stub in self._stubs.items():
            try:
                m = stub.meta()
            except ProtocolError:
                raise
            except Exception as e:
                last = e
                continue
            answered = True
            if version is not None and m["served_version"] != version:
                continue  # mid-roll host: try one serving the batch's version
            at = m["served_version"] if version is None else version
            got = m["index_type"]
            if got == "none":  # pre-field spec: the in-data marker
                got = None
                for h2 in self._replicas(
                        shard_index(FP_TYPE_MARKER_KEY, self.num_shards)):
                    try:
                        mv, recs = self._stubs[h2].multi_get_versioned(
                            [FP_TYPE_MARKER_KEY])
                    except VersionStraddleError as e:
                        last = e  # mid-roll marker read: next replica
                        continue
                    except ProtocolError:
                        raise
                    except Exception as e:
                        last = e
                        continue
                    if mv != at:
                        continue  # republish mid-gate: never mix versions
                    got = marker_index_type(recs[0])
                    break
                if got is None:
                    return None  # could not certify at `at`: re-probe
            require_fp_family(got, self.domain)
            return at
        if not answered:
            # every host's meta failed: a DEAD ring, not a mid-roll —
            # name it (the retry loop's "mixed versions" message would
            # send an operator chasing a version roll that does not exist)
            raise ConnectionError(
                "no ring host answered the family gate "
                f"(tried: {', '.join(sorted(self._stubs))})") from last
        return None  # hosts answered but none serves `version`: re-probe

    def multi_get(self, keys):
        """Values aligned with `keys` (None = absent), each shard's keys
        answered by one replica, failing over host by host; raises only
        when EVERY replica of some shard fails."""
        out = [None] * len(keys)
        pending = {}
        for i, k in enumerate(keys):
            pending.setdefault(shard_index(k, self.num_shards), []).append((k, i))
        for shard, group in pending.items():
            last = None
            answered = False
            for host in self._replicas(shard):
                try:
                    vals = self._stubs[host].multi_get([k for k, _ in group])
                    for (k, i), v in zip(group, vals):
                        out[i] = v
                    answered = True
                    break
                except VersionStraddleError as e:
                    last = e  # mid-roll host: next replica, never loud
                except ProtocolError:
                    raise  # wrong service: loud, not failover
                except Exception as e:
                    last = e  # next replica
            if not answered:
                raise ConnectionError(
                    f"all replicas of shard {shard} failed "
                    f"(tried: {', '.join(sorted(self._replicas(shard)))})") from last
        return out


def main(argv):
    if len(argv) < 4 or (argv[3] in ("get", "multi-get", "overlap") and len(argv) < 5):
        print(__doc__, file=sys.stderr)
        return 2
    conf, domain, cmd = argv[1], argv[2], argv[3]
    with GraftRing.from_conf(conf, domain) as ring:
        if cmd == "get":
            v = ring.get(argv[4].encode("utf-8"))
            print("(absent)" if v is None else v.decode("utf-8", errors="backslashreplace"))
        elif cmd == "multi-get":
            for k, v in zip(argv[4:], ring.multi_get([a.encode("utf-8") for a in argv[4:]])):
                val = "(absent)" if v is None else v.decode("utf-8", errors="backslashreplace")
                print(f"{k}\t{val}")
        elif cmd == "scan":
            lo = argv[4].encode("utf-8") if len(argv) > 4 else None
            hi = argv[5].encode("utf-8") if len(argv) > 5 else None
            for k, v in ring.scan(from_key=lo, to_key=hi):
                key = k.decode("utf-8", errors="backslashreplace")
                val = "(null)" if v is None else v.decode("utf-8", errors="backslashreplace")
                print(f"{key}\t{val}")
        elif cmd == "overlap":
            for hits in ring.overlapping_all(argv[4:]):
                print(" ".join(str(i) for i in hits) if hits else "(clean)")
        else:
            print(f"unknown command {cmd}", file=sys.stderr)
            return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
