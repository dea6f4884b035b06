#!/usr/bin/env python3
"""Dependency-free Python client for the graft serving protocol.

The cross-language twin of the JVM client stub
(src/main/scala/graft/store/RemoteKvReader.scala), written from the
protocol documentation in src/main/scala/graft/store/KvServer.scala:19-45
alone — the same role the reference's hand-written Python client played
(elephantdb-thrift/src/py/elephantdbclient.py:1-88, a thin wrapper over
its generated Thrift stub; here the framing is simple enough to speak
directly). Python 3.8+, standard library only.

Protocol summary (all integers big-endian):
  request  = op byte, domain (Java writeUTF: u2 length + modified UTF-8),
             op payload
  response = status byte (0 ok / 1 error: class UTF + message UTF, the
             connection stays frame-aligned), then the op's body

Ops: 1 MULTI_GET, 2 STATS, 3 REFRESH, 4 COUNT, 5 DOMAINS, 6 STATUS,
7 UPDATE_ALL, 8 RANGE, 9 METRICS, 10 META — see KvServer.scala for each
payload/body shape.

Usage as a library:

    from graft_client import GraftClient
    with GraftClient("db-host", 3578, "users") as c:
        value = c.get(b"u1")                  # bytes | None
        values = c.multi_get([b"u1", b"u2"])  # list of bytes | None
        print(c.status_all(), c.fully_loaded())

Usage as a CLI (values print as UTF-8 with backslash escapes):

    graft_client.py HOST PORT domains
    graft_client.py HOST PORT status [DOMAIN]
    graft_client.py HOST PORT get DOMAIN KEY
    graft_client.py HOST PORT count DOMAIN
    graft_client.py HOST PORT scan DOMAIN [FROM [TO]]
    graft_client.py HOST PORT update-all
    graft_client.py HOST PORT metrics
    graft_client.py HOST PORT meta DOMAIN
    graft_client.py HOST PORT overlap DOMAIN TEXT [MIN_LEN [WINDOW [MODULUS]]]
"""

import socket
import struct
import sys

# protocol bounds — MUST mirror KvServer.scala's companion constants:
# the server rejects frames past them, the client refuses to allocate
# desync-supplied lengths past them
MAX_BATCH = 1 << 20
MAX_KEY_LEN = 1 << 20
MAX_BATCH_BYTES = 64 << 20
MAX_VALUE_LEN = 256 << 20
# one RANGE response may exceed the asked page size by the server's
# duplicate-run drain (a truncated page ends between distinct keys)
MAX_RANGE_RESPONSE_RECORDS = MAX_BATCH + (1 << 20)

_OP_MULTI_GET = 1
_OP_STATS = 2
_OP_REFRESH = 3
_OP_COUNT = 4
_OP_DOMAINS = 5
_OP_STATUS = 6
_OP_UPDATE_ALL = 7
_OP_RANGE = 8
_OP_METRICS = 9
_OP_META = 10


class ProtocolError(Exception):
    """The peer spoke something that is not this protocol (or a length
    field arrived out of bounds): the connection cannot realign."""


class VersionStraddleError(ProtocolError):
    """A versioned operation kept observing different served versions
    across its frames/pages (the host is mid-publish): the CONNECTION
    is fine and the condition is transient — retry when the roll
    settles, or fail over to another replica. Subclasses ProtocolError
    so callers that treat every protocol anomaly as loud are
    unaffected; ring-level callers catch this one specifically and
    route it to the failover/re-scatter path (the JVM twin throws
    IllegalStateException there, which RingClient's generic failover
    already absorbs — this class is the python parity seam)."""


class RemoteServingError(Exception):
    """An execution failure reported by the serving side (unknown
    domain, wrong-host probe, closed reader) — the remote twin of the
    exception the in-process reader would have thrown. The connection
    stays usable."""

    def __init__(self, host, remote_class, message):
        super().__init__(f"{host}: {remote_class}: {message}")
        self.host = host
        self.remote_class = remote_class
        self.remote_message = message


def _encode_modified_utf8(s):
    """Java DataOutput.writeUTF body: CESU-8 with NUL as C0 80."""
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if 0x01 <= cp <= 0x7F:
            out.append(cp)
        elif cp == 0x00 or cp <= 0x7FF:
            out.append(0xC0 | (cp >> 6))
            out.append(0x80 | (cp & 0x3F))
        elif cp <= 0xFFFF:
            out.append(0xE0 | (cp >> 12))
            out.append(0x80 | ((cp >> 6) & 0x3F))
            out.append(0x80 | (cp & 0x3F))
        else:  # supplementary: each UTF-16 surrogate as its own 3 bytes
            cp -= 0x10000
            for half in (0xD800 | (cp >> 10), 0xDC00 | (cp & 0x3FF)):
                out.append(0xE0 | (half >> 12))
                out.append(0x80 | ((half >> 6) & 0x3F))
                out.append(0x80 | (half & 0x3F))
    return bytes(out)


def _decode_modified_utf8(b):
    """Inverse of _encode_modified_utf8 (lenient only in pairing the
    surrogates CESU-8 produces; anything else malformed raises)."""
    units = []
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c & 0x80 == 0:
            units.append(c)
            i += 1
        elif c & 0xE0 == 0xC0:
            if i + 1 >= n or b[i + 1] & 0xC0 != 0x80:
                raise ProtocolError("malformed modified UTF-8")
            units.append(((c & 0x1F) << 6) | (b[i + 1] & 0x3F))
            i += 2
        elif c & 0xF0 == 0xE0:
            if i + 2 >= n or b[i + 1] & 0xC0 != 0x80 or b[i + 2] & 0xC0 != 0x80:
                raise ProtocolError("malformed modified UTF-8")
            units.append(((c & 0x0F) << 12) | ((b[i + 1] & 0x3F) << 6) | (b[i + 2] & 0x3F))
            i += 3
        else:
            raise ProtocolError("malformed modified UTF-8")
    # pair CESU-8 surrogates back into codepoints
    out = []
    j = 0
    while j < len(units):
        u = units[j]
        if 0xD800 <= u <= 0xDBFF and j + 1 < len(units) and 0xDC00 <= units[j + 1] <= 0xDFFF:
            out.append(0x10000 + ((u - 0xD800) << 10) + (units[j + 1] - 0xDC00))
            j += 2
        else:
            out.append(u)
            j += 1
    return "".join(map(chr, out))


class _Conn:
    """One socket with DataInput/DataOutput-shaped helpers."""

    def __init__(self, host, port, connect_timeout, read_timeout):
        self.sock = socket.create_connection((host, port), timeout=connect_timeout)
        self.sock.settimeout(read_timeout)
        self._rbuf = self.sock.makefile("rb")
        self._wbuf = bytearray()

    # -- writes (buffered; flush() sends the frame in one go) --
    def write_byte(self, v):
        self._wbuf.append(v & 0xFF)

    def write_int(self, v):
        self._wbuf.extend(struct.pack(">i", v))

    def write_bytes(self, b):
        self._wbuf.extend(b)

    def write_utf(self, s):
        body = _encode_modified_utf8(s)
        if len(body) > 0xFFFF:
            raise ValueError("writeUTF string too long")
        self._wbuf.extend(struct.pack(">H", len(body)))
        self._wbuf.extend(body)

    def flush(self):
        self.sock.sendall(bytes(self._wbuf))
        self._wbuf.clear()

    # -- reads --
    def read_fully(self, n):
        b = self._rbuf.read(n)
        if b is None or len(b) != n:
            raise ProtocolError(f"connection closed mid-frame (wanted {n} bytes)")
        return b

    def read_byte(self):
        return self.read_fully(1)[0]

    def read_int(self):
        return struct.unpack(">i", self.read_fully(4))[0]

    def read_long(self):
        return struct.unpack(">q", self.read_fully(8))[0]

    def read_bool(self):
        return self.read_byte() != 0

    def read_utf(self):
        n = struct.unpack(">H", self.read_fully(2))[0]
        return _decode_modified_utf8(self.read_fully(n))

    def close(self):
        try:
            self._rbuf.close()
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


class GraftClient:
    """Client stub for one domain on one serving host.

    One persistent connection, one framed round trip per call (a failed
    call discards the connection; the next call dials fresh — a bounced
    server heals without client restarts). Not thread-safe; use one
    client per thread.
    """

    def __init__(self, host, port, domain="", connect_timeout=5.0, read_timeout=60.0):
        self.host = host
        self.port = port
        self.domain = domain
        self._connect_timeout = connect_timeout
        self._read_timeout = read_timeout
        self._conn = None
        self._closed = False

    # -- lifecycle --
    def close(self):
        self._closed = True
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- protocol plumbing --
    def _round_trip(self, op, domain, write_payload, read_body):
        if self._closed:
            raise ValueError("client is closed")
        conn = self._conn
        if conn is None:
            conn = _Conn(self.host, self.port, self._connect_timeout, self._read_timeout)
        self._conn = None  # in flight: a failure below must not pool it
        try:
            conn.write_byte(op)
            conn.write_utf(domain)
            write_payload(conn)
            conn.flush()
            status = conn.read_byte()
            if status == 1:
                # error frame: the stream is aligned, but match the JVM
                # client's choice — correctness over a saved dial
                cls = conn.read_utf()
                msg = conn.read_utf()
                conn.close()
                raise RemoteServingError(f"{self.host}:{self.port}", cls, msg)
            if status != 0:
                raise ProtocolError(f"status byte {status}")
            body = read_body(conn)
            self._conn = conn  # clean round trip: keep it
            return body
        except RemoteServingError:
            raise
        except BaseException:
            conn.close()
            raise

    # -- ops --
    def multi_get(self, keys):
        """Batched lookup. Returns one entry per key, aligned:
        None = absent, bytes = value (b"" is a real empty value), and
        present-with-null-value surfaces as None too (like the JVM
        get(); use multi_get_records for the distinction)."""
        return [None if r is _NULL_VALUE else r for r in self.multi_get_records(keys)]

    def multi_get_records(self, keys):
        """multi_get keeping the present-null distinction: absent keys
        give None, present-null keys give the NULL_VALUE sentinel.

        Batches past the frame bounds split into several frames; accept
        an attempt only when every frame certifies ONE serving version
        (vLo == vHi shared across frames) — never a torn cross-version
        mix, same contract as the JVM client's chunkedMultiGet. A
        SINGLE-frame answer is accepted regardless of a mid-frame swap
        (JVM parity: the stamps exist for chunked certification;
        multi_get_versioned is the stricter variant)."""
        self._validate_keys(keys)
        for _ in range(3):
            framed = self._framed_attempt(keys)
            versions = {v for lo, hi, _ in framed for v in (lo, hi)}
            if len(framed) == 1 or len(versions) == 1:
                return [r for _, _, rs in framed for r in rs]
        raise VersionStraddleError(
            f"chunked multi_get of {len(keys)} keys kept straddling version swaps")

    @staticmethod
    def _validate_keys(keys):
        for k in keys:
            if not isinstance(k, (bytes, bytearray)):
                raise TypeError("keys must be bytes")
            if len(k) > MAX_KEY_LEN:
                raise ValueError(f"key of {len(k)} bytes exceeds protocol bound")

    def _framed_attempt(self, keys):
        """One multi_get attempt as a list of (v_lo, v_hi, records)
        frames — a single frame when the batch fits the protocol bounds,
        chunked otherwise. The ONE framing definition both acceptance
        rules (multi_get_records, multi_get_versioned) share."""
        if len(keys) <= MAX_BATCH and sum(len(k) for k in keys) <= MAX_BATCH_BYTES:
            return [self._multi_get_frame(keys)]
        return [self._multi_get_frame(c) for c in self._chunks(keys)]

    @staticmethod
    def _chunks(keys):
        run, run_bytes = [], 0
        for k in keys:
            if run and (len(run) >= MAX_BATCH or run_bytes + len(k) > MAX_BATCH_BYTES):
                yield run
                run, run_bytes = [], 0
            run.append(k)
            run_bytes += len(k)
        if run:
            yield run

    def _multi_get_frame(self, keys):
        def payload(conn):
            conn.write_int(len(keys))
            for k in keys:
                conn.write_int(len(k))
                conn.write_bytes(k)

        def body(conn):
            v_lo = conn.read_long()
            v_hi = conn.read_long()
            records = []
            for _ in keys:
                tag = conn.read_byte()
                if tag == 0:
                    records.append(None)
                elif tag == 1:
                    n = conn.read_int()
                    if n < 0 or n > MAX_VALUE_LEN:
                        raise ProtocolError(f"value length {n} out of range")
                    records.append(conn.read_fully(n))
                elif tag == 2:
                    records.append(_NULL_VALUE)
                else:
                    raise ProtocolError(f"record tag {tag}")
            return v_lo, v_hi, records

        return self._round_trip(_OP_MULTI_GET, self.domain, payload, body)

    def get(self, key):
        """Single lookup: bytes, or None for absent / present-null."""
        return self.multi_get([key])[0]

    def range_page(self, from_key=None, to_key=None,
                   from_inclusive=True, to_inclusive=True, max_records=4096,
                   shards=None):
        """One bounded, globally key-ordered page of the domain's key
        range. Returns (v_lo, v_hi, records, truncated) where records is
        a list of (key, value) — value None means present-with-null —
        and truncated means more records remain past the last one
        (resume with from_key=last_key, from_inclusive=False). `shards`
        (iterable of ints) restricts the page to those shard indexes; a
        filtered shard the host does not serve is a loud error."""
        if not 0 < max_records <= MAX_BATCH:
            raise ValueError(f"max_records {max_records} out of protocol range")

        def payload(conn):
            # fromBound, fromInclusive, toBound, toInclusive, maxRecords,
            # shard filter (count + sorted indexes, 0 = all hosted)
            def bound(b):
                if b is None:
                    conn.write_byte(0)
                else:
                    conn.write_byte(1)
                    conn.write_int(len(b))
                    conn.write_bytes(b)
            bound(from_key)
            conn.write_byte(1 if from_inclusive else 0)
            bound(to_key)
            conn.write_byte(1 if to_inclusive else 0)
            conn.write_int(max_records)
            # `shards is None` = all hosted; an EMPTY filter is a caller
            # bug and must not silently invert into "everything" (the
            # JVM client rejects it the same way)
            if shards is None:
                ss = []
            else:
                ss = sorted(set(shards))
                if not ss:
                    raise ValueError("shards filter must be non-empty (or None)")
            conn.write_int(len(ss))
            for s in ss:
                conn.write_int(s)

        def body(conn):
            v_lo = conn.read_long()
            v_hi = conn.read_long()
            n = conn.read_int()
            if n < 0 or n > MAX_RANGE_RESPONSE_RECORDS:
                raise ProtocolError(f"range page size {n} out of range")
            records = []
            for _ in range(n):
                k_len = conn.read_int()
                if k_len < 0 or k_len > MAX_KEY_LEN:
                    raise ProtocolError(f"range key length {k_len} out of range")
                k = conn.read_fully(k_len)
                tag = conn.read_byte()
                if tag == 1:
                    v_len = conn.read_int()
                    if v_len < 0 or v_len > MAX_VALUE_LEN:
                        raise ProtocolError(f"range value length {v_len} out of range")
                    records.append((k, conn.read_fully(v_len)))
                elif tag == 2:
                    records.append((k, None))
                else:
                    raise ProtocolError(f"range value tag {tag}")
            return v_lo, v_hi, records, conn.read_bool()

        return self._round_trip(_OP_RANGE, self.domain, payload, body)

    def scan(self, from_key=None, to_key=None,
             from_inclusive=True, to_inclusive=True, page_records=4096):
        """Generator over the whole key range, paging under the hood.
        Every page must certify ONE unchanged serving version (like the
        JVM client's rangeScan) — a hot-swap mid-scan raises."""
        v_lo, v_hi, records, truncated = self.range_page(
            from_key, to_key, from_inclusive, to_inclusive, page_records)
        if v_lo != v_hi:
            raise VersionStraddleError(
                f"range page straddled a version swap ({v_lo}->{v_hi})")
        version = v_lo
        while True:
            yield from records
            if not truncated:
                return
            if not records:
                # an empty-but-truncated page has no resume key; a
                # conforming server never sends one — name the violation
                # instead of an IndexError on records[-1]
                raise ProtocolError(
                    "empty truncated range page — the scan cannot make progress")
            last_key = records[-1][0]
            v_lo, v_hi, records, truncated = self.range_page(
                last_key, to_key, False, to_inclusive, page_records)
            if v_lo != v_hi or v_lo != version:
                raise VersionStraddleError(
                    f"range scan straddled a version swap ({version}->{v_hi})")

    def stats(self):
        """(num_shards, served_version, can_refresh) for this domain."""
        return self._round_trip(
            _OP_STATS, self.domain, lambda c: None,
            lambda c: (c.read_int(), c.read_long(), c.read_bool()))

    def served_version(self):
        return self.stats()[1]

    def refresh(self):
        """Ask the host to hot-swap this domain to its newest publish
        (the reference's `update` RPC). True = a swap happened."""
        return self._round_trip(
            _OP_REFRESH, self.domain, lambda c: None, lambda c: c.read_bool())

    def count(self):
        """Total pairs this host serves for the domain."""
        return self._round_trip(
            _OP_COUNT, self.domain, lambda c: None, lambda c: c.read_long())

    def domains(self):
        """The host's domain census (reference `getDomains`)."""
        return self._round_trip(
            _OP_DOMAINS, "", lambda c: None,
            lambda c: [c.read_utf() for _ in range(c.read_int())])

    @staticmethod
    def _read_statuses(conn):
        return [
            {
                "name": conn.read_utf(),
                "status": conn.read_utf(),
                "served_version": conn.read_long(),
                "latest_published": conn.read_long(),
                "updating": conn.read_bool(),
            }
            for _ in range(conn.read_int())
        ]

    def status(self):
        """This domain's serving status dict (reference
        `getDomainStatus`/`getDomainMetaData`)."""
        return self._round_trip(
            _OP_STATUS, self.domain, lambda c: None,
            lambda c: self._read_statuses(c)[0])

    def status_all(self):
        """The whole host's census (reference `getStatus`)."""
        return self._round_trip(
            _OP_STATUS, "", lambda c: None, self._read_statuses)

    def fully_loaded(self):
        """Every domain serves a published version (reference
        `isFullyLoaded`) — 'can I point traffic at this host?'."""
        return all(d["status"] == "ready" for d in self.status_all())

    def metrics(self):
        """The host's monotonic op counters as a dict (never reset
        server-side; rates are the scraper's delta)."""
        return self._round_trip(
            _OP_METRICS, "", lambda c: None,
            lambda c: {c.read_utf(): c.read_long() for _ in range(c.read_int())})

    def update_all(self):
        """Host-wide update (reference `updateAll`): sweep for new
        domains, refresh every served one. Returns (swapped, failed)."""
        return self._round_trip(
            _OP_UPDATE_ALL, "", lambda c: None,
            lambda c: (c.read_int(), c.read_int()))

    def meta(self):
        """This domain's metadata (reference `getDomainMetaData`): the
        spec's routing-relevant fields, served/latest versions, and the
        shards THIS host carries with record counts (fewer than
        num_shards is the normal replicated-ring shape)."""
        def body(conn):
            num_shards = conn.read_int()
            served = conn.read_long()
            latest = conn.read_long()
            fmt = conn.read_utf()
            scheme = conn.read_utf()
            indexer = conn.read_utf()
            index_type = conn.read_utf()
            n = conn.read_int()
            if num_shards < 1 or n < 0 or n > num_shards:
                raise ProtocolError(f"meta shard census {n} of {num_shards} out of range")
            shards = [(conn.read_int(), conn.read_long()) for _ in range(n)]
            return {
                "num_shards": num_shards,
                "served_version": served,
                "latest_published": latest,
                "persistence_format": fmt,
                "shard_scheme": scheme,
                "indexer": indexer,
                "index_type": index_type,
                "shards": shards,
            }
        return self._round_trip(_OP_META, self.domain, lambda c: None, body)

    def overlapping(self, text, min_len=64, window=8, modulus=16):
        """Indexed corpus doc ids sharing an exact >= min_len-codepoint
        run with `text`, ascending — the admission-time contamination
        probe against a published fp-anchor index domain (the Python
        twin of the JVM OverlapReader): one local anchor pass, one
        batched multi_get over the fingerprint keys, no verify stage
        (a fingerprint hit IS a shared run). min_len/window/modulus MUST
        match the index build's — they define the key bytes themselves.

        Fails loud on a wrong-family domain (the JVM gate's twin): a
        band/phash/sem index or plain KV domain would otherwise read as
        silently '(clean)' for genuinely contaminated text. The gate
        mirrors the JVM's authority order — the spec's index_type (via
        META: works on a localized shard subset that may not host the
        marker record's shard) first, the in-data m:index-type marker as
        the pre-field fallback — and the verdict is cached per SERVED
        VERSION, observed from the probe frames' own version stamps (the
        JVM caches per version + token mtime): a republish the server
        swaps in re-runs the gate before any value is parsed, so a
        long-lived client can never keep probing a domain republished as
        a different family on a stale verdict — and the steady state
        pays ZERO extra round trips."""
        return self.overlapping_all([text], min_len, window, modulus)[0]

    def overlapping_all(self, texts, min_len=64, window=8, modulus=16):
        """Batched admission — overlapping() for a STREAM of documents in
        ONE index round (the JVM OverlapReader.overlappingAll twin): all
        docs' fingerprints dedup across the batch (shared boilerplate
        fingerprints probe once, not once per carrier) into a single
        versioned multi_get, whose one version stamp certifies the WHOLE
        batch — every answer reflects the same served version. Answers
        align with the input; each is exactly what overlapping() would
        return for that text."""
        per_doc, uniq = batch_fingerprints(texts, min_len, window, modulus)
        if not uniq:
            # still fail loud on a wrong-family domain: a client that only
            # ever probes short/anchor-free texts must not read as
            # silently clean forever — gate once (meta round trip) if this
            # client has never gated, then the cached verdict carries
            # (no records are parsed here, so any served version's type
            # verdict is safe to cache)
            if not hasattr(self, "_fp_gate_version"):
                for _ in range(3):
                    m = self.meta()
                    if self._fp_gate_check(m, m["served_version"]):
                        self._fp_gate_version = m["served_version"]
                        break
                else:
                    raise ProtocolError(
                        "overlapping: served version kept moving under the "
                        "family gate — retries exhausted")
            # per_doc, not texts: a generator input is exhausted by now
            return [[] for _ in per_doc]
        # Gate and records must observe the SAME served version: meta()
        # is a separate round trip, so a republish landing between the
        # probe and the gate could validate version N+1's family while
        # the parsed records are version N's — on disagreement, re-probe
        # (never parse under a verdict for a different version). The
        # verdict caches per certified version, so the steady state pays
        # zero extra round trips.
        for _ in range(3):
            version, records = self.multi_get_versioned(uniq)
            if getattr(self, "_fp_gate_version", None) == version:
                break
            m = self.meta()
            if m["served_version"] == version and self._fp_gate_check(m, version):
                self._fp_gate_version = version
                break
        else:
            raise ProtocolError(
                "overlapping: served version kept moving between the probe "
                "and the family gate — retries exhausted")
        return resolve_overlaps(per_doc, uniq, records)

    def _fp_gate_check(self, meta, version):
        """The fp-anchor family gate body (meta index_type authority,
        in-data marker fallback for pre-field specs). Raises ValueError
        on a wrong-family domain; returns False when the verdict could
        not be certified against `version` (the marker read observed a
        different served version — the caller re-probes so gate and
        records describe ONE snapshot); True when certified clean."""
        got = meta["index_type"]
        if got == "none":  # pre-field spec: fall back to the marker
            mv, recs = self.multi_get_versioned([FP_TYPE_MARKER_KEY])
            if mv != version:
                return False  # republish mid-gate: re-probe, never mix
            got = marker_index_type(recs[0])
        require_fp_family(got, self.domain)
        return True

    def multi_get_versioned(self, keys):
        """multi_get that also returns THE serving version every frame
        certified — retried (even for a single frame) until an attempt's
        stamps agree, so the caller gets (version, aligned records) from
        one consistent snapshot."""
        self._validate_keys(keys)
        for _ in range(3):
            framed = self._framed_attempt(keys)
            versions = {v for lo, hi, _ in framed for v in (lo, hi)}
            if len(versions) == 1:
                return versions.pop(), [r for _, _, rs in framed for r in rs]
        raise VersionStraddleError(
            f"versioned multi_get of {len(keys)} keys kept straddling version swaps")


# ---------------------------------------------------------------- overlap

# The anchored-fingerprint kernel of the fp-anchor index family
# (graft.core.AnchorMath + Dedup.fpIndexKv), replicated in pure Python:
# Python 3 str indexes by CODEPOINT (like Spark substring and the JVM
# kernel's codePoints array), so positions line up exactly.
_ANCHOR_PRIME = 1000000007
_ANCHOR_BASE = 31


def anchor_fingerprints(text, min_len=64, window=8, modulus=16):
    """The text's fp-anchor index keys: 16 raw md5 bytes per anchored
    min_len-codepoint run, distinct, in first-occurrence order. Position
    i (1-based) anchors iff the rolling hash of the window starting
    there is 0 mod modulus; parameters MUST match the index build's
    (they shape the key bytes themselves)."""
    import hashlib
    if window < 1 or window > min_len:
        raise ValueError(f"window {window} must be in [1, min_len={min_len}]")
    if modulus < 1:
        raise ValueError(f"modulus must be >= 1, got {modulus}")
    n = len(text)
    if n < min_len:
        return []
    cps = [ord(c) for c in text]
    max_pos = n - (min_len - 1)  # 1-based runway bound
    out, seen = [], set()
    pow_w = pow(_ANCHOR_BASE, window - 1, _ANCHOR_PRIME)
    h = 0
    for i in range(window):
        h = (h * _ANCHOR_BASE + cps[i]) % _ANCHOR_PRIME
    pos = 0  # 0-based window start
    while True:
        if h % modulus == 0 and pos + 1 <= max_pos:
            digest = hashlib.md5(
                text[pos:pos + min_len].encode("utf-8")).digest()
            if digest not in seen:
                seen.add(digest)
                out.append(digest)
        if pos + window >= n:
            break
        h = ((h - cps[pos] * pow_w) % _ANCHOR_PRIME * _ANCHOR_BASE
             + cps[pos + window]) % _ANCHOR_PRIME
        pos += 1
    return out


# The fp-anchor family gate's shared verdict pieces — ONE definition for
# the single-server and ring clients (like batch_fingerprints /
# resolve_overlaps: a gate rule change must not leave one client
# enforcing the old rule).
FP_TYPE_MARKER_KEY = b"m:index-type"


def marker_index_type(marker):
    """The in-data marker record decoded to an index-type verdict
    ('<none>' for an absent/null marker — pre-marker build)."""
    return ("<none>" if marker is None or marker is _NULL_VALUE
            else marker.decode("utf-8", errors="backslashreplace"))


def require_fp_family(got, domain):
    """Raise ValueError unless the verdict names the fp-anchor family —
    a wrong-family probe must never read as silently '(clean)'."""
    if got != "fp-anchor":
        raise ValueError(
            f"overlapping: domain '{domain}' carries index-type "
            f"{got}, not 'fp-anchor' — not an fpIndexKv domain")


def batch_fingerprints(texts, min_len=64, window=8, modulus=16):
    """Each text's anchored fingerprints plus the batch-deduped probe
    list (first-occurrence order): shared boilerplate fingerprints probe
    ONCE per batch, not once per carrier. Shared by the single-server
    and ring clients' overlapping_all so the two admissions cannot
    drift. Returns (per_doc, uniq)."""
    per_doc = [anchor_fingerprints(t, min_len, window, modulus)
               for t in texts]
    uniq, seen = [], set()
    for fps in per_doc:
        for k in fps:
            if k not in seen:
                seen.add(k)
                uniq.append(k)
    return per_doc, uniq


def resolve_overlaps(per_doc, uniq, records):
    """Align a batched fingerprint probe's RECORDS (one per `uniq` key,
    from one certified served version) back onto each input doc: decode
    membership cells (a cap tombstone — graft.core.IndexTombstone —
    reads as a miss: publish-dropped boilerplate), map each doc's
    fingerprints through the hits, ascending distinct ids per doc.
    Shared by the single-server and ring clients."""
    hits = {}
    for k, v in zip(uniq, records):
        if v is None or v is _NULL_VALUE:
            continue
        sval = v.decode("utf-8")
        if sval == "!capped":
            continue
        hits[k] = [int(part) for part in sval.split(",")]
    return [sorted({i for k in fps for i in hits.get(k, ())})
            for fps in per_doc]


class _NullValue:
    """Sentinel for a key that is PRESENT with a null value — distinct
    from None (= absent), mirroring the JVM Some(null)."""

    def __repr__(self):
        return "NULL_VALUE"


_NULL_VALUE = _NullValue()
NULL_VALUE = _NULL_VALUE


def _print_value(v):
    if v is None:
        print("(absent)")
    else:
        print(v.decode("utf-8", errors="backslashreplace"))


def main(argv):
    if len(argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    host, port, cmd = argv[1], int(argv[2]), argv[3]
    args = argv[4:]
    if cmd == "domains":
        with GraftClient(host, port) as c:
            for d in c.domains():
                print(d)
    elif cmd == "status":
        with GraftClient(host, port, args[0] if args else "") as c:
            entries = [c.status()] if args else c.status_all()
            for d in entries:
                print("{name} {status} served={served_version} "
                      "latest={latest_published} updating={updating}".format(**d))
    elif cmd == "get":
        with GraftClient(host, port, args[0]) as c:
            _print_value(c.get(args[1].encode("utf-8")))
    elif cmd == "count":
        with GraftClient(host, port, args[0]) as c:
            print(c.count())
    elif cmd == "scan":
        with GraftClient(host, port, args[0]) as c:
            lo = args[1].encode("utf-8") if len(args) > 1 else None
            hi = args[2].encode("utf-8") if len(args) > 2 else None
            for k, v in c.scan(from_key=lo, to_key=hi):
                key = k.decode("utf-8", errors="backslashreplace")
                val = "(null)" if v is None else v.decode("utf-8", errors="backslashreplace")
                print(f"{key}\t{val}")
    elif cmd == "update-all":
        with GraftClient(host, port) as c:
            swapped, failed = c.update_all()
            print(f"swapped={swapped} failed={failed}")
    elif cmd == "meta":
        with GraftClient(host, port, args[0]) as c:
            m = c.meta()
            print("num_shards={num_shards} served={served_version} "
                  "latest={latest_published} format={persistence_format} "
                  "scheme={shard_scheme} indexer={indexer} "
                  "index_type={index_type}".format(**m))
            for shard, records in m["shards"]:
                print(f"shard={shard}\trecords={records}")
    elif cmd == "overlap":
        # overlap DOMAIN TEXT [MIN_LEN [WINDOW [MODULUS]]] — the geometry
        # MUST match the index build's (it defines the key bytes)
        with GraftClient(host, port, args[0]) as c:
            min_len = int(args[2]) if len(args) > 2 else 64
            window = int(args[3]) if len(args) > 3 else 8
            modulus = int(args[4]) if len(args) > 4 else 16
            hits = c.overlapping(args[1], min_len, window, modulus)
            print(" ".join(str(i) for i in hits) if hits else "(clean)")
    elif cmd == "metrics":
        with GraftClient(host, port) as c:
            for name, value in sorted(c.metrics().items()):
                print(f"{name}\t{value}")
    else:
        print(f"unknown command {cmd}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
