"""Vectorized 64-bit hash families and key derivation.

Re-expresses the reference's hash utilities (``/root/reference/src/hashutil.h``)
as NumPy ``uint64`` kernels.  Unlike the reference — which seeds every filter
instance from ``std::random_device`` (hashutil.h:62-71, 106-110) — every family
here takes an **explicit seed**, because distributed merge of partial filters
requires all partials of one logical filter to share hash parameters
(SURVEY.md §4.3.1).

Families:
- ``mix_split``   — SimpleMixSplit, murmur64 finalizer of (key + seed)
                    (hashutil.h:102-146); the default, used by every
                    ``bulk-insert-and-query`` run in the reference.
- ``two_independent_multiply_shift`` — 128-bit multiply-shift
                    (hashutil.h:57-99), value-exact via 32-bit limb arithmetic.
- ``splitmix64``  — the reference benchmark's deterministic key generator
                    (benchmarks/random.h:28-41); used for synthetic corpora and
                    out-of-set probe streams.
- ``sha256_u64``  — sha256(content) → first 8 digest bytes as uint64 (the
                    engine's canonical item key per BASELINE.json input_hint).
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64

_M1 = U64(0xFF51AFD7ED558CCD)
_M2 = U64(0xC4CEB9FE1A85EC53)
_S33 = U64(33)

# Fixed default seed for engine-level determinism; callers override per filter.
DEFAULT_SEED = 0x9E3779B97F4A7C15


def _as_u64(keys) -> np.ndarray:
    a = np.asarray(keys)
    if a.dtype != np.uint64:
        a = a.astype(np.uint64, copy=False)
    return a


def murmur64(h: np.ndarray) -> np.ndarray:
    """Murmur3 fmix64 finalizer, vectorized (hashutil.h:112-120)."""
    h = _as_u64(h).copy()
    h ^= h >> _S33
    h *= _M1
    h ^= h >> _S33
    h *= _M2
    h ^= h >> _S33
    return h


def mix_split(keys, seed: int = DEFAULT_SEED) -> np.ndarray:
    """SimpleMixSplit: murmur64(key + seed) (hashutil.h:102-146)."""
    return murmur64(_as_u64(keys) + U64(seed & 0xFFFFFFFFFFFFFFFF))


def two_independent_multiply_shift(keys, mul: int, add: int) -> np.ndarray:
    """(add + mul * key) >> 64 with 128-bit mul/add (hashutil.h:57-99).

    ``mul``/``add`` are 128-bit parameters (ints).  Exact 128-bit identity
    computed in uint64 (matches the reference's unsigned __int128):

        result = (m_hi*k + a_hi + hi64(m_lo*k) + carry(lo64(m_lo*k)+a_lo))
                 mod 2^64

    ``hi64`` of the scalar-by-vector product uses the 4-multiply 32-bit-limb
    schoolbook; everything else is wrapping uint64 with in-place updates (the
    old full-column formulation allocated ~30 temporaries per call and was
    allocation-bound at ~4.5 M keys/s; this form runs >10x faster)."""
    k = _as_u64(keys)
    mask = U64(0xFFFFFFFF)
    m64 = (1 << 64) - 1
    m_lo, m_hi = U64(mul & m64), U64((mul >> 64) & m64)
    a_lo, a_hi = U64(add & m64), U64((add >> 64) & m64)
    b_lo, b_hi = m_lo & mask, m_lo >> U64(32)
    k_lo = k & mask
    k_hi = k >> U64(32)
    # hi64(m_lo * k): t = k_lo*b_lo; w = k_hi*b_lo + (t>>32);
    # x = k_lo*b_hi + (w&mask); hi = k_hi*b_hi + (w>>32) + (x>>32)
    # (no column exceeds 2^64-1: (2^32-1)^2 + 2*(2^32-1) = 2^64-1)
    t = k_lo * b_lo
    t >>= U64(32)
    w = k_hi * b_lo
    w += t
    x = k_lo * b_hi
    x += w & mask
    hi = k_hi * b_hi
    w >>= U64(32)
    hi += w
    x >>= U64(32)
    hi += x
    # carry of lo64(m_lo*k) + a_lo (wrapping add: carry iff sum < addend)
    lo = m_lo * k                # wrapping low 64 bits of the product
    lo += a_lo
    hi += lo < a_lo
    # top limb: m_hi*k + a_hi (both wrap into the >>64 result)
    hi += m_hi * k
    hi += a_hi
    return hi


def tims_params(seed: int) -> tuple[int, int]:
    """Deterministic 128-bit (multiply, add) for TwoIndependentMultiplyShift.

    The reference draws them from ``std::random_device`` per instance
    (hashutil.h:62-71); the engine derives them from the filter seed via
    splitmix64 so distributed partials share parameters (SURVEY.md §4.3.1).
    """
    w = splitmix64(4, seed=seed ^ 0x7F4A7C15)
    mul = (int(w[0]) << 64) | int(w[1])
    add = (int(w[2]) << 64) | int(w[3])
    return mul, add


def universal_multiply_shift(keys, mul: int) -> np.ndarray:
    """h = mul * key with an odd 64-bit multiplier (hashutil.h:155-169).

    Dietzfelbinger et al.: almost-universal, but only the HIGH-order bits
    are good — restrict by shifting right, never by masking low bits."""
    return _as_u64(keys) * U64(mul | 1)


def tabulation_tables(seed: int) -> np.ndarray:
    """(8, 256) uint64 tables for SimpleTabulation, derived from ``seed``
    (the reference fills them from std::random_device, hashutil.h:173-187)."""
    return splitmix64(8 * 256, seed=seed ^ 0x7AB1E5).reshape(8, 256)


def simple_tabulation(keys, tables: np.ndarray) -> np.ndarray:
    """XOR of one table lookup per key byte (hashutil.h:189-196),
    vectorized as eight gathers."""
    k = _as_u64(keys)
    out = np.zeros(len(k), dtype=np.uint64)
    for i in range(8):
        byte = ((k >> U64(8 * i)) & U64(0xFF)).astype(np.int64)
        out ^= tables[i][byte]
    return out


_TAB_CACHE: dict = {}


def hash_key64(keys, seed: int = DEFAULT_SEED, family: str = "mix") -> np.ndarray:
    """Seeded 64-bit item hash under a selectable family.

    ``mix``  — SimpleMixSplit (the reference benchmarks' default).
    ``tims`` — TwoIndependentMultiplyShift (the filter templates' default,
               src/cuckoofilter.h:32-35), parameters derived from ``seed``.
    ``ums``  — UniversalMultiplyShift (hashutil.h:155-169); almost-universal,
               low bits are weak — fine for pow2-variant cuckoo (i1 from the
               high half) but expect degraded tag quality.
    ``tab``  — SimpleTabulation (hashutil.h:173-196), 3-independent.
    """
    if family == "mix":
        return mix_split(keys, seed)
    if family == "tims":
        mul, add = tims_params(seed)
        return two_independent_multiply_shift(keys, mul, add)
    if family == "ums":
        return universal_multiply_shift(keys, int(splitmix64(1, seed=seed ^ 0x0115)[0]))
    if family == "tab":
        t = _TAB_CACHE.get(seed)
        if t is None:
            t = _TAB_CACHE[seed] = tabulation_tables(seed)
        return simple_tabulation(keys, t)
    raise ValueError(f"unknown hash family {family!r}")


def splitmix64(n: int, seed: int = 1) -> np.ndarray:
    """First ``n`` outputs of splitmix64(seed) (benchmarks/random.h:28-41)."""
    state = (U64(seed & 0xFFFFFFFFFFFFFFFF)
             + U64(0x9E3779B97F4A7C15) * np.arange(1, n + 1, dtype=np.uint64))
    z = state
    z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
    return z ^ (z >> U64(31))


def sha256_bytes(values) -> list[bytes]:
    """Per-row sha256 digests of a sequence of str/bytes (32 bytes each)."""
    out = []
    sha = hashlib.sha256
    for v in values:
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif v is None:
            v = b""
        out.append(sha(v).digest())
    return out


def sha256_hex(values) -> list[str]:
    """Per-row sha256 hex digests (matches DuckDB ``sha256(text)``)."""
    out = []
    sha = hashlib.sha256
    for v in values:
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif v is None:
            v = b""
        out.append(sha(v).hexdigest())
    return out


def md5_hex(values) -> list[str]:
    """Per-row MD5 hex digests (HashUtil::MD5Hash, src/hashutil.cc:746;
    matches DuckDB ``md5(text)``)."""
    out = []
    md5 = hashlib.md5
    for v in values:
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif v is None:
            v = b""
        out.append(md5(v).hexdigest())
    return out


def sha1_hex(values) -> list[str]:
    """Per-row SHA1 hex digests (HashUtil::SHA1Hash, src/hashutil.cc:760)."""
    out = []
    sha1 = hashlib.sha1
    for v in values:
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif v is None:
            v = b""
        out.append(sha1(v).hexdigest())
    return out


def sha256_u64(values) -> np.ndarray:
    """uint64 from the first 8 sha256 digest bytes (big-endian).

    The engine's item key (BASELINE.json input_hint: keyed on sha256(content)),
    standing in for the reference's raw uint64 items
    (benchmarks/bulk-insert-and-query.cc:741-746).
    """
    digests = sha256_bytes(values)
    if not digests:
        return np.empty(0, dtype=np.uint64)
    buf = b"".join(d[:8] for d in digests)
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def _byte_matrix(values) -> tuple[np.ndarray, dict]:
    """Encode rows to bytes and bucket row indices by byte length (the
    vectorize-ACROSS-strings layout: sequential hash state per word, all
    rows of one length advanced together)."""
    bufs = []
    by_len: dict = {}
    for i, v in enumerate(values):
        if isinstance(v, str):
            v = v.encode("utf-8", "surrogatepass")
        elif v is None:
            v = b""
        elif not isinstance(v, (bytes, bytearray)):
            v = bytes(v)
        bufs.append(v)
        by_len.setdefault(len(v), []).append(i)
    return bufs, by_len


def murmur2_bytes(values, seed: int = 0) -> np.ndarray:
    """Vectorized 32-bit MurmurHash2 over byte/str rows — value-identical
    to ``HashUtil::MurmurHash`` (src/hashutil.cc:600-644, little-endian
    4-byte words, m=0x5bd1e995, r=24).  Rows are bucketed by length and
    advanced word-lockstep (one NumPy op per word position across all rows
    of that length)."""
    bufs, by_len = _byte_matrix(values)
    out = np.zeros(len(bufs), dtype=np.uint32)
    m = np.uint32(0x5BD1E995)
    for L, idx in by_len.items():
        idx = np.asarray(idx)
        h = np.full(len(idx), np.uint32(seed) ^ np.uint32(L), dtype=np.uint32)
        if L:
            mat = np.frombuffer(b"".join(bufs[i] for i in idx),
                                dtype=np.uint8).reshape(len(idx), L)
            for w in range(L // 4):
                k = mat[:, 4 * w:4 * w + 4].copy().view("<u4").ravel()
                k = k * m
                k ^= k >> np.uint32(24)
                k = k * m
                h = (h * m) ^ k
            rem = L & 3
            base = (L // 4) * 4
            if rem == 3:
                h ^= mat[:, base + 2].astype(np.uint32) << np.uint32(16)
            if rem >= 2:
                h ^= mat[:, base + 1].astype(np.uint32) << np.uint32(8)
            if rem >= 1:
                h ^= mat[:, base].astype(np.uint32)
                h = h * m
        h ^= h >> np.uint32(13)
        h = h * m
        h ^= h >> np.uint32(15)
        out[idx] = h
    return out


def superfast_bytes(values) -> np.ndarray:
    """Vectorized SuperFastHash (Hsieh) over byte/str rows — value-identical
    to ``HashUtil::SuperFastHash`` (src/hashutil.cc:651-698), including the
    SIGNED-char reads in the 1- and 3-byte tails (``const char*`` on x86).
    Same length-bucketed word-lockstep layout as :func:`murmur2_bytes`."""
    bufs, by_len = _byte_matrix(values)
    out = np.zeros(len(bufs), dtype=np.uint32)
    for L, idx in by_len.items():
        idx = np.asarray(idx)
        if L == 0:
            continue                         # hash(len=0) == 0
        mat = np.frombuffer(b"".join(bufs[i] for i in idx),
                            dtype=np.uint8).reshape(len(idx), L)
        h = np.full(len(idx), L, dtype=np.uint32)
        for w in range(L // 4):
            lo = mat[:, 4 * w:4 * w + 2].copy().view("<u2").ravel() \
                .astype(np.uint32)
            hi = mat[:, 4 * w + 2:4 * w + 4].copy().view("<u2").ravel() \
                .astype(np.uint32)
            h = h + lo
            tmp = (hi << np.uint32(11)) ^ h
            h = (h << np.uint32(16)) ^ tmp
            h = h + (h >> np.uint32(11))
        rem, base = L & 3, (L // 4) * 4
        if rem == 3:
            h = h + mat[:, base:base + 2].copy().view("<u2").ravel()
            h ^= h << np.uint32(16)
            signed = mat[:, base + 2].astype(np.int8).astype(np.int32)
            h ^= (signed << 18).astype(np.uint32)
            h = h + (h >> np.uint32(11))
        elif rem == 2:
            h = h + mat[:, base:base + 2].copy().view("<u2").ravel()
            h ^= h << np.uint32(11)
            h = h + (h >> np.uint32(17))
        elif rem == 1:
            signed = mat[:, base].astype(np.int8).astype(np.int32)
            h = (h.astype(np.int64) + signed).astype(np.uint32)
            h ^= h << np.uint32(10)
            h = h + (h >> np.uint32(1))
        h ^= h << np.uint32(3)
        h = h + (h >> np.uint32(5))
        h ^= h << np.uint32(4)
        h = h + (h >> np.uint32(17))
        h ^= h << np.uint32(25)
        h = h + (h >> np.uint32(6))
        out[idx] = h
    return out


def _padded_matrix(bufs, idx, L: int, W: int) -> np.ndarray:
    """(len(idx), W) uint8 matrix of the rows, zero-padded past column L —
    padded word reads reproduce the reference's masked tail reads exactly."""
    mat = np.zeros((len(idx), W), dtype=np.uint8)
    if L:
        mat[:, :L] = np.frombuffer(b"".join(bufs[i] for i in idx),
                                   dtype=np.uint8).reshape(len(idx), L)
    return mat


def _rotl32(x: np.ndarray, k: int) -> np.ndarray:
    return (x << np.uint32(k)) | (x >> np.uint32(32 - k))


def _bob_mix(a, b, c):
    """lookup3 mix() (src/hashutil.cc:5-13), arrays in lockstep."""
    a = a - c; a ^= _rotl32(c, 4); c = c + b
    b = b - a; b ^= _rotl32(a, 6); a = a + c
    c = c - b; c ^= _rotl32(b, 8); b = b + a
    a = a - c; a ^= _rotl32(c, 16); c = c + b
    b = b - a; b ^= _rotl32(a, 19); a = a + c
    c = c - b; c ^= _rotl32(b, 4); b = b + a
    return a, b, c


def _bob_final(a, b, c):
    """lookup3 final() (src/hashutil.cc:15-24)."""
    c ^= b; c = c - _rotl32(b, 14)
    a ^= c; a = a - _rotl32(c, 11)
    b ^= a; b = b - _rotl32(a, 25)
    c ^= b; c = c - _rotl32(b, 16)
    a ^= c; a = a - _rotl32(c, 4)
    b ^= a; b = b - _rotl32(a, 14)
    c ^= b; c = c - _rotl32(b, 24)
    return a, b, c


def bobhash_bytes(values, seed: int = 0, seed2: int | None = None):
    """Vectorized Bob Jenkins lookup3 ``hashlittle`` over byte/str rows —
    value-identical to ``HashUtil::BobHash`` (src/hashutil.cc:60-317).
    With ``seed2`` set this is ``hashlittle2`` (the two-output overload,
    src/hashutil.cc:319-576): returns ``(c, b)`` — the reference's
    ``(*idx1, *idx2)`` — for the 64-bit ``c | b<<32`` doubling trick.
    Same length-bucketed word-lockstep layout as :func:`murmur2_bytes`."""
    pair = seed2 is not None
    bufs, by_len = _byte_matrix(values)
    out_c = np.zeros(len(bufs), dtype=np.uint32)
    out_b = np.zeros(len(bufs), dtype=np.uint32) if pair else None
    for L, idx in by_len.items():
        idx = np.asarray(idx)
        init = np.uint32((0xDEADBEEF + L + seed) & 0xFFFFFFFF)
        a = np.full(len(idx), init, dtype=np.uint32)
        b = a.copy()
        c = a.copy()
        if pair:
            c = c + np.uint32(seed2 & 0xFFFFFFFF)
        if L == 0:                       # zero length: no mixing, no final
            out_c[idx] = c
            if pair:
                out_b[idx] = b
            continue
        nblk = (L - 1) // 12             # full mixes while >12 bytes remain
        t = L - 12 * nblk                # tail length 1..12
        mat = _padded_matrix(bufs, idx, L, 12 * nblk + 12)

        def w32(o):
            return mat[:, o:o + 4].copy().view("<u4").ravel()

        for j in range(nblk):
            a = a + w32(12 * j)
            b = b + w32(12 * j + 4)
            c = c + w32(12 * j + 8)
            a, b, c = _bob_mix(a, b, c)
        base = 12 * nblk                 # zero-padded words == masked reads
        a = a + w32(base)
        if t > 4:
            b = b + w32(base + 4)
        if t > 8:
            c = c + w32(base + 8)
        a, b, c = _bob_final(a, b, c)
        out_c[idx] = c
        if pair:
            out_b[idx] = b
    return (out_c, out_b) if pair else out_c


_SPOOKY_CONST = np.uint64(0xDEADBEEFDEADBEEF)


def _rotl64_arr(x: np.ndarray, k: int) -> np.ndarray:
    return (x << np.uint64(k)) | (x >> np.uint64(64 - k))


def _spooky_short_mix(h0, h1, h2, h3):
    """SpookyHash::ShortMix (src/SpookyV2.hpp:217-231)."""
    for (ri, rk, add_to, xor_t) in ((2, 50, 3, 0), (3, 52, 0, 1),
                                    (0, 30, 1, 2), (1, 41, 2, 3),
                                    (2, 54, 3, 0), (3, 48, 0, 1),
                                    (0, 38, 1, 2), (1, 37, 2, 3),
                                    (2, 62, 3, 0), (3, 34, 0, 1),
                                    (0, 5, 1, 2), (1, 36, 2, 3)):
        h = [h0, h1, h2, h3]
        h[ri] = _rotl64_arr(h[ri], rk)
        h[ri] = h[ri] + h[add_to]
        h[xor_t] = h[xor_t] ^ h[ri]
        h0, h1, h2, h3 = h
    return h0, h1, h2, h3


def _spooky_short_end(h0, h1, h2, h3):
    """SpookyHash::ShortEnd (src/SpookyV2.hpp:246-258)."""
    for (xt, ri, rk) in ((3, 2, 15), (0, 3, 52), (1, 0, 26), (2, 1, 51),
                         (3, 2, 28), (0, 3, 9), (1, 0, 47), (2, 1, 54),
                         (3, 2, 32), (0, 3, 25), (1, 0, 63)):
        h = [h0, h1, h2, h3]
        h[xt] = h[xt] ^ h[ri]
        h[ri] = _rotl64_arr(h[ri], rk)
        h[xt] = h[xt] + h[ri]
        h0, h1, h2, h3 = h
    return h0, h1, h2, h3


_SPOOKY_MIX_ROT = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
_SPOOKY_END_ROT = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)


def _spooky_mix(words, h):
    """SpookyHash::Mix (src/SpookyV2.hpp:133-151): h[i] += data[i];
    h[(i+2)%12] ^= h[(i+10)%12]; h[(i+11)%12] ^= h[i]; h[i] = rot;
    h[(i+11)%12] += h[(i+1)%12] — unrolled index arithmetic."""
    for i in range(12):
        h[i] = h[i] + words[i]
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rotl64_arr(h[i], _SPOOKY_MIX_ROT[i])
        h[(i + 11) % 12] = h[(i + 11) % 12] + h[(i + 1) % 12]
    return h


def _spooky_end_partial(h):
    """SpookyHash::EndPartial (src/SpookyV2.hpp:172-186): h[(i+11)%12] +=
    h[(i+1)%12]; h[(i+2)%12] ^= h[(i+11)%12]; h[(i+1)%12] = rot."""
    for i in range(12):
        h[(i + 11) % 12] = h[(i + 11) % 12] + h[(i + 1) % 12]
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rotl64_arr(h[(i + 1) % 12], _SPOOKY_END_ROT[i])
    return h


def spooky_bytes(values, seed: int = 0) -> np.ndarray:
    """Vectorized SpookyHash V2 ``Hash64`` over byte/str rows —
    value-identical to ``HashUtil::SpookyHash`` (src/hashutil.cc:583-585 →
    src/SpookyV2.cpp Hash128/Short): ShortHash below 192 bytes, the
    12-lane 96-byte-block long form at or above.  Length-bucketed
    word-lockstep like :func:`murmur2_bytes`."""
    bufs, by_len = _byte_matrix(values)
    out = np.zeros(len(bufs), dtype=np.uint64)
    sd = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    for L, idx in by_len.items():
        idx = np.asarray(idx)
        n = len(idx)
        if L < 192:                              # Short (SpookyV2.cpp:21-121)
            nset = L // 32 if L > 15 else 0
            extra16 = 1 if (L > 15 and L % 32 >= 16) else 0
            pos = 32 * nset + 16 * extra16
            rem = L - pos                        # 0..15
            mat = _padded_matrix(bufs, idx, L, pos + 16)

            def w64(o):
                return mat[:, o:o + 8].copy().view("<u8").ravel()

            a = np.full(n, sd, dtype=np.uint64)
            b = a.copy()
            c = np.full(n, _SPOOKY_CONST, dtype=np.uint64)
            d = c.copy()
            for j in range(nset):
                c = c + w64(32 * j)
                d = d + w64(32 * j + 8)
                a, b, c, d = _spooky_short_mix(a, b, c, d)
                a = a + w64(32 * j + 16)
                b = b + w64(32 * j + 24)
            if extra16:
                c = c + w64(32 * nset)
                d = d + w64(32 * nset + 8)
                a, b, c, d = _spooky_short_mix(a, b, c, d)
            d = d + (np.uint64(L) << np.uint64(56))
            if rem == 0:                         # zero tail: both += const
                c = c + _SPOOKY_CONST
                d = d + _SPOOKY_CONST
            else:                                # padded reads == tail switch
                c = c + w64(pos)
                d = d + w64(pos + 8)
            a, b, c, d = _spooky_short_end(a, b, c, d)
            out[idx] = a
        else:                                    # long form (Hash128)
            nblk = L // 96
            rem = L - 96 * nblk                  # 0..95
            mat = _padded_matrix(bufs, idx, L, 96 * (nblk + 1))
            mat[:, 96 * nblk + 95] = rem         # buf[blockSize-1]=remainder
            h = [np.full(n, sd, dtype=np.uint64) for _ in range(2)] \
                + [np.full(n, _SPOOKY_CONST, dtype=np.uint64)]
            h = (h * 4)[:12]                     # h0=h3=h6=h9, h1=..., h2=...
            h = [x.copy() for x in h]
            for j in range(nblk):
                words = [mat[:, 96 * j + 8 * i:96 * j + 8 * i + 8]
                         .copy().view("<u8").ravel() for i in range(12)]
                h = _spooky_mix(words, h)
            words = [mat[:, 96 * nblk + 8 * i:96 * nblk + 8 * i + 8]
                     .copy().view("<u8").ravel() for i in range(12)]
            for i in range(12):                  # End(): h += data, 3 rounds
                h[i] = h[i] + words[i]
            for _ in range(3):
                h = _spooky_end_partial(h)
            out[idx] = h[0]
    return out
