"""Bloom / blocked-bloom / semisort-codec / hashing / serde kernel tests."""

import numpy as np
import pytest

from cuckoofilter_ray.kernels import (BlockedBloomFilter, BloomFilter,
                                      CuckooFilter, deserialize, make_filter,
                                      mix_split, next_prime, pack_bits,
                                      serialize, sha256_hex, sha256_u64,
                                      splitmix64, two_independent_multiply_shift,
                                      unpack_bits)
from cuckoofilter_ray.kernels import semisort


# ----------------------------------------------------------------- hashing

def test_mix_split_reference_values():
    # murmur64 finalizer is a bijection; spot-check avalanche + determinism
    h1 = mix_split(np.arange(1000, dtype=np.uint64), seed=42)
    h2 = mix_split(np.arange(1000, dtype=np.uint64), seed=42)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == 1000
    assert (mix_split([5], seed=1) != mix_split([5], seed=2)).all()


def test_two_independent_multiply_shift_matches_int_math():
    mul = 0x123456789ABCDEF0FEDCBA9876543210
    add = 0x0F1E2D3C4B5A69788796A5B4C3D2E1F0
    keys = splitmix64(100, seed=4)
    got = two_independent_multiply_shift(keys, mul, add)
    for k, g in zip(keys.tolist(), got.tolist()):
        assert ((add + mul * k) >> 64) & 0xFFFFFFFFFFFFFFFF == g


def test_splitmix64_known_values():
    # splitmix64(seed=0) first outputs (published test vectors)
    out = splitmix64(3, seed=0)
    assert out[0] == 0xE220A8397B1DCDAF
    assert out[1] == 0x6E789E6AA1B965F4
    assert out[2] == 0x06C45D188009454F


def test_sha256_key_matches_hashlib():
    import hashlib
    texts = ["hello", "", "æøå ünïcode", "x" * 10_000]
    hexes = sha256_hex(texts)
    keys = sha256_u64(texts)
    for t, h, k in zip(texts, hexes, keys.tolist()):
        d = hashlib.sha256(t.encode()).hexdigest()
        assert h == d
        assert k == int(d[:16], 16)


# ------------------------------------------------------------------- bloom

def test_next_prime():
    assert next_prime(1) == 2
    assert next_prime(8) == 11
    assert next_prime(800_000) > 800_000


def test_bloom_no_false_negatives_and_fpr():
    n = 50_000
    keys = splitmix64(n, seed=3)
    f = BloomFilter.create(n, bits_per_item=8, seed=9)
    f.add_batch(keys)
    assert f.contain_batch(keys).all()
    # k = round(8·ln2) = 6 → theoretical FPR ≈ (1 - e^{-kn/m})^k ≈ 2.2%
    fpr = f.contain_batch(splitmix64(200_000, seed=5)).mean()
    assert fpr < 0.035, fpr


def test_bloom_merge_is_or():
    A, B = splitmix64(5_000, seed=1), splitmix64(5_000, seed=2)
    fa = BloomFilter.create(10_000, 8, seed=4)
    fb = BloomFilter.create(10_000, 8, seed=4)
    fa.add_batch(A); fb.add_batch(B)
    both = BloomFilter.create(10_000, 8, seed=4)
    both.add_batch(np.concatenate([A, B]))
    fa.merge(fb)
    assert (fa.words == both.words).all()  # OR-merge is order-independent, bit-exact
    with pytest.raises(ValueError):
        fa.merge(BloomFilter.create(10_000, 8, seed=5))


def test_bloom_chunked_contain_matches_small_calls():
    """contain_batch chunks large batches at _CHUNK; the output must equal
    concatenated small (direct-path) calls for both bloom variants."""
    from cuckoofilter_ray.kernels import bloom as bloom_mod
    n = 60_000
    keys = splitmix64(n, seed=11)
    probes = np.concatenate([keys[:5_000], splitmix64(bloom_mod._CHUNK * 2 + 777,
                                                      seed=13)])
    for f in (BloomFilter.create(n, bits_per_item=12, seed=9),
              BlockedBloomFilter.create(n, bits_per_item=8, seed=9)):
        f.add_batch(keys)
        got = f.contain_batch(probes)
        step = 1024                      # well under _CHUNK: direct path
        exp = np.concatenate([f.contain_batch(probes[s:s + step])
                              for s in range(0, len(probes), step)])
        assert np.array_equal(got, exp)
        assert got[:5_000].all()


def test_blocked_bloom():
    n = 50_000
    keys = splitmix64(n, seed=6)
    f = BlockedBloomFilter.create(n, bits_per_item=8, seed=2)
    f.add_batch(keys)
    assert f.contain_batch(keys).all()
    fpr = f.contain_batch(splitmix64(200_000, seed=7)).mean()
    # at 8 bits/item each 256-bit block holds ~32 keys → per-lane density
    # 1-(1-1/32)^32 ≈ .638 → FPR ≈ .638^8 ≈ 2.7% (the blocked-bloom tradeoff;
    # the reference's SimdBlock8 ε=0.485% was at 12.2 effective bits/item)
    assert fpr < 0.045, fpr


# ---------------------------------------------------------------- semisort

def test_perm_encoding_roundtrip_all_codewords():
    # encode∘decode = id over all 3876 codewords (SURVEY.md §5 engine plan)
    assert semisort.DECODE_TABLE.shape == (3876, 4)
    for cw in range(0, 3876, 97):
        nibbles = semisort.DECODE_TABLE[cw]
        key = int(nibbles[0]) | int(nibbles[1]) << 4 | int(nibbles[2]) << 8 | int(nibbles[3]) << 12
        assert semisort.ENCODE_TABLE[key] == cw
    # decode table rows are sorted multisets
    assert (np.diff(semisort.DECODE_TABLE.astype(int), axis=1) >= 0).all()


def test_semisort_bucket_codec_multiset_exact():
    rng = np.random.default_rng(5)
    tags = rng.integers(0, 1 << 13, size=(4096, 4)).astype(np.uint16)
    tags[rng.random(tags.shape) < 0.3] = 0  # empties
    packed = semisort.pack_buckets(tags)
    assert len(packed) == 4096 * 6
    back = semisort.unpack_buckets(packed, 4096)
    assert (np.sort(back, axis=1) == np.sort(tags, axis=1)).all()


def test_semisort_filter_roundtrip_answers():
    n = 30_000
    keys = splitmix64(n, seed=12)
    f = CuckooFilter.create(n, 13, seed=8)
    f.add_batch(keys)
    f2 = deserialize(serialize(f))
    probes = splitmix64(100_000, seed=13)
    assert (f.contain_batch(probes) == f2.contain_batch(probes)).all()
    assert f2.contain_batch(keys).all()
    # at-rest footprint: 6 bytes/bucket, 1 bit/item less than 13-bit raw
    row_len = len(serialize(f))
    assert row_len < f.num_buckets * 8  # packed < uint16 raw


# ------------------------------------------------------------------- serde

def test_pack_bits_roundtrip():
    rng = np.random.default_rng(1)
    for bits in (2, 4, 8, 12, 13, 16):
        vals = rng.integers(0, 1 << bits, size=10_001).astype(np.uint16)
        data = pack_bits(vals, bits)
        assert len(data) == (10_001 * bits + 7) // 8
        assert (unpack_bits(data, bits, 10_001) == vals).all()


@pytest.mark.parametrize("kind", ["cuckoo", "cuckoo-stable", "semisort",
                                  "bloom", "blockedbloom", "xor", "shingle",
                                  "counting", "gcs", "xorplus", "xor2n",
                                  "tail"])
def test_serde_roundtrip_every_kind(kind):
    # example/test1.cc:63-72: Serialize → Deserialize → identical answers
    keys = splitmix64(8_000, seed=20)
    f = make_filter(kind, 10_000, seed=30)
    f.add_batch(keys)
    f2 = deserialize(serialize(f))
    probes = splitmix64(50_000, seed=21)
    assert (f.contain_batch(probes) == f2.contain_batch(probes)).all()
    assert f2.contain_batch(keys).all()
    assert f2.size() == f.size()


# ------------------------------------------------------------------ xor

def test_xor_filter_membership_and_fpr():
    from cuckoofilter_ray.kernels import XorFilter
    keys = splitmix64(50_000, seed=40)
    f = XorFilter(len(keys), bits_per_tag=8, seed=41)
    f.add_all(keys)
    assert f.contain_batch(keys).all(), "xor filter false negative"
    neg = splitmix64(200_000, seed=42)
    fpr = f.contain_batch(neg).mean()
    assert fpr <= 2 / 256, f"xor fpr {fpr} above 2x the 2^-8 bound"
    # ~9.84 bits/key at 8-bit fingerprints (1.23 expansion)
    assert 9.0 < f.bits_per_item() < 11.0


def test_xor_filter_immutable_and_deterministic():
    from cuckoofilter_ray.kernels import XorFilter
    import pytest as _pytest
    keys = splitmix64(5_000, seed=43)
    a = XorFilter(len(keys), seed=44); a.add_all(keys)
    b = XorFilter(len(keys), seed=44); b.add_all(keys)
    assert (a.fingerprints == b.fingerprints).all()
    assert a.build_seed == b.build_seed
    with _pytest.raises(RuntimeError):
        a.add_all(keys)
    with _pytest.raises(NotImplementedError):
        a.merge(b)


def test_xor_16bit_tighter_fpr():
    from cuckoofilter_ray.kernels import XorFilter
    keys = splitmix64(20_000, seed=45)
    f = XorFilter(len(keys), bits_per_tag=16, seed=46)
    f.add_all(keys)
    assert f.contain_batch(keys).all()
    neg = splitmix64(300_000, seed=47)
    assert f.contain_batch(neg).mean() <= 2 / 65536


# ------------------------------------------------------------- hll / countmin

def test_hll_error_bound_and_merge():
    from cuckoofilter_ray.kernels.sketches import HyperLogLog
    n = 100_000
    keys = splitmix64(n, seed=50)
    h = HyperLogLog(p=12, seed=51)
    h.add_batch(keys)
    est = h.estimate()
    assert abs(est - n) / n < h.rel_error_bound(), (est, n)
    # merge associativity + idempotence: split adds == bulk add
    a, b, c = (HyperLogLog(p=12, seed=51) for _ in range(3))
    a.add_batch(keys[:30_000]); b.add_batch(keys[30_000:]); c.add_batch(keys)
    a.merge(b)
    assert (a.registers == c.registers).all()
    a.merge(c)   # idempotent under max
    assert (a.registers == c.registers).all()


def test_hll_small_range_linear_counting():
    from cuckoofilter_ray.kernels.sketches import HyperLogLog
    h = HyperLogLog(p=12, seed=52)
    keys = splitmix64(200, seed=53)
    h.add_batch(keys)
    assert abs(h.estimate() - 200) / 200 < 0.05


def test_countmin_bounds_and_merge():
    from cuckoofilter_ray.kernels.sketches import CountMin
    rng = np.random.default_rng(6)
    # zipf-ish frequencies over 200 distinct keys
    keys = splitmix64(200, seed=54)
    freqs = (2000 / np.arange(1, 201)).astype(np.int64) + 1
    stream = np.repeat(keys, freqs)
    cm = CountMin(depth=5, width=2048, seed=55)
    cm.add_batch(stream)
    est = cm.estimate_batch(keys)
    assert (est >= freqs).all(), "count-min must never underestimate"
    assert (est <= freqs + cm.error_bound()).all()
    # merge == bulk
    a, b = CountMin(seed=55), CountMin(seed=55)
    a.add_batch(stream[:5000]); b.add_batch(stream[5000:])
    a.merge(b)
    assert (a.counts == cm.counts).all() and a.total == cm.total


def test_bottomk_quantile_rank_error_and_merge():
    from cuckoofilter_ray.kernels.sketches import BottomKQuantile
    n = 100_000
    uids = splitmix64(n, seed=60)
    vals = np.sort(splitmix64(n, seed=61).astype(np.float64))  # value i ≈ rank i
    s = BottomKQuantile(k=4096, seed=62)
    s.add_batch(uids, vals)
    exact = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = float(s.quantile(q))
        rank = np.searchsorted(exact, est) / n
        assert abs(rank - q) <= s.rank_error_bound(), (q, rank)
    # merge == bulk (bottom-k of union is order-independent)
    a, b = BottomKQuantile(k=4096, seed=62), BottomKQuantile(k=4096, seed=62)
    a.add_batch(uids[:40_000], vals[:40_000])
    b.add_batch(uids[40_000:], vals[40_000:])
    a.merge(b)
    oa = np.argsort(a.prio); ob = np.argsort(s.prio)
    assert (a.prio[oa] == s.prio[ob]).all() and (a.vals[oa] == s.vals[ob]).all()
    # KMV distinct estimate within 10%
    assert abs(s.distinct_estimate() - n) / n < 0.1


def test_kll_rank_error_any_merge_tree_and_serde():
    """KLL quantiles stay within the sketch's rank-error band for a single
    stream AND for an arbitrary (shuffled, serde-roundtripped) merge tree
    over 37 shards — merge validity under any tree is what makes it a
    UDAF."""
    import random
    from cuckoofilter_ray.kernels.sketches import KLLSketch
    rng = np.random.default_rng(5)
    data = rng.lognormal(3.0, 1.5, 150_000)
    exact = np.sort(data)
    s = KLLSketch(k=256, seed=7)
    s.add_batch(data)
    eps = s.rank_error_bound()
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(exact, s.quantile(q)) / len(data)
        assert abs(rank - q) <= eps, (q, rank)
    random.seed(1)
    shards = []
    for part in np.array_split(data, 37):
        t = KLLSketch(k=256, seed=7)
        t.add_batch(part)
        shards.append(KLLSketch.from_bytes(t.to_bytes(), 256, 7))  # serde
    while len(shards) > 1:
        random.shuffle(shards)
        shards.append(shards.pop().merge(shards.pop()))
    m = shards[0]
    # sketch mass drifts only by the odd-buffer coin (one item per compaction)
    assert abs(m.total_weight() - len(data)) / len(data) < 0.01
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(exact, m.quantile(q)) / len(data)
        assert abs(rank - q) <= eps, (q, rank)
    with pytest.raises(ValueError):
        m.merge(KLLSketch(k=128, seed=7))


# ---------------------------------------------------------------- counting

def test_counting_filter_matches_dict_model():
    """Counts are value-identical to an exact masked-hash multiset model
    (the reference CQF's value domain, src/gqf_cpp.h:93-123)."""
    from cuckoofilter_ray.kernels import CountingQuotientFilter
    from cuckoofilter_ray.kernels.hashing import hash_key64
    rng = np.random.default_rng(7)
    base = splitmix64(3000, seed=41)
    keys = rng.choice(base, size=20_000, replace=True)   # heavy duplicates
    f = CountingQuotientFilter.create(5000, seed=9)
    for chunk in np.array_split(keys, 7):                # incremental adds
        f.add_batch(chunk)
    model = {}
    for h in hash_key64(keys, 9) & np.uint64(f.mask):
        model[int(h)] = model.get(int(h), 0) + 1
    got = f.count_batch(base)
    hb = hash_key64(base, 9) & np.uint64(f.mask)
    exp = np.array([model.get(int(h), 0) for h in hb])
    assert (got == exp).all()
    assert f.num_items == len(keys)
    assert (f.contain_batch(base) == (exp > 0)).all()
    miss = splitmix64(5000, seed=77)
    fpr = f.contain_batch(miss).mean()
    assert fpr < 0.02, f"masked-collision FPR too high: {fpr}"


def test_counting_sizing_matches_reference_loop():
    """qbits per gqf_cpp.h:44-50: smallest with nslots*0.9 >= n."""
    from cuckoofilter_ray.kernels import CountingQuotientFilter
    for n, nslots in [(1, 2), (7, 8), (8, 16), (230, 256), (231, 512),
                      (100_000, 1 << 17)]:
        f = CountingQuotientFilter.create(n)
        assert f.nslots == nslots, (n, f.nslots)
        assert f.nhashbits == f.qbits + 8
        assert f.mask == (1 << f.nhashbits) - 1


def test_counting_merge_associative_and_commutative():
    from cuckoofilter_ray.kernels import CountingQuotientFilter
    keys = splitmix64(9000, seed=5)
    parts = np.array_split(keys, 3)

    def build(chunks):
        f = CountingQuotientFilter.create(10_000, seed=3)
        for c in chunks:
            f.add_batch(c)
        return f

    def merged(order):
        fs = [build([parts[i]]) for i in order]
        acc = fs[0]
        for f in fs[1:]:
            acc.merge(f)
        return acc

    bulk = build(parts)
    for order in [(0, 1, 2), (2, 0, 1), (1, 2, 0)]:
        m = merged(order)
        assert (m.hashes == bulk.hashes).all()
        assert (m.counts == bulk.counts).all()
        assert m.num_items == bulk.num_items
    # (a+b)+c == a+(b+c)
    ab_c = merged((0, 1, 2))
    bc = build([parts[1]]); bc.merge(build([parts[2]]))
    a_bc = build([parts[0]]); a_bc.merge(bc)
    assert (ab_c.hashes == a_bc.hashes).all()
    assert (ab_c.counts == a_bc.counts).all()


def test_counting_remove_delete_semantics():
    from cuckoofilter_ray.kernels import CountingQuotientFilter
    f = CountingQuotientFilter.create(100, seed=2)
    keys = np.array([10, 10, 10, 20, 30], dtype=np.uint64)
    f.add_batch(keys)
    assert list(f.count_batch(np.array([10, 20, 30, 40], dtype=np.uint64))) \
        == [3, 1, 1, 0]
    # counted remove, saturating; duplicates drain in order
    removed = f.remove_batch(np.array([10, 10, 40], dtype=np.uint64),
                             np.array([2, 5, 1]))
    assert list(removed) == [2, 1, 0]
    assert f.count_batch(np.array([10], dtype=np.uint64))[0] == 0
    assert f.num_items == 2
    # delete removes the key entirely
    f.add_batch(np.array([20, 20], dtype=np.uint64))
    got = f.delete_batch(np.array([20, 99], dtype=np.uint64))
    assert list(got) == [3, 0]
    assert f.count_batch(np.array([20], dtype=np.uint64))[0] == 0


def test_counting_serde_roundtrip_and_capacity():
    from cuckoofilter_ray.kernels import (CountingQuotientFilter,
                                          NotEnoughSpaceError, deserialize,
                                          serialize)
    f = CountingQuotientFilter.create(2000, seed=4, hash_family="tims")
    keys = splitmix64(1500, seed=8)
    f.add_batch(keys, counts=np.arange(1, 1501))
    g = deserialize(serialize(f))
    assert (g.hashes == f.hashes).all() and (g.counts == f.counts).all()
    assert (g.qbits, g.seed, g.hash_family, g.num_items) == \
        (f.qbits, f.seed, f.hash_family, f.num_items)
    assert (g.count_batch(keys) == f.count_batch(keys)).all()
    # overfilling distinct slots raises QF_NO_SPACE
    small = CountingQuotientFilter.create(10, seed=1)   # nslots=16
    with pytest.raises(NotEnoughSpaceError):
        small.add_batch(splitmix64(200, seed=6))


# ----------------------------------------------------------------- shingle

def test_shingle_no_false_negatives_and_fpr():
    from cuckoofilter_ray.kernels import ShingleFilter
    f = ShingleFilter.create(60_000, seed=11)
    keys = splitmix64(60_000, seed=12)
    res = f.add_batch(keys)
    assert res.ok == len(keys) and res.overflow == 0
    assert f.contain_batch(keys).all(), "false negative"
    assert f.load_factor() <= 12.0 / 12.75 + 1e-9
    neg = splitmix64(200_000, seed=13)
    fpr = f.contain_batch(neg).mean()
    # 11-bit fp, 4 probed slots: expect ~ load * 4 / 2^11 ~ 0.18%
    assert fpr < 0.006, f"shingle fpr {fpr}"


def test_shingle_load_ceiling_and_overflow():
    from cuckoofilter_ray.kernels import ShingleFilter
    from cuckoofilter_ray.kernels.shingle import MAX_LOAD
    f = ShingleFilter(10, seed=3)       # 1024 total slots
    cap = int(MAX_LOAD * 1024)
    keys = splitmix64(1200, seed=4)
    res = f.add_batch(keys)
    assert res.ok == cap and res.overflow == 1200 - cap
    assert abs(f.load_factor() - MAX_LOAD) < 2 / 1024
    assert f.contain_batch(keys[:cap]).all()


def test_shingle_delete_and_merge_and_serde():
    from cuckoofilter_ray.kernels import ShingleFilter, deserialize, serialize
    keys = splitmix64(8000, seed=21)
    f = ShingleFilter.create(10_000, seed=7)
    f.add_batch(keys)
    # delete half; survivors still found, deleted mostly gone (a deleted
    # key may still read as present via another key's colliding slot)
    dele = f.delete_batch(keys[:4000])
    assert dele.all()
    assert f.contain_batch(keys[4000:]).all()
    resid = f.contain_batch(keys[:4000]).mean()
    assert resid < 0.01, f"deleted keys still present at rate {resid}"
    # duplicate inserts occupy one slot each and drain one delete each
    g = ShingleFilter.create(1000, seed=9)
    g.add_batch(np.array([42, 42, 42], dtype=np.uint64))
    assert g.filled == 3
    assert g.delete(42) and g.delete(42) and g.delete(42)
    assert not g.delete(42)
    # merge partials == membership of the union
    a = ShingleFilter.create(10_000, seed=7)
    b = ShingleFilter.create(10_000, seed=7)
    a.add_batch(keys[:4000]); b.add_batch(keys[4000:])
    a.merge(b)
    assert a.contain_batch(keys).all()
    # serde roundtrip answers identically
    h = deserialize(serialize(a))
    probes = np.concatenate([keys, splitmix64(20_000, seed=23)])
    assert (h.contain_batch(probes) == a.contain_batch(probes)).all()
    assert h.filled == a.filled and h.num_items == a.num_items
    assert h.size_in_bytes() == a.size_in_bytes() == 3 * (a.imask + 3)


def test_shingle_fast_path_matches_sequential():
    """Vectorized add_batch == key-at-a-time adds (same slots, same table)."""
    from cuckoofilter_ray.kernels import ShingleFilter
    keys = splitmix64(3000, seed=31)
    fa = ShingleFilter.create(4000, seed=5)
    fa.add_batch(keys)
    fb = ShingleFilter.create(4000, seed=5)
    for k in keys:
        fb.add(int(k))
    # same multiset of occupied (slot, value) pairs is not guaranteed (race
    # ordering differs) but membership must agree on inserted keys and the
    # fill level must match exactly
    assert fb.filled == fa.filled == 3000
    assert fa.contain_batch(keys).all() and fb.contain_batch(keys).all()


# --------------------------------------------------------------------- gcs

def test_gcs_membership_fpr_and_size():
    """Golomb-coded set (src/gcs.h): zero false negatives, FPR ~= 2^-bits,
    compressed at-rest size near bits+4.5 bits/key."""
    from cuckoofilter_ray.kernels import GcsFilter
    n = 50_000
    keys = splitmix64(n, seed=50)
    f = GcsFilter(n, bits_per_item=8, seed=51)
    f.add_all(keys)
    assert f.contain_batch(keys).all(), "gcs false negative"
    neg = splitmix64(300_000, seed=52)
    fpr = f.contain_batch(neg).mean()
    assert fpr < 2.5 / 256, f"gcs fpr {fpr} vs 2^-8 target"
    bpi = f.size_in_bytes() * 8 / n
    assert bpi < 14.0, f"gcs at-rest {bpi} bits/item"  # stream ~10.5 + index 2


def test_gcs_decode_matches_model():
    """Decoded (bucket, fp) multiset == the direct hash computation."""
    from cuckoofilter_ray.kernels import GcsFilter
    n = 5_000
    keys = splitmix64(n, seed=55)
    f = GcsFilter(n, bits_per_item=8, seed=56)
    f.add_all(keys)
    idx = f._decode()
    b, fp = f._bucket_fp(keys)
    want = np.unique((b << f.fingerprint_bits) | fp)
    assert (np.unique(idx) == want).all()
    # duplicates in the fp domain are preserved as repeated codes (delta 0)
    assert len(idx) == n


def test_gcs_lazy_bucket_decode():
    """Probe-few path decodes only touched buckets (gcs.h:344-368 walks one
    bucket per Contain) — answers identical to the cached full decode, no
    full index materialized, and decode memory bounded by touched buckets."""
    from cuckoofilter_ray.kernels import GcsFilter
    n = 60_000
    keys = splitmix64(n, seed=60)
    f = GcsFilter(n, bits_per_item=8, seed=61)
    f.add_all(keys)
    probes = np.concatenate([keys[:400], splitmix64(400, seed=62)])
    got = f.contain_batch(probes)
    assert f._decoded is None, "small probe must not trigger full decode"
    g = GcsFilter(n, bits_per_item=8, seed=61)
    g.add_all(keys)
    full = g._decode()
    assert (got == g.contain_batch(probes)).all()
    assert got[:400].all()
    # lane decode == the full index restricted to those buckets
    ub = np.unique(f._bucket_fp(probes)[0])
    lanes = f._decode_lanes(ub)
    assert (lanes == full[np.isin(full >> f.fingerprint_bits, ub)]).all()
    # hammering past half the buckets flips to the cached full decode
    for s in range(120):
        f.contain_batch(splitmix64(2_000, seed=1_000 + s))
        if f._decoded is not None:
            break
    assert f._decoded is not None
    assert (f.contain_batch(probes) == got).all()


def test_gcs_serde_and_immutability():
    from cuckoofilter_ray.kernels import GcsFilter, deserialize, serialize
    keys = splitmix64(10_000, seed=57)
    f = GcsFilter(10_000, bits_per_item=8, seed=58, hash_family="tims")
    f.add_all(keys)
    g = deserialize(serialize(f))
    probes = np.concatenate([keys, splitmix64(50_000, seed=59)])
    assert (g.contain_batch(probes) == f.contain_batch(probes)).all()
    assert g.size_in_bytes() == f.size_in_bytes()
    with pytest.raises(RuntimeError):
        f.add_all(keys)
    with pytest.raises(NotImplementedError):
        f.merge(g)
    # empty filter answers all-negative
    e = GcsFilter(100, seed=60)
    assert not e.contain_batch(keys[:10]).any()


# ------------------------------------------------------------------ xor+

def test_xorplus_membership_fpr_and_compression():
    """Xor+ (src/xorfilter_plus.h): rank-compressed third segment, zero
    false negatives, FPR ~ 2^-8, smaller than the plain xor filter."""
    from cuckoofilter_ray.kernels import XorFilter, XorFilterPlus
    n = 50_000
    keys = splitmix64(n, seed=70)
    f = XorFilterPlus(n, bits_per_tag=8, seed=71)
    f.add_all(keys)
    assert f.contain_batch(keys).all(), "xor+ false negative"
    neg = splitmix64(300_000, seed=72)
    fpr = f.contain_batch(neg).mean()
    assert fpr <= 2.5 / 256, f"xor+ fpr {fpr}"
    x = XorFilter(n, bits_per_tag=8, seed=71)
    x.add_all(keys)
    assert f.size_in_bytes() < x.size_in_bytes(), "xor+ must be smaller"
    assert f.bits_per_item() < 9.5   # ~8.6 vs xor's 9.84
    # the dense third segment really dropped the zero cells
    assert len(f.dense3) < f.block_length


def test_xorplus_serde_roundtrip():
    from cuckoofilter_ray.kernels import (XorFilterPlus, deserialize,
                                          serialize)
    keys = splitmix64(20_000, seed=73)
    f = XorFilterPlus(20_000, bits_per_tag=16, seed=74)
    f.add_all(keys)
    g = deserialize(serialize(f))
    probes = np.concatenate([keys, splitmix64(100_000, seed=75)])
    assert (g.contain_batch(probes) == f.contain_batch(probes)).all()
    assert g.size_in_bytes() == f.size_in_bytes()


# --------------------------------------------------------- more hash families

def test_universal_multiply_shift_and_tabulation():
    from cuckoofilter_ray.kernels import (CuckooFilter, simple_tabulation,
                                          tabulation_tables,
                                          universal_multiply_shift)
    keys = splitmix64(200, seed=90)
    # ums == 64-bit wrapping multiply by an odd constant
    got = universal_multiply_shift(keys, 0x123456789ABCDEF0)
    for k, g in zip(keys.tolist(), got.tolist()):
        assert (0x123456789ABCDEF1 * k) & 0xFFFFFFFFFFFFFFFF == g
    # tabulation == xor of per-byte table entries
    t = tabulation_tables(7)
    got = simple_tabulation(keys, t)
    for k, g in zip(keys.tolist(), got.tolist()):
        exp = 0
        for i in range(8):
            exp ^= int(t[i][(k >> (8 * i)) & 0xFF])
        assert exp == g
    # both families drive a cuckoo filter with zero false negatives
    for fam in ("ums", "tab"):
        f = CuckooFilter.create(4096, seed=13, hash_family=fam)
        ks = splitmix64(3000, seed=91)
        f.add_batch(ks)
        assert f.contain_batch(ks).all(), f"false negative under {fam}"


def test_md5_sha1_match_hashlib():
    import hashlib
    from cuckoofilter_ray.kernels import md5_hex, sha1_hex
    texts = ["hello", "", "æøå ünïcode", None, "x" * 5000]
    for t, m, s1 in zip(texts, md5_hex(texts), sha1_hex(texts)):
        raw = (t or "").encode()
        assert m == hashlib.md5(raw).hexdigest()
        assert s1 == hashlib.sha1(raw).hexdigest()


# ------------------------------------------------------------- grow bloom

def test_growable_blocked_bloom():
    """Pagh-et-al growable AMQ (src/growable-simd-block.h): grows by
    doubling levels, zero false negatives, total FPR near the budget."""
    from cuckoofilter_ray.kernels import (GrowBlockedBloomFilter, deserialize,
                                          serialize)
    f = GrowBlockedBloomFilter(initial_bytes=1 << 10, epsilon=0.01, seed=3)
    keys = splitmix64(50_000, seed=95)     # far beyond the initial level
    f.add_batch(keys)
    assert len(f.levels) > 3, "filter must have grown"
    assert f.contain_batch(keys).all(), "growable false negative"
    neg = splitmix64(200_000, seed=96)
    fpr = f.contain_batch(neg).mean()
    # sum of level budgets <= epsilon; blocked-bloom levels are approximate,
    # allow 4x
    assert fpr < 0.04, f"growable fpr {fpr}"
    # AddAny: second insertion of the same keys adds (almost) nothing
    before = f.num_items
    added = f.add_any_batch(keys[:1000])
    assert added.sum() == 0
    assert f.num_items == before
    # serde roundtrip: identical answers, same level geometry
    g = deserialize(serialize(f))
    probes = np.concatenate([keys[:20_000], neg[:50_000]])
    assert (g.contain_batch(probes) == f.contain_batch(probes)).all()
    assert len(g.levels) == len(f.levels) and g.ttl == f.ttl
    # keys added after the roundtrip land identically
    more = splitmix64(5_000, seed=97)
    f.add_batch(more); g.add_batch(more)
    assert (g.contain_batch(more) == f.contain_batch(more)).all()
    assert g.contain_batch(more).all()


def test_counting_rice_payload_roundtrip_and_size():
    """Chunked-Rice at-rest codec: lossless on (hashes, counts); ~12-14
    bits/item vs 128 for the raw columnar pairs."""
    from cuckoofilter_ray.kernels import (CountingQuotientFilter, deserialize,
                                          serialize)
    rng = np.random.default_rng(3)
    base = splitmix64(120_000, seed=44)
    keys = rng.choice(base, size=400_000, replace=True)
    f = CountingQuotientFilter.create(150_000, seed=6)
    f.add_batch(keys)
    g = deserialize(serialize(f))
    assert (g.hashes == f.hashes).all()
    assert (g.counts == f.counts).all()
    assert g.num_items == f.num_items
    bpi = len(serialize(f)) * 8 / len(f.hashes)
    assert bpi < 20, f"rice-coded counting at-rest {bpi} bits/distinct"
    # heavy-count entries survive (quotient-overflow shift escalation)
    h = CountingQuotientFilter.create(1000, seed=7)
    h.add_batch(np.array([5] * 100_000 + [9, 9, 11], dtype=np.uint64))
    h2 = deserialize(serialize(h))
    assert (h2.hashes == h.hashes).all() and (h2.counts == h.counts).all()
    # tiny sizes incl. n=1 and empty
    for n in (0, 1, 2, 63, 64, 65, 129):
        t = CountingQuotientFilter.create(max(1, n), seed=8)
        if n:
            t.add_batch(splitmix64(n, seed=9))
        t2 = deserialize(serialize(t))
        assert (t2.hashes == t.hashes).all()
        assert (t2.counts == t.counts).all()


def test_xor2n_membership_and_pow2_geometry():
    """xor-2n (src/xorfilter_2n.h): power-of-two blocks, mask positions."""
    from cuckoofilter_ray.kernels import (XorFilter2n, deserialize,
                                          serialize)
    n = 40_000
    keys = splitmix64(n, seed=80)
    f = XorFilter2n(n, bits_per_tag=8, seed=81)
    assert f.block_length & (f.block_length - 1) == 0
    f.add_all(keys)
    assert f.contain_batch(keys).all(), "xor2n false negative"
    neg = splitmix64(200_000, seed=82)
    assert f.contain_batch(neg).mean() <= 2.5 / 256
    g = deserialize(serialize(f))
    probes = np.concatenate([keys, neg[:50_000]])
    assert (g.contain_batch(probes) == f.contain_batch(probes)).all()


# ------------------------------------------------------- r3 ADVICE regressions

def test_shingle_duplicate_overload_parks_not_hangs():
    """>4 copies of one key share the same 4 candidate slots; the reference
    recurses forever (shingle.h:135).  The engine must terminate, keep the
    key queryable (zero FN), and report the unplaceable copies as overflow."""
    from cuckoofilter_ray.kernels import ShingleFilter, deserialize, serialize
    f = ShingleFilter.create(1000, seed=9)
    res = f.add_batch(np.full(7, 42, dtype=np.uint64))
    assert res.ok + res.overflow == 7 and res.overflow >= 1
    assert f.contain(42)
    assert len(f.victims) == res.overflow
    # serde carries the parked tails
    g = deserialize(serialize(f))
    assert g.contain(42) and g.victims == f.victims
    # deletes drain slot copies first, then the parked tails, then miss
    drained = sum(f.delete(42) for _ in range(10))
    assert drained == 7 and not f.delete(42)
    assert not f.contain(42) and f.victims == []
    # mixed batch: the non-duplicate keys must all land normally
    h = ShingleFilter.create(2000, seed=11)
    keys = np.concatenate([splitmix64(1000, seed=12),
                           np.full(9, 7, dtype=np.uint64)])
    r2 = h.add_batch(keys)
    assert r2.ok + r2.overflow == len(keys) and r2.overflow <= 5
    assert h.contain_batch(keys).all()


def test_counting_remove_negative_counts_rejected():
    """remove_batch(count<0) must raise, not silently increase the count."""
    from cuckoofilter_ray.kernels import CountingQuotientFilter
    f = CountingQuotientFilter.create(100, seed=1)
    f.add_batch(np.array([5], dtype=np.uint64), counts=[3])
    with pytest.raises(ValueError):
        f.remove_batch(np.array([5], dtype=np.uint64), counts=[-2])
    assert f.count_batch(np.array([5], dtype=np.uint64))[0] == 3


def test_counting_shard_prefix_overflow_guard():
    """shard << nhashbits past 64 bits must refuse, not alias shards."""
    from cuckoofilter_ray.kernels import CountingQuotientFilter
    from cuckoofilter_ray.kernels.serde import filter_to_row
    from cuckoofilter_ray.stages.membership import filters_to_counting_ref
    rows = []
    for s in range(2):
        f = CountingQuotientFilter(56, seed=1)     # nhashbits = 64
        rows.append({"_shard": s, **filter_to_row(f, packed=False)})
    with pytest.raises(ValueError, match="64-bit"):
        filters_to_counting_ref(rows)


def test_gcs_stream_bits_overflow_guard(monkeypatch):
    """A Rice stream >= 2^32 bits must refuse at build, not wrap offsets."""
    from cuckoofilter_ray.kernels import GcsFilter
    from cuckoofilter_ray.kernels import gcs as gcs_mod
    f = GcsFilter(1000, seed=3)
    keys = splitmix64(100, seed=4)

    real = gcs_mod.rice_pack

    def fake(values, shift):
        stream, bits, starts = real(values, shift)
        return stream, 1 << 32, starts
    monkeypatch.setattr(gcs_mod, "rice_pack", fake)
    with pytest.raises(ValueError, match="2\\^32"):
        f.add_all(keys)


# -------------------------------------------------------------------- tail

def test_tail_filter_no_false_negatives_across_epochs():
    """Insert-then-lookup always true, including across epoch Upsizes with
    fingerprint shrinking (the tail-filter.cpp:86-105 invariant)."""
    from cuckoofilter_ray.kernels import TailFilter
    tf = TailFilter(5, 1.0 / 512, seed=11)       # tiny lgm => many epochs
    keys = splitmix64(5000, seed=12)
    res = tf.add_batch_sequential(keys)          # reference per-key walk
    assert tf.epoch >= 5, "upsizes must have happened"
    assert tf.contain_batch(keys).all(), "false negative"
    # Insert dedups via Lookup (tail-filter.hpp:119): ok counts distinct-
    # by-filter inserts, the shortfall is lookup false positives
    assert res.ok <= 5000 and res.ok >= 4800
    # growth-schedule parity with the reference binary at this config
    # (g++ run of tail-filter.hpp at lgm=5, eps=1/512, n=5000:
    # qd_capacity 5440, epoch 7)
    assert tf.qd.capacity == 5440 and tf.epoch == 7
    # the bulk path must land the SAME entry set / dedup count / epoch —
    # only capacity (walk-triggered upsize count) and slot layout may differ
    tb = TailFilter(5, 1.0 / 512, seed=11)
    resb = tb.add_batch(keys)
    assert (resb.ok, tb.ndv, tb.epoch) == (res.ok, tf.ndv, tf.epoch)
    ka, va = tb.qd.entries_arrays()
    assert sorted(zip(ka.tolist(), va.tolist())) == sorted(tf.qd.entries())
    assert (tb.bitset is None) == (tf.bitset is None)
    if tf.bitset is not None:
        assert (tb.bitset == tf.bitset).all()


def test_tail_bulk_entry_set_matches_sequential():
    """add_batch (vectorized scatter build, VERDICT r3 #2) is entry-set
    faithful to the per-key reference walk: identical (key, value) entry
    multiset, ndv, ok, epoch schedule and probe behavior — across configs
    with epoch upsizes, bitset graduation, and heavy QD growth."""
    from cuckoofilter_ray.kernels import TailFilter
    rng = np.random.default_rng(5)
    for n, eps, cap, seed in [(2000, 2.0 ** -8, 500, 11),
                              (6000, 2.0 ** -4, 300, 17),   # deep epochs
                              (20000, 2.0 ** -12, 20000, 23)]:
        keys = rng.integers(0, 2 ** 64, n, dtype=np.uint64)
        tb = TailFilter.create(cap, seed=seed, epsilon=eps)
        ts = TailFilter.create(cap, seed=seed, epsilon=eps)
        rb = tb.add_batch(keys)
        rs = ts.add_batch_sequential(keys)
        assert (rb.ok, tb.ndv, tb.epoch) == (rs.ok, ts.ndv, ts.epoch)
        ka, va = tb.qd.entries_arrays()
        assert sorted(zip(ka.tolist(), va.tolist())) == \
            sorted(ts.qd.entries())
        probes = np.concatenate(
            [keys, rng.integers(0, 2 ** 64, n, dtype=np.uint64)])
        assert (tb.contain_batch(probes) == ts.contain_batch(probes)).all()
        # incremental bulk adds (the UDAF accumulate pattern) stay faithful
        more = rng.integers(0, 2 ** 64, n // 2, dtype=np.uint64)
        rb2, rs2 = tb.add_batch(more), ts.add_batch_sequential(more)
        assert (rb2.ok, tb.ndv, tb.epoch) == (rs2.ok, ts.ndv, ts.epoch)
        assert (tb.contain_batch(probes) == ts.contain_batch(probes)).all()


def test_tail_vectorized_probe_matches_scalar():
    """contain_batch (batch Feistel + flattened-arena lockstep decode)
    equals the scalar tail-filter.hpp:70-88 walk, bit-for-bit, across
    epochs, both little-array sizes, and the graduated-bitset path."""
    from cuckoofilter_ray.kernels import TailFilter
    rng = np.random.default_rng(3)
    configs = [(500, 2.0 ** -8, 125), (20000, 2.0 ** -12, 5000),
               (30000, 2.0 ** -4, 64)]        # last: deep epochs + bitset
    for n, eps, cap in configs:
        keys = rng.integers(0, 2 ** 63, n, dtype=np.uint64)
        tf = TailFilter.create(cap, seed=11, epsilon=eps)
        tf.add_batch(keys)
        probes = np.concatenate(
            [keys, rng.integers(0, 2 ** 63, n, dtype=np.uint64)])
        scalar = tf.contain_batch_scalar(probes)
        vec = tf.contain_batch(probes)
        assert (scalar == vec).all()
        assert vec[:n].all()                  # zero FN either way
    assert tf.bitset is not None              # graduation exercised


def test_tail_feistel_batch_matches_scalar():
    from cuckoofilter_ray.kernels import TailFilter
    tf = TailFilter(9, 1.0 / 4096, seed=21)
    tf.add_batch(splitmix64(2000, seed=22))
    qd = tf.qd
    ks = splitmix64(500, seed=23) & np.uint64((1 << qd.k) - 1)
    for arena in (1, 2, 3):
        want = np.array([qd.hash_(arena, int(x)) for x in ks],
                        dtype=np.uint64)
        assert (qd.hash_batch(arena, ks) == want).all()


def test_tail_filter_fpr_within_structure_bound():
    """At epoch 0 the FPR tracks epsilon (reference binary: 0.0011 at
    lgm=13/eps=1/512/n=5000); shrunk fingerprints raise it ~linearly in
    epochs (reference: 0.0156 at lgm=5), matching the paper's trade."""
    from cuckoofilter_ray.kernels import TailFilter
    tf = TailFilter(13, 1.0 / 512, seed=11)
    keys = splitmix64(5000, seed=12)
    tf.add_batch(keys)
    neg = splitmix64(100_000, seed=13)
    fpr = tf.contain_batch(neg).mean()
    assert fpr < 4 / 512, f"epoch-0 fpr {fpr}"
    tf2 = TailFilter(5, 1.0 / 512, seed=11)
    tf2.add_batch(keys)
    fpr2 = tf2.contain_batch(neg).mean()
    assert fpr2 < 0.03, f"multi-epoch fpr {fpr2}"


def test_tail_filter_serde_and_merge():
    from cuckoofilter_ray.kernels import (TailFilter, deserialize, make_filter,
                                          serialize)
    tf = make_filter("tail", 2000, 7, bits_per_tag=12)
    assert isinstance(tf, TailFilter)
    keys = splitmix64(3000, seed=3)              # grows past sized capacity
    tf.add_batch(keys)
    g = deserialize(serialize(tf))
    probes = np.concatenate([keys, splitmix64(30_000, seed=4)])
    assert (g.contain_batch(probes) == tf.contain_batch(probes)).all()
    assert g.info() == tf.info()
    # merge of partials covers the union, stays query-identical after serde
    a = make_filter("tail", 1000, 9)
    b = make_filter("tail", 1000, 9)
    k1, k2 = splitmix64(800, seed=5), splitmix64(800, seed=6)
    a.add_batch(k1)
    b.add_batch(k2)
    a.merge(b)
    assert a.contain_batch(np.concatenate([k1, k2])).all()
    # merge at mismatched epochs: the smaller side upsizes a COPY
    c = make_filter("tail", 1000, 9)
    c.add_batch(splitmix64(3000, seed=8))        # force epochs
    d = make_filter("tail", 1000, 9)
    d.add_batch(k1)
    assert c.epoch > 0 and d.epoch == 0
    c.merge(d)
    assert d.epoch == 0, "merge must not mutate the other side"
    assert c.contain_batch(k1).all()


def test_quotient_dysect_multimap_roundtrip():
    """QuotientDysect stores (key,value) multimaps: FindExact after inserts
    and across little-array Upsizes (quotient-dysect.hpp:134-197, 401-437)."""
    from cuckoofilter_ray.kernels import QuotientDysect
    from cuckoofilter_ray.kernels.hashing import splitmix64 as sm
    cs = sm(6, seed=123)
    consts = [(int(cs[0]), int(cs[1]) | 1)]
    qd = QuotientDysect(12, 3, 2, 3, 2, 1, consts, seed=5)
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 1 << 12, 3000).tolist()
    # value 0 is indistinguishable from an empty slot (the reference's
    # ResultSetIterator skips value==0 too); TailFilter's terminator bit
    # keeps real values >= 1
    vals = rng.integers(1, 8, 3000).tolist()
    for k, v in zip(keys, vals):
        qd.insert(k, v)
    assert qd.ndv == 3000
    miss = sum(v not in qd.find_values(k) for k, v in zip(keys, vals))
    assert miss == 0, f"{miss} lost entries"
    # duplicate values under one key coexist (multimap, tail-filter.cpp:141)
    qd.insert(1, 2)
    qd.insert(1, 3)
    got = qd.find_values(1)
    assert 2 in got and 3 in got


def test_murmur2_and_superfast_reference_values():
    """Value-identical to HashUtil::MurmurHash / ::SuperFastHash — vectors
    generated from a g++ build of src/hashutil.cc (both seeds, empty,
    sub-word tails, high-bit bytes exercising the signed-char reads)."""
    from cuckoofilter_ray.kernels import murmur2_bytes, superfast_bytes
    tests = ["", "a", "ab", "abc", "abcd", "hello world",
             "The quick brown fox jumps over the lazy dog",
             b"\xff\xfe\x80 bytes", "0123456789abcdef"]
    ref = [                      # (len, murmur2@0, murmur2@0xdeadbeef, sfh)
        (0, 0x00000000, 0x5C8EFDB6, 0x00000000),
        (1, 0x92685F5E, 0x4B41757C, 0x115EA782),
        (2, 0x1AA14063, 0xF9697493, 0x516B8B44),
        (3, 0x13577C9B, 0xFBB7B030, 0xD2BE198A),
        (4, 0x26873021, 0xE11CB673, 0xDAD8B8DB),
        (11, 0x44A81419, 0x05929D59, 0xA68C6882),
        (43, 0x212729D0, 0x7C1B05FE, 0x05BF7CE3),
        (9, 0x7A265740, 0xC331ECD5, 0x6962EF42),
        (16, 0xCF9AF71A, 0x36728504, 0xA4E2281C),
    ]
    m0 = murmur2_bytes(tests, seed=0)
    m1 = murmur2_bytes(tests, seed=0xDEADBEEF)
    sf = superfast_bytes(tests)
    for i, (_, rm0, rm1, rsf) in enumerate(ref):
        assert m0[i] == rm0 and m1[i] == rm1 and sf[i] == rsf, tests[i]


def test_byte_hash_keying_families():
    """derive_keys byte_hash selection: deterministic uint64 keys from the
    murmur2/superfast families, distinct from sha256 keys."""
    from cuckoofilter_ray.functions.keys import add_content_keys
    import pyarrow as pa
    batch = pa.table({"content": ["alpha", "beta", "gamma", ""]})
    out = {}
    for fam in ("sha256", "murmur2", "superfast"):
        t = add_content_keys(batch, byte_hash=fam, sha_col="")
        out[fam] = t.column("key_hi64").to_pylist()
        assert len(set(out[fam])) == 4          # no collisions on tiny set
        t2 = add_content_keys(batch, byte_hash=fam, sha_col="")
        assert t2.column("key_hi64").to_pylist() == out[fam]
    assert out["sha256"] != out["murmur2"] != out["superfast"]


def test_blockedbloom_fixed_nonpow2_sizing_and_fpr():
    """SimdBlockFilterFixed parity: bucketCount = max(1, n/24) non-pow2
    blocks, FPR near the published 0.98% at ~10.7 bits/key
    (src/simd-block-fixed-fpp.h:71-78's sweep table)."""
    from cuckoofilter_ray.kernels import deserialize, make_filter, serialize
    n = 120_000
    f = make_filter("blockedbloom-fixed", n, seed=5)
    assert f.num_blocks == n // 24
    assert f.num_blocks & (f.num_blocks - 1) != 0, "should be non-pow2"
    keys = splitmix64(n, seed=6)
    f.add_batch(keys)
    assert f.contain_batch(keys).all()
    fpr = f.contain_batch(splitmix64(400_000, seed=7)).mean()
    assert 0.004 < fpr < 0.020, f"fixed-sizing fpr {fpr} vs published 0.0098"
    g = deserialize(serialize(f))
    probes = splitmix64(50_000, seed=8)
    assert (g.contain_batch(probes) == f.contain_batch(probes)).all()


def test_gcs_monotone_index_roundtrip_and_size():
    """MultiStageMonotoneList (gcs.h:114-237): exact roundtrip of bucket
    offsets, at-rest bits/item <= 10.5 at 8-bit fingerprints (VERDICT r2
    #9 done-criterion), serde answers identical."""
    from cuckoofilter_ray.kernels import GcsFilter, deserialize, serialize
    from cuckoofilter_ray.kernels.gcs import (monotone_pack, monotone_unpack,
                                              monotone_size_bytes)
    n = 60_000
    keys = splitmix64(n, seed=90)
    f = GcsFilter(n, bits_per_item=8, seed=91)
    f.add_all(keys)
    m = monotone_pack(f.starts)
    assert (monotone_unpack(m) == f.starts).all()
    assert monotone_size_bytes(m) < f.starts.nbytes / 3
    bits_per_item = f.size_in_bytes() * 8 / n
    assert bits_per_item <= 10.5, f"{bits_per_item} bits/item"
    g = deserialize(serialize(f))
    assert (g.starts == f.starts).all()
    probes = np.concatenate([keys, splitmix64(100_000, seed=92)])
    assert (g.contain_batch(probes) == f.contain_batch(probes)).all()
    assert g.contain_batch(keys).all()


def test_bobhash_and_spooky_reference_values():
    """Value-identical to HashUtil::BobHash (lookup3 hashlittle +
    hashlittle2 pair form) and ::SpookyHash (SpookyV2 Hash64) — vectors
    generated from a g++ build of src/hashutil.cc + src/SpookyV2.cpp.
    Lengths cover every lookup3 tail case, the spooky Short 32-byte-set /
    extra-16 / 0..15-tail branches, and the >=192-byte long form."""
    from cuckoofilter_ray.kernels import bobhash_bytes, spooky_bytes
    tests = ["", "a", "ab", "abc", "abcd", "hello", "hello world!",
             "0123456789ab", "0123456789abc",
             "the quick brown fox jumps over the lazy dog",
             "x" * 15, "y" * 16, "z" * 31, "w" * 32, "q" * 33, "m" * 95,
             "n" * 96, "p" * 191, "r" * 192, "s" * 193, "t" * 300, "u" * 500]
    ref = [  # (len, bob@0, bob@0xdeadbeef, pair_c@(7,13), pair_b, spooky@0,
             #  spooky@0x123456789abcdef)
        (0, 0xdeadbeef, 0xbd5b7dde, 0xdeadbf03, 0xdeadbef6,
         0x232706fc6bf50919, 0x8be724e4ce4a9a76),
        (1, 0x58d68708, 0xdd24f4fb, 0x07dbb124, 0x295dd8e1,
         0x1a108191a0bbc9bd, 0x122ad807d9b3b322),
        (2, 0xfbb3a8df, 0xa9eefaac, 0x46be9080, 0x13fb5037,
         0xf9dbb6ad202a090f, 0xd12db846bd6c7a4c),
        (3, 0x0e397631, 0x110255fd, 0x8d534769, 0x7cf3889e,
         0x8aab15f77537c967, 0xeb7b396612130a0e),
        (4, 0xb5f4889c, 0x6598132e, 0x532b2fcc, 0x061e51d9,
         0x5c6db4e0725121b4, 0x0f4f9cf61fe3c04e),
        (5, 0x34cbbc6e, 0x4989d858, 0xda03f71e, 0x3fbe392b,
         0x3768826ad382e6ca, 0x29d8710064f6abad),
        (12, 0x4b8946db, 0xe9d5d60c, 0xd8036099, 0x418d94d9,
         0xe077d41ddbfd8d8b, 0xc652ea74bf674a57),
        (12, 0x1065e50a, 0x369436fa, 0xd61aa0f9, 0x373528a2,
         0xc3fcc139e4c6832a, 0x78e332f5386f2e03),
        (13, 0x7351ce56, 0xaea695cf, 0xe5fc4ac1, 0x459210d9,
         0x86130593c7746a6f, 0x75bf7d4ef07c8b71),
        (43, 0x5e47fa15, 0x5f567d43, 0x6a7f9d61, 0xed78eb0a,
         0xdce4ba32ba242702, 0x94d75244dbb02f74),
        (15, 0x6a89b9e9, 0x7a05adc7, 0x4b6a3dd2, 0x5a1883b0,
         0x847e82eb06b8c660, 0x917a25c7448d85e5),
        (16, 0xcc8d56d4, 0x1a5e24bb, 0x9a2fdeb2, 0x1f55d3c8,
         0xa1fb53979f187404, 0x36cabb97310e41c9),
        (31, 0xb31bdd5f, 0x44fbd80c, 0xa450f358, 0x22d96091,
         0xfd07eeb6179d978f, 0xcb1cc30987a07686),
        (32, 0x0c8a63ae, 0xe4003432, 0xa866f942, 0x88804efd,
         0x2870af9c363be985, 0xf59dee524098f9bd),
        (33, 0x7bbc468f, 0x9dce8ba1, 0x0b2a6247, 0x026c1c36,
         0x936922778943add5, 0x6c6b78f2849f4a7f),
        (95, 0xf4354583, 0x6a977de4, 0x6537eeb4, 0x527f0ad7,
         0x70c4594fe23af247, 0xdf7c5166ac8e986c),
        (96, 0xf9bd3a82, 0x79083555, 0xbfa65abe, 0x162da483,
         0xd57c83d8bba8f9b2, 0xa767c2c3bd2f0149),
        (191, 0xde5537c5, 0xe87d3576, 0xbaa17679, 0xe2f408ba,
         0x5e8475f0f8e3cfbb, 0x5e585d3dc7ef13c2),
        (192, 0x8a198e79, 0x569f6e05, 0x3554d08c, 0xabd26aa4,
         0xefc407e667c488a2, 0x263d75cf8256482f),
        (193, 0xaff837ed, 0xd00b330d, 0x627bbda3, 0x4c16d701,
         0x709a4ea47d30bf9f, 0xb6464a5086aa2750),
        (300, 0x201cb849, 0x42844ce4, 0x4d5954e4, 0xf642bda0,
         0x0653848f0187f199, 0x25850b2aaeb57f2a),
        (500, 0xef02a1ea, 0xfb6c1fd6, 0x9155f287, 0xf964e236,
         0x717eafec5629e3ad, 0xdff626b70057bbed),
    ]
    b0 = bobhash_bytes(tests, seed=0)
    b1 = bobhash_bytes(tests, seed=0xDEADBEEF)
    pc, pb = bobhash_bytes(tests, seed=7, seed2=13)
    s0 = spooky_bytes(tests, seed=0)
    s1 = spooky_bytes(tests, seed=0x123456789ABCDEF)
    for i, (L, rb0, rb1, rc, rb, rs0, rs1) in enumerate(ref):
        assert len(tests[i].encode()) == L
        assert (b0[i], b1[i], pc[i], pb[i]) == (rb0, rb1, rc, rb), tests[i][:20]
        assert (int(s0[i]), int(s1[i])) == (rs0, rs1), tests[i][:20]


def test_bob_spooky_keying_families():
    """derive_keys byte_hash='bob'/'spooky': deterministic uint64 keys,
    bob = hashlittle2's documented c + (b<<32) doubling."""
    from cuckoofilter_ray.functions.keys import add_content_keys
    from cuckoofilter_ray.kernels import bobhash_bytes, spooky_bytes
    import pyarrow as pa
    texts = ["alpha", "beta", "gamma", "", "x" * 200]
    batch = pa.table({"content": texts})
    got_bob = add_content_keys(batch, byte_hash="bob", sha_col="") \
        .column("key_hi64").to_pylist()
    c, b = bobhash_bytes(texts, seed=0, seed2=0)
    assert got_bob == [int(ci) + (int(bi) << 32) for ci, bi in zip(c, b)]
    got_sp = add_content_keys(batch, byte_hash="spooky", sha_col="") \
        .column("key_hi64").to_pylist()
    assert got_sp == [int(v) for v in spooky_bytes(texts, seed=0)]
    assert len(set(got_bob)) == len(set(got_sp)) == 5


def test_qd_upsize_to_matches_chained_upsize_bulk():
    """upsize_to(k) must reproduce the sizes/capacity/log_little of k
    chained upsize_bulk calls AND preserve the entry set, from a non-fresh
    QD state (entries already placed)."""
    from cuckoofilter_ray.kernels.tail import QuotientDysect
    import numpy as np
    consts = [(3, 5), (7, 9), (11, 13)]
    keys = splitmix64(3000, seed=41) >> np.uint64(64 - 14)
    vals = (splitmix64(3000, seed=43) & np.uint64(15)) | np.uint64(1)

    def fresh():
        qd = QuotientDysect(14, 5, 4, 3, 2, 1, consts, seed=9)
        qd.insert_bulk(keys[:500], vals[:500])
        return qd

    for k in (1, 7, 32, 64, 140):
        a, b = fresh(), fresh()
        base_entries = sorted(zip(*map(lambda x: x.tolist(),
                                       a.entries_arrays())))
        for _ in range(k):
            b.upsize_bulk()
        a.upsize_to(k)
        assert a.capacity == b.capacity, k
        assert a.log_little == b.log_little, k
        sa = [[len(a.payload[p][q]) for q in range(1 << a.w)]
              for p in range(a.d)]
        sb = [[len(b.payload[p][q]) for q in range(1 << b.w)]
              for p in range(b.d)]
        assert sa == sb, k
        ea = sorted(zip(*map(lambda x: x.tolist(), a.entries_arrays())))
        eb = sorted(zip(*map(lambda x: x.tolist(), b.entries_arrays())))
        assert ea == eb == base_entries, k


def test_bloom_scatter_path_matches_ufunc_path():
    """The big-batch boolean-scatter adds must produce the exact word/lane
    arrays of the small-batch ufunc.at path, for both bloom kinds."""
    from cuckoofilter_ray.kernels.bloom import (BlockedBloomFilter,
                                                BloomFilter)
    import numpy as np
    keys = splitmix64(200_000, seed=77)
    for cls, bits in ((BloomFilter, 12), (BlockedBloomFilter, 8)):
        big = cls.create(200_000, bits_per_item=bits, seed=5)
        big.add_batch(keys)                       # scatter path
        small = cls.create(200_000, bits_per_item=bits, seed=5)
        for s in range(0, len(keys), 500):        # ufunc.at path
            small.add_batch(keys[s:s + 500])
        a1 = big.words if hasattr(big, "words") else big.lanes
        a2 = small.words if hasattr(small, "words") else small.lanes
        assert np.array_equal(a1, a2), cls.__name__
        assert big.contain_batch(keys).all()


def test_misra_gries_guarantees_merge_serde():
    """MG one-sided bound (est ≤ true ≤ est + offset, offset ≤ n/(k+1)),
    true-HH retention, mergeable-summaries tree merge, serde roundtrip."""
    from collections import Counter
    from cuckoofilter_ray.kernels.sketches import MisraGries
    rng = np.random.default_rng(71)
    stream = rng.zipf(1.25, 120_000).astype(np.uint64)
    true = Counter(stream.tolist())
    k = 48
    s = MisraGries(k=k)
    for i in range(0, len(stream), 7_000):       # uneven batch folds
        s.add_batch(stream[i:i + 7_000])
    n = len(stream)
    bound = n / (k + 1)
    assert s.n == n and len(s.keys) <= k
    assert s.offset <= bound
    uk = np.fromiter(true.keys(), dtype=np.uint64)
    tv = np.fromiter((true[int(x)] for x in uk), dtype=np.int64)
    est = s.estimate_batch(uk)
    assert (est <= tv).all() and (tv <= est + s.offset).all()
    hh = uk[tv > bound]
    assert (s.estimate_batch(hh) > 0).all(), "true heavy hitter dropped"
    assert set(hh.tolist()) <= set(s.candidates(bound).tolist())
    # 8-way tree merge preserves the combined bound and HH retention
    parts = [MisraGries(k=k) for _ in range(8)]
    for i, p in enumerate(parts):
        p.add_batch(stream[i::8])
    while len(parts) > 1:
        parts = [parts[j].merge(parts[j + 1])
                 for j in range(0, len(parts), 2)]
    m = parts[0]
    assert m.n == n and m.offset <= bound
    assert (m.estimate_batch(hh) > 0).all()
    est_m = m.estimate_batch(uk)
    assert (est_m <= tv).all() and (tv <= est_m + m.offset).all()
    # serde
    r = MisraGries.from_bytes(s.to_bytes())
    assert (r.keys == s.keys).all() and (r.counts == s.counts).all()
    assert (r.n, r.offset, r.k) == (s.n, s.offset, s.k)


def test_kll_rank_bound_on_adversarial_streams():
    """KLL's rank_error_bound must hold on hostile inputs — fully sorted,
    reversed, constant, bimodal with a 1e9 gap, and four-value heavy-dup
    streams — under random shard partitioning and merge order (the shapes
    a distributed pipeline actually feeds it)."""
    import numpy as np
    from cuckoofilter_ray.kernels.sketches import KLLSketch

    rng = np.random.default_rng(606)
    n = 20_000
    streams = {
        "sorted": np.arange(n, dtype=np.float64),
        "reversed": np.arange(n, dtype=np.float64)[::-1].copy(),
        "constant": np.full(n, 7.25),
        "bimodal": np.concatenate([np.zeros(n // 2),
                                   np.ones(n - n // 2) * 1e9]),
        "heavydup": rng.choice([1.0, 2.0, 3.0, 4.0], size=n),
    }
    for name, data in streams.items():
        parts = np.array_split(rng.permutation(data),
                               int(rng.integers(1, 13)))
        seed = int(rng.integers(1e9))
        sks = []
        for p in parts:
            s = KLLSketch(k=200, seed=seed)
            s.add_batch(p)
            sks.append(s)
        m = sks[0]
        for s in sks[1:]:
            m = m.merge(s)
        bound = m.rank_error_bound()
        srt = np.sort(data)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = float(np.atleast_1d(m.quantile(q))[0])
            lo = np.searchsorted(srt, est, side="left") / n
            hi = np.searchsorted(srt, est, side="right") / n
            err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
            assert err <= bound + 1e-9, \
                f"{name} q={q}: rank err {err:.4f} > bound {bound:.4f}"


def test_shingle_duplicate_heavy_batch_terminates_fast():
    """A large duplicate-heavy batch (~50% dup rate, Poisson tail with >4
    copies of many keys) drives thousands of infeasible chains; the
    vectorized direct-park path must handle them in bulk.  Before it, each
    such chain burned the full sequential kick budget one scalar splitmix
    call at a time (~2 min at this size); the wall bound is a loose 60x
    margin over the fixed path so host throttling can't flake it."""
    import time
    from cuckoofilter_ray.kernels import ShingleFilter
    rng = np.random.default_rng(1)
    n = 65537
    base = rng.integers(1, 2**63, size=n // 2 + 1, dtype=np.uint64)
    keys = base[rng.integers(0, len(base), size=n)]
    f = ShingleFilter.create(n, seed=42, hash_family="mix")
    t0 = time.perf_counter()
    res = f.add_batch(keys)
    assert time.perf_counter() - t0 < 20.0
    assert res.ok + res.overflow == n
    assert res.overflow == len(f.victims) and f.filled == res.ok
    assert f.contain_batch(keys).all()          # parked tails stay queryable
    # every parked fingerprint really is unplaceable-or-parked, never lost:
    # deleting a key with parked copies drains slots then victims
    from collections import Counter
    hot = Counter(keys.tolist()).most_common(1)[0]
    assert hot[1] > 4                           # the Poisson tail exists
    drained = sum(f.delete(int(hot[0])) for _ in range(hot[1] + 1))
    assert drained == hot[1]


def test_tdigest_rank_bound_on_adversarial_streams():
    """t-digest's q-dependent rank_error_bound must hold on hostile inputs
    (sorted, reversed, constant, bimodal 1e9 gap, heavy-dup, lognormal
    heavy tail) under random shard partitioning and merge order, INCLUDING
    the extreme quantiles the asin scale exists for; total weight must be
    conserved exactly; serde must round-trip through the merge tree."""
    import numpy as np
    from cuckoofilter_ray.kernels.sketches import TDigest

    rng = np.random.default_rng(909)
    n = 20_000
    streams = {
        "sorted": np.arange(n, dtype=np.float64),
        "reversed": np.arange(n, dtype=np.float64)[::-1].copy(),
        "constant": np.full(n, 7.25),
        "bimodal": np.concatenate([np.zeros(n // 2),
                                   np.ones(n - n // 2) * 1e9]),
        "heavydup": rng.choice([1.0, 2.0, 3.0, 4.0], size=n),
        "lognormal": rng.lognormal(0, 3, size=n),
    }
    for name, data in streams.items():
        parts = np.array_split(rng.permutation(data),
                               int(rng.integers(1, 13)))
        sks = []
        for p in parts:
            s = TDigest(delta=200)
            s.add_batch(p)
            sks.append(TDigest.from_bytes(s.to_bytes(), 200))  # serde
        m = sks[0]
        for s in sks[1:]:
            m = m.merge(s)
        assert m.total_weight() == n, name
        assert m.vmin == float(np.min(data))
        assert m.vmax == float(np.max(data))
        srt = np.sort(data)
        for q in (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
            est = float(np.atleast_1d(m.quantile(q))[0])
            lo = np.searchsorted(srt, est, side="left") / n
            hi = np.searchsorted(srt, est, side="right") / n
            err = max(lo - q, q - hi, 0.0)
            bound = float(m.rank_error_bound(q))
            assert err <= bound + 1e-9, \
                f"{name} q={q}: rank err {err:.5f} > bound {bound:.5f}"


def test_tdigest_tails_beat_uniform_band_and_edge_cases():
    """The reason t-digest exists next to KLL: at equal-ish space its p999
    band (2/delta = 0.01 at delta=200) undercuts KLL(k=256)'s uniform
    ~0.031 — assert the promised band holds on a heavy-tailed stream at
    p999/p001.  Also pin the edge cases: empty digest → NaN, nan inputs
    dropped, delta mismatch on merge raises, quantile is monotone in q."""
    import numpy as np
    import pytest
    from cuckoofilter_ray.kernels.sketches import TDigest

    rng = np.random.default_rng(17)
    data = rng.pareto(1.5, size=100_000)
    s = TDigest(delta=200)
    s.add_batch(data)
    srt = np.sort(data)
    for q in (0.001, 0.999):
        est = float(np.atleast_1d(s.quantile(q))[0])
        lo = np.searchsorted(srt, est, side="left") / len(srt)
        hi = np.searchsorted(srt, est, side="right") / len(srt)
        assert max(lo - q, q - hi, 0.0) <= 0.01
    qs = np.linspace(0, 1, 101)
    est = s.quantile(qs)
    assert np.all(np.diff(est) >= 0)
    assert est[0] == s.vmin and est[-1] == s.vmax

    empty = TDigest(delta=100)
    assert np.isnan(empty.quantile(0.5))
    withnan = TDigest(delta=100)
    withnan.add_batch(np.array([1.0, np.nan, 3.0]))
    assert withnan.total_weight() == 2
    with pytest.raises(ValueError):
        TDigest(delta=100).merge(TDigest(delta=200))
    # merging an empty digest is a no-op
    s2 = TDigest.from_bytes(s.to_bytes(), 200)
    s2.merge(TDigest(delta=200))
    assert s2.total_weight() == s.total_weight()


def test_corpus_vectorized_content_matches_scalar():
    """The vectorized corpus content builder is byte-identical to the
    scalar reference `_make_content` (duplicate rows must reproduce their
    source row's content EXACTLY — the dedup ground truth depends on it),
    including non-multiple-of-8 word counts and the empty batch."""
    from cuckoofilter_ray.sources.corpus import (_make_content,
                                                 _make_contents_vec)
    rng = np.random.default_rng(3)
    ids = np.concatenate([np.arange(64), rng.integers(0, 2**31, 512)]) \
        .astype(np.uint64)
    for n_words in (60, 12, 5, 8):
        got = _make_contents_vec(ids, seed=42, n_words=n_words).to_pylist()
        want = [_make_content(int(c), 42, n_words) for c in ids]
        assert got == want, f"n_words={n_words}"
    assert len(_make_contents_vec(ids[:0], seed=42)) == 0


def test_tdigest_cdf_inverse_and_interval():
    """cdf(x) must land inside (or within the rank band of) x's true rank
    interval on hostile streams, and must invert quantile() on continuous
    data.  On duplicated mass the true rank is an INTERVAL — cdf returns
    its interpolated midpoint, so the check is interval distance, not
    point equality."""
    import numpy as np
    from cuckoofilter_ray.kernels.sketches import TDigest

    rng = np.random.default_rng(44)
    streams = {
        "normal": rng.normal(0, 1, 300_000),
        "pareto": rng.pareto(1.5, 300_000),
        "constant": np.full(50_000, 7.0),
        "heavydup": rng.choice([1.0, 2.0, 3.0, 4.0], 200_000),
    }
    for name, vals in streams.items():
        s = TDigest(200)
        s.add_batch(vals)
        srt = np.sort(vals)
        probes = np.unique(np.quantile(
            vals, [0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999]))
        for x in probes:
            est = s.cdf(float(x))
            lo = np.searchsorted(srt, x, "left") / len(srt)
            hi = np.searchsorted(srt, x, "right") / len(srt)
            err = max(lo - est, est - hi, 0.0)
            q = min(max((lo + hi) / 2, 1e-9), 1 - 1e-9)
            assert err <= float(s.rank_error_bound(q)) + 1e-9, \
                (name, x, est, lo, hi)
        if name in ("normal", "pareto"):     # continuous: cdf inverts quantile
            for q in (0.01, 0.5, 0.99):
                r = s.cdf(s.quantile(q))
                assert abs(r - q) <= 2 * float(s.rank_error_bound(q)) + 1e-6
    # vectorized + edge forms
    s = TDigest(100)
    assert np.isnan(s.cdf(1.0))
    s.add_batch(np.array([5.0]))
    assert s.cdf(4.0) == 0.0 and s.cdf(6.0) == 1.0
    out = streams and TDigest(200)
    out.add_batch(streams["normal"])
    v = out.cdf(np.array([-10.0, 0.0, 10.0]))
    assert v[0] == 0.0 and v[2] == 1.0 and 0.4 < v[1] < 0.6
    assert np.all(np.diff(out.cdf(np.linspace(-3, 3, 50))) >= 0)
