"""NBitArray / UInt12Array storage parity and the XorFilter2 variant.

Parity vectors pinned from a g++ -O2 build of
``/root/reference/src/nbit_array.h``: bulkSet of 1000 splitmix64(seed=42)
values masked to the entry width, then FNV-1a 64 over the FULL storage
buffer (layout parity, not just value roundtrip) plus getByteCount.
"""

import numpy as np
import pytest

from cuckoofilter_ray.kernels.nbit import NBitArray, UInt12Array, storage_for
from cuckoofilter_ray.kernels.xor import XorFilter, XorFilter2
from cuckoofilter_ray.kernels import serde


def _splitmix_seq(n: int, s: int = 42) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    state = s
    for i in range(n):
        state = (state + 0x9E3779B97F4A7C15) & (2 ** 64 - 1)
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2 ** 64 - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2 ** 64 - 1)
        out[i] = z ^ (z >> 31)
    return out


def _fnv(buf) -> int:
    h = 1469598103934665603
    for byte in bytes(buf):
        h ^= byte
        h = (h * 1099511628211) & (2 ** 64 - 1)
    return h


# (ctor, bits, pinned buffer FNV, pinned getByteCount) — g++ run, see module doc
_PINS = [
    (lambda: UInt12Array(1000), 12, 0xF30EB1F9865800CC, 1532),
    (lambda: NBitArray(1000, 10), 10, 0x8D1A0E5F19A159D8, 1272),
    (lambda: NBitArray(1000, 12), 12, 0xA0D53BB422C55859, 1520),
    (lambda: NBitArray(1000, 14), 14, 0x56515AE545267217, 1768),
]


@pytest.mark.parametrize("ctor,bits,want_fnv,want_bytes", _PINS)
def test_buffer_byte_parity_vs_reference(ctor, bits, want_fnv, want_bytes):
    arr = ctor()
    vals = (_splitmix_seq(1000) & ((1 << bits) - 1)).astype(np.uint16)
    arr.bulk_set(vals)
    assert arr.get_byte_count() == want_bytes
    assert _fnv(arr.data) == want_fnv
    got = arr.get_batch(np.arange(1000))
    assert (got == vals).all()


@pytest.mark.parametrize("bits", [4, 7, 10, 11, 12, 13, 14, 16])
def test_nbit_roundtrip_random(bits):
    rng = np.random.default_rng(bits)
    n = 777
    vals = rng.integers(0, 1 << bits, n, dtype=np.uint16)
    arr = NBitArray(n, bits)
    arr.bulk_set(vals)
    idx = rng.permutation(n)
    assert (arr.get_batch(idx) == vals[idx]).all()


def test_uint12_roundtrip_odd_length():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 12, 333, dtype=np.uint16)   # odd count
    arr = UInt12Array(333)
    arr.bulk_set(vals)
    assert (arr.get_batch(np.arange(333)) == vals).all()


def test_storage_for_choices():
    assert isinstance(storage_for(12, 10), UInt12Array)
    assert isinstance(storage_for(10, 10), NBitArray)
    assert isinstance(storage_for(12, 10, layout="nbit"), NBitArray)
    with pytest.raises(ValueError):
        storage_for(10, 10, layout="uint12")


@pytest.mark.parametrize("bits", [10, 12, 14])
def test_xor2_membership_and_fpr(bits):
    rng = np.random.default_rng(17)
    keys = rng.integers(0, 2 ** 63, 60000, dtype=np.uint64)
    probe = rng.integers(0, 2 ** 63, 400000, dtype=np.uint64)
    f = XorFilter2(len(keys), bits_per_tag=bits, seed=99)
    f.add_all(keys)
    assert f.contain_batch(keys).all()                     # zero FN
    fpr = f.contain_batch(probe).mean()
    assert fpr < 4.0 * 2.0 ** -bits                        # near 2^-bits


def test_xor2_sizing_tighter_than_xor():
    # 3 + 1.23n (xorfilter_2.h:76) vs 32 + 1.23n: packed bytes shrink and
    # SizeInBytes reports the packed storage footprint
    n = 10000
    f2 = XorFilter2(n, bits_per_tag=12)
    f1 = XorFilter(n, bits_per_tag=16)
    assert 3 * f2.block_length <= 3 * f1.block_length
    # UInt12Array byteCount formula (nbit_array.h:42)
    assert f2.size_in_bytes() == (3 * f2.block_length) * 3 // 2 + 32
    assert f2.bits_per_item() == pytest.approx(
        8.0 * f2.size_in_bytes() / n, abs=1e-9) or f2.num_items == 0


@pytest.mark.parametrize("bits,codec", [(10, "nbit"), (12, "uint12"),
                                        (14, "nbit")])
def test_xor2_serde_roundtrip(bits, codec):
    rng = np.random.default_rng(bits)
    keys = rng.integers(0, 2 ** 63, 20000, dtype=np.uint64)
    probe = rng.integers(0, 2 ** 63, 50000, dtype=np.uint64)
    f = XorFilter2(len(keys), bits_per_tag=bits, seed=7)
    f.add_all(keys)
    row = serde.filter_to_row(f, group_key="g", packed=True)
    assert row["kind"] == "xor2" and row["codec"] == codec
    g = serde.row_to_filter(row)
    assert g.contain_batch(keys).all()
    assert (g.contain_batch(probe) == f.contain_batch(probe)).all()
    # hot (raw) form too
    row2 = serde.filter_to_row(f, group_key="g", packed=False)
    h = serde.row_to_filter(row2)
    assert (h.fingerprints == f.fingerprints).all()


def test_make_filter_xor2():
    f = serde.make_filter("xor2", 1000, seed=3, bits_per_tag=10)
    assert isinstance(f, XorFilter2) and f.bits_per_tag == 10
