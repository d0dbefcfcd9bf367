"""Filter ⇄ columnar-row serialization (the engine's Serialize/Deserialize).

The reference persists a filter as raw victim bytes + bucket bytes + hasher
seeds (``src/cuckoofilter.h:104-119``, ``src/singletable.h:67-78``).  The
engine's equivalent is a **columnar filter-shard row** (FIXTURES.md F4):

    (group_key, shard_id, kind, variant, bits_per_tag, num_buckets,
     num_items, victim_index, victim_tag, victim_used, seed, table_bytes)

which becomes one row of a filter-shard ``ray.data.Dataset`` and is written /
read as Parquet — doubling as the checkpoint format (SURVEY.md §4.3.4).

``table_bytes`` is bit-packed at the true tag width (value-parity with the
reference's ``SizeInBytes``): generic packing for cuckoo/bloom kinds, the
semi-sorted 6-byte-bucket codec for ``kind="semisort"``.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np

from .bloom import BlockedBloomFilter, BloomFilter
from .counting import CountingQuotientFilter
from .crate import CrateFilter
from .gcs import GcsFilter
from .growbloom import GrowBlockedBloomFilter
from .shingle import ShingleFilter
from .tail import TailFilter
from .cuckoo import CuckooFilter
from .xor import XorFilter, XorFilter2
from .xorplus import XorFilter2n, XorFilterPlus
from . import semisort

_CHUNK = 1 << 20


def pack_bits(values: np.ndarray, bits: int) -> bytes:
    """Bit-pack uint16 values at ``bits`` width, little-endian bit order."""
    values = np.ascontiguousarray(values.ravel(), dtype=np.uint16)
    out = []
    shifts = np.arange(bits, dtype=np.uint16)
    for start in range(0, len(values), _CHUNK):
        chunk = values[start:start + _CHUNK]
        bitmat = ((chunk[:, None] >> shifts) & 1).astype(np.uint8)
        out.append(np.packbits(bitmat.ravel(), bitorder="little").tobytes())
    return b"".join(out)


def unpack_bits(data: bytes, bits: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` (returns ``count`` uint16 values)."""
    bitarr = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                           bitorder="little")[:count * bits]
    bitmat = bitarr.reshape(count, bits).astype(np.uint16)
    shifts = np.arange(bits, dtype=np.uint16)
    return (bitmat << shifts).sum(axis=1, dtype=np.uint16)


def filter_to_row(filt: Any, group_key: str = "", shard_id: int = 0,
                  kind: str | None = None, packed: bool = True) -> dict:
    """One filter → one columnar shard-row dict (Arrow-compatible scalars).

    ``packed=True`` (checkpoint/at-rest form) bit-packs ``table_bytes`` at the
    true tag width — value parity with the reference's ``SizeInBytes``.
    ``packed=False`` (hot accumulator form, used by the mergeable UDAFs whose
    combine runs thousands of times per reduce) stores raw little-endian
    uint16 tags: ~5× cheaper to encode/decode, 25% larger at 12-bit tags.
    """
    if isinstance(filt, CuckooFilter):
        k = kind or ("semisort" if filt.bits_per_tag == 13 else "cuckoo")
        if not packed:
            table_bytes = np.ascontiguousarray(filt.tags).tobytes()
        elif k == "semisort":
            if filt.bits_per_tag != 13:
                raise ValueError("semisort codec is defined for 13-bit tags")
            table_bytes = semisort.pack_buckets(filt.tags)
        else:
            table_bytes = pack_bits(filt.tags, filt.bits_per_tag)
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": k,
            "codec": ("pack" if packed else "raw16"),
            "variant": filt.variant, "bits_per_tag": filt.bits_per_tag,
            "num_buckets": filt.num_buckets, "num_items": filt.num_items,
            "victim_index": int(filt.victim_index), "victim_tag": int(filt.victim_tag),
            "victim_used": bool(filt.victim_used), "seed": int(filt.seed),
            "hash_family": filt.hash_family,
            "table_bytes": table_bytes,
        }
    if isinstance(filt, BloomFilter):
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "bloom",
            "variant": "", "bits_per_tag": filt.bits_per_item,
            "num_buckets": filt.array_length, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": 0, "victim_used": False,
            "seed": int(filt.seed), "hash_family": filt.hash_family,
            "table_bytes": filt.words.tobytes(),
        }
    if isinstance(filt, BlockedBloomFilter):
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "blockedbloom",
            "variant": "", "bits_per_tag": filt.bits_per_item,
            "num_buckets": filt.num_blocks, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": 0, "victim_used": False,
            "seed": int(filt.seed), "table_bytes": filt.lanes.tobytes(),
        }
    if isinstance(filt, CountingQuotientFilter):
        # variant carries the hash family; bits_per_tag the qbits;
        # table_bytes = sorted masked hashes (uint64 LE) ++ counts (int64 LE).
        # The hot (packed=False) broadcast form ships the arrays as numpy —
        # one plasma copy per node, zero-copy per worker (reads only; any
        # mutation allocates fresh arrays in _merge_sorted).
        row = {
            "group_key": group_key, "shard_id": shard_id, "kind": "counting",
            "variant": filt.hash_family, "bits_per_tag": filt.qbits,
            "num_buckets": filt.nslots, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": 0, "victim_used": False,
            "seed": int(filt.seed),
            "table_bytes": b"",
        }
        if packed:
            # chunked-Rice compressed at-rest codec (~12-14 bits/item)
            row["codec"] = "rice"
            row["table_bytes"] = filt.pack_payload()
        else:
            row["hashes_np"] = filt.hashes
            row["counts_np"] = filt.counts
        return row
    if isinstance(filt, ShingleFilter):
        # A then B: bit-packed at 12 bits/slot at rest (3 bytes per cell
        # pair, parity with shingle.h:170 SizeInBytes); raw uint16 in the
        # hot accumulator/broadcast form
        both = np.concatenate([filt.A, filt.B])
        row = {
            "group_key": group_key, "shard_id": shard_id, "kind": "shingle",
            "codec": ("pack" if packed else "raw16"),
            "variant": "", "bits_per_tag": 12,
            "num_buckets": filt.imask + 1, "num_items": filt.num_items,
            "victim_index": filt.log2_slots, "victim_tag": 0,
            "victim_used": False, "seed": int(filt.seed),
            "hash_family": filt.hash_family,
            "table_bytes": (pack_bits(both, 12) if packed
                            else np.ascontiguousarray(both).tobytes()),
        }
        if filt.victims:            # parked chain tails (rare; see shingle.py)
            row["parked_np"] = np.asarray(filt.victims,
                                          dtype=np.int64).ravel()
        return row
    if isinstance(filt, GcsFilter):
        # table_bytes = rice stream ++ uint32 bucket-start bit offsets;
        # victim_index = stream byte length (split point), victim_tag =
        # stream bit length.  The hot (packed=False) broadcast form ALSO
        # carries the driver-decoded probe index as a numpy array — via
        # ray.put it lands in plasma once per node and every worker maps it
        # zero-copy instead of re-decoding the stream (the decode-per-worker
        # cost is the whole reason to pre-share it).
        from .gcs import monotone_pack
        if packed and filt._built:
            # at-rest: bucket starts via the 3-level monotone list
            # (gcs.h:114-237) instead of raw uint32 — ~5-7 bits/bucket
            index_bytes = pickle.dumps(monotone_pack(filt.starts),
                                       protocol=pickle.HIGHEST_PROTOCOL)
            codec = "monotone"
        else:
            index_bytes = filt.starts.astype("<u4").tobytes()
            codec = "rawu32"
        row = {
            "group_key": group_key, "shard_id": shard_id, "kind": "gcs",
            "variant": "built" if filt._built else "", "codec": codec,
            "bits_per_tag": filt.bits_per_item,
            "num_buckets": filt.bucket_count, "num_items": filt.num_items,
            "victim_index": len(filt.stream), "victim_tag": filt.stream_bits,
            "victim_used": False, "seed": int(filt.seed),
            "hash_family": filt.hash_family,
            "table_bytes": filt.stream + index_bytes,
        }
        if not packed and filt._built:
            row["decoded_index"] = filt._decode()
        return row
    if isinstance(filt, GrowBlockedBloomFilter):
        # levels are geometry-derivable from (initial_bytes, level index);
        # table_bytes pickles the per-level lane arrays + the open TTL
        payload = pickle.dumps({
            "initial_bytes": filt.initial_bytes, "epsilon": filt.epsilon,
            "ttl": filt.ttl,
            "lanes": [f.lanes.tobytes() for f in filt.levels],
            "level_items": [f.num_items for f in filt.levels],
        }, protocol=pickle.HIGHEST_PROTOCOL)
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "growbloom",
            "variant": "", "bits_per_tag": 8,
            "num_buckets": filt.initial_bytes, "num_items": filt.num_items,
            "victim_index": len(filt.levels), "victim_tag": 0,
            "victim_used": False, "seed": int(filt.seed),
            "table_bytes": payload,
        }
    if isinstance(filt, TailFilter):
        # dynamic structure (per-little-array growth state + epoch +
        # optional bitset): pickled state blob with each slot array
        # BIT-PACKED at its true width (slot-array.hpp parity — raw uint64
        # would be ~4x the honest SpaceUsed)
        from .gcs import pack_width64
        qd = filt.qd

        def _pack(a):
            ell = qd.log_little + (len(a) > (1 << qd.log_little))
            width = qd.s + qd.v + max(0, qd.k - qd.w - ell)
            return (len(a), width, pack_width64(a, width))

        payload = pickle.dumps({
            "lgm": filt.lgm, "epsilon": filt.epsilon, "epoch": filt.epoch,
            "ndv": filt.ndv, "hash_consts": filt.hash_consts,
            "qd": {"k": qd.k, "log_little": qd.log_little,
                   "capacity": qd.capacity, "ndv": qd.ndv,
                   "rand_n": qd._rand_n,
                   "payload": [[_pack(a) for a in row]
                               for row in qd.payload]},
            "bitset": None if filt.bitset is None else
            np.packbits(filt.bitset).tobytes(),
            "bitset_len": 0 if filt.bitset is None else len(filt.bitset),
        }, protocol=pickle.HIGHEST_PROTOCOL)
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "tail",
            "variant": "", "bits_per_tag": filt.lgme - filt.lgm,
            "num_buckets": filt.qd.capacity, "num_items": filt.ndv,
            "victim_index": filt.epoch, "victim_tag": filt.lgm,
            "victim_used": False, "seed": int(filt.seed),
            "hash_family": filt.hash_family,
            "table_bytes": payload,
        }
    if isinstance(filt, CrateFilter):
        # table_bytes = 64-byte PD blocks (the reference's exact at-rest
        # layout, crate.h:331-392) ++ spare payload (uint32 LE blocks of
        # 16).  victim_index = PD split point, victim_tag = spare block
        # capacity, victim_used = spare has_zero.  The hot (packed=False)
        # broadcast form ships the sorted fps / counts / spare arrays as
        # numpy for zero-copy plasma reads.
        row = {
            "group_key": group_key, "shard_id": shard_id, "kind": "crate",
            "variant": "", "bits_per_tag": 8,
            "num_buckets": filt.bucket_count, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": filt.spare.capacity,
            "victim_used": bool(filt.spare.has_zero), "seed": int(filt.seed),
            "table_bytes": b"",
        }
        if packed:
            blocks = filt.pack_blocks()
            row["victim_index"] = len(blocks)
            row["table_bytes"] = blocks + filt.spare.payload.tobytes()
        else:
            row["fps_np"] = filt.fps
            row["counts_np"] = filt.counts
            row["spare_np"] = filt.spare.payload
        return row
    if isinstance(filt, XorFilter2n):
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "xor2n",
            "variant": "built" if filt._built else "",
            "bits_per_tag": filt.bits_per_tag,
            "num_buckets": filt.block_length, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": 0, "victim_used": False,
            "seed": int(filt.build_seed),
            "table_bytes": filt.fingerprints.tobytes(),
        }
    if isinstance(filt, XorFilterPlus):
        # seg01 fingerprints ++ packed third-segment bitmap ++ dense third
        # segment; victim_index/victim_tag carry the two split points
        seg01 = filt.fingerprints.tobytes()
        bmp = filt.bitmap_bits.tobytes()
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "xorplus",
            "variant": "built" if filt._built else "",
            "bits_per_tag": filt.bits_per_tag,
            "num_buckets": filt.block_length, "num_items": filt.num_items,
            "victim_index": len(seg01), "victim_tag": len(bmp),
            "victim_used": False, "seed": int(filt.build_seed),
            "table_bytes": seg01 + bmp + filt.dense3.tobytes(),
        }
    if isinstance(filt, XorFilter2):
        # codec carries the resolved storage layout (uint12 | nbit,
        # src/nbit_array.h); packed=True stores the reference's exact packed
        # buffer, packed=False the raw in-memory fingerprint array
        layout = "uint12" if (filt.layout == "uint12"
                              or (filt.layout == "auto"
                                  and filt.bits_per_tag == 12)) else "nbit"
        if packed:
            table_bytes = filt.packed_storage().data.tobytes()
        else:
            table_bytes = np.ascontiguousarray(filt.fingerprints).tobytes()
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "xor2",
            "codec": layout if packed else "raw",
            "variant": "built" if filt._built else "",
            "bits_per_tag": filt.bits_per_tag,
            "num_buckets": filt.block_length, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": 0, "victim_used": False,
            "seed": int(filt.build_seed), "table_bytes": table_bytes,
        }
    if isinstance(filt, XorFilter):
        # seed column carries the successful build seed; num_buckets the
        # block length (capacity is recoverable only approximately — rows
        # rebuild via the stored geometry, not the constructor)
        return {
            "group_key": group_key, "shard_id": shard_id, "kind": "xor",
            "variant": "built" if filt._built else "", "bits_per_tag": filt.bits_per_tag,
            "num_buckets": filt.block_length, "num_items": filt.num_items,
            "victim_index": 0, "victim_tag": 0, "victim_used": False,
            "seed": int(filt.build_seed), "table_bytes": filt.fingerprints.tobytes(),
        }
    raise TypeError(f"unknown filter type {type(filt)!r}")


def row_to_filter(row: dict) -> Any:
    """Shard-row dict → live kernel object (src/cuckoofilter.h:111-119 analog)."""
    kind = row["kind"]
    if kind in ("cuckoo", "semisort"):
        f = CuckooFilter(int(row["num_buckets"]), int(row["bits_per_tag"]),
                         seed=int(row["seed"]), variant=row["variant"] or "pow2",
                         hash_family=row.get("hash_family", "mix"))
        nb = f.num_buckets
        if row.get("codec", "pack") == "raw16":
            # raw16 rows come from live filters, whose tags are always
            # compact — just recount occupancy.
            f.tags = np.frombuffer(row["table_bytes"], dtype=np.uint16) \
                .reshape(nb, 4).copy()
            f.occ = (f.tags != 0).sum(axis=1).astype(np.uint8)
        elif kind == "semisort":
            f.tags = semisort.unpack_buckets(row["table_bytes"], nb)
            f.recompact()
        else:
            f.tags = unpack_bits(row["table_bytes"], f.bits_per_tag,
                                 nb * 4).reshape(nb, 4)
            f.recompact()
        f.num_items = int(row["num_items"])
        f.victim_index = int(row["victim_index"])
        f.victim_tag = int(row["victim_tag"])
        f.victim_used = bool(row["victim_used"])
        return f
    if kind == "bloom":
        f = BloomFilter(0, bits_per_item=int(row["bits_per_tag"]),
                        seed=int(row["seed"]), array_length=int(row["num_buckets"]),
                        hash_family=row.get("hash_family", "mix"))
        f.words = np.frombuffer(row["table_bytes"], dtype=np.uint64).copy()
        f.num_items = int(row["num_items"])
        return f
    if kind == "blockedbloom":
        f = BlockedBloomFilter(int(row["num_buckets"]), seed=int(row["seed"]),
                               bits_per_item=int(row["bits_per_tag"]))
        f.lanes = np.frombuffer(row["table_bytes"], dtype=np.uint32).reshape(-1, 8).copy()
        f.num_items = int(row["num_items"])
        return f
    if kind == "counting":
        f = CountingQuotientFilter(int(row["bits_per_tag"]),
                                   seed=int(row["seed"]),
                                   hash_family=row["variant"] or "mix")
        if "hashes_np" in row:           # zero-copy plasma views
            f.hashes = np.asarray(row["hashes_np"])
            f.counts = np.asarray(row["counts_np"])
        elif row.get("codec") == "rice":
            f.unpack_payload(row["table_bytes"])
        else:
            buf = row["table_bytes"]
            n = len(buf) // 16
            f.hashes = np.frombuffer(buf[:8 * n], dtype=np.uint64).copy()
            f.counts = np.frombuffer(buf[8 * n:], dtype=np.int64).copy()
        f.num_items = int(row["num_items"])
        return f
    if kind == "gcs":
        f = GcsFilter(int(row["num_buckets"]) * 16,
                      bits_per_item=int(row["bits_per_tag"]),
                      seed=int(row["seed"]),
                      hash_family=row.get("hash_family", "mix"))
        split = int(row["victim_index"])
        buf = row["table_bytes"]
        f.stream = bytes(buf[:split])
        f.stream_bits = int(row["victim_tag"])
        if row.get("codec") == "monotone":
            from .gcs import monotone_unpack
            f.starts = monotone_unpack(pickle.loads(bytes(buf[split:])))
        else:
            f.starts = np.frombuffer(buf[split:], dtype="<u4") \
                .astype(np.uint32)
        f.num_items = int(row["num_items"])
        f._built = row.get("variant") == "built"
        if "decoded_index" in row:       # zero-copy plasma view (see above)
            f._decoded = np.asarray(row["decoded_index"])
        return f
    if kind == "shingle":
        f = ShingleFilter(int(row["victim_index"]), seed=int(row["seed"]),
                          hash_family=row.get("hash_family", "tims"))
        n = f.imask + 3
        if row.get("codec", "pack") == "raw16":
            both = np.frombuffer(row["table_bytes"], dtype=np.uint16)
        else:
            both = unpack_bits(row["table_bytes"], 12, 2 * n)
        f.A = both[:n].copy()
        f.B = both[n:].copy()
        f.filled = int((f.A != 0).sum() + (f.B != 0).sum())
        f.num_items = int(row["num_items"])
        if row.get("parked_np") is not None:
            pv = np.asarray(row["parked_np"]).reshape(-1, 2)
            f.victims = [(int(a), int(b)) for a, b in pv]
        return f
    if kind == "tail":
        d = pickle.loads(row["table_bytes"])
        f = TailFilter(d["lgm"], d["epsilon"], seed=int(row["seed"]),
                       hash_family=row.get("hash_family", "mix"))
        f.hash_consts = [tuple(c) for c in d["hash_consts"]]
        f.epoch = d["epoch"]
        f.ndv = d["ndv"]
        qd = f._new_qd(d["qd"]["k"])
        qd.log_little = d["qd"]["log_little"]
        qd.capacity = d["qd"]["capacity"]
        qd.ndv = d["qd"]["ndv"]
        qd._rand_n = d["qd"]["rand_n"]
        from .gcs import unpack_width64
        qd.payload = [[unpack_width64(b, w, ln) if w else
                       np.zeros(ln, dtype=np.uint64)
                       for ln, w, b in rowp] for rowp in d["qd"]["payload"]]
        f.qd = qd
        if d["bitset"] is not None:
            f.bitset = np.unpackbits(
                np.frombuffer(d["bitset"], dtype=np.uint8),
                count=d["bitset_len"]).astype(np.uint8)
        return f
    if kind == "growbloom":
        d = pickle.loads(row["table_bytes"])
        f = GrowBlockedBloomFilter(d["initial_bytes"], seed=int(row["seed"]))
        f.epsilon = d["epsilon"]
        f.levels = []
        for i, buf in enumerate(d["lanes"]):
            nb = max(1, (d["initial_bytes"] << i) // 32)
            lvl = BlockedBloomFilter(nb, seed=f.seed + 0x9E37 * (i + 1))
            lvl.lanes = np.frombuffer(buf, dtype=np.uint32).reshape(nb, 8).copy()
            lvl.num_items = int(d["level_items"][i])
            f.levels.append(lvl)
        f.ttl = int(d["ttl"])
        f.num_items = int(row["num_items"])
        return f
    if kind == "crate":
        from .dict import SimdSizedDict
        nb = int(row["num_buckets"])
        spare_cap = int(row["victim_tag"])
        if "fps_np" in row:                  # zero-copy plasma views
            f = CrateFilter(nb * 44, seed=int(row["seed"]))
            f.bucket_count = nb
            f.fps = np.asarray(row["fps_np"])
            f.counts = np.asarray(row["counts_np"]).astype(np.uint8, copy=False)
            spare_payload = np.asarray(row["spare_np"])
        else:
            split = int(row["victim_index"])
            buf = row["table_bytes"]
            f = CrateFilter.from_blocks(bytes(buf[:split]), nb * 44,
                                        seed=int(row["seed"]))
            spare_payload = np.frombuffer(buf[split:], dtype="<u4") \
                .reshape(-1, 16).copy()
        sp = SimdSizedDict(1)
        sp.capacity = spare_cap
        sp.payload = spare_payload
        sp.ndv = int((spare_payload != 0).sum())
        sp.has_zero = bool(row["victim_used"])
        f.spare = sp
        f.num_items = int(row["num_items"])
        return f
    if kind == "xor2n":
        f = XorFilter2n(1, bits_per_tag=int(row["bits_per_tag"]),
                        seed=int(row["seed"]))
        f.block_length = int(row["num_buckets"])
        dtype = np.uint8 if f.bits_per_tag == 8 else np.uint16
        f.fingerprints = np.frombuffer(row["table_bytes"], dtype=dtype).copy()
        f.build_seed = int(row["seed"])
        f.num_items = int(row["num_items"])
        f._built = row.get("variant") == "built"
        return f
    if kind == "xorplus":
        f = XorFilterPlus(1, bits_per_tag=int(row["bits_per_tag"]),
                          seed=int(row["seed"]))
        f.block_length = int(row["num_buckets"])
        dtype = np.uint8 if f.bits_per_tag == 8 else np.uint16
        buf = row["table_bytes"]
        a, b = int(row["victim_index"]), int(row["victim_tag"])
        f.fingerprints = np.frombuffer(buf[:a], dtype=dtype).copy()
        f.bitmap_bits = np.frombuffer(buf[a:a + b], dtype=np.uint8).copy()
        f.dense3 = np.frombuffer(buf[a + b:], dtype=dtype).copy()
        f.build_seed = int(row["seed"])
        f.num_items = int(row["num_items"])
        f._built = row.get("variant") == "built"
        return f
    if kind == "xor2":
        from .nbit import NBitArray, UInt12Array
        bits = int(row["bits_per_tag"])
        f = XorFilter2(1, bits_per_tag=bits, seed=int(row["seed"]))
        f.block_length = int(row["num_buckets"])
        n = 3 * f.block_length
        dtype = np.uint8 if bits <= 8 else np.uint16
        codec = row.get("codec", "raw")
        if codec == "raw":
            f.fingerprints = np.frombuffer(row["table_bytes"],
                                           dtype=dtype).copy()[:n]
        else:
            store = UInt12Array(n) if codec == "uint12" else NBitArray(n, bits)
            buf = np.frombuffer(row["table_bytes"], dtype=np.uint8)
            store.data = buf[:store.byte_count].copy()
            f.fingerprints = store.get_batch(np.arange(n)) \
                .astype(dtype, copy=False)
            f.layout = codec
        f.build_seed = int(row["seed"])
        f.num_items = int(row["num_items"])
        f._built = row.get("variant") == "built"
        return f
    if kind == "xor":
        f = XorFilter(1, bits_per_tag=int(row["bits_per_tag"]),
                      seed=int(row["seed"]))
        f.block_length = int(row["num_buckets"])
        dtype = np.uint8 if f.bits_per_tag == 8 else np.uint16
        f.fingerprints = np.frombuffer(row["table_bytes"], dtype=dtype).copy()
        f.build_seed = int(row["seed"])
        f.num_items = int(row["num_items"])
        f._built = row.get("variant") == "built"
        return f
    raise ValueError(f"unknown filter kind {kind!r}")


def serialize(filt: Any, **kw) -> bytes:
    """Compact byte form (shard row, pickled) — the UDAF accumulator format."""
    return pickle.dumps(filter_to_row(filt, **kw), protocol=pickle.HIGHEST_PROTOCOL)


def deserialize(data: bytes) -> Any:
    return row_to_filter(pickle.loads(data))


def make_filter(kind: str, capacity: int, seed: int, bits_per_tag: int = 12,
                hash_family: str = "mix") -> Any:
    """Factory used by aggregates/pipelines. ``kind`` ∈ cuckoo | cuckoo-stable |
    semisort | bloom | blockedbloom | xor | counting.  ``hash_family``
    selects the item hash for the kinds that template on it (cuckoo/bloom/
    counting — src/cuckoofilter.h:32-35); blockedbloom/xor stay on mix
    (their stacked probes inline the mix hash)."""
    if kind == "cuckoo":
        return CuckooFilter.create(capacity, bits_per_tag=bits_per_tag, seed=seed,
                                   hash_family=hash_family)
    if kind == "cuckoo-stable":
        return CuckooFilter.create(capacity, bits_per_tag=bits_per_tag, seed=seed,
                                   variant="stable", hash_family=hash_family)
    if kind == "semisort":
        return CuckooFilter.create(capacity, bits_per_tag=13, seed=seed,
                                   hash_family=hash_family)
    if kind == "bloom":
        return BloomFilter.create(capacity, bits_per_item=bits_per_tag, seed=seed,
                                  hash_family=hash_family)
    if kind == "blockedbloom":
        return BlockedBloomFilter.create(capacity, bits_per_item=bits_per_tag, seed=seed)
    if kind == "blockedbloom-fixed":
        return BlockedBloomFilter.create_fixed(capacity, seed=seed)
    if kind == "xor":
        return XorFilter(capacity, bits_per_tag=bits_per_tag if bits_per_tag
                         in (8, 16) else 8, seed=seed)
    if kind == "xor2":
        return XorFilter2(capacity, bits_per_tag=min(max(bits_per_tag, 4), 16),
                          seed=seed)
    if kind == "counting":
        return CountingQuotientFilter.create(capacity, seed=seed,
                                             hash_family=hash_family)
    if kind == "shingle":
        return ShingleFilter.create(capacity, seed=seed,
                                    hash_family=hash_family)
    if kind == "growbloom":
        return GrowBlockedBloomFilter(max(64, capacity), seed=seed)
    if kind == "xor2n":
        return XorFilter2n(capacity, bits_per_tag=bits_per_tag
                           if bits_per_tag in (8, 16) else 8, seed=seed)
    if kind == "xorplus":
        return XorFilterPlus(capacity, bits_per_tag=bits_per_tag
                             if bits_per_tag in (8, 16) else 8, seed=seed)
    if kind == "gcs":
        return GcsFilter(capacity, bits_per_item=bits_per_tag
                         if bits_per_tag <= 16 else 8, seed=seed,
                         hash_family=hash_family)
    if kind == "tail":
        return TailFilter.create(capacity, seed=seed,
                                 epsilon=2.0 ** -min(bits_per_tag, 16),
                                 hash_family=hash_family)
    if kind == "crate":
        # raw-key-bit pocket dictionary (crate.h:432-445): no hash family,
        # fixed 8-bit remainders — feed it hashed keys
        return CrateFilter.create(capacity, seed=seed)
    raise ValueError(f"unknown filter kind {kind!r}")
