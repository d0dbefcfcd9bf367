"""Pure NumPy/PyArrow kernels — no Ray imports; unit-testable in isolation."""

from .bloom import BlockedBloomFilter, BloomFilter, next_prime
from .counting import CountingQuotientFilter, NotEnoughSpaceError
from .crate import CrateFilter
from .dict import Dict, SimdSizedDict, SizedDict
from .cuckoo import (MAX_KICKS, NOT_ENOUGH_SPACE, NOT_FOUND, OK, TAGS_PER_BUCKET,
                     BulkResult, CuckooFilter, upperpower2)
from .hashing import (DEFAULT_SEED, bobhash_bytes, hash_key64, md5_hex,
                      mix_split, murmur64,
                      murmur2_bytes, sha1_hex, sha256_bytes, sha256_hex,
                      sha256_u64, simple_tabulation, splitmix64, spooky_bytes,
                      superfast_bytes, tabulation_tables, tims_params,
                      two_independent_multiply_shift,
                      universal_multiply_shift)
from .gcs import GcsFilter
from .growbloom import GrowBlockedBloomFilter
from .shingle import ShingleFilter
from .tail import QuotientDysect, TailFilter
from .nbit import NBitArray, UInt12Array
from .xor import XorFilter, XorFilter2
from .xorplus import XorFilter2n, XorFilterPlus
from .serde import (deserialize, filter_to_row, make_filter, pack_bits,
                    row_to_filter, serialize, unpack_bits)

__all__ = [
    "BlockedBloomFilter", "BloomFilter", "BulkResult", "CountingQuotientFilter",
    "CuckooFilter", "DEFAULT_SEED", "MAX_KICKS", "NOT_ENOUGH_SPACE",
    "NOT_FOUND", "NotEnoughSpaceError", "OK",
    "TAGS_PER_BUCKET", "deserialize", "filter_to_row", "hash_key64",
    "make_filter", "mix_split", "murmur64", "next_prime", "pack_bits",
    "bobhash_bytes", "spooky_bytes", "NBitArray", "UInt12Array",
    "CrateFilter", "Dict", "SimdSizedDict", "SizedDict",
    "md5_hex", "murmur2_bytes", "row_to_filter", "serialize", "sha1_hex", "sha256_bytes",
    "sha256_hex", "sha256_u64", "simple_tabulation", "tabulation_tables",
    "superfast_bytes", "universal_multiply_shift",
    "GcsFilter", "GrowBlockedBloomFilter", "QuotientDysect", "ShingleFilter",
    "TailFilter", "splitmix64", "tims_params", "two_independent_multiply_shift",
    "unpack_bits", "upperpower2", "XorFilter", "XorFilter2", "XorFilter2n", "XorFilterPlus",
]
