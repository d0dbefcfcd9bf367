"""cuckoofilter_ray — a Ray-Data-native approximate-membership engine.

From-scratch re-expression of GerHobbelt/cuckoofilter's capabilities
(partial-key cuckoo filters, semi-sorted 13-bit variant, Bloom baseline,
blocked Bloom) as mergeable UDAFs over ``ray.data.Dataset.groupby/aggregate``
and broadcast/actor-pool ``map_batches`` stages, keyed on sha256(content)
over a source-code Parquet corpus (BASELINE.json north_star).

Layout:
- ``kernels/``   pure NumPy filter kernels + hashing + serde (no Ray)
- ``stages/``    Ray Data building blocks (UDAF aggregates, membership,
                 dedup, similarity, text analysis)
- ``sources/``   corpus generator + table readers
- ``pipelines/`` end-to-end build/query/dedup pipelines
- ``state/``     checkpoint manifest / resume
"""

__version__ = "0.1.0"
