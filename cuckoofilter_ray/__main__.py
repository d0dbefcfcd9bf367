"""CLI — the engine's analog of the reference's executables.

    python -m cuckoofilter_ray sweep <n> [alg] [seed]
        bulk-insert-and-query analog (benchmarks/bulk-insert-and-query.cc:
        708-767): build <n> keys into each (or one) filter config, probe the
        found-probability sweep, print a table.  Seeds 0-127 generate
        ADVERSARIAL sequential keys rotated left by `seed` bits (the
        reference's hash-robustness orderings); larger seeds give a random
        splitmix64 stream.
    python -m cuckoofilter_ray build --input <parquet> --group <col> \
           --content <col> --out <dir> [--kind cuckoo] [--capacity N]
        checkpointed grouped filter build (resume-aware).
    python -m cuckoofilter_ray probe --filters <dir> --input <parquet> \
           --group <col> --content <col>
        probe a corpus against checkpointed filters; prints recall stats.

Owns its Ray session (guarded init), unlike library code.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

ALGS = [("cuckoo", 8), ("cuckoo", 12), ("cuckoo", 16), ("semisort", 13),
        ("cuckoo-stable", 12), ("bloom", 12), ("blockedbloom", 8), ("xor", 8),
        ("shingle", 12), ("counting", 8), ("gcs", 8), ("xorplus", 8),
        ("crate", 8),
        ("xor2", 10), ("xor2", 12),
        ("xor2n", 8)]


def _init_ray(num_cpus=None):
    import ray
    if not ray.is_initialized():
        kw = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return ray


def _gen_keys(n: int, seed: int) -> np.ndarray:
    from .kernels.hashing import splitmix64
    if 0 <= seed < 128:
        # adversarial orderings (bulk-insert-and-query.cc:747-767):
        # sequential keys rotated left by `seed` bits
        base = np.arange(1, n + 1, dtype=np.uint64)
        s = np.uint64(seed % 64)
        return (base << s) | (base >> np.uint64((64 - int(s)) % 64)) \
            if int(s) else base
    return splitmix64(n, seed=seed)


def cmd_sweep(args) -> None:
    ray = _init_ray(args.num_cpus)
    from .kernels import filter_to_row
    from .pipelines.build import build_single_filter
    from .pipelines.membership import measure_single_filter
    import ray.data as rd
    import pyarrow as pa

    keys = _gen_keys(args.n, args.seed)
    iref = ray.put(keys)
    keyed = rd.from_numpy(keys).map_batches(
        lambda b: pa.table({"key_hi64": b.column("data")}),
        batch_format="pyarrow", batch_size=None).repartition(32).materialize()
    algs = ALGS if args.alg == "all" else \
        [a for a in ALGS if f"{a[0]}{a[1]}" == args.alg or a[0] == args.alg]
    if not algs:
        sys.exit(f"unknown alg {args.alg!r}; use one of "
                 f"{['all'] + [f'{k}{b}' for k, b in ALGS]}")
    print(f"{'alg':>16} {'M adds/s':>9} {'M finds/s':>10} {'ε %':>8} "
          f"{'bits/item':>9}")
    for kind, bits in algs:
        t0 = time.perf_counter()
        filt = build_single_filter(keyed, capacity=args.n, kind=kind,
                                   bits_per_tag=bits, seed=42)
        build_s = time.perf_counter() - t0
        fref = ray.put(filter_to_row(filt, packed=False))
        packed_len = len(filter_to_row(filt)["table_bytes"])
        t0 = time.perf_counter()
        m = measure_single_filter(iref, fref, args.n, p="sweep", seed=7)
        probe_s = time.perf_counter() - t0
        assert m["recall"] == 1.0, f"{kind}{bits}: false negatives!"
        print(f"{kind}{bits:>3} {args.n / build_s / 1e6:>9.2f} "
              f"{m['n_probes'] / probe_s / 1e6:>10.2f} "
              f"{100 * m['fpr']:>8.4f} {8 * packed_len / args.n:>9.2f}")
    ray.shutdown()


def cmd_build(args) -> None:
    ray = _init_ray(args.num_cpus)
    import ray.data as rd
    from .pipelines.build import build_grouped_filters, derive_keys
    from .state.checkpoint import resumable_build

    ds = rd.read_parquet(args.input)
    keyed = derive_keys(ds, content_col=args.content, drop_content=True)

    def build_fn(sub, gk):
        return build_grouped_filters(sub, gk, capacity=args.capacity,
                                     kind=args.kind, seed=args.seed)

    cfg = {"kind": args.kind, "capacity": args.capacity, "seed": args.seed}
    shards = resumable_build(keyed.materialize(), args.out, args.group,
                             build_fn, config=cfg)
    rows = shards.take_all()
    print(json.dumps({"groups": len(rows),
                      "num_items": sum(r["num_items"] for r in rows),
                      "out": args.out}))
    ray.shutdown()


def cmd_probe(args) -> None:
    ray = _init_ray(args.num_cpus)
    import ray.data as rd
    from .pipelines.build import derive_keys
    from .pipelines.membership import measure_membership, probe_dataset
    from .stages.membership import filters_to_ref
    from .state.checkpoint import read_filter_shards

    fref = filters_to_ref(read_filter_shards(args.filters),
                          group_col="group_key")
    ds = rd.read_parquet(args.input)
    keyed = derive_keys(ds, content_col=args.content, drop_content=True)
    def prep(t, g=args.group):
        import pyarrow as pa
        if "group_key" not in t.column_names:
            t = t.append_column("group_key", t.column(g).cast("string"))
        # probing the inserted corpus: every key is expected present
        return t.append_column("expect_member",
                               pa.array([True] * len(t), pa.bool_()))

    keyed = keyed.map_batches(prep, batch_format="pyarrow", batch_size=None)
    probed = probe_dataset(keyed, fref, group_col="group_key")
    print(json.dumps(measure_membership(probed)))
    ray.shutdown()


def main() -> None:
    p = argparse.ArgumentParser(prog="cuckoofilter_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sweep")
    s.add_argument("n", type=int)
    s.add_argument("alg", nargs="?", default="all")
    s.add_argument("seed", nargs="?", type=int, default=1_000_000)
    s.set_defaults(fn=cmd_sweep)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--group", required=True)
    b.add_argument("--content", default="content")
    b.add_argument("--out", required=True)
    b.add_argument("--kind", default="cuckoo")
    b.add_argument("--capacity", type=int, default=1 << 16)
    b.add_argument("--seed", type=int, default=42)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("probe")
    q.add_argument("--filters", required=True)
    q.add_argument("--input", required=True)
    q.add_argument("--group", required=True)
    q.add_argument("--content", default="content")
    q.set_defaults(fn=cmd_probe)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
