"""Randomized differential regression fuzz over the engine's surface.

Three suites, each comparing the engine against an independent reference
(a Python/pandas model, or a second engine path that must be identical):

  kernels    make_filter configs x hash families vs a set model:
             zero false negatives on accepted keys, serde round-trip
             probe-exactness, FPR sanity (skipped for <=4-bit tags whose
             design FPR exceeds the sanity bar)
  pipelines  decontaminate prescreen on/off/auto three-way parity plus a
             Python gram-set reference; heavy_hitters vs exact counts
             (with nulls); minhash_lsh_pairs partition invariance +
             planted-pair recall; hash_join/asof_join vs pandas
  paths      exactsubstr_dedup broadcast vs join vs precomputed-dup-set
             paths (all four must be byte-identical), duplicated_gram
             _stats broadcast vs join, cap_per_group vs pandas,
             chunk_documents vs a per-row re.findall reference,
             hash_split coverage + rerun stability

Usage:  python tools/fuzz_regression.py [suite ...] [--trials N] [--seed S]
        (default: all three suites, kernels 300 configs / others 8 trials)

Owns its Ray session (library code never calls ray.init).  Exit 1 on any
mismatch, printing the failing (trial, description) list — each entry
carries the config/seed needed to reproduce.  This is the permanent form
of the round-3/5/7 fuzz campaigns (NOTES.md); run it after kernel or
stage changes for coverage the deterministic tests can't reach.
"""
from __future__ import annotations

import argparse
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

FAIL: list = []


# --------------------------------------------------------------- kernels

KINDS = ["cuckoo", "cuckoo-stable", "semisort", "bloom", "blockedbloom",
         "blockedbloom-fixed", "xor", "xor2", "xor2n", "xorplus",
         "counting", "shingle", "growbloom", "gcs", "tail", "crate"]
FAMS = ["mix", "tims", "ums", "tab"]
STATIC = {"xor", "xor2", "xor2n", "xorplus", "gcs"}


def suite_kernels(rng: np.random.Generator, trials: int) -> None:
    from cuckoofilter_ray.kernels.serde import (make_filter, serialize,
                                                deserialize)
    for t in range(trials):
        kind = KINDS[int(rng.integers(0, len(KINDS)))]
        fam = FAMS[int(rng.integers(0, len(FAMS)))]
        cap = int(rng.integers(64, 6000))
        bpt = int(rng.choice([4, 8, 12, 13, 16]))
        seed = int(rng.integers(1, 1 << 31))
        n = int(rng.integers(1, max(2, int(cap * 0.7))))
        keyspace = int(rng.choice([1 << 16, 1 << 32, 1 << 63]))
        keys = rng.integers(0, keyspace, size=n).astype(np.uint64)
        if kind == "crate":
            # documented convention: the pocket dictionary consumes raw
            # key bits — feed it full-entropy (hashed) keys
            keys = keys * np.uint64(0x9E3779B97F4A7C15)
            keys ^= keys >> np.uint64(31)
            keys *= np.uint64(0xBF58476D1CE4E5B9)
            keys ^= keys >> np.uint64(27)
        if rng.random() < 0.4:                  # duplicate-heavy batch
            keys = np.concatenate([keys, keys[: n // 2 + 1]])
        tag = f"kind={kind} fam={fam} cap={cap} bpt={bpt} seed={seed} n={n}"
        try:
            f = make_filter(kind, cap, seed, bits_per_tag=bpt,
                            hash_family=fam)
            if kind in STATIC:
                f.add_all(np.unique(keys))
            else:
                res = f.add_batch(keys)
                if res is not None and getattr(res, "overflow", 0):
                    continue    # keys dropped (NotEnoughSpace): the
                                # zero-FN contract covers accepted keys
            member = np.unique(keys)
            if not np.asarray(f.contain_batch(member)).all():
                FAIL.append((t, f"false negative {tag}"))
                continue
            probes = rng.integers(0, keyspace, size=4096).astype(np.uint64)
            fresh = probes[~np.isin(probes, member)]
            # 4-bit tags have design FPR ~2b/2^4 — no sanity bar there
            if bpt > 4 and len(fresh):
                fp = float(np.asarray(f.contain_batch(fresh)).mean())
                if fp > 0.25:
                    FAIL.append((t, f"FPR {fp:.3f} {tag}"))
                    continue
            g = deserialize(serialize(f))
            if not np.asarray(g.contain_batch(member)).all():
                FAIL.append((t, f"serde FN {tag}"))
                continue
            if not (np.asarray(f.contain_batch(probes)) ==
                    np.asarray(g.contain_batch(probes))).all():
                FAIL.append((t, f"serde probe drift {tag}"))
        except Exception as e:                  # noqa: BLE001
            FAIL.append((t, f"exception {tag}: {e!r}"))
        if (t + 1) % 50 == 0:
            print(f"kernels {t + 1}/{trials} fails={len(FAIL)}",
                  flush=True)


# ------------------------------------------------------------- pipelines

def _ref_grams(text: str, k: int) -> set:
    w = text.split(" ")
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def suite_pipelines(rng: np.random.Generator, trials: int) -> None:
    import ray
    from cuckoofilter_ray.stages.decontaminate import (decontaminate,
                                                       benchmark_gram_set)
    from cuckoofilter_ray.stages.heavy import heavy_hitters
    from cuckoofilter_ray.stages.dedup import minhash_lsh_pairs
    from cuckoofilter_ray.stages.relational import hash_join, asof_join

    for t in range(trials):
        # --- decontaminate: three prescreen modes + Python reference
        vocab = [f"w{z}" for z in range(int(rng.integers(10, 50)))]
        docs = [{"doc_id": i,
                 "text": " ".join(rng.choice(vocab,
                                             size=int(rng.integers(0, 40))))}
                for i in range(int(rng.integers(20, 100)))]
        bench_texts = [" ".join(rng.choice(
            vocab, size=int(rng.integers(5, 30))))
            for _ in range(int(rng.integers(1, 20)))]
        for b in range(min(3, len(bench_texts))):   # plant real overlap
            src = docs[int(rng.integers(0, len(docs)))]["text"]
            if src:
                bench_texts[b] = src
        k = int(rng.integers(2, 8))
        seed = int(rng.integers(1, 1 << 30))
        bh = benchmark_gram_set(bench_texts, k=k, seed=seed)
        ds = ray.data.from_items(docs).repartition(int(rng.integers(1, 5)))
        outs = [decontaminate(ds, bh, k=k, seed=seed, prescreen=ps)
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
                for ps in (None, True, False)]
        if not (outs[0].equals(outs[1]) and outs[0].equals(outs[2])):
            FAIL.append((t, f"decon prescreen parity k={k} seed={seed}"))
        else:
            bench_gr = set().union(*(_ref_grams(bt, k)
                                     for bt in bench_texts))
            for d in docs:
                gr = _ref_grams(d["text"], k)
                row = outs[0][outs[0].doc_id == d["doc_id"]].iloc[0]
                if row["n_grams"] != len(gr) or \
                        row["n_hit"] != len(gr & bench_gr):
                    FAIL.append((t, f"decon ref mismatch doc "
                                 f"{d['doc_id']} k={k} seed={seed}"))
                    break

        # --- heavy hitters vs exact counts (with nulls)
        n = int(rng.integers(100, 3000))
        vals = (rng.zipf(1.3, size=n).astype(np.int64) % 50).astype(float)
        df = pd.DataFrame({"v": vals})
        if rng.random() < 0.3:
            df.loc[rng.integers(0, n, size=n // 10), "v"] = None
        denom = int(rng.integers(3, 30))
        hds = ray.data.from_pandas(df).repartition(int(rng.integers(1, 5)))
        out = heavy_hitters(hds, "v", denom).to_pandas()
        vc = df["v"].dropna().astype(np.int64).value_counts()
        nn = int(df["v"].notna().sum())
        ref = sorted(int(i) for i, c in vc.items() if c > nn / denom)
        got = sorted(int(float(x)) for x in out["item"])
        if got != ref:
            FAIL.append((t, f"heavy mismatch denom={denom} n={n}"))

        # --- minhash: partition invariance + planted recall
        mrows = [{"doc_id": i, "text": " ".join(
            rng.choice(vocab, size=int(rng.integers(40, 80))))}
            for i in range(int(rng.integers(20, 60)))]
        for j in range(5):                      # one-word mutations
            src = mrows[j]["text"].split(" ")
            src[int(rng.integers(0, len(src)))] = "mut"
            mrows.append({"doc_id": 100 + j, "text": " ".join(src)})
        kw = dict(threshold=0.7, num_perm=64, seed=9)
        pair_sets = []
        for parts in (2, 5):
            p = minhash_lsh_pairs(ray.data.from_items(mrows)
                                  .repartition(parts), **kw).to_pandas()
            pair_sets.append(set(map(tuple,
                                     p[["lo_id", "hi_id"]].to_numpy())))
        if pair_sets[0] != pair_sets[1]:
            FAIL.append((t, "minhash partition variance"))
        planted = sum((j, 100 + j) in pair_sets[0] for j in range(5))
        if planted < 4:
            FAIL.append((t, f"minhash planted recall {planted}/5"))

        # --- hash_join / asof_join vs pandas
        nl, nr = int(rng.integers(5, 200)), int(rng.integers(5, 200))
        ldf = pd.DataFrame({"k": rng.integers(0, 30, nl),
                            "a": rng.integers(0, 100, nl)})
        rdf = pd.DataFrame({"k": rng.integers(0, 30, nr),
                            "b": rng.integers(0, 100, nr)})
        out = hash_join(
            ray.data.from_pandas(ldf).repartition(int(rng.integers(1, 4))),
            ray.data.from_pandas(rdf).repartition(int(rng.integers(1, 4))),
            "k", "k", num_buckets=int(rng.integers(2, 8))).to_pandas()
        ref = ldf.merge(rdf, on="k")
        if sorted(map(tuple, out[["_k", "a", "b"]].to_numpy().tolist())) \
                != sorted(map(tuple,
                              ref[["k", "a", "b"]].to_numpy().tolist())):
            FAIL.append((t, "hash_join mismatch"))

        ladf = pd.DataFrame({"ts": np.sort(rng.integers(0, 1000, nl)),
                             "g": rng.integers(0, 3, nl),
                             "x": rng.integers(0, 50, nl)})
        radf = pd.DataFrame({"ts": np.sort(rng.integers(0, 1000, nr)),
                             "g": rng.integers(0, 3, nr),
                             "y": rng.integers(0, 50, nr)}) \
            .drop_duplicates(["g", "ts"])       # asof needs unique (g,ts)
        aout = asof_join(
            ray.data.from_pandas(ladf).repartition(2),
            ray.data.from_pandas(radf).repartition(3),
            ("g", "g"), ("ts", "ts"), ["x"], ["y"],
            num_buckets=int(rng.integers(2, 8))).to_pandas()
        aout["ts_i"] = aout["_ts"].astype("int64")  # µs epoch == raw int
        aref = pd.merge_asof(ladf.sort_values("ts"),
                             radf.sort_values("ts"),
                             on="ts", by="g").dropna(subset=["y"])
        got = sorted(map(tuple, aout[["_key", "ts_i", "x", "y"]]
                         .astype(np.int64).to_numpy().tolist()))
        want = sorted(map(tuple, aref[["g", "ts", "x", "y"]]
                          .astype(np.int64).to_numpy().tolist()))
        if got != want:
            FAIL.append((t, "asof mismatch"))
        print(f"pipelines {t + 1}/{trials} fails={len(FAIL)}", flush=True)


# ----------------------------------------------------------------- paths

def suite_paths(rng: np.random.Generator, trials: int) -> None:
    import ray
    from cuckoofilter_ray.stages.decontaminate import (
        duplicated_gram_hashes, duplicated_gram_stats, exactsubstr_dedup)
    from cuckoofilter_ray.stages.sampling import cap_per_group, hash_split
    from cuckoofilter_ray.stages.packing import chunk_documents

    def srt(ds):
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    for t in range(trials):
        # --- exactsubstr 4-way + gram_stats 2-way path parity
        vocab = [f"w{z}" for z in range(int(rng.integers(8, 60)))]
        rows = []
        for i in range(int(rng.integers(25, 120))):
            r = rng.random()
            nwords = 0 if r < 0.1 else int(rng.integers(1, 4)) \
                if r < 0.2 else int(rng.integers(4, 60))
            rows.append({"doc_id": i, "text": " ".join(
                rng.choice(vocab, size=nwords))})
        for j in range(int(rng.integers(1, 9))):
            rows.append({"doc_id": 1000 + j,
                         "text": rows[int(rng.integers(0, 20))]["text"]})
        for j in range(int(rng.integers(1, 9))):     # spliced overlaps
            a = rows[int(rng.integers(0, 20))]["text"].split(" ")
            b = rows[int(rng.integers(0, 20))]["text"].split(" ")
            rows.append({"doc_id": 2000 + j, "text": " ".join(
                a[:int(rng.integers(0, len(a) + 1))] +
                b[int(rng.integers(0, len(b) + 1)):])})
        k = int(rng.integers(2, 9))
        seed = int(rng.integers(1, 1 << 30))
        tag = f"k={k} seed={seed}"
        ds = ray.data.from_items(rows).repartition(int(rng.integers(1, 7)))
        a = srt(exactsubstr_dedup(ds, k=k, seed=seed))
        dh = duplicated_gram_hashes(ds, k=k, seed=seed)
        for name, kw in (("join", dict(broadcast_bound=0)),
                         ("pre", dict(dup_hashes=dh)),
                         ("pre+join", dict(dup_hashes=dh,
                                           broadcast_bound=0))):
            o = srt(exactsubstr_dedup(ds, k=k, seed=seed, **kw))
            if not a.equals(o):
                FAIL.append((t, f"exactsubstr {name} mismatch {tag}"))
        s1 = srt(duplicated_gram_stats(ds, k=k, seed=seed))
        s2 = srt(duplicated_gram_stats(ds, k=k, seed=seed,
                                       broadcast_bound=0,
                                       num_buckets=int(rng.integers(2, 9))))
        if not s1.equals(s2):
            FAIL.append((t, f"gram_stats join mismatch {tag}"))

        # --- cap_per_group vs pandas
        n = int(rng.integers(30, 400))
        groups = [None, "a", "b", "c", "dom.example", ""]
        df = pd.DataFrame({
            "doc_id": np.arange(n),
            "grp": [groups[int(rng.integers(0, len(groups)))]
                    for _ in range(n)],
            "q": rng.random(n)})
        kk = int(rng.integers(1, 6))
        out = cap_per_group(
            ray.data.from_pandas(df).repartition(int(rng.integers(1, 5))),
            "grp", kk, priority_col="q",
            num_buckets=int(rng.integers(2, 9))).to_pandas()
        ref = df.sort_values(["q", "doc_id"], kind="stable") \
            .groupby("grp", sort=False, dropna=False).head(kk)
        if sorted(out["doc_id"]) != sorted(ref["doc_id"]):
            FAIL.append((t, f"cap_per_group mismatch k={kk}"))

        # --- chunk_documents vs re.findall reference
        crows = []
        for i in range(int(rng.integers(10, 80))):
            txt = " ".join(rng.choice(vocab,
                                      size=int(rng.integers(0, 40))))
            if rng.random() < 0.3:              # whitespace noise
                txt = "  " + txt.replace(" ", "   ", 1) + " \t "
            crows.append({"doc_id": i, "text": txt})
        mt = int(rng.integers(1, 12))
        ov = int(rng.integers(0, mt))
        stride = mt - ov
        out = chunk_documents(
            ray.data.from_items(crows).repartition(int(rng.integers(1, 5))),
            mt, overlap=ov).to_pandas() \
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        ref = []
        for r in crows:
            toks = re.findall(r"\S+", r["text"])
            nw = len(toks)
            nc = 1 if nw <= mt else 1 + -(-(nw - mt) // stride)
            for ci in range(nc):
                s, e = ci * stride, min(ci * stride + mt, nw)
                ref.append((r["doc_id"], ci, e - s, " ".join(toks[s:e])))
        got = list(zip(out["doc_id"], out["chunk_id"], out["n_tokens"],
                       out["text_chunk"]))
        if got != ref:
            FAIL.append((t, f"chunk mismatch mt={mt} ov={ov}"))

        # --- hash_split coverage + stability
        sds = ray.data.from_items(
            [{"doc_id": int(x)} for x in
             rng.integers(0, 1 << 48, size=int(rng.integers(50, 500)))])
        bounds = [("a", 0.5), ("b", 0.75), ("c", 1.0)]
        o1 = hash_split(sds, bounds, salt=f"s{t}:").to_pandas()
        o2 = hash_split(sds, bounds, salt=f"s{t}:").to_pandas()
        if o1["split"].isna().any() or \
                o1.sort_values("doc_id")["split"].tolist() != \
                o2.sort_values("doc_id")["split"].tolist():
            FAIL.append((t, "hash_split coverage/stability"))
        print(f"paths {t + 1}/{trials} fails={len(FAIL)}", flush=True)


# ------------------------------------------------------------------ main

def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("suites", nargs="*", metavar="suite",
                    help="kernels | pipelines | paths (default: all)")
    ap.add_argument("--trials", type=int, default=None)
    ap.add_argument("--seed", type=int, default=20260820)
    args = ap.parse_args()
    suites = args.suites or ["kernels", "pipelines", "paths"]
    bad = set(suites) - {"kernels", "pipelines", "paths"}
    if bad:
        ap.error(f"unknown suite(s): {sorted(bad)}")

    rng = np.random.default_rng(args.seed)
    if "kernels" in suites:
        suite_kernels(rng, args.trials or 300)
    if {"pipelines", "paths"} & set(suites):
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=8, include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        if "pipelines" in suites:
            suite_pipelines(rng, args.trials or 8)
        if "paths" in suites:
            suite_paths(rng, args.trials or 8)
        ray.shutdown()

    print("FAILS:", *FAIL, sep="\n" if FAIL else " ")
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()
