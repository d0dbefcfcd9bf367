"""perf_event_open counter groups (reference: benchmarks/linux-perf-events.h).

The reference counts its lookup loop with a hardware perf-event group;
kernels/perfevents.py is the same group through the raw syscall, degrading
to the kernel's software events on PMU-less hypervisors.  Skips only when
the kernel refuses perf_event_open entirely (hardened seccomp/paranoid)."""

import numpy as np
import pytest

from cuckoofilter_ray.kernels.perfevents import (
    LinuxEvents,
    PERF_COUNT_SW_PAGE_FAULTS,
    PERF_COUNT_SW_TASK_CLOCK,
    PERF_TYPE_SOFTWARE,
    open_reference_group,
)


def _group_or_skip():
    try:
        return open_reference_group()
    except OSError as e:  # pragma: no cover - hardened kernels only
        pytest.skip(f"perf_event_open refused: {e}")


def test_reference_group_counts_work():
    ev, domain, names = _group_or_skip()
    assert domain in ("hardware", "software") and len(names) == 4
    a = np.arange(1_000_000, dtype=np.uint64)
    ev.start()
    for _ in range(5):
        a = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (a >> np.uint64(31))
    vals = ev.end()
    # slot 0 is cycles (hardware) or task-clock ns (software): the loop
    # burns milliseconds of CPU, so the count is far from zero either way
    assert vals[0] > 100_000, (domain, names, vals)
    ev.close()


def test_group_reset_between_measurements():
    ev, _, _ = _group_or_skip()
    a = np.arange(500_000, dtype=np.uint64)
    ev.start()
    a = a * np.uint64(3)
    busy = ev.end()[0]
    ev.start()
    idle = ev.end()[0]          # immediate stop: reset must have cleared
    assert idle < busy
    ev.close()


def test_software_group_sees_first_touch_page_faults():
    try:
        ev = LinuxEvents([PERF_COUNT_SW_TASK_CLOCK, PERF_COUNT_SW_PAGE_FAULTS],
                         PERF_TYPE_SOFTWARE)
    except OSError as e:  # pragma: no cover
        pytest.skip(f"perf_event_open refused: {e}")
    # a fresh anonymous mmap is guaranteed unfaulted (numpy arrays are not:
    # the allocator may hand back an already-touched arena), and touching
    # one byte per 2 MB survives transparent hugepages (1 fault per touch)
    import mmap
    m = mmap.mmap(-1, 256 << 20)
    ev.start()
    for off in range(0, len(m), 1 << 21):
        m[off] = 1
    vals = ev.end()
    m.close()
    assert vals[1] > 40, f"expected first-touch faults, got {vals}"
    ev.close()
