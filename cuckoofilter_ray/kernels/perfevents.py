"""Linux perf_event counter groups over raw ``perf_event_open``.

The reference wraps its lookup loop in a group of four hardware perf
events and prints per-key rates (``benchmarks/linux-perf-events.h`` —
group leader with ``PERF_FORMAT_GROUP|PERF_FORMAT_ID``, ``disabled=1``,
``exclude_kernel=1``, ``exclude_hv=1``, ioctl RESET+ENABLE ... DISABLE
then one group read with values at slots 1,3,5,...;
``benchmarks/bulk-insert-and-query.cc:603-643`` chooses CPU_CYCLES,
INSTRUCTIONS, CACHE_MISSES, BRANCH_MISSES).

This is the same counter group built from pure Python: the
``perf_event_open`` syscall via ctypes, no compiled extension and no
``perf`` binary.  Cloud hypervisors usually do not virtualize the PMU,
so the four hardware events fail to open with ENOENT there; the kernel
still serves the *software* events from the same syscall (task-clock,
page-faults, context-switches, cpu-migrations), and
:func:`open_reference_group` falls back to those, self-labelling which
domain it measured.  Callers therefore always get real kernel-maintained
counters; only the event menu degrades on PMU-less hosts.
"""

from __future__ import annotations

import ctypes
import os
import struct
import time

# perf_event_attr.type (uapi/linux/perf_event.h)
PERF_TYPE_HARDWARE = 0
PERF_TYPE_SOFTWARE = 1

# PERF_TYPE_HARDWARE configs
PERF_COUNT_HW_CPU_CYCLES = 0
PERF_COUNT_HW_INSTRUCTIONS = 1
PERF_COUNT_HW_CACHE_MISSES = 3
PERF_COUNT_HW_BRANCH_MISSES = 5

# PERF_TYPE_SOFTWARE configs
PERF_COUNT_SW_CPU_CLOCK = 0
PERF_COUNT_SW_TASK_CLOCK = 1      # ns of on-CPU time for this task
PERF_COUNT_SW_PAGE_FAULTS = 2
PERF_COUNT_SW_CONTEXT_SWITCHES = 3
PERF_COUNT_SW_CPU_MIGRATIONS = 4

_PERF_FORMAT_ID = 0x4
_PERF_FORMAT_GROUP = 0x8

# flag bits in the perf_event_attr bitfield word (offset 40)
_ATTR_DISABLED = 1 << 0
_ATTR_EXCLUDE_KERNEL = 1 << 5
_ATTR_EXCLUDE_HV = 1 << 6

_ATTR_SIZE = 128          # PERF_ATTR_SIZE_VER* — 128 covers every field we set
_NR_perf_event_open = {"x86_64": 298, "aarch64": 241}.get(os.uname().machine, 298)

_libc = ctypes.CDLL(None, use_errno=True)

# Reference event menu (bulk-insert-and-query.cc:604-608) and the software
# stand-ins served by the same syscall when the hypervisor hides the PMU.
HARDWARE_GROUP = [
    ("cycles", PERF_COUNT_HW_CPU_CYCLES),
    ("instructions", PERF_COUNT_HW_INSTRUCTIONS),
    ("cache_misses", PERF_COUNT_HW_CACHE_MISSES),
    ("branch_misses", PERF_COUNT_HW_BRANCH_MISSES),
]
SOFTWARE_GROUP = [
    ("task_clock_ns", PERF_COUNT_SW_TASK_CLOCK),
    ("page_faults", PERF_COUNT_SW_PAGE_FAULTS),
    ("context_switches", PERF_COUNT_SW_CONTEXT_SWITCHES),
    ("cpu_migrations", PERF_COUNT_SW_CPU_MIGRATIONS),
]


def _make_attr(typ: int, config: int) -> bytearray:
    attr = bytearray(_ATTR_SIZE)
    struct.pack_into("IIQ", attr, 0, typ, _ATTR_SIZE, config)
    # offsets: sample_period@16, sample_type@24, read_format@32, flags@40
    struct.pack_into("Q", attr, 32, _PERF_FORMAT_GROUP | _PERF_FORMAT_ID)
    # enabled from open (no _ATTR_DISABLED): sections are snapshot deltas
    struct.pack_into("Q", attr, 40, _ATTR_EXCLUDE_KERNEL | _ATTR_EXCLUDE_HV)
    return attr


class LinuxEvents:
    """A group of perf counters over the calling thread, reference-shaped.

    Same construction as the C++ ``LinuxEvents`` (linux-perf-events.h):
    a config list opens one group (first fd is the leader); ``start()``
    marks a section and ``end()`` returns the per-event counts since the
    matching ``start()``, in construction order.

    One deliberate deviation from the reference's RESET+ENABLE/DISABLE
    lifecycle: this kernel installs group *siblings* lazily — after an
    enable, a sibling begins counting only at the task's next reschedule,
    so a sub-millisecond section right after ENABLE reads 0 from every
    non-leader event (measured here: 64 page faults invisible immediately
    after enable, visible after a 2 ms sleep).  The group therefore opens
    enabled, construction sleeps ~2 ms once to force the reschedule that
    installs the siblings, and ``start()``/``end()`` are snapshot DELTAS
    of the free-running counters — same measured quantity, no
    first-section blind spot, and no per-section ioctls.

    Raises ``OSError`` at construction when the kernel refuses any event
    (missing PMU → ENOENT, perf_event_paranoid / seccomp → EACCES/EPERM).
    """

    def __init__(self, configs, typ: int = PERF_TYPE_HARDWARE):
        self._fds: list[int] = []
        leader = -1
        try:
            for config in configs:
                attr = _make_attr(typ, config)
                buf = (ctypes.c_char * _ATTR_SIZE).from_buffer(attr)
                # pid=0 (this task), cpu=-1 (any), group_fd=leader, flags=0
                fd = _libc.syscall(_NR_perf_event_open, buf, 0, -1, leader, 0)
                if fd < 0:
                    err = ctypes.get_errno()
                    raise OSError(err, os.strerror(err), f"perf_event_open config={config}")
                self._fds.append(fd)
                if leader == -1:
                    leader = fd
        except Exception:
            self.close()
            raise
        self._n = len(self._fds)
        time.sleep(0.002)        # reschedule => kernel installs the siblings
        self._base = self._read_raw()

    def _read_raw(self) -> list[int]:
        # PERF_FORMAT_GROUP|ID read layout: u64 nr, then (value, id) pairs;
        # values sit at slots 1,3,5,... (linux-perf-events.h:79-82)
        raw = os.read(self._fds[0], 8 * (1 + 2 * self._n))
        words = struct.unpack(f"{1 + 2 * self._n}Q", raw)
        assert words[0] == self._n
        return [words[1 + 2 * i] for i in range(self._n)]

    def start(self) -> None:
        self._base = self._read_raw()

    def end(self) -> list[int]:
        now = self._read_raw()
        return [a - b for a, b in zip(now, self._base)]

    def close(self) -> None:
        for fd in self._fds:
            try:
                os.close(fd)
            except OSError:
                pass
        self._fds = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_reference_group():
    """The reference's four-event group, or the software fallback.

    Returns ``(LinuxEvents, domain, names)`` where ``domain`` is
    ``"hardware"`` (the reference's exact menu) or ``"software"``
    (PMU-less host: task-clock/page-faults/context-switches/migrations
    from the same syscall).  Raises ``OSError`` only when the kernel
    refuses perf_event_open entirely (hardened seccomp / paranoid=3+).
    """
    try:
        ev = LinuxEvents([c for _, c in HARDWARE_GROUP], PERF_TYPE_HARDWARE)
        return ev, "hardware", [n for n, _ in HARDWARE_GROUP]
    except OSError:
        ev = LinuxEvents([c for _, c in SOFTWARE_GROUP], PERF_TYPE_SOFTWARE)
        return ev, "software", [n for n, _ in SOFTWARE_GROUP]
