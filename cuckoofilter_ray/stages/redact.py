"""PII detection and redaction over a text column.

The standard scrub step between crawling and training: find spans that
look like emails / IPv4 addresses / phone numbers and replace them with
typed placeholder tokens, reporting per-document match counts.

Scale shape: ONE streaming ``map_batches`` pass, zero shuffle, zero
broadcast — each pattern is a compiled RE2 kernel applied columnar-ly
(``pyarrow.compute.replace_substring_regex`` / ``count_substring_regex``
over the Arrow string column; no Python per row).  Both Arrow and DuckDB
bind RE2, so the operator is value-exactly expressible in the driver's
SQL oracle (``regexp_replace(..., 'g')`` / ``len(regexp_extract_all)``)
— the reason the default patterns avoid constructs RE2 lacks
(backreferences, lookarounds).

Patterns apply IN ORDER on the progressively-redacted text (an email's
digits can't later fire the phone pattern), and counts are taken on the
text state each pattern actually saw — the same left-to-right contract
as a nested ``regexp_replace`` chain in SQL.

Reference tie-in: this is a pure batch-transform stage with no state,
the shape SURVEY §2's "map-only operators" bucket prescribes; the filter
kernels play no role here by design (pattern matching, not membership).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement token) — applied in order
DEFAULT_PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def redact_batch(batch: pa.Table, *, column: str = "text",
                 patterns=None, out_col: Optional[str] = None,
                 counts: bool = True) -> pa.Table:
    """Redact one Arrow batch (usable standalone or under map_batches)."""
    patterns = DEFAULT_PII_PATTERNS if patterns is None else patterns
    text = batch.column(column)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if text.null_count:
        text = text.fill_null("")   # null text scrubs to "" with 0 counts,
        # not null-propagation — same contract as the gram/chunk stages
    out = batch
    for name, pat, repl in patterns:
        if counts:
            n = pc.count_substring_regex(text, pat)
            out = out.append_column(f"n_{name}", n.cast(pa.int64()))
        text = pc.replace_substring_regex(text, pattern=pat,
                                          replacement=repl)
    tgt = out_col or column
    if tgt in out.column_names:
        out = out.set_column(out.column_names.index(tgt), tgt, text)
    else:
        out = out.append_column(tgt, text)
    return out


def pii_redact(ds, *, column: str = "text", patterns=None,
               out_col: Optional[str] = None, counts: bool = True):
    """Streaming PII redaction: returns ``ds`` with ``column`` redacted
    (or a new ``out_col``) plus one ``n_<name>`` int64 count column per
    pattern when ``counts`` is set."""
    return ds.map_batches(
        redact_batch, batch_format="pyarrow", batch_size=None,
        fn_kwargs={"column": column, "patterns": patterns,
                   "out_col": out_col, "counts": counts})
