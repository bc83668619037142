"""FxHash (firefox/rustc hash, public algorithm) and the metric-engine TSID.

The reference's metric engine identifies a time series inside a physical
table by ``__tsid`` — an FxHash64 of the sorted non-null label names seeding
a second hash of the label values (src/metric-engine/src/row_modifier.rs:
180-248 ``TsidGenerator``).  Verified bit-exact against the reference's
``insert/logical_metric_table.result`` goldens for the `host` series.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_SEED = 0x51_7C_C1_B7_27_22_0A_95  # fxhash 64-bit seed


def _word(h: int, w: int) -> int:
    h = ((h << 5) | (h >> 59)) & _MASK  # rotate_left(5)
    return ((h ^ w) * _SEED) & _MASK


def _write(h: int, b: bytes) -> int:
    i, n = 0, len(b)
    while n - i >= 8:
        h = _word(h, int.from_bytes(b[i:i + 8], "little"))
        i += 8
    if n - i >= 4:
        h = _word(h, int.from_bytes(b[i:i + 4], "little"))
        i += 4
    if n - i >= 2:
        h = _word(h, int.from_bytes(b[i:i + 2], "little"))
        i += 2
    if n - i >= 1:
        h = _word(h, b[i])
    return h


def fxhash64_str(h: int, s: str) -> int:
    """TsidGenerator::write_str — value bytes then a 0xff separator."""
    return _word(_write(h, s.encode("utf-8")), 0xFF)


def tsid(labels: list[tuple[str, str | None]]) -> int:
    """TSID of one row: labels sorted by name; null values (and their names)
    are excluded from both stages (row_modifier.rs fill_internal_columns)."""
    live = sorted((n, v) for n, v in labels if v is not None)
    h = 0
    for n, _ in live:
        h = fxhash64_str(h, n)
    h2 = _word(0, h)  # TsidGenerator::new(label_name_hash) → write_u64
    for _, v in live:
        h2 = fxhash64_str(h2, v)
    return h2


def tsid_i64(labels: list[tuple[str, str | None]]) -> int:
    """TSID as a signed 64-bit value (Spark LongType storage)."""
    t = tsid(labels)
    return t - (1 << 64) if t >= (1 << 63) else t
