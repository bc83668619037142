"""IP functions (reference src/common/function/src/scalars/ip/) as pure
bit-arithmetic column expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ipv4_string_to_num(col) -> Column:
    """'a.b.c.d' → 32-bit number (reference ip/ipv4.rs)."""
    parts = F.split(_c(col), r"\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


def ipv4_num_to_string(col) -> Column:
    n = _c(col).cast("long")
    return F.concat_ws(
        ".",
        (n / 16777216).cast("long") % 256,
        (n / 65536).cast("long") % 256,
        (n / 256).cast("long") % 256,
        n % 256,
    )


def ipv4_to_cidr(col, prefix: int) -> Column:
    """Mask an IPv4 string to its /prefix network, emit 'net/prefix'
    (reference ip/cidr.rs)."""
    n = ipv4_string_to_num(col)
    mask = (0xFFFFFFFF << (32 - prefix)) & 0xFFFFFFFF
    net = F.lit(mask).cast("long").bitwiseAND(n)
    return F.concat(ipv4_num_to_string(net), F.lit(f"/{prefix}"))


def ipv4_in_range(col, cidr: str) -> Column:
    """ip ∈ 'a.b.c.d/p' (reference ip/range.rs)."""
    base, prefix = cidr.split("/")
    p = int(prefix)
    mask = (0xFFFFFFFF << (32 - p)) & 0xFFFFFFFF
    base_num = 0
    for part in base.split("."):
        base_num = base_num * 256 + int(part)
    return ipv4_string_to_num(col).bitwiseAND(F.lit(mask)) == F.lit(base_num & mask)
