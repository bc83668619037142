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


# ---------------------------------------------------------------------------
# SQL surface (reference scalars/ip/{ipv4,ipv6,cidr,range}.rs). IPv6 parsing
# and the reference's octet-completion / auto-subnet rules need real address
# arithmetic — Arrow-batched pandas UDFs on Python's stdlib ipaddress (the
# reference uses Rust std::net the same way).
# ---------------------------------------------------------------------------


def _complete_ipv4(s: str):
    import ipaddress

    try:
        return ipaddress.IPv4Address(s)
    except ValueError:
        dots = s.count(".")
        pad = {0: ".0.0.0", 1: ".0.0", 2: ".0"}.get(dots, "")
        try:
            return ipaddress.IPv4Address(s + pad)
        except ValueError:
            return None  # non-v4 input (see _complete_ipv6 note)


def _complete_ipv6(s: str):
    import ipaddress

    try:
        return ipaddress.IPv6Address(s)
    except ValueError:
        try:
            return ipaddress.IPv6Address(s + "::")
        except ValueError:
            # non-v6 input (Arrow batches evaluate BOTH branches of a CASE
            # over the whole column — ipv4 rows reach the v6 branch; the
            # unpicked branch's value is discarded, so NULL is safe)
            return None


def _auto_v4_prefix(ip_str: str, addr) -> int:
    dots = ip_str.count(".")
    if dots < 3:
        return {0: 8, 1: 16, 2: 24}[dots]
    bits = int(addr)
    tz = 32 if bits == 0 else (bits & -bits).bit_length() - 1
    if tz % 8 == 0:
        return 32 - min(tz, 32)
    return 32 - (tz // 8) * 8


def _auto_v6_prefix(addr) -> int:
    s = str(addr)
    if s.startswith(("2001:db8::", "2001:db8:")):
        return 32
    if s == "::1":
        return 128
    if s.startswith("fe80::"):
        return 16
    packed = int(addr)
    segments = [(packed >> (112 - 16 * i)) & 0xFFFF for i in range(8)]
    subnet = 128
    for i in reversed(range(8)):
        if segments[i] != 0:
            subnet = i * 16 + 8 if segments[i] & 0xFF == 0 else (i + 1) * 16
            break
    return 64 if subnet < 16 else subnet


def register(spark) -> None:
    import ipaddress

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _map(fn, ret, nargs):
        if nargs == 1:
            @pandas_udf(ret, PandasUDFType.SCALAR)
            def f(a):
                return pd.Series(
                    [None if x is None else fn(x) for x in a], dtype=object)
        else:
            @pandas_udf(ret, PandasUDFType.SCALAR)
            def f(a, b):
                return pd.Series(
                    [None if x is None else fn(x, y) for x, y in zip(a, b)],
                    dtype=object)
        return f

    def v4_to_num(s):
        return int(_complete_ipv4(s))

    def v4_from_num(n):
        return str(ipaddress.IPv4Address(int(n) & 0xFFFFFFFF))

    def v4_cidr(s, mask=None):
        addr = _complete_ipv4(s)
        if addr is None:
            return None
        p = int(mask) if mask is not None else _auto_v4_prefix(s, addr)
        m = (0xFFFFFFFF << (32 - p)) & 0xFFFFFFFF
        return f"{ipaddress.IPv4Address(int(addr) & m)}/{p}"

    def v4_in_range(s, cidr):
        if cidr is None:
            return None
        net = ipaddress.IPv4Network(cidr, strict=False)
        addr = _complete_ipv4(s)
        return None if addr is None else addr in net

    def v6_to_num(s):
        return _complete_ipv6(s).packed

    def v6_from_hex(h):
        if len(h) != 32:
            raise ValueError(f"expecting 32 hex characters, got {len(h)}")
        addr = ipaddress.IPv6Address(bytes.fromhex(h))
        v4 = addr.ipv4_mapped
        return f"::ffff:{v4}" if v4 is not None else str(addr)

    def _v6_str(addr):
        # Rust Ipv6Addr Display renders v4-mapped addresses as ::ffff:a.b.c.d
        v4 = addr.ipv4_mapped
        return f"::ffff:{v4}" if v4 is not None else str(addr)

    def v6_cidr(s, mask=None):
        addr = _complete_ipv6(s)
        if addr is None:
            return None
        p = int(mask) if mask is not None else _auto_v6_prefix(addr)
        m = 0 if p == 0 else ((1 << 128) - 1) ^ ((1 << (128 - p)) - 1)
        return f"{_v6_str(ipaddress.IPv6Address(int(addr) & m))}/{p}"

    def v6_in_range(s, cidr):
        if cidr is None:
            return None
        net = ipaddress.IPv6Network(cidr, strict=False)
        addr = _complete_ipv6(s)
        return None if addr is None else addr in net

    spark.udf.register("ipv4_string_to_num", _map(v4_to_num, "bigint", 1))
    spark.udf.register("ipv4_num_to_string", _map(v4_from_num, "string", 1))
    spark.udf.register("ipv4_to_cidr_auto", _map(v4_cidr, "string", 1))
    spark.udf.register("ipv4_to_cidr2", _map(v4_cidr, "string", 2))
    spark.udf.register("ipv4_in_range", _map(v4_in_range, "boolean", 2))
    spark.udf.register("ipv6_string_to_num", _map(v6_to_num, "binary", 1))
    spark.udf.register("ipv6_num_to_string", _map(
        lambda h: v6_from_hex(h.lower()), "string", 1))
    spark.udf.register("ipv6_to_cidr_auto", _map(v6_cidr, "string", 1))
    spark.udf.register("ipv6_to_cidr2", _map(v6_cidr, "string", 2))
    spark.udf.register("ipv6_in_range", _map(v6_in_range, "boolean", 2))
