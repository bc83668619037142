"""Ingest ETL pipelines — declarative processors as column transforms.

Reference: src/pipeline/src/etl/processor/*.rs (18 processors: dissect,
regex, gsub, csv, json_parse, json_path, date, epoch, urlencoding, letter,
decolorize, digest, simple_extract, join, select, filter, cmcd, vrl).
Each processor here rewrites columns with JVM expressions only, so a whole
pipeline stays inside the scan stage — the natural Spark shape for a
write-path ETL that must keep up with ingest at 100 TB.

vrl is intentionally out of scope (an embedded scripting language);
cmcd is implemented as typed column extraction (17/18 processors).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Processor = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """Ordered processor chain (reference etl/mod.rs Pipeline)."""

    processors: list[Processor] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        for p in self.processors:
            df = p(df)
        return df


# -- field extraction ------------------------------------------------------------

def dissect(src: str, pattern: str) -> Processor:
    """Dissect pattern '%{a} %{b} → %{c}' compiled to a regex with named
    groups (reference processor/dissect.rs). '%{}' skips a token;
    '%{+x}' append modifiers are not supported."""
    regex = ""
    pos = 0
    fields: list[str] = []
    for m in re.finditer(r"%\{([^}]*)\}", pattern):
        regex += re.escape(pattern[pos:m.start()])
        name = m.group(1)
        if name:
            fields.append(name)
            regex += f"(?<{name}>.*?)" if False else "(.*?)"
        else:
            regex += "(?:.*?)"
        pos = m.end()
    regex += re.escape(pattern[pos:])
    # make trailing lazy group greedy so it captures to end of line
    if regex.endswith("(.*?)"):
        regex = regex[:-5] + "(.*)"

    def proc(df: DataFrame) -> DataFrame:
        for i, name in enumerate(fields, start=1):
            df = df.withColumn(name, F.regexp_extract(F.col(src), regex, i))
        return df

    return proc


def regex_extract(src: str, pattern: str, groups: dict[str, int]) -> Processor:
    """name → capture-group index (reference processor/regex.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        for name, idx in groups.items():
            df = df.withColumn(name, F.regexp_extract(F.col(src), pattern, idx))
        return df

    return proc


def simple_extract(src: str, dst: str, json_key: str) -> Processor:
    """Single JSON key extraction (processor/simple_extract.rs)."""
    path = "$." + json_key

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(dst, F.get_json_object(F.col(src), path))

    return proc


def csv_parse(src: str, names: list[str], sep: str = ",") -> Processor:
    """Split a delimited field into named columns (processor/csv.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        parts = F.split(F.col(src), re.escape(sep))
        for i, name in enumerate(names):
            df = df.withColumn(name, F.element_at(parts, i + 1))
        return df

    return proc


def json_parse(src: str, dst: str, schema: str) -> Processor:
    """Parse JSON text into a struct column (processor/json_parse.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(dst, F.from_json(F.col(src), schema))

    return proc


def json_path(src: str, dst: str, path: str) -> Processor:
    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(dst, F.get_json_object(F.col(src), path))

    return proc


# -- value transforms ---------------------------------------------------------------

def gsub(col: str, pattern: str, replacement: str) -> Processor:
    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(col, F.regexp_replace(F.col(col), pattern, replacement))

    return proc


def letter(col: str, method: str = "lower") -> Processor:
    """lower/upper/capital case (processor/letter.rs)."""
    fn = {"lower": F.lower, "upper": F.upper, "capital": F.initcap}[method]

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(col, fn(F.col(col)))

    return proc


def decolorize(col: str) -> Processor:
    """Strip ANSI color escapes (processor/decolorize.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(col, F.regexp_replace(F.col(col), r"\x1b\[[0-9;]*m", ""))

    return proc


def digest(src: str, dst: str | None = None) -> Processor:
    """md5 digest of a field (processor/digest.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(dst or f"{src}_digest", F.md5(F.col(src).cast("binary")))

    return proc


def urlencoding(col: str, method: str = "decode") -> Processor:
    fn = F.url_decode if method == "decode" else F.url_encode

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(col, fn(F.col(col)))

    return proc


# CMCD (Common Media Client Data, CTA-5004) reserved keys and their value
# types (reference processor/cmcd.rs CMCD_KEYS): int kbps/ms counters,
# presence-booleans, raw tokens/quoted strings, the url-encoded `nor`
# path, and the decimal playback rate.
_CMCD_INT_KEYS = ("br", "bl", "d", "dl", "mtp", "rtp", "tb")
_CMCD_BOOL_KEYS = ("bs", "su")
_CMCD_STR_KEYS = ("cid", "nrr", "ot", "sf", "sid", "st", "v")


def cmcd(src: str) -> Processor:
    """Parse a CMCD payload (already url-decoded, as the reference's
    processor receives it) into typed `{src}_{key}` columns
    (processor/cmcd.rs parse()): `k=v` pairs split on commas; boolean keys
    are true by presence alone; string values keep their quotes; `nor` gets
    one extra url-decode; unknown/custom keys are not resolved. Columnar
    deviation: absent keys surface as NULL columns rather than missing map
    entries, and unparseable ints become NULL instead of failing the row."""

    def _val(k: str) -> Column:
        # quoted values may contain commas (CTA-5004 allows them inside
        # quoted cid/sid/nor) — match a full "..." token before falling back
        # to comma-delimited
        ex = F.regexp_extract(F.col(src), rf'(?:^|,)\s*{k}=("[^"]*"|[^,]*)', 1)
        return F.when(ex != "", ex)

    def proc(df: DataFrame) -> DataFrame:
        for k in _CMCD_INT_KEYS:
            df = df.withColumn(f"{src}_{k}", _val(k).cast("long"))
        for k in _CMCD_BOOL_KEYS:
            df = df.withColumn(
                f"{src}_{k}",
                F.when(F.col(src).rlike(rf"(?:^|,)\s*{k}(?:=|,|$)"),
                       F.lit(True)))
        for k in _CMCD_STR_KEYS:
            df = df.withColumn(f"{src}_{k}", _val(k))
        df = df.withColumn(f"{src}_nor", F.url_decode(_val("nor")))
        return df.withColumn(f"{src}_pr", _val("pr").cast("double"))

    return proc


def join_fields(dst: str, sep: str, srcs: list[str]) -> Processor:
    """Concatenate fields (processor/join.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(dst, F.concat_ws(sep, *[F.col(s) for s in srcs]))

    return proc


# -- time ------------------------------------------------------------------------------

def date_parse(src: str, dst: str | None = None, formats: list[str] | None = None) -> Processor:
    """Parse string timestamps, first matching format wins (processor/date.rs)."""
    fmts = formats or ["yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss"]

    def proc(df: DataFrame) -> DataFrame:
        col = None
        for f in fmts:
            parsed = F.try_to_timestamp(F.col(src), F.lit(f))
            col = parsed if col is None else F.coalesce(col, parsed)
        return df.withColumn(dst or src, col)

    return proc


def epoch(src: str, dst: str | None = None, unit: str = "ms") -> Processor:
    """Numeric epoch → timestamp (processor/timestamp.rs / epoch)."""

    def proc(df: DataFrame) -> DataFrame:
        c = F.col(src).cast("long")
        converted = {
            "s": F.timestamp_seconds(c),
            "ms": F.timestamp_millis(c),
            "us": F.timestamp_micros(c),
            "ns": F.timestamp_micros((c / 1000).cast("long")),
        }[unit]
        return df.withColumn(dst or src, converted)

    return proc


# -- row selection ----------------------------------------------------------------------

def select(columns: list[str]) -> Processor:
    def proc(df: DataFrame) -> DataFrame:
        return df.select(*columns)

    return proc


def filter_rows(predicate: str) -> Processor:
    """SQL predicate filter (processor/filter.rs)."""

    def proc(df: DataFrame) -> DataFrame:
        return df.filter(F.expr(predicate))

    return proc
