"""Composite predicate AST evaluated three-valued over chunk statistics.

Mirrors the reference's Predicate AST (src/predicate.rs:28-200: Comparison
with 6 ops, IsNull/IsNotNull, And/Or/Not with negation push-down) and its
three-valued min/max evaluation (src/row_group_filter.rs:54-205): a chunk
is skipped only when the predicate is DEFINITELY false given the chunk's
min/max/null_count; unknown stats keep the chunk. NOT is handled by
pushing the negation down De Morgan-style (Not(a AND b) -> Not(a) OR
Not(b), Not(Comparison) -> flipped op), exactly as the reference does,
because "might match" is not closed under complement.

Typed comparison: chunk stats are persisted as strings; numeric predicate
values try_cast the stat back to bigint/double before comparing
(row_group_filter.rs:207-368 typed eval analog; see pruned_read._typed_stat).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import chunk_table as ct
from .pruned_read import MAX_STAT_LEN, _rg_keep_groups, _stat_usable_bound, _typed_stat

_NEG_OP = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<"}


class Predicate:
    def columns(self) -> set[str]:
        raise NotImplementedError

    def negate(self) -> "Predicate":
        raise NotImplementedError

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        """Row groups (within one chunk) this predicate MIGHT match, given
        each indexed column's per-group stats. Composition mirrors the
        reference's RowSelection algebra (src/row_selection.rs:32-260
        from_filters/and_then): And intersects, Or unions, Not pushes the
        negation down. Columns without an index keep every group."""
        return set(range(n_groups))

    def might_match(self) -> Column:
        """Boolean Column over the per-chunk stats pivot (True = keep)."""
        raise NotImplementedError

    def to_spark(self) -> Column:
        """The exact predicate over decoded rows (the residual filter)."""
        raise NotImplementedError


@dataclass(frozen=True)
class Comparison(Predicate):
    col: str
    op: str  # = != < <= > >=
    value: object

    def columns(self) -> set[str]:
        return {self.col}

    def negate(self) -> Predicate:
        return Comparison(self.col, _NEG_OP[self.op], self.value)

    def might_match(self) -> Column:
        # the same probe-usability and codec-compatibility guards as
        # prune_chunks_stats / rg_keep (code-review r6): a datetime or
        # Decimal probe would compare lexicographically against
        # epoch/mantissa stat strings and wrongly prune, and decimal
        # mantissa stats are never comparable to user values
        if not _stat_usable_bound(self.value):
            return F.lit(True)
        codec = F.col(f"codec__{self.col}")
        numeric_codecs = ("rle_v2", "rle_v1", "byte_rle", "date",
                          "timestamp_split")
        if isinstance(self.value, bool):
            comparable = codec == "boolean_rle"
        elif isinstance(self.value, (int, float)):
            comparable = codec.isin(*numeric_codecs, "float_plain")
        elif isinstance(self.value, str):
            comparable = ~codec.isin(
                *numeric_codecs, "decimal", "float_plain", "boolean_rle")
        else:
            comparable = F.lit(False)
        min_stat, lit = _typed_stat(f"min__{self.col}", self.value)
        max_stat, _ = _typed_stat(f"max__{self.col}", self.value)
        # a string max truncated to MAX_STAT_LEN chars is an unusable upper
        # bound (the true max extends past the prefix)
        if isinstance(self.value, str):
            max_stat = F.when(
                F.length(F.col(f"max__{self.col}")) < MAX_STAT_LEN, max_stat
            )
        if self.op == "=":
            definitely_false = (max_stat < lit) | (min_stat > lit)
        elif self.op == "!=":
            # false only when every value in the chunk equals v
            definitely_false = (min_stat == lit) & (max_stat == lit)
        elif self.op == "<":
            definitely_false = min_stat >= lit
        elif self.op == "<=":
            definitely_false = min_stat > lit
        elif self.op == ">":
            definitely_false = max_stat <= lit
        elif self.op == ">=":
            definitely_false = max_stat < lit
        else:
            raise ValueError(f"unknown op {self.op!r}")
        return ~(comparable & definitely_false).eqNullSafe(F.lit(True))

    def to_spark(self) -> Column:
        c, v = F.col(self.col), F.lit(self.value)
        return {
            "=": c == v, "!=": c != v, "<": c < v,
            "<=": c <= v, ">": c > v, ">=": c >= v,
        }[self.op]

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        """Delegates the shared typed three-valued evaluation to
        pruned_read._rg_keep_groups (one implementation for both pruning
        paths — code-review r6); only the != op, which the lo/hi algebra
        cannot express, is handled here."""
        rg = rg_by_col.get(self.col)
        universe = set(range(n_groups))
        if rg is None or len(rg["n"]) != n_groups:
            return universe
        v, op = self.value, self.op
        if op == "!=":
            if rg["codec"] == "decimal" or not _stat_usable_bound(v):
                return universe
            numeric = rg["codec"] in (
                "rle_v2", "rle_v1", "byte_rle", "date", "timestamp_split")
            floaty = rg["codec"] == "float_plain"
            stringy = not numeric and not floaty
            if stringy != isinstance(v, str):
                return universe

            def parse(x):
                try:
                    return int(x) if numeric else float(x) if floaty else x
                except (TypeError, ValueError):
                    return None

            keep = set()
            for g in range(n_groups):
                mn, mx = parse(rg["min"][g]), parse(rg["max"][g])
                mx_usable = not (stringy and isinstance(mx, str)
                                 and len(mx) >= MAX_STAT_LEN)
                # false only when every value in the group equals v
                if not (mn is not None and mx_usable and mn == v and mx == v):
                    keep.add(g)
            return keep
        kw = {
            "=": {"eq_value": v},
            "<": {"hi": v, "hi_strict": True},
            "<=": {"hi": v},
            ">": {"lo": v, "lo_strict": True},
            ">=": {"lo": v},
        }[op]
        return set(_rg_keep_groups(rg, **kw))


@dataclass(frozen=True)
class IsNull(Predicate):
    col: str

    def columns(self) -> set[str]:
        return {self.col}

    def negate(self) -> Predicate:
        return IsNotNull(self.col)

    def might_match(self) -> Column:
        nulls = F.col(f"nulls__{self.col}")
        return ~(nulls == 0).eqNullSafe(F.lit(True))

    def to_spark(self) -> Column:
        return F.col(self.col).isNull()

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        rg = rg_by_col.get(self.col)
        if rg is None or len(rg["n"]) != n_groups:
            return set(range(n_groups))
        return {g for g in range(n_groups) if int(rg["nulls"][g]) > 0}


@dataclass(frozen=True)
class IsNotNull(Predicate):
    col: str

    def columns(self) -> set[str]:
        return {self.col}

    def negate(self) -> Predicate:
        return IsNull(self.col)

    def might_match(self) -> Column:
        nulls, rows = F.col(f"nulls__{self.col}"), F.col(f"rows__{self.col}")
        return ~(nulls == rows).eqNullSafe(F.lit(True))

    def to_spark(self) -> Column:
        return F.col(self.col).isNotNull()

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        rg = rg_by_col.get(self.col)
        if rg is None or len(rg["n"]) != n_groups:
            return set(range(n_groups))
        return {g for g in range(n_groups) if int(rg["nulls"][g]) < int(rg["n"][g])}


@dataclass(frozen=True)
class And(Predicate):
    preds: tuple

    def __init__(self, *preds: Predicate):
        object.__setattr__(self, "preds", tuple(preds))

    def columns(self) -> set[str]:
        return set().union(*(p.columns() for p in self.preds))

    def negate(self) -> Predicate:
        return Or(*(p.negate() for p in self.preds))

    def might_match(self) -> Column:
        out = F.lit(True)
        for p in self.preds:
            out = out & p.might_match()
        return out

    def to_spark(self) -> Column:
        out = F.lit(True)
        for p in self.preds:
            out = out & p.to_spark()
        return out

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        out = set(range(n_groups))
        for p in self.preds:
            out &= p.rg_keep(rg_by_col, n_groups)
        return out


@dataclass(frozen=True)
class Or(Predicate):
    preds: tuple

    def __init__(self, *preds: Predicate):
        object.__setattr__(self, "preds", tuple(preds))

    def columns(self) -> set[str]:
        return set().union(*(p.columns() for p in self.preds))

    def negate(self) -> Predicate:
        return And(*(p.negate() for p in self.preds))

    def might_match(self) -> Column:
        out = F.lit(False)
        for p in self.preds:
            out = out | p.might_match()
        return out

    def to_spark(self) -> Column:
        out = F.lit(False)
        for p in self.preds:
            out = out | p.to_spark()
        return out

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        out: set[int] = set()
        for p in self.preds:
            out |= p.rg_keep(rg_by_col, n_groups)
        return out


@dataclass(frozen=True)
class Not(Predicate):
    pred: Predicate

    def columns(self) -> set[str]:
        return self.pred.columns()

    def negate(self) -> Predicate:
        return self.pred

    def might_match(self) -> Column:
        # push-down: evaluate the negated predicate (reference
        # row_group_filter.rs handles NOT via Predicate::negate())
        return self.pred.negate().might_match()

    def to_spark(self) -> Column:
        return ~self.pred.to_spark()

    def rg_keep(self, rg_by_col: dict, n_groups: int) -> set[int]:
        return self.pred.negate().rg_keep(rg_by_col, n_groups)


def chunk_stats_pivot(chunks: DataFrame, cols: list[str]) -> DataFrame:
    """One row per chunk with min__c/max__c/nulls__c/rows__c per column."""
    meta = chunks.where(
        (F.col("stream_kind") == ct.DATA) & F.col("column").isin(list(cols))
    )
    aggs = []
    for c in cols:
        is_c = F.col("column") == c
        aggs += [
            F.first(F.when(is_c, F.col("codec")), ignorenulls=True).alias(f"codec__{c}"),
            F.first(F.when(is_c, F.col("min_val")), ignorenulls=True).alias(f"min__{c}"),
            F.first(F.when(is_c, F.col("max_val")), ignorenulls=True).alias(f"max__{c}"),
            F.first(F.when(is_c, F.col("null_count")), ignorenulls=True).alias(f"nulls__{c}"),
            F.first(F.when(is_c, F.col("row_count")), ignorenulls=True).alias(f"rows__{c}"),
        ]
    return meta.groupBy("part_id", "chunk_ord").agg(*aggs)


def prune_chunks_predicate(chunks: DataFrame, pred: Predicate) -> DataFrame:
    """Chunk keys whose stats say the predicate MIGHT match."""
    pivot = chunk_stats_pivot(chunks, sorted(pred.columns()))
    return pivot.where(pred.might_match()).select("part_id", "chunk_ord")


def rg_keep_for_chunk(pdf, pred: Predicate) -> list[int] | None:
    """Composed row-group keep list for one chunk's stream rows (pandas
    frame), or None when no column is indexed / nothing can be skipped."""
    import json

    rg_by_col: dict[str, dict] = {}
    sel = pdf[pdf["stream_kind"] == ct.DATA]
    for col, sj in zip(sel["column"], sel["stats_json"]):
        if sj:
            rg = json.loads(sj).get("rg")
            if rg:
                rg_by_col[col] = rg
    if not rg_by_col:
        return None
    grids = list(rg_by_col.values())
    if any(g["n"] != grids[0]["n"] for g in grids[1:]):
        # per-column row_index_stride overrides put the indexed columns on
        # DIFFERENT group grids: a keep list computed on one grid would
        # slice the others at wrong row spans (code-review r6) — skip
        # group pruning; the chunk still decodes and the residual filter
        # gives exact rows
        return None
    n_groups = len(grids[0]["n"])
    keep = sorted(pred.rg_keep(rg_by_col, n_groups))
    return None if len(keep) >= n_groups else keep


def pruned_scan(
    chunks: DataFrame, schema: T.StructType, pred: Predicate
) -> tuple[DataFrame, DataFrame]:
    """-> (decoded rows satisfying pred exactly, kept chunk keys).

    Two pruning granularities: chunk-level stats (might_match pivot), then
    within each surviving chunk the per-COLUMN row-group keep lists are
    COMPOSED across the predicate tree (And intersects, Or unions — the
    reference's RowSelection and_then/union, src/row_selection.rs:32-260)
    so a multi-column predicate skips groups on every indexed column, not
    just one."""
    import pandas as pd

    keys = prune_chunks_predicate(chunks, pred)
    pruned = chunks.join(F.broadcast(keys), ["part_id", "chunk_ord"], "left_semi")
    from .decode import decode_chunk_pdf

    col_types = {f.name: f.dataType for f in schema.fields}

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return decode_chunk_pdf(pdf, col_types, rg_keep=rg_keep_for_chunk(pdf, pred))

    decoded = pruned.groupBy("part_id", "chunk_ord").applyInPandas(
        decode_group, schema=schema)
    return decoded.where(pred.to_spark()), keys
