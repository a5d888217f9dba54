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
from .decode import decode_table_arrow
from .pruned_read import MAX_STAT_LEN, _typed_stat

_NEG_OP = {"=": "!=", "!=": "=", "<": ">=", "<=": ">", ">": "<=", ">=": "<"}


class Predicate:
    def columns(self) -> set[str]:
        raise NotImplementedError

    def negate(self) -> "Predicate":
        raise NotImplementedError

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
        return ~definitely_false.eqNullSafe(F.lit(True))

    def to_spark(self) -> Column:
        c, v = F.col(self.col), F.lit(self.value)
        return {
            "=": c == v, "!=": c != v, "<": c < v,
            "<=": c <= v, ">": c > v, ">=": c >= v,
        }[self.op]


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


def chunk_stats_pivot(chunks: DataFrame, cols: list[str]) -> DataFrame:
    """One row per chunk with min__c/max__c/nulls__c/rows__c per column."""
    meta = chunks.where(
        (F.col("stream_kind") == ct.DATA) & F.col("column").isin(list(cols))
    )
    aggs = []
    for c in cols:
        is_c = F.col("column") == c
        aggs += [
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


def pruned_scan(
    chunks: DataFrame, schema: T.StructType, pred: Predicate
) -> tuple[DataFrame, DataFrame]:
    """-> (decoded rows satisfying pred exactly, kept chunk keys)."""
    keys = prune_chunks_predicate(chunks, pred)
    pruned = chunks.join(F.broadcast(keys), ["part_id", "chunk_ord"], "left_semi")
    decoded = decode_table_arrow(pruned, schema)
    return decoded.where(pred.to_spark()), keys
