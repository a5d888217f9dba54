"""Deterministic synthetic Common-Crawl-style webtext table.

Schema is exactly BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation follows FIXTURES.md §1: Zipfian host-domain skew (the skew the
north rule's salted repartition defuses), per-domain monotonically
increasing timestamps (RLEv2-delta-friendly), lognormal html sizes, a
fixed 5000-word vocabulary for text with ~10% empty / ~1% null, and a
25-code Zipfian lang column (dictionary-friendly).

Distributed: built with spark.range(n) + mapInPandas; each partition seeds
its own NumPy generator from (seed, partition ordinal derived from row ids),
so output is deterministic for a fixed (seed, n, num_partitions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), False),
    ]
)

N_HOSTS = 1000
N_LANGS = 25
VOCAB_SIZE = 5000
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC in microseconds

_SLUGS = None
_VOCAB = None
_LANGS = None


def _tables():
    global _SLUGS, _VOCAB, _LANGS
    if _SLUGS is None:
        cons = list("bcdfghjklmnpqrstvwz")
        vows = list("aeiou")
        def word(i):
            r = np.random.default_rng(1000 + i)
            n = int(r.integers(2, 5))
            return "".join(
                cons[int(r.integers(0, len(cons)))] + vows[int(r.integers(0, len(vows)))]
                for _ in range(n)
            )
        _VOCAB = np.array([word(i) for i in range(VOCAB_SIZE)], dtype=object)
        _SLUGS = np.array([word(10**6 + i) for i in range(512)], dtype=object)
        _LANGS = np.array(
            "en de fr es zh ru ja pt it nl pl tr ar ko sv cs fi hu el da no ro uk vi th".split(),
            dtype=object,
        )
    return _SLUGS, _VOCAB, _LANGS


def _zipf_probs(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


def generate_pdf(row_ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate webtext rows for explicit row ordinals (deterministic)."""
    slugs, vocab, langs = _tables()
    n = row_ids.size
    rng = np.random.default_rng([seed, int(row_ids[0]) if n else 0])

    host_probs = _zipf_probs(N_HOSTS, 1.2)
    hosts = rng.choice(N_HOSTS, size=n, p=host_probs)
    lang_probs = _zipf_probs(N_LANGS, 1.4)
    lang_idx = rng.choice(N_LANGS, size=n, p=lang_probs)

    n_path = rng.integers(1, 5, size=n)
    slug_idx = rng.integers(0, 512, size=(n, 4))
    slug_strs = slugs[slug_idx]
    paths = [
        "/".join(slug_strs[i, : n_path[i]]) + f"/{row_ids[i]}"
        for i in range(n)
    ]
    urls = pd.array(
        [f"https://host-{hosts[i]:04d}.example.com/{paths[i]}" for i in range(n)],
        dtype=str,
    )

    # per-domain monotone-ish offsets: base + host-correlated drift + ordinal
    ts_us = (
        BASE_TS_US
        + row_ids.astype(np.int64) * 1_000_000
        + hosts.astype(np.int64) * 17
        + rng.integers(0, 1000, size=n)
    )

    # text: sentences from the vocabulary; ~10% empty, ~1% null
    text_kind = rng.random(n)
    n_words = rng.integers(8, 120, size=n)
    word_idx = rng.integers(0, VOCAB_SIZE, size=(n, 120))
    texts: list[str | None] = []
    for i in range(n):
        if text_kind[i] < 0.01:
            texts.append(None)
        elif text_kind[i] < 0.11:
            texts.append("")
        else:
            texts.append(" ".join(vocab[word_idx[i, : n_words[i]]]))

    # html: template + tag soup + embedded text, lognormal length clipped
    target = np.clip(rng.lognormal(7.0, 0.8, size=n), 256, 65536).astype(np.int64)
    soup = b"<div class=\"c\"><p>lorem ipsum dolor</p><a href=\"#\">x</a></div>"
    htmls = []
    for i in range(n):
        body = (texts[i] or "").encode()
        filler = soup * max(0, (target[i] - len(body) - 64) // len(soup) + 1)
        htmls.append(b"<html><head><title>t</title></head><body>" + body + filler[: max(0, target[i] - len(body) - 64)] + b"</body></html>")

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts_us, unit="us"),
            "html": htmls,
            "text": pd.array(texts, dtype=object),
            "lang": langs[lang_idx],
        }
    )


def webtext_df(
    spark: SparkSession, n_rows: int, num_partitions: int | None = None, seed: int = 42
) -> DataFrame:
    """Distributed deterministic webtext DataFrame."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield generate_pdf(ids, seed=seed)

    return (
        spark.range(0, n_rows, numPartitions=num_partitions)
        .mapInPandas(gen, schema=WEBTEXT_SCHEMA)
    )
