"""Public column-function API of the engine — JVM-side expressions usable
in any DataFrame pipeline (all whole-stage-codegen friendly, no UDFs).

>>> from orc_rust_spark import functions as EF
>>> docs.select(EF.token_count(F.col("text")), EF.fingerprint(F.col("text")))
"""

from ..operators.similarity import _dot as dot_product  # noqa: F401
from ..operators.similarity import _norm as l2_norm  # noqa: F401
from ..operators.text_analysis import (  # noqa: F401
    fingerprint_col as fingerprint,
    lang_id_col as lang_id,
    lang_marker_score,
    punct_ratio_col as punct_ratio,
    quality_score_col as quality_score,
    stopword_ratio_col as stopword_ratio,
    token_count_col as token_count,
)

__all__ = [
    "dot_product",
    "l2_norm",
    "fingerprint",
    "lang_id",
    "lang_marker_score",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
]
