"""WDC-v2 text cleaning — the byte-identity anchor of the pipeline.

Semantics contract (parity with the reference's cleaning stage,
/root/reference/src/data/utils.py:14-33; see SURVEY.md §1.3):

``clean_string_wdcv2(s)``
  1. falsy input (None / '' )            → None
  2. drop through the FIRST double quote (str.partition('"')[2]; no quote → '')
  3. drop from the LAST double quote on  (str.rpartition('"')[0]; no quote → '')
  4. re.sub('"@\\S+\\s+', ' ')            — strip WDC-quad language tags ("@en )
  5. re.sub('\\s+', ' ')                  — unicode whitespace collapse
  6. remove remaining '"', then str.strip()

``clean_spec_table_content_wdcv2(s)``
  falsy → None; else whitespace collapse + strip (steps 5-6 minus quote removal).

Implementation notes (why pandas .str and not Spark SQL regexp_replace):
* partition/rpartition have no loss-free SQL translation on pathological
  inputs (exactly one quote → both sides collapse to ''), and Python's
  re module treats \\s as *unicode* whitespace (NBSP, \\u2009, ...) while
  Spark/RE2's \\s is ASCII-only. pandas .str.partition/.rpartition/
  .replace(regex)/.strip() call the exact CPython string/re machinery per
  element inside an Arrow-batched pandas UDF, so bytes match by construction
  while the Spark plan stays vectorized (no per-row Python UDF at the plan
  level, per BASELINE.json input_hint).
* Empty OUTPUT stays '' (only falsy INPUT maps to None) — tests pin this.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# WDC-quad artifacts: language-annotation tag following a closing quote.
_LANG_TAG = re.compile(r"\"@\S+\s+")
# Unicode whitespace runs (Python re \s is unicode-aware; this matters).
_WS = re.compile(r"\s+")


def clean_string_py(words: str | None) -> str | None:
    """Scalar reference implementation (used by tests and driver-side code)."""
    if not words:
        return None
    words = words.partition('"')[2]
    words = words.rpartition('"')[0]
    words = _LANG_TAG.sub(" ", words)
    words = _WS.sub(" ", words)
    words = words.replace('"', "")
    return words.strip()


def clean_spec_py(words: str | None) -> str | None:
    """Scalar reference implementation for specTableContent cleaning."""
    if not words:
        return None
    return _WS.sub(" ", words).strip()


def clean_string_series(s: pd.Series) -> pd.Series:
    """Vectorized clean_string over a pandas string Series.

    pandas .str accessors run the exact CPython semantics element-wise
    (partition/rpartition/re.sub/strip), which is what byte-identity needs.
    """
    s = s.astype("object")
    falsy = s.isna() | (s == "")
    work = s.where(~falsy, "")
    parts = work.str.partition('"')
    after_first = parts[2].fillna("")
    rparts = after_first.str.rpartition('"')
    body = rparts[0].fillna("")
    body = body.str.replace(_LANG_TAG, " ", regex=True)
    body = body.str.replace(_WS, " ", regex=True)
    body = body.str.replace('"', "", regex=False)
    body = body.str.strip()
    return body.mask(falsy, None)


def clean_spec_series(s: pd.Series) -> pd.Series:
    """Vectorized specTableContent clean over a pandas string Series."""
    s = s.astype("object")
    falsy = s.isna() | (s == "")
    work = s.where(~falsy, "")
    body = work.str.replace(_WS, " ", regex=True).str.strip()
    return body.mask(falsy, None)


@pandas_udf(StringType())
def clean_string_wdcv2(s: pd.Series) -> pd.Series:  # pragma: no cover - exercised via Spark
    return clean_string_series(s)


@pandas_udf(StringType())
def clean_spec_table_content_wdcv2(s: pd.Series) -> pd.Series:  # pragma: no cover
    return clean_spec_series(s)


def clean_string(col: Column) -> Column:
    """Column-level API: byte-identical WDC string cleaning."""
    return clean_string_wdcv2(col)


def clean_spec(col: Column) -> Column:
    """Column-level API: byte-identical specTableContent cleaning."""
    return clean_spec_table_content_wdcv2(col)
