"""Independent test oracle for WDC-v2 cleaning semantics.

Written directly from the published cleaning contract of the reference
pipeline (/root/reference/src/data/utils.py:14-33) as documented in
SURVEY.md §1.3 — deliberately a *separate* implementation from
productbert_intermediate_spark.functions.cleaning so the golden tests
compare two independently-written codepaths byte-for-byte.
"""

import re

_TAG = re.compile(r"\"@\S+\s+")
_SPACE = re.compile(r"\s+")


def oracle_clean_string(words):
    # Step 0: falsy (None / '') → None        [utils.py:18-19]
    if not words:
        return None
    # Step 1: drop through the first '"'      [utils.py:20]
    first = words.find('"')
    words = "" if first < 0 else words[first + 1 :]
    # Step 2: drop from the last '"' onward   [utils.py:21]
    last = words.rfind('"')
    words = "" if last < 0 else words[:last]
    # Step 3: strip "@lang tags               [utils.py:22]
    words = _TAG.sub(" ", words)
    # Step 4: collapse unicode whitespace     [utils.py:23]
    words = _SPACE.sub(" ", words)
    # Step 5: drop remaining quotes, strip    [utils.py:24-25]
    return words.replace('"', "").strip()


def oracle_clean_spec(words):
    if not words:
        return None
    return _SPACE.sub(" ", words).strip()
