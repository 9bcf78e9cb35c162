"""Python user-defined table functions (Spark 4 ``udtf`` surface).

Rounds out the UDF surface inventory (SURVEY.md §2.9: the reference
has row UDFs and an RDD fan-out "UDTF"; Spark 4 gives a first-class
lateral table function). The rule from the rest of the engine still
holds — built-ins beat Python — so UDTFs are reserved for genuinely
procedural row-expansion logic; ``register_udtfs`` always enables
Arrow transport (``ArrowEvalPythonUDTF``: columnar batches, not
row-at-a-time pickling).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# explicit whitespace class so Python (unicode-aware \s) and the
# DuckDB oracle (RE2) cannot disagree on exotic whitespace
_WS = re.compile(r"[\t\n\r\f ]+")

WINDOW_WIDTH = 12
WINDOW_STRIDE = 6


# useArrow at decoration time: the session conf is only consulted when
# the UDTF object is created, so a runtime conf flip after import would
# silently leave the row-pickling path (BatchEvalPythonUDTF)
@udtf(returnType="win_idx int, start_word int, chunk string, n_words int", useArrow=True)
class WordWindows:
    """Sliding word-window chunker: one document row -> one row per
    overlapping ``WINDOW_WIDTH``-word window at ``WINDOW_STRIDE``-word
    hops (the overlapping-context variant of ``doc_chunks`` — overlap
    preserves context across chunk boundaries for LLM training).

    Parity contract (oracle-checked by ``udtf_word_windows``):
    whitespace-run tokenization, 0-based window index and start-word
    offset, windows start at every stride multiple < n_words, the
    tail window may be short.
    """

    def eval(self, text: str | None):
        if text is None:
            return
        words = [w for w in _WS.split(text) if w]
        n = len(words)
        idx = 0
        for start in range(0, n, WINDOW_STRIDE):
            chunk = words[start : start + WINDOW_WIDTH]
            yield (idx, start, " ".join(chunk), len(chunk))
            idx += 1


def register_udtfs(spark) -> None:
    """Registers every engine UDTF for SQL use and switches the
    session's Python-UDTF transport to Arrow (safe to call per-query:
    both operations are idempotent)."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("word_windows", WordWindows)
