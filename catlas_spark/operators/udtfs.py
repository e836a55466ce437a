"""Python user-defined table functions (Spark 4 native UDTF surface).

The reference's table-valued steps (catlas/prediction_steps.py — one
input row expands to many output rows) map to three Spark forms in this
repo: built-in generators (explode/posexplode/sequence — always first
choice), Arrow-batched mapInPandas (operators/multimodal.py), and — this
module — the Spark-4 `@udtf` class form, which is the right fit when the
expansion is per-row STATEFUL (an accumulator walks each row's payload)
and you want SQL/LATERAL-join integration for free. UDTFs are still a
Python stage: keep them off corpus-sized hot paths unless Arrow-enabled,
and whitelist them in tests/test_physical_plans.py like every other
intentional Python stage.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="run_idx int, token string, run_len int", useArrow=True)
class RunLengthTokens:
    """Run-length encode a document's token stream: one output row per
    maximal run of consecutive equal tokens with length >= 2 (the
    compression-shaped repetition signal; single-token runs are
    suppressed at the source to keep the Python→JVM transfer
    output-sized, but `run_idx` still counts ALL runs so positions are
    stable). Tokenization matches the corpus-wide convention
    (functions.text r8: lowercase, ASCII-whitespace STRIP, explicit
    [ \\t\\n\\x0B\\f\\r]+ split) with Python's Unicode notions pinned
    back to it: re.ASCII \\s is exactly that class, and the explicit
    ``_WS`` strip avoids Python str.strip()'s Unicode whitespace (NBSP,
    U+2028, ideographic space — which neither engine strips). NOTE the
    old oracle used SQL ``trim`` (U+0020 only), which KEPT the phantom
    empty token a leading tab mints — the r8 unification moved BOTH
    sides to the full ASCII strip."""

    _WS = " \t\n\r\f\v"

    def eval(self, text: str):
        toks = re.sub(
            r"\s+", " ", (text or "").strip(self._WS).lower(), flags=re.ASCII
        ).split(" ")
        run_idx = 0
        i = 0
        n = len(toks)
        while i < n:
            j = i
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= 2:
                yield run_idx, toks[i], j - i
            run_idx += 1
            i = j
