"""Union operators (SURVEY §2.6 U1).

``pd.concat(frames, ignore_index=True)`` aligns by column NAME and
null-fills missing columns — the exact Spark analog is
``unionByName(allowMissingColumns=True)``, not positional ``union``.
(Reference uses concat at every page/day/account merge point, e.g.
d2b_data/Google_GA4.py:268, search_console.py:385-388.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def concat(frames: list[DataFrame]) -> DataFrame:
    """Union any number of frames by name, null-filling missing columns."""
    if not frames:
        raise ValueError("concat of zero frames")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
