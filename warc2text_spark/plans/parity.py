"""The driver's result-compare normalization, in one place.

Both the sf0.001 pytest harness (tests/test_oracle_parity.py) and the
sf0.01 rehearsal tool (tools/rehearse_driver.py) must apply the exact
rules the round driver applies when it hashes query results against the
DuckDB oracles: columns sorted by (lowercased) name, floats — and
anything float-like, e.g. DECIMAL — rounded to 9 digits, NaN collapsed
to a sentinel, order-insensitive multiset compare.  Divergent copies of
these rules produce false alarms (or false confidence); keep them here.
"""

from __future__ import annotations

import math


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "__float__") and not isinstance(v, (int, bool)):
        return round(float(v), 9)
    return v


def rows_to_multiset(cols, rows):
    """Order-insensitive canonical form: columns sorted by lowercased
    name, values normalized, rows sorted."""
    lowered = [c.lower() for c in cols]
    order = sorted(range(len(lowered)), key=lambda i: lowered[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)
