"""Hash-based factorization of key columns.

``np.unique(arr, return_inverse=True)`` on object/string arrays is an
O(n log n) *comparison* sort over Python objects — measured 7.5 s for 4 M
rows of 500 distinct sources.  pandas' ``factorize`` is a hash table pass
(0.22 s, 33x) and with ``sort=True`` returns the EXACT same (sorted
uniques, inverse codes) pair, so every key-hashing / lexsort kernel in the
exchange and join paths swaps in bit-identically.
"""

from __future__ import annotations

import numpy as np


def factorize_sorted(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (sorted_uniques, inverse_codes) via pandas' hash-based factorize.

    np.unique(..., return_inverse=True) semantics for null-FREE input.
    NULL CAVEAT: nulls code as -1 and are ABSENT from uniques — so
    ``uniq[codes]`` fancy-indexing silently aliases null rows to the
    LAST unique (Python's -1 indexing).  Callers that may see nulls must
    either pre-filter them or append a sentinel (see the salted.py
    sentinel pattern) before round-tripping codes through uniques;
    equality/grouping uses of the codes alone are safe (-1 is its own
    group)."""
    import pandas as pd

    codes, uniq = pd.factorize(arr, sort=True)
    return np.asarray(uniq), codes
