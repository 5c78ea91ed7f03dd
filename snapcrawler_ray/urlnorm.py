"""URL canonicalization helpers (M12).

The reference canonicalizes by ``urljoin`` + ``.strip()`` at every
extraction site; extracted URLs here are already absolute (urljoin'd in
html/extract.py), so canonicalize = strip.  Host extraction is the
politeness/shuffle key and is vectorized (one regex pass over the
column, no per-row urlparse on the hot path).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)")


def host_of(url: str) -> str:
    m = _HOST_RE.match(url)
    return m.group(1).lower() if m else ""


def hosts_of(urls) -> np.ndarray:
    """Vectorized host extraction for an array/sequence of URLs."""
    s = pd.Series(np.asarray(urls, dtype=object), dtype=object)
    return (
        s.str.extract(_HOST_RE, expand=False).str.lower().fillna("").to_numpy(object)
    )


def canonicalize(urls) -> np.ndarray:
    s = pd.Series(np.asarray(urls, dtype=object), dtype=object)
    return s.str.strip().to_numpy(object)
