"""URL canonicalization for crawl-scale dedup (the RefinedWeb /
CCNet-style URL normalization step that precedes url-keyed dedup).

Rules, applied in order:

1. lowercase the scheme and host;
2. strip the scheme's default port (``:80`` http, ``:443`` https);
3. drop the fragment;
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``);
5. sort the surviving query params lexicographically (full ``k=v``
   strings, stable);
6. strip trailing slashes from a non-root path.

Everything is pandas/numpy vectorized (one regex extract for the parts,
explode/sort/groupby-join for the params) — no per-row Python. The
reference loads Mongo records and has no URL hygiene; this is part of
the training-data surface over the webtext schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PARTS_RE = (r'^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.\-]*)://'
             r'(?P<hostport>[^/?#]*)(?P<path>[^?#]*)'
             r'(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$')
_TRACKING_RE = r'^(utm_[^=]*|fbclid|gclid)='
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical form per url; None in → None out; a non-URL string
    (no ``scheme://``) passes through unchanged (crawl reality: keep,
    don't crash)."""
    s = pd.Series(
        urls.to_pandas() if hasattr(urls, "to_pandas") else urls)
    parts = s.str.extract(_PARTS_RE)
    ok = parts["scheme"].notna()
    scheme = parts["scheme"].str.lower()
    host = parts["hostport"].str.lower()
    # strip default port for the scheme
    for sch, port in _DEFAULT_PORTS.items():
        hit = ok & (scheme == sch) & host.str.endswith(port)
        host = host.mask(hit, host.str[:-len(port)])
    path = parts["path"].fillna("")
    path = path.str.replace(r'(.+?)/+$', r'\1', regex=True)
    # query params: drop tracking, sort survivors
    q = parts["query"].fillna("")
    qi = q[ok & (q != "")]
    if len(qi):
        ex = qi.str.split("&").explode()
        ex = ex[(ex != "") & ~ex.str.match(_TRACKING_RE)]
        ex = ex.reset_index().rename(columns={ex.name or 0: "p"})
        ex.columns = ["i", "p"]
        ex = ex.sort_values(["i", "p"], kind="stable")
        joined = ex.groupby("i")["p"].agg("&".join)
        qq = pd.Series("", index=q.index)
        qq.loc[joined.index] = joined
    else:
        qq = pd.Series("", index=q.index)
    canon = scheme + "://" + host + path + np.where(qq != "", "?", "") + qq
    out = s.where(~ok, canon)
    return pa.array(out.to_numpy(dtype=object), pa.string())
