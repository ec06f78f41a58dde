"""Single-process micro-bench of shingle kernel variants over the real
sf0.1 documents text column (no Spark)."""
import hashlib
import re
import sys
import time

import duckdb
import numpy as np
import pandas as pd

texts = [
    r[0]
    for r in duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.1/documents.parquet'"
    ).fetchall()
]
k = 5
ws = re.compile(r"\s+")


def old_kernel(texts):
    out = []
    for text in texts:
        toks = ws.split(text.lower()) if text else []
        n = len(toks)
        if n >= k:
            hs = {
                int.from_bytes(
                    hashlib.blake2b(
                        " ".join(toks[i : i + k]).encode(), digest_size=8
                    ).digest(),
                    "big",
                    signed=True,
                )
                for i in range(n - k + 1)
            }
        else:
            hs = set()
        out.append(list(hs))
    return out


def new_kernel(texts):
    counts, flat = [], []
    for text in texts:
        toks = ws.split(text.lower()) if text else []
        n = len(toks)
        m = n - k + 1
        if m > 0:
            counts.append(m)
            joined = " ".join(toks)
            starts = [0] * n
            pos = 0
            for j, tk in enumerate(toks):
                starts[j] = pos
                pos += len(tk) + 1
            flat.extend(
                joined[starts[i] : starts[i + k - 1] + len(toks[i + k - 1])]
                for i in range(m)
            )
        else:
            counts.append(0)
    n_docs = len(counts)
    codes, uniq = pd.factorize(np.array(flat, dtype=object), sort=False)
    uh = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(u.encode(), digest_size=8).digest(), "big", signed=True
            )
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    h = uh[codes]
    d = np.repeat(np.arange(n_docs), counts)
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    keep = np.ones(len(d), bool)
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    d, h = d[keep], h[keep]
    bounds = np.searchsorted(d, np.arange(n_docs + 1))
    return [h[bounds[i] : bounds[i + 1]] for i in range(n_docs)], len(flat), len(uniq)


t0 = time.time(); o = old_kernel(texts); t_old = time.time() - t0
t0 = time.time(); nres, n_flat, n_uniq = new_kernel(texts); t_new = time.time() - t0
print(f"docs={len(texts)} occurrences={n_flat} uniques={n_uniq} dedup={n_flat/max(1,n_uniq):.2f}x")
print(f"old {t_old:.3f}s   new {t_new:.3f}s")
# value check
for i in (0, 1, 42, len(texts) - 1):
    assert sorted(o[i]) == list(nres[i]), i
print("values identical")
