"""Index statistics: the reference `info` command surface.

Mirrors cmdInfo/totalInfo/displayGrams (/root/reference/
fts-lmdb.go:241-381): DB-wide counts, per-group listings, and the
gram-selectivity histogram — min/max posting sizes plus a coverage
CDF at the reference's 15 percentage thresholds (fts-lmdb.go:330:
what fraction of grams appear in <= X% of chunks). The bounded
50,653-term vocabulary keeps this a small-array computation over the
segment term directories; no posting decode needed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from ..functions.grams import GRAM_3_BASE, gram_to_str
from ..state import manifest as mf

# fts-lmdb.go:330 percentage thresholds
COVERAGE_THRESHOLDS = [0.01, 0.1, 0.5, 1, 2, 3, 4, 5, 10, 15, 25, 50, 75, 99, 100]


_BLOB_COLS = [
    "doc_blob", "chunk_blob", "tf_blob", "dl_blob",
    "bmax_tf_blob", "bmin_dl_blob", "bfirst_doc_blob",
]


def term_histogram(index_dir: str, with_bytes: bool = False):
    """Global per-term posting counts (length GRAM_3_BASE); with
    with_bytes also the per-term encoded posting byte sizes
    (displayGrams parity, fts-lmdb.go:319-381 reports sizes alongside
    counts)."""
    import pyarrow.compute as pc

    manifest = mf.load_manifest(index_dir)
    merged = manifest.get("merged")
    if merged:
        paths = [os.path.join(index_dir, s["segment"]["terms"]) for s in merged["shards"]]
    else:
        paths = [os.path.join(index_dir, p["segment"]["terms"]) for p in manifest["partitions"]]
    counts = np.zeros(GRAM_3_BASE, dtype=np.int64)
    sizes = np.zeros(GRAM_3_BASE, dtype=np.int64) if with_bytes else None
    cols = ["term", "n"] + (_BLOB_COLS if with_bytes else [])
    for p in paths:
        t = pq.read_table(p, columns=cols)
        terms = t["term"].to_numpy()
        np.add.at(counts, terms, t["n"].to_numpy())
        if with_bytes:
            row_bytes = np.zeros(t.num_rows, dtype=np.int64)
            for c in _BLOB_COLS:
                row_bytes += pc.binary_length(t[c]).to_numpy(zero_copy_only=False)
            np.add.at(sizes, terms, row_bytes)
    if with_bytes:
        return counts, sizes
    return counts


def index_info(index_dir: str, grams: bool = False, groups: bool = False) -> dict:
    """info [-grams] [-groups] equivalent."""
    manifest = mf.load_manifest(index_dir)
    g = manifest["global"]
    out = {
        "n_docs": g["n_docs"],
        "n_chunks": g["n_chunks"],
        "n_postings": g["n_postings"],
        "sum_dl": g["sum_dl"],
        "avgdl": g["avgdl"],
        "n_partitions": len(manifest["partitions"]),
        "n_tombstones": len(manifest.get("tombstones", [])),
        "merged_shards": manifest.get("merged", {}).get("n_shards", 0),
        "chunker": manifest.get("chunker", "lines"),
    }
    if grams:
        counts, sizes = term_histogram(index_dir, with_bytes=True)
        used = counts[counts > 0]
        used_sizes = sizes[counts > 0]
        n_chunks = max(g["n_chunks"], 1)
        cdf = {}
        for pct in COVERAGE_THRESHOLDS:
            limit = n_chunks * pct / 100.0
            cdf[str(pct)] = round(float((used <= limit).mean()), 4) if used.size else 0.0
        top_idx = np.argsort(-counts)[:10]
        out["grams"] = {
            "distinct_terms": int(used.size),
            "vocabulary_bound": GRAM_3_BASE,
            "min_postings": int(used.min()) if used.size else 0,
            "max_postings": int(used.max()) if used.size else 0,
            "total_bytes": int(sizes.sum()),
            "min_bytes": int(used_sizes.min()) if used.size else 0,
            "max_bytes": int(used_sizes.max()) if used.size else 0,
            "coverage_cdf": cdf,
            "hottest": [
                {"gram": gram_to_str(int(i)), "n": int(counts[i]),
                 "bytes": int(sizes[i])}
                for i in top_idx
                if counts[i] > 0
            ],
        }
    if groups:
        rows = []
        tombs = set(manifest.get("tombstones", []))
        # iterate docs_sources, not partitions: compact-promoted
        # partitions carry no "docs" key (docs move to docs_files)
        for rel, _si in mf.docs_sources(manifest):
            t = pq.read_table(
                os.path.join(index_dir, rel),
                columns=["doc_id", "repo", "path", "commit", "n_chunks"],
            )
            for r in t.to_pylist():
                rows.append(
                    {
                        "group": f"{r['repo']}/{r['path']}@{r['commit']}",
                        "n_chunks": r["n_chunks"],
                        "deleted": int(r["doc_id"]) in tombs,
                    }
                )
        rows.sort(key=lambda r: r["group"])
        out["groups"] = rows
    return out
