"""Alternative index build: global salted groupby(term) shuffle.

The north_star's literal pipeline shape: tokenize via map_batches over
zero-copy Arrow, then `groupby` on a SALTED term key so hot terms
('def'/'import'-class grams) split across reducers, then per-group
posting-run encode. Compare pipelines/build.py (segment mode, the
default): segment mode does a map-side combine with NO network
shuffle and bounded task state; shuffle mode moves every (term, doc,
chunk, tf, dl) posting through the object store but lands each
term's postings fully co-located, so no query-time multi-segment
fan-in is needed even before a merge.

Salting: a pre-pass on a corpus sample estimates per-term frequency
(the A5 histogram, SURVEY.md §2.5 — the 50,653-term vocabulary makes
the sketch a single small array); terms whose estimated postings
exceed `max_run` get S(term) = ceil(est / max_run) salt buckets,
keyed by hash(doc_id) % S so each bucket stays doc-disjoint and
BM25's df still sums across buckets. Merge-stage consolidation
(pipelines/merge.py) works unchanged on the salted output because
decode_terms_table + lexsort re-merges duplicate term rows.

Docs sidecars are written by the tokenize stage itself with
content-derived deterministic filenames, so task retries are
idempotent (same name, same bytes, atomic rename).
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.grams import GRAM_3_BASE
from ..state import manifest as mf
from .build import _pkg_root, TERMS_SCHEMA


def estimate_term_freq(
    corpus_paths: list[str], sample_rows: int = 2000, chunker: str = "lines"
) -> np.ndarray:
    """Per-term posting-count estimate from a head sample, scaled to
    the full corpus size (the hot-term sketch for salting)."""
    from ..stages.tokenize import tokenize_corpus_batch

    total_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in corpus_paths)
    counts = np.zeros(GRAM_3_BASE, dtype=np.float64)
    seen = 0
    for p in sorted(corpus_paths):
        if seen >= sample_rows:
            break
        f = pq.ParquetFile(p)
        take = min(sample_rows - seen, f.metadata.num_rows)
        tbl = f.read_row_groups(
            list(range(f.metadata.num_row_groups)),
            columns=["repo", "path", "commit", "lang", "content"],
        ).slice(0, take)
        entries, _docs = tokenize_corpus_batch(tbl, chunker=chunker)
        np.add.at(counts, entries["term"].astype(np.int64), 1)
        seen += take
    if seen == 0:
        return counts
    return counts * (total_rows / seen)


def build_index_shuffle(
    corpus_paths: list[str],
    index_dir: str,
    *,
    chunker: str = "lines",
    max_run: int = 500_000,
    sample_rows: int = 2000,
) -> dict:
    """Full shuffle build: read -> tokenize (map_batches) ->
    groupby(term, salt) -> encode runs -> segment parquet + manifest."""
    os.makedirs(index_dir, exist_ok=True)
    est = estimate_term_freq(corpus_paths, sample_rows, chunker)
    n_salts = np.maximum(1, np.ceil(est / max_run)).astype(np.int64)
    salts_ref = ray.put(n_salts)
    pkg_root = _pkg_root()
    docs_dir = os.path.join(index_dir, "segments", "shuffle-docs")
    os.makedirs(docs_dir, exist_ok=True)

    def tokenize_batch(batch: pa.Table) -> pa.Table:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import hashlib as _hashlib

        import numpy as _np
        import pyarrow as _pa
        import pyarrow.parquet as _pq
        import ray as _ray

        from microfts_ray.stages.tokenize import tokenize_corpus_batch as tok

        entries, docs = tok(batch, chunker=chunker)
        ns = _ray.get(salts_ref)
        salt = (
            entries["doc_id"].astype(_np.uint64)
            % ns[entries["term"].astype(_np.int64)].astype(_np.uint64)
        ).astype(_np.int64)
        # idempotent docs sidecar: name derived from the doc_id set
        if docs.num_rows:
            tag = _hashlib.blake2b(
                docs["doc_id"].to_numpy().tobytes(), digest_size=8
            ).hexdigest()
            path = os.path.join(docs_dir, f"docs-{tag}.parquet")
            if not os.path.exists(path):
                tmp = path + f".{os.getpid()}.tmp"
                docs2 = docs.append_column(
                    "src_rg", _pa.array([-1] * docs.num_rows, _pa.int32())
                )
                docs2 = docs2.append_column(
                    "sub", _pa.array([0] * docs.num_rows, _pa.int32())
                )
                docs2 = docs2.append_column(
                    "src_path", _pa.array([""] * docs.num_rows, _pa.string())
                )
                _pq.write_table(docs2, tmp, row_group_size=512, compression="zstd")
                os.replace(tmp, path)
        return _pa.table(
            {
                "term": _pa.array(entries["term"].astype(_np.int32), _pa.int32()),
                "salt": _pa.array(salt, _pa.int64()),
                "doc_id": _pa.array(entries["doc_id"], _pa.uint64()),
                "chunk_id": _pa.array(entries["chunk_id"], _pa.uint64()),
                "tf": _pa.array(entries["tf"], _pa.uint64()),
                "dl": _pa.array(entries["dl"], _pa.uint64()),
            }
        )

    def encode_group(group: pa.Table) -> pa.Table:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import numpy as _np

        from microfts_ray.pipelines.build import encode_partition_runs as enc

        entries = {
            "term": group["term"].to_numpy().astype(_np.uint16),
            "doc_id": group["doc_id"].to_numpy().astype(_np.uint64),
            "chunk_id": group["chunk_id"].to_numpy().astype(_np.uint64),
            "tf": group["tf"].to_numpy().astype(_np.uint64),
            "dl": group["dl"].to_numpy().astype(_np.uint64),
        }
        order = _np.lexsort(
            (entries["chunk_id"], entries["doc_id"], entries["term"])
        )
        entries = {k: v[order] for k, v in entries.items()}
        return enc(entries)

    ds = ray.data.read_parquet(
        sorted(corpus_paths),
        columns=["repo", "path", "commit", "lang", "content"],
    )
    runs = (
        ds.map_batches(tokenize_batch, batch_format="pyarrow")
        .groupby(["term", "salt"])
        .map_groups(encode_group, batch_format="pyarrow")
    )
    out_dir = os.path.join(index_dir, "segments", f"shuffle-{uuid.uuid4().hex[:8]}")
    runs.write_parquet(out_dir, compression="zstd")

    # assemble manifest: terms files from the shuffle output, docs
    # sidecars from the tokenize side-writes
    parts = []
    doc_files = sorted(glob.glob(os.path.join(docs_dir, "docs-*.parquet")))
    agg = {"n_docs": 0, "n_chunks": 0, "sum_dl": 0, "n_terms": 0, "n_postings": 0}
    for i, p in enumerate(doc_files):
        t = pq.read_table(p, columns=["doc_id", "n_chunks", "sum_dl"])
        agg["n_docs"] += t.num_rows
        agg["n_chunks"] += int(pa.compute.sum(t["n_chunks"]).as_py() or 0)
        agg["sum_dl"] += int(pa.compute.sum(t["sum_dl"]).as_py() or 0)
    term_files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    for i, p in enumerate(term_files):
        t = pq.read_table(p, columns=["n"])
        n_terms = int(t.num_rows)
        n_postings = int(pa.compute.sum(t["n"]).as_py() or 0)
        agg["n_terms"] += n_terms
        agg["n_postings"] += n_postings
        parts.append(
            {
                "pid": f"shuffle-{i:05d}",
                "lineage": {"input_path": "", "rg_start": 0, "rg_end": 0,
                            "num_rows": 0, "shuffle": True},
                "segment": {"terms": os.path.relpath(p, index_dir)},
                "stats": {"n_docs": 0, "n_chunks": 0, "sum_dl": 0,
                          "n_terms": n_terms, "n_postings": n_postings},
            }
        )
    manifest = {
        "version": 1,
        "dl_layout": "sidecar",
        "chunker": chunker,
        "mode": "shuffle",
        "partitions": parts,
        "docs_files": [os.path.relpath(p, index_dir) for p in doc_files],
        "global": {
            **agg,
            "avgdl": (agg["sum_dl"] / agg["n_chunks"]) if agg["n_chunks"] else 0.0,
        },
        "inputs": sorted(corpus_paths),
        "salting": {"max_run": max_run,
                    "n_salted_terms": int((n_salts > 1).sum())},
    }
    mf.commit_manifest(index_dir, manifest)
    return manifest
