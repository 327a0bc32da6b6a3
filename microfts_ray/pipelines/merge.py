"""Hierarchical segment merge: the distributed analog of `compact`.

The reference's compact (/root/reference/fts-lmdb.go:919-985) rewrites
every posting list in one transaction. Here, build partitions produce
doc-disjoint posting runs (build.py); this stage k-way merges them
into M term-range shards so a query touches ONE file per term instead
of one per build partition — Lucene/LSM-style segment consolidation,
run as a stateful actor-pool `map_batches` (SURVEY.md §2.8 D3, §7.1
step 5).

Skew handling (the north_star's hot-term concern): shard boundaries
are NOT equal term ranges — the gram distribution is extremely skewed
(`DEF`/`IMP`-class grams carry orders of magnitude more postings).
merge_index first aggregates per-term posting counts from the segment
directories (a 50,653-long array — the bounded vocabulary makes this
trivial) and cuts boundaries at equal POSTING MASS, so merge tasks
are balanced. A single ultra-hot term still lives in one shard
(per-term atomicity); splitting a term across doc-ranges is the
next escalation and slots into the same layout (runs are doc-sorted).

Layout: merged/shard=K/terms.parquet over contiguous term range
[bounds[K], bounds[K+1]); routing = searchsorted(bounds, term).
Tombstoned docs are dropped during merge (compact semantics). Each
shard merge is atomic + checkpointed, so a crashed merge resumes
per-shard. At 10^12-file scale, levels of fan-in F merges repeat
(log_F(#partitions) levels) with the same code per level.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.grams import GRAM_3_BASE
from ..state import manifest as mf
from .build import TERMS_SCHEMA, _pkg_root, encode_partition_runs


def merge_shard(
    index_dir: str,
    shard: int,
    n_shards: int,
    lo: int,
    hi: int,
    terms_paths: list[str],
    deleted_docs: np.ndarray | None = None,
) -> dict:
    """Merge one term-range shard [lo, hi) from all build segments;
    atomic + idempotent.

    Reads only row groups intersecting the term range (terms sorted
    within each segment -> parquet stats prune), bulk-decodes with one
    vectorized pass per file (decode_terms_table), drops tombstones,
    re-sorts and re-encodes with the build's vectorized encoder.
    """
    pid = f"merged-{shard:04d}-of-{n_shards:04d}"
    existing = mf.read_part_checkpoint(index_dir, pid)
    if existing is not None:
        return existing
    cols = ["term", "doc_id", "chunk_id", "tf", "dl"]
    parts: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    from ..functions.postings import decode_terms_table

    for path in terms_paths:
        f = pq.ParquetFile(path)
        rgs = []
        for i in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(i).column(0).statistics
            if st is None or (st.min < hi and st.max >= lo):
                rgs.append(i)
        if not rgs:
            continue
        tbl = f.read_row_groups(rgs)
        terms = tbl["term"].to_numpy()
        keep = (terms >= lo) & (terms < hi)
        if not keep.any():
            continue
        dec = decode_terms_table(tbl.filter(keep))  # bulk vectorized decode
        for c in cols:
            parts[c].append(dec[c])
    out_dir = os.path.join(index_dir, "merged", f"shard={shard:04d}")
    os.makedirs(out_dir, exist_ok=True)
    if parts["term"]:
        entries = {c: np.concatenate(parts[c]) for c in cols}
        if deleted_docs is not None and deleted_docs.size:
            keep = ~np.isin(entries["doc_id"], deleted_docs)
            entries = {c: v[keep] for c, v in entries.items()}
        order = np.lexsort((entries["chunk_id"], entries["doc_id"], entries["term"]))
        entries = {c: v[order] for c, v in entries.items()}
        tbl = encode_partition_runs(entries)
    else:
        tbl = TERMS_SCHEMA.empty_table()
    tmp = os.path.join(out_dir, f".terms.{uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(tbl, tmp, row_group_size=512, compression="zstd")
    os.replace(tmp, os.path.join(out_dir, "terms.parquet"))
    entry = {
        "pid": pid,
        "shard": shard,
        "n_shards": n_shards,
        "lo": lo,
        "hi": hi,
        "segment": {"terms": f"merged/shard={shard:04d}/terms.parquet"},
        "stats": {"n_terms": int(tbl.num_rows),
                  "n_postings": int(pa.compute.sum(tbl["n"]).as_py() or 0)},
        "lineage": {"inputs": [os.path.relpath(p, index_dir) for p in terms_paths]},
    }
    mf.write_part_checkpoint(index_dir, pid, entry)
    return entry


def _balanced_bounds(terms_paths: list[str], n_shards: int) -> list[int]:
    """Term-range boundaries with ~equal posting mass per shard.
    Exploits the bounded 50,653-term vocabulary: the full per-term
    count histogram fits in one small array."""
    counts = np.zeros(GRAM_3_BASE, dtype=np.int64)
    for path in terms_paths:
        t = pq.read_table(path, columns=["term", "n"])
        np.add.at(counts, t["term"].to_numpy(), t["n"].to_numpy())
    cum = np.cumsum(counts, dtype=np.int64)
    total = int(cum[-1])
    cuts = [
        int(np.searchsorted(cum, total * (i + 1) // n_shards, side="left")) + 1
        for i in range(n_shards - 1)
    ]
    bounds = [0]
    for c in cuts:
        bounds.append(max(bounds[-1], min(c, GRAM_3_BASE)))
    bounds.append(GRAM_3_BASE)
    return bounds


def merge_index(
    index_dir: str,
    n_shards: int = 8,
    concurrency: int | None = None,
    deleted_docs: np.ndarray | None = None,
) -> dict:
    """Merge all build segments into n_shards mass-balanced term-range
    shards; records bounds in the manifest (idempotent, per-shard
    resumable). deleted_docs (tombstoned doc_ids) are dropped from
    every posting run — compact semantics."""
    manifest = mf.load_manifest(index_dir)
    terms_paths = [
        os.path.join(index_dir, p["segment"]["terms"]) for p in manifest["partitions"]
    ]
    bounds = _balanced_bounds(terms_paths, n_shards)
    ds = ray.data.from_items(
        [{"shard": s, "lo": bounds[s], "hi": bounds[s + 1]} for s in range(n_shards)],
        override_num_blocks=n_shards,
    )
    pkg_root = _pkg_root()
    dead = deleted_docs if deleted_docs is not None and len(deleted_docs) else None

    def run_shard(batch: dict) -> dict:
        # self-bootstrapping (see build.run_part): workers need the
        # package importable regardless of driver cwd
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from microfts_ray.pipelines.merge import merge_shard as ms

        out = []
        for shard, lo, hi in zip(batch["shard"], batch["lo"], batch["hi"]):
            e = ms(
                index_dir, int(shard), n_shards, int(lo), int(hi), terms_paths,
                deleted_docs=dead,
            )
            out.append(e["stats"]["n_postings"])
        import numpy as _np

        return {"shard": batch["shard"], "n_postings": _np.array(out, dtype=_np.int64)}

    kwargs = {"concurrency": concurrency} if concurrency else {}
    ds.map_batches(run_shard, batch_size=1, num_cpus=1, **kwargs).materialize()
    shards = []
    for s in range(n_shards):
        e = mf.read_part_checkpoint(index_dir, f"merged-{s:04d}-of-{n_shards:04d}")
        if e is None:
            raise RuntimeError(f"merged shard {s} missing checkpoint")
        shards.append(e)
    manifest["merged"] = {
        "n_shards": n_shards,
        "bounds": bounds,
        "shards": [
            {k: e[k] for k in ("pid", "shard", "lo", "hi", "segment", "stats")}
            for e in shards
        ],
    }
    mf.commit_manifest(index_dir, manifest)
    return manifest
