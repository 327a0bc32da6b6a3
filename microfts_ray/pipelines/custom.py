"""Bring-your-own-tokenizer surface: the reference `chunk` command.

cmdChunk (/root/reference/fts-lmdb.go:476-507, README.org:214-215)
lets a caller add a chunk with explicit grams (unicode trigrams, hex,
or decimal) and arbitrary payload to any group. Here that becomes a
tiny single-chunk build partition: an encoded posting-run segment +
docs sidecar row, checkpointed and appended to the manifest like any
other partition. Such chunks have no recoverable source text, so they
surface through `candidates` and BM25 (no text verification) but are
dropped by verified `search` — the same behavior the reference shows
when a custom group's file does not exist on disk.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa

from ..sources.corpus import corpus_sha256
from ..state import manifest as mf
from ..stages.tokenize import doc_id_for
from .build import encode_partition_runs


def add_chunk(
    index_dir: str,
    repo: str,
    path: str,
    commit: str,
    grams: list[int],
    *,
    chunk_id: int = 0,
    data: bytes = b"",
) -> dict:
    """Add one custom-gram chunk to group (repo, path, commit)."""
    import pyarrow.parquet as pq

    if not grams:
        raise ValueError("custom chunk needs at least one gram")
    manifest = mf.load_manifest(index_dir)
    doc_id = doc_id_for(repo, path, commit)
    terms, tfs = np.unique(np.array(sorted(grams), dtype=np.uint16), return_counts=True)
    n = terms.size
    dl = int(sum(tfs))
    entries = {
        "term": terms,
        "doc_id": np.full(n, doc_id, dtype=np.uint64),
        "chunk_id": np.full(n, chunk_id, dtype=np.uint64),
        "tf": tfs.astype(np.uint64),
        "dl": np.full(n, dl, dtype=np.uint64),
    }
    # match the INDEX's posting layout (see pipelines/update.py): in
    # the sidecar-dl layout the chunk's dl goes into the docs sidecar
    terms_tbl = encode_partition_runs(
        entries, store_dl=manifest.get("dl_layout") != "sidecar"
    )
    chunk_dl = np.zeros(chunk_id + 1, dtype=np.uint32)
    chunk_dl[chunk_id] = dl
    docs = pa.table(
        {
            "doc_id": pa.array([doc_id], pa.uint64()),
            "repo": pa.array([repo]),
            "path": pa.array([path]),
            "commit": pa.array([commit]),
            "lang": pa.array(["custom"]),
            "n_chunks": pa.array([1], pa.int64()),
            "chunk_span": pa.array([chunk_id + 1], pa.int64()),
            "sum_dl": pa.array([dl], pa.int64()),
            "chunk_dl": pa.array([chunk_dl.tolist()], pa.list_(pa.uint32())),
            "content_sha256": pa.array([corpus_sha256(data.decode("utf-8", "replace"))]),
            "src_rg": pa.array([-1], pa.int32()),
            "src_row": pa.array([-1], pa.int32()),
            "sub": pa.array([0], pa.int32()),
            "src_path": pa.array([""], pa.string()),
        }
    )
    pid = f"custom-{uuid.uuid4().hex[:12]}"
    seg_dir = os.path.join(index_dir, "segments", pid)
    os.makedirs(seg_dir, exist_ok=True)
    for name, tbl in (("terms", terms_tbl), ("docs", docs)):
        tmp = os.path.join(seg_dir, f".{name}.tmp")
        pq.write_table(tbl, tmp, row_group_size=512, compression="zstd")
        os.replace(tmp, os.path.join(seg_dir, f"{name}.parquet"))
    entry = {
        "pid": pid,
        "lineage": {"input_path": "", "rg_start": 0, "rg_end": 0, "num_rows": 0,
                    "custom": True},
        "segment": {"terms": f"segments/{pid}/terms.parquet",
                    "docs": f"segments/{pid}/docs.parquet"},
        "stats": {"n_docs": 1, "n_chunks": 1, "sum_dl": dl, "n_terms": int(n),
                  "n_postings": int(n)},
    }
    mf.write_part_checkpoint(index_dir, pid, entry)
    manifest["partitions"].append(entry)
    # doc stats from the SIDECARS, not partition stats — compacted
    # partitions carry zeroed doc stats (same rule as apply_update)
    agg = {
        k: int(sum(p["stats"][k] for p in manifest["partitions"]))
        for k in ("n_terms", "n_postings")
    }
    for k in ("n_docs", "n_chunks", "sum_dl"):
        agg[k] = 0
    # multi-chunk custom groups write one DELTA row per add_chunk:
    # n_chunks/sum_dl sum correctly across rows, but n_docs must count
    # DISTINCT doc_ids (readers coalesce the duplicate rows)
    all_ids = []
    for rel, _si in mf.docs_sources(manifest):
        t = pq.read_table(
            os.path.join(index_dir, rel), columns=["doc_id", "n_chunks", "sum_dl"]
        )
        all_ids.append(t["doc_id"].to_numpy())
        agg["n_chunks"] += int(pa.compute.sum(t["n_chunks"]).as_py() or 0)
        agg["sum_dl"] += int(pa.compute.sum(t["sum_dl"]).as_py() or 0)
    if all_ids:
        agg["n_docs"] = int(np.unique(np.concatenate(all_ids)).size)
    manifest["global"] = {
        **agg, "avgdl": (agg["sum_dl"] / agg["n_chunks"]) if agg["n_chunks"] else 0.0
    }
    manifest.pop("merged", None)
    mf.commit_manifest(index_dir, manifest)
    return entry


def create_empty_groups(index_dir: str, groups: list[tuple[str, str, str]]) -> dict:
    """cmdEmpty (fts-lmdb.go:1028-1044): pre-register groups, ignoring
    existing ones. Recorded in the manifest only (no postings)."""
    manifest = mf.load_manifest(index_dir)
    existing = set(tuple(g) for g in manifest.get("empty_groups", []))
    for g in groups:
        existing.add(tuple(g))
    manifest["empty_groups"] = sorted(existing)
    mf.commit_manifest(index_dir, manifest)
    return manifest
