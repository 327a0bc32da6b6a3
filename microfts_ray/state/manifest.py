"""Atomic index manifest: per-partition checkpoints + lineage.

Replaces the reference's single LMDB write transaction
(/root/reference/fts-lmdb.go:1679-1689) with the distributed
equivalent: every build partition writes its segment files to a temp
path, renames them into place, then atomically records a checkpoint
JSON under ``_manifest/``. A build "commits" by writing
``manifest.json`` listing every partition with its lineage (input
file, row-group range, row count, content hashes digest) and the
global BM25 stats. Resume = skip partitions whose checkpoint exists
(north_rule: "resumable from checkpoint with per-partition lineage").

Readers only trust ``manifest.json``; orphaned segment files from a
crashed partial run are invisible garbage, never wrong answers.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

GENERATION_FILE = "manifest.json"
PART_DIR = "_manifest"


def _atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def part_ckpt_path(index_dir: str, pid: str) -> str:
    return os.path.join(index_dir, PART_DIR, f"part-{pid}.json")


def write_part_checkpoint(index_dir: str, pid: str, entry: dict) -> None:
    _atomic_write_json(part_ckpt_path(index_dir, pid), entry)


def read_part_checkpoint(index_dir: str, pid: str) -> dict | None:
    p = part_ckpt_path(index_dir, pid)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def commit_manifest(index_dir: str, manifest: dict) -> None:
    _atomic_write_json(os.path.join(index_dir, GENERATION_FILE), manifest)


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, GENERATION_FILE)) as f:
        return json.load(f)


def manifest_exists(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, GENERATION_FILE))


def docs_sources(manifest: dict) -> list[tuple[str, int]]:
    """Unique (docs relpath, partition index) pairs across the build
    partitions plus any manifest-level docs files (shuffle mode,
    which has no per-partition docs pairing; those get index -1)."""
    seen: dict[str, int] = {}
    for i, p in enumerate(manifest.get("partitions", [])):
        rel = p.get("segment", {}).get("docs")
        if rel and rel not in seen:
            seen[rel] = i
    for rel in manifest.get("docs_files", []):
        if rel not in seen:
            seen[rel] = -1
    return list(seen.items())
