"""Incremental maintenance: snapshot diff, delta build, tombstones,
compact.

Distributed re-expression of the reference's maintenance verbs
(SURVEY.md §3.3):
  * cmdUpdate (/root/reference/fts-lmdb.go:987-1026): scan for
    changed/missing files -> here a snapshot diff on (repo, path,
    commit) + content sha256 between the index's docs manifest and a
    new corpus snapshot; changed/new rows are built into DELTA
    partitions (same build path, new generation tag); missing keys
    become tombstones. `dry_run` prints the plan (the reference's -t).
  * cmdDelete / tombstones (fts-lmdb.go:893-903, 1628-1638): a
    deletion writes only a tombstone entry; postings stay until
    compaction. Queries anti-join the tombstone set (X4 semantics,
    fts-lmdb.go:1151-1162).
  * cmdCompact (fts-lmdb.go:919-985): rewrite dropping dead docs.
    Here: re-merge shards with deleted_docs filtered, rewrite docs
    sidecars, recompute global stats, clear tombstones. After
    compact, query results are identical to a fresh build of the
    live corpus (tested).

BM25 caveat (documented, Lucene-like): between update and compact,
tombstoned docs still count in df/avgdl; compact restores exact
fresh-build statistics.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.tokenize import doc_ids_column
from ..sources.corpus import corpus_sha256
from ..state import manifest as mf
from .build import build_partition, plan_partitions


def _index_doc_shas(index_dir: str, manifest: dict) -> dict[int, str]:
    """doc_id -> content sha from all live docs sidecars."""
    out: dict[int, str] = {}
    for rel, _si in mf.docs_sources(manifest):
        t = pq.read_table(
            os.path.join(index_dir, rel),
            columns=["doc_id", "content_sha256"],
        )
        for d, s in zip(t["doc_id"].to_numpy(), t["content_sha256"].to_pylist()):
            out[int(d)] = s
    tombs = set(manifest.get("tombstones", []))
    return {d: s for d, s in out.items() if d not in tombs}


def snapshot_diff(index_dir: str, corpus_paths: list[str]) -> dict:
    """Classify snapshot rows vs the index: new/changed doc ids and
    deleted doc_ids (keys in the index missing from the snapshot).

    Distributed: snapshot hashing (blake2b ids + content sha256) runs
    as a Ray Data map over the corpus; only (doc_id, sha) pairs come
    back to the driver for the comparison. At sandbox scale the
    indexed-sha map is driver-resident; beyond ~10^9 docs the compare
    itself becomes a hash join of the two (doc_id, sha) tables."""
    import ray
    import ray.data

    from .build import _pkg_root

    manifest = mf.load_manifest(index_dir)
    indexed = _index_doc_shas(index_dir, manifest)
    pkg_root = _pkg_root()

    def hash_batch(batch):
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import pyarrow as _pa

        from microfts_ray.sources.corpus import corpus_sha256 as sha
        from microfts_ray.stages.tokenize import doc_ids_column as dic

        ids = dic(batch["repo"], batch["path"], batch["commit"])
        shas = [sha(c) for c in batch["content"].to_pylist()]
        return _pa.table(
            {"doc_id": _pa.array(ids, _pa.uint64()), "sha": _pa.array(shas)}
        )

    snap = (
        ray.data.read_parquet(
            sorted(corpus_paths), columns=["repo", "path", "commit", "content"]
        )
        .map_batches(hash_batch, batch_format="pyarrow")
        .take_all()
    )
    seen: set[int] = set()
    new_or_changed: list[int] = []  # doc ids needing (re)index
    for row in snap:
        d = int(row["doc_id"])
        seen.add(d)
        if indexed.get(d) != row["sha"]:
            new_or_changed.append(d)
    deleted = sorted(set(indexed) - seen)
    return {"new_or_changed": sorted(new_or_changed), "deleted": deleted}


def apply_update(
    index_dir: str, corpus_paths: list[str], *, dry_run: bool = False,
    chunker: str | None = None, target_rows_per_part: int = 4000,
    delete_missing: bool = True,
) -> dict:
    """Snapshot-diff update: build delta partitions for new/changed
    rows, tombstone deleted doc keys; returns the updated manifest
    (or the plan if dry_run).

    delete_missing=False gives `input` semantics (cmdInput,
    fts-lmdb.go:509-523): add/reindex the given rows only, never
    tombstone absent keys. True is `update` semantics (cmdUpdate).
    Superseded versions of CHANGED rows are tombstoned either way
    (openInputFile tombstones the old group, fts-lmdb.go:539).
    """
    manifest = mf.load_manifest(index_dir)
    diff = snapshot_diff(index_dir, corpus_paths)
    changed_ids = np.array(sorted(diff["new_or_changed"]), dtype=np.uint64)
    if not delete_missing:
        # keep only old versions of re-supplied (repo, path) keys
        changed_keys = set()
        for path in sorted(corpus_paths):
            t = pq.read_table(path, columns=["repo", "path", "commit"])
            ids = doc_ids_column(t["repo"], t["path"], t["commit"])
            for i in np.nonzero(np.isin(ids, changed_ids))[0]:
                changed_keys.add((t["repo"][int(i)].as_py(), t["path"][int(i)].as_py()))
        indexed_keys: dict[int, tuple[str, str]] = {}
        for rel, _si in mf.docs_sources(manifest):
            t = pq.read_table(
                os.path.join(index_dir, rel),
                columns=["doc_id", "repo", "path"],
            )
            for d, r_, pth in zip(
                t["doc_id"].to_numpy(), t["repo"].to_pylist(), t["path"].to_pylist()
            ):
                indexed_keys[int(d)] = (r_, pth)
        diff["deleted"] = [
            d for d in diff["deleted"] if indexed_keys.get(d) in changed_keys
        ]
    if dry_run:
        return {
            "dry_run": True,
            "n_new_or_changed": len(diff["new_or_changed"]),
            "deleted": diff["deleted"],
        }
    chunker = chunker or manifest.get("chunker", "lines")
    gen = str(uuid.uuid4().hex[:8])
    delta_paths: list[str] = []
    if diff["new_or_changed"]:
        # materialize changed rows into delta corpus files (one per
        # source file), then run the ordinary partition build on them
        delta_dir = os.path.join(index_dir, "delta", f"gen-{gen}")
        os.makedirs(delta_dir, exist_ok=True)
        j = 0
        for path in sorted(corpus_paths):
            keys = pq.read_table(path, columns=["repo", "path", "commit"])
            ids = doc_ids_column(keys["repo"], keys["path"], keys["commit"])
            rows = np.nonzero(np.isin(ids, changed_ids))[0]
            if rows.size == 0:
                continue
            t = pq.read_table(path).take(pa.array(rows))
            out = os.path.join(delta_dir, f"delta-{j:05d}.parquet")
            pq.write_table(t, out, row_group_size=max(1, target_rows_per_part // 4))
            delta_paths.append(out)
            j += 1
        for part in plan_partitions(delta_paths, target_rows_per_part):
            part["pid"] = f"g{gen}-{part['pid']}"
            entry = build_partition(part, index_dir, chunker)
            manifest["partitions"].append(
                {k: entry[k] for k in ("pid", "lineage", "segment", "stats")}
            )
    # tombstones: deleted keys + superseded versions of changed docs
    # (a changed file has a new commit => its old doc_id is in
    # `deleted` already, since the old key left the snapshot)
    tombs = sorted(set(manifest.get("tombstones", [])) | set(diff["deleted"]))
    manifest["tombstones"] = tombs
    # recompute global stats (tombstones still included until compact —
    # documented drift). Doc-level stats come from the docs SIDECARS,
    # not partition stats: compact promotes merged shards whose
    # partition entries carry n_docs/n_chunks/sum_dl=0 (the docs live
    # at manifest['docs_files']), so summing partition stats after a
    # compact would corrupt N/avgdl and flip BM25 idf signs.
    agg = {
        k: int(sum(p["stats"][k] for p in manifest["partitions"]))
        for k in ("n_terms", "n_postings")
    }
    for k in ("n_docs", "n_chunks", "sum_dl"):
        agg[k] = 0
    for rel, _si in mf.docs_sources(manifest):
        t = pq.read_table(
            os.path.join(index_dir, rel), columns=["n_chunks", "sum_dl"]
        )
        agg["n_docs"] += int(t.num_rows)
        agg["n_chunks"] += int(pa.compute.sum(t["n_chunks"]).as_py() or 0)
        agg["sum_dl"] += int(pa.compute.sum(t["sum_dl"]).as_py() or 0)
    manifest["global"] = {
        **agg,
        "avgdl": (agg["sum_dl"] / agg["n_chunks"]) if agg["n_chunks"] else 0.0,
    }
    manifest.pop("merged", None)  # stale after a delta; re-merge or query unmerged
    mf.commit_manifest(index_dir, manifest)
    return manifest


def delete_doc(index_dir: str, repo: str, path: str, commit: str) -> dict:
    """Tombstone one doc (reference cmdDelete semantics: no space is
    reclaimed until compact)."""
    from ..stages.tokenize import doc_id_for

    manifest = mf.load_manifest(index_dir)
    tombs = set(manifest.get("tombstones", []))
    tombs.add(doc_id_for(repo, path, commit))
    manifest["tombstones"] = sorted(tombs)
    mf.commit_manifest(index_dir, manifest)
    return manifest


def delete_group_by_name(index_dir: str, group: str) -> dict:
    """Reference deleteGroupByName (fts-lmdb.go:1628-1638): resolve
    the display name 'repo/path@commit' against the INDEX (repo may
    itself contain '/', so the name alone is ambiguous) and tombstone
    the matching doc. Raises KeyError if no group matches."""
    manifest = mf.load_manifest(index_dir)
    for rel, _si in mf.docs_sources(manifest):
        t = pq.read_table(
            os.path.join(index_dir, rel),
            columns=["doc_id", "repo", "path", "commit"],
        )
        for d, r_, p_, c_ in zip(
            t["doc_id"].to_numpy(),
            t["repo"].to_pylist(),
            t["path"].to_pylist(),
            t["commit"].to_pylist(),
        ):
            if f"{r_}/{p_}@{c_}" == group:
                return delete_doc(index_dir, r_, p_, c_)
    raise KeyError(f"no group named {group!r} in the index")


def compact(index_dir: str, n_shards: int = 8, concurrency: int | None = None) -> dict:
    """Reclaim space (reference cmdCompact semantics): rewrite-merge
    all postings dropping tombstoned docs, PROMOTE the merged shards
    to be the index's partitions, rewrite docs sidecars without dead
    rows, recompute stats, clear tombstones. Result is
    query-identical to a fresh build.

    Ordering matters: the merge runs FIRST (while rank-encoded
    posting streams can still resolve against the ORIGINAL doc
    dictionaries); only then are sidecar rows dropped. After compact
    all postings carry raw doc ids, so sidecars are dictionary-free
    and future deltas/compacts stay consistent.
    """
    import shutil

    manifest = mf.load_manifest(index_dir)
    tombs = np.array(sorted(manifest.get("tombstones", [])), dtype=np.uint64)

    # 1. rewrite-merge with original dictionaries, tombstones dropped
    from .merge import merge_index

    man_dir = os.path.join(index_dir, mf.PART_DIR)
    for f in os.listdir(man_dir):
        if f.startswith(("part-merged-", "part-mergelvl1-")):
            os.unlink(os.path.join(man_dir, f))
    shutil.rmtree(os.path.join(index_dir, "merged"), ignore_errors=True)
    manifest.pop("merged", None)
    mf.commit_manifest(index_dir, manifest)
    manifest = merge_index(
        index_dir, n_shards=n_shards, concurrency=concurrency,
        deleted_docs=tombs, mode="rewrite",
    )

    # 2. drop dead rows from docs sidecars; collect live stats
    agg = {"n_docs": 0, "n_chunks": 0, "sum_dl": 0}
    docs_files = []
    for rel, _si in mf.docs_sources(manifest):
        docs_path = os.path.join(index_dir, rel)
        t = pq.read_table(docs_path)
        if tombs.size:
            keep = ~np.isin(t["doc_id"].to_numpy(), tombs)
            if not keep.all():
                t = t.filter(pa.array(keep))
                tmp = docs_path + f".{uuid.uuid4().hex[:8]}.tmp"
                pq.write_table(t, tmp, row_group_size=512, compression="zstd")
                os.replace(tmp, docs_path)
        if t.num_rows == 0:
            continue
        docs_files.append(rel)
        agg["n_docs"] += int(t.num_rows)
        agg["n_chunks"] += int(pa.compute.sum(t["n_chunks"]).as_py() or 0)
        agg["sum_dl"] += int(pa.compute.sum(t["sum_dl"]).as_py() or 0)

    # 3. promote merged shards to the partitions (old segment terms
    # files become garbage); docs move to manifest level. The shard
    # files are MOVED out of merged/ into a generation-tagged
    # compacted dir first — a later compact rmtree's merged/ before
    # re-merging, which must never destroy live promoted partitions.
    old_terms = [
        os.path.join(index_dir, p["segment"]["terms"])
        for p in manifest["partitions"]
    ]
    gen = uuid.uuid4().hex[:8]
    keep_dir = f"compacted-{gen}"
    os.makedirs(os.path.join(index_dir, keep_dir), exist_ok=True)
    promoted = []
    for s in manifest["merged"]["shards"]:
        rel = s["segment"]["terms"]
        new_rel = os.path.join(keep_dir, f"{s['pid']}-terms.parquet")
        os.replace(os.path.join(index_dir, rel), os.path.join(index_dir, new_rel))
        promoted.append({**s, "segment": {"terms": new_rel}})
    n_terms = sum(s["stats"]["n_terms"] for s in promoted)
    n_postings = sum(s["stats"]["n_postings"] for s in promoted)
    manifest["partitions"] = [
        {
            "pid": s["pid"],
            "lineage": {"compacted": True},
            "segment": {"terms": s["segment"]["terms"]},
            "stats": {"n_docs": 0, "n_chunks": 0, "sum_dl": 0,
                      "n_terms": s["stats"]["n_terms"],
                      "n_postings": s["stats"]["n_postings"]},
        }
        for s in promoted
    ]
    # keep the merged view (shard bounds routing) pointing at the
    # relocated files so readers retain the term-range fast path
    manifest["merged"] = {**manifest["merged"], "shards": promoted}
    manifest["docs_files"] = docs_files
    manifest["global"] = {
        **agg,
        "n_terms": int(n_terms),
        "n_postings": int(n_postings),
        "avgdl": (agg["sum_dl"] / agg["n_chunks"]) if agg["n_chunks"] else 0.0,
    }
    manifest["tombstones"] = []
    mf.commit_manifest(index_dir, manifest)
    for p in old_terms:  # reclaim obsolete posting files
        if os.path.exists(p) and "merged" not in p:
            os.unlink(p)
    return manifest
