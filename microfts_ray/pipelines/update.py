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

from ..state import manifest as mf
from .build import build_partition, plan_partitions


_DIFF_SHARDS = 1024


def snapshot_diff(index_dir: str, corpus_paths: list[str]) -> dict:
    """Classify snapshot rows vs the index: new/changed doc ids and
    deleted doc_ids (keys in the index missing from the snapshot).

    Fully distributed hash join: snapshot hashing (blake2b ids +
    content sha256) runs as a Ray Data map over the corpus, the
    index side streams from the docs sidecars, both are co-located by
    a doc_id hash shard (groupby) and compared vectorized inside each
    shard group. Only the CHANGED/DELETED ids (churn-sized, not
    corpus-sized) ever reach the driver."""
    import ray
    import ray.data

    from .build import _pkg_root

    manifest = mf.load_manifest(index_dir)
    tombs = np.array(sorted(manifest.get("tombstones", [])), dtype=np.uint64)
    pkg_root = _pkg_root()

    def hash_batch(batch):
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import numpy as _np
        import pyarrow as _pa

        from microfts_ray.sources.corpus import corpus_sha256 as sha
        from microfts_ray.stages.tokenize import doc_ids_column as dic

        ids = _np.asarray(
            dic(batch["repo"], batch["path"], batch["commit"]), dtype=_np.uint64
        )
        shas = [sha(c) for c in batch["content"].to_pylist()]
        return _pa.table(
            {
                "doc_id": _pa.array(ids, _pa.uint64()),
                "sha": _pa.array(shas),
                "src": _pa.array(_np.ones(ids.size, dtype=_np.int8)),
                "shard": _pa.array(
                    (ids % _DIFF_SHARDS).astype(_np.int64), _pa.int64()
                ),
            }
        )

    def index_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.uint64)
        keep = ~np.isin(ids, tombs) if tombs.size else np.ones(ids.size, bool)
        ids = ids[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.uint64()),
                "sha": batch["content_sha256"].filter(pa.array(keep)),
                "src": pa.array(np.zeros(ids.size, dtype=np.int8)),
                "shard": pa.array((ids % _DIFF_SHARDS).astype(np.int64), pa.int64()),
            }
        )

    snap_ds = ray.data.read_parquet(
        sorted(corpus_paths), columns=["repo", "path", "commit", "content"]
    ).map_batches(hash_batch, batch_format="pyarrow")
    sidecars = [
        os.path.join(index_dir, rel) for rel, _si in mf.docs_sources(manifest)
    ]
    idx_ds = ray.data.read_parquet(
        sidecars, columns=["doc_id", "content_sha256"]
    ).map_batches(index_batch, batch_format="pyarrow")

    def classify(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy()
        doc = group["doc_id"].to_numpy().astype(np.uint64)
        sha = np.asarray(group["sha"].to_pylist(), dtype="S64")
        im = src == 0
        idx_doc, idx_sha = doc[im], sha[im]
        order = np.argsort(idx_doc, kind="stable")
        idx_doc, idx_sha = idx_doc[order], idx_sha[order]
        s_doc, s_sha = doc[~im], sha[~im]
        if idx_doc.size:
            pos = np.minimum(
                np.searchsorted(idx_doc, s_doc), idx_doc.size - 1
            )
            same = (idx_doc[pos] == s_doc) & (idx_sha[pos] == s_sha)
        else:
            same = np.zeros(s_doc.size, dtype=bool)
        changed = s_doc[~same]
        if s_doc.size:
            ss = np.sort(s_doc)
            pos2 = np.minimum(np.searchsorted(ss, idx_doc), ss.size - 1)
            in_snap = ss.size > 0
            present = (ss[pos2] == idx_doc) if in_snap else np.zeros(idx_doc.size, bool)
        else:
            present = np.zeros(idx_doc.size, dtype=bool)
        deleted = idx_doc[~present]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([changed, deleted]), pa.uint64()
                ),
                "cls": pa.array(
                    np.concatenate(
                        [
                            np.zeros(changed.size, dtype=np.int8),
                            np.ones(deleted.size, dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    rows = (
        snap_ds.union(idx_ds)
        .groupby("shard")
        .map_groups(classify, batch_format="pyarrow")
        .take_all()  # churn-sized, not corpus-sized
    )
    new_or_changed = sorted(int(r["doc_id"]) for r in rows if r["cls"] == 0)
    deleted = sorted(int(r["doc_id"]) for r in rows if r["cls"] == 1)
    return {"new_or_changed": new_or_changed, "deleted": deleted}


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
    import ray
    import ray.data

    from .build import _pkg_root

    manifest = mf.load_manifest(index_dir)
    diff = snapshot_diff(index_dir, corpus_paths)
    changed_ids = np.array(sorted(diff["new_or_changed"]), dtype=np.uint64)
    pkg_root = _pkg_root()
    changed_ref = ray.put(changed_ids) if ray.is_initialized() else None

    def _changed_filter(batch: pa.Table) -> pa.Table:
        """Keep only rows whose doc key is in the changed set (the
        broadcast-filter pattern: ids via ray.put, vectorized isin)."""
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import numpy as _np
        import ray as _ray

        from microfts_ray.stages.tokenize import doc_ids_column as dic

        wanted = _ray.get(changed_ref)
        ids = _np.asarray(
            dic(batch["repo"], batch["path"], batch["commit"]), dtype=_np.uint64
        )
        return batch.filter(pa.array(_np.isin(ids, wanted)))

    if not delete_missing:
        # `input` semantics: only tombstone old versions of re-supplied
        # (repo, path) keys. Both lookups are distributed filters whose
        # results are churn-sized.
        changed_keys = set()
        if changed_ids.size:
            rows = (
                ray.data.read_parquet(
                    sorted(corpus_paths), columns=["repo", "path", "commit"]
                )
                .map_batches(_changed_filter, batch_format="pyarrow")
                .take_all()
            )
            changed_keys = {(r["repo"], r["path"]) for r in rows}
        deleted_ids = np.array(sorted(diff["deleted"]), dtype=np.uint64)
        kept_deleted: list[int] = []
        if deleted_ids.size:
            del_ref = ray.put(deleted_ids)

            def _deleted_filter(batch: pa.Table) -> pa.Table:
                import numpy as _np
                import ray as _ray

                ids = batch["doc_id"].to_numpy().astype(_np.uint64)
                m = _np.isin(ids, _ray.get(del_ref))
                return batch.filter(pa.array(m))

            sidecars = [
                os.path.join(index_dir, rel)
                for rel, _si in mf.docs_sources(manifest)
            ]
            drows = (
                ray.data.read_parquet(
                    sidecars, columns=["doc_id", "repo", "path"]
                )
                .map_batches(_deleted_filter, batch_format="pyarrow")
                .take_all()
            )
            kept_deleted = sorted(
                int(r["doc_id"])
                for r in drows
                if (r["repo"], r["path"]) in changed_keys
            )
        diff["deleted"] = kept_deleted
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
        # materialize changed rows into delta corpus files with a
        # DISTRIBUTED broadcast-filtered write (no corpus-sized data
        # on the driver), then run the ordinary partition build
        delta_dir = os.path.join(index_dir, "delta", f"gen-{gen}")
        os.makedirs(delta_dir, exist_ok=True)
        (
            ray.data.read_parquet(sorted(corpus_paths))
            .map_batches(_changed_filter, batch_format="pyarrow")
            .write_parquet(
                delta_dir, row_group_size=max(1, target_rows_per_part // 4)
            )
        )
        import glob

        delta_paths = sorted(
            p
            for p in glob.glob(os.path.join(delta_dir, "*.parquet"))
            if pq.ParquetFile(p).metadata.num_rows > 0
        )
        for part in plan_partitions(delta_paths, target_rows_per_part):
            part["pid"] = f"g{gen}-{part['pid']}"
            # keep the INDEX's posting layout: pre-sidecar indexes
            # store dl in-stream, so their deltas must too (a
            # mixed-layout shard table would be undecodable)
            entry = build_partition(
                part, index_dir, chunker,
                store_dl=manifest.get("dl_layout") != "sidecar",
            )
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
    import pyarrow.compute as pc

    manifest = mf.load_manifest(index_dir)
    for rel, _si in mf.docs_sources(manifest):
        t = pq.read_table(
            os.path.join(index_dir, rel),
            columns=["doc_id", "repo", "path", "commit"],
        )
        joined = pc.binary_join_element_wise(
            pc.binary_join_element_wise(t["repo"], t["path"], "/"),
            t["commit"], "@",
        )
        hit = pc.index(pc.equal(joined, group), True).as_py()
        if hit >= 0:
            return delete_doc(
                index_dir,
                t["repo"][hit].as_py(),
                t["path"][hit].as_py(),
                t["commit"][hit].as_py(),
            )
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
