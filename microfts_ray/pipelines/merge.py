"""Hierarchical segment merge: the distributed analog of `compact`.

The reference's compact (/root/reference/fts-lmdb.go:919-985) rewrites
every posting list in one transaction. Here, build partitions produce
doc-disjoint posting runs (build.py); this stage consolidates them
into M term-range shards so a query touches ONE file per term instead
of one per build partition — Lucene/LSM-style segment consolidation.

Execution is Ray-Data-native: the segment rows (term, blobs) are read
as a Dataset, a vectorized map_batches assigns each row its shard by
term-range, and ONE groupby(shard) shuffle co-locates each shard's
rows for its map_groups writer. This moves the posting blobs through
the object store exactly once, instead of every shard task re-opening
every segment file (opens would scale as #segments x #shards).

Skew handling (the north_star's hot-term concern): shard boundaries
are cut at ~equal POSTING MASS from a sampled per-term histogram (the
bounded 50,653-term vocabulary makes the histogram one small array;
sampling segments is unbiased because build partitions are
statistically alike). A single ultra-hot term still lives in one
shard (per-term atomicity); splitting a term across doc-ranges is the
next escalation and slots into the same layout (runs are doc-sorted).

Modes:
  * "stack" (default): blobs pass through untouched; a shard holds
    multiple doc-disjoint rows per term which the reader k-way merges
    at decode (amortized by its run cache). I/O-bound -> scales.
  * "rewrite": decode-all, drop tombstones, re-sort, re-encode to one
    run per term — the compaction path.

Each shard write is atomic + checkpointed; a crashed merge re-runs
only missing shards (the shuffle is recomputed by Ray lineage).
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


def _park_index_file(path: str) -> None:
    """Best-effort: park a just-written index file's bytes in the warm
    store's plasma cache (budgeted) so in-session serving reads it
    zero-copy from shared memory. This box's page-cache reclaimer can
    evict a just-written file within SECONDS; first-pass rare-gram
    decodes then crawl a 10-20 MB/s disk (r3: first BM25 pass 77-79 s
    vs a 9.8 s band). No-op without a live warm store."""
    from .query import _warmstore

    try:
        store = _warmstore()
        if store is None:
            return
        with open(path, "rb") as f:
            data = np.frombuffer(f.read(), dtype=np.uint8)
        ray.get(
            store.put_file_bytes.remote(os.path.abspath(path), data)
        )
    except Exception:
        pass


def _emit_pool_cap(knee: int = 6) -> int:
    """Warm-emission fan-out cap. Decode streams are bounded by
    PER-NODE memory bandwidth (the measured knee is ~6 concurrent
    streams on this host class), but the cap applies CLUSTER-WIDE, so
    the default is knee x live-node count — a single-host constant
    would serialize warm emission on a multi-node cluster where every
    node brings its own memory bus (r3 verdict). MICROFTS_EMIT_TASKS
    overrides explicitly (0 = uncapped: one emit slot per unit);
    single-node behavior is unchanged (knee)."""
    env = os.environ.get("MICROFTS_EMIT_TASKS")
    if env is not None:
        return int(env)
    n_nodes = 1
    try:
        if ray.is_initialized():
            n_nodes = sum(
                1
                for n in ray.nodes()
                if n.get("Alive")
                and n.get("Resources", {}).get("CPU", 0) > 0
            ) or 1
    except Exception:
        pass
    return knee * n_nodes


def _balanced_bounds(
    terms_paths: list[str], n_shards: int, sample: int = 32
) -> tuple[list[int], np.ndarray]:
    """Term-range boundaries with ~equal posting mass per shard, from
    a segment sample (exact balance is not needed, only skew
    avoidance). Also returns the sampled per-term mass histogram —
    merge_index uses it to pick ultra-hot terms for doc-range
    splitting (sampling is unbiased: build partitions are
    statistically alike)."""
    if len(terms_paths) > sample:
        step = len(terms_paths) / sample
        paths = [terms_paths[int(i * step)] for i in range(sample)]
    else:
        paths = terms_paths
    counts = np.zeros(GRAM_3_BASE, dtype=np.int64)
    use_ray = False
    try:
        use_ray = ray.is_initialized() and len(paths) >= 8
    except Exception:
        pass
    if use_ray:
        # fan the sample reads out as tasks: the serial driver loop
        # was ~3.5 s at 136 segments — pure Amdahl serial time that
        # capped the build's measured 2->8 cpu scaling efficiency
        # (each task returns one small 50,653-bin histogram)
        pkg_root = _pkg_root()

        @ray.remote(num_cpus=1)
        def _hist(chunk: list[str]) -> np.ndarray:
            import sys

            if pkg_root not in sys.path:
                sys.path.insert(0, pkg_root)
            import numpy as _np
            import pyarrow.parquet as _pq

            from microfts_ray.functions.grams import GRAM_3_BASE as _G

            c = _np.zeros(_G, dtype=_np.int64)
            for path in chunk:
                t = _pq.read_table(path, columns=["term", "n"])
                _np.add.at(c, t["term"].to_numpy(), t["n"].to_numpy())
            return c

        nt = min(16, len(paths))
        for c in ray.get([_hist.remote(paths[i::nt]) for i in range(nt)]):
            counts += c
    else:
        for path in paths:
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
    return bounds, counts


def make_dict_resolver(index_dir: str, manifest: dict):
    """dict_id -> sorted doc array resolver for rank-encoded posting
    streams (used by rewrite-merge workers)."""
    cache: dict[str, np.ndarray] = {}
    pid_docs = {
        p["pid"]: p["segment"].get("docs")
        for p in manifest["partitions"]
        if p["segment"].get("docs")
    }

    def resolve(did: str) -> np.ndarray:
        arr = cache.get(did)
        if arr is None:
            pid, _, _sub = did.rpartition(":")
            t = pq.read_table(
                os.path.join(index_dir, pid_docs[pid]), columns=["doc_id", "sub"]
            )
            ids = t["doc_id"].to_numpy()
            subs = t["sub"].to_numpy()
            for k in np.unique(subs):
                cache[f"{pid}:{int(k)}"] = np.sort(ids[subs == k]).astype(np.uint64)
            arr = cache[did]
        return arr

    return resolve


def make_dl_space(index_dir: str, manifest: dict):
    """Chunk-dl lookup space from the docs sidecars (sidecar-dl
    layout), for the rewrite-merge dl gather. None if no sidecar
    carries chunk_dl (old in-stream-dl generations)."""
    from ..functions.postings import build_chunk_dl_space

    ids, spans, dls = [], [], []
    for rel, _si in mf.docs_sources(manifest):
        d = pq.read_table(os.path.join(index_dir, rel))
        if "chunk_dl" not in d.column_names:
            continue
        ids.append(d["doc_id"].to_numpy().astype(np.uint64))
        span_col = "chunk_span" if "chunk_span" in d.column_names else "n_chunks"
        spans.append(d[span_col].to_numpy().astype(np.int64))
        col = d["chunk_dl"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dls.append(arr.flatten().to_numpy(zero_copy_only=False))
    if not ids:
        return None
    return build_chunk_dl_space(ids, spans, dls)


def write_shard_table(
    index_dir: str,
    shard: int,
    n_shards: int,
    lo: int,
    hi: int,
    tbl: pa.Table,
    deleted_docs: np.ndarray | None = None,
    mode: str = "stack",
    dict_resolver=None,
    dl_space=None,
) -> dict:
    """Sort/encode one shard's rows and write its file atomically;
    records the per-shard checkpoint."""
    if deleted_docs is not None and len(deleted_docs) and mode == "stack":
        mode = "rewrite"  # tombstone drop requires decoding
    pid = f"merged-{shard:04d}-of-{n_shards:04d}"
    existing = mf.read_part_checkpoint(index_dir, pid)
    if existing is not None:
        return existing
    if tbl.num_rows and mode == "stack":
        order = np.argsort(tbl["term"].to_numpy(), kind="stable")
        out_tbl = tbl.take(pa.array(order))
        # NOTE: consolidating hot terms here (_consolidate_hot) was
        # measured and rejected: hot terms carry ~80% of posting mass,
        # so it costs nearly a full rewrite (+52s merge) while cutting
        # reader warmup only 47s -> 13s — net worse time-to-first-query
    elif tbl.num_rows:
        from ..functions.postings import decode_terms_table

        dec = decode_terms_table(tbl, dict_resolver=dict_resolver)
        cols = ["term", "doc_id", "chunk_id", "tf", "dl"]
        entries = {c: dec[c] for c in cols}
        if deleted_docs is not None and len(deleted_docs):
            keep = ~np.isin(
                entries["doc_id"], np.asarray(deleted_docs, dtype=np.uint64)
            )
            entries = {c: v[keep] for c, v in entries.items()}
        order = np.lexsort(
            (entries["chunk_id"], entries["doc_id"], entries["term"])
        )
        entries = {c: v[order] for c, v in entries.items()}
        if not dec["has_dl"] and entries["term"].size and dl_space is not None:
            # sidecar-dl inputs decode dl as zeros; gather REAL dls so
            # the re-encoded per-block bmin_dl WAND bounds stay valid
            # (zeros would silently destroy them on every compact)
            from ..functions.postings import gather_chunk_dls

            entries["dl"] = gather_chunk_dls(
                dl_space, entries["doc_id"], entries["chunk_id"]
            )
        # preserve the source layout: old inputs carry dl in-stream
        # (re-store it); sidecar-dl inputs stay dl-less
        out_tbl = encode_partition_runs(entries, store_dl=dec["has_dl"])
    else:
        out_tbl = TERMS_SCHEMA.empty_table()
    out_dir = os.path.join(index_dir, "merged", f"shard={shard:04d}")
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f".terms.{uuid.uuid4().hex[:8]}.tmp")
    pq.write_table(out_tbl, tmp, row_group_size=512, compression="zstd",
                   compression_level=3)
    final = os.path.join(out_dir, "terms.parquet")
    os.replace(tmp, final)
    _park_index_file(final)  # serving hot layer: zero-copy plasma read
    entry = {
        "pid": pid,
        "shard": shard,
        "n_shards": n_shards,
        "lo": lo,
        "hi": hi,
        "segment": {"terms": f"merged/shard={shard:04d}/terms.parquet"},
        "stats": {
            "n_terms": int(out_tbl.num_rows),
            "n_postings": int(pa.compute.sum(out_tbl["n"]).as_py() or 0),
        },
    }
    mf.write_part_checkpoint(index_dir, pid, entry)
    return entry


_WARM_META = (("w_dirname", pa.string()), ("w_lo", pa.int32()),
              ("w_hi", pa.int32()))


def _with_warm_meta(tbl: pa.Table, dirname: str, lo: int, hi: int) -> pa.Table:
    """Tag a shard's warm-eligible posting rows with their target
    warm-dir identity so the pipelined emit stage (merge_index) can
    route blocks without any side channel."""
    n = tbl.num_rows
    tbl = tbl.append_column("w_dirname", pa.array([dirname] * n, pa.string()))
    tbl = tbl.append_column("w_lo", pa.array([lo] * n, pa.int32()))
    return tbl.append_column("w_hi", pa.array([hi] * n, pa.int32()))


def _empty_warm_tbl() -> pa.Table:
    base = TERMS_SCHEMA.empty_table()
    for name, typ in _WARM_META:
        base = base.append_column(name, pa.array([], typ))
    return base


def write_hot_term_shards(
    index_dir: str, term: int, terms_paths: list[str], n_sub: int
) -> tuple[list[dict], pa.Table | None]:
    """Doc-range split of one ultra-hot term: its rows (doc-disjoint
    per-partition runs) are chopped into n_sub sub-shards of ~equal
    posting mass, each written as its own file — the escalation the
    term-range layout reserves for terms heavier than a whole target
    shard. Sub-shards are doc-DISJOINT row groups (runs never share a
    doc); queries are unchanged because every kernel already consumes
    multiple doc-disjoint sources per term. Checkpointed per term.
    Returns (sub-shard entries, the term's full in-memory rows —
    None on checkpoint resume, when a caller wanting them must read
    the written files instead)."""
    pid = f"merged-hot-{term:05d}"
    existing = mf.read_part_checkpoint(index_dir, pid)
    if existing is not None:
        return existing["subs"], None
    tables = []
    for path in terms_paths:
        f = pq.ParquetFile(path)
        rgs = [
            i
            for i in range(f.metadata.num_row_groups)
            if (st := f.metadata.row_group(i).column(0).statistics) is None
            or (st.min <= term <= st.max)
        ]
        if not rgs:
            continue
        tbl = f.read_row_groups(rgs)
        keep = tbl["term"].to_numpy() == term
        if keep.any():
            tables.append(tbl.filter(keep))
    rows = pa.concat_tables(tables) if tables else TERMS_SCHEMA.empty_table()
    ns = rows["n"].to_numpy().astype(np.int64) if rows.num_rows else np.empty(0, np.int64)
    total = int(ns.sum())
    n_sub = max(1, min(n_sub, max(1, rows.num_rows)))
    # contiguous row chops at ~equal posting mass
    cum = np.cumsum(ns)
    cuts = [0]
    for j in range(1, n_sub):
        cuts.append(
            max(cuts[-1], int(np.searchsorted(cum, total * j // n_sub)))
        )
    cuts.append(rows.num_rows)
    subs = []
    for j in range(n_sub):
        a, b = cuts[j], cuts[j + 1]
        sub_tbl = rows.slice(a, b - a) if b > a else TERMS_SCHEMA.empty_table()
        out_dir = os.path.join(index_dir, "merged", f"hot-term={term:05d}")
        os.makedirs(out_dir, exist_ok=True)
        rel = f"merged/hot-term={term:05d}/part-{j:03d}.parquet"
        tmp = os.path.join(index_dir, rel) + f".{uuid.uuid4().hex[:8]}.tmp"
        pq.write_table(sub_tbl, tmp, row_group_size=512, compression="zstd",
                       compression_level=3)
        os.replace(tmp, os.path.join(index_dir, rel))
        _park_index_file(os.path.join(index_dir, rel))
        subs.append(
            {
                "pid": f"{pid}-{j:03d}",
                "term": int(term),
                "segment": {"terms": rel},
                "stats": {
                    "n_terms": int(sub_tbl.num_rows),
                    "n_postings": int(
                        pa.compute.sum(sub_tbl["n"]).as_py() or 0
                    ),
                },
            }
        )
    mf.write_part_checkpoint(index_dir, pid, {"pid": pid, "subs": subs})
    return subs, rows


def stack_segments(index_dir: str, gid: int, paths: list[str]) -> dict:
    """Hierarchical level-1 fan-in: stack whole segment files into one
    term-sorted intermediate (blob pass-through). Only worthwhile when
    the segment count is large enough that per-shard file opens would
    dominate (each shard task opens every input); checkpointed like
    every other unit of work."""
    pid = f"mergelvl1-{gid:04d}"
    existing = mf.read_part_checkpoint(index_dir, pid)
    if existing is not None:
        return existing
    tables = [pq.read_table(p) for p in paths]
    stacked = pa.concat_tables(tables)
    order = np.argsort(stacked["term"].to_numpy(), kind="stable")
    tbl = stacked.take(pa.array(order))
    out_dir = os.path.join(index_dir, "merged", "level1")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"stack-{gid:04d}.parquet")
    tmp = out + f".{uuid.uuid4().hex[:8]}.tmp"
    pq.write_table(tbl, tmp, row_group_size=512, compression="zstd",
                   compression_level=3)
    os.replace(tmp, out)
    entry = {
        "pid": pid,
        "path": os.path.relpath(out, index_dir),
        "lineage": {"inputs": [os.path.relpath(p, index_dir) for p in paths]},
    }
    mf.write_part_checkpoint(index_dir, pid, entry)
    return entry


def merge_index(
    index_dir: str,
    n_shards: int = 8,
    concurrency: int | None = None,
    deleted_docs: np.ndarray | None = None,
    mode: str = "stack",
    level1_threshold: int = 512,
    fan_in: int = 32,
    emit_warm: bool = False,
    warm_min_entries: int = 10_000,
    warm_inline: bool = False,
) -> dict:
    """Merge all build segments into n_shards mass-balanced term-range
    shards; records bounds in the manifest (idempotent, per-shard
    resumable). mode="stack" (default) passes blobs through (query
    kernels never need per-term consolidation: they are order-
    independent over doc-disjoint runs); mode="rewrite" produces the
    one-run-per-term compacted layout and drops tombstones (the
    compaction path)."""
    manifest = mf.load_manifest(index_dir)
    terms_paths = [
        os.path.join(index_dir, p["segment"]["terms"]) for p in manifest["partitions"]
    ]
    pkg_root0 = _pkg_root()
    if len(terms_paths) >= level1_threshold:
        # hierarchical level: consolidate fan_in segments per
        # intermediate so the shard pass opens #segments/fan_in files
        # (at 10^12-file scale this level repeats log_F times)
        groups = [
            {"gid": g, "paths": terms_paths[g * fan_in : (g + 1) * fan_in]}
            for g in range((len(terms_paths) + fan_in - 1) // fan_in)
        ]
        gds = ray.data.from_items(groups, override_num_blocks=len(groups))

        def run_stack(batch: dict) -> dict:
            import sys

            if pkg_root0 not in sys.path:
                sys.path.insert(0, pkg_root0)
            from microfts_ray.pipelines.merge import stack_segments as ss

            rels = []
            for gid, paths in zip(batch["gid"], batch["paths"]):
                rels.append(ss(index_dir, int(gid), list(paths))["path"])
            return {"gid": batch["gid"], "path": rels}

        kw1 = {"concurrency": concurrency} if concurrency else {}
        out = gds.map_batches(run_stack, batch_size=1, num_cpus=1, **kw1).take_all()
        terms_paths = sorted(os.path.join(index_dir, r["path"]) for r in out)
    bounds, counts = _balanced_bounds(terms_paths, n_shards)
    inner = np.array(bounds[1:-1], dtype=np.int64)
    pkg_root = _pkg_root()
    dead = (
        np.asarray(deleted_docs, dtype=np.uint64)
        if deleted_docs is not None and len(deleted_docs)
        else None
    )
    # ultra-hot terms (heavier than a whole target shard) leave the
    # term-range scheme and split by doc range into their own
    # sub-shards (write_hot_term_shards); stack mode only — the
    # rewrite/compaction layout keeps one run per term
    hot_terms = np.empty(0, dtype=np.int64)
    target_mass = int(counts.sum()) // max(1, n_shards)
    if mode == "stack" and dead is None and n_shards > 1 and target_mass > 0:
        hot_terms = np.flatnonzero(counts > target_mass)[:64]
    hot_subs_of = {
        int(t): max(2, int(round(counts[t] / target_mass))) for t in hot_terms
    }
    hot_arr = hot_terms.astype(np.int64)
    # warm_inline=True: compute each shard's warm representation
    # INSIDE its merge task, from the blob table the task already
    # holds in memory — the emitted warm cache then never re-reads the
    # merge output from storage (at cluster scale this removes a full
    # second read pass, and every node has its own memory bus so the
    # full-width decode fan-out is free). Dirs are STAGED under a temp
    # name — the final manifest hash isn't known until commit — then
    # moved into warmcache/<sha>/ at finalize; emit_warm_cache fills
    # any dirs missed by checkpoint-resumed tasks (file-reading
    # fallback) and writes the completion marker.
    # Default (warm_inline=False): emit AFTER the merge with
    # emit_warm_cache's bandwidth-capped fan-out — on a shared-bus
    # host, inline emission runs the decode at merge concurrency and
    # bus contention past the knee loses 2.4x (measured cold-cache:
    # inline 65 s vs two-phase 25 s for the same 200k-file index; the
    # just-written shard files are still page-hot for the re-read).
    warm_ctx = None
    warm_shared_vals = None
    import time as _time

    _tp0 = _time.perf_counter()
    if emit_warm and mode == "stack" and dead is None:
        # create the warm store FIRST, on the driver: a named
        # non-detached actor dies with its creator, and the emitting
        # map tasks are ephemeral — driver ownership keeps the
        # plasma-resident warm set alive all session. Created before
        # the derivation task so its docs-sidecar reads can be parked.
        from .query import _warmstore as _ws

        _ws(create=True)
        docs_rels = sorted(
            {
                p["segment"]["docs"]
                for p in manifest["partitions"]
                if p["segment"].get("docs")
            }
        )
        # cheap driver-side pre-gate for the dense space: the dense
        # key space has at least one key per chunk, so
        # sum(n_chunks) <= the 2^26 key cap is NECESSARY for
        # _dense_space() to exist — at 10^12-doc scale this skips
        # warm emission without touching a single sidecar. The exact
        # (padded) check runs in the derivation task; in the narrow
        # edge where padding overflows the cap the task returns None
        # and the emit actors no-op.
        n_chunks_tot = sum(
            int(p.get("stats", {}).get("n_chunks", 0))
            for p in manifest["partitions"]
        )
        dense_cap = int(
            os.environ.get("MICROFTS_DENSE_CAP", str(1 << 26))
        )
        if docs_rels and n_chunks_tot <= dense_cap:
            pkg_root_prk = _pkg_root()

            @ray.remote(num_cpus=0)
            def _derive_warm_shared(rels: list[str]):
                """Park the docs sidecars, then derive the warm shared
                tuple (dense space, chunk-dl space, global rank maps)
                OFF the driver. This ran serially on the driver before
                the merge dataset launched and cost 30-50 s inside a
                bandwidth collapse (runs 8-9's setup_s); as a task its
                OUTPUT REF is what the emit actors' __init__ blocks
                on, so the whole setup overlaps the already-running
                merge units. num_cpus=0 on task and parkers: both are
                disk/bus-bound, and they must not be starved by the
                merge units saturating the CPU pool (worst case would
                re-serialize the setup after the merge)."""
                import sys

                if pkg_root_prk not in sys.path:
                    sys.path.insert(0, pkg_root_prk)
                import ray as _ray

                from microfts_ray.pipelines.query import (
                    IndexReader as _IRt,
                )

                @_ray.remote(num_cpus=0)
                def _park_many(rr: list[str]) -> int:
                    import sys as _s

                    if pkg_root_prk not in _s.path:
                        _s.path.insert(0, pkg_root_prk)
                    from microfts_ray.pipelines.merge import (
                        _park_index_file as _pif,
                    )

                    for rel in rr:
                        _pif(os.path.join(index_dir, rel))
                    return len(rr)

                import time as _t

                from microfts_ray.pipelines.query import (
                    _warm_prof as _wpd,
                )

                t0 = _t.perf_counter()
                nt = min(8, len(rels))
                _ray.get(
                    [_park_many.remote(rels[i::nt]) for i in range(nt)]
                )
                t1 = _t.perf_counter()
                r0 = _IRt(index_dir)
                # dense_cap is the DRIVER-resolved value (closure):
                # reading MICROFTS_DENSE_CAP here would follow the
                # worker's env, which may predate a driver-side change
                # — the repo contract is driver-evaluated env, threaded
                # through (a divergent cap would make this task return
                # None while the driver's finalize path expects a
                # dense space, crashing the fallback emit tasks). The
                # instance override keeps every internal
                # _dense_space() call in this task on the same cap.
                r0._dense_cap_override = dense_cap
                if r0._dense_space() is None:
                    return None  # padding pushed keys past the cap
                try:
                    dls = r0._chunk_dl_space()
                except KeyError:
                    dls = None
                out = (r0._dense, dls, r0._warm_maps())
                _wpd(
                    {
                        "dir": "_derive",
                        "park_s": round(t1 - t0, 3),
                        "derive_s": round(_t.perf_counter() - t1, 3),
                    }
                )
                return out

            shared_ref = _derive_warm_shared.remote(docs_rels)
            # a ref is fine downstream: emit_warm_cache accepts an
            # ObjectRef for `shared` (query.py) and the emit actors
            # ray.get it in __init__
            warm_shared_vals = shared_ref
            if warm_inline:
                staging = os.path.join(
                    index_dir, "warmcache", f".staging-{uuid.uuid4().hex[:8]}"
                )
                from .query import (
                    _vec_min_default as _vmd,
                    _warm_files_mode as _wfm,
                )

                # per-dir TIME budget for the dense-vector pre-build:
                # total budget MICROFTS_VEC_BUDGET_SECONDS spread over
                # the emit pool's dirs. A time bound needs no
                # bandwidth probe and self-adapts when the episode
                # flips MID-RUN (a probe-derived byte budget measured
                # healthy at merge start and then built every vector
                # inside a collapse): at healthy bandwidth every
                # eligible vector fits comfortably (behavior and bands
                # unchanged); inside a collapse each dir builds its
                # hottest vectors until its slice is spent and the
                # rest build lazily at first query use (_dense_vec).
                vec_sec_total = float(
                    os.environ.get("MICROFTS_VEC_BUDGET_SECONDS", "8")
                )
                n_units_est = n_shards + len(hot_subs_of)
                emit_cap = _emit_pool_cap()
                # <= 0 forces the build: no time budget, no ambient
                # gate (tests + deployments that always want vectors)
                per_dir_sec = (
                    vec_sec_total * max(1, emit_cap or n_units_est)
                    / max(1, n_units_est)
                    if vec_sec_total > 0
                    else -1.0
                )
                # per-dir DECODE time budget, same shape: warm depth
                # itself adapts to the ambient episode — each dir
                # decodes hottest-first and stops when its slice is
                # spent; the un-emitted tail (mid-mass terms) decodes
                # lazily per term at query time from the plasma-parked
                # shards, which costs ~MBs per term. At healthy
                # bandwidth a dir decodes fully well inside its slice
                # (bands unchanged).
                dec_sec_total = float(
                    os.environ.get("MICROFTS_WARM_DECODE_SECONDS", "45")
                )
                per_dir_dec = (
                    dec_sec_total * max(1, emit_cap or n_units_est)
                    / max(1, n_units_est)
                    if dec_sec_total > 0
                    else None
                )
                # files mode is driver-evaluated and threaded through
                # (workers may not see late env changes)
                warm_ctx = (
                    shared_ref, staging,
                    int(warm_min_entries), _vmd(), _wfm(), per_dir_sec,
                    per_dir_dec,
                )

    def run_unit(batch: dict):
        # direct-read merge: each shard task reads only the row groups
        # of its term range (terms sorted in segments -> parquet stats
        # prune). Measured faster than a Ray groupby shuffle of the
        # blob rows at sandbox scale; at true multi-node scale the
        # groupby-shuffle variant trades opens for object-store
        # transfer and becomes preferable — both write the same
        # layout through write_shard_table.
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from microfts_ray.pipelines.merge import (
            make_dict_resolver as mdr,
            make_dl_space as mds,
            write_shard_table as wst,
        )
        import microfts_ray.state.manifest as _mfmod

        from os.path import join as _os_path_join

        from microfts_ray.pipelines.merge import (
            _empty_warm_tbl as ewt,
            _with_warm_meta as wwm,
            write_hot_term_shards as whs,
        )
        from microfts_ray.pipelines.query import _write_warm_dir as wwd

        rewriting = mode == "rewrite" or dead is not None
        _m = _mfmod.load_manifest(index_dir) if rewriting else None
        resolver = mdr(index_dir, _m) if rewriting else None
        dl_space = mds(index_dir, _m) if rewriting else None
        out = []
        warm_tbls = []
        for kind, shard, lo, hi, term, n_sub in zip(
            batch["kind"], batch["shard"], batch["lo"], batch["hi"],
            batch["term"], batch["n_sub"],
        ):
            if str(kind) == "hot":
                # ultra-hot term unit: doc-range split + (pipelined)
                # warm rows for its shard=hot-* dir — runs in the SAME
                # dataset as the range shards so everything overlaps
                term = int(term)
                subs, rows = whs(index_dir, term, terms_paths, int(n_sub))
                out.append(len(subs))
                if warm_ctx is not None and rows is not None:
                    dirname = f"shard=hot-{term:05d}"
                    total = (
                        int(rows["n"].to_numpy().astype(_np.int64).sum())
                        if rows.num_rows
                        else 0
                    )
                    if total >= warm_ctx[2]:
                        warm_tbls.append(
                            wwm(rows, dirname, term, term + 1)
                        )
                    else:
                        wwd(
                            _os_path_join(warm_ctx[1], dirname), {},
                            term, term + 1, None, warm_ctx[2],
                            files=warm_ctx[4], compact=True,
                        )
                # rows None (checkpoint resume): the file-reading
                # fallback emit fills the dir
                continue
            shard, lo, hi = int(shard), int(lo), int(hi)
            pid = f"merged-{shard:04d}-of-{n_shards:04d}"
            import microfts_ray.state.manifest as _mf

            if _mf.read_part_checkpoint(index_dir, pid) is not None:
                out.append(-1)
                continue
            tables = []
            for path in terms_paths:
                f = _pq.ParquetFile(path)
                rgs = [
                    i
                    for i in range(f.metadata.num_row_groups)
                    if (st := f.metadata.row_group(i).column(0).statistics) is None
                    or (st.min < hi and st.max >= lo)
                ]
                if not rgs:
                    continue
                tbl = f.read_row_groups(rgs)
                terms = tbl["term"].to_numpy()
                keep = (terms >= lo) & (terms < hi)
                if hot_arr.size:
                    keep &= ~_np.isin(terms, hot_arr)  # hot terms split out
                if keep.any():
                    tables.append(tbl.filter(keep))
            tbl = (
                _pa.concat_tables(tables)
                if tables
                else None
            )
            from microfts_ray.pipelines.build import TERMS_SCHEMA as _TS

            e = wst(
                index_dir, shard, n_shards, lo, hi,
                tbl if tbl is not None else _TS.empty_table(),
                deleted_docs=dead, mode=mode, dict_resolver=resolver,
                dl_space=dl_space,
            )
            out.append(e["stats"]["n_postings"])
            if warm_ctx is not None:
                # pipelined warm emission: pass this shard's
                # warm-eligible rows (terms at/over the warm
                # threshold; range-sharding makes per-shard totals the
                # global totals) downstream as an Arrow block — the
                # decode runs in the capped emit actor pool, zero-copy
                # through the object store, overlapped with the
                # remaining merge writes
                wmin_l = warm_ctx[2]
                wtbl = None
                if tbl is not None and tbl.num_rows:
                    terms_np = tbl["term"].to_numpy()
                    ns_np = tbl["n"].to_numpy()
                    uniq, inv = _np.unique(terms_np, return_inverse=True)
                    sums = _np.bincount(
                        inv, weights=ns_np.astype(_np.float64)
                    ).astype(_np.int64)
                    keepw = (sums >= wmin_l)[inv]
                    if keepw.any():
                        wtbl = wwm(
                            tbl.filter(_pa.array(keepw)),
                            f"shard={shard:04d}", lo, hi,
                        )
                if wtbl is None:
                    # no warm-depth term in this range: stage the
                    # empty dir here (no decode needed) so provenance
                    # and the completion marker stay uniform
                    wwd(
                        _os_path_join(warm_ctx[1], f"shard={shard:04d}"),
                        {}, lo, hi, None, wmin_l, files=warm_ctx[4],
                    )
                else:
                    warm_tbls.append(wtbl)
        if warm_ctx is not None:
            return (
                _pa.concat_tables(warm_tbls) if warm_tbls else ewt()
            )
        return {"shard": batch["shard"], "n_postings": np.array(out, dtype=np.int64)}

    units = [
        {"kind": "shard", "shard": s, "lo": bounds[s],
         "hi": bounds[s + 1], "term": -1, "n_sub": 0}
        for s in range(n_shards)
    ] + [
        {"kind": "hot", "shard": -1, "lo": 0, "hi": 0,
         "term": int(t), "n_sub": int(ns)}
        for t, ns in hot_subs_of.items()
    ]
    ds = ray.data.from_items(units, override_num_blocks=len(units))
    kwargs = {"concurrency": concurrency} if concurrency else {}
    cap = _emit_pool_cap()
    _tp1 = _time.perf_counter()
    shard_out = ds.map_batches(run_unit, batch_size=1, num_cpus=1, **kwargs)
    if warm_ctx is None:
        shard_out.materialize()
    else:
        # pipelined warm emission: the merge stage runs FULL width
        # (its zstd writes are cpu-bound) and streams each shard's
        # warm-eligible rows — one ~50 MB Arrow block per shard,
        # zero-copy through the object store — into a small ACTOR
        # POOL whose size is the measured bus knee. Long-lived actors
        # amortize the first-allocation page-fault tax that one-shot
        # emit tasks each paid, and decode overlaps the rest of the
        # merge instead of serializing behind it.
        (shared_ref_p, staging_p, wmin_p, vec_min_p, files_p,
         vec_sec_p, dec_sec_p) = warm_ctx

        class _EmitWarm:
            def __init__(self):
                import sys

                if pkg_root not in sys.path:
                    sys.path.insert(0, pkg_root)
                import ray as _ray

                from microfts_ray.pipelines.query import IndexReader as _IRw

                # blocks until the off-driver derivation task (launched
                # before the merge dataset) finishes — the merge units
                # run meanwhile, so the wait overlaps real work
                shared = _ray.get(shared_ref_p)
                if shared is None:
                    # padded dense space overflowed the key cap after
                    # the driver's necessary-condition pre-gate passed:
                    # no warm cache this generation, emit nothing
                    self.r = None
                    return
                dense, dls, mps = shared
                r = _IRw(index_dir)
                r._dense = dense
                if dls is not None:
                    r._chunk_dl_cache = dls
                self.r = r
                self.mps = mps
                self.dense_k = int(dense[1][-1])
                # precompute the global rank-map concat HERE: it is
                # cached per reader, but the first warm_from_table
                # call otherwise pays it inside a dir's decode budget
                # (~14 s at a collapsed bus, run-10/12 profiles) —
                # in __init__ it overlaps the merge units instead
                r._warm_gmaps(mps)

            def __call__(self, tbl):
                import os as _os
                import time as _time

                import numpy as _np
                import pyarrow as _pa2

                from microfts_ray.pipelines.query import (
                    _warm_prof as _wp,
                    _write_warm_dir as _wwd,
                )

                names = []
                if self.r is None:
                    return _pa2.table(
                        {"dirname": _pa2.array([], _pa2.string())}
                    )
                if tbl.num_rows:
                    dirnames = tbl["w_dirname"].to_numpy(
                        zero_copy_only=False
                    )
                    for dn in _np.unique(dirnames):
                        sub = tbl.filter(_pa2.array(dirnames == dn))
                        lo = int(sub["w_lo"][0].as_py())
                        hi = int(sub["w_hi"][0].as_py())
                        dd = _os.path.join(staging_p, str(dn))
                        if _os.path.isdir(dd):
                            # a warm block was split mid-dir: refuse
                            # loudly rather than stage a partial dir
                            raise RuntimeError(
                                f"staged warm dir {dn} already exists "
                                "(block split? raise DataContext."
                                "target_max_block_size)"
                            )
                        data = sub.drop_columns(
                            ["w_dirname", "w_lo", "w_hi"]
                        )
                        td0 = _time.perf_counter()
                        # hottest-first decode under the per-dir time
                        # budget: terms ordered by posting mass and
                        # decoded in ~2M-entry chunks; when the slice
                        # is spent the rest of this dir's terms go
                        # lazy (query-time per-term decode against the
                        # plasma-parked shards)
                        t_np = data["term"].to_numpy()
                        n_np = data["n"].to_numpy().astype(_np.int64)
                        uniq_t, inv_t = _np.unique(
                            t_np, return_inverse=True
                        )
                        tmass = _np.bincount(inv_t, weights=n_np)
                        order_t = _np.argsort(-tmass, kind="stable")
                        out = {}
                        n_deferred = 0
                        pos = 0
                        # absolute per-dir deadline, enforced both
                        # between chunks AND inside warm_from_table
                        # (between ~128k-entry decode slices): a
                        # single multi-million-entry hot term is one
                        # chunk, and inside a bandwidth collapse its
                        # unbounded decode was the 20-40 s/dir
                        # overrun that blew warm_build past its
                        # budget (runs 8-9: 207-227 worker-seconds
                        # of decode vs the ~40 the budget allows)
                        dl_abs = (
                            td0 + dec_sec_p
                            if dec_sec_p is not None
                            else None
                        )
                        while pos < order_t.size:
                            if (
                                pos
                                and dl_abs is not None
                                and _time.perf_counter() > dl_abs
                            ):
                                n_deferred += order_t.size - pos
                                break
                            chunk_terms = []
                            acc = 0
                            while pos < order_t.size and (
                                acc < 2_000_000 or not chunk_terms
                            ):
                                j = int(order_t[pos])
                                chunk_terms.append(int(uniq_t[j]))
                                acc += int(tmass[j])
                                pos += 1
                            dropped: list = []
                            out.update(
                                self.r.warm_from_table(
                                    data,
                                    _np.array(
                                        sorted(chunk_terms),
                                        dtype=_np.int64,
                                    ),
                                    self.mps,
                                    deadline=dl_abs,
                                    deferred_out=dropped,
                                    compact=True,
                                )
                            )
                            n_deferred += len(dropped)
                        _wp(
                            {
                                "dir": str(dn),
                                "decode_s": round(
                                    _time.perf_counter() - td0, 3
                                ),
                                "rows": int(data.num_rows),
                                "terms_deferred": int(n_deferred),
                            }
                        )
                        _wwd(
                            dd, out, lo, hi, None, wmin_p,
                            dense_k=self.dense_k, vec_min=vec_min_p,
                            files=files_p, vec_seconds=vec_sec_p,
                            compact=True,
                            bm25_stats=(self.r.n_chunks, self.r.avgdl),
                        )
                        names.append(str(dn))
                return _pa2.table(
                    {"dirname": _pa2.array(names, _pa2.string())}
                )

        n_emit = min(max(1, cap), len(units)) if cap > 0 else len(units)
        # a hot term's warm block can exceed the default 128 MiB
        # target block size; raise it for this pipeline so a warm
        # dir's rows are never split across blocks (_EmitWarm refuses
        # partial dirs loudly)
        ctx = ray.data.DataContext.get_current()
        prev_tmbs = ctx.target_max_block_size
        ctx.target_max_block_size = max(prev_tmbs or 0, 1 << 30)
        try:
            shard_out.map_batches(
                _EmitWarm,
                batch_size=None,
                batch_format="pyarrow",
                num_cpus=1,
                concurrency=n_emit,
            ).materialize()
        finally:
            ctx.target_max_block_size = prev_tmbs
    _tp2 = _time.perf_counter()
    hot_entries: list[dict] = []
    if hot_subs_of:
        for t in hot_subs_of:
            ck = mf.read_part_checkpoint(index_dir, f"merged-hot-{t:05d}")
            hot_entries.extend(ck["subs"])
    shards = []
    for s in range(n_shards):
        e = mf.read_part_checkpoint(index_dir, f"merged-{s:04d}-of-{n_shards:04d}")
        if e is None:  # term range produced no rows -> empty shard
            e = write_shard_table(
                index_dir, s, n_shards, bounds[s], bounds[s + 1],
                TERMS_SCHEMA.empty_table(), deleted_docs=dead, mode=mode,
            )
        shards.append(e)
    manifest["merged"] = {
        "n_shards": n_shards,
        "bounds": bounds,
        "shards": [
            {k: e[k] for k in ("pid", "shard", "lo", "hi", "segment", "stats")}
            for e in shards
        ],
        "hot": hot_entries,
    }
    mf.commit_manifest(index_dir, manifest)
    if emit_warm and mode == "stack" and dead is None:
        # finalize the merge-inline emission: stamp the committed
        # generation's manifest hash into the staged dirs and move
        # them into place, then emit_warm_cache fills any dirs missed
        # by checkpoint-resumed tasks (file-reading fallback) and
        # writes the completion marker + sweeps older generations
        from .query import IndexReader as _IR2, _warmstore, emit_warm_cache

        if warm_ctx is not None:
            import json as _json
            import shutil as _shutil

            staging = warm_ctx[1]
            sha = _IR2(index_dir)._manifest_sha()
            target = os.path.join(index_dir, "warmcache", sha)
            store = _warmstore()
            if store is not None:
                try:
                    # park the shared-tuple ref for this generation:
                    # prewarm's fan-out top-up otherwise rebuilds the
                    # dense/dl/rank maps and re-ray.puts them — ~20 s
                    # of single-process work inside a collapse
                    # (list-wrapped: top-level refs auto-deref)
                    ray.get(
                        store.put_shared.remote(sha, [warm_ctx[0]])
                    )
                except Exception:
                    pass
            os.makedirs(target, exist_ok=True)
            if os.path.isdir(staging):
                for name in sorted(os.listdir(staging)):
                    src = os.path.join(staging, name)
                    dst = os.path.join(target, name)
                    mp = os.path.join(src, "meta.json")
                    if not os.path.isdir(src) or os.path.exists(dst):
                        continue
                    try:
                        with open(mp) as f:
                            m = _json.load(f)
                        m["manifest_sha"] = sha
                        m["staged"] = True  # provenance: inline, not fallback
                        with open(mp, "w") as f:
                            _json.dump(m, f)
                        os.replace(src, dst)
                        if store is not None:
                            try:
                                # move the staged plasma entry with
                                # the dir
                                ray.get(store.rebind.remote(src, dst, sha))
                            except Exception:
                                pass
                    except (OSError, ValueError):
                        continue  # incomplete staged dir: fallback re-emits
                _shutil.rmtree(staging, ignore_errors=True)
        emit_warm_cache(
            index_dir,
            min_entries=warm_min_entries,
            # inline mode already parked the tuple in plasma: pass the
            # REF so the fallback pass doesn't put a second copy
            shared=warm_ctx[0] if warm_ctx is not None else warm_shared_vals,
        )
        # eagerly park the CORPUS source shards too (search/fuzzy
        # verification re-reads them every query; this box's reclaimer
        # evicts them within seconds of the build's read): the lazy
        # first-touch park races a one-shot scan — the r4 bench's
        # single search_and read the reclaimed disk and the park paid
        # off never (5.15 s vs the 1.15 s band). Fire-and-forget into
        # the single-threaded store's queue, budget-refused when over;
        # _source_parquet additionally BLOCKS a cache-missing scan on
        # its own park, so either way the disk sees one sequential
        # reader per file.
        park_store = _warmstore()
        if park_store is not None:
            for p in manifest.get("inputs", []):
                try:
                    park_store.park_path.remote(os.path.abspath(p))
                except Exception:
                    break
    if emit_warm:
        from .query import _warm_prof as _wpf

        _wpf(
            {
                "dir": "_driver",
                "setup_s": round(_tp1 - _tp0, 3),
                "units_s": round(_tp2 - _tp1, 3),
                "finalize_s": round(_time.perf_counter() - _tp2, 3),
            }
        )
    return manifest
