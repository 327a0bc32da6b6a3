"""Index build pipeline (segment mode): the distributed write path.

The reference's write path (/root/reference/fts-lmdb.go:509-523
``cmdInput``) is a single-threaded groupby(gram) with an in-memory
combine flushed in one LMDB transaction. The Ray-Data-native design
(SURVEY.md §3.1, §7.1) makes each *input partition* an independent
unit of work:

    partition rows --map_batches--> tokenize (vectorized, zero-copy
    Arrow in) --local groupby(term) (np.lexsort combine)--> encoded
    posting runs --> segment Parquet (terms + docs sidecar) -->
    atomic per-partition checkpoint

There is NO global shuffle in this mode: posting runs from different
partitions are doc-disjoint and are consolidated by the hierarchical
merge stage (pipelines/merge.py) or k-way-merged at query time —
LSM/Lucene-style. Hot-term skew therefore cannot blow up any single
task: a term's per-partition run is bounded by the partition's chunk
count. (The alternative salted groupby-term build lives in
build_shuffle.py; see SURVEY.md §4 for the tradeoff.)

Scale notes (100 TB / 10^12 files): partitions are parquet row-group
ranges (~100-500 MB of content each); each build task streams its row
groups, so peak memory is one partition's postings (~2-3x its text).
Resume skips checkpointed partitions, so a failed run redoes only
in-flight partitions. Doc ids are content-key hashes — no global
coordination, any partition order.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..state import manifest as mf
from ..stages.tokenize import tokenize_corpus_batch

TERMS_SCHEMA = pa.schema(
    [
        ("term", pa.int32()),
        ("n", pa.int64()),
        ("df", pa.int64()),
        # doc identity dictionary for this row's doc stream: "" means
        # the stream carries raw 63-bit hash-id gaps; "<pid>:<k>"
        # means it carries RANK gaps into the sorted doc set of
        # sub-part k of build partition <pid> (Lucene-style local doc
        # ids: rank gaps are 1-2 varint bytes vs 6-9 for hash gaps)
        ("dict", pa.string()),
        ("doc_blob", pa.large_binary()),
        ("chunk_blob", pa.large_binary()),
        ("tf_blob", pa.large_binary()),
        ("dl_blob", pa.large_binary()),
        ("bmax_tf_blob", pa.large_binary()),
        ("bmin_dl_blob", pa.large_binary()),
        ("bfirst_doc_blob", pa.large_binary()),
    ]
)


def validate_index(index_dir: str) -> dict:
    """Post-build validation: doc_id uniqueness across all docs
    sidecars (the hash-identity collision check promised by
    stages/tokenize.py:doc_id_for — replaces the reference's global
    OID allocator invariant). Distributed: Ray groupby over the
    doc_id column only."""
    manifest = mf.load_manifest(index_dir)
    paths = [os.path.join(index_dir, rel) for rel, _ in mf.docs_sources(manifest)]
    ds = ray.data.read_parquet(paths, columns=["doc_id"])
    counts = ds.groupby("doc_id").count()
    dup = counts.filter(lambda r: r["count()"] > 1).count()
    n = ds.count()
    return {"n_docs": n, "duplicate_doc_ids": int(dup), "ok": dup == 0}


def _pkg_root() -> str:
    """Directory containing the microfts_ray package (for worker
    sys.path bootstrap)."""
    import microfts_ray

    return os.path.dirname(os.path.dirname(os.path.abspath(microfts_ray.__file__)))


def plan_partitions(
    corpus_paths: list[str], target_rows_per_part: int = 4000
) -> list[dict]:
    """Deterministic build partitions = contiguous row-group ranges of
    input parquet files. Partition identity (pid) is stable across
    runs, which is what makes checkpoints addressable.
    """
    parts = []
    for path in sorted(corpus_paths):
        f = pq.ParquetFile(path)
        n_rg = f.metadata.num_row_groups
        rows = [f.metadata.row_group(i).num_rows for i in range(n_rg)]
        base = os.path.basename(path).rsplit(".", 1)[0]
        start = 0
        while start < n_rg:
            end, acc = start, 0
            while end < n_rg and (acc == 0 or acc + rows[end] <= target_rows_per_part):
                acc += rows[end]
                end += 1
            parts.append(
                {
                    "pid": f"{base}-rg{start:05d}-{end:05d}",
                    "path": path,
                    "rg_start": start,
                    "rg_end": end,
                    "num_rows": acc,
                }
            )
            start = end
    return parts


def _binary_col(blob: bytes, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy large_binary column: per-row slices of one buffer."""
    return pa.Array.from_buffers(
        pa.large_binary(),
        byte_offsets.size - 1,
        [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(blob)],
    )


def encode_partition_runs(
    entries: dict[str, np.ndarray],
    doc_dict: np.ndarray | None = None,
    dict_id: str = "",
    store_dl: bool = False,
) -> pa.Table:
    """Entries sorted by (term, doc_id, chunk_id) -> one encoded
    posting-run row per term (TERMS_SCHEMA).

    dl (chunk length) repeats for every posting of a chunk, so by
    default it is NOT stored in the posting stream (store_dl=False
    writes an empty dl_blob; readers gather dl from the docs
    sidecars' per-chunk `chunk_dl` lists instead — measured ~30% of
    the compressed shard bytes). dl is still consumed here for the
    per-block min-dl WAND bound. Old indexes with populated dl_blob
    decode unchanged.

    Fully vectorized: each stream is varint-encoded ONCE for the whole
    partition; per-term blobs are zero-copy slices via offset buffers
    (doc-gap deltas reset at term boundaries so every slice decodes
    independently). Per-block maxima come from a single global
    maximum.reduceat over all terms' block boundaries.

    With `doc_dict` (the partition's SORTED doc_id array) the doc and
    block-first-doc streams carry dictionary RANKS instead of raw
    hash ids — rank order equals doc order, so sorting/df/disjointness
    semantics are unchanged while gaps shrink to 1-2 bytes.
    """
    from ..functions.postings import BLOCK
    from ..functions.varint import encode_split_rows

    term = entries["term"]
    nrows = term.size
    if nrows == 0:
        return TERMS_SCHEMA.empty_table()
    t32 = term.astype(np.int32)
    bounds = np.nonzero(np.diff(t32))[0] + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [nrows]))
    ns = ends - starts

    if doc_dict is not None:
        if "doc_rank" in entries:
            # tokenize already ranked each entry against the sorted
            # doc set — reuse instead of an O(n log m) re-searchsorted
            doc = entries["doc_rank"].astype(np.uint64)
        else:
            doc = np.searchsorted(doc_dict, entries["doc_id"]).astype(np.uint64)
    else:
        doc = entries["doc_id"]
    gaps = np.empty(nrows, dtype=np.uint64)
    gaps[0] = doc[0]
    np.subtract(doc[1:], doc[:-1], out=gaps[1:])
    gaps[starts] = doc[starts]  # delta resets at each term boundary
    # df per term: distinct docs = new-doc flags summed per term
    new_doc = np.empty(nrows, dtype=np.int64)
    new_doc[0] = 1
    new_doc[1:] = (doc[1:] != doc[:-1]).astype(np.int64)
    new_doc[starts] = 1
    df = np.add.reduceat(new_doc, starts)

    def stream(vals: np.ndarray, row_starts: np.ndarray, row_ends: np.ndarray):
        blob, offsets = encode_split_rows(vals, row_starts, row_ends)
        return _binary_col(blob, offsets)

    tf = entries["tf"]
    dl = entries["dl"]
    # block boundaries: per term, blocks of BLOCK entries
    nblk = (ns + BLOCK - 1) // BLOCK
    blk_term = np.repeat(np.arange(ns.size), nblk)
    blk_offsets = np.zeros(ns.size + 1, dtype=np.int64)
    np.cumsum(nblk, out=blk_offsets[1:])
    intra = np.arange(blk_offsets[-1], dtype=np.int64) - np.repeat(
        blk_offsets[:-1], nblk
    )
    blk_start = starts[blk_term] + BLOCK * intra
    bmax_tf = np.maximum.reduceat(tf, blk_start)
    bmin_dl = np.minimum.reduceat(dl, blk_start)
    bfirst_doc = doc[blk_start]  # block skip index for selective decode

    if store_dl:
        dl_col = stream(dl, starts, ends)
    else:
        dl_col = _binary_col(b"", np.zeros(starts.size + 1, dtype=np.int64))
    return pa.table(
        {
            "term": pa.array(t32[starts], pa.int32()),
            "n": pa.array(ns, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "dict": pa.array([dict_id] * starts.size, pa.string()),
            "doc_blob": stream(gaps, starts, ends),
            "chunk_blob": stream(entries["chunk_id"], starts, ends),
            "tf_blob": stream(tf, starts, ends),
            "dl_blob": dl_col,
            "bmax_tf_blob": stream(bmax_tf, blk_offsets[:-1], blk_offsets[1:]),
            "bmin_dl_blob": stream(bmin_dl, blk_offsets[:-1], blk_offsets[1:]),
            "bfirst_doc_blob": stream(bfirst_doc, blk_offsets[:-1], blk_offsets[1:]),
        },
        schema=TERMS_SCHEMA,
    )


def group_partitions(parts: list[dict], n_blocks: int) -> list[dict]:
    """Group consecutive same-file partitions into per-task blocks.
    A block's pid is stable for a given plan, so resume works at block
    granularity. Sub-parts stay the tokenize/sort unit."""
    if not parts:
        return []
    per_task = max(1, round(len(parts) / n_blocks))
    blocks = []
    i = 0
    while i < len(parts):
        group = [parts[i]]
        j = i
        while (
            len(group) < per_task
            and j + 1 < len(parts)
            and parts[j + 1]["path"] == parts[i]["path"]
        ):
            j += 1
            group.append(parts[j])
        i = j + 1
        blocks.append(
            {
                "pid": group[0]["pid"]
                if len(group) == 1
                else f"{group[0]['pid']}-x{len(group)}",
                "path": group[0]["path"],
                "rg_start": group[0]["rg_start"],
                "rg_end": group[-1]["rg_end"],
                "num_rows": sum(g["num_rows"] for g in group),
                "sub_parts": group,
            }
        )
    return blocks


def _tokenize_ranges(
    part: dict, chunker: str, dict_id: str = "", sub: int = 0,
    store_dl: bool = False,
) -> tuple[pa.Table, pa.Table]:
    """Tokenize+encode one partition's row-group range; returns
    (terms table, docs table with src_rg lineage). Sized so the sort
    working set stays cache-resident (SURVEY.md §4 memory notes).
    Posting doc streams are rank-encoded against this range's sorted
    doc set (`dict_id`)."""
    f = pq.ParquetFile(part["path"])
    rgs = list(range(part["rg_start"], part["rg_end"]))
    tbl = f.read_row_groups(
        rgs, columns=["repo", "path", "commit", "lang", "content"]
    )
    entries, docs = tokenize_corpus_batch(tbl, chunker=chunker)
    doc_dict = np.sort(docs["doc_id"].to_numpy()) if dict_id else None
    terms_tbl = encode_partition_runs(
        entries, doc_dict=doc_dict, dict_id=dict_id, store_dl=store_dl
    )
    # lineage: which source row group each doc came from (query-side
    # chunk-text recovery re-reads only that row group, J3)
    rg_rows = [f.metadata.row_group(i).num_rows for i in rgs]
    src_rg = np.repeat(np.array(rgs, dtype=np.int32), rg_rows)
    docs = docs.append_column("src_rg", pa.array(src_rg, type=pa.int32()))
    # row position WITHIN the row group: text recovery reads only the
    # content column and takes rows by position — no id-column reads,
    # no per-row re-hashing (chunk_texts fast path)
    src_row = (
        np.concatenate([np.arange(n, dtype=np.int32) for n in rg_rows])
        if rg_rows
        else np.empty(0, dtype=np.int32)
    )
    docs = docs.append_column("src_row", pa.array(src_row, type=pa.int32()))
    docs = docs.append_column(
        "sub", pa.array(np.full(docs.num_rows, sub, dtype=np.int32), pa.int32())
    )
    docs = docs.append_column(
        "src_path", pa.array([part["path"]] * docs.num_rows, pa.string())
    )
    return terms_tbl, docs


def build_partition(
    part: dict, index_dir: str, chunker: str = "lines", store_dl: bool = False
) -> dict:
    """Build one partition's segment; idempotent and atomic.

    Returns the checkpoint entry (also persisted under _manifest/).
    A partition may carry `sub_parts`: several tokenize-sized
    row-group ranges whose encoded rows are written as ONE segment
    file (rows re-sorted by term so parquet stats still prune) — this
    keeps sort working sets cache-sized without exploding the segment
    file count that the merge stage must open.
    """
    existing = mf.read_part_checkpoint(index_dir, part["pid"])
    if existing is not None:
        existing["resumed"] = True
        return existing

    t0 = time.perf_counter()
    subs = part.get("sub_parts") or [part]
    term_tables, doc_tables = [], []
    for k, sub in enumerate(subs):
        t_tbl, d_tbl = _tokenize_ranges(
            sub, chunker, dict_id=f"{part['pid']}:{k}", sub=k, store_dl=store_dl
        )
        term_tables.append(t_tbl)
        doc_tables.append(d_tbl)
    terms_tbl = pa.concat_tables(term_tables)
    if len(term_tables) > 1 and terms_tbl.num_rows:
        order = np.argsort(terms_tbl["term"].to_numpy(), kind="stable")
        terms_tbl = terms_tbl.take(pa.array(order))
    docs = pa.concat_tables(doc_tables)

    seg_dir = os.path.join(index_dir, "segments", part["pid"])
    os.makedirs(seg_dir, exist_ok=True)
    tmp_tag = uuid.uuid4().hex[:8]
    for name, out_tbl in (("terms", terms_tbl), ("docs", docs)):
        tmp = os.path.join(seg_dir, f".{name}.{tmp_tag}.tmp")
        # small row groups + stats: term-range pruning for point
        # lookups AND for the merge stage (a merge shard reads ~1/M of
        # each segment instead of whole row groups)
        # segments stay lz4: they are BUILD-stage artifacts read once
        # by the merge, and zstd here measurably cuts low-cpu build
        # throughput (compression cpu). The MERGED serving shards are
        # zstd-3 (merge.py) — those are what warmup re-reads from the
        # cache-starved disk.
        comp = "lz4" if name == "terms" else "zstd"
        pq.write_table(out_tbl, tmp, row_group_size=512, compression=comp)
        os.replace(tmp, os.path.join(seg_dir, f"{name}.parquet"))

    entry = {
        "pid": part["pid"],
        "lineage": {
            "input_path": part["path"],
            "rg_start": part["rg_start"],
            "rg_end": part["rg_end"],
            "num_rows": part["num_rows"],
        },
        "segment": {
            "terms": f"segments/{part['pid']}/terms.parquet",
            "docs": f"segments/{part['pid']}/docs.parquet",
        },
        "stats": {
            "n_docs": int(docs.num_rows),
            "n_chunks": int(pa.compute.sum(docs["n_chunks"]).as_py() or 0),
            "sum_dl": int(pa.compute.sum(docs["sum_dl"]).as_py() or 0),
            "n_terms": int(terms_tbl.num_rows),
            "n_postings": int(pa.compute.sum(terms_tbl["n"]).as_py() or 0),
            "build_sec": round(time.perf_counter() - t0, 4),
        },
    }
    mf.write_part_checkpoint(index_dir, part["pid"], entry)
    return entry


def build_index(
    corpus_paths: list[str],
    index_dir: str,
    *,
    chunker: str = "lines",
    target_rows_per_part: int = 4000,
    concurrency: int | None = None,
    n_blocks: int | None = None,
) -> dict:
    """Build (or resume) the full index; commits manifest.json.

    Orchestrated as a Ray Data pipeline over partition descriptors:
    the streaming executor schedules one task per partition with
    backpressure; per-partition outputs are self-checkpointing, so a
    re-run after failure skips completed partitions.
    """
    parts = plan_partitions(corpus_paths, target_rows_per_part)
    # group tokenize-sized partitions into per-task segment blocks:
    # sorts stay cache-resident (small sub-parts) while segment-file
    # count and task-dispatch overhead stay low (few blocks)
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n_cpus = 8
    blocks = group_partitions(
        parts, n_blocks if n_blocks else max(1, min(len(parts), n_cpus * 4))
    )
    ds = ray.data.from_items(blocks, override_num_blocks=len(blocks))
    pkg_root = _pkg_root()

    def run_part(batch: dict) -> dict:
        # self-bootstrapping closure: Ray workers don't share the
        # driver's sys.path, so the task inserts the package root and
        # imports there (cloudpickle ships this nested fn by value)
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        import numpy as _np

        from microfts_ray.pipelines.build import build_partition as bp

        def clean(obj):
            if isinstance(obj, _np.integer):
                return int(obj)
            if isinstance(obj, (list, _np.ndarray)):
                return [clean(x) for x in obj]
            if isinstance(obj, dict):
                return {k: clean(v) for k, v in obj.items()}
            return obj

        entries = []
        for i in range(len(batch["pid"])):
            part = clean(
                {
                    kk: batch[kk][i]
                    for kk in ("pid", "path", "rg_start", "rg_end", "num_rows",
                               "sub_parts")
                    if kk in batch
                }
            )
            entries.append(bp(part, index_dir, chunker))
        return {
            "pid": [e["pid"] for e in entries],
            "n_docs": [e["stats"]["n_docs"] for e in entries],
            "n_postings": [e["stats"]["n_postings"] for e in entries],
            "resumed": [bool(e.get("resumed")) for e in entries],
        }

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    # each task builds its block's partitions sequentially, one
    # checkpointed segment per partition
    ds.map_batches(run_part, batch_size=None, num_cpus=1, **kwargs).materialize()

    # assemble + commit the generation manifest from the checkpoints
    entries = []
    for part in blocks:
        e = mf.read_part_checkpoint(index_dir, part["pid"])
        if e is None:
            raise RuntimeError(f"partition {part['pid']} missing checkpoint")
        entries.append(e)
    agg = {
        k: int(sum(e["stats"][k] for e in entries))
        for k in ("n_docs", "n_chunks", "sum_dl", "n_terms", "n_postings")
    }
    manifest = {
        "version": 2,
        "blob_format": "split2-dict",
        # sidecar-dl: posting rows carry no dl stream; dl lives in
        # the docs sidecars' chunk_dl lists. An index keeps ONE
        # layout for life — apply_update consults this flag so delta
        # partitions of a pre-sidecar index keep storing dl in-stream
        # (a mixed-layout shard table would be undecodable)
        "dl_layout": "sidecar",
        "chunker": chunker,
        "partitions": [
            {k: e[k] for k in ("pid", "lineage", "segment", "stats")} for e in entries
        ],
        "global": {
            **agg,
            "avgdl": (agg["sum_dl"] / agg["n_chunks"]) if agg["n_chunks"] else 0.0,
        },
        "inputs": sorted(corpus_paths),
    }
    mf.commit_manifest(index_dir, manifest)
    return manifest
