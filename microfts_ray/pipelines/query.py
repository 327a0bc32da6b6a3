"""Query engine: the distributed read path.

Mirrors the reference's two-phase search (/root/reference/
fts-lmdb.go:1046-1081: gram candidates are a SUPERSET -> verify
against real chunk text) over the segment layout that build.py
writes. All kernels are vectorized numpy over decoded posting runs
(functions/setops.py); BM25 semantics are bit-identical to the
pure-Python oracle (oracle.py) — floats are accumulated in sorted
(term, doc, chunk) order so results are rank- and score-identical at
any parallelism or partition count.

Serving design: an `IndexReader` holds the manifest, a per-segment
term directory (term, n, df — at most 50,653 rows/segment, tiny) and
a posting-blob cache. Reading a term's postings prunes parquet row
groups via the directory, so a query touches only the row groups
containing its terms. For cluster serving, wrap IndexReader in an
actor pool (`QueryActor` below) — each actor mmaps/caches hot
segments; the driver fans queries out round-robin.
"""

from __future__ import annotations

import math
import re
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.grams import gram_set
from ..functions.postings import PostingRun
from ..functions.setops import (
    group_sum,
    pair_group_sum,
    pair_isin,
    pair_lookup,
    pair_unique,
)
from ..oracle import K1, B, group_name, has_arg
from ..state import manifest as mf
from ..stages.tokenize import split_lines

_EMPTY_RUN = PostingRun(
    np.empty(0, dtype=np.uint64),
    np.empty(0, dtype=np.uint64),
    np.empty(0, dtype=np.uint64),
    np.empty(0, dtype=np.uint64),
)

# result schemas for the search modes: hits stay Arrow tables end to
# end (reader -> actor return -> driver); the CLI converts only the
# rows it prints (round-5: the list[dict] contract was an unbounded
# single-process driver materialization — ~1.12M dicts on the bench's
# broad fuzzy query)
HITS_SCHEMA = pa.schema(
    [
        ("group", pa.string()),
        ("doc_id", pa.int64()),
        ("chunk_id", pa.int64()),
        ("line", pa.int64()),
        ("offset", pa.int64()),
        ("text", pa.string()),
    ]
)
FUZZY_SCHEMA = pa.schema(
    [
        ("group", pa.string()),
        ("doc_id", pa.int64()),
        ("chunk_id", pa.int64()),
        ("line", pa.int64()),
        ("percent", pa.float64()),
        ("text", pa.string()),
    ]
)

# entries per warm-decode slice: small enough that the in-call decode
# deadline (_warm_table_slices) overruns by well under a second even
# inside a 30x bandwidth collapse, large enough that per-slice
# overhead is noise at healthy bandwidth
_WARM_SLICE_ENTRIES = 131_072


def _warm_tasks_env(default: int = 6) -> int:
    """MICROFTS_WARM_TASKS, hardened for the query hot path: a
    malformed value must not raise out of bm25_topk, and 0/negative
    would silently produce an empty fan-out (no warm at all, worse
    than inline) — clamp to >= 1."""
    import os

    try:
        v = int(os.environ.get("MICROFTS_WARM_TASKS", str(default)))
    except ValueError:
        return default
    return max(1, v)


def _idf_val(n_chunks: int, df: int) -> float:
    """BM25 idf — module-level so the compact warm cache's load-time
    contrib recompute and IndexReader._idf are literally the same
    code (bit-identity is a hard contract, oracle.py:44-52)."""
    return math.log(1.0 + (n_chunks - df + 0.5) / (df + 0.5))


def _contrib_arr(
    w: float, tf: np.ndarray, dl: np.ndarray, avgdl: float
) -> np.ndarray:
    # in-place pipeline, BIT-IDENTICAL to the reference expression
    #   norm = K1 * (1 - B + B * (dl / avgdl))
    #   w * (tf * (K1 + 1)) / (tf + norm)
    # (every op keeps the same operands/order; IEEE + is
    # commutative, so norm + tf == tf + norm bitwise) — the naive
    # form allocated five 8B temporaries per posting, a measured
    # warmup tax at 10^8 postings. Elementwise over any integer
    # dtype: uint16 and uint64 inputs convert to the same f64 values,
    # which is what makes the compact (tf, dl) warm layout's
    # load-time recompute exact.
    tf = tf.astype(np.float64)
    norm = dl.astype(np.float64)
    if avgdl:
        norm /= avgdl
    else:
        norm *= 0.0
    norm *= B
    norm += 1 - B
    norm *= K1
    norm += tf  # == tf + norm
    num = tf
    num *= K1 + 1
    num *= w  # == w * (tf * (K1+1)): float mult is commutative
    num /= norm
    return num


def _hydrate_contribs(
    meta: dict, tf: np.ndarray, dl: np.ndarray, n_chunks: int, avgdl: float
) -> np.ndarray:
    """Exact f64 contribs for a COMPACT (fmt 2) warm dir: per-term
    idf from the offset directory (df == the term's posting count),
    then the shared elementwise kernel over the term's slice. Output
    is bit-identical to the fmt-1 contribs the emitter used to park,
    because _warm_finalize computed them with the very same
    (_idf_val, _contrib_arr) on the same integer tf/dl values —
    elementwise, so pre- vs post-sort application cannot differ."""
    offs = np.asarray(meta["offsets"], dtype=np.int64)
    out = np.empty(int(offs[-1]) if offs.size else 0, dtype=np.float64)
    for i in range(offs.size - 1):
        s, e = int(offs[i]), int(offs[i + 1])
        out[s:e] = _contrib_arr(
            _idf_val(n_chunks, e - s), tf[s:e], dl[s:e], avgdl
        )
    return out


class _DocMeta:
    """Doc metadata as doc_id-sorted parallel arrays: numpy ids for
    searchsorted lookup, Arrow string columns (zero Python objects
    held) read lazily per lookup."""

    __slots__ = (
        "ids", "src_rg", "src_row", "repo", "path", "commit", "src_path",
        "path_codes", "path_list",
    )

    def __init__(self, ids, src_rg, src_row, repo, path, commit, src_path):
        self.ids = ids
        self.src_rg = src_rg
        self.src_row = src_row  # row position within src_rg; -1 = unknown
        self.repo = repo
        self.path = path
        self.commit = commit
        self.src_path = src_path
        # integer source-path codes: scan planning groups millions of
        # candidate rows by source file — int compares, not object strs
        import pyarrow.compute as pc

        enc = pc.dictionary_encode(src_path)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        self.path_codes = np.asarray(enc.indices, dtype=np.int64)
        self.path_list = enc.dictionary.to_pylist()

    def index_of(self, doc_id: int) -> int:
        i = int(np.searchsorted(self.ids, np.uint64(doc_id)))
        if i >= self.ids.size or self.ids[i] != np.uint64(doc_id):
            raise KeyError(doc_id)
        return i

    def indices_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """Vectorized lookup; raises KeyError on any miss."""
        q = doc_ids.astype(np.uint64, copy=False)
        idx = np.searchsorted(self.ids, q)
        idx = np.minimum(idx, self.ids.size - 1)
        if not (self.ids[idx] == q).all():
            raise KeyError("unknown doc_id in lookup")
        return idx


class _Segment:
    """One build partition's terms/docs files + lazy caches. With
    `buf` (plasma-parked file bytes from the warm store), the parquet
    opens over shared memory — immune to the page-cache reclaimer
    that turns re-reads of just-written index files into a disk
    crawl; the path stays the restart fallback."""

    def __init__(self, index_dir: str, entry: dict, buf=None):
        import os

        self.entry = entry
        self.terms_path = os.path.join(index_dir, entry["segment"]["terms"])
        docs_rel = entry["segment"].get("docs")  # merged shards have no docs sidecar
        self.docs_path = os.path.join(index_dir, docs_rel) if docs_rel else None
        self._pf = pq.ParquetFile(
            pa.BufferReader(pa.py_buffer(buf))
            if buf is not None
            else self.terms_path
        )
        # term directory: sorted term ids + (n, df) + row index
        dir_tbl = self._pf.read(columns=["term", "n", "df"])
        self.terms = dir_tbl["term"].to_numpy()
        self.ns = dir_tbl["n"].to_numpy()
        self.dfs = dir_tbl["df"].to_numpy()
        self._rg_offsets = np.cumsum(
            [0]
            + [
                self._pf.metadata.row_group(i).num_rows
                for i in range(self._pf.metadata.num_row_groups)
            ]
        )
        self._slice_cache: dict[int, pa.Table | None] = {}
        self._docs_tbl: pa.Table | None = None

    def term_slice(self, term: int) -> pa.Table | None:
        """All posting-run rows for a term as an ARROW SLICE (no
        Python-bytes copies; rewrite-merged shards hold one row,
        stack-merged shards / salted shuffle segments may hold many).
        Row groups in the span are read once each."""
        if term in self._slice_cache:
            return self._slice_cache[term]
        lo = int(np.searchsorted(self.terms, term, side="left"))
        hi = int(np.searchsorted(self.terms, term, side="right"))
        if hi == lo:
            self._slice_cache[term] = None
            return None
        rg_lo = int(np.searchsorted(self._rg_offsets, lo, side="right") - 1)
        rg_hi = int(np.searchsorted(self._rg_offsets, hi - 1, side="right") - 1)
        tbl = self._pf.read_row_groups(list(range(rg_lo, rg_hi + 1)))
        base = int(self._rg_offsets[rg_lo])
        # combine_chunks COPIES the slice into fresh buffers: a plain
        # slice would pin every read row group's full buffers in the
        # cache for the reader's lifetime
        sl = tbl.slice(lo - base, hi - lo).combine_chunks()
        self._slice_cache[term] = sl
        return sl

    def docs(self) -> pa.Table:
        if self._docs_tbl is None:
            self._docs_tbl = pq.read_table(self.docs_path)
        return self._docs_tbl


class IndexReader:
    """Loads an index generation and serves queries.

    Cite: read-path parity with cmdSearch/findCandidates
    (/root/reference/fts-lmdb.go:1046-1165).
    """

    def __init__(
        self,
        index_dir: str,
        cache_entries: int = 150_000_000,
        vec_budget: int = 6 << 30,
        add32_budget: int | None = None,
    ):
        self.index_dir = index_dir
        self.manifest = mf.load_manifest(index_dir)
        # plasma-parked index file bytes (merged shards + docs
        # sidecars, parked at merge time): ONE batched store RPC, then
        # every parquet open below is a zero-copy shared-memory read
        self._file_buffers = self._fetch_file_buffers()
        # build-partition segments are LAZY: a merged reader serves
        # every query from the term-range shards and never opens them
        # — eagerly constructing ~N_partitions segment objects read
        # each one's term directory from (reclaimed) disk at every
        # reader construction, a measured multi-second setup tax paid
        # by the merge driver, every emit actor, and every serving
        # process
        self._segments: list[_Segment] | None = None
        # prefer merged term-range shards (pipelines/merge.py): one
        # posting run per term instead of one per build partition
        merged = self.manifest.get("merged")
        if merged:
            self.n_shards = merged["n_shards"]
            self.shards = [self._make_segment(e) for e in merged["shards"]]
            self._shard_bounds = np.array(merged["bounds"], dtype=np.int64)
            # ultra-hot terms split by doc range into their own
            # sub-shards (merge.write_hot_term_shards): routed here,
            # never through the term-range bounds
            self.hot_segments: dict[int, list[_Segment]] = {}
            for e in merged.get("hot", []):
                self.hot_segments.setdefault(int(e["term"]), []).append(
                    self._make_segment(e)
                )
        else:
            self.n_shards = 0
            self.shards = []
            self._shard_bounds = None
            self.hot_segments = {}
        g = self.manifest["global"]
        self.n_chunks = g["n_chunks"]
        self.n_docs = g["n_docs"]
        self.avgdl = g["sum_dl"] / g["n_chunks"] if g["n_chunks"] else 0.0
        self.doc_avgdl = g["sum_dl"] / g["n_docs"] if g["n_docs"] else 0.0
        self._doc_meta: _DocMeta | None = None
        self._content_cache: dict[int, str] = {}
        self._content_chars = 0  # bounded: cleared past the cap
        self._content_chars_cap = 1 << 31
        # decoded-run LRU (hot grams dominate query cost)
        self._run_cache: dict[int, PostingRun] = {}
        self._run_cache_entries = 0
        self._run_cache_cap = cache_entries
        # dense scoring state (built lazily): sorted doc ids + stride
        self._dense: tuple[np.ndarray, int] | None = None
        self._dense_keys: dict[int, np.ndarray] = {}
        self._contrib_cache: dict[int, np.ndarray] = {}
        # dense per-term score vectors (hot-term fast path)
        self._vec_cache: dict[int, np.ndarray] = {}
        self._vec_bytes = 0
        # per-term (int32 keys, f32 contribs) for the vector-less
        # accumulator add (see _add_keys32/_add_c32)
        self._add32_cache: dict[int, np.ndarray] = {}
        self._addc32_cache: dict[int, np.ndarray] = {}
        self._add32_bytes = 0
        # PER-READER budget, like _vec_budget below: a pool must
        # divide the host budget by its actor count (QueryService
        # does) — these derived copies are private per process,
        # unlike the plasma-shared sorted_kc pages they come from
        if add32_budget is None:
            import os as _os

            add32_budget = int(
                _os.environ.get("MICROFTS_ADD32_BYTES", str(1 << 30))
            )
        self._add32_budget = add32_budget
        self._vec_min = _vec_min_default()  # vector when a term has >= this many postings
        # bytes of dense f32 vectors to hold — PER READER, so a pool
        # must divide the host budget by its actor count (QueryService
        # does); vectors are private, only sorted_kc pages are shared
        self._vec_budget = vec_budget
        # per-term (sorted dense keys, aligned f64 contribs): the warm
        # representation — powers dense scoring, counting intersection
        # and the exact-rescore gather without holding raw runs
        self._sorted_kc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._term_len_cache: dict[int, int] = {}
        # block-max WAND admission counters (observability + tests)
        self.blocks_admit_total = 0
        self.blocks_admit_skipped = 0
        # tombstones (pipelines/update.py): docs deleted but not yet
        # compacted away; every query path anti-joins them (X4,
        # fts-lmdb.go:1151-1162)
        self._tombstones = np.array(
            sorted(self.manifest.get("tombstones", [])), dtype=np.uint64
        )
        # doc dictionaries for rank-encoded posting streams
        self._dict_arrays: dict[str, np.ndarray] = {}
        self._pid_docs = {
            p["pid"]: p["segment"].get("docs")
            for p in self.manifest["partitions"]
            if p["segment"].get("docs")
        }

    def _make_segment(self, e: dict) -> "_Segment":
        import os

        return _Segment(
            self.index_dir,
            e,
            buf=self._file_buffers.get(
                os.path.abspath(
                    os.path.join(self.index_dir, e["segment"]["terms"])
                )
            ),
        )

    @property
    def segments(self) -> "list[_Segment]":
        """Build-partition segments, constructed on first use (see
        __init__ — merged readers never need them)."""
        if self._segments is None:
            self._segments = [
                self._make_segment(e) for e in self.manifest["partitions"]
            ]
        return self._segments

    def _fetch_file_buffers(self) -> dict:
        """One batched warm-store RPC for every index file this reader
        may open (terms + docs sidecars): {abspath: plasma-backed
        uint8 view}. Empty without a live store — opens then fall back
        to storage exactly as before. The parked hot layer makes
        serving reads reclaimer-proof: this box evicts just-written
        index files within seconds, and a first-pass rare-gram decode
        against evicted shards crawled a 10-20 MB/s disk (r3)."""
        import os

        store = _warmstore()
        if store is None:
            return {}
        paths = []
        for p in self.manifest["partitions"]:
            paths.append(os.path.join(self.index_dir, p["segment"]["terms"]))
            if p["segment"].get("docs"):
                paths.append(
                    os.path.join(self.index_dir, p["segment"]["docs"])
                )
        merged = self.manifest.get("merged")
        if merged:
            for e in merged["shards"]:
                paths.append(
                    os.path.join(self.index_dir, e["segment"]["terms"])
                )
            for e in merged.get("hot", []):
                paths.append(
                    os.path.join(self.index_dir, e["segment"]["terms"])
                )
        paths = sorted({os.path.abspath(p) for p in paths})
        import ray as _ray

        try:
            refs = _ray.get(store.file_refs.remote(paths))
        except Exception:
            return {}
        out = {}
        for p, ent in zip(paths, refs):
            if ent is None:
                continue
            ref, nbytes = ent
            try:
                # staleness guard: a file rewritten OUTSIDE the parking
                # writers (size changed) must not serve old bytes
                if os.path.getsize(p) != nbytes:
                    continue
                out[p] = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            except OSError:
                # file deleted on disk but parked: plasma copy is the
                # only copy — keep serving it (reclaimer defense)
                out[p] = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            except Exception:
                continue
        return out

    def _read_index_table(self, rel: str, columns=None) -> pa.Table:
        """Read an index-relative parquet, preferring the plasma-parked
        bytes over storage."""
        import os

        path = os.path.abspath(os.path.join(self.index_dir, rel))
        buf = self._file_buffers.get(path)
        if buf is not None:
            return pq.read_table(
                pa.BufferReader(pa.py_buffer(buf)), columns=columns
            )
        return pq.read_table(path, columns=columns)

    # -- posting access ----------------------------------------------------
    def _term_sources(self, term: int) -> list[_Segment]:
        if self.shards:
            hot = self.hot_segments.get(term)
            if hot is not None:
                return hot
            i = int(np.searchsorted(self._shard_bounds, term, side="right")) - 1
            return [self.shards[min(max(i, 0), self.n_shards - 1)]]
        return self.segments

    def _all_term_sources(self) -> list[_Segment]:
        """Every posting source: term-range shards + hot-term
        sub-shards (or raw segments when unmerged)."""
        if not self.shards:
            return self.segments
        out = list(self.shards)
        for segs in self.hot_segments.values():
            out.extend(segs)
        return out

    def _resolve_dict(self, dict_id: str) -> np.ndarray:
        """dict_id '<pid>:<k>' -> that sub-part's sorted doc_id array
        (posting doc streams are rank-encoded against it)."""
        arr = self._dict_arrays.get(dict_id)
        if arr is None:
            import os

            pid, _, sub = dict_id.rpartition(":")
            rel = self._pid_docs.get(pid)
            if rel is None:
                raise KeyError(f"unknown doc dictionary {dict_id!r}")
            t = self._read_index_table(rel, columns=["doc_id", "sub"])
            ids = t["doc_id"].to_numpy()
            subs = t["sub"].to_numpy()
            for k in np.unique(subs):
                a = np.sort(ids[subs == k])
                self._dict_arrays[f"{pid}:{int(k)}"] = a.astype(np.uint64)
            arr = self._dict_arrays[dict_id]
        return arr

    def term_runs(self, term: int) -> list[PostingRun]:
        """Decoded PostingRuns for a term: per-row decode over
        ZERO-COPY Arrow buffer views (no Python-bytes copies — on this
        memory-bus-bound path every avoided copy counts)."""
        from ..functions.varint import decode_array_split

        runs = []
        for seg in self._term_sources(term):
            sl = seg.term_slice(term)
            if sl is None or sl.num_rows == 0:
                continue
            ns = sl["n"].to_numpy()
            dict_ids = (
                sl["dict"].to_pylist() if "dict" in sl.column_names
                else [""] * sl.num_rows
            )
            views = {}
            for name in ("doc_blob", "chunk_blob", "tf_blob", "dl_blob"):
                col = sl[name]
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                    arr.offset : arr.offset + len(arr) + 1
                ]
                data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                views[name] = (data, offs)
            for i in range(sl.num_rows):
                n = int(ns[i])
                if n == 0:
                    continue

                def stream(name: str) -> np.ndarray:
                    data, offs = views[name]
                    return decode_array_split(data[offs[i] : offs[i + 1]], n)

                doc = np.cumsum(stream("doc_blob"), dtype=np.uint64)
                if dict_ids[i]:
                    doc = self._resolve_dict(dict_ids[i])[doc.astype(np.int64)]
                chunk = stream("chunk_blob")
                dl_data, dl_offs = views["dl_blob"]
                if dl_offs[i + 1] > dl_offs[i]:
                    dls = stream("dl_blob")
                else:  # sidecar-dl layout: gather per-chunk dl
                    dls = self._chunk_dls(doc, chunk)
                runs.append(PostingRun(doc, chunk, stream("tf_blob"), dls))
        return runs

    def term_postings(self, term: int) -> PostingRun:
        """A term's postings as ONE PostingRun. Doc-disjoint runs are
        concatenated WITHOUT re-sorting: every query kernel is either
        order-independent (dense bincount — one add per pair per term)
        or sorts internally (pair_unique / pair_isin / pair_lookup /
        pair_group_sum), so the expensive per-term k-way merge is
        never needed for correctness. Deterministic scores hold
        because each (pair, term) contributes exactly one addition in
        ascending-term order regardless of within-term layout."""
        cached = self._run_cache.get(term)
        if cached is not None:
            return cached
        runs = self.term_runs(term)
        if not runs:
            run = _EMPTY_RUN
        elif len(runs) == 1:
            run = runs[0]
        else:
            run = PostingRun(
                np.concatenate([r.doc_ids for r in runs]),
                np.concatenate([r.chunk_ids for r in runs]),
                np.concatenate([r.tfs for r in runs]),
                np.concatenate([r.dls for r in runs]),
            )
        n = len(run)
        if n and self._run_cache_entries + n <= self._run_cache_cap:
            self._run_cache[term] = run
            self._run_cache_entries += n
        return run

    def _chunk_dl_space(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(sorted doc_ids, span base, flat per-chunk dl) — the dl
        lookup for the sidecar-dl posting layout. Independent of the
        dense-accumulator cap; at true scale a serving shard holds
        only its doc range's slice."""
        if not hasattr(self, "_chunk_dl_cache"):
            from ..functions.postings import build_chunk_dl_space

            ids, spans, dls = [], [], []
            for _si, d in self._docs_tables():
                if "chunk_dl" not in d.column_names:
                    # pre-sidecar generation: those docs' postings
                    # carry dl in-stream and never consult this space
                    continue
                ids.append(d["doc_id"].to_numpy().astype(np.uint64))
                span_col = "chunk_span" if "chunk_span" in d.column_names else "n_chunks"
                spans.append(d[span_col].to_numpy().astype(np.int64))
                col = d["chunk_dl"]
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                dls.append(arr.flatten().to_numpy(zero_copy_only=False))
            self._chunk_dl_cache = build_chunk_dl_space(ids, spans, dls)
        return self._chunk_dl_cache

    def _chunk_dls(self, doc_ids: np.ndarray, chunk_ids: np.ndarray) -> np.ndarray:
        """Per-pair dl gather from the sidecar chunk-dl space. Raises
        on any miss — a silent wrong-dl would corrupt BM25 scores
        undetectably (same contract as _DocMeta.indices_of)."""
        from ..functions.postings import gather_chunk_dls

        return gather_chunk_dls(self._chunk_dl_space(), doc_ids, chunk_ids)

    def _pairs_tfdl(
        self, g: int, d: np.ndarray, c: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(tf, dl, found) for candidate (doc, chunk) pairs of a term.

        Cached runs use the in-memory pair_lookup; otherwise the BLOCK
        SKIP-INDEX path: per run, the stored per-block first-doc
        array locates the <=k blocks that can contain the candidates,
        and only those 128-entry blocks decode (the whole point of the
        bfirst_doc/bmax metadata) — a hot term's multi-million-entry
        run is never fully decoded for a k-candidate gather."""
        from ..functions.postings import BLOCK, decode_run_blocks

        tf = np.zeros(d.size, dtype=np.uint64)
        dl = np.zeros(d.size, dtype=np.uint64)
        found = np.zeros(d.size, dtype=bool)
        run = self._run_cache.get(g)
        if run is not None:
            idx = pair_lookup(d, c, run.doc_ids, run.chunk_ids)
            hit = idx >= 0
            tf[hit] = run.tfs[idx[hit]]
            dl[hit] = run.dls[idx[hit]]
            return tf, dl, hit
        from ..functions.varint import decode_array_split

        for seg in self._term_sources(g):
            sl = seg.term_slice(g)
            if sl is None or sl.num_rows == 0:
                continue
            rows = sl.to_pylist()
            for row in rows:
                n = int(row["n"])
                if n == 0:
                    continue
                nblk = (n + BLOCK - 1) // BLOCK
                bfirst = decode_array_split(row["bfirst_doc_blob"], nblk)
                did = row.get("dict", "")
                if did:
                    lookup = self._resolve_dict(did)
                    pos = np.minimum(
                        np.searchsorted(lookup, d), lookup.size - 1
                    )
                    present = lookup[pos] == d
                    cand_val = pos.astype(np.uint64)  # ranks in stream space
                else:
                    present = np.ones(d.size, dtype=bool)
                    cand_val = d
                if not present.any():
                    continue
                cv = cand_val[present]
                # a doc can span several blocks (bfirst repeats): take
                # the full [lo..hi] block range per candidate
                lo = np.maximum(
                    np.searchsorted(bfirst, cv, side="left").astype(np.int64) - 1, 0
                )
                hi = np.maximum(
                    np.searchsorted(bfirst, cv, side="right").astype(np.int64) - 1, 0
                )
                spans = hi - lo + 1
                offs = np.arange(int(spans.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(spans) - spans, spans
                )
                blocks = np.unique(np.repeat(lo, spans) + offs)
                bdoc, bchunk, btf, bdl = decode_run_blocks(row, blocks)
                if did:
                    bdoc = lookup[bdoc.astype(np.int64)]
                if len(row.get("dl_blob", b"")) == 0:
                    bdl = self._chunk_dls(bdoc, bchunk)  # sidecar-dl layout
                idx = pair_lookup(d, c, bdoc, bchunk)
                hit = idx >= 0
                tf[hit] = btf[idx[hit]]
                dl[hit] = bdl[idx[hit]]
                found |= hit
        return tf, dl, found

    def chunk_df(self, term: int) -> int:
        """Chunks containing term (the chunk-level df) = sum of run ns."""
        total = 0
        for seg in self._term_sources(term):
            lo, hi = _span(seg.terms, term)
            total += int(seg.ns[lo:hi].sum())
        return total

    def doc_df(self, term: int) -> int:
        """Docs containing term; runs are doc-disjoint so dfs sum."""
        total = 0
        for seg in self._term_sources(term):
            lo, hi = _span(seg.terms, term)
            total += int(seg.dfs[lo:hi].sum())
        return total

    def _warmcache_dir(self) -> str:
        """CONTENT-ADDRESSED cache directory: keys/contribs/meta live
        under warmcache/<manifest_sha>/ so a generation-B writer can
        never interleave files with a generation-A reader (the three
        separate atomic renames of the flat layout could)."""
        import os

        return os.path.join(self.index_dir, "warmcache", self._manifest_sha())

    def _manifest_sha(self) -> str:
        import hashlib
        import json

        return hashlib.blake2b(
            json.dumps(self.manifest, sort_keys=True).encode(), digest_size=8
        ).hexdigest()

    def _load_warmcache(
        self,
        term_range: tuple[int, int] | None = None,
        min_entries: int | None = None,
    ) -> bool:
        """mmap a persisted warm set (sorted keys + contribs per hot
        term) written by a previous prewarm(persist=True) or by the
        merge's emit_warm_cache (sharded layout). Loading is
        page-table work, not reads: on one node every serving actor
        SHARES the cached pages, so an N-actor pool holds ONE copy of
        the hot set instead of N (the round-1 pool's flaw). With
        term_range, only terms in [lo, hi) are loaded (and in the
        sharded layout only the intersecting shard files are opened) —
        the term-range serving tier's 1/N warm."""
        import json
        import os

        d = self._warmcache_dir()
        sha = self._manifest_sha()
        store = _warmstore()

        def disjoint(meta: dict) -> bool:
            return (
                term_range is not None
                and "lo" in meta
                and (
                    meta["hi"] <= term_range[0]
                    or meta["lo"] >= term_range[1]
                )
            )

        def fill(meta: dict, keys, contribs) -> bool:
            if meta.get("manifest_sha") != sha:
                return False  # stale cache from an older generation
            if disjoint(meta):
                return True  # disjoint shard: nothing to load
            offs = np.array(meta["offsets"], dtype=np.int64)
            for i, t in enumerate(meta["terms"]):
                t = int(t)
                if term_range is not None and not (
                    term_range[0] <= t < term_range[1]
                ):
                    continue
                sl = slice(offs[i], offs[i + 1])
                self._sorted_kc[t] = (keys[sl], contribs[sl])
                self._term_len_cache[t] = int(offs[i + 1] - offs[i])
            return True

        def load_one(dd: str) -> bool:
            # object-store fast path: same-session emissions parked the
            # arrays in plasma (tmpfs) — zero-copy views, immune to the
            # page-cache reclaimer, one physical copy per node
            if store is not None:
                import ray as _ray

                def deref(x):
                    # _owner-put refs AUTO-RESOLVE when returned nested
                    # from the actor (zero-copy plasma views, measured
                    # writeable=False/owndata=False); actor-internal
                    # puts come back as refs — accept both shapes
                    return _ray.get(x) if isinstance(x, _ray.ObjectRef) else x

                try:
                    ent = _ray.get(store.get_dir.remote(dd))
                except Exception:
                    ent = None
                if ent is not None:
                    meta, kref, cref, vrefs = ent
                    if meta.get("manifest_sha") == sha:
                        if disjoint(meta):
                            return True  # skip WITHOUT hydrating
                        payload = deref(cref)
                        if meta.get("fmt") == 2:
                            contribs = self._hydrated_contribs(
                                store, dd, meta, payload
                            )
                        else:
                            contribs = payload
                        ok = fill(meta, deref(kref), contribs)
                        if ok:
                            for t, vref in vrefs.items():
                                if t in self._sorted_kc and t not in self._vec_cache:
                                    # shared plasma copy: not counted
                                    # against this reader's PRIVATE
                                    # _vec_budget
                                    self._vec_cache[t] = deref(vref)
                        return ok
            meta_p = os.path.join(dd, "meta.json")
            if not os.path.exists(meta_p):
                return False
            try:
                with open(meta_p) as f:
                    meta = json.load(f)
                if meta.get("manifest_sha") != sha:
                    return False
                if disjoint(meta):
                    return True  # skip WITHOUT hydrating
                keys = np.load(os.path.join(dd, "keys.npy"), mmap_mode="r")
                if meta.get("fmt") == 2:
                    # restart fallback for the compact layout: mmap
                    # the integer tf/dl and recompute exact contribs.
                    # With a live (fresh) store the hydrated array is
                    # parked back so the rest of the pool still shares
                    # ONE plasma copy per node — each actor privately
                    # materializing ~8 B/posting of f64 would be an
                    # N-copy RSS spike the fmt-1 mmap never had. Only
                    # a store-less process (MICROFTS_WARMSTORE=0 /
                    # no Ray) hydrates privately.
                    tf = np.load(os.path.join(dd, "tf.npy"), mmap_mode="r")
                    dlv = np.load(os.path.join(dd, "dl.npy"), mmap_mode="r")
                    if store is not None:
                        contribs = self._hydrated_contribs(
                            store, dd, meta, (tf, dlv)
                        )
                    else:
                        contribs = _hydrate_contribs(
                            meta, tf, dlv, self.n_chunks, self.avgdl
                        )
                else:
                    contribs = np.load(
                        os.path.join(dd, "contribs.npy"), mmap_mode="r"
                    )
            except OSError:
                return False  # cache dir swept by a newer generation
            return fill(meta, keys, contribs)

        if load_one(d):  # flat layout (prewarm(persist=True))
            return True
        # sharded layout (emit_warm_cache at merge time): complete only
        # when the driver's sharded.json marker exists
        sh_p = os.path.join(d, "sharded.json")
        if not os.path.exists(sh_p):
            return False
        try:
            with open(sh_p) as f:
                sh = json.load(f)
            if sh.get("manifest_sha") != sha:
                return False
            if min_entries is not None and sh.get("min_entries", 0) > min_entries:
                return False  # caller wants DEEPER warming than emitted
        except OSError:
            return False
        dirs = sh.get("dirs")
        if dirs is not None:
            # marker-listed dirs (range shards + hot-term dirs): each
            # must exist and load; hot dirs carry lo=t, hi=t+1 so the
            # term_range pruning applies to them unchanged
            paths = [os.path.join(d, name) for name in dirs]
            self._prehydrate(store, paths, term_range)
            return all(load_one(p) for p in paths)
        import glob as _glob

        shard_dirs = sorted(_glob.glob(os.path.join(d, "shard=*")))
        if len(shard_dirs) != sh.get("n_shards"):
            return False
        self._prehydrate(store, shard_dirs, term_range)
        return all(load_one(dd) for dd in shard_dirs)

    def _prehydrate(
        self, store, dirpaths: list,
        term_range: tuple[int, int] | None = None,
    ) -> None:
        """Fan out the fmt-2 contrib hydration for every warm dir this
        load needs, each in its own Ray worker process: the first
        loader of a generation otherwise hydrates N dirs serially
        inline, and hydration is exactly the kind of single-process
        compute+write phase this box's PER-PROCESS bandwidth episode
        eats (third-wave finding, BASELINE.md). Tasks park their
        result in the store (put_hydrated is first-wins), so
        load_one's _hydrated_contribs finds them already shared; any
        missing/failed dir just hydrates inline as before. Pool
        actors after the first hit the memoized refs and skip all of
        this (hydration_todo returns empty).

        PROBE-GATED: at healthy single-stream bandwidth the whole
        inline hydration is sub-second (~1.3 GB of sequential
        reads+writes), while the fan-out pays worker cold-starts —
        measured 8-12 s of query_warmup when 32 per-dir tasks spawned
        at a healthy bus. So the fan-out engages only inside a
        collapse (where inline would be 10-20 s and each task's own
        process escapes the per-process episode), and dirs are
        CHUNKED into at most 8 tasks to bound the spawn cost."""
        if store is None or len(dirpaths) < 2:
            return
        if _cached_gbps(ttl=5.0) >= 1.5:
            return  # healthy ambient: inline hydration is sub-second
        import ray as _ray

        from .build import _pkg_root

        pkg_root = _pkg_root()
        n_chunks, avgdl = self.n_chunks, self.avgdl
        sha = self._manifest_sha()
        lo, hi = term_range if term_range is not None else (None, None)
        try:
            todo = _ray.get(
                store.hydration_todo.remote(list(dirpaths), sha, lo, hi)
            )
        except Exception:
            return
        if len(todo) < 2:
            return  # 0/1 dirs: inline is as fast as a task round-trip

        def hyd(dds: list) -> int:
            import sys

            if pkg_root not in sys.path:
                sys.path.insert(0, pkg_root)
            import ray as _r

            from microfts_ray.pipelines.query import _hydrate_contribs as hc

            n_done = 0
            for dd in dds:
                ent = _r.get(store.get_dir.remote(dd))
                if ent is None:
                    continue
                meta, _kref, cref, _v = ent
                if meta.get("fmt") != 2:
                    continue
                payload = (
                    _r.get(cref) if isinstance(cref, _r.ObjectRef) else cref
                )
                c = hc(meta, payload[0], payload[1], n_chunks, avgdl)
                ref = _r.put(c, _owner=store)
                _r.get(store.put_hydrated.remote(dd, [ref]))
                n_done += 1
            return n_done

        n_tasks = min(8, len(todo))
        chunks = [todo[i::n_tasks] for i in range(n_tasks)]
        remote = _ray.remote(num_cpus=1)(hyd)
        futs = [remote.remote(c) for c in chunks if c]
        # generous bound; stragglers keep running and park for later
        # readers — load_one hydrates any still-missing dir inline
        _ray.wait(futs, num_returns=len(futs), timeout=60.0)

    def _hydrated_contribs(self, store, dd: str, meta: dict, payload):
        """Shared exact-f64 contribs for a compact (fmt 2) warm dir:
        the FIRST reader on a node recomputes them from the parked
        integer (tf, dl) arrays and parks the result back into the
        node's store; every later reader (the serving pool) maps that
        one plasma copy zero-copy — the page sharing the f64 layout
        got for free, at half the emitted/persisted bytes. Raced
        hydrations are harmless: the store keeps the first ref, each
        racer still returns a correct array, and values are
        bit-identical by construction (_hydrate_contribs)."""
        import ray as _ray

        try:
            href = _ray.get(store.get_hydrated.remote(dd))
        except Exception:
            href = None
        if href is not None:
            try:
                return _ray.get(href[0])
            except Exception:
                pass  # owner of a stale ref died: recompute below
        tf, dlv = payload
        contribs = _hydrate_contribs(
            meta, tf, dlv, self.n_chunks, self.avgdl
        )
        try:
            ref = _ray.put(contribs, _owner=store)
            _ray.get(store.put_hydrated.remote(dd, [ref]))
            # swap the private array for the shared plasma view
            return _ray.get(ref)
        except Exception:
            return contribs

    def _save_warmcache(self) -> None:
        import json
        import os

        d = self._warmcache_dir()
        os.makedirs(d, exist_ok=True)
        terms = sorted(self._sorted_kc)
        offs = [0]
        for t in terms:
            offs.append(offs[-1] + int(self._sorted_kc[t][0].size))
        keys = np.concatenate([self._sorted_kc[t][0] for t in terms]) if terms else np.empty(0, np.int64)
        contribs = np.concatenate([self._sorted_kc[t][1] for t in terms]) if terms else np.empty(0, np.float64)
        np.save(os.path.join(d, "keys.npy.tmp.npy"), keys)
        np.save(os.path.join(d, "contribs.npy.tmp.npy"), contribs)
        os.replace(os.path.join(d, "keys.npy.tmp.npy"), os.path.join(d, "keys.npy"))
        os.replace(
            os.path.join(d, "contribs.npy.tmp.npy"), os.path.join(d, "contribs.npy")
        )
        meta = {
            "terms": terms,
            "offsets": offs,
            "manifest_sha": self._manifest_sha(),
        }
        tmp = os.path.join(d, ".meta.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(d, "meta.json"))
        store = _warmstore(create=True)
        if store is not None:
            import ray as _ray

            try:
                _ray.get(store.put_dir.remote(d, meta, keys, contribs))
            except Exception:
                pass  # store gone: the files remain the source of truth
        # best-effort sweep of older generations' caches (inodes stay
        # alive for anyone still mmapping them)
        import shutil

        parent = os.path.dirname(d)
        store = _warmstore()
        for name in os.listdir(parent):
            p = os.path.join(parent, name)
            if p != d and os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                if store is not None:
                    store.drop_prefix.remote(p)  # free the plasma copies

    def warm_terms_bulk(
        self, terms, maps: tuple[dict, dict] | None = None,
        deadline: float | None = None,
        deferred_out: list | None = None,
        compact: bool = False,
    ) -> dict[int, tuple[np.ndarray, np.ndarray, int]]:
        """Bulk warm-representation build: per source segment/shard,
        ONE full-table read + ONE vectorized decode_terms_table pass,
        then per-term key sort + exact contribs. The former per-term
        route decoded a hot term's hundreds of stacked rows one Python
        iteration at a time (~30us/row); this is the ~ns/entry path.

        Returns {term: (sorted dense keys, aligned f64 contribs, n)}.
        Bit-identical to _sorted_keys: keys are unique per term, and
        contribs use the same _contrib(w, tf, dl) elementwise math —
        concat order across segments can't change either. Requires the
        dense space; callers fall back to per-term decode without it.

        With `deadline` the decode is bounded in-call (between decode
        slices AND between segment reads). A term is returned ONLY if
        every segment holding its rows was fully processed — partially
        accumulated terms are dropped and reported via `deferred_out`
        (a truncated posting set must never serve)."""
        from ..functions.postings import decode_terms_table

        if self._dense_space() is None:
            return {}
        terms_arr = np.unique(np.asarray(sorted(set(int(t) for t in terms)),
                                         dtype=np.int64))
        if terms_arr.size == 0:
            return {}
        gmaps = self._warm_gmaps(maps if maps is not None else self._warm_maps())
        parts: dict[int, list] = {}
        segs = [
            seg
            for seg in self._all_term_sources()
            # skip sources with no hot term (term directory is loaded)
            if np.isin(terms_arr, seg.terms).any()
        ]
        aborted_at = None
        deferred: set[int] = set()
        for i, seg in enumerate(segs):
            if (
                deadline is not None
                and i
                and time.perf_counter() > deadline
            ):
                aborted_at = i
                break
            pf = seg._pf
            cols = (
                ["term", "n", "dict", "doc_blob", "chunk_blob",
                 "tf_blob", "dl_blob"]
                if "dict" in pf.schema_arrow.names
                else ["term", "n", "doc_blob", "chunk_blob",
                      "tf_blob", "dl_blob"]
            )
            # ROW-GROUP-wise read with deadline checks between groups:
            # a whole-segment read is indivisible (run-16 measured the
            # top-up overrunning its 4 s budget to 9.3 s on one such
            # read mid-collapse) — per group the overrun is bounded at
            # one group's decompress. Concat order is unchanged (group
            # order == table order) so outputs stay bit-identical.
            seg_aborted = False
            for gi in range(pf.metadata.num_row_groups):
                if (
                    deadline is not None
                    and (gi or i)
                    and time.perf_counter() > deadline
                ):
                    seg_aborted = True
                    break
                tbl = pf.read_row_groups([gi], columns=cols)
                dropped: list = []
                self._warm_table_slices(
                    tbl, terms_arr, parts, gmaps,
                    deadline=deadline, deferred_out=dropped,
                )
                if dropped:
                    deferred.update(int(t) for t in dropped)
                    seg_aborted = True
                    break
            if seg_aborted:
                # a term may span row groups, and partial parts from
                # this segment's earlier groups are NOT tracked per
                # group — conservatively defer every requested term
                # this segment holds (completed-in-earlier-segments
                # terms are unaffected)
                for t in terms_arr[np.isin(terms_arr, seg.terms)]:
                    parts.pop(int(t), None)
                    deferred.add(int(t))
                aborted_at = i + 1
                break
        if aborted_at is not None:
            # every requested term present in an unprocessed segment
            # is incomplete: drop its partial parts and defer it
            for seg in segs[aborted_at:]:
                for t in terms_arr[np.isin(terms_arr, seg.terms)]:
                    parts.pop(int(t), None)
                    deferred.add(int(t))
        if deferred_out is not None:
            deferred_out.extend(sorted(deferred))
        return self._warm_finalize(parts, compact=compact)

    def warm_from_table(
        self, tbl, terms, maps, deadline: float | None = None,
        deferred_out: list | None = None,
        compact: bool = False,
    ) -> dict:
        """Warm representation straight from an IN-MEMORY posting table
        (e.g. the merge shard task's blob rows, before/regardless of
        what the page cache keeps of the written file). Same decode +
        translate + contrib kernels as warm_terms_bulk; bit-identical
        output because keys are unique per term, so the final stable
        sort yields one canonical order whatever the row order was.

        `deadline` (absolute time.perf_counter value) bounds the decode
        IN-CALL, checked between ~512-row slices: a single multi-million
        -entry term inside a bandwidth collapse otherwise overruns any
        between-chunks budget by 20-40 s (measured). Terms whose rows
        were not fully decoded when the deadline trips are DROPPED from
        the result (partial warm entries would be wrong) and appended
        to `deferred_out`; they decode lazily at query time / prewarm
        top-up like any other budget-deferred term."""
        if self._dense_space() is None:
            return {}
        terms_arr = np.unique(
            np.asarray(sorted(set(int(t) for t in terms)), dtype=np.int64)
        )
        if terms_arr.size == 0 or tbl.num_rows == 0:
            return {}
        cols = [
            c
            for c in ("term", "n", "dict", "doc_blob", "chunk_blob",
                      "tf_blob", "dl_blob")
            if c in tbl.column_names
        ]
        gmaps = self._warm_gmaps(maps)
        parts: dict[int, list] = {}
        self._warm_table_slices(
            tbl.select(cols), terms_arr, parts, gmaps,
            deadline=deadline, deferred_out=deferred_out,
        )
        return self._warm_finalize(parts, compact=compact)

    def _warm_gmaps(self, maps: tuple[dict, dict]):
        """GLOBAL concatenated rank maps: rank -> dense key base and
        rank -> dl-span slot for EVERY dictionary, so each decode
        slice translates with two flat gathers — no per-posting
        searchsorted over the doc universe, no per-dict loop (a
        slice interleaves hundreds of source partitions' rows, so
        per-dict grouping degenerated to 1-2 rows per group).

        Cached per `maps` identity: the concat is MBs of bus traffic
        and warm_from_table is called once per term chunk — inside a
        bandwidth collapse the per-call rebuild was ~14 s/dir of the
        emit actors' decode time (run 10 profile)."""
        cached = getattr(self, "_gmaps_cache", None)
        if cached is not None and cached[0] is maps:
            return cached[1]
        keymaps, dlmaps = maps
        did_off: dict[str, int] = {}
        gk_parts, gs_parts, gp_parts = [], [], []
        off = 0
        for did in keymaps:
            did_off[did] = off
            gk_parts.append(keymaps[did])
            if dlmaps:
                ds, sp = dlmaps[did]
                gs_parts.append(ds)
                gp_parts.append(sp)
            off += keymaps[did].size
        g_key = np.concatenate(gk_parts) if gk_parts else np.empty(0, np.int64)
        g_dstart = np.concatenate(gs_parts) if gs_parts else None
        g_dspan = np.concatenate(gp_parts) if gp_parts else None
        out = (did_off, g_key, g_dstart, g_dspan)
        self._gmaps_cache = (maps, out)
        return out

    def _warm_table_slices(
        self, tbl, terms_arr, parts, gmaps,
        deadline: float | None = None, deferred_out: list | None = None,
    ) -> None:
        mask = np.isin(tbl["term"].to_numpy(), terms_arr)
        if not mask.any():
            return
        sub_all = tbl.filter(pa.array(mask))
        # decode in small slices: the whole-shard decode's temporaries
        # live in DRAM and this box's bus makes that 25x slower than
        # cache-resident slices (measured 4.5s vs 0.16s per shard for
        # identical output). Slice boundaries are ENTRY-budgeted (rows
        # are variable-mass blobs: hot-term blobs run ~2.3k entries
        # each, so a fixed 512-row slice would be ~1.2M entries and
        # the deadline check below could overrun by ~10 s inside a
        # collapse); ~128k entries per slice keeps both the cache
        # residency and a sub-second deadline overrun.
        n_np = sub_all["n"].to_numpy().astype(np.int64, copy=False)
        # slice boundaries: one searchsorted per SLICE (not a Python
        # loop per row — that boxed every posting count inside the
        # very decode budget the deadline conserves), capped at 512
        # rows per slice for the cache-residency bound above
        cs = np.cumsum(n_np)
        bounds = [0]
        while bounds[-1] < n_np.size:
            s0 = bounds[-1]
            base_c = cs[s0 - 1] if s0 else 0
            # the FIRST slice is the guaranteed-progress one — it
            # decodes even past the deadline (the check below skips
            # s0 == 0), so keep it small: run 19 measured a 128k-entry
            # first slice running 67 s inside a ~0.1 MB/s collapse
            # tail, un-preemptable mid-kernel
            budget_e = 8_192 if s0 == 0 else _WARM_SLICE_ENTRIES
            nxt = int(
                np.searchsorted(cs, base_c + budget_e, side="left")
            ) + 1
            bounds.append(min(max(nxt, s0 + 1), s0 + 512, n_np.size))
        for bi in range(len(bounds) - 1):
            s0, s1 = bounds[bi], bounds[bi + 1]
            if deadline is not None and s0 and time.perf_counter() > deadline:
                # deadline tripped mid-call: every term with rows in
                # the undecoded tail is incomplete — drop its partial
                # parts (a truncated posting set would serve wrong
                # scores) and report it deferred. The slice check
                # bounds the overrun at ONE slice (~128k entries)
                # instead of one whole term (20-40 s for a hot term
                # inside a bandwidth collapse).
                undecoded = np.unique(
                    sub_all.slice(s0)["term"].to_numpy()
                )
                for t in undecoded:
                    parts.pop(int(t), None)
                    if deferred_out is not None:
                        deferred_out.append(int(t))
                return
            sub = sub_all.slice(s0, s1 - s0)
            self._warm_accumulate(sub, parts, gmaps)

    def _warm_finalize(self, parts: dict, compact: bool = False) -> dict:
        """compact=False (the in-memory/serving shape): {t: (sorted
        keys, exact f64 contribs, n)}. compact=True (the EMISSION
        shape, fmt-2 warm dirs): {t: (sorted keys — int32 when the
        dense space fits, tf, dl)} with NO contrib compute — contribs
        are a pure elementwise function of (tf, dl, n, manifest
        stats), so emission skips ~16 bytes/posting of f64
        compute+gather+park and readers recompute exactly at load
        (_hydrate_contribs)."""
        if compact:
            keyd = np.int64
            dn = self._dense_space()
            if dn is not None and int(dn[1][-1]) <= np.iinfo(np.int32).max:
                keyd = np.int32
        out = {}
        for t, ps in parts.items():
            if len(ps) == 1:
                keys, tf, dl = ps[0]
            else:
                keys = np.concatenate([p[0] for p in ps])
                tf = np.concatenate([p[1] for p in ps])
                dl = np.concatenate([p[2] for p in ps])
            n = int(keys.size)
            order = np.argsort(keys, kind="stable")
            if compact:
                keys = keys.astype(keyd, copy=False)
                tfs, dls = tf[order], dl[order]
                # shed the decode's u64 width now (the writer picks
                # the final per-dir dtype): the gathered u64 copies
                # would otherwise make the emit task's transient set
                # 25% LARGER than the fmt-1 one it replaces
                if tfs.size and int(tfs.max()) <= 0xFFFFFFFF:
                    tfs = tfs.astype(np.uint32)
                if dls.size and int(dls.max()) <= 0xFFFFFFFF:
                    dls = dls.astype(np.uint32)
                out[t] = (keys[order], tfs, dls)
            else:
                contrib = self._contrib(self._idf(n), tf, dl)
                out[t] = (keys[order], contrib[order], n)
        return out

    def _warm_accumulate(self, sub, parts: dict, gmaps) -> None:
        """One decode slice of warm_terms_bulk: decode, translate
        ranks through the GLOBAL concatenated rank maps with flat
        entry-level gathers, append per-term (keys, tf, dl) parts in
        row order."""
        from ..functions.postings import decode_terms_table

        doc_sorted, base = self._dense
        did_off, g_key, g_dstart, g_dspan = gmaps
        dec = decode_terms_table(
            sub, dict_resolver=self._resolve_dict, translate=False
        )
        if dec["term"].size == 0:
            return
        doc = dec["doc_id"]  # RAW RANKS for rank-encoded rows
        chunk = dec["chunk_id"]
        # values are tiny (chunk ordinals / dict ranks): reinterpret
        # uint64 -> int64 as a zero-copy view instead of per-slice
        # astype copies (a measured multi-second warmup tax)
        ck64 = chunk.view(np.int64)
        total = doc.size
        if dec["has_dl"]:
            dl = dec["dl"]
        else:
            dl = np.empty(total, dtype=np.uint64)
        vocab = dec["dict_vocab"]
        if vocab is None or g_key.size == 0:
            keys = base[np.searchsorted(doc_sorted, doc)] + ck64
            if not dec["has_dl"]:
                dl[:] = self._chunk_dls(doc, chunk)
        else:
            row_codes = dec["dict_codes"]
            ns_rows = np.diff(dec["row_starts"])
            # per-row global map offset (-1 = plain doc-id row),
            # repeated to entries: translation becomes flat gathers
            row_off = np.array(
                [did_off.get(d, -1) if d else -1 for d in vocab], dtype=np.int64
            )[row_codes]
            eoff = np.repeat(row_off, ns_rows)
            plain = eoff < 0
            slot = eoff + doc.view(np.int64)
            slot[plain] = 0  # safe placeholder, overwritten below
            keys = g_key[slot] + ck64
            if not dec["has_dl"]:
                if ((~plain) & (ck64 >= g_dspan[slot])).any():
                    raise KeyError("chunk_id beyond its doc's chunk span")
                flat = self._chunk_dl_space()[2]
                # clip keeps placeholder (plain) slots in bounds; their
                # values are overwritten by the plain path below
                dl[:] = flat[np.minimum(g_dstart[slot] + ck64, flat.size - 1)]
            if plain.any():  # plain doc-id rows (legacy/custom)
                d_k = doc[plain]
                keys[plain] = (
                    base[np.searchsorted(doc_sorted, d_k)] + ck64[plain]
                )
                if not dec["has_dl"]:
                    dl[plain] = self._chunk_dls(d_k, chunk[plain])
        tt = dec["term"]
        starts = np.flatnonzero(np.concatenate(([True], tt[1:] != tt[:-1])))
        bnds = np.concatenate((starts, [tt.size]))
        for i in range(starts.size):
            s, e = int(bnds[i]), int(bnds[i + 1])
            parts.setdefault(int(tt[s]), []).append(
                (keys[s:e], dec["tf"][s:e], dl[s:e])
            )

    def _warm_maps(self) -> tuple[dict, dict]:
        """Per-dict rank maps for broadcast to warm tasks (each task
        would otherwise re-read every docs sidecar to resolve its
        dictionaries: N tasks x all partitions of duplicate I/O).
        ~500 entries per dict -> a few MB total at any corpus size
        that fits one dense space.

        Cached per reader (a reader serves ONE index generation):
        the lazy per-term decode of budget-deferred warm terms calls
        this on every miss, and each rebuild re-reads the docs
        sidecars — seconds per query inside a bandwidth collapse."""
        import os

        cached = getattr(self, "_warm_maps_cache", None)
        if cached is not None:
            return cached
        keymaps: dict[str, np.ndarray] = {}
        dlmaps: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if self._dense_space() is None:
            return keymaps, dlmaps
        doc_sorted, base = self._dense
        try:
            dl_ids, dl_base, _ = self._chunk_dl_space()
        except KeyError:
            dl_ids = None
        for pid, rel in self._pid_docs.items():
            subs = np.unique(
                self._read_index_table(rel, columns=["sub"])["sub"].to_numpy()
            )
            for k in subs:
                did = f"{pid}:{int(k)}"
                lookup = self._resolve_dict(did)
                pos = np.minimum(
                    np.searchsorted(doc_sorted, lookup), doc_sorted.size - 1
                )
                if not (doc_sorted[pos] == lookup).all():
                    raise KeyError("dictionary doc missing from dense space")
                keymaps[did] = base[pos]
                if dl_ids is not None:
                    p2 = np.minimum(
                        np.searchsorted(dl_ids, lookup), dl_ids.size - 1
                    )
                    if not (dl_ids[p2] == lookup).all():
                        raise KeyError("doc_id missing from chunk-dl space")
                    dlmaps[did] = (dl_base[p2], dl_base[p2 + 1] - dl_base[p2])
        self._warm_maps_cache = (keymaps, dlmaps)
        return keymaps, dlmaps

    def _parked_shared_ref(self):
        """The merge-parked warm shared-tuple ref for THIS generation
        (list-unwrapped), or None. Probed once and cached per reader:
        the fan-out decode paths reuse it every call, and a missing
        ref stays missing for the session (the fallback is the
        caller's inline/rebuild path)."""
        cached = getattr(self, "_shared_ref_cache", None)
        if cached is not None:
            return cached[0]
        import ray as _ray

        ref = None
        store = _warmstore()
        if store is not None and _ray.is_initialized():
            try:
                wrapped = _ray.get(
                    store.get_shared.remote(self._manifest_sha())
                )
                if wrapped is not None and _ray.get(
                    wrapped[0], timeout=2
                ) is not None:
                    ref = wrapped[0]
            except Exception:
                ref = None
        self._shared_ref_cache = (ref,)
        return ref

    def _fan_out_warm(self, term_chunks: list[list[int]], shared_ref,
                      timeout: float | None = None) -> int:
        """Decode term chunks in parallel Ray tasks against the parked
        shared tuple; merge bit-identical results into the warm cache.
        With a timeout, stragglers are force-cancelled (their terms
        stay deferred); without one every chunk is awaited — used when
        the caller needs the data anyway and parallel is strictly
        faster than its serial fallback. Returns terms warmed."""
        import ray as _ray

        from .build import _pkg_root

        pkg_root = _pkg_root()
        index_dir = self.index_dir

        def warm_chunk(terms: list[int]) -> dict:
            import sys

            if pkg_root not in sys.path:
                sys.path.insert(0, pkg_root)
            from microfts_ray.pipelines.query import IndexReader as IR

            r = IR(index_dir)
            if shared_ref is None:
                # no parked tuple (cross-session restart / owner gone):
                # the worker derives its own dense/dl/rank maps — in
                # its own process, at its own ambient bandwidth
                return r.warm_terms_bulk(terms)
            dense_val, dl_val, maps_val = _ray.get(shared_ref)
            r._dense = dense_val
            if dl_val is not None:
                r._chunk_dl_cache = dl_val
            return r.warm_terms_bulk(terms, maps=maps_val)

        remote = _ray.remote(num_cpus=1)(warm_chunk)
        futs = [remote.remote(c) for c in term_chunks if c]
        if timeout is not None:
            done, pending = _ray.wait(
                futs, num_returns=len(futs), timeout=timeout
            )
            for p in pending:
                _ray.cancel(p, force=True)
            futs = done
        warmed = 0
        for fut in futs:
            try:
                got = _ray.get(fut)
            except Exception:
                continue  # cancelled/died: terms stay deferred
            for t, (k, c, n) in got.items():
                self._sorted_kc[int(t)] = (k, c)
                self._term_len_cache[int(t)] = int(n)
                warmed += 1
        return warmed

    def _ensure_terms_warm(self, infos: list[tuple[int, int]]) -> None:
        """Pre-decode a query's MISSING terms in parallel Ray tasks
        when one process is bandwidth-starved but the host isn't: this
        VM's dominant degraded episode gives a single process 0.05-0.5
        GB/s while four concurrent processes measure ~4 GB/s each
        (run-21: first BM25 pass 92 s, all of it serial per-query
        row-group decodes, while the 4-proc probe read 15.6 GB/s). No
        timeout — the query needs these postings either way, and the
        parallel decode is strictly faster than the serial inline
        fallback whenever the gate (collapsed fresh single-stream
        probe) admitted it. No-op once warm, at healthy ambient, or
        without Ray.

        ALL missing terms qualify, and even a single one fans out: a
        lazy decode costs a full shard row-group read+decompress
        REGARDLESS of the term's size (run-14: 29 s for ONE
        ~10k-entry term inside a collapse), the emission/prewarm only
        cover >= min_entries terms so first-touch queries miss exactly
        the rarer grams, and one remote task is a separate process
        with its own bandwidth inside the per-process episode — the
        r4 driver record's 96 s first pass was this serial tail."""
        if self._dense_space() is None:
            return
        missing = [g for g, n in infos if n > 0 and g not in self._sorted_kc]
        if not missing:
            return
        import os as _os

        import ray as _ray

        if not _ray.is_initialized():
            return
        if _cached_gbps(ttl=5.0) >= 1.5:
            return  # healthy single stream: inline decode is cheap
        # without the parked shared tuple the workers self-build their
        # maps — in their own processes, with their own bandwidth
        # (driver-side rebuild + re-put was the ~20 s single-process
        # tax the park avoids; worker-side it runs at worker ambient)
        shared_ref = self._parked_shared_ref()
        per_host = _warm_tasks_env()
        n_tasks = min(per_host, len(missing))
        chunks = [sorted(missing)[i::n_tasks] for i in range(n_tasks)]
        self._fan_out_warm(chunks, shared_ref)

    def _prewarm_topup(
        self,
        min_entries: int,
        term_range: tuple[int, int] | None,
        parallel: bool | None = None,
    ) -> tuple[float, float]:
        """TOP-UP pass for a loaded-but-partial warm cache: the
        emission's decode budget may have deferred warm-eligible terms
        inside a collapse episode; warm the missing ones here so the
        first query pass doesn't pay their decodes serially. No-op
        after a full-depth emission. Returns (enum_s, topup_s).

        Two execution paths, both wall-clock bounded at ~the budget:

        * FAN-OUT (default when Ray is up and there's enough work):
          shard-aligned Ray tasks run warm_terms_bulk in separate
          processes, bounded by ray.wait(timeout) + force-cancel of
          stragglers (their terms just stay deferred). This is the
          path that exploits this VM's dominant degraded episode,
          where ONE process gets 0.05-0.5 GB/s but four concurrent
          processes measure ~4 GB/s EACH (watcher log, round 4) —
          and on a real multi-node cluster every node brings its own
          bus.
        * IN-PROCESS (parallel=False, e.g. QueryActor's in-actor
          prewarm — the pool is the parallelism; nested tasks would
          oversubscribe): gated on a FRESH single-stream probe
          (inside a collapse even the cheapest single-term lazy
          decode costs a full row-group read — 29 s measured for a
          ~min_entries term, run 14) and bounded by
          warm_terms_bulk's in-call deadline."""
        import os as _os
        import time as _time

        topup = float(
            _os.environ.get("MICROFTS_PREWARM_TOPUP_SECONDS", "4")
        )
        if topup <= 0 or self._dense_space() is None:
            return 0.0, 0.0
        _te = _time.perf_counter()
        totals: dict[int, int] = {}
        for seg in self._all_term_sources():
            for t, n in zip(seg.terms.tolist(), seg.ns.tolist()):
                totals[t] = totals.get(t, 0) + int(n)
        _enum_s = _time.perf_counter() - _te
        cands = [
            t
            for t, n in totals.items()
            if n >= min_entries
            and t not in self._sorted_kc
            and (term_range is None or term_range[0] <= t < term_range[1])
        ]
        if not cands:
            return _enum_s, 0.0
        import ray as _ray

        if parallel is None:
            parallel = _ray.is_initialized() and len(cands) >= 4
        t0 = _time.perf_counter()
        if parallel and _ray.is_initialized():
            # reuse the merge's parked shared tuple (dense/dl/rank
            # maps) when the generation's emitter left it in the
            # store: rebuilding + re-ray.putting it here measured
            # ~20 s of single-process work inside a collapse (run
            # 17's topup_s). Fall back to building when absent
            # (cross-session restart / owner gone / cap edge).
            shared_ref = self._parked_shared_ref()
            if shared_ref is None:
                if _cached_gbps(ttl=0.0) < 1.5:
                    # no parked tuple AND a collapsed single stream:
                    # the rebuild below would be the very unbounded
                    # single-process spend this budget exists to
                    # prevent — leave the terms deferred
                    return _enum_s, _time.perf_counter() - t0
                try:
                    dl_space = self._chunk_dl_space()
                except KeyError:
                    dl_space = None
                shared_ref = _ray.put(
                    (self._dense, dl_space, self._warm_maps())
                )
            per_host = _warm_tasks_env()
            n_tasks = min(per_host, max(1, len(cands)))
            if self._shard_bounds is not None:
                terms_arr = np.array(sorted(cands), dtype=np.int64)
                shard_of = (
                    np.searchsorted(
                        self._shard_bounds, terms_arr, side="right"
                    )
                    - 1
                )
                per_shard = [
                    terms_arr[shard_of == s].tolist()
                    for s in range(self.n_shards)
                ]
                chunks = [[] for _ in range(n_tasks)]
                for s, ts in enumerate(per_shard):
                    chunks[s * n_tasks // max(1, len(per_shard))].extend(ts)
            else:
                chunks = [sorted(cands)[i::n_tasks] for i in range(n_tasks)]
            # budget as wait-timeout: stragglers are cancelled and
            # their terms stay deferred (decode lazily per query /
            # next prewarm)
            self._fan_out_warm(chunks, shared_ref, timeout=topup)
        elif _cached_gbps(ttl=0.0) >= 1.5:
            got = self.warm_terms_bulk(cands, deadline=t0 + topup)
            for t, (k, c, n) in got.items():
                self._sorted_kc[int(t)] = (k, c)
                self._term_len_cache[int(t)] = int(n)
        return _enum_s, _time.perf_counter() - t0

    def prewarm(
        self,
        min_entries: int = 10_000,
        parallel: bool | None = None,
        persist: bool = False,
        term_range: tuple[int, int] | None = None,
    ) -> int:
        """Decode the heaviest terms into the warm caches — serving
        processes call this once at load so query latency reflects
        steady state, the same way the reference's mmap'd LMDB pages
        stay hot between per-keystroke searches (org-fts.el).

        With persist=True the warm set is saved under
        <index>/warmcache and any LATER reader of the same index
        generation warms by mmap instead of decode — a QueryService
        pool's 2nd..Nth actors (and restarts) load in seconds and
        share one physical copy of the hot set via the page cache
        (measured 45 s -> 7 s at 200k files). Off by default: the
        ~1.7 GB cache write is only worth paying when more readers of
        this index generation will follow."""

        def _finish_from_cache() -> int:
            import os as _os
            import time as _time

            _tw0 = _time.perf_counter()
            _n_before = len(self._sorted_kc)
            _enum_s, _topup_s = self._prewarm_topup(
                min_entries, term_range, parallel=parallel
            )
            _vec_s = 0.0
            if self._dense_space() is not None:
                # eager-build MISSING dense vectors hottest-first,
                # TIME-BUDGETED: parked vectors are free (plasma
                # views); ones the emission's ambient budget skipped
                # cost a 33 MB scatter each, and inside a bandwidth
                # collapse building all of them here would just move
                # warm_build's unbounded cost into query_warmup —
                # past the budget they build lazily at first use
                import os as _os
                import time as _time

                # small default: with parked vectors this loop is all
                # cache hits (~0 s); when the emission budget skipped
                # vectors (collapse episode) queries route to the
                # byte-frugal MaxScore path (_prefer_maxscore), so
                # burning warmup time building them here buys little
                budget = float(
                    _os.environ.get("MICROFTS_PREWARM_VEC_SECONDS", "2")
                )
                vec_cands = [
                    (t, n)
                    for t, n in self._term_len_cache.items()
                    if n >= self._vec_min and t not in self._vec_cache
                ]
                # a vector build costs ~K (33 MB zero-fill + scatter)
                # REGARDLESS of the term's n, so per-term rate
                # calibration is meaningless here — the bound is:
                # (a) a FRESH ambient probe gate (don't trust the
                # ~20 s-TTL cache prewarm may have inherited from a
                # flipped episode), matching _dense_vec's own gate;
                # (b) builds are ~constant-cost, so the first build
                # that overruns the remaining budget ends the phase
                # (break, not continue)
                t0 = _time.perf_counter()
                if vec_cands and _cached_gbps(ttl=0.0) >= 1.5:
                    last_cost = 0.0
                    for t, n in sorted(
                        vec_cands, key=lambda kv: -kv[1]
                    ):
                        if t in self._vec_cache:
                            continue
                        left = budget - (_time.perf_counter() - t0)
                        if left <= 0 or last_cost > left:
                            break
                        td = _time.perf_counter()
                        self._dense_vec(t)
                        last_cost = _time.perf_counter() - td
                _vec_s = _time.perf_counter() - t0
            _warm_prof(
                {
                    "dir": "_prewarm",
                    "enum_s": round(_enum_s, 3),
                    "topup_s": round(_topup_s, 3),
                    "vec_s": round(_vec_s, 3),
                    "total_s": round(_time.perf_counter() - _tw0, 3),
                    "n_topup": len(self._sorted_kc) - _n_before,
                    "n_vecs": len(self._vec_cache),
                }
            )
            return len(self._sorted_kc)

        if term_range is not None:
            # term-range serving shard: warm ONLY this range. A
            # merge-emitted sharded warm cache turns this into an mmap
            # of the intersecting shard files; else decode the range.
            if self._load_warmcache(
                term_range=term_range, min_entries=min_entries
            ):
                return _finish_from_cache()
            return self._prewarm_build(
                min_entries, parallel, persist=False, term_range=term_range
            )
        if self._load_warmcache(min_entries=min_entries):
            return _finish_from_cache()
        lock_fd = None
        if persist:
            # first-writer election: exactly one process of a pool pays
            # the decode+persist; the others poll for its cache and
            # mmap it (without this, N pool actors race to each do the
            # full decode — N× the cold-start cost for nothing)
            lock_fd = self._try_warm_lock()
            if lock_fd is None:
                if self._wait_warmcache() and self._load_warmcache(
                    min_entries=min_entries
                ):
                    return _finish_from_cache()
                lock_fd = self._try_warm_lock()  # builder died: take over
        try:
            return self._prewarm_build(min_entries, parallel, persist)
        finally:
            if lock_fd is not None:
                self._release_warm_lock(lock_fd)

    def _try_warm_lock(self):
        import os

        path = self._warmcache_dir() + ".lock"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            return os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            import time

            try:  # steal locks of long-dead builders
                if time.time() - os.path.getmtime(path) > 900:
                    os.unlink(path)
                    return os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except OSError:
                pass
            return None

    def _release_warm_lock(self, fd) -> None:
        import os

        os.close(fd)
        try:
            os.unlink(self._warmcache_dir() + ".lock")
        except OSError:
            pass

    def _wait_warmcache(self, timeout: float = 900.0) -> bool:
        import os
        import time

        meta_p = os.path.join(self._warmcache_dir(), "meta.json")
        lock_p = self._warmcache_dir() + ".lock"
        deadline = time.time() + timeout
        while time.time() < deadline:
            if os.path.exists(meta_p):
                return True
            if not os.path.exists(lock_p):  # builder finished or died
                return os.path.exists(meta_p)
            time.sleep(0.25)
        return False

    def _prewarm_build(
        self,
        min_entries: int,
        parallel: bool | None,
        persist: bool,
        term_range: tuple[int, int] | None = None,
    ) -> int:
        totals: dict[int, int] = {}
        for seg in self._all_term_sources():
            for t, n in zip(seg.terms.tolist(), seg.ns.tolist()):
                totals[t] = totals.get(t, 0) + int(n)
        if term_range is not None:
            lo, hi = term_range
            totals = {t: n for t, n in totals.items() if lo <= t < hi}
        budget = self._run_cache_cap - self._run_cache_entries
        use_dense = self._dense_space() is not None
        todo = []
        for t, n in sorted(totals.items(), key=lambda kv: -kv[1]):
            if n < min_entries or budget <= 0:
                break
            todo.append(int(t))
            budget -= n

        import ray as _ray

        if parallel is None:
            # measured on this host class (bus saturates at ~1.3x
            # single-thread bandwidth): with the sliced cache-resident
            # decode + broadcast dict maps, the shard-aligned fan-out
            # is modestly ahead of serial (cold 46s vs 51-95s) because
            # tasks overlap I/O with decode; on a multi-NODE cluster
            # each node has its own bus and the fan-out wins outright
            parallel = _ray.is_initialized() and len(todo) > 4
        if parallel:
            from .build import _pkg_root

            pkg_root = _pkg_root()
            index_dir = self.index_dir

            # SHARD-ALIGNED, BANDWIDTH-MATCHED tasks. Two measured
            # facts drive this shape: (1) hot terms interleave across
            # shard files, so striding tasks over the sorted term list
            # re-reads the same row groups many times — tasks must
            # follow term ranges; (2) decode parallelism is bounded by
            # PER-HOST memory bandwidth, not cores (this class of box
            # saturates at ~1.3x single-thread; 32 workers measured
            # SLOWER than 6). The default 6 suits one such host;
            # deployments set MICROFTS_WARM_TASKS to roughly
            # (hosts x per-host useful decode streams) after probing.
            import os as _os

            per_host = _warm_tasks_env()
            n_tasks = min(per_host, max(1, len(todo) // 2))
            if self._shard_bounds is not None:
                terms_arr = np.array(todo, dtype=np.int64)
                shard_of = (
                    np.searchsorted(self._shard_bounds, terms_arr, side="right") - 1
                )
                per_shard = [
                    terms_arr[shard_of == s].tolist()
                    for s in range(self.n_shards)
                ]
                # contiguous shard groups -> n_tasks chunks
                chunks = [[] for _ in range(n_tasks)]
                for s, terms in enumerate(per_shard):
                    chunks[s * n_tasks // max(1, len(per_shard))].extend(terms)
            else:
                chunks = [todo[i::n_tasks] for i in range(n_tasks)]

            # broadcast the dense + chunk-dl spaces: each task
            # re-deriving them re-reads every docs sidecar from
            # (cold) disk
            try:
                dl_space = self._chunk_dl_space()
            except KeyError:  # old-format index: dl lives in-stream
                dl_space = None
            warm_maps = self._warm_maps() if use_dense else ({}, {})
            dense_ref = _ray.put(
                (self._dense if use_dense else None, dl_space, warm_maps)
            )

            def warm_task(terms: list[int]) -> dict:
                import sys

                if pkg_root not in sys.path:
                    sys.path.insert(0, pkg_root)

                from microfts_ray.pipelines.query import IndexReader as IR

                r = IR(index_dir)
                dense_val, dl_space_val, maps_val = _ray.get(dense_ref)
                if dense_val is not None:
                    r._dense = dense_val
                if dl_space_val is not None:
                    r._chunk_dl_cache = dl_space_val
                dense = r._dense_space() is not None
                if dense:
                    # bulk path: per shard, one table read + one
                    # vectorized decode — ships ONLY (sorted keys,
                    # aligned contribs): 16B/entry instead of the
                    # 48B/entry of full runs+keys+contrib
                    return r.warm_terms_bulk(terms, maps=maps_val)
                out = {}
                for t in terms:
                    run = r.term_postings(t)
                    if not len(run):
                        continue
                    out[t] = (run.doc_ids, run.chunk_ids, run.tfs, run.dls)
                return out

            remote = _ray.remote(num_cpus=1)(warm_task)
            for fut in [remote.remote(c) for c in chunks if c]:
                for t, payload in _ray.get(fut).items():
                    if use_dense:
                        keys_s, contrib_s, n = payload
                        self._sorted_kc[t] = (keys_s, contrib_s)
                        self._term_len_cache[t] = n
                    else:
                        d, c, tf, dl = payload
                        run = PostingRun(d, c, tf, dl)
                        self._run_cache[t] = run
                        self._run_cache_entries += len(run)
            if use_dense:
                # driver-side float32 vector builds: scatters at SORTED
                # keys are (nearly) sequential writes — cheap at full
                # single-thread bandwidth; hottest first, budget-capped
                for t in todo:
                    if totals.get(t, 0) >= self._vec_min:
                        self._dense_vec(t)
                if persist and self._sorted_kc:
                    self._save_warmcache()
            return len(todo)

        if use_dense:
            # same warm representation as the parallel path, same bulk
            # decode (QueryActor's in-actor prewarm runs HERE with
            # parallel=False — persist must work on this path)
            for t, (k, c, n) in self.warm_terms_bulk(todo).items():
                self._sorted_kc[t] = (k, c)
                self._term_len_cache[t] = n
            for t in todo:
                if totals.get(t, 0) >= self._vec_min:
                    self._dense_vec(t)
            if persist and self._sorted_kc:
                self._save_warmcache()
            return len(todo)

        # non-dense mode: warm the raw-run cache (term_postings caches)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(self.term_postings, todo))
        return len(todo)

    # -- candidate kernel (X1) ---------------------------------------------
    def candidates(self, grams: set[int]) -> PostingRun | None:
        """Multi-gram AND intersection, smallest list first
        (intersectGrams, fts-lmdb.go:1497-1528). None if any gram is
        missing from the index (reference exit(1)).

        Dense fast path: with the bounded chunk-key space available,
        intersection is a per-gram counter over dense keys (each gram
        hits a pair at most once), so no posting list is ever sorted."""
        if not grams:
            return None
        sized = []
        for g in grams:
            n = self.chunk_df(g)
            if n == 0:
                return None
            sized.append((n, g))
        sized.sort()
        if self._dense_space() is not None:
            doc_ids, base = self._dense
            K = int(base[-1])
            count = np.zeros(K, dtype=np.uint8 if len(sized) < 256 else np.uint16)
            for _, g in sized:
                count[self._term_keys(g)] += 1
            hit = np.nonzero(count == len(sized))[0]
            idx = np.searchsorted(base, hit, side="right") - 1
            live = self._live_mask(doc_ids[idx])
            return PostingRun(
                doc_ids[idx][live],
                (hit - base[idx]).astype(np.uint64)[live],
                np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.uint64),
            )
        seed = self.term_postings(sized[0][1])
        cur_doc, cur_chunk = seed.doc_ids, seed.chunk_ids
        for _, g in sized[1:]:
            if cur_doc.size == 0:
                break
            run = self.term_postings(g)
            mask = pair_isin(cur_doc, cur_chunk, run.doc_ids, run.chunk_ids)
            cur_doc, cur_chunk = cur_doc[mask], cur_chunk[mask]
        live = self._live_mask(cur_doc)
        return PostingRun(
            cur_doc[live],
            cur_chunk[live],
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint64),
        )

    def _live_mask(self, doc: np.ndarray) -> np.ndarray:
        if self._tombstones.size == 0:
            return np.ones(doc.size, dtype=bool)
        return ~np.isin(doc, self._tombstones)

    # -- doc metadata / chunk text (J1/J2/J3) ------------------------------
    def _docs_tables(self):
        for rel, si in mf.docs_sources(self.manifest):
            yield si, self._read_index_table(rel)

    def _load_doc_meta(self) -> "_DocMeta":
        """Doc metadata as doc_id-sorted ARRAYS (numpy ids + aligned
        Arrow string columns), looked up by searchsorted — no
        O(n_docs) Python dict of tuples per reader. Strings stay in
        Arrow buffers; only requested ids pay an .as_py(). At true
        scale the same layout loads per doc-id range on demand (the
        sidecars are doc-id sorted parquet), so a serving shard never
        holds metadata outside its range."""
        if self._doc_meta is None:
            tables = []
            for _si, d in self._docs_tables():
                if "src_path" not in d.column_names:
                    d = d.append_column(
                        "src_path", pa.array([""] * d.num_rows, pa.string())
                    )
                if "src_row" not in d.column_names:  # pre-r3 generation
                    d = d.append_column(
                        "src_row",
                        pa.array(np.full(d.num_rows, -1, np.int32), pa.int32()),
                    )
                tables.append(
                    d.select(
                        ["doc_id", "repo", "path", "commit", "src_rg", "src_row",
                         "src_path"]
                    )
                )
            t = pa.concat_tables(tables)
            ids = t["doc_id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            t = t.take(pa.array(order))
            self._doc_meta = _DocMeta(
                ids[order].astype(np.uint64),
                t["src_rg"].to_numpy().astype(np.int64),
                t["src_row"].to_numpy().astype(np.int64),
                t.column("repo").combine_chunks(),
                t.column("path").combine_chunks(),
                t.column("commit").combine_chunks(),
                t.column("src_path").combine_chunks(),
            )
        return self._doc_meta

    def doc_group(self, doc_id: int) -> str:
        m = self._load_doc_meta()
        i = m.index_of(doc_id)
        return group_name(
            m.repo[i].as_py(), m.path[i].as_py(), m.commit[i].as_py()
        )

    def doc_groups(self, doc_ids: np.ndarray) -> list[str]:
        """Vectorized group names for a doc_id array: one searchsorted
        + one Arrow binary_join_element_wise over the whole batch
        (hit lists run to millions of rows — per-row .as_py() there
        was a measured multi-second tax)."""
        import pyarrow.compute as pc

        m = self._load_doc_meta()
        if len(doc_ids) == 0:
            return []
        idx = m.indices_of(np.asarray(doc_ids, dtype=np.uint64))
        ii = pa.array(idx)
        joined = pc.binary_join_element_wise(
            pc.binary_join_element_wise(m.repo.take(ii), m.path.take(ii), "/"),
            m.commit.take(ii),
            "@",
        )  # == group_name(repo, path, commit) per row
        return joined.to_pylist()

    def doc_group_codes(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(sorted unique group names, per-row codes): group strings
        are built once per UNIQUE doc and row codes map through a
        searchsorted — candidate lists run to millions of rows but
        touch far fewer docs, so never materialize per-row strings."""
        import pyarrow.compute as pc

        dq = np.asarray(doc_ids, dtype=np.uint64)
        if dq.size == 0:
            return np.empty(0, object), np.empty(0, np.int64)
        m = self._load_doc_meta()
        uids, inv = np.unique(dq, return_inverse=True)
        ii = pa.array(m.indices_of(uids))
        joined = pc.binary_join_element_wise(
            pc.binary_join_element_wise(m.repo.take(ii), m.path.take(ii), "/"),
            m.commit.take(ii),
            "@",
        )
        unames = np.asarray(joined.to_pylist(), dtype=object)
        names, ucodes = np.unique(unames, return_inverse=True)
        return names, ucodes[inv]

    def chunk_texts(self, doc_ids: np.ndarray, chunk_ids: np.ndarray) -> list[str]:
        """J3: re-read candidate docs' content from the SOURCE parquet
        (the reference re-reads source files, README.org:213).

        Fast path (indexes with src_row lineage): per source file, ONE
        content-column read of the needed row groups + a positional
        take — no id-column reads, no per-row hashing, fully
        vectorized on both sides. Old indexes without src_row fall
        back to the id-matching read."""
        meta = self._load_doc_meta()
        dq = np.asarray(doc_ids, dtype=np.uint64)
        uniq = np.unique(dq) if dq.size else dq
        if self._content_cache:
            cached = self._content_cache
            miss = np.fromiter(
                (int(x) not in cached for x in uniq), bool, uniq.size
            )
            need_ids = uniq[miss]
        else:
            need_ids = uniq
        if need_ids.size:
            if self._content_chars > self._content_chars_cap:
                self._content_cache.clear()
                self._content_chars = 0
            idx = meta.indices_of(need_ids)
            src_rg = meta.src_rg[idx]
            src_row = meta.src_row[idx]
            paths_np = np.asarray(
                meta.src_path.take(pa.array(idx)).to_pylist(), dtype=object
            )
            has_src = (src_rg >= 0) & (paths_np != "")
            for d in need_ids[~has_src]:  # custom chunk: no source text
                self._content_cache[int(d)] = ""
            fast = has_src & (src_row >= 0)
            slow = has_src & (src_row < 0)
            if fast.any():
                self._fetch_positional(
                    need_ids[fast], paths_np[fast], src_rg[fast], src_row[fast]
                )
            if slow.any():
                self._fetch_by_ids(need_ids[slow], paths_np[slow], src_rg[slow])
        out = []
        lines_by_doc: dict[int, list[str]] = {}  # split once per doc, not per hit
        for d, c in zip(doc_ids, chunk_ids):
            di = int(d)
            lines = lines_by_doc.get(di)
            if lines is None:
                lines = split_lines(self._content_cache[di])
                lines_by_doc[di] = lines
            out.append(lines[int(c)] if int(c) < len(lines) else "")
        return out

    def scan_rows(
        self,
        doc_ids: np.ndarray,
        chunk_ids: np.ndarray,
        args: tuple = (),
        partial: bool = False,
        regexp_filter: str | None = None,
        as_arrow: bool = False,
    ) -> tuple[np.ndarray, np.ndarray, "list[str] | pa.Array"]:
        """Distributed read+VERIFY over candidate chunk rows: each Ray
        task reads its slice of source row groups (content column,
        positional take), splits docs into lines, and verifies its
        candidate rows in place — only surviving LINES ship back, not
        full documents (shipping 100+ MB of doc texts through the
        object store was the measured search_and regression).

        Returns (sel, offsets, lines): ascending indices into the
        input arrays of surviving rows, the per-row min has_arg
        offset (0 when args is empty = no verification), and the
        chunk's line text per surviving row."""
        meta = self._load_doc_meta()
        n = int(np.asarray(doc_ids).size)
        if n == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64), []
        dq = np.asarray(doc_ids, dtype=np.uint64)
        cq = np.asarray(chunk_ids, dtype=np.int64)
        midx = meta.indices_of(dq)
        src_rg = meta.src_rg[midx]
        src_row = meta.src_row[midx]
        if (src_row < 0).any() and ((src_rg >= 0) & (src_row < 0)).any():
            # legacy index without positional lineage: driver-side path
            texts = self.chunk_texts(dq, cq)
            pat = re.compile(regexp_filter) if regexp_filter else None
            sel, offs, lines = [], [], []
            for j, text in enumerate(texts):
                if pat is not None and not pat.search(text):
                    continue
                ofs = [has_arg(text, a, partial) for a in args]
                if any(o < 0 for o in ofs):
                    continue
                sel.append(j)
                offs.append(min(ofs) if ofs else 0)
                lines.append(text)
            return (
                np.array(sel, np.int64),
                np.array(offs, np.int64),
                pa.array(lines, pa.string()) if as_arrow else lines,
            )

        pcodes = meta.path_codes[midx]
        has_src = src_rg >= 0  # custom chunks: src_rg == -1 AND src_path == ""
        gpos_all = np.arange(n, dtype=np.int64)
        out_parts: list[tuple[np.ndarray, np.ndarray, list[str]]] = []
        if (~has_src).any() and not args and regexp_filter is None:
            # custom chunks have no source text; they survive only the
            # no-verify (fuzzy) mode, with empty text — same as before
            ns = gpos_all[~has_src]
            out_parts.append((ns, np.zeros(ns.size, np.int64), [""] * ns.size))

        live = has_src
        if not live.any():
            merged = out_parts or [(np.empty(0, np.int64), np.empty(0, np.int64), [])]
            sel = np.concatenate([m[0] for m in merged])
            order = np.argsort(sel, kind="stable")
            flat = [x for m in merged for x in m[2]]
            offs = np.concatenate([m[1] for m in merged])
            lines = [flat[i] for i in order]
            return (
                sel[order],
                offs[order],
                pa.array(lines, pa.string()) if as_arrow else lines,
            )

        gpos = gpos_all[live]
        rgs = src_rg[live]
        rows = src_row[live]
        chunks = cq[live]
        codes = pcodes[live]
        order = np.lexsort((rows, rgs, codes))
        gpos, rgs, rows, chunks, codes = (
            gpos[order], rgs[order], rows[order], chunks[order], codes[order]
        )
        # unique-doc boundaries (per path, a doc == a (rg,row) pair)
        new_doc = np.concatenate(
            ([True],
             (codes[1:] != codes[:-1])
             | (rgs[1:] != rgs[:-1])
             | (rows[1:] != rows[:-1]))
        )
        upos = np.cumsum(new_doc) - 1  # per-row index into unique docs
        u_first = np.flatnonzero(new_doc)
        u_codes = codes[u_first]
        # per-path spans over UNIQUE docs, chopped to ~2048-doc items
        items = []
        p_starts = np.flatnonzero(
            np.concatenate(([True], u_codes[1:] != u_codes[:-1]))
        )
        p_bounds = np.concatenate((p_starts, [u_codes.size]))
        for k in range(p_starts.size):
            us, ue = int(p_bounds[k]), int(p_bounds[k + 1])
            path = meta.path_list[int(u_codes[us])]
            for a in range(us, ue, 2048):
                b = min(a + 2048, ue)
                rs = int(u_first[a])
                re_ = int(u_first[b]) if b < u_first.size else codes.size
                items.append(
                    (
                        path,
                        rgs[u_first[a:b]],          # unique-doc rgs
                        rows[u_first[a:b]],         # unique-doc rows
                        (upos[rs:re_] - a).astype(np.int64),  # cand -> local doc
                        chunks[rs:re_],
                        gpos[rs:re_],
                    )
                )

        from .build import _pkg_root

        pkg_root = _pkg_root()
        pat_src = regexp_filter
        args_t = tuple(args)
        part_f = partial

        def scan_task(batch: list) -> list:
            import re as _re
            import sys as _sys

            if pkg_root not in _sys.path:
                _sys.path.insert(0, pkg_root)
            import numpy as _np
            import pyarrow as _pa
            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            from microfts_ray.oracle import has_arg as _has
            from microfts_ray.pipelines.query import (
                _source_parquet as _spq,
            )

            pat = _re.compile(pat_src) if pat_src else None
            out = []
            for path, u_rg, u_row, c_upos, c_chunk, c_gpos in batch:
                f = _spq(path)
                urgs = _np.unique(u_rg)
                tbl = f.read_row_groups(
                    [int(x) for x in urgs], columns=["content"]
                )
                nr = _np.array(
                    [f.metadata.row_group(int(g)).num_rows for g in urgs],
                    dtype=_np.int64,
                )
                off = _np.zeros(urgs.size, dtype=_np.int64)
                _np.cumsum(nr[:-1], out=off[1:])
                pos = off[_np.searchsorted(urgs, u_rg)] + u_row
                docs_arr = tbl["content"].combine_chunks().take(_pa.array(pos))
                # vectorized split_lines (tokenize.py): one C-level
                # split of every unique doc, then a flat gather of the
                # candidate lines — the per-doc Python str.split +
                # per-candidate list indexing was the scan tasks' hot
                # loop at 1M+ candidate rows. split('\n')[:-1]
                # semantics: a chunk is valid iff chunk < n_parts - 1
                # (the unterminated tail fragment is dropped); an
                # out-of-range chunk stays a row with "" text, exactly
                # like the scalar path did.
                split = _pc.split_pattern(docs_arr, pattern="\n")
                sp_off = split.offsets.to_numpy().astype(_np.int64)
                flat = split.values
                u = _np.asarray(c_upos, dtype=_np.int64)
                c = _np.asarray(c_chunk, dtype=_np.int64)
                n_parts = sp_off[u + 1] - sp_off[u]
                valid = c < (n_parts - 1)
                li = _np.where(valid, sp_off[u] + c, 0)
                texts_all = flat.take(_pa.array(li))
                if not valid.all():
                    texts_all = _pc.if_else(
                        _pa.array(valid), texts_all, ""
                    )
                g_arr = _np.asarray(c_gpos, dtype=_np.int64)
                if pat is None and not args_t:
                    # no-verify mode (fuzzy): every candidate survives
                    # with its gathered line — no Python loop at all
                    out.append(
                        (
                            g_arr,
                            _np.zeros(g_arr.size, _np.int64),
                            texts_all,
                        )
                    )
                    continue
                sel, offs, lines = [], [], []
                for j, text in enumerate(texts_all.to_pylist()):
                    if pat is not None and not pat.search(text):
                        continue
                    ofs = [_has(text, a, part_f) for a in args_t]
                    if any(o < 0 for o in ofs):
                        continue
                    sel.append(int(g_arr[j]))
                    offs.append(min(ofs) if ofs else 0)
                    lines.append(text)
                out.append(
                    (
                        _np.array(sel, _np.int64),
                        _np.array(offs, _np.int64),
                        _pa.array(lines, _pa.string()),
                    )
                )
            return out

        import ray as _ray

        if gpos.size >= 16384 and len(items) > 1 and _ray.is_initialized():
            remote = _ray.remote(num_cpus=1)(scan_task)
            n_tasks = min(16, len(items))
            futs = [remote.remote(items[i::n_tasks]) for i in range(n_tasks)]
            for fut in futs:
                out_parts.extend(_ray.get(fut))
        else:
            out_parts.extend(scan_task(items))

        if not out_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64), []
        sel = np.concatenate([m[0] for m in out_parts])
        offs = np.concatenate([m[1] for m in out_parts])
        arrs = [
            m[2] if isinstance(m[2], pa.Array) else pa.array(m[2], pa.string())
            for m in out_parts
        ]
        lines_arr = pa.concat_arrays(arrs) if len(arrs) > 1 else arrs[0]
        # vectorized reorder to input order: Arrow take + ONE to_pylist
        # (a per-row Python gather over 1M+ lines was a measured tax)
        order = np.argsort(sel, kind="stable")
        taken = lines_arr.take(pa.array(order))
        return sel[order], offs[order], taken if as_arrow else taken.to_pylist()

    def _cache_contents(self, ids, contents) -> None:
        cc = self._content_cache
        n = 0
        for d, c in zip(ids, contents):
            cc[int(d)] = c
            n += len(c)
        self._content_chars += n

    def _fetch_positional(
        self,
        ids: np.ndarray,
        paths: np.ndarray,
        rgs: np.ndarray,
        rows: np.ndarray,
    ) -> None:
        """Positional content recovery: per file, one content-only
        read_row_groups + a vectorized take at (rg, row). Fans out as
        Ray tasks (plain pyarrow closures — no package bootstrap)."""
        codes_u, codes = np.unique(paths, return_inverse=True)
        order = np.lexsort((rows, rgs, codes))
        ids, rgs, rows, codes = ids[order], rgs[order], rows[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1]))
        )
        bounds = np.concatenate((starts, [codes.size]))
        items = []  # (path, rgs, rows, ids) per source file
        total_rgs = 0
        for k in range(starts.size):
            s, e = int(bounds[k]), int(bounds[k + 1])
            path = str(codes_u[codes[s]])
            # chop a file's span into ~64-row-group chunks so the Ray
            # fan-out stays balanced when one file holds most hits
            rg_span = rgs[s:e]
            cuts = [s]
            uniq_rgs = np.unique(rg_span)
            total_rgs += uniq_rgs.size
            if uniq_rgs.size > 64:
                for pos in range(64, uniq_rgs.size, 64):
                    cuts.append(s + int(np.searchsorted(rg_span, uniq_rgs[pos])))
            cuts.append(e)
            for a, b in zip(cuts[:-1], cuts[1:]):
                if b > a:
                    items.append((path, rgs[a:b], rows[a:b], ids[a:b]))

        from .build import _pkg_root as _pr

        pkg_root_f = _pr()

        def fetch(batch: list) -> list:
            import sys as _sys

            if pkg_root_f not in _sys.path:
                _sys.path.insert(0, pkg_root_f)
            import numpy as _np
            import pyarrow as _pa

            from microfts_ray.pipelines.query import (
                _source_parquet as _spq,
            )

            out = []
            for path, rg_a, row_a, id_a in batch:
                f = _spq(path)
                u = _np.unique(rg_a)
                tbl = f.read_row_groups([int(x) for x in u], columns=["content"])
                nr = _np.array(
                    [f.metadata.row_group(int(g)).num_rows for g in u],
                    dtype=_np.int64,
                )
                off = _np.zeros(u.size, dtype=_np.int64)
                _np.cumsum(nr[:-1], out=off[1:])
                pos = off[_np.searchsorted(u, rg_a)] + row_a
                vals = (
                    tbl["content"].combine_chunks().take(_pa.array(pos)).to_pylist()
                )
                out.append((id_a, vals))
            return out

        import ray as _ray

        if total_rgs >= 16 and len(items) > 1 and _ray.is_initialized():
            remote = _ray.remote(num_cpus=1)(fetch)
            n_tasks = min(16, len(items))
            futs = [remote.remote(items[i::n_tasks]) for i in range(n_tasks)]
            for fut in futs:
                for id_a, vals in _ray.get(fut):
                    self._cache_contents(id_a, vals)
        else:
            for id_a, vals in fetch(items):
                self._cache_contents(id_a, vals)

    def _fetch_by_ids(
        self, ids: np.ndarray, paths: np.ndarray, rgs: np.ndarray
    ) -> None:
        """Fallback for pre-src_row indexes: read id columns per row
        group and match by hashed doc id."""
        from ..stages.tokenize import doc_ids_column

        need: dict[tuple[str, int], list[int]] = {}
        for d, p, rg in zip(ids, paths, rgs):
            need.setdefault((str(p), int(rg)), []).append(int(d))
        for (path, rg), wanted in need.items():
            tbl = pq.ParquetFile(path).read_row_group(
                rg, columns=["repo", "path", "commit", "content"]
            )
            rids = doc_ids_column(tbl["repo"], tbl["path"], tbl["commit"])
            wset = set(wanted)
            hit = [i for i, did in enumerate(rids) if int(did) in wset]
            self._cache_contents(
                [int(rids[i]) for i in hit],
                [tbl["content"][i].as_py() for i in hit],
            )

    def chunk_start(self, doc_id: int, chunk_id: int) -> int:
        """1-based character position of a chunk in its doc (the
        reference's POSITION printf arg, fts-lmdb.go:1386)."""
        if int(doc_id) not in self._content_cache:
            # self-sufficient: fetch this doc's content on demand
            # (search no longer populates the content cache)
            self.chunk_texts(
                np.array([doc_id], np.uint64), np.array([chunk_id], np.uint64)
            )
        content = self._content_cache.get(int(doc_id), "")
        lines = split_lines(content)
        return sum(len(l) + 1 for l in lines[: int(chunk_id)]) + 1

    # -- search modes ------------------------------------------------------
    def search(
        self,
        *args: str,
        partial: bool = False,
        regexp_filter: str | None = None,
        limit_per_group: int | None = None,
    ) -> pa.Table:
        """Exact/partial AND search + verification (cmdSearch default
        path); ordering: group asc, chunk asc (K1/K2).

        Returns an Arrow table (group, doc_id, chunk_id, line, offset,
        text) — results stay zero-copy Arrow end-to-end (actor return,
        object store, driver); the CLI converts only the rows it
        prints. A broad query's result is ~one buffer, not millions of
        driver-side dicts."""
        cand = self.candidates(gram_set(*args, partial=partial))
        if cand is None or len(cand) == 0:
            return HITS_SCHEMA.empty_table()
        # reference semantics (fts-lmdb.go:1359, OracleIndex.search):
        # the per-group CANDIDATE list (sorted by chunk position) is
        # truncated to limit_per_group BEFORE verification — a gram
        # false positive in an early chunk consumes a slot even though
        # it fails verify.
        # vectorized ordering (group asc, chunk asc, doc asc) — a
        # Python tuple sort over millions of candidate rows was a
        # measured multi-second tax
        names, codes = self.doc_group_codes(cand.doc_ids)
        order = np.lexsort((cand.doc_ids, cand.chunk_ids, codes))
        d_arr = cand.doc_ids[order]
        c_arr = cand.chunk_ids[order]
        g_arr = codes[order]
        if limit_per_group is not None:
            # cumcount within each group run (arrays are group-sorted)
            starts = np.flatnonzero(
                np.concatenate(([True], g_arr[1:] != g_arr[:-1]))
            )
            sizes = np.diff(np.concatenate((starts, [g_arr.size])))
            cumcount = np.arange(g_arr.size) - np.repeat(starts, sizes)
            keep = cumcount < limit_per_group
            d_arr, c_arr, g_arr = d_arr[keep], c_arr[keep], g_arr[keep]
        if d_arr.size == 0:
            return HITS_SCHEMA.empty_table()
        sel, offsets, texts = self.scan_rows(
            d_arr, c_arr, args=args, partial=partial,
            regexp_filter=regexp_filter, as_arrow=True,
        )
        if sel.size == 0:
            return HITS_SCHEMA.empty_table()
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(texts, pa.string())
        c_sel = c_arr[sel].astype(np.int64, copy=False)
        return pa.table(
            {
                "group": pa.array(names[g_arr[sel]], pa.string()),
                "doc_id": pa.array(d_arr[sel].astype(np.int64, copy=False)),
                "chunk_id": pa.array(c_sel),
                "line": pa.array(c_sel + 1),
                "offset": pa.array(offsets.astype(np.int64, copy=False)),
                "text": texts,
            },
            schema=HITS_SCHEMA,
        )

    def fuzzy(
        self,
        *args: str,
        threshold: float,
        sort_all: bool = False,
        limit: int | None = None,
    ) -> pa.Table:
        """Fuzzy gram-overlap (fuzzyMatch, fts-lmdb.go:1530-1550).

        Returns an Arrow table (group, doc_id, chunk_id, line, percent,
        text) in result order — broad fuzzy queries match ~every chunk,
        so the result stays a handful of Arrow buffers instead of
        millions of driver-side Python dicts (a measured 100+ s
        single-process tax under this VM's per-process bandwidth
        collapse, and an unbounded driver materialization at scale).
        `limit` caps the ordered result to its first N rows — the
        deterministic analogue of the reference's `-limit`
        (fts-lmdb.go:1352-1360 truncates the UNSORTED hits map at
        cfg.limit, i.e. Go-map-iteration nondeterministic); the cap is
        applied before text gather so capped queries never ship the
        full text column."""
        grams = sorted(gram_set(*args, partial=True))
        if not grams:
            return FUZZY_SCHEMA.empty_table()
        if self._dense_space() is not None:
            # dense overlap counting: one counter pass per gram
            doc_ids, base = self._dense
            K = int(base[-1])
            count = np.zeros(K, dtype=np.uint16)
            for g in grams:
                keys = self._term_keys(g)
                if keys.size == 0:
                    return FUZZY_SCHEMA.empty_table()
                count[keys] += 1
            hit = np.nonzero(count)[0]
            n = count[hit].astype(np.float64)
            idx = np.searchsorted(base, hit, side="right") - 1
            d = doc_ids[idx]
            c = (hit - base[idx]).astype(np.uint64)
        else:
            docs, chunks, counts = [], [], []
            for g in grams:
                run = self.term_postings(g)
                if len(run) == 0:
                    return FUZZY_SCHEMA.empty_table()
                docs.append(run.doc_ids)
                chunks.append(run.chunk_ids)
                counts.append(np.ones(len(run)))
            d, c, (n,) = pair_group_sum(
                np.concatenate(docs), np.concatenate(chunks), np.concatenate(counts)
            )
        live = self._live_mask(d)
        d, c, n = d[live], c[live], n[live]
        pct = n / len(grams)
        keep = pct >= threshold
        d, c, pct = d[keep], c[keep], pct[keep]
        if d.size == 0:
            return FUZZY_SCHEMA.empty_table()
        # vectorized result ordering: per-unique-doc group codes, one
        # lexsort — a Python tuple-key sort over millions of hit rows
        # was a multi-second tax. Ordering needs no text, so the cap
        # applies BEFORE the scan: the distributed read only ever
        # touches rows the result will contain.
        names, codes = self.doc_group_codes(d)
        pct100 = pct * 100.0
        if sort_all:
            order = np.lexsort((c, codes, pct100))
        else:
            order = np.lexsort((c, -pct100, codes))
        if limit is not None:
            order = order[: max(0, int(limit))]
        d_o = d[order]
        c_o = c[order]
        # no-verify mode: every candidate survives in input order, so
        # passing the already-ordered rows returns texts aligned 1:1 —
        # the result is a handful of Arrow buffers, never driver dicts
        _, _, texts = self.scan_rows(d_o, c_o, as_arrow=True)
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(texts, pa.string())
        co = c_o.astype(np.int64, copy=False)
        return pa.table(
            {
                "group": pa.array(names[codes[order]], pa.string()),
                "doc_id": pa.array(d_o.astype(np.int64, copy=False)),
                "chunk_id": pa.array(co),
                "line": pa.array(co + 1),
                "percent": pa.array(pct100[order], pa.float64()),
                "text": texts,
            },
            schema=FUZZY_SCHEMA,
        )

    def search_file(self, *args: str, partial: bool = False) -> list[dict]:
        """Doc-level conjunction (intersectFileGrams, X2)."""
        for g in gram_set(*args, partial=partial):
            if self.chunk_df(g) == 0:
                return []
        per_doc: dict[int, list[list[int]]] = {}
        for i, arg in enumerate(args):
            cand = self.candidates(gram_set(arg, partial=partial))
            if cand is None:
                return []
            sel, _, _ = self.scan_rows(
                cand.doc_ids, cand.chunk_ids, args=(arg,), partial=partial
            )
            for d, c in zip(cand.doc_ids[sel], cand.chunk_ids[sel]):
                per_doc.setdefault(int(d), [[] for _ in args])[i].append(int(c))
        out = [
            {
                "group": self.doc_group(d),
                "doc_id": d,
                "first_chunks": [min(cs) for cs in per_arg],
            }
            for d, per_arg in per_doc.items()
            if all(per_arg)
        ]
        out.sort(key=lambda r: r["group"])
        return out

    # -- BM25 --------------------------------------------------------------
    def _idf(self, df: int) -> float:
        return _idf_val(self.n_chunks, df)

    def _contrib(self, w: float, tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
        return _contrib_arr(w, tf, dl, self.avgdl)

    def bm25_topk(
        self, query: str, k: int = 10, prune_threshold: int = 200_000
    ) -> list[dict]:
        """Chunk-level BM25 top-k, bit-identical to
        OracleIndex.bm25_topk (same accumulation order).

        Small posting volumes take the exhaustive union path; large
        ones take MaxScore pruning (term-at-a-time in descending
        upper-bound order; once the remaining terms' bound sum falls
        below the running k-th partial score, no new candidate can
        enter the top-k, so hot terms become candidate-only gathers).
        The pruned path over-fetches 4k candidates and RESCORES them
        exactly in ascending-term order, so returned scores and ranks
        are identical to the oracle either way.
        """
        grams = sorted(gram_set(query))
        infos = [(g, self.chunk_df(g)) for g in grams]
        infos = [(g, n) for g, n in infos if n > 0]
        if not infos:
            return []
        # first-touch queries inside a single-process bandwidth
        # collapse: decode the missing hot terms in parallel tasks
        # instead of serially in-process (no-op once warm / at
        # healthy ambient / without Ray or the parked shared tuple)
        self._ensure_terms_warm(infos)
        total = sum(n for _, n in infos)
        dense = self._dense_space()
        if total <= prune_threshold:
            d, c, score = self._bm25_union([g for g, _ in infos])
        elif dense is not None:
            d, c, score = self._dense_topk([g for g, _ in infos], k)
        else:
            d, c = self._bm25_candidates_maxscore(infos, k)
            score = self._rescore_exact([g for g, _ in infos], d, c)
        order = np.lexsort((c, d, -score))
        top = order[:k]
        return [
            {
                "rank": i + 1,
                "doc_id": int(d[j]),
                "chunk_id": int(c[j]),
                "score": float(score[j]),
                "group": self.doc_group(int(d[j])),
                "line": int(c[j]) + 1,
            }
            for i, j in enumerate(top)
        ]

    def _dense_space(
        self, cap: int | None = None
    ) -> tuple[np.ndarray, int] | None:
        """(sorted doc_ids, stride) for the dense scoring key space
        doc_idx * stride + chunk_id, or None above `cap` keys
        (default 2^26; MICROFTS_DENSE_CAP overrides — e.g. 0 forces
        the 10^12-doc MaxScore serving regime at any corpus size).

        The dense path is the single-node fast path: our scoring unit
        universe (docs x max lines) fits comfortably in one float64
        vector at sandbox scale, turning union scoring into
        bincount adds — no sorting at all. At 10^12-doc scale
        _dense_space returns None and MaxScore pruning takes over.
        """
        import os as _os

        if cap is None:
            # instance override first (set by code that must agree
            # with a DRIVER-resolved cap across processes — e.g. the
            # merge's derive task — per the driver-evaluated-env
            # contract), then the env, then the 2^26 default
            cap = getattr(self, "_dense_cap_override", None)
        if cap is None:
            cap = int(
                _os.environ.get("MICROFTS_DENSE_CAP", str(1 << 26))
            )
        if self._dense is None:
            ids, chunks = [], []
            for _si, d in self._docs_tables():
                ids.append(d["doc_id"].to_numpy())
                span_col = "chunk_span" if "chunk_span" in d.column_names else "n_chunks"
                chunks.append(d[span_col].to_numpy())
            doc_ids = np.concatenate(ids)
            n_chunks = np.concatenate(chunks)
            order = np.argsort(doc_ids)
            doc_ids = doc_ids[order]
            spans = n_chunks[order]
            if doc_ids.size > 1 and (doc_ids[1:] == doc_ids[:-1]).any():
                # duplicate doc rows (add_chunk deltas): one key range
                # per doc, span = max row span — keys must be unique
                doc_ids, inv = np.unique(doc_ids, return_inverse=True)
                ms = np.zeros(doc_ids.size, dtype=np.int64)
                np.maximum.at(ms, inv, spans.astype(np.int64))
                spans = ms
            # global chunk offsets: key space = total chunks, not
            # docs x max-lines (3x smaller accumulators)
            base = np.zeros(doc_ids.size + 1, dtype=np.int64)
            np.cumsum(spans, out=base[1:])
            self._dense = (doc_ids, base)
        doc_ids, base = self._dense
        if base[-1] > cap:
            return None
        return self._dense

    def _dense_key(self, g: int, run: PostingRun) -> np.ndarray:
        key = self._dense_keys.get(g)
        if key is None:
            doc_ids, base = self._dense
            idx = np.searchsorted(doc_ids, run.doc_ids)
            key = base[idx] + run.chunk_ids.astype(np.int64)
            if g in self._run_cache:
                self._dense_keys[g] = key
        return key

    def _sorted_keys(self, g: int) -> tuple[np.ndarray, np.ndarray] | None:
        """(sorted dense keys, aligned exact f64 contribs) for a term.
        Keys are a concatenation of per-run ASCENDING sequences, so
        the stable argsort is effectively a k-way merge (near-linear).
        Cached; powers the exact-rescore gather."""
        sk = self._sorted_kc.get(g)
        if sk is None:
            run = self.term_postings(g)
            if len(run) == 0:
                return None
            keys = self._dense_key(g, run)
            contrib = self._term_contrib(g, run)
            order = np.argsort(keys, kind="stable")
            sk = (keys[order], contrib[order])
            self._sorted_kc[g] = sk
            self._term_len_cache[g] = len(run)
        return sk

    def _term_keys(self, g: int) -> np.ndarray:
        """Dense keys for a term (any order — used by order-
        independent counting kernels); prefers the warm sorted form."""
        sk = self._sorted_kc.get(g)
        if sk is not None:
            return sk[0]
        run = self.term_postings(g)
        return self._dense_key(g, run)

    def _rescore_exact_dense(self, grams: list[int], kc: np.ndarray) -> np.ndarray:
        """Exact float64 scores for candidate dense keys: ascending-
        term sequential accumulation via searchsorted gathers against
        each term's sorted key->contrib arrays (oracle float order)."""
        score = np.zeros(kc.size, dtype=np.float64)
        for g in grams:  # ascending
            sk = self._sorted_keys(g)
            if sk is None:
                continue
            keys_s, contrib_s = sk
            # warm (fmt 2) keys are int32: cast the SMALL needle to
            # the haystack dtype — mixed-dtype searchsorted would cast
            # the whole sorted array per call (O(n) per term per
            # query). Values always fit: both are dense keys.
            nk = kc if kc.dtype == keys_s.dtype else kc.astype(keys_s.dtype)
            idx = np.searchsorted(keys_s, nk)
            idx = np.minimum(idx, keys_s.size - 1)
            hit = keys_s[idx] == nk
            score[hit] += contrib_s[idx[hit]]
        return score

    def _dense_vec(self, g: int) -> np.ndarray | None:
        """Cached float32 dense score vector for a hot term: contribs
        scattered at the term's dense keys (keys are UNIQUE per term).
        Vectors drive CANDIDATE SELECTION only — final scores come
        from an exact float64 rescore — so float32 halves the memory
        traffic of the query-time adds on this bandwidth-bound box.

        The lazy BUILD is ambient-gated: a build touches ~3x 4*K
        bytes (zero-fill + scatter + first use), a one-time cost that
        amortizes at healthy bandwidth but measured 63 s for the
        first 20-query pass inside a collapse episode. Below the gate
        the caller falls back to the direct sorted-add (~2x the
        steady per-query bytes, no build spike — first pass == steady
        pass), and the build happens on the first query after the
        episode lifts (the probe is re-measured every ~20 s).
        Plasma-parked vectors load regardless — they cost nothing."""
        vec = self._vec_cache.get(g)
        if vec is None:
            sk = self._sorted_keys(g)
            if sk is None or sk[0].size < self._vec_min:
                return None
            K = int(self._dense[1][-1])
            if self._vec_bytes + K * 4 > self._vec_budget:
                return None
            if _cached_gbps() < 1.5:
                return None  # collapse: no build spike, sorted-add
            # per-probe-window build-time budget: the episode can flip
            # mid-pass (probe healthy at query 1, collapsed by query
            # 5), and an unbounded build loop then spikes the first
            # pass anyway — cap cumulative build seconds per probe
            # window; vectors keep accumulating across windows
            import os as _os
            import time as _time

            win = _PROBE_CACHE["t"]
            if getattr(self, "_vec_build_win", None) != win:
                self._vec_build_win = win
                self._vec_build_spent = 0.0
            budget = float(
                _os.environ.get("MICROFTS_QUERY_VEC_SECONDS", "2")
            )
            if budget > 0 and self._vec_build_spent > budget:
                return None
            tb0 = _time.perf_counter()
            vec = np.zeros(K, dtype=np.float32)
            vec[sk[0]] = sk[1]  # ascending keys: near-sequential writes
            self._vec_build_spent += _time.perf_counter() - tb0
            self._vec_cache[g] = vec
            self._vec_bytes += vec.nbytes
        return vec

    def _bm25_dense(self, grams: list[int]):
        """Approximate union scoring over the dense chunk-key space
        for candidate selection: one float32 accumulator, per-term
        adds in ascending order (a term's keys are unique, so
        `acc[keys] += w` is one add per pair per term). Hot terms add
        their cached dense vector (sequential memory). The result is
        only used to pick a candidate set with a slack margin that
        provably covers the float32 error bound; exact float64
        rescoring restores oracle-identical scores."""
        doc_ids, base = self._dense
        K = int(base[-1])
        acc = np.zeros(K, dtype=np.float32)
        any_term = False
        vecs = []
        for g in grams:  # ascending
            vec = self._dense_vec(g)
            if vec is not None:
                vecs.append(vec)
                any_term = True
                continue
            sk = self._sorted_keys(g)
            if sk is None:
                continue
            acc[self._add_keys32(g, sk)] += self._add_c32(g, sk)
            any_term = True
        if len(vecs) == 1:
            acc += vecs[0]
        elif vecs:
            # fused chunked sum: per 1 MB slice the accumulator stays
            # cache-resident across all terms' adds, so the traffic is
            # one read per vector + one write, not a full acc
            # read+write per term (pairwise `acc += vec` costs ~3x on
            # this bandwidth-bound host). Candidate selection only —
            # the f32 slack bound is operation-count-based, unchanged.
            step = 1 << 18
            for s in range(0, K, step):
                a = acc[s : s + step]
                for vec in vecs:
                    a += vec[s : s + step]
        if not any_term:
            return None, doc_ids, base
        return acc, doc_ids, base

    def _add_keys32(self, g: int, sk) -> np.ndarray:
        """int32 view/copy of a term's sorted dense keys for the
        vector-less accumulator add: the dense key space is capped at
        2^26 (_dense_space cap), so int32 always fits, and halving
        the gather bytes matters on this bandwidth-bound box — the
        add path runs EVERY query for terms whose f32 vector is
        ambient-gated off. Cached per term (bounded by the same
        entry budget as the f32 contribs).

        int32 is only valid while the dense key space fits: the cap
        defaults to 2^26 but MICROFTS_DENSE_CAP can raise it, and a
        wrapped key would silently scatter a contribution onto the
        wrong chunk (numpy accepts negative fancy indices) — above
        INT32_MAX the original int64 keys are used as-is."""
        if int(self._dense[1][-1]) > np.iinfo(np.int32).max:
            return sk[0]
        if sk[0].dtype == np.int32:
            # fmt-2 warm keys are already int32 (and plasma-shared):
            # no private copy, no cache entry
            return sk[0]
        k32 = self._add32_cache.get(g)
        if k32 is None:
            k32 = sk[0].astype(np.int32)
            if self._add32_bytes + k32.nbytes <= self._add32_budget:
                self._add32_cache[g] = k32
                self._add32_bytes += k32.nbytes
        return k32

    def _add_c32(self, g: int, sk) -> np.ndarray:
        """float32 contribs for the accumulator add — the SAME values
        `sk[1].astype(np.float32)` produced per query before, so the
        f32 selection sums (and the slack bound that covers them) are
        bit-identical; caching just stops re-converting 8 bytes/entry
        on every query."""
        c32 = self._addc32_cache.get(g)
        if c32 is None:
            c32 = sk[1].astype(np.float32)
            if self._add32_bytes + c32.nbytes <= self._add32_budget:
                self._addc32_cache[g] = c32
                self._add32_bytes += c32.nbytes
        return c32

    def _term_contrib(self, g: int, run: PostingRun) -> np.ndarray:
        contrib = self._contrib_cache.get(g)
        if contrib is None:
            contrib = self._contrib(self._idf(len(run)), run.tfs, run.dls)
            if g in self._run_cache:
                self._contrib_cache[g] = contrib
        return contrib

    def _dense_topk(self, grams: list[int], k: int):
        """Approximate dense scoring -> slack-margin candidate set ->
        EXACT float64 rescore. The slack covers the worst-case float32
        accumulation error (m terms x max contrib x 2^-23 plus the
        representation error of each addend), so the candidate set
        provably contains every pair whose exact score reaches the
        true kth — returned scores/ranks are oracle-identical."""
        acc, doc_ids, base = self._bm25_dense(grams)
        if acc is None:
            e = np.empty(0, dtype=np.uint64)
            return e, e, np.empty(0, dtype=np.float64)
        if self._tombstones.size:
            # zero the tombstoned docs' key ranges (few tombstones)
            pos = np.searchsorted(doc_ids, self._tombstones)
            for p, t in zip(pos, self._tombstones):
                if p < doc_ids.size and doc_ids[p] == t:
                    acc[int(base[p]) : int(base[p + 1])] = 0.0
        K = acc.size
        if K > k:
            kth = float(np.partition(acc, K - k)[K - k])
        else:
            kth = 0.0
        # float32 error bound: standard summation bound |err| <=
        # (m-1)*eps*sum|x_i| <= m^2*eps*max_c, doubled for the f32
        # representation rounding of each addend, doubled again for
        # margin (still ~1e-3 absolute at worst — invisible next to
        # real score gaps, but a PROOF, not a heuristic)
        m = len(grams)
        max_c = max(
            (self._idf(self.chunk_df(g)) * (K1 + 1) for g in grams), default=0.0
        )
        slack = 4.0 * m * m * max_c * 2.0**-23 + 1e-12
        if kth > slack:
            hit = np.nonzero(acc >= np.float32(kth - slack))[0]
        else:
            hit = np.nonzero(acc)[0]
        score = self._rescore_exact_dense(grams, hit)
        if score.size > k:
            kth_exact = -np.partition(-score, k - 1)[k - 1]
            keep = score >= kth_exact  # all boundary ties kept
            hit, score = hit[keep], score[keep]
        idx = np.searchsorted(base, hit, side="right") - 1
        return doc_ids[idx], (hit - base[idx]).astype(np.uint64), score

    def _bm25_union(self, grams: list[int]):
        """Exhaustive union scoring, oracle accumulation order."""
        docs, chunks, contribs = [], [], []
        for g in grams:  # ascending term order
            run = self.term_postings(g)
            if len(run) == 0:
                continue
            w = self._idf(len(run))
            docs.append(run.doc_ids)
            chunks.append(run.chunk_ids)
            contribs.append(self._contrib(w, run.tfs, run.dls))
        d, c, inv = pair_unique(np.concatenate(docs), np.concatenate(chunks))
        score = np.zeros(d.size, dtype=np.float64)
        pos = 0
        for contrib in contribs:
            score[inv[pos : pos + contrib.size]] += contrib
            pos += contrib.size
        live = self._live_mask(d)
        return d[live], c[live], score[live]

    def _admit_blocks(self, g: int, w: float, min_ub: float):
        """Block-max WAND decode: decode ONLY the blocks whose
        upper-bound contribution contrib(bmax_tf, bmin_dl) can reach
        min_ub (contrib is monotone increasing in tf and decreasing in
        dl, so the block metadata gives a true per-entry bound —
        /root/reference/fts-lmdb.go:1497-1528's smallest-first spirit
        at block granularity). Returns (doc, chunk, tf, dl); updates
        the blocks_admit_total/skipped counters."""
        from ..functions.postings import decode_block_meta, decode_run_blocks

        docs, chunks, tfs, dls = [], [], [], []
        for seg in self._term_sources(g):
            sl = seg.term_slice(g)
            if sl is None or sl.num_rows == 0:
                continue
            for row in sl.to_pylist():
                n = int(row["n"])
                if n == 0:
                    continue
                bmax_tf, bmin_dl, _bf = decode_block_meta(row)
                # relative safety margin: the bound holds in real
                # arithmetic; a few ulps cover float rounding between
                # the bound's evaluation and a per-entry contrib
                ub = self._contrib(w, bmax_tf, bmin_dl) * (1.0 + 1e-9) + 1e-12
                sel = np.flatnonzero(ub >= min_ub)
                self.blocks_admit_total += bmax_tf.size
                self.blocks_admit_skipped += bmax_tf.size - sel.size
                if sel.size == 0:
                    continue
                bdoc, bchunk, btf, bdl = decode_run_blocks(row, sel)
                did = row.get("dict", "")
                if did:
                    bdoc = self._resolve_dict(did)[bdoc.astype(np.int64)]
                if len(row.get("dl_blob", b"")) == 0:
                    bdl = self._chunk_dls(bdoc, bchunk)  # sidecar-dl
                docs.append(bdoc)
                chunks.append(bchunk)
                tfs.append(btf)
                dls.append(bdl)
        if not docs:
            e = np.empty(0, dtype=np.uint64)
            return e, e.copy(), e.copy(), e.copy()
        return (
            np.concatenate(docs),
            np.concatenate(chunks),
            np.concatenate(tfs),
            np.concatenate(dls),
        )

    def _bm25_candidates_maxscore(self, infos, k: int, overfetch: int = 4):
        """Candidate (doc, chunk) set guaranteed to contain the true
        top-k: MaxScore admission with term bound U_g = idf_g * (K1+1)
        refined per 128-entry block by the stored bmax_tf/bmin_dl
        metadata once the accumulator is full (theta > 0): a block of
        a hot term whose block bound + remaining-term bound can't
        reach theta is never decoded, and existing candidates take
        that term's contribution through the block-selective gather
        instead. accS is a SELECTION score only — the caller rescores
        candidates exactly — but it is kept complete over admitted
        pairs so the kk-truncation below stays a true MaxScore set."""
        desc = sorted(infos, key=lambda gn: -self._idf(gn[1]))
        bounds = np.array([self._idf(n) * (K1 + 1) for _, n in desc])
        suffix = np.concatenate((np.cumsum(bounds[::-1])[::-1], [0.0]))
        accD = np.empty(0, dtype=np.uint64)
        accC = np.empty(0, dtype=np.uint64)
        accS = np.empty(0, dtype=np.float64)
        kk = k * overfetch
        block_terms: list[tuple[int, float]] = []  # block-mode terms so far
        for i, (g, n_g) in enumerate(desc):
            theta = (
                -np.partition(-accS, kk - 1)[kk - 1] if accS.size >= kk else 0.0
            )
            if theta > 0.0 and suffix[i] < theta:
                # remaining (hot) terms cannot promote unseen pairs:
                # candidate-only gathers via the block skip-index
                for g2, n2 in desc[i:]:
                    if n2 == 0:
                        continue
                    tf2, dl2, hit = self._pairs_tfdl(g2, accD, accC)
                    if not hit.any():
                        continue
                    w = self._idf(n2)
                    accS[hit] += self._contrib(w, tf2[hit], dl2[hit])
                break
            min_ub = theta - suffix[i + 1]
            if theta > 0.0 and min_ub > 0.0 and n_g > 0:
                # block-max admission: new pairs only from blocks that
                # can reach theta; existing candidates still take this
                # term's contribution via the selective gather
                w = self._idf(n_g)
                tf2, dl2, hit = self._pairs_tfdl(g, accD, accC)
                if hit.any():
                    accS[hit] += self._contrib(w, tf2[hit], dl2[hit])
                bdoc, bchunk, btf, bdl = self._admit_blocks(g, w, min_ub)
                if bdoc.size:
                    new = self._live_mask(bdoc) & ~pair_isin(
                        bdoc, bchunk, accD, accC
                    )
                    if new.any():
                        nD, nC = bdoc[new], bchunk[new]
                        nS = self._contrib(w, btf[new], bdl[new])
                        # keep accS COMPLETE for admitted pairs: a pair
                        # first seen here may live in skipped blocks of
                        # EARLIER block-mode terms — gather those
                        # contributions so the kk-truncation below
                        # ranks every candidate by its true partial sum
                        for g0, w0 in block_terms:
                            tf0, dl0, h0 = self._pairs_tfdl(g0, nD, nC)
                            if h0.any():
                                nS[h0] += self._contrib(w0, tf0[h0], dl0[h0])
                        accD = np.concatenate([accD, nD])
                        accC = np.concatenate([accC, nC])
                        accS = np.concatenate([accS, nS])
                block_terms.append((g, w))
                continue
            run = self.term_postings(g)
            if len(run) == 0:
                continue
            w = self._idf(len(run))
            contrib = self._contrib(w, run.tfs, run.dls)
            # drop tombstoned pairs BEFORE they enter the accumulator:
            # theta is the kk-th partial score over candidates, and dead
            # docs in the top-kk slots would inflate it and stop
            # admission of live pairs that belong in the true top-k
            rlive = self._live_mask(run.doc_ids)
            d = np.concatenate([accD, run.doc_ids[rlive]])
            c = np.concatenate([accC, run.chunk_ids[rlive]])
            s = np.concatenate([accS, contrib[rlive]])
            accD, accC, inv = pair_unique(d, c)
            ns = np.zeros(accD.size, dtype=np.float64)
            np.add.at(ns, inv, s)
            accS = ns
        # truncate in full tie-break order (score desc, doc asc, chunk
        # asc) so equal-score boundary candidates keep the same
        # preference as the oracle's final ranking
        take = min(accS.size, kk)
        top = np.lexsort((accC, accD, -accS))[:take]
        return accD[top], accC[top]

    def _rescore_exact(self, grams: list[int], d: np.ndarray, c: np.ndarray):
        """Exact scores for a candidate set, ascending-term sequential
        accumulation (the oracle's float semantics). Uncached hot
        terms gather via the block skip-index, never a full decode."""
        score = np.zeros(d.size, dtype=np.float64)
        for g in grams:  # ascending
            n = self.chunk_df(g)
            if n == 0:
                continue
            tf, dl, hit = self._pairs_tfdl(g, d, c)
            if not hit.any():
                continue
            w = self._idf(n)
            score[hit] += self._contrib(w, tf[hit], dl[hit])
        return score

    def bm25_topk_docs(self, query: str, k: int = 10) -> list[dict]:
        """Doc-level BM25 (tf summed per doc, dl = doc total)."""
        grams = sorted(gram_set(query))
        dl_ids, dl_vals = self._doc_dl()
        docs, contribs = [], []
        for g in grams:
            run = self.term_postings(g)
            if len(run) == 0:
                continue
            dsum, (tfsum,) = group_sum(run.doc_ids, run.tfs.astype(np.float64))
            df = dsum.size
            w = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            # sorted-array lookup (dsum is sorted by group_sum);
            # clamped + checked: a silent wrong-dl gather would corrupt
            # scores undetectably (same contract as _chunk_dls)
            di = np.minimum(np.searchsorted(dl_ids, dsum), max(dl_ids.size - 1, 0))
            if dl_ids.size == 0 or not (dl_ids[di] == dsum).all():
                raise KeyError("posting doc_id missing from docs sidecars")
            dl = dl_vals[di].astype(np.float64)
            norm = K1 * (
                1 - B + B * (dl / self.doc_avgdl if self.doc_avgdl else dl * 0.0)
            )
            docs.append(dsum)
            contribs.append(w * (tfsum * (K1 + 1)) / (tfsum + norm))
        if not docs:
            return []
        alldocs = np.concatenate(docs)
        d, inv = np.unique(alldocs, return_inverse=True)
        score = np.zeros(d.size, dtype=np.float64)
        pos = 0
        for contrib in contribs:  # ascending term order = oracle order
            score[inv[pos : pos + contrib.size]] += contrib
            pos += contrib.size
        live = self._live_mask(d)
        d, score = d[live], score[live]
        order = np.lexsort((d, -score))
        top = order[:k]
        return [
            {
                "rank": i + 1,
                "doc_id": int(d[j]),
                "score": float(score[j]),
                "group": self.doc_group(int(d[j])),
            }
            for i, j in enumerate(top)
        ]

    def _doc_dl(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted doc_ids, aligned sum_dl) numpy pair — searchsorted
        lookups, no O(n_docs) Python dict."""
        if not hasattr(self, "_doc_dl_cache"):
            ids, dls = [], []
            for _si, d in self._docs_tables():
                ids.append(d["doc_id"].to_numpy().astype(np.uint64))
                dls.append(d["sum_dl"].to_numpy().astype(np.int64))
            a = np.concatenate(ids) if ids else np.empty(0, np.uint64)
            v = np.concatenate(dls) if dls else np.empty(0, np.int64)
            order = np.argsort(a, kind="stable")
            a, v = a[order], v[order]
            if a.size > 1 and (a[1:] == a[:-1]).any():
                # duplicate doc rows (add_chunk deltas): sum_dl per row
                # is a delta, so the doc total is the SUM across rows
                uniq, inv = np.unique(a, return_inverse=True)
                vs = np.zeros(uniq.size, dtype=np.int64)
                np.add.at(vs, inv, v)
                a, v = uniq, vs
            self._doc_dl_cache = (a, v)
        return self._doc_dl_cache


class QueryActor:
    """Serving actor: one IndexReader (with its decoded-run, dense-key
    and contribution caches) pinned in a long-lived process — the
    stateful query-serving stage of the north_star. Deploy as
    `ray.remote(QueryActor)` via QueryService."""

    def __init__(
        self, index_dir: str, prewarm: bool = True,
        vec_budget: int = 6 << 30, add32_budget: int | None = None,
    ):
        self.reader = IndexReader(
            index_dir, vec_budget=vec_budget, add32_budget=add32_budget
        )
        if prewarm:
            # in-actor prewarm stays sequential (the pool itself is
            # the parallelism; nested Ray tasks would oversubscribe).
            # persist=True: the first actor writes the warm cache,
            # every later actor of the pool mmaps it and shares the
            # physical pages — the pool holds ONE hot-set copy
            self.reader.prewarm(parallel=False, persist=True)

    def bm25_topk(self, query: str, k: int = 10) -> list[dict]:
        return self.reader.bm25_topk(query, k)

    def bm25_topk_docs(self, query: str, k: int = 10) -> list[dict]:
        return self.reader.bm25_topk_docs(query, k)

    def search(self, *args: str, **kw) -> pa.Table:
        # Arrow table return: ships zero-copy through the object store
        return self.reader.search(*args, **kw)

    def fuzzy(self, *args: str, **kw) -> pa.Table:
        return self.reader.fuzzy(*args, **kw)


class QueryService:
    """Round-robin front over a QueryActor pool. Each actor caches its
    own hot set; queries fan out without any shared mutable state
    (SURVEY.md §2.3 ST1 mapping)."""

    def __init__(self, index_dir: str, n_actors: int = 2, prewarm: bool = True):
        import ray as _ray

        from .build import _pkg_root

        pkg_root = _pkg_root()

        def make(
            index_dir: str, prewarm: bool, vec_budget: int, add32: int
        ):
            import sys

            if pkg_root not in sys.path:
                sys.path.insert(0, pkg_root)
            from microfts_ray.pipelines.query import QueryActor as QA

            return QA(
                index_dir, prewarm, vec_budget=vec_budget,
                add32_budget=add32,
            )

        # wrap construction so workers bootstrap sys.path first
        @_ray.remote
        class _Actor:
            def __init__(
                self, index_dir: str, prewarm: bool, vec_budget: int,
                add32: int,
            ):
                self.inner = make(index_dir, prewarm, vec_budget, add32)

            def call(self, method: str, args: tuple, kw: dict):
                return getattr(self.inner, method)(*args, **kw)

        # the dense-vector and add-pair budgets are HOST budgets:
        # divide them across the pool so N actors can't hold N
        # private full-size sets (both caches are per-process copies)
        import os as _os

        vec_budget = (6 << 30) // max(1, n_actors)
        add32_budget = int(
            _os.environ.get("MICROFTS_ADD32_BYTES", str(1 << 30))
        ) // max(1, n_actors)
        self._actors = [
            _Actor.remote(index_dir, prewarm, vec_budget, add32_budget)
            for _ in range(n_actors)
        ]
        self._rr = 0

    def _next(self):
        a = self._actors[self._rr % len(self._actors)]
        self._rr += 1
        return a

    def bm25_topk(self, query: str, k: int = 10) -> list[dict]:
        import ray as _ray

        return _ray.get(self._next().call.remote("bm25_topk", (query, k), {}))

    def search(self, *args: str, **kw) -> pa.Table:
        import ray as _ray

        return _ray.get(self._next().call.remote("search", args, kw))

    def fuzzy(self, *args: str, **kw) -> pa.Table:
        import ray as _ray

        return _ray.get(self._next().call.remote("fuzzy", args, kw))


class ShardQueryActor:
    """One term-range serving shard: an IndexReader that warms ONLY
    its [lo, hi) gram range — a pool of N is collectively warm after
    ~1/N of the whole-index decode per actor and holds ONE logical hot
    set. Serves per-term primitives for the front's threshold
    scatter-gather (top_entries/gather) plus whole routed queries
    (run); grams outside its range decode lazily when a routed query
    needs them."""

    def __init__(self, index_dir: str, lo: int, hi: int, min_entries: int = 10_000):
        self.reader = IndexReader(index_dir)
        self.lo, self.hi = int(lo), int(hi)
        self.reader.prewarm(
            min_entries=min_entries, parallel=False, term_range=(self.lo, self.hi)
        )
        self._by_contrib: dict[int, np.ndarray] = {}

    def warm_terms(self) -> list[int]:
        return sorted(self.reader._term_len_cache)

    def term_info(self, terms: list[int]) -> dict[int, int]:
        return {int(t): self.reader.chunk_df(int(t)) for t in terms}

    def info_top(self, reqs: list) -> dict:
        """Fused first round: [(term, stop)] -> {term: (df, keys,
        contribs, exhausted)} — one RPC instead of term_info +
        top_entries."""
        tops = self.top_entries([(t, 0, b) for t, b in reqs])
        return {
            int(t): (self.reader.chunk_df(int(t)), *tops[int(t)])
            for t, _b in reqs
        }

    def top_entries(self, reqs: list) -> dict:
        """[(term, start, stop)] -> {term: (keys, contribs, exhausted)}
        — the term's entries in contribution-DESC order (key asc on
        ties), positions [start, stop)."""
        out = {}
        for t, a, b in reqs:
            t, a, b = int(t), int(a), int(b)
            sk = self.reader._sorted_keys(t)
            if sk is None:
                out[t] = (np.empty(0, np.int64), np.empty(0, np.float64), True)
                continue
            order = self._by_contrib.get(t)
            if order is None:
                order = np.lexsort((sk[0], -sk[1]))
                self._by_contrib[t] = order
            sel = order[a:b]
            out[t] = (sk[0][sel], sk[1][sel], b >= order.size)
        return out

    def gather(self, reqs: tuple) -> dict:
        """(terms, dense_keys) -> {term: exact contribs at keys}
        (0.0 = key not in term; real contributions are > 0). One keys
        array serves every requested term — shipped once per owner."""
        terms, kc = reqs
        kc = np.asarray(kc, dtype=np.int64)
        out = {}
        for t in terms:
            t = int(t)
            sk = self.reader._sorted_keys(t)
            if sk is None or sk[0].size == 0:
                out[t] = np.zeros(kc.size, np.float64)
                continue
            keys_s, contrib_s = sk
            # needle-side cast (see _rescore_exact_dense): int32 warm
            # keys must not force a per-call haystack conversion
            nk = kc if kc.dtype == keys_s.dtype else kc.astype(keys_s.dtype)
            idx = np.minimum(np.searchsorted(keys_s, nk), keys_s.size - 1)
            hit = keys_s[idx] == nk
            c = np.zeros(kc.size, np.float64)
            c[hit] = contrib_s[idx[hit]]
            out[t] = c
        return out

    def run(self, method: str, args: tuple, kw: dict):
        return getattr(self.reader, method)(*args, **kw)

    def run_bm25(self, query: str, k: int = 10) -> list[dict]:
        """Routed whole-query bm25: bulk-warm this query's missing
        grams first (one sliced decode pass instead of N per-term
        decodes), then run the exact local path."""
        grams = sorted(gram_set(query))
        missing = [g for g in grams if g not in self.reader._sorted_kc]
        if missing and self.reader._dense_space() is not None:
            for t, (kk, cc, n) in self.reader.warm_terms_bulk(missing).items():
                self.reader._sorted_kc[t] = (kk, cc)
                self.reader._term_len_cache[t] = n
        return self.reader.bm25_topk(query, k)


class ShardedQueryService:
    """Term-range SHARDED serving tier: N actors each own a contiguous
    gram range of the merged shards (bounds from the manifest) and
    prewarm only it — cold serving readiness scales as 1/N per actor
    and adding actors adds ranges, not copies.

    bm25_topk runs a Fagin-style THRESHOLD scatter-gather over the
    owners: per-term contribution-descending lists are fetched in
    growing rounds, candidates rescored exactly via per-term gathers
    (ascending-term float adds — the oracle's accumulation order), and
    iteration stops when the k-th exact score beats the sum of the
    non-exhausted terms' last fetched contributions — unseen pairs are
    then provably out, so results are BIT-IDENTICAL to
    IndexReader.bm25_topk. search/fuzzy route whole to the rarest
    gram's owner. Requires a merged index; in the non-dense regime
    bm25 also routes whole (MaxScore runs on the owner)."""

    def __init__(
        self, index_dir: str, n_groups: int = 4, min_entries: int = 10_000
    ):
        import ray as _ray

        from .build import _pkg_root

        manifest = mf.load_manifest(index_dir)
        merged = manifest.get("merged")
        if not merged:
            raise ValueError("ShardedQueryService requires a merged index")
        bounds = merged["bounds"]
        n_sh = merged["n_shards"]
        n_groups = max(1, min(n_groups, n_sh))
        cuts = [bounds[(g * n_sh) // n_groups] for g in range(n_groups)]
        cuts.append(bounds[-1])
        self._range_lo = np.array(cuts[:-1], dtype=np.int64)
        self._ranges = list(zip(cuts[:-1], cuts[1:]))
        pkg_root = _pkg_root()

        @_ray.remote
        class _Shard:
            def __init__(self, index_dir, lo, hi, min_entries):
                import sys

                if pkg_root not in sys.path:
                    sys.path.insert(0, pkg_root)
                from microfts_ray.pipelines.query import ShardQueryActor as SA

                self.inner = SA(index_dir, lo, hi, min_entries)

            def call(self, method, args, kw):
                return getattr(self.inner, method)(*args, **kw)

        self._actors = [
            _Shard.remote(index_dir, lo, hi, min_entries)
            for lo, hi in self._ranges
        ]
        # front-side reader: doc metadata + dense space for result
        # assembly only — it never decodes postings
        self.reader = IndexReader(index_dir)
        self._ray = _ray
        self._df_cache: dict[int, int] = {}  # df is generation-stable
        # per-gram contrib-desc prefix lists, cached ACROSS queries
        # (tiny: top-m keys+contribs per seen gram): repeat-vocabulary
        # queries pay one gather round only
        self._top_cache: dict[int, list] = {}  # g -> [keys, contribs, ex, upto]

    def ready(self) -> list[list[int]]:
        """Block until every shard finished its range warm; returns
        each shard's warm term list (tests assert range containment)."""
        return self._ray.get(
            [a.call.remote("warm_terms", (), {}) for a in self._actors]
        )

    def _owner(self, term: int) -> int:
        i = int(np.searchsorted(self._range_lo, term, side="right")) - 1
        return min(max(i, 0), len(self._actors) - 1)

    def _fan(self, method: str, per_owner: dict) -> dict:
        futs = [
            self._actors[o].call.remote(method, (reqs,), {})
            for o, reqs in per_owner.items()
        ]
        out = {}
        for r in self._ray.get(futs):
            out.update(r)
        return out

    def _route_whole(self, method: str, grams, infos, args, kw):
        # whole-query routing: the rarest gram's owner runs it (other
        # grams decode lazily on that actor and stay in its run cache)
        g0 = min(grams, key=lambda g: infos[g])
        return self._ray.get(
            self._actors[self._owner(g0)].call.remote("run", (method, args, kw), {})
        )

    def _term_infos(self, grams) -> dict[int, int]:
        missing = [g for g in grams if g not in self._df_cache]
        if missing:
            per_owner: dict[int, list[int]] = {}
            for g in missing:
                per_owner.setdefault(self._owner(g), []).append(g)
            self._df_cache.update(self._fan("term_info", per_owner))
        return {g: self._df_cache[g] for g in grams}

    def bm25_topk(self, query: str, k: int = 10) -> list[dict]:
        grams = sorted(gram_set(query))
        if not grams:
            return []
        m = max(64, 4 * k)
        # fused first round for unseen grams: df + top list in one RPC
        need = [g for g in grams if g not in self._df_cache]
        if need:
            per_owner: dict[int, list] = {}
            for g in need:
                per_owner.setdefault(self._owner(g), []).append((g, m))
            for g, (df, kk_, cc_, ex) in self._fan("info_top", per_owner).items():
                self._df_cache[g] = df
                self._top_cache[g] = [kk_, cc_, bool(ex), m]
        infos = {g: self._df_cache[g] for g in grams}
        grams = [g for g in grams if infos[g] > 0]
        if not grams:
            return []
        dense = self.reader._dense_space()
        if dense is None:
            g0 = min(grams, key=lambda g: infos[g])
            return self._ray.get(
                self._actors[self._owner(g0)].call.remote(
                    "run_bm25", (query, k), {}
                )
            )
        doc_ids, base = dense
        rounds = 0
        while True:
            rounds += 1
            reqs_by_owner: dict[int, list] = {}
            for g in grams:
                tc = self._top_cache.get(g)
                if tc is None:
                    tc = [np.empty(0, np.int64), np.empty(0, np.float64), False, 0]
                    self._top_cache[g] = tc
                if not tc[2] and tc[3] < m:
                    reqs_by_owner.setdefault(self._owner(g), []).append(
                        (g, tc[3], m)
                    )
            if reqs_by_owner:
                for g, (kk_, cc_, ex) in self._fan(
                    "top_entries", reqs_by_owner
                ).items():
                    tc = self._top_cache[g]
                    tc[0] = np.concatenate([tc[0], kk_])
                    tc[1] = np.concatenate([tc[1], cc_])
                    tc[2] = bool(ex)
                    tc[3] = m
            cand = np.unique(
                np.concatenate([self._top_cache[g][0] for g in grams])
            )
            gterms: dict[int, list] = {}
            for g in grams:
                gterms.setdefault(self._owner(g), []).append(g)
            contribs = self._fan(
                "gather", {o: (ts, cand) for o, ts in gterms.items()}
            )
            score = np.zeros(cand.size, np.float64)
            for g in grams:  # ascending-term adds: oracle float order
                c = contribs[g]
                hit = c != 0.0
                score[hit] += c[hit]
            idx = np.searchsorted(base, cand, side="right") - 1
            d = doc_ids[idx]
            c_arr = (cand - base[idx]).astype(np.uint64)
            live = self.reader._live_mask(d)
            d, c_arr, score = d[live], c_arr[live], score[live]
            order = np.lexsort((c_arr, d, -score))
            all_ex = True
            T = 0.0
            for g in grams:
                kk_, cc_, ex, _u = self._top_cache[g]
                if not ex:
                    all_ex = False
                    T += float(cc_[-1]) if cc_.size else 0.0
            kth = float(score[order[k - 1]]) if order.size >= k else -1.0
            if all_ex or (order.size >= k and kth > T):
                top = order[:k]
                return [
                    {
                        "rank": i + 1,
                        "doc_id": int(d[j]),
                        "chunk_id": int(c_arr[j]),
                        "score": float(score[j]),
                        "group": self.reader.doc_group(int(d[j])),
                        "line": int(c_arr[j]) + 1,
                    }
                    for i, j in enumerate(top)
                ]
            if rounds >= 2:
                # flat-score corpora defeat the threshold bound (all
                # contributions near-equal, kth never beats T): route
                # the whole query to the rarest gram's owner instead of
                # paging ever-deeper lists through the front; the owner
                # bulk-warms the query's foreign grams once
                g0 = min(grams, key=lambda g: infos[g])
                return self._ray.get(
                    self._actors[self._owner(g0)].call.remote(
                        "run_bm25", (query, k), {}
                    )
                )
            m *= 4

    def search(self, *args: str, **kw) -> pa.Table:
        grams = sorted(gram_set(*args, partial=kw.get("partial", False)))
        if not grams:
            return HITS_SCHEMA.empty_table()
        infos = self._term_infos(grams)
        if any(infos.get(g, 0) == 0 for g in grams):
            # candidates() semantics: a missing gram empties
            return HITS_SCHEMA.empty_table()
        return self._route_whole("search", grams, infos, args, kw)

    def fuzzy(self, *args: str, **kw) -> pa.Table:
        grams = sorted(gram_set(*args, partial=True))
        if not grams:
            return FUZZY_SCHEMA.empty_table()
        infos = self._term_infos(grams)
        if any(infos.get(g, 0) == 0 for g in grams):
            # fuzzy() returns empty when any gram is missing
            return FUZZY_SCHEMA.empty_table()
        return self._route_whole("fuzzy", grams, infos, args, kw)


def _warm_dir_done(dd: str, sha: str | None, min_entries: int) -> int:
    """Per-dir resume check: a finished warm dir of this generation at
    AT-LEAST-this-depth counts as done (a dir emitted SHALLOWER than
    the current request must be redone, or the finished cache would
    claim coverage its skipped dirs don't have). Returns the dir's
    term count, or -1 when it must be (re)emitted."""
    import json
    import os

    meta_p = os.path.join(dd, "meta.json")
    if not os.path.exists(meta_p):
        return -1
    try:
        with open(meta_p) as f:
            meta = json.load(f)
        if (sha is None or meta.get("manifest_sha") == sha) and meta.get(
            "min_entries", 1 << 62
        ) <= min_entries:
            return len(meta["terms"])
    except (OSError, json.JSONDecodeError):
        pass
    return -1


# a term gets a dense f32 score vector when it has >= this many
# postings (IndexReader._vec_min default; emission pre-builds vectors
# for the same set so serving never pays the scatter)
def _vec_min_default() -> int:
    import os

    return int(os.environ.get("MICROFTS_VEC_MIN", 300_000))


class _WarmStoreImpl:
    """Session-wide object-store holder for warm-cache arrays, keyed
    by warm-dir path. Every entry's keys/contribs live as ACTOR-OWNED
    plasma objects (tmpfs shared memory), so (a) all serving actors on
    a node map ONE physical copy zero-copy, and (b) the hot set
    survives page-cache eviction — on this box a proactive reclaimer
    can evict just-emitted warm files within seconds, turning the
    first query pass into a disk crawl; plasma pages cannot be
    reclaimed without swap. Files remain the restart/cold-start path;
    the store is the same-session fast path. At multi-node scale the
    store actor lives on one node but Ray replicates each object into
    a requesting node's plasma on first ray.get and serves later
    reads node-locally — so the steady state is still one physical
    copy per node that actually serves the range."""

    def __init__(self):
        import os

        self._dirs: dict = {}
        # parked index FILE bytes (merged shards, docs sidecars):
        # serving reads them zero-copy from plasma instead of disk —
        # this box's reclaimer can evict just-written index files in
        # seconds, turning first-pass rare-gram decodes into a
        # 10-20 MB/s disk crawl. Budgeted: at true scale the merged
        # layer outgrows any one node's plasma, so parking stops at
        # the cap and readers fall back to storage.
        self._files: dict = {}
        self._file_bytes = 0
        self._file_budget = int(
            os.environ.get("MICROFTS_FILE_PLASMA_BYTES", str(4 << 30))
        )

    def put_dir(
        self, dirpath: str, meta: dict, keys, contribs, vecs=None
    ) -> bool:
        import ray as _ray

        # re-put: the incoming arrays are views of CALLER-owned plasma
        # objects that die with the emitting task; the store's copies
        # are owned by this long-lived actor. vecs: prebuilt f32 dense
        # score vectors per hot term — one shared physical copy for
        # every reader/pool actor (the round-2 N x 6 GiB private-vector
        # concern dissolves here)
        vrefs = {
            int(t): _ray.put(v) for t, v in (vecs or {}).items()
        }
        self._dirs[dirpath] = (meta, _ray.put(keys), _ray.put(contribs), vrefs)
        self._drop_hydrated(dirpath)
        return True

    def put_dir_refs(
        self, dirpath: str, meta: dict, kref_w, cref_w, vrefs
    ) -> bool:
        """Single-copy park: the emitter already ray.put the arrays
        with _owner=this actor (ownership transferred at put time), so
        the store just records the refs — the round-3 path paid every
        byte twice (arg serialization + actor re-put). kref_w/cref_w
        arrive LIST-WRAPPED: a top-level ObjectRef argument would be
        auto-dereferenced by Ray before the method ran."""
        self._dirs[dirpath] = (meta, kref_w[0], cref_w[0], dict(vrefs))
        self._drop_hydrated(dirpath)
        return True

    def _drop_hydrated(self, dirpath: str) -> None:
        """A re-put REPLACES a dir's entry (deeper re-emission at the
        same path, e.g. emit_warm_cache with a smaller min_entries):
        a memoized hydrated-contribs ref from the OLD entry would be
        sliced with the NEW meta's offsets — wrong scores or
        out-of-bounds gathers — so parking a dir always invalidates
        its hydration (and any in-flight claim)."""
        getattr(self, "_hydr", {}).pop(dirpath, None)
        getattr(self, "_hydr_claims", {}).pop(dirpath, None)

    def get_dir(self, dirpath: str):
        return self._dirs.get(dirpath)

    def put_hydrated(self, dirpath: str, ref_w) -> bool:
        """Memoize one node-shared exact-f64 contribs object for a
        compact (fmt 2) warm dir — computed by the FIRST loading
        reader (ray.put(_owner=store), so it outlives that reader).
        First put wins: racers' arrays stay valid for the racer
        itself and are collected with its last reference."""
        hyd = getattr(self, "_hydr", None)
        if hyd is None:
            hyd = self._hydr = {}
        if dirpath not in hyd:
            hyd[dirpath] = ref_w[0]
        return True

    def get_hydrated(self, dirpath: str):
        ref = getattr(self, "_hydr", {}).get(dirpath)
        return [ref] if ref is not None else None

    def hydration_todo(
        self, dirpaths: list, sha: str,
        lo: int | None = None, hi: int | None = None,
    ) -> list:
        """Batched pre-pass filter for the hydration fan-out: which of
        these dirs hold un-hydrated fmt-2 entries of this generation
        (optionally intersecting [lo, hi))? One RPC instead of one
        get_dir per dir. Returned dirs are CLAIMED (120 s expiry): a
        non-sharded pool's actors all prewarm concurrently, and
        without the claim each would fan out its own duplicate task
        set — later claimants get [] and hydrate inline on a miss,
        which is the pre-fan-out status quo."""
        import time as _time

        hyd = getattr(self, "_hydr", {})
        claims = getattr(self, "_hydr_claims", None)
        if claims is None:
            claims = self._hydr_claims = {}
        now = _time.monotonic()
        out = []
        for dd in dirpaths:
            ent = self._dirs.get(dd)
            if ent is None or dd in hyd:
                continue
            if now - claims.get(dd, -1e18) < 120.0:
                continue  # another loader's fan-out is in flight
            meta = ent[0]
            if meta.get("fmt") != 2 or not meta.get("terms"):
                continue
            if meta.get("manifest_sha") != sha:
                continue
            if lo is not None and "lo" in meta and (
                meta["hi"] <= lo or meta["lo"] >= hi
            ):
                continue
            claims[dd] = now
            out.append(dd)
        return out

    def put_shared(self, sha: str, ref_w) -> bool:
        """Park the merge's warm SHARED TUPLE ref (dense space,
        chunk-dl space, rank maps) for the generation: prewarm's
        fan-out top-up rebuilds + re-ray.puts this otherwise —
        ~20 s of single-process work inside a collapse (run 17).
        ref_w arrives LIST-WRAPPED (top-level refs auto-deref)."""
        self._shared = getattr(self, "_shared", {})
        self._shared[sha] = ref_w[0]
        return True

    def get_shared(self, sha: str):
        """The parked shared-tuple ref, LIST-WRAPPED (or None). The
        underlying object is owned by the merge driver; a caller in a
        different session must handle ray.get failing and fall back
        to rebuilding (prewarm does)."""
        ref = getattr(self, "_shared", {}).get(sha)
        return [ref] if ref is not None else None

    def park_path(self, path: str, max_bytes: int = 64 << 20) -> bool:
        """Read a file from disk INSIDE the store actor and park it.
        Fire-and-forget target for scan workers on a cache miss: the
        single-threaded actor dedupes concurrent requests and the
        10-20 MB/s disk sees ONE sequential reader — 16 scan tasks
        each full-reading the same source files measured a 5x
        search_and regression (the park storm)."""
        import os

        import numpy as _np

        if path in self._files:
            return True
        refused = getattr(self, "_park_refused", None)
        if refused is None:
            refused = self._park_refused = set()
        if path in refused:
            return False  # negative cache: don't re-read a refusal
        try:
            size = os.path.getsize(path)
            if size > max_bytes:
                refused.add(path)
                return False
            if self._file_bytes + size > self._file_budget:
                # budget check BEFORE the read: reading the whole
                # file inside the actor only to refuse it would
                # repeat a futile multi-second disk read for every
                # scan task of every query once the budget fills
                refused.add(path)
                return False
            with open(path, "rb") as f:
                data = _np.frombuffer(f.read(), dtype=_np.uint8)
        except OSError:
            return False
        ok = self.put_file_bytes(path, data)
        if not ok:
            refused.add(path)
        return ok

    def put_file_bytes(self, path: str, data) -> bool:
        """Park one index file's bytes (keyed by absolute path).
        Refused over the byte budget — callers fall back to disk. A
        re-put REPLACES the entry: compact/rewrite-merge overwrites
        shard files at the same path, and serving stale parked bytes
        would silently resurrect dropped postings."""
        import ray as _ray

        if path in self._files:
            self._file_bytes -= self._files[path][1]
            del self._files[path]
        if self._file_bytes + len(data) > self._file_budget:
            return False
        self._files[path] = (_ray.put(data), len(data))
        self._file_bytes += len(data)
        getattr(self, "_park_refused", set()).discard(path)
        return True

    def file_refs(self, paths: list) -> list:
        """Batched lookup: one RPC per IndexReader construction, not
        one per segment file. Entries are (ref, nbytes) — readers
        cross-check nbytes against the on-disk size and drop parked
        bytes that no longer match (rewrite not routed through
        put_file_bytes)."""
        return [self._files.get(p) for p in paths]

    def persist_files(self, mode_env: str | None = None) -> int:
        """Write any warm dirs' deferred keys/contribs npy files from
        the plasma copies this actor owns (tmp + rename, one dir at a
        time — the single-threaded actor serializes the disk writes
        instead of stampeding the 10-20 MB/s device). Fire-and-forget
        from merge finalize: the files are only the restart fallback,
        so they must never sit on the time-to-servable path."""
        import os
        import uuid as _uuid

        import numpy as _np
        import ray as _ray

        n = 0
        for dd, (meta, kref, cref, _vrefs) in list(self._dirs.items()):
            if meta.get("manifest_sha") is None:
                continue  # staged dir: finalize will move + re-call
            if os.path.exists(os.path.join(dd, "keys.npy")):
                continue
            if not os.path.isdir(dd):
                continue
            try:
                tag = _uuid.uuid4().hex[:8]
                if meta.get("fmt") == 2:
                    tf_dl = _ray.get(cref)
                    arrs = (
                        ("keys", _ray.get(kref)),
                        ("tf", tf_dl[0]),
                        ("dl", tf_dl[1]),
                    )
                else:
                    arrs = (
                        ("keys", _ray.get(kref)),
                        ("contribs", _ray.get(cref)),
                    )
                for name, arr in arrs:
                    tmp = os.path.join(dd, f".{name}.{tag}.tmp.npy")
                    _np.save(tmp, _np.asarray(arr))
                    os.replace(tmp, os.path.join(dd, f"{name}.npy"))
                n += 1
            except Exception:
                continue
        return n

    def rebind(self, src: str, dst: str, sha: str) -> bool:
        """Merge finalize: a STAGED dir (written before the manifest
        hash existed) moved to its final path; stamp the sha."""
        e = self._dirs.pop(src, None)
        if e is None:
            return False
        meta = dict(e[0])
        meta["manifest_sha"] = sha
        self._dirs[dst] = (meta,) + tuple(e[1:])
        self._drop_hydrated(src)
        self._drop_hydrated(dst)
        return True

    def drop_prefix(self, prefix: str) -> int:
        """Evict everything parked under a path prefix: warm dirs,
        their hydrated contribs, parked FILE bytes (freeing their
        budget), and park refusals (a refusal may become parkable once
        the freed budget admits it). Called when a generation is swept
        — and by multi-run benches between runs, whose per-run tmp
        index dirs would otherwise pin the 4 GiB file budget with dead
        entries and starve the next run's parks."""
        gone = [k for k in self._dirs if k.startswith(prefix)]
        for k in gone:
            del self._dirs[k]
        hyd = getattr(self, "_hydr", None)
        if hyd is not None:
            for k in [k for k in hyd if k.startswith(prefix)]:
                del hyd[k]
        for k in [k for k in self._files if k.startswith(prefix)]:
            self._file_bytes -= self._files[k][1]
            del self._files[k]
        refused = getattr(self, "_park_refused", None)
        if refused is not None:
            refused.clear()
        return len(gone)


_WARMSTORE_NAME = "microfts_warmstore"
# per-process handle cache, keyed by (job, node): a non-detached named
# actor is REFCOUNTED — if no live handle remains anywhere it is
# killed, so the creating process (normally the driver) must pin one
# here
_WARMSTORE_CACHE: dict = {"job": None, "node": None, "handle": None}


def _warmstore_name(_ray) -> tuple[str, str | None]:
    """(node-scoped store name, node_id). ONE STORE PER NODE: a single
    cluster-wide actor would make one node pay the network copy for
    every parked byte cluster-wide and a cross-node RPC per reader
    (r4 verdict #7) — instead each node's workers get-or-create their
    own store (plasma is per-node shared memory anyway, so a remote
    store's refs were never zero-copy). Single-node behavior is
    unchanged: every process resolves the same name. Readers on a node
    whose store lacks an entry fall back exactly as before (npy mmap /
    storage / decode)."""
    try:
        nid = _ray.get_runtime_context().get_node_id()
    except Exception:
        return _WARMSTORE_NAME, None
    return f"{_WARMSTORE_NAME}_{nid[:12]}", nid


def _warmstore(create: bool = False):
    """Handle to THIS NODE's warm store actor (None when ray is down
    or MICROFTS_WARMSTORE=0). Writers pass create=True (get-or-create,
    node-affine); readers take the actor only if some writer made it."""
    import os

    try:
        import ray as _ray
    except ImportError:
        return None
    if (
        os.environ.get("MICROFTS_WARMSTORE", "1") == "0"
        or not _ray.is_initialized()
    ):
        return None
    try:
        job = _ray.get_runtime_context().get_job_id()
    except Exception:
        return None
    name, nid = _warmstore_name(_ray)
    if (
        _WARMSTORE_CACHE["handle"] is not None
        and _WARMSTORE_CACHE["job"] == job
        and _WARMSTORE_CACHE["node"] == nid
    ):
        return _WARMSTORE_CACHE["handle"]
    try:
        if create:
            opts: dict = {"name": name, "get_if_exists": True}
            if nid is not None:
                # pin the store to the caller's node: parked bytes
                # must live in THIS node's plasma to be zero-copy for
                # its readers (soft=True: fall back to any node rather
                # than fail if this one can't host it)
                from ray.util.scheduling_strategies import (
                    NodeAffinitySchedulingStrategy,
                )

                opts["scheduling_strategy"] = NodeAffinitySchedulingStrategy(
                    node_id=nid, soft=True
                )
            h = (
                _ray.remote(num_cpus=0)(_WarmStoreImpl)
                .options(**opts)
                .remote()
            )
        else:
            h = _ray.get_actor(name)
    except Exception:
        return None
    _WARMSTORE_CACHE.update(job=job, node=nid, handle=h)
    return h


_PROBE_CACHE: dict = {"t": 0.0, "v": None}


def _cached_gbps(ttl: float = 20.0) -> float:
    """Per-process cached single-stream bandwidth probe (~36 MB of
    traffic, re-measured every `ttl` seconds). This box's effective
    bandwidth flips 0.04-10 GB/s on a seconds timescale; paths that
    trade a large one-time byte cost for faster steady state (dense
    vector builds) must check the ambient rate, not assume the one
    the bands were recorded at."""
    import time as _time

    now = _time.monotonic()
    if _PROBE_CACHE["v"] is not None and now - _PROBE_CACHE["t"] < ttl:
        return _PROBE_CACHE["v"]
    a = np.random.rand(2 * 1024 * 1024)
    b = np.random.rand(2 * 1024 * 1024)
    c = np.empty_like(a)
    t0 = _time.perf_counter()
    for _ in range(3):
        np.add(a, b, out=c)
    gbps = 3 * 3 * 16 / 1024 / (_time.perf_counter() - t0)
    _PROBE_CACHE.update(t=now, v=gbps)
    return gbps


_SRC_BUF_CACHE: dict[str, object] = {}  # per-process: path -> bytes|False


def _source_parquet(path: str, max_park: int = 64 << 20):
    """ParquetFile over a source file, preferring plasma-parked bytes.
    On first use of a modest-sized file (<= max_park) with a live warm
    store, the file is read ONCE fully — a sequential read, kinder to
    a reclaimed 10-20 MB/s disk than row-group seeks — parked in the
    store's budgeted file cache, and every later scan on this node
    reads it zero-copy from shared memory (fuzzy/search re-read the
    same source files every query; the reclaimer evicts them between
    queries). Misses and oversize files open from disk as before."""
    import os

    apath = os.path.abspath(path)
    buf = _SRC_BUF_CACHE.get(apath)
    if buf is None:
        buf = False
        store = _warmstore()
        if store is not None:
            import ray as _ray

            try:
                size = os.path.getsize(apath)
                ent = _ray.get(store.file_refs.remote([apath]))[0]
                if ent is not None:
                    ref, nbytes = ent
                    if nbytes == size:
                        buf = (
                            _ray.get(ref)
                            if isinstance(ref, _ray.ObjectRef)
                            else ref
                        )
                elif size <= max_park:
                    # miss: the STORE reads + parks (ONE sequential
                    # reader — workers reading + parking the same
                    # files themselves stormed the disk, a measured
                    # 5x search_and regression) and this call BLOCKS
                    # on it: the old fire-and-forget raced a one-shot
                    # scan, which then read the reclaimed disk itself
                    # and the park paid off never (r4 bench: the
                    # single search_and at 4.5x band). Blocking costs
                    # at most the same sequential read the fallback
                    # would do, and every later scan reads zero-copy.
                    if _ray.get(store.park_path.remote(apath, max_park)):
                        ent = _ray.get(store.file_refs.remote([apath]))[0]
                        if ent is not None and ent[1] == size:
                            ref = ent[0]
                            buf = (
                                _ray.get(ref)
                                if isinstance(ref, _ray.ObjectRef)
                                else ref
                            )
            except Exception:
                buf = False
        # cache a hit permanently; re-check the store next call on a
        # miss — the park can fail transiently (budget refusal later
        # freed by drop_prefix, store restart) and a later call may
        # then land it
        if buf is not False:
            _SRC_BUF_CACHE[apath] = buf
    if buf is False or buf is None:
        return pq.ParquetFile(path)
    return pq.ParquetFile(pa.BufferReader(pa.py_buffer(buf)))


def _warm_prof(record: dict) -> None:
    """Append one JSON line of warm-emission phase timings to
    $MICROFTS_WARM_PROF (no-op unless set). Lines are < PIPE_BUF so
    concurrent emit workers append atomically on Linux."""
    import json
    import os

    path = os.environ.get("MICROFTS_WARM_PROF")
    if not path:
        return
    try:
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass


def _warm_files_mode() -> str:
    """npy-persistence mode, DRIVER-evaluated (workers may not see
    late env changes — callers thread the value through, the same
    contract as MICROFTS_VEC_MIN): "async" (default — the store actor
    writes the restart-fallback files after the index is servable),
    "inline" (synchronous write, the round-3 behavior), "skip"."""
    import os

    return os.environ.get("MICROFTS_WARM_FILES", "async")


def _write_warm_dir(
    dd: str,
    out: dict,
    lo: int,
    hi: int,
    sha: str | None,
    min_entries: int,
    dense_k: int | None = None,
    vec_min: int | None = None,
    files: str | None = None,
    vec_seconds: float | None = None,
    compact: bool = False,
    bm25_stats: tuple[int, float] | None = None,
) -> int:
    """Persist one warm dir with a per-term offset directory. Two
    layouts: fmt 1 (legacy) = concatenated sorted keys (i64) + exact
    f64 contribs; fmt 2 (`compact=True`, `out` from
    _warm_finalize(compact=True)) = keys at the narrowest safe dtype
    (int32 while the dense space fits) + integer tf/dl at their
    narrowest per-dir dtype — 8 bytes/posting instead of 16, and the
    emitter never computes/gathers/ships f64 contribs at all; readers
    recompute them exactly at load (_hydrate_contribs, shared once
    per node via the warm store). `bm25_stats=(n_chunks, avgdl)` is
    required for the fmt-2 dense-vector pre-build (vectors need
    contribs transiently). sha=None marks a STAGED dir (the final
    manifest hash isn't known yet); the merge driver stamps it at
    finalize before moving the dir into warmcache/<sha>/."""
    import json
    import os
    import time as _time
    import uuid as _uuid

    t0 = _time.perf_counter()
    terms = sorted(out)
    offs = [0]
    for t in terms:
        offs.append(offs[-1] + int(out[t][0].size))
    if compact:
        total = int(offs[-1])
        keyd = (
            np.int32
            if dense_k is not None and dense_k <= np.iinfo(np.int32).max
            else np.int64
        )
        tmax = max((int(out[t][1].max()) for t in terms if out[t][1].size),
                   default=0)
        dmax = max((int(out[t][2].max()) for t in terms if out[t][2].size),
                   default=0)

        def _mind(m):
            for cand in (np.uint16, np.uint32):
                if m <= np.iinfo(cand).max:
                    return cand
            return np.uint64

        # casting assignment per term: no full-width intermediate
        # concat (the i64/u64 concat would cost 24B/posting of bus
        # traffic before the downcast)
        keys = np.empty(total, dtype=keyd)
        tf = np.empty(total, dtype=_mind(tmax))
        dl = np.empty(total, dtype=_mind(dmax))
        for i, t in enumerate(terms):
            s, e = offs[i], offs[i + 1]
            keys[s:e] = out[t][0]
            tf[s:e] = out[t][1]
            dl[s:e] = out[t][2]
        payload = (tf, dl)
        file_arrs = (("keys", keys), ("tf", tf), ("dl", dl))
    else:
        keys = (
            np.concatenate([out[t][0] for t in terms])
            if terms
            else np.empty(0, np.int64)
        )
        contribs = (
            np.concatenate([out[t][1] for t in terms])
            if terms
            else np.empty(0, np.float64)
        )
        payload = contribs
        file_arrs = (("keys", keys), ("contribs", contribs))
    t_concat = _time.perf_counter()
    os.makedirs(dd, exist_ok=True)
    tag = _uuid.uuid4().hex[:8]
    store = _warmstore(create=True)
    # npy persistence mode: the files are ONLY the restart fallback
    # (serving loads from plasma in-session; a test proves queries
    # stay oracle-identical with every npy deleted), so by default
    # ("async") they are written AFTER the index is servable by the
    # store actor (persist_files) — the round-3 inline np.save of
    # ~1.7 GB sat squarely on the time-to-servable path (measured 186
    # worker-seconds at a collapsed bus). "inline" restores the old
    # synchronous write; "skip" never writes them.
    files_mode = files if files is not None else _warm_files_mode()
    if files_mode == "inline" or store is None:
        for name, arr in file_arrs:
            tmp = os.path.join(dd, f".{name}.{tag}.tmp.npy")
            np.save(tmp, arr)
            os.replace(tmp, os.path.join(dd, f"{name}.npy"))
    meta = {
        "terms": [int(t) for t in terms],
        "offsets": offs,
        "lo": int(lo),
        "hi": int(hi),
        "manifest_sha": sha,
        "min_entries": int(min_entries),
    }
    if compact:
        meta["fmt"] = 2
    tmp = os.path.join(dd, f".meta.{tag}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(dd, "meta.json"))
    t_save = _time.perf_counter()
    t_vec = t_save
    put_path = "none"
    if store is not None:
        import ray as _ray

        vecs = {}
        if dense_k is not None:
            # pre-scatter the f32 dense score vectors for VEC_MIN+
            # terms HERE, while keys/contribs are cache-resident in
            # the emitting task: serving then shares one plasma copy
            # per vector instead of every reader paying the scatter
            # (episodically 0.5-1.3 s/term on this box) privately.
            # HOTTEST-FIRST within a TIME budget (vec_seconds, from
            # the caller's MICROFTS_VEC_BUDGET_SECONDS spread over the
            # emit pool): a 33 MB scatter costs ~30 ms at healthy
            # bandwidth and seconds inside a collapse episode, so a
            # time bound — unlike a probe-derived byte budget — keeps
            # warm_build bounded even when the episode flips mid-run.
            # Skipped terms build lazily at first query (_dense_vec).
            vm = vec_min if vec_min is not None else _vec_min_default()
            tv0 = _time.perf_counter()
            # ambient gate first: inside a deep collapse even ONE
            # 33 MB scatter costs seconds, and serving's sorted-add
            # fallback makes vectors optional — skip them all rather
            # than stretch warm_build (they build lazily or on the
            # next healthy-generation emission). vec_seconds <= 0
            # FORCES the build (no budget, no gate — the threaded
            # form of MICROFTS_VEC_BUDGET_SECONDS=0).
            force = vec_seconds is not None and vec_seconds <= 0
            # fresher probe (5 s TTL) + a probe-derived FIRST-build
            # estimate: the last_cost prediction below can't see the
            # first build, which measured 5-11 s per dir inside run
            # 19's collapse tail (172.9 worker-seconds total vs the
            # ~36 the budget allows). A build touches ~3x 4*dense_k
            # bytes; skip the whole phase when even one is predicted
            # to overrun the dir's budget.
            gbps = _cached_gbps(ttl=5.0) if not force else 0.0
            degraded = (not force) and gbps < 1.0
            if (
                not force
                and not degraded
                and vec_seconds is not None
                and (3.0 * 4.0 * dense_k) / (gbps * 1e9) > vec_seconds
            ):
                degraded = True
            last_cost = 0.0
            for t in sorted(terms, key=lambda t: -out[t][0].size):
                k = out[t][0]
                if k.size < vm:
                    break  # descending: nothing smaller is eligible
                if compact and bm25_stats is None:
                    break  # no stats: vectors build lazily
                if not force and (
                    degraded
                    or (
                        vec_seconds is not None
                        and _time.perf_counter() - tv0 + last_cost
                        > vec_seconds
                    )
                ):
                    # budget spent — or the NEXT build is predicted to
                    # overrun it: every build costs ~K (zero-fill +
                    # scatter), so the previous build's cost is the
                    # estimate; without it one mid-collapse build
                    # overran the budget by 10+ s (runs 12-13 vec_s)
                    break  # remaining vectors go lazy
                tb0 = _time.perf_counter()
                if compact:
                    # transient exact contribs for this hot term only
                    # (same kernel the loader uses — the parked vector
                    # is bit-identical to a fmt-1 emission's)
                    c = _contrib_arr(
                        _idf_val(bm25_stats[0], k.size),
                        out[t][1], out[t][2], bm25_stats[1],
                    )
                else:
                    c = out[t][1]
                v = np.zeros(dense_k, dtype=np.float32)
                v[k] = c
                vecs[int(t)] = v
                last_cost = _time.perf_counter() - tb0
        t_vec = _time.perf_counter()
        try:
            # single-copy park: _owner transfers ownership of the
            # plasma objects to the long-lived store actor AT PUT
            # TIME, so the store only records refs (put_dir_refs) —
            # the re-put path paid every byte twice
            kref = _ray.put(keys, _owner=store)
            # fmt 2: the contrib slot holds the (tf, dl) tuple — half
            # the bytes of the f64 contribs it replaces
            cref = _ray.put(payload, _owner=store)
            vrefs = {
                int(t): _ray.put(v, _owner=store) for t, v in vecs.items()
            }
            _ray.get(
                store.put_dir_refs.remote(dd, meta, [kref], [cref], vrefs)
            )
            put_path = "owner"
        except TypeError:
            try:
                # ray build without _owner: the double-copy fallback
                _ray.get(
                    store.put_dir.remote(dd, meta, keys, payload, vecs)
                )
                put_path = "reput"
            except Exception:
                pass
        except Exception:
            pass  # store gone: decode fallback serves this dir
    t_put = _time.perf_counter()
    _warm_prof(
        {
            "dir": os.path.basename(dd),
            "n_terms": len(terms),
            "n_entries": int(offs[-1]),
            "n_vecs": len(vecs) if store is not None else 0,
            "concat_s": round(t_concat - t0, 3),
            "save_s": round(t_save - t_concat, 3),
            "vec_s": round(t_vec - t_save, 3),
            "put_s": round(t_put - t_vec, 3),
            "put_path": put_path,
        }
    )
    return len(terms)


def emit_warm_shard(
    index_dir: str,
    sha: str,
    shard: int,
    lo: int,
    hi: int,
    min_entries: int,
    dense,
    dl_space,
    maps,
    hot_exclude=(),
    vec_min: int | None = None,
    files: str | None = None,
    vec_seconds: float | None = None,
) -> int:
    """One term-range shard of the merge-emitted warm cache: bulk-
    decode the range's hot terms (warm_terms_bulk — the exact same
    kernel serving would run, so the persisted representation is
    bit-identical to a serve-time decode) and save keys/contribs/meta
    under warmcache/<sha>/shard=NNNN/. Ultra-hot split terms are
    excluded — they get their own shard=hot-* dirs (emit_warm_hot).
    This is the file-reading FALLBACK path; the merge emits staged
    warm dirs from its in-memory tables and only missing dirs land
    here."""
    import os

    dd = os.path.join(index_dir, "warmcache", sha, f"shard={shard:04d}")
    done = _warm_dir_done(dd, sha, min_entries)
    if done >= 0:
        return done
    r = IndexReader(index_dir)
    r._dense = dense
    if dl_space is not None:
        r._chunk_dl_cache = dl_space
    hot = set(int(t) for t in hot_exclude)
    totals: dict[int, int] = {}
    for seg in r._all_term_sources():
        sel = (seg.terms >= lo) & (seg.terms < hi)
        for t, n in zip(seg.terms[sel].tolist(), seg.ns[sel].tolist()):
            if t not in hot:
                totals[t] = totals.get(t, 0) + int(n)
    todo = sorted(t for t, n in totals.items() if n >= min_entries)
    out = r.warm_terms_bulk(todo, maps=maps, compact=True) if todo else {}
    return _write_warm_dir(
        dd, out, lo, hi, sha, min_entries, dense_k=int(dense[1][-1]),
        vec_min=vec_min, files=files, vec_seconds=vec_seconds,
        compact=True, bm25_stats=(r.n_chunks, r.avgdl),
    )


def emit_warm_hot(
    index_dir: str,
    sha: str,
    term: int,
    min_entries: int,
    dense,
    dl_space,
    maps,
    vec_min: int | None = None,
    files: str | None = None,
    vec_seconds: float | None = None,
) -> int:
    """One ultra-hot split term's warm dir (shard=hot-<term>): the
    term left the term-range scheme at merge (doc-range sub-shards),
    so its warm representation is emitted per term. File-reading
    fallback for dirs the merge didn't stage in-memory."""
    import os

    dd = os.path.join(index_dir, "warmcache", sha, f"shard=hot-{int(term):05d}")
    done = _warm_dir_done(dd, sha, min_entries)
    if done >= 0:
        return done
    r = IndexReader(index_dir)
    r._dense = dense
    if dl_space is not None:
        r._chunk_dl_cache = dl_space
    out = r.warm_terms_bulk([int(term)], maps=maps, compact=True)
    out = {t: v for t, v in out.items() if v[0].size >= min_entries}
    return _write_warm_dir(
        dd, out, int(term), int(term) + 1, sha, min_entries,
        compact=True, bm25_stats=(r.n_chunks, r.avgdl),
        dense_k=int(dense[1][-1]), vec_min=vec_min, files=files,
        vec_seconds=vec_seconds,
    )


def emit_warm_cache(
    index_dir: str,
    min_entries: int = 10_000,
    shared=None,
    vec_min: int | None = None,
) -> int:
    """Post-merge distributed warm-cache build: one task per merged
    term-range shard persists its range's warm representation, making
    the warm cache an INDEX ARTIFACT instead of a serve-time cost —
    cold serving readiness becomes mmap time (_load_warmcache), and a
    term-range serving pool's actors each map only the shard files of
    their range. On a multi-node cluster each task lands wherever its
    shard file is (shared storage), so emission scales with the merge
    instead of serializing on one serving host's memory bus.

    No-op (returns 0) without a merged index or dense space — the
    10^12-doc regime keeps the decode-at-serve MaxScore path."""
    import json
    import os
    import shutil

    import ray as _ray

    from .build import _pkg_root

    r = IndexReader(index_dir)
    merged = r.manifest.get("merged")
    if not merged or r._dense_space() is None:
        return 0
    sha = r._manifest_sha()
    d = os.path.join(index_dir, "warmcache", sha)
    if os.path.exists(os.path.join(d, "sharded.json")):
        return -1  # this generation's cache already exists
    # driver-owned warm store (see _WarmStoreImpl): create before the
    # ephemeral emit tasks so the plasma entries outlive them
    _warmstore(create=True)
    if isinstance(shared, _ray.ObjectRef):
        shared_ref = shared  # merge already parked the tuple in plasma
    else:
        if shared is None:
            try:
                dl_space = r._chunk_dl_space()
            except KeyError:
                dl_space = None  # old in-stream-dl generation
            shared = (r._dense, dl_space, r._warm_maps())
        shared_ref = _ray.put(shared)
    pkg_root = _pkg_root()
    bounds = merged["bounds"]
    hot_terms = sorted({int(e["term"]) for e in merged.get("hot", [])})
    # per-host decode streams are bandwidth-bound, not core-bound
    # (MICROFTS_WARM_TASKS's measured rationale — in the emit-after-
    # merge page-hot flow, uncapped 32-way fan-out measured 29-38 s
    # vs 15-19 s at cap 6 on this box): cap in-flight tasks by
    # giving each 1/cap of the cluster's cores. The default cap is
    # per-node-knee x live-node count (merge._emit_pool_cap), so
    # multi-node emission scales with the cluster instead of
    # serializing at one host's knee; MICROFTS_EMIT_TASKS overrides
    # (0 = run every shard concurrently).
    if vec_min is None:
        vec_min = _vec_min_default()  # driver-evaluated: workers may
        # not see late env changes; merge_index passes its ambient-
        # budgeted effective value through instead
    files_mode = _warm_files_mode()  # same driver-evaluation contract
    from .merge import _emit_pool_cap

    cap = _emit_pool_cap()
    # per-dir dense-vector TIME budget (see _write_warm_dir): total
    # MICROFTS_VEC_BUDGET_SECONDS spread over this pool's dirs
    _vsec_total = float(os.environ.get("MICROFTS_VEC_BUDGET_SECONDS", "8"))
    _n_dirs = merged["n_shards"] + len(hot_terms)
    vec_seconds = (
        _vsec_total * max(1, cap or _n_dirs) / max(1, _n_dirs)
        if _vsec_total > 0
        else -1.0  # <= 0 forces the build (no budget, no gate)
    )
    ncpu = 1.0
    if cap > 0:
        avail = int(_ray.cluster_resources().get("CPU", cap))
        ncpu = max(1.0, avail / cap)

    @_ray.remote(num_cpus=ncpu)
    def task(shard: int, lo: int, hi: int) -> int:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from microfts_ray.pipelines.query import emit_warm_shard as ews

        dense, dls, mps = _ray.get(shared_ref)
        return ews(
            index_dir, sha, shard, lo, hi, min_entries, dense, dls, mps,
            hot_exclude=hot_terms, vec_min=vec_min, files=files_mode,
            vec_seconds=vec_seconds,
        )

    @_ray.remote(num_cpus=ncpu)
    def hot_task(term: int) -> int:
        import sys

        if pkg_root not in sys.path:
            sys.path.insert(0, pkg_root)
        from microfts_ray.pipelines.query import emit_warm_hot as ewh

        dense, dls, mps = _ray.get(shared_ref)
        return ewh(
            index_dir, sha, term, min_entries, dense, dls, mps,
            vec_min=vec_min, files=files_mode, vec_seconds=vec_seconds,
        )

    # driver-side resume pre-check: dirs the merge already staged
    # inline (the common case) are counted here, so tasks — each of
    # which maps the multi-hundred-MB shared state — launch only for
    # genuinely missing dirs
    n_terms = 0
    futs = []
    for s in range(merged["n_shards"]):
        done = _warm_dir_done(
            os.path.join(d, f"shard={s:04d}"), sha, min_entries
        )
        if done >= 0:
            n_terms += done
        else:
            futs.append(task.remote(s, bounds[s], bounds[s + 1]))
    for t in hot_terms:
        done = _warm_dir_done(
            os.path.join(d, f"shard=hot-{t:05d}"), sha, min_entries
        )
        if done >= 0:
            n_terms += done
        else:
            futs.append(hot_task.remote(t))
    n_terms += sum(_ray.get(futs))
    os.makedirs(d, exist_ok=True)
    marker = {
        "manifest_sha": sha,
        "n_shards": merged["n_shards"],
        "min_entries": min_entries,
        "n_terms": n_terms,
        "dirs": [f"shard={s:04d}" for s in range(merged["n_shards"])]
        + [f"shard=hot-{t:05d}" for t in hot_terms],
    }
    tmp = os.path.join(d, ".sharded.tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, os.path.join(d, "sharded.json"))
    # best-effort sweep of older generations' caches (inodes stay
    # alive for anyone still mmapping them)
    parent = os.path.dirname(d)
    store = _warmstore()
    for name in os.listdir(parent):
        p = os.path.join(parent, name)
        if p != d and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            if store is not None:
                store.drop_prefix.remote(p)  # free the plasma copies
    if store is not None and files_mode == "async":
        # fire-and-forget: the store actor writes the deferred
        # keys/contribs npy files (the restart fallback) AFTER the
        # index is servable — single-threaded, so the 10-20 MB/s disk
        # sees one gentle sequential writer instead of 6
        store.persist_files.remote()
    return n_terms


def _span(sorted_terms: np.ndarray, term: int) -> tuple[int, int]:
    return (
        int(np.searchsorted(sorted_terms, term, side="left")),
        int(np.searchsorted(sorted_terms, term, side="right")),
    )
