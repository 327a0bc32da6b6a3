"""Adapter: run the fulltext engine over a `documents` table.

The testdata documents table (doc_id, text, lang, source, n_chars) is
adapted to the corpus schema (BASELINE.json input_hint) — repo=source,
path=doc_<id>, commit=sha1(doc_id), content=text+"\\n" (the reference
line chunker drops an unterminated final line, fts-lmdb.go:605-610,
so the newline makes each document exactly one chunk). Built indexes
are cached under /tmp keyed by the source file identity, so repeated
queries() calls reuse one build.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .build import build_index
from .query import IndexReader
from ..sources.corpus import CORPUS_SCHEMA

_CACHE_ROOT = "/tmp/microfts_ray_cache"
_readers: dict[str, IndexReader] = {}


def doc_key_to_id(doc_id: int) -> tuple[str, str]:
    """(path, commit) for a documents row; stable."""
    return f"doc_{doc_id}", hashlib.sha1(f"doc:{doc_id}".encode()).hexdigest()


def documents_corpus_path(sf_dir: str) -> str:
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.sha1(
        f"split3:{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(_CACHE_ROOT, tag)
    out = os.path.join(out_dir, "corpus-00000.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(src)
        rows = {
            "repo": t["source"].to_pylist(),
            "path": [],
            "commit": [],
            "lang": t["lang"].to_pylist(),
            "content": [x + "\n" for x in t["text"].to_pylist()],
        }
        for d in t["doc_id"].to_pylist():
            p, c = doc_key_to_id(d)
            rows["path"].append(p)
            rows["commit"].append(c)
        tmp = out + ".tmp"
        pq.write_table(
            pa.table(rows, schema=CORPUS_SCHEMA), tmp, row_group_size=128
        )
        os.replace(tmp, out)
    return out


def get_reader(sf_dir: str) -> IndexReader:
    """Build (once, cached) and open the gram index for sf_dir's
    documents table."""
    corpus = documents_corpus_path(sf_dir)
    index_dir = os.path.join(os.path.dirname(corpus), "index")
    key = index_dir
    if key in _readers:
        return _readers[key]
    from ..state.manifest import manifest_exists

    if not manifest_exists(index_dir):
        build_index([corpus], index_dir, target_rows_per_part=128)
    _readers[key] = IndexReader(index_dir)
    return _readers[key]


def hit_doc_ids(hits) -> list[int]:
    """Map engine hits back to documents.doc_id via the path field.
    Accepts the Arrow hits table (search/fuzzy) or a list of dicts
    (search_file)."""
    groups = (
        hits["group"].to_pylist()
        if isinstance(hits, pa.Table)
        else [h["group"] for h in hits]
    )
    out = []
    for g in groups:
        path = g.split("/", 1)[1].split("@", 1)[0]
        out.append(int(path.removeprefix("doc_")))
    return out
