"""Posting-run codec tests (functions/postings.py)."""

import numpy as np

from microfts_ray.functions.postings import (
    BLOCK,
    decode_block_meta,
    decode_run,
    encode_run,
    merge_runs,
    PostingRun,
)


def _sorted_entries(rng, n, doc_lo=0, doc_hi=1 << 40):
    doc = np.sort(rng.integers(doc_lo, doc_hi, size=n, dtype=np.uint64))
    chk = rng.integers(0, 100, size=n, dtype=np.uint64)
    order = np.lexsort((chk, doc))
    return doc[order], chk[order]


def test_roundtrip_and_df():
    rng = np.random.default_rng(3)
    doc, chk = _sorted_entries(rng, 1000)
    tf = rng.integers(1, 50, size=1000, dtype=np.uint64)
    dl = rng.integers(1, 500, size=1000, dtype=np.uint64)
    row = encode_run(doc, chk, tf, dl)
    assert row["n"] == 1000
    assert row["df"] == len(np.unique(doc))
    run = decode_run(row)
    assert (run.doc_ids == doc).all()
    assert (run.chunk_ids == chk).all()
    assert (run.tfs == tf).all()
    assert (run.dls == dl).all()


def test_block_meta_bounds():
    rng = np.random.default_rng(4)
    n = 5 * BLOCK + 17
    doc, chk = _sorted_entries(rng, n)
    tf = rng.integers(1, 1000, size=n, dtype=np.uint64)
    dl = rng.integers(1, 1000, size=n, dtype=np.uint64)
    row = encode_run(doc, chk, tf, dl)
    bmax_tf, bmin_dl, bfirst = decode_block_meta(row)
    assert bmax_tf.size == (n + BLOCK - 1) // BLOCK
    for b in range(bmax_tf.size):
        sl = slice(b * BLOCK, min((b + 1) * BLOCK, n))
        assert bmax_tf[b] == tf[sl].max()
        assert bmin_dl[b] == dl[sl].min()
        assert bfirst[b] == doc[b * BLOCK]


def test_merge_disjoint_runs():
    rng = np.random.default_rng(5)
    runs = []
    for part in range(4):
        doc, chk = _sorted_entries(rng, 200, doc_lo=part << 50, doc_hi=(part + 1) << 50)
        tf = rng.integers(1, 9, size=200, dtype=np.uint64)
        dl = rng.integers(1, 99, size=200, dtype=np.uint64)
        runs.append(PostingRun(doc, chk, tf, dl))
    merged = merge_runs(list(reversed(runs)))
    assert len(merged) == 800
    key = merged.doc_ids.astype(object) * 1000 + merged.chunk_ids.astype(object)
    assert all(key[i] <= key[i + 1] for i in range(len(key) - 1))
    # round-trip the merged run
    row = encode_run(merged.doc_ids, merged.chunk_ids, merged.tfs, merged.dls)
    back = decode_run(row)
    assert (back.doc_ids == merged.doc_ids).all()


def test_encode_partition_runs_matches_scalar():
    """Vectorized partition encoder == per-term scalar encode_run."""
    from microfts_ray.pipelines.build import encode_partition_runs

    rng = np.random.default_rng(9)
    n_terms, rows = 40, 3000
    term = np.sort(rng.integers(0, n_terms, size=rows).astype(np.uint16))
    doc = rng.integers(0, 1 << 50, size=rows, dtype=np.uint64)
    chk = rng.integers(0, 300, size=rows, dtype=np.uint64)
    order = np.lexsort((chk, doc, term))
    entries = {
        "term": term[order],
        "doc_id": doc[order],
        "chunk_id": chk[order],
        "tf": rng.integers(1, 200, size=rows, dtype=np.uint64),
        "dl": rng.integers(1, 5000, size=rows, dtype=np.uint64),
    }
    tbl = encode_partition_runs(entries, store_dl=True)
    pos = 0
    for i in range(tbl.num_rows):
        row = {k: tbl[k][i].as_py() for k in tbl.column_names}
        n = row["n"]
        sl = slice(pos, pos + n)
        want = encode_run(
            entries["doc_id"][sl], entries["chunk_id"][sl],
            entries["tf"][sl], entries["dl"][sl],
        )
        for k, v in want.items():
            assert row[k] == v, (i, k)
        run = decode_run(row)
        assert (run.doc_ids == entries["doc_id"][sl]).all()
        bmax, bmin, bfirst = decode_block_meta(row)
        assert bmax.size == (n + BLOCK - 1) // BLOCK
        pos += n
    assert pos == rows


def test_decode_terms_table_bulk():
    """Bulk table decode == per-row decode_run."""
    from microfts_ray.pipelines.build import encode_partition_runs
    from microfts_ray.functions.postings import decode_terms_table

    rng = np.random.default_rng(11)
    rows = 2000
    term = np.sort(rng.integers(0, 60, size=rows).astype(np.uint16))
    doc = rng.integers(0, 1 << 50, size=rows, dtype=np.uint64)
    chk = rng.integers(0, 300, size=rows, dtype=np.uint64)
    order = np.lexsort((chk, doc, term))
    entries = {
        "term": term[order], "doc_id": doc[order], "chunk_id": chk[order],
        "tf": rng.integers(1, 9, size=rows, dtype=np.uint64),
        "dl": rng.integers(1, 999, size=rows, dtype=np.uint64),
    }
    tbl = encode_partition_runs(entries, store_dl=True)
    dec = decode_terms_table(tbl)
    for k in ("term", "doc_id", "chunk_id", "tf", "dl"):
        assert (dec[k] == entries[k]).all(), k
    # filtered table decodes too (merge path)
    keep = tbl["term"].to_numpy() % 2 == 0
    dec2 = decode_terms_table(tbl.filter(keep))
    want = np.isin(entries["term"], tbl["term"].to_numpy()[keep])
    assert (dec2["doc_id"] == entries["doc_id"][want]).all()


def test_sidecar_dl_layout_roundtrip():
    """Default encode stores NO dl stream (empty dl_blob, zeroed
    block-min); decode flags has_dl=False and fills dl with zeros for
    the reader layer to gather from the chunk-dl sidecar."""
    from microfts_ray.functions.postings import decode_run, decode_terms_table
    from microfts_ray.pipelines.build import encode_partition_runs

    rng = np.random.default_rng(5)
    rows = 500
    term = np.sort(rng.integers(0, 9, size=rows).astype(np.uint16))
    doc = rng.integers(0, 1 << 40, size=rows, dtype=np.uint64)
    chk = rng.integers(0, 40, size=rows, dtype=np.uint64)
    order = np.lexsort((chk, doc, term))
    entries = {
        "term": term[order], "doc_id": doc[order], "chunk_id": chk[order],
        "tf": rng.integers(1, 9, size=rows, dtype=np.uint64),
        "dl": rng.integers(1, 999, size=rows, dtype=np.uint64),
    }
    tbl = encode_partition_runs(entries)  # default: sidecar-dl layout
    assert sum(len(x.as_py()) for x in tbl["dl_blob"]) == 0
    row0 = {k: tbl[k][0].as_py() for k in tbl.column_names}
    run = decode_run(row0)
    assert not run.has_dl and (run.dls == 0).all() and len(run) == row0["n"]
    dec = decode_terms_table(tbl)
    assert not dec["has_dl"] and (dec["dl"] == 0).all()
    # non-dl streams are unchanged vs the stored form
    tbl_full = encode_partition_runs(entries, store_dl=True)
    for col in ("doc_blob", "chunk_blob", "tf_blob", "bfirst_doc_blob"):
        assert tbl[col].to_pylist() == tbl_full[col].to_pylist()


def test_mixed_dl_layout_raises():
    """A terms table mixing in-stream-dl rows with sidecar-dl rows is
    undecodable (per-row dl regions can't be told apart) — the bulk
    decoder must fail loudly, never read one row's dl bytes as
    another's. Layout mixing is prevented upstream by the manifest
    dl_layout flag; this is the defense in depth."""
    import pyarrow as pa
    import pytest as _pt

    from microfts_ray.functions.postings import decode_terms_table
    from microfts_ray.pipelines.build import encode_partition_runs

    rng = np.random.default_rng(9)
    rows = 64
    entries = {
        "term": np.sort(rng.integers(0, 4, size=rows).astype(np.uint16)),
        "doc_id": np.sort(rng.integers(0, 1 << 30, size=rows, dtype=np.uint64)),
        "chunk_id": np.zeros(rows, dtype=np.uint64),
        "tf": np.ones(rows, dtype=np.uint64),
        "dl": rng.integers(1, 50, size=rows, dtype=np.uint64),
    }
    old = encode_partition_runs(entries, store_dl=True)
    new = encode_partition_runs(entries, store_dl=False)
    mixed = pa.concat_tables([old, new])
    with _pt.raises(ValueError, match="mixed dl layouts"):
        decode_terms_table(mixed)
