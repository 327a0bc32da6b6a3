"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

One row = one source file with the exact input_hint schema from
BASELINE.json: (repo, path, commit, lang, content). Content is
source-code-like text with a Zipf-skewed token distribution so that
``def``/``import``/``return`` are hot index terms (the skew exercise
called out by the north_star) and every file carries a unique
``uniq_<hex>`` token for selective queries. Mixed-case tokens exercise
case folding (/root/reference/fulltext.go:256-265).

Generation is per-file deterministic — content depends only on
(seed, file_index) — so shards can be produced independently, in
parallel, in any order, and the corpus is reproducible at any scale.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1337
LANGS = ["py", "py", "py", "go", "js", "rs", "txt"]  # weighted

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# line templates; weights give the Zipf-ish hot-term skew
_TEMPLATES = [
    (8, "def f_{a}(a, b):"),
    (8, "    return a + b  # c{b}"),
    (10, "import mod_{z}"),
    (6, "from mod_{z} import helper_{a}"),
    (5, "x_{a} = {n} + y_{b}"),
    (4, '    print("str_{a}_{b}")'),
    (4, "# comment about Mod_{z} and Value{a}"),
    (3, "class Handler{a}:"),
    (3, "    value = compute(x_{a}, {n})"),
    (2, "while x_{a} < {n}: x_{a} += 1"),
    (2, "    raise ValueError('bad {a}')"),
    (1, "CONST_{a} = 0x{n:x}"),
    (1, "   "),
]
_WEIGHTS = np.array([w for w, _ in _TEMPLATES], dtype=np.float64)
_WEIGHTS /= _WEIGHTS.sum()
_LINES = [t for _, t in _TEMPLATES]


def _file_rng(seed: int, idx: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, idx]))


def gen_file(idx: int, seed: int = SEED, n_lines_mean: int = 40) -> dict:
    """Generate one corpus row deterministically from (seed, idx)."""
    rng = _file_rng(seed, idx)
    repo = f"org{int(rng.integers(0, max(2, idx // 50 + 1))):04d}/proj{int(rng.integers(0, 10))}"
    path = f"src/pkg{int(rng.integers(0, 20))}/mod_{idx}.py"
    commit = hashlib.sha1(f"{seed}:{repo}:{idx}".encode()).hexdigest()
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    n_lines = max(3, int(rng.poisson(n_lines_mean)))
    tmpl_idx = rng.choice(len(_LINES), size=n_lines, p=_WEIGHTS)
    # Zipf over mod ids -> hot 'mod_1'-ish tokens; uniform rare ids too
    zipf_z = np.minimum(rng.zipf(1.6, size=n_lines), 500)
    a_ids = rng.integers(0, 50, size=n_lines)
    b_ids = rng.integers(0, 2000, size=n_lines)
    nums = rng.integers(0, 10**6, size=n_lines)
    lines = [
        _LINES[ti].format(a=int(a), b=int(b), z=int(z), n=int(n))
        for ti, a, b, z, n in zip(tmpl_idx, a_ids, b_ids, zipf_z, nums)
    ]
    # one rare, unique token per file for selective queries
    uniq = hashlib.sha256(f"{seed}:{idx}".encode()).hexdigest()[:12]
    lines.insert(int(rng.integers(0, n_lines)), f"# id uniq_{uniq}")
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": "\n".join(lines) + "\n",
    }


def gen_table(start: int, count: int, seed: int = SEED, n_lines_mean: int = 40) -> pa.Table:
    rows = [gen_file(i, seed, n_lines_mean) for i in range(start, start + count)]
    return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)


def write_corpus(
    out_dir: str,
    n_files: int,
    files_per_shard: int = 2000,
    seed: int = SEED,
    n_lines_mean: int = 40,
    row_group_size: int | None = None,
) -> list[str]:
    """Write the corpus as sharded Parquet under out_dir; returns paths.

    Shards are independent (per-file determinism), so this could also
    run as Ray tasks for very large corpora; sandbox sizes are fine
    serially.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    shard = 0
    for start in range(0, n_files, files_per_shard):
        count = min(files_per_shard, n_files - start)
        p = os.path.join(out_dir, f"corpus-{shard:05d}.parquet")
        if not os.path.exists(p):  # corpus is content-addressed by (seed, idx)
            # small row groups let build partitioning split below a shard
            rg = row_group_size or max(1, files_per_shard // 8)
            pq.write_table(gen_table(start, count, seed, n_lines_mean), p, row_group_size=rg)
        paths.append(p)
        shard += 1
    return paths


def corpus_sha256(content: str) -> str:
    """The per-row invariant recorded in the build manifest
    (BASELINE.json input_hint: 'content sha256 equality')."""
    return hashlib.sha256(content.encode("utf-8")).hexdigest()
