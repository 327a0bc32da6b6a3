"""Single-threaded pure-Python oracle: the semantic ground truth.

Naive-loop reimplementation of the reference's query surface
(/root/reference/fts-lmdb.go:1046-1081 and the kernels it calls),
extended with BM25 exactly as SURVEY.md §7.0 specifies. The
distributed engine (pipelines/query.py) must reproduce this oracle's
results rank-identically at every parallelism level; pytest enforces
it (FIXTURES.md §5).

Semantics mirrored:
  * exact AND: intersection of posting sets of ALL grams of the
    query args (intersectGrams, fts-lmdb.go:1497-1528), then
    word-boundary verification of each arg against the chunk text
    (hasArg, fts-lmdb.go:1299-1311); any missing gram -> no results.
  * partial: interior grams per arg; verification without the
    boundary check (cfg.partial, fts-lmdb.go:1303).
  * fuzzy: score = |query grams present in chunk| / |query grams|,
    threshold inclusive (fuzzyMatch, fts-lmdb.go:1530-1550); no text
    verification (verification is skipped when fuzzy, see
    displayChunks' hasArg call gating).
  * file mode: a doc matches iff for every arg some chunk has all of
    that arg's grams (intersectFileGrams, fts-lmdb.go:1449-1495) and
    the arg verifies in that chunk (displayFileResults,
    fts-lmdb.go:1190-1230).
  * ordering: group name asc, chunk position asc (fts-lmdb.go:1164,
    1361-1365); fuzzy -sort: percent asc, group name asc
    (sortFuzzy, fts-lmdb.go:1390-1408).

BM25 (not in the reference; SURVEY.md §7.0): k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene-style non-negative),
scoring unit = chunk (df = chunks containing the term), doc mode
aggregates tf per doc with dl = doc's total gram occurrences.
Ties break (score desc, doc_id asc, chunk_id asc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .functions.grams import gram_set
from .stages.tokenize import doc_id_for, split_lines

K1 = 1.2
B = 0.75
GRAM_CHARS = set("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")


def is_gram_char(c: str) -> bool:
    """Reference isGramChar (fts-lmdb.go:1428-1430)."""
    return c in GRAM_CHARS


def has_arg(text: str, arg: str, partial: bool = False) -> int:
    """Reference hasArg (fts-lmdb.go:1299-1311): first case-insensitive
    occurrence of arg in text at gram-char boundaries (unless
    partial); -1 if absent."""
    low, tl = arg.lower(), text.lower()
    start = 0
    while True:
        i = tl.find(low, start)
        if i == -1:
            return -1
        if partial or (
            (i == 0 or not is_gram_char(text[i - 1]))
            and (i + len(arg) == len(text) or not is_gram_char(text[i + len(arg)]))
        ):
            return i
        start = i + len(low)


def group_name(repo: str, path: str, commit: str) -> str:
    """The rebuild's 'file name' for ordering parity with K1."""
    return f"{repo}/{path}@{commit}"


@dataclass
class OracleIndex:
    """In-memory chunk-level inverted index built with naive loops."""

    postings: dict[int, set[tuple[int, int]]] = field(default_factory=dict)
    tf: dict[tuple[int, int, int], int] = field(default_factory=dict)
    chunk_dl: dict[tuple[int, int], int] = field(default_factory=dict)
    chunk_text: dict[tuple[int, int], str] = field(default_factory=dict)
    doc_meta: dict[int, dict] = field(default_factory=dict)
    n_chunks: int = 0
    sum_dl: int = 0

    # -- build ------------------------------------------------------------
    @classmethod
    def build(cls, rows: list[dict], chunker: str = "lines") -> "OracleIndex":
        idx = cls()
        for row in rows:
            doc_id = doc_id_for(row["repo"], row["path"], row["commit"])
            idx.doc_meta[doc_id] = {
                "group": group_name(row["repo"], row["path"], row["commit"]),
                "repo": row["repo"],
                "path": row["path"],
                "commit": row["commit"],
                "sum_dl": 0,
                "n_chunks": 0,
            }
            if chunker == "lines":
                chunks = list(enumerate(split_lines(row["content"])))
            else:
                from .stages.org import split_org_parts

                chunks = [(ln - 1, t) for ln, t in split_org_parts(row["content"])]
            for chunk_id, text in chunks:
                key = (doc_id, chunk_id)
                idx.chunk_text[key] = text
                # per-gram occurrence counts via the scalar spec:
                # re-extract with a positional count
                counts: dict[int, int] = {}
                dl = 0
                from .functions.grams import _CHAR_CLASS, GRAM_BASE, GRAM_2_BASE, GRAM_3_BASE

                g = 0
                for ch in " " + text + " ":
                    v = int(_CHAR_CLASS[ord(ch)])
                    if v == 0 and g % GRAM_BASE == 0:
                        continue
                    if g % GRAM_BASE == 0:
                        g = v
                    else:
                        g = (g * GRAM_BASE + v) % GRAM_3_BASE
                    if g >= GRAM_BASE:
                        counts[g] = counts.get(g, 0) + 1
                        dl += 1
                idx.chunk_dl[key] = dl
                idx.doc_meta[doc_id]["sum_dl"] += dl
                idx.doc_meta[doc_id]["n_chunks"] += 1
                idx.n_chunks += 1
                idx.sum_dl += dl
                for grm, c in counts.items():
                    idx.postings.setdefault(grm, set()).add(key)
                    idx.tf[(grm, doc_id, chunk_id)] = c
        return idx

    # -- kernels ----------------------------------------------------------
    def candidates(self, grams: set[int]) -> set[tuple[int, int]] | None:
        """intersectGrams: None if any gram has no postings (the
        reference exits(1) there)."""
        if not grams:
            return None
        lists = []
        for g in grams:
            p = self.postings.get(g)
            if not p:
                return None
            lists.append(p)
        lists.sort(key=len)
        result = set(lists[0])
        for p in lists[1:]:
            result &= p
            if not result:
                return set()
        return result

    def search(
        self,
        *args: str,
        partial: bool = False,
        regexp_filter: str | None = None,
        limit_per_group: int | None = None,
    ) -> list[dict]:
        """Exact/partial AND search with verification; reference
        result order (group asc, chunk position asc)."""
        grams = gram_set(*args, partial=partial)
        cand = self.candidates(grams)
        if cand is None:
            return []
        out = []
        by_group: dict[str, list[tuple[int, int]]] = {}
        for key in cand:
            by_group.setdefault(self.doc_meta[key[0]]["group"], []).append(key)
        import re

        pat = re.compile(regexp_filter) if regexp_filter else None
        for grp in sorted(by_group):
            keys = sorted(by_group[grp], key=lambda k: k[1])
            if limit_per_group is not None:
                keys = keys[:limit_per_group]
            for doc_id, chunk_id in keys:
                text = self.chunk_text[(doc_id, chunk_id)]
                if pat is not None and not pat.search(text):
                    continue
                offsets = [has_arg(text, a, partial) for a in args]
                if any(o < 0 for o in offsets):
                    continue
                out.append(
                    {
                        "group": grp,
                        "doc_id": doc_id,
                        "chunk_id": chunk_id,
                        "line": chunk_id + 1,
                        "offset": min(offsets),
                        "text": text,
                    }
                )
        return out

    def fuzzy(self, *args: str, threshold: float, sort_all: bool = False) -> list[dict]:
        """Fuzzy gram-overlap search (partial grams), inclusive
        threshold in [0,1]. sort_all -> percent asc, group asc (K4)."""
        grams = gram_set(*args, partial=True)
        if not grams:
            return []
        occ: dict[tuple[int, int], int] = {}
        for g in grams:
            p = self.postings.get(g)
            if p is None:
                return []  # reference exits on any missing gram
            for key in p:
                occ[key] = occ.get(key, 0) + 1
        hits = {
            k: c / len(grams) for k, c in occ.items() if c / len(grams) >= threshold
        }
        rows = [
            {
                "group": self.doc_meta[d]["group"],
                "doc_id": d,
                "chunk_id": c,
                "line": c + 1,
                "percent": pct * 100.0,
                "text": self.chunk_text[(d, c)],
            }
            for (d, c), pct in hits.items()
        ]
        if sort_all:
            rows.sort(key=lambda r: (r["percent"], r["group"], r["chunk_id"]))
        else:
            # group asc; within group percent desc (K3), chunk asc tiebreak
            rows.sort(key=lambda r: (r["group"], -r["percent"], r["chunk_id"]))
        return rows

    def search_file(self, *args: str, partial: bool = False) -> list[dict]:
        """Doc-level conjunction (X2): every arg verified in some
        chunk of the doc; returns docs (group asc) with the earliest
        verified chunk per arg."""
        all_grams = gram_set(*args, partial=partial)
        for g in all_grams:
            if not self.postings.get(g):
                return []
        arg_grams = [gram_set(a, partial=partial) for a in args]
        docs: dict[int, list[list[int]]] = {}
        for i, grams in enumerate(arg_grams):
            # chunks containing ALL grams of arg i
            cand = self.candidates(grams)
            if cand is None:
                return []
            for doc_id, chunk_id in cand:
                if has_arg(self.chunk_text[(doc_id, chunk_id)], args[i], partial) < 0:
                    continue
                docs.setdefault(doc_id, [[] for _ in args])[i].append(chunk_id)
        out = []
        for doc_id, per_arg in docs.items():
            if all(per_arg):
                out.append(
                    {
                        "group": self.doc_meta[doc_id]["group"],
                        "doc_id": doc_id,
                        "first_chunks": [min(c) for c in per_arg],
                    }
                )
        out.sort(key=lambda r: r["group"])
        return out

    # -- BM25 -------------------------------------------------------------
    def idf(self, g: int) -> float:
        df = len(self.postings.get(g, ()))
        return math.log(1.0 + (self.n_chunks - df + 0.5) / (df + 0.5))

    def bm25_topk(self, query: str, k: int = 10) -> list[dict]:
        """Chunk-level BM25 top-k over the union of query-gram
        postings; fixed accumulation order (sorted gram, then sorted
        chunk key) for bit-stable floats."""
        grams = sorted(gram_set(query))
        avgdl = self.sum_dl / self.n_chunks if self.n_chunks else 0.0
        scores: dict[tuple[int, int], float] = {}
        for g in grams:
            w = self.idf(g)
            for key in sorted(self.postings.get(g, ())):
                tf = self.tf[(g, key[0], key[1])]
                dl = self.chunk_dl[key]
                norm = K1 * (1 - B + B * (dl / avgdl if avgdl else 0.0))
                scores[key] = scores.get(key, 0.0) + w * (tf * (K1 + 1)) / (tf + norm)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        return [
            {
                "rank": i + 1,
                "doc_id": d,
                "chunk_id": c,
                "score": s,
                "group": self.doc_meta[d]["group"],
                "line": c + 1,
            }
            for i, ((d, c), s) in enumerate(ranked[:k])
        ]

    def bm25_topk_docs(self, query: str, k: int = 10) -> list[dict]:
        """Doc-level BM25: tf summed per doc, dl = doc total, df =
        docs containing term, N = n docs."""
        grams = sorted(gram_set(query))
        n_docs = len(self.doc_meta)
        total_dl = sum(m["sum_dl"] for m in self.doc_meta.values())
        avgdl = total_dl / n_docs if n_docs else 0.0
        scores: dict[int, float] = {}
        for g in grams:
            keys = self.postings.get(g, set())
            doc_tf: dict[int, int] = {}
            for d, c in sorted(keys):
                doc_tf[d] = doc_tf.get(d, 0) + self.tf[(g, d, c)]
            df = len(doc_tf)
            w = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for d in sorted(doc_tf):
                tf = doc_tf[d]
                dl = self.doc_meta[d]["sum_dl"]
                norm = K1 * (1 - B + B * (dl / avgdl if avgdl else 0.0))
                scores[d] = scores.get(d, 0.0) + w * (tf * (K1 + 1)) / (tf + norm)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [
            {"rank": i + 1, "doc_id": d, "score": s, "group": self.doc_meta[d]["group"]}
            for i, (d, s) in enumerate(ranked[:k])
        ]
