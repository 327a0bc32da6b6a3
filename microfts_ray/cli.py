"""CLI mirroring the reference command surface.

Reference dispatch (/root/reference/fts-lmdb.go:1782-1793): create,
chunk, input, delete, search, grams, info, compact, update, empty.
Here DB = an index directory; inputs are Parquet corpus files with
the (repo, path, commit, lang, content) schema instead of raw text
files. Default search output is the reference's `FILE:LINE:TEXT`
line format (fts-lmdb.go:56-64); `-sexp` emits the elisp-readable
plist form the Emacs client parses (org-fts.el:113-136).

Usage examples:
    python -m microfts_ray.cli create /tmp/idx
    python -m microfts_ray.cli input /tmp/idx corpus/*.parquet
    python -m microfts_ray.cli search /tmp/idx def import
    python -m microfts_ray.cli search -fuzzy 60 -sort /tmp/idx "def f(a)"
    python -m microfts_ray.cli bm25 /tmp/idx "hash table" -k 10
    python -m microfts_ray.cli info -grams /tmp/idx
    python -m microfts_ray.cli update -t /tmp/idx snapshot/*.parquet
    python -m microfts_ray.cli compact /tmp/idx
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)


def _escape(s: str) -> str:
    """Reference escape (fts-lmdb.go:1423-1426): quoted form minus
    the surrounding quotes."""
    q = json.dumps(s)
    return q[1:-1]


import re as _re

_GO_VERB = _re.compile(r"%([#0\- +]*)(\d+)?(?:\.(\d+))?(?:\[(\d+)\])?([sdf%])")


def go_printf(fmt: str, args: tuple) -> str:
    """Subset of Go's fmt.Printf used by the reference format strings
    (fulltext.go:327-346): verbs s/d/f with optional width.precision
    and explicit argument indexes `%[N]v`; after an explicit index,
    implicit verbs continue from N+1 (Go semantics)."""
    out = []
    pos = 0
    next_arg = 1  # Go arg indexes are 1-based

    def sub(m: _re.Match) -> str:
        nonlocal next_arg
        flags, width, prec, idx, verb = m.groups()
        if verb == "%":
            return "%"
        if idx:
            next_arg = int(idx)
        val = args[next_arg - 1]
        next_arg += 1
        spec = "%" + (flags or "") + (width or "")
        if prec is not None:
            spec += "." + prec
        spec += {"s": "s", "d": "d", "f": "f"}[verb]
        if verb == "d":
            val = int(val)
        elif verb == "f":
            val = float(val)
        else:
            val = str(val)
        return spec % val

    # unescape Go-style \n \t in CLI-provided strings
    fmt = fmt.replace("\\n", "\n").replace("\\t", "\t")
    return _GO_VERB.sub(sub, fmt)


def _print_hits(hits, args, reader=None) -> bool:
    # the engine returns Arrow tables (query.py HITS/FUZZY_SCHEMA);
    # the CLI is the one edge that materializes Python rows, and only
    # the rows it is about to print
    if hasattr(hits, "to_pylist"):
        hits = hits.to_pylist()
    fmt = getattr(args, "format", None)
    # group wrappers (-start-format / -end-format): printed around
    # each FILE group's matches, printf arg = the group name
    # (fts-lmdb.go:1258-1262; flags fulltext.go:333-342). Defaults are
    # "" (invisible). Not used with -fuzzy -sort — that mode sorts
    # matches across files (fulltext.go:326 help text).
    start_fmt = getattr(args, "start_format", "") or ""
    end_fmt = getattr(args, "end_format", "") or ""
    if getattr(args, "fuzzy", 0) and getattr(args, "sort", False):
        start_fmt = end_fmt = ""
    if args.sexp:
        # reference quirk preserved: -sexp leaves start-format at ""
        # (sexpGroupStart == "") and sets end-format to "\n" only when
        # cfg.format == "" — fts-lmdb.go:194-199 compares cfg.format
        # (not cfg.endFormat) against groupEnd, so the sexp group-end
        # default only kicks in when the user passed -format ""
        if getattr(args, "format", None) == "" and not end_fmt:
            end_fmt = "\n"
    if fmt and reader is not None and hits:
        # POSITION needs full doc contents: prefetch them in ONE bulk
        # read (chunk_start alone would fetch one doc per hit)
        import numpy as np

        reader.chunk_texts(
            np.array([h["doc_id"] for h in hits], np.uint64),
            np.array([h["chunk_id"] for h in hits], np.uint64),
        )
    prev_group: str | None = None
    for h in hits:
        fname = h["group"]
        if fname != prev_group:
            if prev_group is not None and end_fmt:
                print(go_printf(end_fmt, (prev_group,)), end="")
            if start_fmt:
                print(go_printf(start_fmt, (fname,)), end="")
            prev_group = fname
        if fmt:
            start = (
                reader.chunk_start(h["doc_id"], h["chunk_id"]) if reader else 0
            )
            # printf args per fts-lmdb.go:1386:
            # (start, line, offset, percent, escaped text, file)
            print(
                go_printf(
                    fmt,
                    (start, h["line"], h.get("offset", 0),
                     h.get("percent", 0.0), _escape(h["text"]), fname),
                ),
                end="",
            )
        elif args.sexp:
            pct = h.get("percent", 0.0)
            print(
                f'(:filename "{_escape(fname)}" :line {h["line"]} '
                f':offset {h.get("offset", 0)} :text "{_escape(h["text"])}" '
                f":percent {pct:f})",
                end="",
            )
        elif args.n:
            print(f"{fname}:{h['line']}")
        else:
            print(f"{fname}:{h['line']}:{h['text']}")
    if prev_group is not None and end_fmt:
        print(go_printf(end_fmt, (prev_group,)), end="")
    if args.sexp and hits:
        print()
    return bool(hits)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="microfts-ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("create", help="create an empty index directory")
    sp.add_argument("db")

    sp = sub.add_parser("input", help="index corpus parquet files (add/reindex only)")
    sp.add_argument("db")
    sp.add_argument("files", nargs="+")
    sp.add_argument("-org", action="store_true", help="org-mode chunks instead of lines")
    sp.add_argument("--rows-per-part", type=int, default=4000)

    sp = sub.add_parser("update", help="snapshot diff: reindex changed, delete missing")
    sp.add_argument("db")
    sp.add_argument("files", nargs="+")
    sp.add_argument("-t", action="store_true", help="dry run: print the plan")

    sp = sub.add_parser("search", help="exact AND search with verification")
    sp.add_argument("db")
    sp.add_argument("terms", nargs="+")
    sp.add_argument("-partial", action="store_true")
    sp.add_argument("-fuzzy", type=float, default=0, help="percent fuzzy match")
    sp.add_argument("-sort", action="store_true", help="fuzzy: sort all matches")
    sp.add_argument("-file", dest="file_mode", action="store_true")
    sp.add_argument("-limit", type=int, default=None)
    sp.add_argument("-filter", default=None, help="regexp filter on chunk text")
    sp.add_argument("-n", action="store_true", help="print only FILE:LINE")
    sp.add_argument("-sexp", action="store_true")
    sp.add_argument("-candidates", action="store_true", help="raw candidates, no verify")
    sp.add_argument("-format", default=None,
                    help="Go printf format; args: POSITION LINE OFFSET PERCENT TEXT FILE")
    sp.add_argument("-start-format", dest="start_format", default="",
                    help="Go printf format printed before each file "
                    "group's matches (arg: FILE); default \"\"; not "
                    "used with -fuzzy -sort")
    sp.add_argument("-end-format", dest="end_format", default="",
                    help="Go printf format printed after each file "
                    "group's matches (arg: FILE); default \"\"; not "
                    "used with -fuzzy -sort")
    sp.add_argument("-u", action="store_true",
                    help="update the index from its recorded inputs before searching")

    sp = sub.add_parser("bm25", help="BM25 top-k ranked search")
    sp.add_argument("db")
    sp.add_argument("query")
    sp.add_argument("-k", type=int, default=10)
    sp.add_argument("-docs", action="store_true", help="doc-level ranking")

    sp = sub.add_parser("grams", help="print the gram set for text")
    sp.add_argument("text", nargs="+")
    sp.add_argument("-partial", action="store_true")
    sp.add_argument("-gx", action="store_true", help="hex output")
    sp.add_argument("-gd", action="store_true", help="decimal output")

    sp = sub.add_parser("info", help="index statistics")
    sp.add_argument("db")
    sp.add_argument("-grams", action="store_true")
    sp.add_argument("-groups", action="store_true")

    sp = sub.add_parser("delete", help="tombstone a group (repo/path@commit)")
    sp.add_argument("db")
    sp.add_argument("group")

    sp = sub.add_parser("compact", help="reclaim space, re-merge shards")
    sp.add_argument("db")
    sp.add_argument("--shards", type=int, default=8)

    sp = sub.add_parser("merge", help="merge segments into term-range shards")
    sp.add_argument("db")
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument(
        "--warm",
        action="store_true",
        help="emit the serving warm cache as an index artifact",
    )
    sp.add_argument(
        "--warm-inline",
        action="store_true",
        help="stage warm dirs inside the merge tasks (per-node-bus "
        "clusters; on a shared-bus host the capped two-phase default "
        "is faster)",
    )

    sp = sub.add_parser("chunk", help="add a custom-gram chunk")
    sp.add_argument("db")
    sp.add_argument("group", help="repo/path@commit")
    sp.add_argument("grams", help="delimited gram list")
    sp.add_argument("-d", default=",", help="delimiter")
    sp.add_argument("-gx", action="store_true", help="grams are hex")
    sp.add_argument("-gd", action="store_true", help="grams are decimal")

    sp = sub.add_parser("empty", help="pre-create empty groups")
    sp.add_argument("db")
    sp.add_argument("groups", nargs="+")

    args = p.parse_args(argv)

    if args.cmd == "grams":
        from .functions.grams import gram_set, gram_to_str

        gs = sorted(gram_set(*args.text, partial=args.partial))
        if args.gx:
            print(" ".join(f"{g:04x}" for g in gs))
        elif args.gd:
            print(" ".join(str(g) for g in gs))
        else:
            print(" ".join(gram_to_str(g) for g in gs))
        return 0

    if args.cmd == "create":
        import os

        from .state import manifest as mf

        os.makedirs(args.db, exist_ok=True)
        if not mf.manifest_exists(args.db):
            mf.commit_manifest(
                args.db,
                {"version": 1, "chunker": "lines", "partitions": [],
                 "global": {"n_docs": 0, "n_chunks": 0, "sum_dl": 0, "n_terms": 0,
                            "n_postings": 0, "avgdl": 0.0},
                 "inputs": []},
            )
        return 0

    if args.cmd == "info":
        from .pipelines.info import index_info

        print(json.dumps(index_info(args.db, grams=args.grams, groups=args.groups),
                         indent=2))
        return 0

    def parse_group(g: str) -> tuple[str, str, str]:
        """Resolve a display name 'repo/path@commit'. Repo names may
        themselves contain '/' (org/proj), so the name alone is
        ambiguous — resolve against the INDEX's existing (repo, path)
        keys first (deleteGroupByName parity, fts-lmdb.go:1628-1638);
        for brand-new groups fall back to the documented rule: the
        FIRST '/' separates repo from path."""
        head, _, commit = g.rpartition("@")
        from .state import manifest as mf

        if mf.manifest_exists(args.db):
            import os as _os

            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            man = mf.load_manifest(args.db)
            for rel, _si in mf.docs_sources(man):
                t = _pq.read_table(
                    _os.path.join(args.db, rel), columns=["repo", "path"]
                )
                joined = _pc.binary_join_element_wise(t["repo"], t["path"], "/")
                hit = _pc.index(_pc.equal(joined, head), True).as_py()
                if hit >= 0:
                    return t["repo"][hit].as_py(), t["path"][hit].as_py(), commit
        repo, _, path = head.partition("/")
        return repo, path, commit

    if args.cmd == "delete":
        from .pipelines.update import delete_group_by_name

        try:
            delete_group_by_name(args.db, args.group)
        except KeyError as e:
            print(e, file=sys.stderr)
            return 1
        return 0

    if args.cmd == "empty":
        from .pipelines.custom import create_empty_groups

        create_empty_groups(args.db, [parse_group(g) for g in args.groups])
        return 0

    if args.cmd == "chunk":
        from .functions.grams import gram_from_str
        from .pipelines.custom import add_chunk

        toks = args.grams.split(args.d)
        if args.gx:
            gs = [int(t, 16) for t in toks]
        elif args.gd:
            gs = [int(t) for t in toks]
        else:
            gs = [gram_from_str(t) for t in toks]
        add_chunk(args.db, *parse_group(args.group), gs)
        return 0

    # Ray-backed commands
    _init_ray()
    if args.cmd == "input":
        from .pipelines.build import build_index
        from .pipelines.update import apply_update
        from .state import manifest as mf

        chunker = "org" if args.org else "lines"
        if mf.manifest_exists(args.db) and mf.load_manifest(args.db)["partitions"]:
            apply_update(args.db, sorted(args.files), chunker=chunker,
                         delete_missing=False,
                         target_rows_per_part=args.rows_per_part)
        else:
            build_index(sorted(args.files), args.db, chunker=chunker,
                        target_rows_per_part=args.rows_per_part)
        return 0

    if args.cmd == "update":
        from .pipelines.update import apply_update

        out = apply_update(args.db, sorted(args.files), dry_run=args.t)
        if args.t:
            print(json.dumps(out, indent=2))
        return 0

    if args.cmd == "compact":
        from .pipelines.update import compact

        compact(args.db, n_shards=args.shards)
        return 0

    if args.cmd == "merge":
        from .pipelines.merge import merge_index

        merge_index(args.db, n_shards=args.shards, emit_warm=args.warm,
                    warm_inline=args.warm_inline)
        return 0

    from .pipelines.query import IndexReader

    if args.cmd == "search" and args.u:
        # reference `search -u` (fts-lmdb.go:1050-1055): update first
        from .pipelines.update import apply_update
        from .state import manifest as mfmod

        inputs = mfmod.load_manifest(args.db).get("inputs", [])
        if inputs:
            apply_update(args.db, inputs)
    reader = IndexReader(args.db)
    if args.cmd == "bm25":
        hits = (
            reader.bm25_topk_docs(args.query, k=args.k)
            if args.docs
            else reader.bm25_topk(args.query, k=args.k)
        )
        for h in hits:
            loc = f":{h['line']}" if "line" in h else ""
            print(f"{h['rank']:3d}  {h['score']:.4f}  {h['group']}{loc}")
        return 0 if hits else 1

    # search
    if args.candidates:
        from .functions.grams import gram_set

        cand = reader.candidates(gram_set(*args.terms, partial=args.partial))
        if cand is None:
            return 1
        for d, c in zip(cand.doc_ids, cand.chunk_ids):
            print(f"{reader.doc_group(int(d))}:{int(c) + 1}")
        return 0 if len(cand) else 1
    if args.file_mode:
        hits = reader.search_file(*args.terms, partial=args.partial)
        for h in hits:
            print(h["group"])
        return 0 if hits else 1
    if args.fuzzy:
        hits = reader.fuzzy(
            *args.terms, threshold=args.fuzzy / 100.0, sort_all=args.sort,
            limit=args.limit,
        )
        return 0 if _print_hits(hits, args, reader) else 1
    hits = reader.search(
        *args.terms,
        partial=args.partial,
        regexp_filter=args.filter,
        limit_per_group=args.limit,
    )
    return 0 if _print_hits(hits, args, reader) else 1


if __name__ == "__main__":
    sys.exit(main())
