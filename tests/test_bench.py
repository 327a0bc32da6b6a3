"""bench.py instrumentation units: the degraded-episode classifier and
the warm-profile phase aggregation (r4 verdict #2/#4 — the honesty
instruments the per-round artifact relies on)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_degraded_flag_trips_on_stage_probes():
    """BENCH_r04's blind spot: stage probes at 0.05 GB/s through
    build/warm/bm25 but healthy end-of-run probes raised NO flag. A
    collapsed stage probe must trip the flag and be named."""
    out = bench._degraded_fields(
        5.19, 8.44,
        {"after_build": 0.05, "after_warm_build": 0.05,
         "after_bm25_20q": 0.08, "after_fuzzy": 4.12},
    )
    assert out["degraded_episode"] is True
    note = out["probe_note"]
    assert "after_build" in note
    assert "after_warm_build" in note
    assert "after_bm25_20q" in note
    assert "after_fuzzy" not in note  # healthy stage is not blamed


def test_degraded_flag_end_of_run_probes_still_trip():
    out = bench._degraded_fields(0.4, 8.0, {"after_build": 6.0})
    assert out["degraded_episode"] is True
    assert "single-stream" in out["probe_note"]
    out = bench._degraded_fields(6.0, 0.6, None)
    assert out["degraded_episode"] is True
    assert "4-proc aggregate" in out["probe_note"]


def test_degraded_flag_healthy_run_clean():
    out = bench._degraded_fields(
        6.1, 7.9, {"after_build": 5.0, "after_fuzzy": 4.0}
    )
    assert "degraded_episode" not in out
    assert "probe_note" not in out
    assert out == {"bus_gbps": 6.1, "bus4_gbps": 7.9}


def test_parse_warm_prof_aggregates_phases(tmp_path):
    p = tmp_path / "prof.jsonl"
    records = [
        {"dir": "_derive", "park_s": 0.5, "derive_s": 1.5},
        {"dir": "_driver", "setup_s": 0.1, "units_s": 40.0,
         "finalize_s": 2.0},
        # per-dir decode + write records merge by dir name
        {"dir": "d-000", "decode_s": 3.0, "rows": 100,
         "terms_deferred": 2},
        {"dir": "d-000", "n_terms": 10, "n_entries": 1000, "n_vecs": 1,
         "concat_s": 0.2, "save_s": 0.3, "vec_s": 1.0, "put_s": 0.5,
         "put_path": "owner"},
        {"dir": "d-001", "decode_s": 1.0, "rows": 50,
         "terms_deferred": 0},
        {"dir": "d-001", "n_terms": 5, "n_entries": 500, "n_vecs": 0,
         "concat_s": 0.1, "save_s": 0.1, "vec_s": 0.0, "put_s": 0.2,
         "put_path": "owner"},
        {"dir": "_prewarm", "enum_s": 0.2, "topup_s": 1.1, "vec_s": 0.4,
         "total_s": 1.8, "n_topup": 7, "n_vecs": 3},
        "not json",
    ]
    with open(p, "w") as f:
        for r in records:
            f.write((r if isinstance(r, str) else json.dumps(r)) + "\n")
    warm, prewarm = bench._parse_warm_prof(str(p))
    assert warm["setup_s"] == 0.1 and warm["units_s"] == 40.0
    assert warm["finalize_s"] == 2.0
    assert warm["derive_s"] == 2.0
    assert warm["n_dirs"] == 2
    assert warm["emit_decode_cpu_s"] == 4.0
    assert warm["emit_write_cpu_s"] == 1.4
    assert warm["emit_vec_cpu_s"] == 1.0
    assert warm["emit_max_dir_s"] == 5.0  # d-000: 3.0 + 1.0 + 1.0
    assert warm["terms_deferred"] == 2
    assert prewarm == {"enum_s": 0.2, "topup_s": 1.1, "vec_s": 0.4,
                       "total_s": 1.8, "n_topup": 7, "n_vecs": 3}


def test_parse_warm_prof_missing_file():
    warm, prewarm = bench._parse_warm_prof("/tmp/does/not/exist.jsonl")
    assert warm == {} and prewarm == {}
    warm, prewarm = bench._parse_warm_prof(None)
    assert warm == {} and prewarm == {}
