"""Driver-contract integrity: queries()/oracle_sql() stay in sync."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_mod():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_test", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_key_has_a_query():
    mod = _entry_mod()
    q, s = set(mod.queries()), set(mod.oracle_sql())
    assert s <= q, f"oracle-only keys: {sorted(s - q)}"
    # the full contract is oracle-checked: no rows-only queries left
    assert q == s, f"rows-only queries: {sorted(q - s)}"


def test_queries_are_callables():
    mod = _entry_mod()
    assert all(callable(f) for f in mod.queries().values())
    assert len(mod.queries()) >= 40
