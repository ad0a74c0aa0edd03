"""Driver-contract smoke tests: entry() runs on sf0.001 with rows and a
stable schema; every oracle key has a query; registry keys are well-formed.
"""

from __future__ import annotations

import importlib.util
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()[:2] == ["l_returnflag", "l_linestatus"]


def test_registry_consistency():
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 60
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # every key is a valid identifier-ish snake string
    for k in qs:
        assert k.startswith("q_") and " " not in k
