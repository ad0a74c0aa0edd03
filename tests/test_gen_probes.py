"""tools/gen_probes.py — the driver-side bisection generator — must keep
producing probes that (a) register cleanly and (b) pass their own wrapped
oracles, or the next driver-only red key has no working probe path."""

from __future__ import annotations

import importlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GEN_MODULE = os.path.join(
    REPO, "e2e_etl_pipeline_spark", "queries", "_probes_gen.py"
)


def test_generated_probes_pass_their_oracles(spark, sf_dir, duck):
    from e2e_etl_pipeline_spark.registry import ORACLES, QUERIES, load_all
    from e2e_etl_pipeline_spark.testing import compare_frames

    load_all()
    try:
        out = subprocess.run(
            [sys.executable, "tools/gen_probes.py", "q_join_inner"],
            cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO, "GEN_PROBES_SF_DIR": sf_dir},
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert os.path.exists(GEN_MODULE)
        importlib.import_module("e2e_etl_pipeline_spark.queries._probes_gen")
        probe_keys = [k for k in QUERIES if k.startswith("q_join_inner__probe_")]
        assert probe_keys, "generator registered no probe keys"
        for key in probe_keys:
            sdf = QUERIES[key](spark, sf_dir).toPandas()
            odf = duck.execute(ORACLES[key]).df()
            problems = compare_frames(sdf, odf)
            assert not problems, f"{key}: {problems}"
    finally:
        # The module is a temporary bisection artifact — never leave it
        # behind to pollute the registry for other tests/sessions.
        if os.path.exists(GEN_MODULE):
            os.remove(GEN_MODULE)
        sys.modules.pop("e2e_etl_pipeline_spark.queries._probes_gen", None)
        for k in [k for k in QUERIES if "__probe_" in k]:
            QUERIES.pop(k, None)
            ORACLES.pop(k, None)
