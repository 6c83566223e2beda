from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Collection order (r17, VERDICT r16 item 2): the external driver runs
# ``pytest tests/ -x -q`` under a wall-clock window that the r16 suite
# outgrew (the run expired at ~41%, before alphabetical order ever reached
# test_query_parity). Front-load the load-bearing gates — the driver-mirror
# oracle parity, the plan lint, the vector-kernel bit-identity — then the
# cheap unit files, and push the slow robustness sweeps (hostile/empty
# clones, streaming lifecycles, property suites) to the end, so an expiring
# window costs redundancy last and correctness never. Within a file the
# collected order is preserved (parity keeps its staleness sort).
_FILE_PRIORITY = {
    "test_query_parity.py": 0,
    "test_plan_lint.py": 1,
    "test_vector_kernels.py": 2,
    "test_llm_ops.py": 80,
    "test_multimodal.py": 81,
    "test_properties.py": 82,
    "test_streaming.py": 83,
    "test_hostile_regen.py": 84,
}


def pytest_collection_modifyitems(config, items):
    items.sort(key=lambda it: _FILE_PRIORITY.get(Path(str(it.fspath)).name, 50))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    from inspig_etl_spark.session import get_spark

    s = get_spark("inspig-etl-spark-tests", master="local[4]")
    yield s
    s.stop()
