from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from user_behavior_spark_pipeline_spark.session import get_spark  # noqa: E402

# sf0.001 keeps the suite fast; set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
# to run the same assertions at the driver's correctness scale.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ubsp-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_shared_caches():
    """Drain the shared-cache registry AFTER every test (VERDICT r11
    #6): multi-query sessions that never release accumulate pinned
    frames until materialize's 16-slot cap evicts LOUDLY mid-query —
    the full suite was paying silent lineage recompute (and a warning
    storm) in the cache-heavy stats/joins tests. A no-op for the
    majority of tests that register nothing."""
    yield
    from user_behavior_spark_pipeline_spark.materialize import (
        release_shared,
    )

    release_shared()


# Environment watch (VERDICT r13 #8): the transformWithStateInPandas
# WIRE test (test_streaming.py::
# test_transform_with_state_matches_apply_in_pandas_with_state) gates
# itself at RUNTIME on `google.protobuf` via
# has_transform_with_state_support() — if the container ever gains
# protobuf, the test un-skips by itself on the next full run; nothing
# here needs flipping. Record its first green run in that round's
# CHANGES file. The fold semantics stay certified protobuf-free
# (test_transform_with_state_fold_semantics_without_protobuf).
