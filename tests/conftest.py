"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All sharding/pjit tests run against this virtual mesh; the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = "/root/reference/Code/ammcnet_os/model_result_save"


@pytest.fixture(scope="session")
def golden_pickles():
    """Released per-frame score pickles (reference test_helper.py:479-488)."""
    import pickle

    out = {}
    for ds in ("ped2", "avenue", "shanghaitech"):
        path = (
            f"{GOLDEN_DIR}/{ds}/img_pred_fea_comm_rgb_auc/save_pickle/{ds}"
        )
        if os.path.exists(path):
            with open(path, "rb") as fh:
                out[ds] = pickle.load(fh)
    if not out:
        pytest.skip("reference golden pickles not available")
    return out


@pytest.fixture()
def rng():
    return np.random.default_rng(20200525)
