"""Real multi-process (2-rank) distributed all-pairs over Gloo/DCN.

Spawns two JAX processes with ``jax.distributed.initialize`` on
localhost CPU devices, each scoring its strided pair share, merged
with ``process_allgather`` — and asserts the replicated matrix equals
the single-process driver's.
"""

import os
import subprocess
import sys

import numpy as np

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.parallel.allpairs import allpairs_scores
from genomics_rs_tpu.sequence import Sequence, SequenceContainer

from conftest import REPO_ROOT

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:%PORT%"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = sys.argv[1]
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
sys.path.insert(0, %ROOT%)
import numpy as np
from genomics_rs_tpu.sequence import Sequence, SequenceContainer
from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.parallel.distributed import (
    allpairs_multihost,
    init_distributed,
)

# Exercises the env-driven init (must run before any backend use).
assert init_distributed() == (pid, 2)

rng = np.random.default_rng(1)
c = SequenceContainer(
    sequences=[
        Sequence(f"s{k}", "".join(rng.choice(list("ACGT"), 60)))
        for k in range(5)
    ]
)
r = allpairs_multihost(c, Scores(1, -2, -1, -5), engine="scan")
np.save(f"%OUT%/matrix_{pid}.npy", r.matrix)
"""


def _container():
    rng = np.random.default_rng(1)
    return SequenceContainer(
        sequences=[
            Sequence(f"s{k}", "".join(rng.choice(list("ACGT"), 60)))
            for k in range(5)
        ]
    )


def test_two_process_allpairs(tmp_path):
    src = (
        WORKER.replace("%PORT%", "29517")
        .replace("%ROOT%", repr(REPO_ROOT))
        .replace("%OUT%", str(tmp_path))
    )
    script = tmp_path / "worker.py"
    script.write_text(src)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, lg[-2000:]

    m0 = np.load(tmp_path / "matrix_0.npy")
    m1 = np.load(tmp_path / "matrix_1.npy")
    want = allpairs_scores(_container(), Scores(1, -2, -1, -5), engine="scan")
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(m0, want.matrix)
