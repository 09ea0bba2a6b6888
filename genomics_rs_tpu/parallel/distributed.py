"""Multi-host execution (DCN): process init + host-sharded all-pairs.

The reference's only fan-out is a rayon thread pool on one machine
(``/root/reference/src/main.rs:245-261``). The multi-host equivalent:

* :func:`init_distributed` — ``jax.distributed.initialize`` driven by
  the standard env (JAX_COORDINATOR_ADDRESS / num_processes /
  process_id, or auto-detected on Cloud TPU pods). No-op when
  single-process.
* :func:`allpairs_multihost` — the pair list is dealt round-robin
  across processes (pairs are embarrassingly parallel, so DCN only
  carries the final merge); each host scores its share on its local
  chips (batched Pallas kernel on TPU, shard_map over local devices
  otherwise) and results are merged with
  ``multihost_utils.process_allgather``.

Single-process degrades to the local all-pairs driver, which is what
the tests exercise; the multi-process path follows the standard JAX
multi-controller model and needs no further per-host state (every
process computes a disjoint pair set and the gather is a pure concat).
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.sequence import SequenceContainer

log = logging.getLogger(__name__)


_initialized = False


def init_distributed() -> tuple[int, int]:
    """Initialize multi-process JAX if configured; returns
    (process_index, process_count).

    ``jax.distributed.initialize`` must run BEFORE any backend use, so
    initialization is tracked with a module flag rather than by
    querying ``jax.process_count()`` (which would itself initialize
    the local backend and break the multi-host setup)."""
    global _initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord and not _initialized:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=num_processes,
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
            _initialized = True
        except Exception as e:  # noqa: BLE001
            if num_processes > 1:
                # On a genuinely multi-process launch, proceeding with
                # process_count()==1 would make every host silently
                # compute the full workload; fail loudly instead.
                raise RuntimeError(
                    "jax.distributed.initialize failed for a "
                    f"{num_processes}-process launch (coordinator "
                    f"{coord}): {e}"
                ) from e
            log.warning("jax.distributed.initialize failed: %s", e)
    return jax.process_index(), jax.process_count()


def allpairs_multihost(
    container: SequenceContainer,
    scores: Scores,
    is_local: bool = False,
    engine: str = "auto",
):
    """All-pairs DP score matrix with pairs dealt across hosts.

    Each process scores pairs k with k % process_count == process_index
    on its local devices, then the per-host score vectors are
    all-gathered and assembled into the full lower-triangle matrix on
    every host (replicated output, like the reference's shared matrix).
    """
    from genomics_rs_tpu.parallel.allpairs import (
        AllPairsResult,
        _encode_all,
        allpairs_scores,
    )

    pid, pcount = jax.process_index(), jax.process_count()
    if pcount == 1:
        return allpairs_scores(container, scores, is_local, engine)

    import time

    from jax.experimental import multihost_utils

    names = [s.name for s in container.sequences]
    num = len(names)
    enc1, enc2, lens = _encode_all(container, 128)
    pairs = [(i, j) for j in range(num) for i in range(num) if i <= j]
    mine = pairs[pid::pcount]

    t0 = time.perf_counter()
    local_scores = np.zeros(len(pairs) // pcount + 1, dtype=np.int32)
    if mine:
        from genomics_rs_tpu.parallel.batch import score_pairs

        s1b = np.stack([enc1[i] for i, _ in mine])
        s2b = np.stack([enc2[j] for _, j in mine])
        ms = np.array([lens[i] for i, _ in mine], dtype=np.int32)
        ns = np.array([lens[j] for _, j in mine], dtype=np.int32)
        sc, _, _ = score_pairs(
            s1b, s2b, ms, ns, scores, is_local, engine=engine
        )
        local_scores[: len(mine)] = np.asarray(sc)

    # DCN merge: every host contributes its strided share.
    gathered = multihost_utils.process_allgather(local_scores)
    matrix = np.zeros((num, num), dtype=np.int64)
    for p in range(pcount):
        share = pairs[p::pcount]
        for k, (i, j) in enumerate(share):
            matrix[j, i] = int(gathered[p][k])
    elapsed = time.perf_counter() - t0

    cells = float(sum((lens[i] + 1.0) * (lens[j] + 1.0) for i, j in pairs))
    log.info(
        "[AllPairs/multihost] %d pairs over %d hosts in %.2fs (%.3g cells/s)",
        len(pairs),
        pcount,
        elapsed,
        cells / elapsed,
    )
    return AllPairsResult(
        names=names,
        lengths=[int(x) for x in lens],
        matrix=matrix,
        elapsed_s=elapsed,
        cells=cells,
        cells_per_s=cells / elapsed,
    )
