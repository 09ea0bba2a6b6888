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


def balanced_deal(costs, n_shares: int) -> list[list[int]]:
    """Deal item indices into ``n_shares`` balanced shares (LPT).

    Longest-processing-time greedy: items sorted by descending cost,
    each placed on the currently least-loaded share. Guarantees the
    bottleneck share is within 4/3 of optimal (Graham), and measured
    on the mixed 30 kb + 155 kb corpus it reaches the indivisible-
    item bound exactly — round 3's boustrophedon ("snake") deal lost
    35 efficiency points there because a snake assigns by POSITION,
    not accumulated load, so the share holding the one giant pair
    keeps receiving its positional quota (BENCH work_balance row).
    Ties break on share index: deterministic across hosts.
    """
    import heapq

    order = sorted(range(len(costs)), key=lambda k: -costs[k])
    heap = [(0.0, h) for h in range(n_shares)]
    heapq.heapify(heap)
    shares: list[list[int]] = [[] for _ in range(n_shares)]
    for k in order:
        load, h = heapq.heappop(heap)
        shares[h].append(k)
        heapq.heappush(heap, (load + float(costs[k]), h))
    return shares


#: Backwards-compatible name (round-3 API).
snake_deal = balanced_deal


def allpairs_multihost(
    container: SequenceContainer,
    scores: Scores,
    is_local: bool = False,
    engine: str = "auto",
):
    """All-pairs DP score matrix with pairs dealt across hosts.

    Pairs are dealt *length-balanced*: sorted by descending DP cell
    count, then snake-dealt (host h takes sorted positions h,
    2P-1-h, 2P+h, ...) so no host accumulates all the long pairs —
    padding-free work balance the reference's rayon queue gets
    dynamically (``main.rs:253-261``) but a static deal must plan for.
    Each host scores its share on its local devices in length buckets,
    then the per-host (pair index, score) vectors are all-gathered and
    assembled into the full lower-triangle matrix on every host
    (replicated output, like the reference's shared matrix).
    """
    from genomics_rs_tpu.parallel.allpairs import (
        AllPairsResult,
        _score_pairs_bucketed,
        allpairs_scores,
    )

    pid, pcount = jax.process_index(), jax.process_count()
    if pcount == 1:
        return allpairs_scores(container, scores, is_local, engine)

    import time

    from jax.experimental import multihost_utils

    if engine == "auto":
        # "auto" stays "auto" on TPU (score_pairs routes per bucket).
        engine = "auto" if jax.default_backend() == "tpu" else "scan"

    names = [s.name for s in container.sequences]
    num = len(names)
    lens = np.array([len(s) for s in container.sequences], dtype=np.int32)
    pairs = [(i, j) for j in range(num) for i in range(num) if i <= j]
    share_idx = snake_deal(
        [(lens[i] + 1.0) * (lens[j] + 1.0) for i, j in pairs], pcount
    )
    mine_idx = share_idx[pid]
    mine = [pairs[k] for k in mine_idx]

    t0 = time.perf_counter()
    share_cap = max(len(s) for s in share_idx)
    local_scores = np.zeros(share_cap, dtype=np.int32)
    local_pairs = np.full(share_cap, -1, dtype=np.int32)
    if mine:
        # mesh=None => host-local scoring (each process sees only its
        # own devices; a global mesh would yield non-addressable
        # outputs here).
        sc, _ = _score_pairs_bucketed(
            container, mine, lens, scores, is_local, engine, mesh=None
        )
        local_scores[: len(mine)] = sc
        local_pairs[: len(mine)] = mine_idx

    # DCN merge: every host contributes its (pair index, score) share.
    g_scores = multihost_utils.process_allgather(local_scores)
    g_pairs = multihost_utils.process_allgather(local_pairs)
    matrix = np.zeros((num, num), dtype=np.int64)
    for p in range(pcount):
        for k, s in zip(g_pairs[p], g_scores[p]):
            if k >= 0:
                i, j = pairs[int(k)]
                matrix[j, i] = int(s)
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
