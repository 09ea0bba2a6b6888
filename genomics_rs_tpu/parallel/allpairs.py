"""All-pairs DP alignment-score matrix on TPU.

The DP-scored counterpart of the compare driver's suffix-tree
similarity (``comparison/driver.py``): every pair (i <= j) of a
sequence container is globally/locally aligned and the score matrix is
assembled, lower triangle like the reference's similarity matrix
(``/root/reference/src/main.rs:263-315``) — at 30 kb genome scale this
is ~4.9e10 DP cells for the bundled corpus (BASELINE.md), a workload
the reference cannot touch with DP at all.

Execution strategies (engine-dependent):
* ``pallas`` (TPU): pairs run back-to-back through the score-only
  wavefront kernel — one compile per padded length bucket, O(m+n)
  memory per pair, ~1.2e10 cells/s/chip.
* ``scan`` + mesh (CPU/tests, multi-chip): fixed-shape pair batches
  ``vmap``-ed and sharded over the ``data`` axis via
  ``batch_scores_sharded``.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time

import numpy as np

import jax

from genomics_rs_tpu.config import Scores
from genomics_rs_tpu.parallel.batch import batch_scores_sharded, pad_batch
from genomics_rs_tpu.parallel.mesh import make_mesh
from genomics_rs_tpu.sequence import (
    PAD_S1,
    PAD_S2,
    SequenceContainer,
    round_up,
)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class AllPairsResult:
    names: list[str]
    lengths: list[int]
    #: [j][i] = score for i <= j; zeros above the diagonal.
    matrix: np.ndarray
    elapsed_s: float
    cells: float
    cells_per_s: float


def _encode_all(container: SequenceContainer, pad: int):
    seqs = container.sequences
    L = max(max((len(s) for s in seqs), default=1), 1)
    L = max(round_up(L, pad), pad)
    enc1 = np.stack([s.encoded(pad_to=L, pad_value=PAD_S1) for s in seqs])
    enc2 = np.stack([s.encoded(pad_to=L, pad_value=PAD_S2) for s in seqs])
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    return enc1, enc2, lens


def allpairs_scores(
    container: SequenceContainer,
    scores: Scores,
    is_local: bool = False,
    engine: str = "auto",
    mesh: jax.sharding.Mesh | None = None,
) -> AllPairsResult:
    """Score matrix over all pairs (i <= j), lower-triangle layout."""
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "scan"

    names = [s.name for s in container.sequences]
    num = len(names)
    enc1, enc2, lens = _encode_all(container, pad=128)
    pairs = [(i, j) for j in range(num) for i in range(num) if i <= j]
    total_cells = float(
        sum((lens[i] + 1.0) * (lens[j] + 1.0) for i, j in pairs)
    )
    matrix = np.zeros((num, num), dtype=np.int64)

    t0 = time.perf_counter()
    if engine in ("pallas", "shortread"):
        from genomics_rs_tpu.parallel.batch import score_pairs

        s1b = np.stack([enc1[i] for i, _ in pairs])
        s2b = np.stack([enc2[j] for _, j in pairs])
        ms = np.array([lens[i] for i, _ in pairs], dtype=np.int32)
        ns = np.array([lens[j] for _, j in pairs], dtype=np.int32)
        sc, _, _ = score_pairs(
            s1b, s2b, ms, ns, scores, is_local, engine=engine
        )
        sc = np.asarray(sc)
        for k, (i, j) in enumerate(pairs):
            matrix[j, i] = int(sc[k])
    else:
        mesh = mesh or make_mesh()
        n_dev = mesh.devices.size
        s1b = np.stack([enc1[i] for i, _ in pairs])
        s2b = np.stack([enc2[j] for _, j in pairs])
        ms = np.array([lens[i] for i, _ in pairs], dtype=np.int32)
        ns = np.array([lens[j] for _, j in pairs], dtype=np.int32)
        (s1b, s2b, ms, ns), _ = pad_batch(
            (s1b, s2b, ms, ns),
            len(pairs),
            n_dev,
            pad_values=[None, None, 0, 0],
        )
        out = batch_scores_sharded(mesh, s1b, s2b, ms, ns, scores, is_local)
        sc = np.asarray(out.score)
        for k, (i, j) in enumerate(pairs):
            matrix[j, i] = int(sc[k])
    elapsed = time.perf_counter() - t0

    log.info(
        "[AllPairs] %d pairs, %.3g cells in %.2fs (%.3g cells/s, engine=%s)",
        len(pairs),
        total_cells,
        elapsed,
        total_cells / elapsed,
        engine,
    )
    return AllPairsResult(
        names=names,
        lengths=[int(x) for x in lens],
        matrix=matrix,
        elapsed_s=elapsed,
        cells=total_cells,
        cells_per_s=total_cells / elapsed,
    )


def allpairs_scores_resumable(
    container: SequenceContainer,
    scores: Scores,
    checkpoint_path: str,
    is_local: bool = False,
    engine: str = "auto",
    chunk_pairs: int = 64,
) -> AllPairsResult:
    """All-pairs scoring with crash-resumable per-chunk checkpoints.

    The all-pairs job is embarrassingly restartable (SURVEY §5):
    pair chunks are scored in order and appended to ``checkpoint_path``
    (a JSONL of {"k0": chunk start, "scores": [...]}); on restart,
    completed chunks are loaded instead of recomputed. The final
    matrix is identical to :func:`allpairs_scores`.
    """
    import json

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "scan"

    names = [s.name for s in container.sequences]
    num = len(names)
    enc1, enc2, lens = _encode_all(container, pad=128)
    pairs = [(i, j) for j in range(num) for i in range(num) if i <= j]
    matrix = np.zeros((num, num), dtype=np.int64)

    import hashlib

    # Names + content digest invalidate the checkpoint on ANY corpus
    # change — without them a length-preserving sequence edit would
    # silently reuse stale chunk scores.
    digest = hashlib.sha256()
    for s in container.sequences:
        digest.update(s.name.encode())
        digest.update(b"\0")
        digest.update(s.sequence.encode())
        digest.update(b"\1")
    meta = {
        "chunk_pairs": chunk_pairs,
        "n_pairs": len(pairs),
        "is_local": is_local,
        "scores": list(scores.as_tuple()),
        "lengths": [int(x) for x in lens],
        "names": names,
        "digest": digest.hexdigest(),
    }
    done: dict[int, list[int]] = {}
    if os.path.exists(checkpoint_path):
        try:
            with open(checkpoint_path) as f:
                lines = f.read().splitlines()
            if lines and json.loads(lines[0]).get("meta") == meta:
                for line in lines[1:]:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        break  # truncated tail from a crash mid-write
                    if len(rec["scores"]) == len(
                        pairs[rec["k0"] : rec["k0"] + chunk_pairs]
                    ):
                        done[rec["k0"]] = rec["scores"]
            else:
                log.warning(
                    "[AllPairs/resume] checkpoint %s was written with "
                    "different inputs/params; starting fresh",
                    checkpoint_path,
                )
                os.remove(checkpoint_path)
        except (OSError, json.JSONDecodeError, KeyError) as e:
            log.warning(
                "[AllPairs/resume] unreadable checkpoint (%s); starting "
                "fresh",
                e,
            )
            os.remove(checkpoint_path)
        if done:
            log.info(
                "[AllPairs/resume] %d/%d chunks already done",
                len(done),
                -(-len(pairs) // chunk_pairs),
            )
    # Rewrite the file from validated records so a torn trailing line
    # from a crash mid-write can't corrupt subsequent appends.
    with open(checkpoint_path, "w") as f:
        f.write(json.dumps({"meta": meta}) + "\n")
        for k0 in sorted(done):
            f.write(json.dumps({"k0": k0, "scores": done[k0]}) + "\n")

    t0 = time.perf_counter()
    from genomics_rs_tpu.parallel.batch import score_pairs

    with open(checkpoint_path, "a") as ckpt:
        for k0 in range(0, len(pairs), chunk_pairs):
            chunk = pairs[k0 : k0 + chunk_pairs]
            if k0 in done:
                sc = done[k0]
            else:
                s1b = np.stack([enc1[i] for i, _ in chunk])
                s2b = np.stack([enc2[j] for _, j in chunk])
                ms = np.array([lens[i] for i, _ in chunk], dtype=np.int32)
                ns = np.array([lens[j] for _, j in chunk], dtype=np.int32)
                out = score_pairs(
                    s1b, s2b, ms, ns, scores, is_local, engine=engine
                )
                sc = [int(x) for x in np.asarray(out[0])]
                ckpt.write(json.dumps({"k0": k0, "scores": sc}) + "\n")
                ckpt.flush()
            for (i, j), s in zip(chunk, sc):
                matrix[j, i] = s
    elapsed = time.perf_counter() - t0

    total_cells = float(
        sum((lens[i] + 1.0) * (lens[j] + 1.0) for i, j in pairs)
    )
    return AllPairsResult(
        names=names,
        lengths=[int(x) for x in lens],
        matrix=matrix,
        elapsed_s=elapsed,
        cells=total_cells,
        cells_per_s=total_cells / max(elapsed, 1e-9),
    )


def write_scores_tsv(result: AllPairsResult, path: str) -> str:
    """Same TSV shape as the reference similarity matrix
    (``main.rs:330-360``): index header row, then one row per
    sequence."""
    num = len(result.names)
    lines = ["\t" + "\t".join(str(i) for i in range(num)) + "\t"]
    for j in range(num):
        cells = "\t".join(str(int(result.matrix[j, i])) for i in range(num))
        lines.append(f"{j}\t{cells}\t")
    text = "\n".join(lines) + "\n"
    with open(path, "w") as f:
        f.write(text)
    return text
