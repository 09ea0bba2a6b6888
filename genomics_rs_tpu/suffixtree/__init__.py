"""Host-side suffix-tree subsystem (construction, BWT, LCS).

``make_tree`` returns the fastest available implementation: the C++
arena core (native/suffix_tree.cpp via ctypes) when built, else the
pure-Python oracle. Both implement identical reference semantics
(see tree.py docstring)."""

from genomics_rs_tpu.suffixtree.tree import STRING_TERMINATORS, SuffixTree, TreeStats


def __getattr__(name):
    # The FM-index pulls jax (device suffix array) — export it lazily
    # so host-side tree consumers keep importing without jax/XLA
    # initialization.
    if name in ("FMIndex", "MultiFMIndex"):
        from genomics_rs_tpu.suffixtree import fmindex

        return getattr(fmindex, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )

try:  # pragma: no cover - exercised when the native lib is built
    from genomics_rs_tpu.suffixtree.native import NativeSuffixTree, native_available
except Exception:  # noqa: BLE001
    NativeSuffixTree = None

    def native_available() -> bool:
        return False


def make_tree(alphabet_file: str, initial_allocation: int = 16):
    """Suffix tree factory: native C++ core if built, Python otherwise."""
    if native_available():
        return NativeSuffixTree(alphabet_file, initial_allocation)
    return SuffixTree(alphabet_file, initial_allocation)


__all__ = [
    "SuffixTree",
    "TreeStats",
    "STRING_TERMINATORS",
    "make_tree",
    "native_available",
    "FMIndex",
    "MultiFMIndex",
]
