"""Utility surface mirroring the reference ``openset_imagenet.util`` module.

Re-exports the config layer (``NameSpace`` / ``load_yaml``), the OSCR
computation, and hosts the offline analysis helpers (score-file loading,
dataset info).  Plotting helpers live in :mod:`openset_imagenet_tpu.plots`
and are re-exported here for API parity with reference ``util.py``.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np

from .config import NameSpace, load_yaml  # noqa: F401  (parity re-export)
from .ops.oscr import calculate_oscr, ccr_at_fpr  # noqa: F401


def __getattr__(name):
    # Lazy parity re-exports of the plotting helpers (reference util.py
    # hosts them alongside the analysis code; keeping matplotlib imports
    # lazy avoids pulling a GUI toolkit into training processes).
    if name in ("plot_oscr", "plot_single_oscr"):
        from . import plots
        return getattr(plots, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# Default on-disk XLA cache for the serving CLIs' --compile-cache flag
# (per-user, survives process restarts; XLA's keying makes sharing safe).
DEFAULT_COMPILE_CACHE = "~/.cache/openset-imagenet-tpu/xla"


def resolve_compile_cache(flag_value):
    """Cache directory for a serving CLI: flag > ``OSI_COMPILE_CACHE``
    env (CI/test harnesses pin one shared location without threading a
    flag through every invocation) > the per-user default."""
    import os

    return (flag_value or os.environ.get("OSI_COMPILE_CACHE")
            or DEFAULT_COMPILE_CACHE)


def enable_compilation_cache(cache_dir) -> Path | None:
    """Point XLA's persistent compilation cache at ``cache_dir``.

    One shared switch for every surface that pays a whole-model XLA
    compile (training sweeps via ``cfg.compilation_cache``, the
    ``predict_imagenet`` / ``serve_imagenet`` serving CLIs via
    ``--compile-cache``): after the first run, identical programs load
    from disk instead of recompiling.  Measured
    (``tools/bench_compile_cache.py``, BENCH.md round-5): 4-6x faster
    serving cold starts on backends that compile in-process (CPU; PCIe
    TPU hosts compile locally too); a no-op through a remote-compiling
    relay backend, where the service owns the compile.

    Safe to share between programs/models: XLA keys entries by the HLO
    module, compile options, device kind, and jax/jaxlib versions, so a
    stale or foreign entry can never be served.  Thresholds are zeroed
    so even quick compiles cache (a daemon's bucket ladder is many small
    programs).  Must run before the compile it should capture; calling
    again just re-points the directory.

    An uncreatable directory (read-only HOME in a container, missing
    mount) disables the cache with a warning instead of failing the
    CLI: the cache is default-on for the serving CLIs, and a missing
    cache only costs a recompile.  Returns ``None`` in that case.
    """
    import jax

    path = Path(cache_dir).expanduser()
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as e:
        import logging
        logging.getLogger(__name__).warning(
            "compilation cache disabled: cannot create %s (%s) — "
            "set --compile-cache/OSI_COMPILE_CACHE to a writable "
            "directory to re-enable", path, e)
        return None
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    try:
        # The on-disk cache object is a lazily-created singleton bound to
        # the directory current at its FIRST use — if something already
        # compiled in this process (another directory), re-point it.
        from jax._src import compilation_cache
        compilation_cache.reset_cache()
    except (ImportError, AttributeError):  # private API moved: the dir
        pass                               # config above still applies
    return path


class SplitTable:
    """Tiny column/row table standing in for the reference's DataFrame.

    Supports the access patterns the analysis surface actually uses —
    ``table["col"]`` (column as list), ``table.rows`` (list of dicts),
    ``len``, iteration over rows, and a readable ``str`` — without a
    pandas dependency in the package.
    """

    def __init__(self, columns, rows):
        self.columns = list(columns)
        self.rows = [dict(zip(self.columns, r)) for r in rows]

    def __getitem__(self, column):
        return [row[column] for row in self.rows]

    def __len__(self):
        return len(self.rows)

    def __iter__(self):
        return iter(self.rows)

    def __str__(self):
        widths = [max(len(str(c)), *(len(self._fmt(r[c]))
                                     for r in self.rows))
                  for c in self.columns] if self.rows else \
                 [len(str(c)) for c in self.columns]
        head = "  ".join(c.rjust(w) for c, w in zip(self.columns, widths))
        body = "\n".join(
            "  ".join(self._fmt(r[c]).rjust(w)
                      for c, w in zip(self.columns, widths))
            for r in self.rows)
        return head + ("\n" + body if body else "")

    @staticmethod
    def _fmt(v):
        return f"{v:.2f}" if isinstance(v, float) else str(v)


def dataset_info(protocol_data_dir):
    """Table with per-split known/negative/unknown composition.

    Parity: reference ``util.py:38-66`` (reads ``train.csv``,
    ``validation.csv``, ``test.csv`` in the given directory; same
    columns).  Returns a :class:`SplitTable` instead of a DataFrame.
    """
    import csv

    data_dir = Path(protocol_data_dir)
    files = {"train": data_dir / "train.csv",
             "val": data_dir / "validation.csv",
             "test": data_dir / "test.csv"}
    data = []
    for split, path in files.items():
        with open(path, newline="") as f:
            labels = [int(row[1]) for row in csv.reader(f) if row]
        size = len(labels)
        kn_size = sum(1 for l in labels if l >= 0)
        kn_unk_size = sum(1 for l in labels if l == -1)
        unk_unk_size = sum(1 for l in labels if l == -2)
        data.append((split, len(set(labels)), size,
                     kn_size, 100 * kn_size / size,
                     kn_unk_size, 100 * kn_unk_size / size,
                     unk_unk_size, 100 * unk_unk_size / size))
    return SplitTable([
        "split", "classes", "size", "kn size", "kn (%)", "kn_unk size",
        "kn_unk (%)", "unk_unk size", "unk_unk (%)"], data)


def read_array_list(file_names):
    """Load saved ``.npz`` score archives into a dict keyed by name.

    Parity: reference ``util.py:69-87`` — accepts either a dict
    (``key -> path``) or a list of paths (key derived from the file name with
    the trailing 8 characters stripped).
    """
    arrays = defaultdict(dict)
    if isinstance(file_names, dict):
        for key, file in file_names.items():
            arrays[key] = np.load(file)
    else:
        for file in file_names:
            file = str(file)
            name = file.split("/")[-1][:-8]
            arrays[name] = np.load(file)
    return arrays


def get_best_arrays(files_dict):
    """Map ``*_curr_*`` score paths to their ``*_best_*`` counterparts.

    Parity: reference ``util.py:231-240``.
    """
    best_paths = dict()
    for name, path in files_dict.items():
        best_paths[name] = Path(str(path).replace("_curr_", "_best_"))
    return best_paths


def get_histogram(array, unk_label=-1, metric="score", bins=100,
                  drop_bg=False, log_space=False, geomspace_limits=(1, 1e2)):
    """Histograms of known vs unknown scores or feature norms.

    Parity: reference ``util.py:202-228``: for ``metric='score'`` knowns use
    the true-class score and unknowns the max score; for ``metric='norm'``
    both use the L2 feature norm.  ``drop_bg`` removes the background column
    for garbage models first.
    """
    score = array["scores"]
    if drop_bg:
        score = score[:, :-1]
    gt = array["gt"].astype(np.int64)
    features = array["features"]
    norms = np.linalg.norm(features, axis=1)
    kn = gt >= 0
    unk = gt == unk_label
    if metric == "score":
        kn_metric = score[kn, gt[kn]]
        unk_metric = np.amax(score[unk], axis=1)
    elif metric == "norm":
        kn_metric = norms[kn]
        unk_metric = norms[unk]
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if log_space:
        lower, upper = geomspace_limits
        bins = np.geomspace(lower, upper, num=bins)
    kn_hist, kn_edges = np.histogram(kn_metric, bins=bins)
    unk_hist, unk_edges = np.histogram(unk_metric, bins=bins)
    return kn_hist, kn_edges, unk_hist, unk_edges
