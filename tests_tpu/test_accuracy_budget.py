"""
Compiled-Mosaic accuracy budget on the real chip: the same
fused-vs-f64-oracle sweep as tests/test_accuracy_budget.py, but with the
COMPILED kernels (acc-form contractions, x3 selection matmul, DMA
banding) — the numbers the docs/solvers.md table commits to.
"""

import sys

import numpy as np
import pytest

from tpu_assim.testing.decorators import if_tpu_decorator

sys.path.insert(0, "/root/repo")

BOUNDS = {
    "fused1d deg12 (headline)": 1e-5,
    "fused1d deg16 (headline)": 1e-5,
    "cheb deg12 window (headline)": 1e-5,
    "fused2d deg12 (128x128)": 1e-5,
    "fused2d deg16 (128x128)": 1e-5,
    "fused1d smoother 4x-stack (auto degree)": 1e-5,
    "halo window (1 dev)": 1e-5,
    "strip2d (256x256, 4 strips)": 1e-5,
    "large ens100 (2^16 cols, 4pt-mean H)": 1e-5,
}


@if_tpu_decorator
def test_compiled_fused_error_within_committed_bound():
    from scripts.accuracy_sweep import main as sweep_main

    # full=False: the CI-sized sweep (the full 1024^2-strip / 2^20-col
    # shapes compile for minutes; their numbers are recorded by a
    # standalone `python scripts/accuracy_sweep.py` run in docs/solvers.md)
    rows = {r["config"]: r["max_rel_err"]
            for r in sweep_main(n_sample=96, full=False)}
    for config, bound in BOUNDS.items():
        assert config in rows
        assert rows[config] < bound, (
            f"{config}: compiled error {rows[config]:.3e} exceeds the "
            f"committed budget {bound:.0e} (docs/solvers.md)"
        )
