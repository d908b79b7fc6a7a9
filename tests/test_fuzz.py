"""Bounded fuzz run in CI (the reference builds its fuzz target in CI;
we actually execute a slice of the campaign, SURVEY.md §4 tier 4)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fuzz"))

from run_fuzz import one_case


def test_fuzz_slice():
    for seed in range(12):
        one_case(seed, max_block=1024)


def test_mutation_fuzz_slice():
    from run_fuzz import one_mutation_case

    for seed in range(30):
        one_mutation_case(seed)


def test_device_fuzz_tie_regression_seed_630():
    """seed 630: a 1-ulp f64 autocorr difference flips a quantization
    rounding tie (qcoef -2072 vs -2073) — the documented default-mode
    deviation. The case must be lossless and strict-resolvable."""
    from run_fuzz import one_device_case

    one_device_case(630)
    one_device_case(630, strict=True)
