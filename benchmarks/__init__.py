"""Benchmark harness: TPU batched solvers vs a Ceres-class CPU stand-in.

The reference binary cannot be built in this image (Ceres/Eigen/nlohmann are
not installed and there is no network), so the CPU baseline is
scipy.optimize.least_squares (TRF) driven by ANALYTIC / autodiff Jacobians —
the same Jacobian class Ceres' autodiff Jets provide — solving the identical
problems sequentially. See cpu_baseline.py and BASELINE.md.
"""
