"""CLI entry points mirroring the reference's six example executables
(reference: apps/examples/CMakeLists.txt:1-24). Run as
``python -m calibration_tpu.apps.<name>``.
"""
