"""Deterministic, seeded, pure-Spark synthetic data generators (no external
data). Mirrors the reference's committed-fixture strategy
(/root/reference/refiner/tests/fixtures/) translated to the transcript
domain of BASELINE.json input_hint — see /root/repo/FIXTURES.md.
"""
