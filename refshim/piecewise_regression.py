"""Stub for piecewise_regression (only used by reference characterization)."""


class Fit:
    def __init__(self, *a, **k):
        raise RuntimeError("piecewise_regression stub: fitting not available")
