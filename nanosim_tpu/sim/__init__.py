"""Simulation pipeline: batch engine, per-mode drivers, output writers."""
