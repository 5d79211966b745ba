"""Harness for running the reference implementation as a test oracle.

The reference (pure Python) runs on CPU in this environment once pysam/HTSeq
are stubbed (they are only exercised by characterization and IR paths).  Tests
use it two ways:

* import-level: call individual reference functions (read_ecdf, error_list,
  mutate_read, ...) under controlled RNG seeds for unit-level parity;
* subprocess-level: run `simulator.py genome ...` end-to-end on a tiny fixture
  model and compare output *distributions* with ours.

This module never copies reference code — it imports and executes it.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SHIM_DIR = os.path.dirname(os.path.abspath(__file__))
_REF_SRC = "/root/reference/src"

_ref_simulator = None


def import_reference_simulator():
    """Import the reference simulator module with shimmed deps (cached)."""
    global _ref_simulator
    if _ref_simulator is None:
        for p in (_SHIM_DIR, _REF_SRC):
            if p not in sys.path:
                sys.path.insert(0, p)
        import importlib

        _ref_simulator = importlib.import_module("simulator")
    return _ref_simulator


def run_reference_cli(args, cwd=None, timeout=600):
    """Run the reference simulator.py CLI in a subprocess with shims."""
    env = dict(os.environ)
    env["PYTHONPATH"] = _SHIM_DIR + os.pathsep + _REF_SRC + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(_REF_SRC, "simulator.py")] + list(args)
    return subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout
    )


def parse_fastx_records(path):
    """Parse a FASTA/FASTQ output file into [(name, seq, qual|None)]."""
    records = []
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    i = 0
    while i < len(lines):
        if not lines[i]:
            i += 1
            continue
        if lines[i][0] == ">":
            records.append((lines[i][1:], lines[i + 1], None))
            i += 2
        elif lines[i][0] == "@":
            records.append((lines[i][1:], lines[i + 1], lines[i + 3]))
            i += 4
        else:
            i += 1
    return records
