"""Model-profile file I/O.

The on-disk "model directory" (a prefix-named set of tsv/hist/pkl files) is the
contract between characterization and simulation, byte-compatible with the
reference implementation (see /root/reference/src/simulator.py:244-591 for the
load sites and SURVEY.md §2.1 for the inventory).
"""

from .ecdf import EcdfTable, read_ecdf_file, write_ecdf_file  # noqa: F401
from .kde import KdeModel, load_kde, save_kde  # noqa: F401
from .profile import ReadProfile, load_profile  # noqa: F401
