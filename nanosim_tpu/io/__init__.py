"""Reference-sequence and read I/O."""

from .fastx import read_fastx, mangle_name  # noqa: F401
from .genome import PackedGenome, MetagenomeSet  # noqa: F401
