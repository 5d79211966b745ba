"""Batched JAX/Pallas device kernels for the simulation hot path.

x64 is enabled so reference-genome coordinates (> 2^31 for mammalian genomes)
fit in int64; all hot-path arrays remain explicitly int32/uint8/float32.
"""

import jax

jax.config.update("jax_enable_x64", True)
