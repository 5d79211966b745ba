"""nanosim_tpu — a TPU-native nanopore read simulator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of bcgsc/NanoSim
(reference: /root/reference, v3.2.2).  The two-stage architecture is preserved:

* **Characterization** (`nanosim_tpu.characterization`): fit statistical models
  from real ONT read alignments (read-length KDEs, error-type Markov chain,
  mixed parametric error-length distributions, base-quality log-normals,
  homopolymer length regressions, intron-retention Markov model, chimeric
  statistics, EM quantification).
* **Simulation** (`nanosim_tpu.sim`): sample those models to emit synthetic
  FASTA/FASTQ reads with a ground-truth error log, for genome / transcriptome /
  metagenome references.

The model-file directory format is byte-compatible with the reference
(see `nanosim_tpu.profiles`), so pre-trained NanoSim models load directly.

Unlike the reference's per-read pure-Python loops, the entire generation path
runs as batched device kernels: every read is a lane of a [B, L] buffer, the
error-state Markov walk is a `lax.scan`, mutation is a scatter/cumsum gather-map
construction, and randomness is a counter-based per-slot stream
(`nanosim_tpu.ops.rng`) that makes output invariant to device count.
"""

__version__ = "0.1.0"
