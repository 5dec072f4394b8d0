"""mm2tpu — a TPU-native long-read mapper.

A from-scratch re-design of the seed–chain–align pipeline of minimap2
(reference: kisarur/minimap2-fpga, minimap2 v2.18-r1015) for TPU hardware:

- host data plane (FASTA/FASTQ IO, index build, output formatting) in
  Python/NumPy with native C++ helpers,
- the two superlinear kernels (anchor-chaining DP and base-level extension
  DP) as Pallas TPU kernels over fixed-shape, length-bucketed batches,
- scale-out via ``jax.sharding`` data parallelism over reads with a
  replicated HBM-resident index.

Layer map (mirrors SURVEY.md §1 of the reference):
  utils/     L0  hashing, timers, constants
  io/        L2  sequence IO + PAF/SAM writers
  index/     L3  minimizer sketch + CSR index (+ .mmi compatible IO)
  mapping/   L4  seeding, chaining orchestration, hits, alignment, mapq
  ops/       L5  device kernels (Pallas) + NumPy references
  parallel/  L1/L6  batching, device mesh, pipelined execution
  models/        preset-configured end-to-end pipelines
"""

__version__ = "0.1.0"
