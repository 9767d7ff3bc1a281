"""fastintercu_vvc_tpu — a TPU-native VVC encoder framework with CNN-based
fast inter-CU split decision.

This is a ground-up JAX/XLA/Pallas re-design of the capabilities of
smu-ivpl/FastInterCU-VVC (VTM-11.0 + MLT-CNN split-mode predictor):

- ``models``   — the MLT-CNN split-mode classifier family (flax), training stack.
- ``ops``      — normative + search compute kernels: transforms, quant,
                 intra/inter prediction, interpolation, distortion (SAD/SATD),
                 in-loop filters. Batched, integer-exact, MXU/VPU-friendly.
- ``codec``    — bitstream layer: CABAC engine, context models, HLS writers,
                 residual coding, QTMT partition logic, frame/GOP encoders.
- ``parallel`` — device-mesh layer: CTU-tile sharding, wavefront batching,
                 halo exchange, GOP sharding (jax.sharding + shard_map).
- ``utils``    — YUV I/O, config system (VTM .cfg compatible), bitstream
                 byte-level writer, tracing.

Design stance (vs the reference's recursive C++/CUDA design):
batch-don't-recurse, SoA state, two-phase entropy coding (vectorized bit
estimation for RDO; sequential native CABAC only for the final write),
integer-exact normative math. See SURVEY.md §7.
"""

__version__ = "0.1.0"
