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


def _enable_persistent_jit_cache():
    """XLA executables are cached on disk so repeated encoder runs
    (bench, CTC harness, CLI) skip the 20-40 s first-compile cost per
    (shape, pass) combination. Safe no-op if jax is unavailable or the
    backend rejects serialization."""
    import os
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # XLA:CPU AOT cache entries embed host-feature assumptions that
        # are detected inconsistently across processes on this machine
        # (SIGILL risk) — cache only the TPU executables
        return
    try:
        import jax
        cache = os.environ.get(
            "FASTINTERCU_JIT_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:                    # pragma: no cover
        pass


_enable_persistent_jit_cache()
