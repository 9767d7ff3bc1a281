#!/usr/bin/env python
"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current benchmark: MLT-CNN split-decision inference throughput in CTUs/s
on one chip (the reference runs this net per-CTU on a V100 with a
model-reload per CTU, vtm-mlt-cpp EncCu.cpp:894-905; at 128x128 CTUs a
1080p frame has ~128 CTUs). vs_baseline compares against a generous
estimate of the reference's per-CTU round-trip rate (~50 CTUs/s given
the model reload; a fixed-model V100 run would be ~2k CTUs/s — we use
the latter to be conservative).

This will evolve into encoder frames/s once the end-to-end encoder path
lands (BASELINE.md targets).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from fastintercu_vvc_tpu.models import mlt_cnn

    model = mlt_cnn.GapBigMltCtu(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    batch = 128  # one 1080p frame worth of CTUs
    variables = mlt_cnn.init_params(model, rng, batch=batch, size=128)

    @jax.jit
    def forward(variables, x, poc, qp):
        l1, l2, l3 = model.apply(variables, x, poc, qp, train=False)
        return jnp.argmax(l3, axis=-1)

    x = jax.random.uniform(rng, (batch, 128, 128, 2), jnp.float32)
    poc = jnp.zeros((batch,), jnp.float32)
    qp = jnp.full((batch,), 32.0, jnp.float32)

    # warmup / compile
    forward(variables, x, poc, qp).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, x, poc, qp)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    ctus_per_s = batch * iters / dt
    baseline_ctus_per_s = 2000.0  # conservative fixed-model V100 estimate
    print(json.dumps({
        "metric": "mlt_cnn_inference_throughput",
        "value": round(ctus_per_s, 1),
        "unit": "CTU/s",
        "vs_baseline": round(ctus_per_s / baseline_ctus_per_s, 2),
    }))


if __name__ == "__main__":
    main()
