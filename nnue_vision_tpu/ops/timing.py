"""Shared readback-forced timing harness for TPU throughput measurement.

Single source of truth for the scalar-chained method used by bench.py and
scripts/profile_mega_bisect.py (the documented +0.30 ms/batch
buffer-gather harness artifact on Pallas consumers was established by
comparing the two methods — see that script's module docstring).

Why scalar-chaining: serializing reps through a buffer gather
(`dynamic_index_in_dim` feeding a `pallas_call` operand) cannot fuse — XLA
materializes a full copy of the input per rep, which is harness cost, not
kernel cost. Chaining through a kernel SCALAR operand instead (e.g.
`thresh + prev_logit * 0.0`; float mul-by-zero is not constant-foldable
under NaN semantics) keeps reps sequentially dependent while each rep
still re-reads the full input from HBM (Pallas operands always stream
from HBM), measuring the kernel itself.

Timing protocol shared by every harness in this repo: one jitted dispatch
runs all `reps` chained in a `lax.scan`, the readback (`np.asarray`) of a
value data-dependent on the last rep forces completion (axon's
`block_until_ready` returns early), and the best of 3 timed dispatches is
reported after one warmup/compile dispatch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def scalar_chained_best_ms(fwd_with_bump, data, reps, n_timing=3):
    """Best-of-`n_timing` ms per rep; reps serialized via a scalar bump.

    `fwd_with_bump(x, bump)` must thread `bump` (runtime 0.0) into its
    computation (e.g. threshold + bump) and return an array whose leading
    element depends on the forward.
    """

    @jax.jit
    def run(d):
        def body(carry, _):
            out = fwd_with_bump(d, carry * 0.0)
            lead = out.reshape(-1)[0].astype(jnp.float32)
            return lead, lead

        _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return outs[-1]

    np.asarray(run(data))  # compile + warm readback
    best = float("inf")
    for _ in range(n_timing):
        t0 = time.perf_counter()
        np.asarray(run(data))
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1000.0
