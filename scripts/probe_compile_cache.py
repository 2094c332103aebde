"""Probe: does JAX's persistent compilation cache cut axon remote-compile RTT?

VERDICT r4 #5: init_s is 94-285s per engine bring-up (~14s remote-compile RTT
per distinct program x ~11-14 programs). If `jax_compilation_cache_dir` can
serve a second process's compiles from disk, warm bring-up drops to seconds.

The cache operates at the PJRT layer: on a hit JAX calls
`deserialize_executable` instead of `compile`, so it only works if the axon
PJRT plugin supports executable (de)serialization. This probe answers that
empirically:

  NONCE=$(date +%s) python scripts/probe_compile_cache.py cold
  NONCE=<same>      python scripts/probe_compile_cache.py warm

Same NONCE in both runs makes the programs byte-identical across the two
processes while being distinct from any earlier session's programs (the nonce
lands in a constant folded into the HLO). Run the two serially — one TPU
process at a time.

Prints one JSON line per program: {phase, name, seconds} and a summary.
"""
import json
import os
import sys
import time

CACHE_DIR = os.environ.get("JAX_CC_DIR", "/tmp/jax_compile_cache")

import jax

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "cold"
    nonce = float(os.environ.get("NONCE", "12345"))
    dev = jax.devices()[0]
    print(f"# device={dev.platform} cache_dir={CACHE_DIR} nonce={nonce}",
          flush=True)

    results = {}

    def timed(name, fn, *args):
        t0 = time.monotonic()
        out = fn(*args)
        # block_until_ready is a no-op on axon — sync via host readback
        np.asarray(jax.device_get(jnp.ravel(out)[0]))
        dt = time.monotonic() - t0
        results[name] = dt
        print(json.dumps({"phase": phase, "name": name,
                          "seconds": round(dt, 2)}), flush=True)

    # force the device claim + tunnel setup before timing any compile:
    # the first device touch pays a highly variable (100-200s observed)
    # axon claim cost that is NOT compile time
    timed("device_init", lambda: jax.device_put(jnp.float32(1.0)) + 1)

    rng = np.random.default_rng(0)
    a = jax.device_put(
        jnp.asarray(rng.standard_normal((1024, 1024)), jnp.bfloat16))
    b = jax.device_put(
        jnp.asarray(rng.standard_normal((1024, 4096)), jnp.bfloat16))

    # three distinct programs of engine-warmup-ish complexity; the nonce
    # constant makes them unique to this NONCE value
    @jax.jit
    def p1(x, y):
        z = (x + nonce) @ y
        return jnp.tanh(z) @ y.T

    @jax.jit
    def p2(x, y):
        def body(c, _):
            c = jnp.tanh((c @ y) @ y.T + nonce)
            return c, ()
        out, _ = jax.lax.scan(body, x, None, length=4)
        return out

    @jax.jit
    def p3(x):
        return jnp.cumsum(jax.nn.softmax(x * nonce, axis=-1), axis=-1)

    timed("matmul_chain", p1, a, b)
    timed("scan_stack", p2, a, b)
    timed("softmax_cumsum", p3, a)

    total = sum(results.values())
    print(json.dumps({"phase": phase, "total_s": round(total, 2),
                      "n_cache_files": sum(len(fs) for _, _, fs in
                                           os.walk(CACHE_DIR))}), flush=True)


if __name__ == "__main__":
    main()
