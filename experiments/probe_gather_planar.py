"""Narrow-table gather forms: row-gather+transpose vs planar 1D gathers.

The renderer's surface/vertex fetches are 4 gathers from narrow tables
(8/5/3 cols) at pool width (32K) every persistent step; profile attributes
~102 ms/iter (~0.32 ms/step) to them. Hypothesis: the (B, C) -> (C, R, 128)
relayout after the row gather pays the small-k lane-waste penalty; gathering
from a pre-transposed (C, N) table as C contiguous 1D gathers avoids it.
K-repeat in-jit chains (one host fetch costs ~30 ms through the tunnel).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

from rodent_tpu.utils.compile import rjit

K = 50
B = 1 << 15
R = B // 128


def timeit(f, *args):
    o = f(*args)
    _ = np.asarray(o)[..., :1]
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        o = f(*args)
        _ = np.asarray(o)[..., :1]
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


for N, C in ((32, 8), (1024, 8), (1024, 5), (65536, 8), (262144, 5)):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, C), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, N,
                             jnp.int32)

    @rjit
    def row_form(table, idx):
        acc = jnp.zeros((C, R, 128), jnp.float32)
        for k in range(K):
            i2 = (idx + k) % N
            rows = table[i2]
            acc = acc + rows.T.reshape(C, R, 128)
        return acc[:, 0, :8]

    @rjit
    def planar_form(table, idx):
        tt = table.T  # materialized once per call, loop-invariant
        acc = jnp.zeros((C, R, 128), jnp.float32)
        for k in range(K):
            i2 = (idx + k) % N
            g = jnp.stack([tt[c][i2].reshape(R, 128) for c in range(C)])
            acc = acc + g
        return acc[:, 0, :8]

    t_row = timeit(row_form, table, idx)
    t_pl = timeit(planar_form, table, idx)
    print(f"N={N:7d} C={C}: row {t_row*1e6:7.1f} us | "
          f"planar {t_pl*1e6:7.1f} us  ({t_row/t_pl:5.2f}x)", flush=True)
