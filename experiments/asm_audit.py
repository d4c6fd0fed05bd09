#!/usr/bin/env python
"""Instruction-level audit of the packet kernel (VERDICT r4 item 1).

The LLO assembly is not reachable through the axon tunnel (the Mosaic
custom call is serialized as stable bytecode and compiled server-side;
no dump env var exists in this jax/jaxlib). The deepest inspectable
layer is the Mosaic TPU-dialect MLIR that pallas emits (debug=True),
which is one-to-one with vector-unit issues AFTER apply-vector-layout
expands each vector<RxLxf32> op into ceil(R/8) native (8,128) vreg ops.

This audit lowers the production kernel body for one pop-loop, counts
ops by (kind, shape), converts to an estimated issue-cycle budget
(940 MHz v5e core, 1 vreg op/cycle/VPU port issue model, measured
~3.5 ns per (64,128)-op from probe_body => ~8 issues per (64,128) op
=> ~1.07 ns per (8,128) issue), and splits the budget into
ROWS-SCALING (shape sublanes == TR) vs FIXED (everything else: (1,128)
reduce tails, cross-lane reductions, scalar chains, SMEM traffic,
control flow). Compare against the measured per-pop model
600 ns fixed + 18.6 ns x rows (pallas_packet.py:36-44).
"""
import io
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

# lowering only (jit.lower never executes), but the Mosaic path is only
# taken when the target platform is TPU, so keep the default backend


def capture_mosaic(rows=24, carry_top=False, **kw):
    """Lower traverse_packet on a tiny scene and return the Mosaic MLIR
    text that pallas prints under debug=True."""
    from unittest import mock
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import pallas_packet as pp

    r = np.random.RandomState(0)
    base = r.randn(512, 3).astype(np.float32)
    verts = np.concatenate([base, base + 0.3, base + 0.6]).astype(np.float32)
    idx = np.stack([np.arange(512), np.arange(512) + 512,
                    np.arange(512) + 1024, np.zeros(512)],
                   axis=1).astype(np.int32).reshape(-1)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    n = rows * 128
    rays = make_rays(r.randn(n, 3).astype(np.float32),
                     r.randn(n, 3).astype(np.float32),
                     np.zeros(n, np.float32), np.full(n, 1e30, np.float32))

    from jax.experimental import pallas as pl_mod

    orig_call = pl_mod.pallas_call

    def debug_call(*a, **k):
        k["debug"] = True
        k["interpret"] = False
        return orig_call(*a, **k)

    buf = io.StringIO()
    with mock.patch.object(pl_mod, "pallas_call", debug_call):
        with redirect_stdout(buf):
            try:
                jax.jit(lambda rr: pp.traverse_packet(
                    dev, rr, tile_rows=rows, multi=1, carry_top=carry_top,
                    **kw)).lower(rays)
            except Exception as e:  # lowering past the print may fail on CPU
                print(f"(lowering stopped after dump: {type(e).__name__})",
                      file=sys.stderr)
    txt = buf.getvalue()
    m = re.search(r"The Mosaic module for[^\n]*\n(.*)", txt, re.S)
    return m.group(1) if m else txt


_SHAPE = re.compile(r"vector<(\d+)x(\d+)x(f32|i32|i1)>")
_OP = re.compile(r"=\s+\"?([a-z_]+\.[a-z_0-9]+)")


def audit(mlir, rows):
    """Op histogram + issue-cycle estimate split fixed vs rows-scaling."""
    fixed = Counter()
    scaling = Counter()
    scalar = Counter()
    for line in mlir.splitlines():
        mo = _OP.search(line)
        if not mo:
            continue
        op = mo.group(1)
        if op in ("arith.constant", "func.return", "scf.yield",
                  "scf.condition", "builtin.unrealized_conversion_cast"):
            continue
        shapes = _SHAPE.findall(line)
        if not shapes:
            scalar[op] += 1
            continue
        # the op's own issue count ~ result tile count; take the max
        # operand/result shape as the work shape
        sub = max(int(s[0]) for s in shapes)
        issues = -(-sub // 8)
        if sub == rows:
            scaling[op] += issues
        else:
            fixed[op] += issues
    return fixed, scaling, scalar


def report(name, mlir, rows):
    fixed, scaling, scalar = audit(mlir, rows)
    nf, ns, nsc = sum(fixed.values()), sum(scaling.values()), \
        sum(scalar.values())
    ns_per_issue = 1.07  # measured probe_body: ~3.5 ns per (64,128) op
    print(f"== {name} (rows={rows}) ==")
    print(f"  vector issues: fixed-shape {nf} (~{nf * ns_per_issue:.0f} ns)"
          f", rows-scaling {ns} (~{ns * ns_per_issue:.0f} ns"
          f" = {ns * ns_per_issue / rows:.2f} ns/row)")
    print(f"  scalar ops: {nsc}")
    for label, ctr in (("fixed", fixed), ("scaling", scaling),
                       ("scalar", scalar)):
        top = ", ".join(f"{k}:{v}" for k, v in ctr.most_common(8))
        print(f"  {label:8s} {top}")


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    for name, kw in (("legacy", dict(carry_top=False)),
                     ("carry-top fold", dict(carry_top=True))):
        mlir = capture_mosaic(rows=rows, **kw)
        report(name, mlir, rows)
