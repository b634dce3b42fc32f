#!/usr/bin/env python
"""Compare parallelism layouts by compiled-HLO collective content (VERDICT r2
next #6): DP (8,) vs targeted TP (4,2) vs round-2's blanket last-dim TP (4,2),
on the flagship train step over an 8-device virtual CPU mesh.

CPU wall-time on this 1-core host is meaningless; the evidence is what GSPMD
actually emitted: the count and the moved bytes of every collective in the
compiled module. Prints one JSON line per layout.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/analyze_tp_hlo.py [bs] [h] [w]
(env can be omitted; the script forces the virtual CPU backend itself.)
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8}
_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """'bf16[16,104,136,256]{...}' -> byte count (tuples: sum of parts)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str):
    stats = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?[%\w.-]+ = (.+?) (all-gather|all-reduce|"
                     r"reduce-scatter|collective-permute|all-to-all)", line)
        if not m:
            continue
        shape_str, op = m.groups()
        s = stats.setdefault(op, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += _shape_bytes(shape_str)
    return stats


def compile_layout(name, mesh_shape, tp_mode, bs, h, w):
    from mde_tpu.models import build_model
    from mde_tpu.parallel import (batch_sharding, make_mesh,
                                  train_state_sharding)
    from mde_tpu.train.loop import make_train_step
    from mde_tpu.train.state import create_train_state

    import types
    args = types.SimpleNamespace(
        n_bins=256, min_depth=1e-3, max_depth=10.0, norm="linear",
        encoder_name="efficientnet-b1", use_semantics=None,
        use_instance_segmentation=None, insertion_point="before-attn",
        image="rgb", w_chamfer=0.1, chamfer=True, epochs=25, lr=0.000357,
        wd=0.1, div_factor=25.0, final_div_factor=100.0, same_lr=False, seed=0)

    mesh = make_mesh(mesh_shape, devices=jax.devices("cpu")[:8])
    model = build_model(args, dtype=jnp.bfloat16, mesh=mesh)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((bs, h, w, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((bs, h, w, 1), dtype=np.float32) * 9.9 + 0.05)
    state = create_train_state(model, args, jax.random.PRNGKey(0), (img,),
                               steps_per_epoch=100)
    state = jax.device_put(state, train_state_sharding(state, mesh, tp_mode))
    batch = {"image": jax.device_put(img, batch_sharding(mesh)),
             "depth": jax.device_put(depth, batch_sharding(mesh))}
    step = make_train_step(model, args, None, None, mesh)

    lowered = jax.jit(step.fn, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    text = compiled.as_text()
    stats = collective_stats(text)
    out = {"layout": name, "mesh": mesh_shape, "tp_mode": tp_mode,
           "collectives": stats,
           "total_collective_bytes_per_step": sum(
               s["bytes"] for s in stats.values()),
           "total_collective_count": sum(s["count"] for s in stats.values())}
    print(json.dumps(out), flush=True)
    jax.clear_caches()
    return out


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 416
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 544
    print(json.dumps({"config": {"bs": bs, "h": h, "w": w,
                                 "model": "efficientnet-b1 AdaBins 256"}}),
          flush=True)
    compile_layout("dp8", "8", "targeted", bs, h, w)
    compile_layout("tp_targeted", "4,2", "targeted", bs, h, w)
    compile_layout("tp_blanket", "4,2", "all", bs, h, w)


if __name__ == "__main__":
    main()
